"""Optimal spatial matching (reference ``graph/_matching.py``).

Reference semantics (``_spatial_matching``, graph/_matching.py:11-172):
choose binary matches m_ij minimizing total matched distance
Σ d_ij · m_ij subject to every target i getting at least ``n_matches``
matches and (between two datasets) every source j being used at most
``n_matches`` times. The reference hands the MIP to pulp/CBC.

This engine solves the BETWEEN-sets problem exactly without any solver
dependency: the bipartite constraint matrix is totally unimodular, so the
LP relaxation has an integral optimum. Three exact routes, picked by
structure (all provably optimal — tie sets may select different edges;
tests compare objective value and constraint satisfaction, the
invariants the LP defines):

* collinear inputs, n_matches=1, equal sizes → sorted-order pairing
  (rearrangement inequality), O(n log n), any size;
* n_matches=1, integer costs (or n > 2000) → ε-scaling auction
  (:func:`_auction_assignment`, Bertsekas 1988): exact for integer
  costs; non-integral floats above the SSP budget are integerized at
  the finest step int64 allows, ⌊2⁵⁹/(ns+1)⌋ levels across the range;
  measured ~3 min at 10,000×10,000 dense where the SSP path needs hours;
* n_matches=1, non-integral float costs at ≤ 2000 points → the SSP
  float path, exact in float64 (no quantization);
* n_matches>1 transport → successive shortest augmenting paths with
  Johnson potentials over the dense bipartite residual graph (pure
  numpy; every relaxation is a vectorized row/column scan).

WITHIN-set matching (y=None, reference graph/_matching.py:104-147) couples
m_ij to both endpoints through one upper-triangle variable; that
constraint matrix is NOT totally unimodular (odd cycles make the LP
relaxation half-integral), so no flow formulation is exact. The engine
solves it EXACTLY by branch-and-bound (:func:`_b_edge_cover_bnb`): a
warm incumbent from an exact solve of the (k+2)-nearest-edge subgraph,
a subgradient-ascended Lagrangian dual with per-node re-ascent, root
reduced-cost edge fixing/pre-fixing, and the half-sum completion bound
— measured exact through n=64 for n_matches ∈ {1,2,3,5} on uniform
geometric instances (seconds to ~1 min; clustered instances are much
easier), hence ``max_within=64``. Beyond that it raises — a
blossom-style general b-matching solver is the scale path, and
returning the relaxation silently would be wrong.

Scale note: matching is a GLOBAL optimization — every variable couples
rows through the shared source capacities, so (like the reference, which
builds a dense ``pairwise_distances`` matrix) this runs on the driver over
the collected coordinate arrays, guarded by ``max_points``. It is a
declared driver-side stage of the engine, same class as the exact
Delaunay build; there is no tiled decomposition that preserves global
optimality.
"""

from __future__ import annotations

import numpy as np
import ray.data


def _collect_points(ds, id_col: str, x_col: str, y_col: str):
    if isinstance(ds, ray.data.Dataset):
        rows = ds.select_columns([id_col, x_col, y_col]).take_all()
        ids = np.array([r[id_col] for r in rows], dtype=np.int64)
        xy = np.array([[r[x_col], r[y_col]] for r in rows], dtype=np.float64)
        return ids, xy
    arr = np.asarray(ds, dtype=np.float64)
    return np.arange(len(arr), dtype=np.int64), arr


# non-integral float costs at or below this size take the SSP float
# path (exact in float64, no quantization); measured ~20 s at 2000
_SSP_FLOAT_EXACT = 2000


def _collinear_param(xp: np.ndarray, yp: np.ndarray):
    """If ALL points of both sets PROVABLY lie on one line, return their
    scalar parameters along it as (t_x, t_y); else None.

    Float cross products round, so a 0.0 is not a proof; the test runs
    in exact integers instead: coordinates must be dyadic at 2⁻¹⁶
    (integer after ×65536 — true of the engine's jittered fixtures and
    any fixed-point source; anything else conservatively falls to the
    general solver), cross products and projections are computed in
    int64 when the worst case fits, else in unbounded Python ints."""
    pts = np.vstack([xp, yp])
    d = pts - pts[0]
    nz = np.nonzero((d != 0.0).any(axis=1))[0]
    if nz.size == 0:  # all points identical
        return np.zeros(len(xp)), np.zeros(len(yp))
    di = d * 65536.0
    ri = np.rint(di)
    if not np.array_equal(ri, di) or np.abs(ri).max() >= 2.0**62:
        return None  # not exactly fixed-point: exact test unavailable
    ii = ri.astype(np.int64)
    v0, v1 = int(ii[nz[0], 0]), int(ii[nz[0], 1])
    mx = int(np.abs(ii).max())
    if mx * (abs(v0) + abs(v1)) < (1 << 62):
        # every product AND the projection sum fit int64 exactly
        if np.any(ii[:, 0] * v1 - ii[:, 1] * v0 != 0):
            return None
        t = ii[:, 0] * v0 + ii[:, 1] * v1  # int64; argsort is exact
    else:
        rows = ii.tolist()
        if any(a * v1 - b * v0 for a, b in rows):
            return None
        t = np.array([a * v0 + b * v1 for a, b in rows], dtype=object)
    return t[: len(xp)], t[len(xp):]


def _auction_assignment(cost: np.ndarray) -> np.ndarray:
    """Exact min-cost bipartite assignment by ε-scaling auction
    (Bertsekas 1988, "The auction algorithm", public algorithm), fully
    numpy-vectorized — the n_matches=1 scale path past the O(n³) SSP.

    ``cost`` is (nt, ns) with nt ≤ ns; every row gets a distinct column
    minimizing total cost. Costs must be int64. Internally benefits are
    scaled by (ns+1) so the final ε=1 phase certifies TRUE optimality
    (ε-complementary-slackness at ε < 1/n is optimal for integer costs).
    Each bidding sweep is a vectorized top-2 scan over the unassigned
    rows' benefit matrix; each accepted bid raises a price by ≥ ε, which
    bounds the work per scaling phase. Returns col index per row.
    """
    nt0, ns = cost.shape
    if nt0 > ns:
        raise ValueError("auction assignment needs nt <= ns")
    scale = np.int64(ns + 1)
    if int(np.abs(cost).max(initial=0)) * int(scale) >= (1 << 60):
        raise ValueError("costs too large for exact integer auction")
    nb = -(cost.astype(np.int64) * scale)  # maximize benefit
    if nt0 < ns:
        # pad to SQUARE with zero-benefit dummy rows: the rectangular
        # auction's ε-CS certificate needs a complete assignment — an
        # UNASSIGNED column keeping a stale high price from an earlier
        # ε-phase would otherwise block optimal bids forever. Square,
        # every column's price is re-supported by a real bid each phase.
        nb = np.vstack([nb, np.zeros((ns - nt0, ns), dtype=np.int64)])
    nt = ns
    p = np.zeros(ns, dtype=np.int64)
    row_to_col = np.full(nt, -1, dtype=np.int64)
    col_to_row = np.full(ns, -1, dtype=np.int64)
    spread = int(nb.max(initial=0)) - int(nb.min(initial=0))
    eps_seq = []
    e = max(1, spread // 8)
    while e > 1:
        eps_seq.append(e)
        e = max(1, e // 6)
    eps_seq.append(1)
    chunk = max(1, 8_000_000 // max(ns, 1))
    for eps in eps_seq:
        row_to_col.fill(-1)
        col_to_row.fill(-1)
        # drain-and-merge worklist: only rows that actually need to bid
        # (fresh + outbid + bid-losers) are touched — no O(n) rescans
        pending = [np.arange(nt, dtype=np.int64)]
        while pending:
            u = pending.pop() if len(pending) == 1 else np.concatenate(
                [pending.pop() for _ in range(len(pending))]
            )
            u = u[row_to_col[u] < 0]
            if u.size == 0:
                continue
            if u.size > chunk:
                pending.append(u[chunk:])
                u = u[:chunk]
            v = nb[u] - p[None, :]
            if ns >= 2:
                part = np.argpartition(v, ns - 2, axis=1)[:, ns - 2:]
                pv = np.take_along_axis(v, part, axis=1)
                which = np.argmax(pv, axis=1)
                ar = np.arange(u.size)
                best_j = part[ar, which]
                best_v = pv[ar, which]
                second_v = pv[ar, 1 - which]
            else:
                best_j = np.zeros(u.size, dtype=np.int64)
                best_v = v[:, 0]
                second_v = best_v  # degenerate: bid = price + eps
            bid = p[best_j] + (best_v - second_v) + eps
            # per-column winner: sort by (col, bid), keep the last
            order = np.lexsort((bid, best_j))
            bj, bb, br = best_j[order], bid[order], u[order]
            last = np.nonzero(np.r_[bj[1:] != bj[:-1], True])[0]
            wc, wb, wr = bj[last], bb[last], br[last]
            prev = col_to_row[wc]
            outbid = prev[prev >= 0]
            row_to_col[outbid] = -1
            col_to_row[wc] = wr
            row_to_col[wr] = wc
            p[wc] = wb
            if outbid.size:
                pending.append(outbid)
            if wr.size < u.size:  # bid-losers requeue at new prices
                pending.append(u[np.isin(u, wr, invert=True)])
    return row_to_col[:nt0]


def _min_cost_transport(cost: np.ndarray, demand: int, capacity: int):
    """Exact min-cost transportation: each row needs ``demand`` units, each
    column supplies at most ``capacity``; every (i, j) arc has capacity 1
    and cost ``cost[i, j]``.

    Successive shortest augmenting paths with potentials: costs are
    non-negative and every augmentation uses Dijkstra on REDUCED costs
    (non-negative by the potential invariant), so each path found is a
    true shortest path and the final flow is optimal (classic SSP
    optimality argument). Returns the boolean match matrix.
    """
    nt, ns = cost.shape
    need = (
        np.full(nt, demand, dtype=np.int64)
        if np.isscalar(demand)
        else np.asarray(demand, dtype=np.int64).copy()
    )
    avail = (
        np.full(ns, capacity, dtype=np.int64)
        if np.isscalar(capacity)
        else np.asarray(capacity, dtype=np.int64).copy()
    )
    if need.sum() > avail.sum():
        raise ValueError(
            f"infeasible: total demand {need.sum()} exceeds total "
            f"capacity {avail.sum()}"
        )
    if need.max(initial=0) > ns:
        raise ValueError(f"n_matches={need.max()} > {ns} available sources")
    flow = np.zeros((nt, ns), dtype=bool)
    pt = np.zeros(nt)  # target potentials
    ps = np.zeros(ns)  # source potentials
    inf = np.inf
    for _ in range(int(need.sum())):
        # Dijkstra over the residual bipartite graph. Node order: targets
        # 0..nt-1, sources nt..nt+ns-1.
        # dist_* hold true tentative/final distances (read by the potential
        # update); w* are the frontier views with settled entries pinned to
        # inf, so each iteration is two argmins + one full-row relaxation —
        # no per-iteration masked-copy allocations.
        dist_t = np.where(need > 0, 0.0, inf)
        dist_s = np.full(ns, inf)
        # ONE frontier array (targets then sources) → one argmin per settle
        w = np.concatenate([dist_t, dist_s])
        wt = w[:nt]
        ws = w[nt:]
        done_t = np.zeros(nt, dtype=bool)
        done_s = np.zeros(ns, dtype=bool)
        par_s = np.full(ns, -1, dtype=np.int64)   # source ← target (forward)
        par_t = np.full(nt, -1, dtype=np.int64)   # target ← source (backward)
        end = -1
        while True:
            idx = int(np.argmin(w))
            if w[idx] >= inf:
                break
            if idx >= nt:
                js = idx - nt
                dsv = ws[js]
                # settle source js; if it has spare capacity we are done
                if avail[js] > 0:
                    end = js
                    break
                ws[js] = inf
                done_s[js] = True
                # backward arcs js→i exist where flow[i, js] (reduced cost
                # = -c + ps[js] - pt[i] ≥ 0 by the invariant); compare
                # against the TRUE tentative distances and mask settled
                # targets explicitly (wt is only the argmin frontier)
                back = np.flatnonzero(flow[:, js])
                if len(back):
                    nd = dsv - cost[back, js] + ps[js] - pt[back]
                    upd = (nd < dist_t[back]) & ~done_t[back]
                    bi = back[upd]
                    wt[bi] = nd[upd]
                    dist_t[bi] = nd[upd]
                    par_t[bi] = js
            else:
                it = idx
                dt = wt[it]
                wt[it] = inf
                done_t[it] = True
                # forward arcs it→j for every non-flow source, one full-row
                # relaxation; settled sources masked explicitly
                nd = dt + cost[it] + (pt[it] - ps)
                nd[flow[it]] = inf
                upd = (nd < dist_s) & ~done_s
                if upd.any():
                    ws[upd] = nd[upd]
                    dist_s[upd] = nd[upd]
                    par_s[upd] = it
        if end < 0:
            raise ValueError("infeasible: residual graph disconnected")
        d_end = dist_s[end]
        # potential update keeps all residual reduced costs ≥ 0
        pt += np.minimum(dist_t, d_end)
        ps += np.minimum(dist_s, d_end)
        # trace the augmenting path and flip flow along it
        j = end
        while True:
            i = par_s[j]
            flow[i, j] = True
            if par_t[i] < 0:
                break
            jj = par_t[i]
            flow[i, jj] = False
            j = jj
        need[i] -= 1
        avail[end] -= 1
    return flow


def _greedy_cover(iu, ju, ecost, k, n, start=None, infeasible_none=False):
    """Cheapest-edge greedy cover + a drop-redundant sweep (descending
    cost): a feasible incumbent, typically within a few percent of
    optimal. Edges are assumed cost-sorted ascending. ``start`` seeds
    the cover with a pre-chosen edge set (the Lagrangian-repair
    incumbent extends the negative-reduced-cost edges this way);
    ``infeasible_none`` returns None instead of raising when the graph
    cannot cover every deficit."""
    m = len(ecost)
    if start is None:
        chosen = np.zeros(m, dtype=bool)
        deg = np.zeros(n, dtype=np.int64)
    else:
        chosen = start.copy()
        deg = np.bincount(iu[chosen], minlength=n) + np.bincount(
            ju[chosen], minlength=n
        )
    for e in range(m):
        if not chosen[e] and (deg[iu[e]] < k or deg[ju[e]] < k):
            chosen[e] = True
            deg[iu[e]] += 1
            deg[ju[e]] += 1
        if (deg >= k).all():
            break
    if not (deg >= k).all():
        if infeasible_none:
            return None
        raise ValueError("infeasible: not enough distinct partners")
    # edges picked early can become redundant once later ones cover both
    # endpoints — drop them most-expensive-first
    for e in np.flatnonzero(chosen)[::-1]:
        if deg[iu[e]] > k and deg[ju[e]] > k:
            chosen[e] = False
            deg[iu[e]] -= 1
            deg[ju[e]] -= 1
    return chosen, float(ecost[chosen].sum())


def _swap_improve(iu, ju, ecost, k, n, chosen):
    """Repeated first-improvement swaps on a feasible cover: drop a chosen
    edge e=(a,b) and re-cover each endpoint that falls below k with its
    cheapest available incident edge (covering an endpoint never breaks
    the other vertex — degrees only grow there). Closes most of the
    greedy incumbent's few-percent gap, which is what lets root
    reduced-cost fixing bite."""
    chosen = chosen.copy()
    deg = np.bincount(iu[chosen], minlength=n) + np.bincount(
        ju[chosen], minlength=n
    )
    inc = [np.flatnonzero((iu == v) | (ju == v)) for v in range(n)]
    improved = True
    while improved:
        improved = False
        for e in np.flatnonzero(chosen):
            a, b = int(iu[e]), int(ju[e])
            repair = 0.0
            radd = []
            ok = True
            for v in (a, b):
                if deg[v] > k:
                    continue
                cand = inc[v]
                cand = cand[(~chosen[cand]) & (cand != e)]
                if len(cand) == 0:
                    ok = False
                    break
                f = int(cand[0])  # inc is cost-ascending
                repair += float(ecost[f])
                radd.append(f)
            if not ok or float(ecost[e]) <= repair + 1e-12:
                continue
            chosen[e] = False
            deg[a] -= 1
            deg[b] -= 1
            for f in radd:
                chosen[f] = True
                deg[iu[f]] += 1
                deg[ju[f]] += 1
            improved = True
    return chosen, float(ecost[chosen].sum())


def _lagrangian_dual(iu, ju, ecost, k, n, ub, iters=1500):
    """Subgradient dual ascent on the cover constraints: L(λ) =
    k·Σλ_v + Σ_e min(0, w_e − λ_u − λ_v) is a valid lower bound on the
    b-edge-cover optimum for ANY λ ≥ 0 (weak duality). Classic Polyak
    steps α(UB − L)/‖g‖², α halved on stagnation. Returns the best λ
    and its bound."""
    # start at half the k-th cheapest incident cost: prices every vertex
    # roughly at its marginal cover cost
    lam = np.zeros(n)
    for v in range(n):
        ivc = np.sort(
            np.concatenate([ecost[iu == v], ecost[ju == v]])
        )
        lam[v] = 0.5 * ivc[min(k - 1, len(ivc) - 1)]
    best_l, best_lam = -np.inf, lam.copy()
    alpha, stall = 2.0, 0
    for _ in range(iters):
        r = ecost - lam[iu] - lam[ju]
        neg = r < 0
        lval = k * lam.sum() + r[neg].sum()
        if lval > best_l + 1e-12:
            best_l, best_lam = lval, lam.copy()
            stall = 0
        else:
            stall += 1
            if stall >= 20:
                alpha *= 0.6
                stall = 0
                if alpha < 1e-5:
                    break
        deg = np.bincount(iu[neg], minlength=n) + np.bincount(
            ju[neg], minlength=n
        )
        g = (k - deg).astype(np.float64)
        g[(lam <= 0.0) & (g < 0.0)] = 0.0  # projection at the boundary
        nrm = float(g @ g)
        if nrm == 0.0:
            break  # complementary degrees: dual optimum reached
        lam = np.maximum(0.0, lam + alpha * max(ub - lval, 1e-12) / nrm * g)
    return best_lam, best_l


def _bec_core(
    iu: np.ndarray,
    ju: np.ndarray,
    ecost: np.ndarray,
    n: int,
    k: int,
    node_budget: int,
    ub_init: float = np.inf,
    x_init: np.ndarray | None = None,
    ascent_iters: int = 8,
    raise_on_budget: bool = True,
):
    """Exact min-weight b-edge cover over an EDGE LIST (not necessarily
    complete; edges cost-sorted ascending): DFS branch-and-bound on the
    cheapest available edge of the most deficient vertex, pruned by the
    MAX of two admissible bounds:

    (a) the Lagrangian cover bound L(λ) = k·Σλ + Σ_{fixed-in} r_e +
        Σ_{free, r<0} r_e with r_e = w_e − λ_u − λ_v — valid for any
        λ ≥ 0 and any fix/ban set by weak duality — RE-ASCENDED at every
        node (a few warm-started Polyak subgradient steps from the
        parent's λ), so the bound adapts to branching decisions and
        climbs past the incumbent deep in the tree where a static-λ
        bound plateaus inside the LP duality gap;
    (b) the half-sum bound: half the sum, over deficit vertices, of each
        one's (k − deg) cheapest available incident TRUE costs (every
        completion edge serves at most two endpoints).

    Root preprocessing: Lagrangian-repair incumbent, reduced-cost fixing
    (ban edges whose r alone pushes the root bound past the incumbent;
    the incumbent itself survives, so an optimum stays reachable), and
    pre-fixing of edges whose REMOVAL does (bound-without-e > UB ⟹ e is
    in every optimal solution).

    Exact by construction — complete search, admissible bounds. Returns
    ``(chosen_edge_mask, cost)``; raises ValueError if the edge list
    cannot cover every vertex k times, RuntimeError past ``node_budget``.
    """
    m = len(ecost)
    chosen0, gcost = _greedy_cover(iu, ju, ecost, k, n)
    chosen0, gcost = _swap_improve(iu, ju, ecost, k, n, chosen0)
    best = {"cost": gcost, "x": chosen0}
    if x_init is not None and ub_init < gcost:
        best = {"cost": float(ub_init), "x": x_init.copy()}

    lam, _ = _lagrangian_dual(iu, ju, ecost, k, n, ub=best["cost"])
    red = ecost - lam[iu] - lam[ju]
    neg = red < 0.0
    lbase = float(k * lam.sum() + red[neg].sum())

    # Lagrangian-repair incumbent: the negative-reduced-cost edges,
    # deficits repaired cheapest-first, redundant edges dropped (the
    # shared _greedy_cover sweep, seeded) — often beats plain greedy
    # and tightens root fixing
    res = _greedy_cover(iu, ju, ecost, k, n, start=neg,
                        infeasible_none=True)
    if res is not None:
        rep, rcost = _swap_improve(iu, ju, ecost, k, n, res[0])
        if rcost < best["cost"]:
            best["cost"] = rcost
            best["x"] = rep.copy()

    banned = np.zeros(m, dtype=bool)
    cur = np.zeros(m, dtype=bool)
    banned[(red >= 0.0) & (lbase + red >= best["cost"] - 1e-12)] = True
    prefix = np.flatnonzero(neg & (lbase - red > best["cost"] + 1e-9))
    deg0 = np.zeros(n, dtype=np.int64)
    cost0 = 0.0
    for e in prefix:
        cur[e] = True
        deg0[iu[e]] += 1
        deg0[ju[e]] += 1
        cost0 += float(ecost[e])

    # per-vertex incident edge indices over the SURVIVING edges,
    # ascending (cost-sorted == global)
    alive = ~banned
    inc = [
        np.flatnonzero(((iu == v) | (ju == v)) & alive) for v in range(n)
    ]
    inc_cost = [ecost[ix] for ix in inc]

    import sys as _sys

    _old_limit = _sys.getrecursionlimit()
    _sys.setrecursionlimit(max(_old_limit, 4 * m + 500))
    nodes = 0

    def half_sum_bound(deg: np.ndarray) -> float:
        lb = 0.0
        for v in range(n):
            r = k - deg[v]
            if r <= 0:
                continue
            ix = inc[v]
            ok = ~(banned[ix] | cur[ix])
            if int(ok.sum()) < r:
                return np.inf
            lb += inc_cost[v][ok][:r].sum()
        return 0.5 * lb

    def node_ascend(lam_n: np.ndarray):
        """A few Polyak subgradient steps on the node's restricted dual,
        warm-started from the parent's λ. Every iterate's L is a valid
        bound (weak duality holds at ANY λ ≥ 0), so the max is too."""
        free = ~(banned | cur)
        best_l, best_lam = -np.inf, lam_n
        alpha = 1.0
        for _ in range(ascent_iters):
            r = ecost - lam_n[iu] - lam_n[ju]
            selneg = free & (r < 0.0)
            lval = float(
                k * lam_n.sum() + r[cur].sum() + r[selneg].sum()
            )
            if lval > best_l:
                best_l, best_lam = lval, lam_n
                if best_l >= best["cost"] - 1e-12:
                    break  # prunes — no need to polish further
            x = cur | selneg
            dx = np.bincount(iu[x], minlength=n) + np.bincount(
                ju[x], minlength=n
            )
            g = (k - dx).astype(np.float64)
            g[(lam_n <= 0.0) & (g < 0.0)] = 0.0
            nrm = float(g @ g)
            if nrm == 0.0:
                break
            lam_n = np.maximum(
                0.0,
                lam_n + alpha * max(best["cost"] - lval, 1e-12) / nrm * g,
            )
            alpha *= 0.7
        return best_l, best_lam

    def dfs(cost_so_far: float, deg: np.ndarray, lam_n: np.ndarray) -> None:
        nonlocal nodes
        nodes += 1
        if nodes > node_budget:
            raise RuntimeError(
                "b-edge-cover search exceeded node_budget — reduce the "
                "point count (blossom-style matching is the scale path)"
            )
        deficit = k - deg
        if (deficit <= 0).all():
            if cost_so_far < best["cost"]:
                best["cost"] = cost_so_far
                best["x"] = cur.copy()
            return
        lb, lam_b = node_ascend(lam_n)
        if lb >= best["cost"] - 1e-12:
            return
        if cost_so_far + half_sum_bound(deg) >= best["cost"] - 1e-12:
            return
        v = int(np.argmax(deficit))
        ix = inc[v]
        ok = np.flatnonzero(~(banned[ix] | cur[ix]))
        if len(ok) < deficit[v]:
            return
        e = int(ix[ok[0]])
        a, b = int(iu[e]), int(ju[e])
        # IN
        cur[e] = True
        deg[a] += 1
        deg[b] += 1
        dfs(cost_so_far + float(ecost[e]), deg, lam_b)
        deg[a] -= 1
        deg[b] -= 1
        cur[e] = False
        # OUT (ban e on this path)
        banned[e] = True
        dfs(cost_so_far, deg, lam_b)
        banned[e] = False

    try:
        dfs(cost0, deg0, lam)
    except RuntimeError:
        if raise_on_budget:
            raise
        # best-so-far is still a valid (possibly suboptimal) cover —
        # callers using raise_on_budget=False want exactly that
    finally:
        _sys.setrecursionlimit(_old_limit)
    return best["x"], float(best["cost"])


def _b_edge_cover_bnb(
    cost: np.ndarray,
    k: int,
    node_budget: int = 2_000_000,
) -> np.ndarray:
    """Exact minimum-weight b-edge cover on a complete graph: choose binary
    x_ij (i<j) minimizing Σ d_ij x_ij with every vertex covered ≥ k times —
    the reference's WITHIN-set matching MIP (graph/_matching.py:104-147).

    Two-phase exact solve via :func:`_bec_core`: first an exact search
    restricted to each vertex's (k+2) cheapest incident edges (a tiny
    space whose optimum is a near-optimal cover of the full problem —
    used ONLY as a warm incumbent, silently skipped if the restricted
    graph is infeasible or trips its own small budget), then the full
    search warm-started from it. A tight incumbent makes the root
    reduced-cost fixing eliminate almost every long edge of a geometric
    instance before branching starts. ``node_budget`` raises loudly
    rather than return a silently suboptimal cover. Returns the boolean
    upper-triangular choice matrix.
    """
    n = cost.shape[0]
    if k >= n:
        raise ValueError(f"n_matches={k} needs at least {k + 1} points")
    iu, ju = np.triu_indices(n, 1)
    ecost = cost[iu, ju]
    order = np.argsort(ecost, kind="stable")
    iu, ju, ecost = iu[order], ju[order], ecost[order]
    m = len(ecost)

    ub, xw = np.inf, None
    # warm incumbent from the (k+2)-nearest-edge subgraph
    keep = np.zeros(m, dtype=bool)
    for v in range(n):
        ix = np.flatnonzero((iu == v) | (ju == v))
        keep[ix[: k + 2]] = True
    sub = np.flatnonzero(keep)
    if len(sub) < m:
        try:
            # best-so-far on budget: the warm phase only needs a good
            # incumbent, not a proof
            sx, sc = _bec_core(
                iu[sub], ju[sub], ecost[sub], n, k,
                node_budget=min(node_budget, 50_000),
                raise_on_budget=False,
            )
            xw = np.zeros(m, dtype=bool)
            xw[sub[sx]] = True
            ub = sc
        except ValueError:
            ub, xw = np.inf, None

    bx, _ = _bec_core(
        iu, ju, ecost, n, k, node_budget, ub_init=ub, x_init=xw
    )
    x = np.zeros((n, n), dtype=bool)
    sel = np.flatnonzero(bx)
    x[iu[sel], ju[sel]] = True
    return x


def spatial_matching(
    x,
    y=None,
    n_matches: int = 5,
    metric: str = "euclidean",
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_points: int = 20_000,
    max_within: int = 64,
):
    """Optimal between-sets spatial matching.

    Parameters mirror the reference (graph/_matching.py:11-68): ``x`` =
    targets needing matches, ``y`` = sources supplying them; both may be
    Datasets with (id, x, y) columns or (n, 2) numpy coordinate arrays.
    ``metric="precomputed"`` takes ``x`` as the dense target×source cost
    matrix. Returns (heads, tails, weights) sorted like the reference
    (_matching.py:162-171): target ids, matched source ids, unit weights.

    ``y=None`` (within-set matching) is solved EXACTLY up to
    ``max_within`` points by Lagrangian-dual branch-and-bound (see the
    module docstring) and raises loudly beyond that budget.
    """
    if y is None:
        if metric == "precomputed":
            cost = np.asarray(x, dtype=np.float64)
            x_ids = np.arange(cost.shape[0], dtype=np.int64)
        elif metric == "euclidean":
            x_ids, xp = _collect_points(x, id_col, x_col, y_col)
            dx = xp[:, 0:1] - xp[None, :, 0]
            dy = xp[:, 1:2] - xp[None, :, 1]
            cost = np.sqrt(dx * dx + dy * dy)
        else:
            raise ValueError(f"unsupported metric {metric!r}")
        if cost.shape[0] > max_within:
            raise NotImplementedError(
                "within-set matching couples pairs through a non-totally-"
                "unimodular constraint matrix, so the exact optimum here "
                "comes from branch-and-bound (_b_edge_cover_bnb), bounded "
                f"at max_within={max_within} points; a blossom-style "
                "general matching solver is the path beyond that."
            )
        import sys

        m = cost.shape[0] * (cost.shape[0] - 1) // 2
        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, m + 200))
        try:
            sel = _b_edge_cover_bnb(cost, n_matches)
        finally:
            sys.setrecursionlimit(old)
        ti, sj = np.nonzero(sel)
        # mirror both directions like the reference (_matching.py:166-167)
        heads = np.concatenate([x_ids[ti], x_ids[sj]])
        tails = np.concatenate([x_ids[sj], x_ids[ti]])
        order = np.lexsort((tails, heads))
        return heads[order], tails[order], np.ones(len(order))
    if metric == "precomputed":
        cost = np.asarray(x, dtype=np.float64)
        x_ids = np.arange(cost.shape[0], dtype=np.int64)
        y_ids = np.arange(cost.shape[1], dtype=np.int64)
    elif metric == "euclidean":
        x_ids, xp = _collect_points(x, id_col, x_col, y_col)
        y_ids, yp = _collect_points(y, id_col, x_col, y_col)
        if len(xp) > max_points or len(yp) > max_points:
            raise ValueError(
                f"matching is a driver-side global optimization; "
                f"{max(len(xp), len(yp))} points exceed max_points="
                f"{max_points}"
            )
        if n_matches == 1 and len(xp) == len(yp):
            tx = _collinear_param(xp, yp)
            if tx is not None:
                # 1-D closed form (rearrangement inequality: on a line,
                # sorted-order pairing minimizes Σ|aᵢ−b_σ(i)|): O(n log n),
                # no n² cost matrix, exact at any size
                t_x, t_y = tx
                ti = np.argsort(t_x, kind="stable")
                sj = np.argsort(t_y, kind="stable")
                order = np.lexsort((sj, ti))
                return (x_ids[ti[order]], y_ids[sj[order]],
                        np.ones(len(order)))
        dx = xp[:, 0:1] - yp[None, :, 0]
        dy = xp[:, 1:2] - yp[None, :, 1]
        cost = np.sqrt(dx * dx + dy * dy)
    else:
        raise ValueError(f"unsupported metric {metric!r}")

    if n_matches == 1:
        # assignment case. Route by cost structure:
        # * integer costs that fit the auction's (ns+1)-scaled int64
        #   headroom → ε-scaling auction, EXACT;
        # * non-integral floats at ≤ _SSP_FLOAT_EXACT points → the SSP
        #   float path, exact in float64 (no quantization);
        # * everything else → auction on costs integerized at the finest
        #   step int64 allows (range/⌊2⁵⁹/(ns+1)⌋ ≈ 2⁻⁴⁴·range at 10k
        #   points): the result is the exact optimum of the quantized
        #   instance, within n·step of the float optimum.
        nt_, ns_ = cost.shape
        if nt_ > ns_:
            raise ValueError(
                f"infeasible: total demand {nt_} exceeds total "
                f"capacity {ns_}"
            )
        cmax = float(np.abs(cost).max(initial=0.0))
        ri = np.rint(cost)
        integral = np.array_equal(ri, cost)
        headroom = (1 << 59) // (ns_ + 1)
        ti = np.arange(nt_, dtype=np.int64)
        if cmax == 0.0:
            sj = ti.copy()  # all costs equal: any assignment is optimal
        elif integral and cmax < headroom:
            sj = _auction_assignment(ri.astype(np.int64))
        elif not integral and max(nt_, ns_) <= _SSP_FLOAT_EXACT:
            flow = _min_cost_transport(cost, demand=1, capacity=1)
            ti, sj = np.nonzero(flow)
        else:
            s = float(headroom) / cmax
            sj = _auction_assignment(np.rint(cost * s).astype(np.int64))
    else:
        flow = _min_cost_transport(cost, demand=n_matches, capacity=n_matches)
        ti, sj = np.nonzero(flow)
    order = np.lexsort((sj, ti))
    heads = x_ids[ti[order]]
    tails = y_ids[sj[order]]
    weights = np.ones(len(order))
    return heads, tails, weights
