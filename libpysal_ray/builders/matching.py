"""Optimal spatial matching (reference ``graph/_matching.py``).

Reference semantics (``_spatial_matching``, graph/_matching.py:11-172):
choose binary matches m_ij minimizing total matched distance
Σ d_ij · m_ij subject to every target i getting at least ``n_matches``
matches and (between two datasets) every source j being used at most
``n_matches`` times. The reference hands the MIP to pulp/CBC.

This engine solves the BETWEEN-sets problem exactly without any solver
dependency: the bipartite constraint matrix is totally unimodular, so the
LP relaxation has an integral optimum, and that optimum is found by
min-cost flow — implemented here as successive shortest augmenting paths
with Johnson potentials over the dense bipartite residual graph (pure
numpy; every relaxation is a vectorized row/column scan). The result is a
provably optimal binary matching, not a heuristic: total cost equals the
reference MIP optimum (tie sets may select different edges — the optimum
need not be unique; tests compare objective value and constraint
satisfaction, the invariants the LP defines).

WITHIN-set matching (y=None, reference graph/_matching.py:104-147) couples
m_ij to both endpoints through one upper-triangle variable; that
constraint matrix is NOT totally unimodular (odd cycles make the LP
relaxation half-integral), so no flow formulation is exact. The engine
solves it EXACTLY by branch-and-bound over the cost-sorted edge list
(:func:`_b_edge_cover_bnb`, admissible half-sum bound), guarded by
``max_within`` points; beyond that it raises — a blossom-style general
matching solver is the scale path, and returning the relaxation silently
would be wrong.

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


def _b_edge_cover_bnb(
    cost: np.ndarray,
    k: int,
    node_budget: int = 2_000_000,
) -> np.ndarray:
    """Exact minimum-weight b-edge cover on a complete graph: choose binary
    x_ij (i<j) minimizing Σ d_ij x_ij with every vertex covered ≥ k times —
    the reference's WITHIN-set matching MIP (graph/_matching.py:104-147).

    Branch-and-bound on the cheapest available edge of the most
    deficient vertex, with the ADMISSIBLE half-sum bound: any completion
    pays at least half the sum, over deficit vertices, of each one's
    (k − deg) cheapest still-available incident edges (every edge is
    counted by at most its two endpoints). The bound is weak for k ≥ 2,
    so proof cost grows exponentially past a few dozen points —
    ``node_budget`` raises loudly instead of returning a silently
    suboptimal cover (a blossom-style b-matching solver is the honest
    scale path). Returns the boolean upper-triangular choice matrix.
    """
    n = cost.shape[0]
    if k >= n:
        raise ValueError(f"n_matches={k} needs at least {k + 1} points")
    iu, ju = np.triu_indices(n, 1)
    ecost = cost[iu, ju]
    order = np.argsort(ecost, kind="stable")
    iu, ju, ecost = iu[order], ju[order], ecost[order]
    m = len(ecost)
    # per-vertex incident edge indices, ascending (cost-sorted == global)
    inc = [np.flatnonzero((iu == v) | (ju == v)) for v in range(n)]
    inc_cost = [ecost[ix] for ix in inc]

    # greedy incumbent: satisfy deficits with cheapest available edges
    deg = np.zeros(n, dtype=np.int64)
    chosen = np.zeros(m, dtype=bool)
    gcost = 0.0
    for e in range(m):
        if deg[iu[e]] < k or deg[ju[e]] < k:
            chosen[e] = True
            gcost += ecost[e]
            deg[iu[e]] += 1
            deg[ju[e]] += 1
        if (deg >= k).all():
            break
    if not (deg >= k).all():
        raise ValueError("infeasible: not enough distinct partners")
    best = {"cost": gcost, "x": chosen.copy()}

    # suffix count of incident edges per vertex (feasibility prune)
    import sys as _sys

    _old_limit = _sys.getrecursionlimit()
    _sys.setrecursionlimit(max(_old_limit, 4 * m + 500))
    nodes = 0
    cur = np.zeros(m, dtype=bool)
    banned = np.zeros(m, dtype=bool)

    def lower_bound(deg: np.ndarray) -> float:
        # half the sum of each deficit vertex's cheapest AVAILABLE
        # (neither chosen nor banned) incident edges — admissible because
        # every completion edge is counted by at most its two endpoints
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

    def dfs(cost_so_far: float, deg: np.ndarray) -> None:
        # branch on the cheapest available edge of the MOST deficient
        # vertex: in-branches satisfy deficits directly, out-branches ban
        # the edge and push the bound up — far tighter than scanning the
        # global edge order
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
        lb = lower_bound(deg)
        if cost_so_far + lb >= best["cost"] - 1e-12:
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
        dfs(cost_so_far + ecost[e], deg)
        deg[a] -= 1
        deg[b] -= 1
        cur[e] = False
        # OUT (ban e on this path)
        banned[e] = True
        dfs(cost_so_far, deg)
        banned[e] = False

    try:
        dfs(0.0, np.zeros(n, dtype=np.int64))
    finally:
        _sys.setrecursionlimit(_old_limit)
    x = np.zeros((n, n), dtype=bool)
    sel = np.flatnonzero(best["x"])
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
    max_within: int = 24,
):
    """Optimal between-sets spatial matching.

    Parameters mirror the reference (graph/_matching.py:11-68): ``x`` =
    targets needing matches, ``y`` = sources supplying them; both may be
    Datasets with (id, x, y) columns or (n, 2) numpy coordinate arrays.
    ``metric="precomputed"`` takes ``x`` as the dense target×source cost
    matrix. Returns (heads, tails, weights) sorted like the reference
    (_matching.py:162-171): target ids, matched source ids, unit weights.

    ``y=None`` (within-set matching) raises — see the module docstring.
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
        dx = xp[:, 0:1] - yp[None, :, 0]
        dy = xp[:, 1:2] - yp[None, :, 1]
        cost = np.sqrt(dx * dx + dy * dy)
    else:
        raise ValueError(f"unsupported metric {metric!r}")

    flow = _min_cost_transport(cost, demand=n_matches, capacity=n_matches)
    ti, sj = np.nonzero(flow)
    order = np.lexsort((sj, ti))
    heads = x_ids[ti[order]]
    tails = y_ids[sj[order]]
    weights = np.ones(len(order))
    return heads, tails, weights
