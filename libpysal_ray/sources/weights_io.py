"""Legacy weights interchange formats — GAL and GWT.

Reference: /root/reference/libpysal/io/iohandlers/gal.py:13-261 and
gwt.py (graph variants graph/io/_gal.py:4-64, _gwt.py:4-38).

* GAL: header ``n`` (or ``0 n shp key``), then per-observation two lines:
  ``id  k`` and the k neighbor ids. Binary weights.
* GWT: header ``0 n shp key``, then one line per edge:
  ``focal neighbor weight``.

These are small legacy text files (the reference parses them line by line
in-process); the engine reads them driver-side into an Arrow edge table →
Dataset, and writes them by STREAMING ``iter_batches`` over the canonical
edge order — the Dataset is never collected whole.
"""

from __future__ import annotations

import numpy as np

from libpysal_ray.core import edges as E
from libpysal_ray.core.graph import RayGraph


def read_gal(path: str) -> RayGraph:
    with open(path) as f:
        header = f.readline().split()
        # header forms: "n"  or  "0 n shapefile key"
        _n = int(header[0]) if len(header) == 1 else int(header[1])
        focal, neighbor, ids = [], [], []
        while True:
            line = f.readline()
            if not line.strip():
                break
            fid, k = line.split()[:2]
            fid, k = int(fid), int(k)
            ids.append(fid)
            if k > 0:
                nbrs = [int(x) for x in f.readline().split()]
                focal.extend([fid] * len(nbrs))
                neighbor.extend(nbrs)
            else:
                f.readline()  # empty neighbor line
    ds = E.from_arrays(
        np.asarray(focal, np.int64), np.asarray(neighbor, np.int64), 1.0
    )
    return RayGraph(E.resolve_isolates(ds, np.asarray(ids, np.int64)))


def write_gal(g: RayGraph, path: str) -> None:
    rows: dict[int, list[int]] = {}
    for batch in E.canonical(g.edges).iter_batches(batch_format="pyarrow"):
        f = batch.column("focal").to_numpy(zero_copy_only=False)
        n = batch.column("neighbor").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        for i in range(len(f)):
            rows.setdefault(int(f[i]), [])
            if not (f[i] == n[i] and w[i] == 0.0):
                rows[int(f[i])].append(int(n[i]))
    with open(path, "w") as out:
        out.write(f"{len(rows)}\n")
        for fid in sorted(rows):
            nbrs = rows[fid]
            out.write(f"{fid} {len(nbrs)}\n")
            out.write(" ".join(str(x) for x in nbrs) + "\n")


def read_gwt(path: str) -> RayGraph:
    focal, neighbor, weight = [], [], []
    with open(path) as f:
        f.readline()  # header
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            focal.append(int(parts[0]))
            neighbor.append(int(parts[1]))
            weight.append(float(parts[2]))
    return RayGraph.from_arrays(
        np.asarray(focal, np.int64),
        np.asarray(neighbor, np.int64),
        np.asarray(weight, np.float64),
    )


def write_gwt(g: RayGraph, path: str, shp: str = "unknown",
              key: str = "id") -> None:
    n = g.n()
    with open(path, "w") as out:
        out.write(f"0 {n} {shp} {key}\n")
        for batch in E.canonical(g.edges).iter_batches(batch_format="pyarrow"):
            f = batch.column("focal").to_numpy(zero_copy_only=False)
            nb = batch.column("neighbor").to_numpy(zero_copy_only=False)
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            for i in range(len(f)):
                if f[i] == nb[i] and w[i] == 0.0:
                    continue  # isolate marker — GAL/GWT encode by absence
                out.write(f"{int(f[i])} {int(nb[i])} {w[i]:.10g}\n")


def read_mtx(path: str) -> RayGraph:
    """MatrixMarket coordinate format (io/iohandlers/mtx.py) — COO triplets
    ARE the edge table; 1-based indices per the format spec."""
    focal, neighbor, weight = [], [], []
    n = 0
    with open(path) as f:
        for line in f:
            if line.startswith("%"):
                continue
            n_rows, _n_cols, _nnz = line.split()[:3]
            n = int(n_rows)
            break
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            focal.append(int(parts[0]) - 1)
            neighbor.append(int(parts[1]) - 1)
            weight.append(float(parts[2]) if len(parts) > 2 else 1.0)
    ds = E.from_arrays(
        np.asarray(focal, np.int64),
        np.asarray(neighbor, np.int64),
        np.asarray(weight, np.float64),
    )
    return RayGraph(E.resolve_isolates(ds, np.arange(n, dtype=np.int64)))


def write_mtx(g: RayGraph, path: str) -> None:
    n = g.n()
    real = g.edges.map_batches(E.drop_isolate_markers, batch_format="pyarrow")
    nnz = real.count()
    with open(path, "w") as out:
        out.write("%%MatrixMarket matrix coordinate real general\n")
        out.write(f"{n} {n} {nnz}\n")
        for batch in E.canonical(real).iter_batches(batch_format="pyarrow"):
            f = batch.column("focal").to_numpy(zero_copy_only=False)
            nb = batch.column("neighbor").to_numpy(zero_copy_only=False)
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            for i in range(len(f)):
                out.write(f"{int(f[i]) + 1} {int(nb[i]) + 1} {w[i]:.10g}\n")


def read_arcgis_text(path: str) -> RayGraph:
    """ArcGIS ASCII text weights (io/iohandlers/arcgis_txt.py): line 1 is
    the id-variable header; then (origin, destination, weight) triplets
    with integer ids. Zero-weight SELF-neighbor rows are ignored
    (arcgis_txt.py semantics — ArcGIS treats absent self entries as 0)."""
    focal, neighbor, weight = [], [], []
    with open(path) as f:
        f.readline()  # header: id variable name
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            o, d, w = int(parts[0]), int(parts[1]), float(parts[2])
            if o == d and w == 0.0:
                continue
            focal.append(o)
            neighbor.append(d)
            weight.append(w)
    return RayGraph.from_arrays(
        np.asarray(focal, np.int64),
        np.asarray(neighbor, np.int64),
        np.asarray(weight, np.float64),
    )


def write_arcgis_text(g: RayGraph, path: str, id_var: str = "ID") -> None:
    with open(path, "w") as out:
        out.write(f"{id_var}\n")
        for batch in E.canonical(
            g.edges.map_batches(E.drop_isolate_markers, batch_format="pyarrow")
        ).iter_batches(batch_format="pyarrow"):
            f = batch.column("focal").to_numpy(zero_copy_only=False)
            nb = batch.column("neighbor").to_numpy(zero_copy_only=False)
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            for i in range(len(f)):
                out.write(f"{int(f[i])} {int(nb[i])} {w[i]:.10g}\n")


def read_dat(path: str) -> RayGraph:
    """LeSage MatLab ``.dat`` weights (io/iohandlers/dat.py): headerless
    (origin, destination, weight) triplets, record numbers starting at 1
    (ids may be written as floats — ``5.0`` reads as id 5)."""
    focal, neighbor, weight = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            focal.append(int(float(parts[0])))
            neighbor.append(int(float(parts[1])))
            weight.append(float(parts[2]))
    return RayGraph.from_arrays(
        np.asarray(focal, np.int64),
        np.asarray(neighbor, np.int64),
        np.asarray(weight, np.float64),
    )


def write_dat(g: RayGraph, path: str) -> None:
    with open(path, "w") as out:
        for batch in E.canonical(
            g.edges.map_batches(E.drop_isolate_markers, batch_format="pyarrow")
        ).iter_batches(batch_format="pyarrow"):
            f = batch.column("focal").to_numpy(zero_copy_only=False)
            nb = batch.column("neighbor").to_numpy(zero_copy_only=False)
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            for i in range(len(f)):
                out.write(f"{int(f[i])} {int(nb[i])} {w[i]:.10g}\n")


def read_csv_weights(path: str, header: bool = True) -> RayGraph:
    """Adjacency-list CSV (io parity with io/iohandlers/csvWrapper.py's
    weights use): comma-separated (origin, destination[, weight]) rows;
    weight defaults to 1.0 when the column is absent."""
    focal, neighbor, weight = [], [], []
    with open(path) as f:
        if header:
            f.readline()
        for line in f:
            parts = [p.strip() for p in line.split(",")]
            if len(parts) < 2 or not parts[0]:
                continue
            focal.append(int(float(parts[0])))
            neighbor.append(int(float(parts[1])))
            weight.append(float(parts[2]) if len(parts) > 2 and parts[2]
                          else 1.0)
    return RayGraph.from_arrays(
        np.asarray(focal, np.int64),
        np.asarray(neighbor, np.int64),
        np.asarray(weight, np.float64),
    )


def write_csv_weights(g: RayGraph, path: str) -> None:
    with open(path, "w") as out:
        out.write("focal,neighbor,weight\n")
        for batch in E.canonical(
            g.edges.map_batches(E.drop_isolate_markers, batch_format="pyarrow")
        ).iter_batches(batch_format="pyarrow"):
            f = batch.column("focal").to_numpy(zero_copy_only=False)
            nb = batch.column("neighbor").to_numpy(zero_copy_only=False)
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            for i in range(len(f)):
                out.write(f"{int(f[i])},{int(nb[i])},{w[i]:.10g}\n")


# ---------------------------------------------- ArcGIS binary formats (r3)
def read_arcgis_dbf(path: str) -> RayGraph:
    """ArcGIS DBF weights table (io/iohandlers/arcgis_dbf.py:36-163):
    columns (ID, NID, WEIGHT) — or 4 columns with a leading RECORD_ID —
    one row per directed edge, integer ids."""
    from libpysal_ray.sources.shapefile import read_dbf

    cols = read_dbf(path)
    names = list(cols)
    if len(names) == 3:
        i_c, j_c, w_c = names
    elif len(names) == 4:
        _rec, i_c, j_c, w_c = names
    else:
        raise ValueError(
            "a weights .dbf requires 3 data columns (or 4 with a leading "
            "record id)"
        )
    focal = np.asarray([int(v) for v in cols[i_c]], np.int64)
    neighbor = np.asarray([int(v) for v in cols[j_c]], np.int64)
    weight = np.asarray([float(v) for v in cols[w_c]], np.float64)
    return RayGraph.from_arrays(focal, neighbor, weight)


def write_arcgis_dbf(g: RayGraph, path: str, id_var: str = "ID") -> None:
    """One DBF row per directed edge, header [id_var, NID, WEIGHT]
    (arcgis_dbf.py:230-243); isolate markers encoded by absence."""
    ids, nids, ws = [], [], []
    for batch in E.canonical(g.edges).iter_batches(batch_format="pyarrow"):
        f = batch.column("focal").to_numpy(zero_copy_only=False)
        nb = batch.column("neighbor").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        for i in range(len(f)):
            if f[i] == nb[i] and w[i] == 0.0:
                continue
            ids.append(int(f[i]))
            nids.append(int(nb[i]))
            ws.append(float(w[i]))
    from libpysal_ray.sources.shapefile import write_dbf

    write_dbf(path, {id_var: ids, "NID": nids, "WEIGHT": ws})


def read_swm(path: str) -> RayGraph:
    """ArcGIS .swm binary weights (io/iohandlers/arcgis_swm.py:15-237):
    header line (``id_var;srs`` old style, or ``KEY@VALUE;...`` new style
    with optional FIXEDWEIGHTS), then little-endian records
    (org:int32, m:int32, m*int32 neighbor ids, m*float64 weights —
    or ONE float64 when fixed — and a float64 weight sum, present only
    when m > 0, matching the reference reader)."""
    import struct as _s

    focal, neighbor, weight, all_ids = [], [], [], []
    with open(path, "rb") as f:
        header = f.readline().decode()
        fixed = False
        if "@" in header:
            hd = dict(
                item.split("@", 1)
                for item in header.strip().split(";")
                if "@" in item
            )
            fixed = hd.get("FIXEDWEIGHTS", "").upper().strip() == "TRUE"
        no_obs, _row_std = _s.unpack("<2l", f.read(8))
        for _ in range(no_obs):
            org, m = _s.unpack("<2l", f.read(8))
            all_ids.append(org)
            if m > 0:
                nghs = _s.unpack(f"<{m}l", f.read(4 * m))
                if fixed:
                    (w0,) = _s.unpack("<d", f.read(8))
                    ws = [w0] * m
                else:
                    ws = _s.unpack(f"<{m}d", f.read(8 * m))
                f.read(8)  # W_SUM
                focal.extend([org] * m)
                neighbor.extend(nghs)
                weight.extend(ws)
    ds = E.from_arrays(
        np.asarray(focal, np.int64),
        np.asarray(neighbor, np.int64),
        np.asarray(weight, np.float64),
    )
    return RayGraph(E.resolve_isolates(ds, np.asarray(all_ids, np.int64)))


def write_swm(
    g: RayGraph, path: str, id_var: str = "Unknown", srs: str = "Unknown",
    row_std: bool = False,
) -> None:
    """Old-style SWM (``id_var;srs`` header — what the reference writer
    emits, arcgis_swm.py:266-276). The per-observation weight sum is
    written only for m > 0, matching the reference READER's layout (its
    writer emits the sum unconditionally, which its own reader cannot
    parse back for isolates — we mirror the reader)."""
    import struct as _s

    rows: dict[int, tuple[list[int], list[float]]] = {}
    for batch in E.canonical(g.edges).iter_batches(batch_format="pyarrow"):
        f = batch.column("focal").to_numpy(zero_copy_only=False)
        nb = batch.column("neighbor").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        for i in range(len(f)):
            rows.setdefault(int(f[i]), ([], []))
            if not (f[i] == nb[i] and w[i] == 0.0):
                rows[int(f[i])][0].append(int(nb[i]))
                rows[int(f[i])][1].append(float(w[i]))
    with open(path, "wb") as out:
        out.write(f"{id_var};{srs}\n".encode())
        out.write(_s.pack("<2l", len(rows), int(row_std)))
        for org in sorted(rows):
            nghs, ws = rows[org]
            out.write(_s.pack("<2l", org, len(nghs)))
            if nghs:
                out.write(_s.pack(f"<{len(nghs)}l", *nghs))
                out.write(_s.pack(f"<{len(ws)}d", *ws))
                out.write(_s.pack("<d", sum(ws)))
