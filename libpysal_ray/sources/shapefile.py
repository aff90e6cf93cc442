"""Shapefile (.shp/.dbf) ingestion — thin converter to the engine's
polygon schema ``(polygon_id, xs, ys)`` (+ DBF attribute columns).

Format layout per the public ESRI Shapefile Technical Description
(July 1998 whitepaper) and the dBASE III/IV header layout; reference
parity target: io/iohandlers/pyShpIO.py + weights/contiguity.py
``Rook.from_shapefile`` entry path.

Scope (the v1 reader the builders need):
* shape types 5 (Polygon) and 15/25 (PolygonZ/M, Z/M ignored); null
  shapes (type 0) skipped.
* shape types 3/13/23 (PolyLine/Z/M): identical record layout to
  Polygon — parts become rings under the same id, feeding the
  contiguity builders (the reference's linestring-contiguity path,
  weights/tests/test_contiguity.py:164-182).
* shape types 1/11/21 (Point/Z/M) and 8/18/28 (MultiPoint/Z/M): parsed
  into the points schema ``(id, x, y)`` for ``KNN.from_shapefile``
  parity (weights/distance.py:91, weights/util.py:1021-1066
  ``get_points_array_from_shapefile``).
* multi-ring records: every ring is emitted under the same polygon_id —
  exactly what the contiguity builders expect for multi-part polygons
  (their per-id vertex/segment dedup handles it).
* DBF: C (text), N/F (numeric) fields; others come through as text.

The driver parses the (small) file once and hands Ray a Dataset; web
scale ingestion is Parquet — this exists so a reference user's
shapefile workflows have an on-ramp.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data


def read_shp_polygons(path: str) -> list[tuple[int, list, list]]:
    """[(record_number-1, ring_xs, ring_ys), ...] — one entry per RING,
    polygon_id = record number - 1 (the reference's 0-based ids)."""
    out = []
    with open(path, "rb") as f:
        header = f.read(100)
        if len(header) < 100 or struct.unpack(">i", header[:4])[0] != 9994:
            raise ValueError(f"{path}: not a shapefile (bad magic)")
        shp_type = struct.unpack("<i", header[32:36])[0]
        if shp_type not in (0, 3, 5, 13, 15, 23, 25):
            raise NotImplementedError(
                f"shape type {shp_type}; ring-structured types only "
                "(Polygon 5/15/25, PolyLine 3/13/23) — use "
                "read_shp_points for Point/MultiPoint files"
            )
        while True:
            rec_header = f.read(8)
            if len(rec_header) < 8:
                break
            rec_no, content_len = struct.unpack(">ii", rec_header)
            content = f.read(content_len * 2)
            if len(content) < 4:
                break
            rtype = struct.unpack("<i", content[:4])[0]
            if rtype == 0:
                continue
            if rtype not in (3, 5, 13, 15, 23, 25):
                raise NotImplementedError(f"record shape type {rtype}")
            num_parts, num_points = struct.unpack("<ii", content[36:44])
            parts = struct.unpack(
                f"<{num_parts}i", content[44: 44 + 4 * num_parts]
            )
            pts_off = 44 + 4 * num_parts
            coords = np.frombuffer(
                content, dtype="<f8", count=2 * num_points, offset=pts_off
            ).reshape(-1, 2)
            bounds = list(parts) + [num_points]
            for p in range(num_parts):
                ring = coords[bounds[p]: bounds[p + 1]]
                out.append(
                    (rec_no - 1, ring[:, 0].tolist(), ring[:, 1].tolist())
                )
    return out


def read_shp_points(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ids, xs, ys) arrays from a Point/PointZ/PointM (1/11/21) or
    MultiPoint/Z/M (8/18/28) shapefile. Ids are 0-based running point
    indexes — the positional ids `get_points_array_from_shapefile`
    implies (reference weights/util.py:1056-1066); for single-Point
    files this equals record_number - 1."""
    ids: list[int] = []
    xs: list[float] = []
    ys: list[float] = []
    with open(path, "rb") as f:
        header = f.read(100)
        if len(header) < 100 or struct.unpack(">i", header[:4])[0] != 9994:
            raise ValueError(f"{path}: not a shapefile (bad magic)")
        shp_type = struct.unpack("<i", header[32:36])[0]
        if shp_type not in (0, 1, 8, 11, 18, 21, 28):
            raise NotImplementedError(
                f"shape type {shp_type}; only Point(1/11/21) and "
                "MultiPoint(8/18/28) — use read_shp_polygons for "
                "ring-structured files"
            )
        while True:
            rec_header = f.read(8)
            if len(rec_header) < 8:
                break
            _, content_len = struct.unpack(">ii", rec_header)
            content = f.read(content_len * 2)
            if len(content) < 4:
                break
            rtype = struct.unpack("<i", content[:4])[0]
            if rtype == 0:
                continue
            if rtype in (1, 11, 21):
                x, y = struct.unpack("<2d", content[4:20])
                ids.append(len(ids))
                xs.append(x)
                ys.append(y)
            elif rtype in (8, 18, 28):
                num_points = struct.unpack("<i", content[36:40])[0]
                coords = np.frombuffer(
                    content, dtype="<f8", count=2 * num_points, offset=40
                ).reshape(-1, 2)
                base = len(ids)
                ids.extend(range(base, base + num_points))
                xs.extend(coords[:, 0].tolist())
                ys.extend(coords[:, 1].tolist())
            else:
                raise NotImplementedError(f"record shape type {rtype}")
    return (
        np.asarray(ids, np.int64),
        np.asarray(xs, np.float64),
        np.asarray(ys, np.float64),
    )


def read_shapefile_points(shp_path: str) -> ray.data.Dataset:
    """Dataset (id, x, y) from a Point/MultiPoint shapefile — the KNN /
    kernel / distance-band builders' input schema, completing the
    legacy ``KNN.from_shapefile`` entry path (weights/distance.py:91)."""
    ids, xs, ys = read_shp_points(shp_path)
    return ray.data.from_arrow(
        pa.table(
            {"id": pa.array(ids), "x": pa.array(xs), "y": pa.array(ys)}
        )
    )


def write_shp_points(path: str, pts: list[tuple[float, float]]) -> None:
    """Minimal Point(1) writer (tests/fixtures): one record per point."""
    with open(path, "wb") as f:
        n = len(pts)
        total_len = 50 + n * (4 + 10)  # per record: 8B hdr + 20B content
        x = np.asarray([p[0] for p in pts], np.float64)
        y = np.asarray([p[1] for p in pts], np.float64)
        f.write(struct.pack(">7i", 9994, 0, 0, 0, 0, 0, total_len))
        f.write(struct.pack("<2i", 1000, 1))
        f.write(
            struct.pack(
                "<8d",
                x.min() if n else 0.0, y.min() if n else 0.0,
                x.max() if n else 0.0, y.max() if n else 0.0, 0, 0, 0, 0,
            )
        )
        for i in range(n):
            f.write(struct.pack(">ii", i + 1, 10))
            f.write(struct.pack("<i2d", 1, x[i], y[i]))


def write_shp_multipoint(
    path: str, groups: list[list[tuple[float, float]]]
) -> None:
    """Minimal MultiPoint(8) writer (tests/fixtures)."""
    recs = []
    gx = [p[0] for g in groups for p in g] or [0.0]
    gy = [p[1] for g in groups for p in g] or [0.0]
    for g in groups:
        x = np.asarray([p[0] for p in g], np.float64)
        y = np.asarray([p[1] for p in g], np.float64)
        content = struct.pack("<i", 8)
        content += struct.pack("<4d", x.min(), y.min(), x.max(), y.max())
        content += struct.pack("<i", len(g))
        content += np.column_stack([x, y]).astype("<f8").tobytes()
        recs.append(content)
    with open(path, "wb") as f:
        total_len = 50 + sum(4 + len(c) // 2 for c in recs)
        f.write(struct.pack(">7i", 9994, 0, 0, 0, 0, 0, total_len))
        f.write(struct.pack("<2i", 1000, 8))
        f.write(
            struct.pack("<8d", min(gx), min(gy), max(gx), max(gy),
                        0, 0, 0, 0)
        )
        for i, c in enumerate(recs):
            f.write(struct.pack(">ii", i + 1, len(c) // 2))
            f.write(c)


def write_shp_polylines(path: str, lines: list[tuple[list, list]]) -> None:
    """Minimal PolyLine(3) writer (tests/fixtures): one single-part arc
    per (xs, ys) — vertices written as given (NOT auto-closed)."""
    recs = []
    gx0 = gy0 = np.inf
    gx1 = gy1 = -np.inf
    for xs, ys in lines:
        x = np.asarray(xs, np.float64)
        y = np.asarray(ys, np.float64)
        gx0, gy0 = min(gx0, x.min()), min(gy0, y.min())
        gx1, gy1 = max(gx1, x.max()), max(gy1, y.max())
        content = struct.pack("<i", 3)
        content += struct.pack("<4d", x.min(), y.min(), x.max(), y.max())
        content += struct.pack("<ii", 1, len(x))
        content += struct.pack("<i", 0)
        content += np.column_stack([x, y]).astype("<f8").tobytes()
        recs.append(content)
    with open(path, "wb") as f:
        total_len = 50 + sum(4 + len(c) // 2 for c in recs)
        f.write(struct.pack(">7i", 9994, 0, 0, 0, 0, 0, total_len))
        f.write(struct.pack("<2i", 1000, 3))
        f.write(struct.pack("<8d", gx0, gy0, gx1, gy1, 0, 0, 0, 0))
        for i, c in enumerate(recs):
            f.write(struct.pack(">ii", i + 1, len(c) // 2))
            f.write(c)


def read_dbf(path: str) -> dict[str, list]:
    """DBF → {column: values} (C as str, N/F as float/int)."""
    with open(path, "rb") as f:
        header = f.read(32)
        n_records = struct.unpack("<i", header[4:8])[0]
        header_size, record_size = struct.unpack("<hh", header[8:12])
        fields = []
        while True:
            fd = f.read(32)
            if fd[0:1] == b"\r":
                break
            if len(fd) < 32:
                break
            name = fd[:11].split(b"\x00")[0].decode("ascii", "replace")
            ftype = fd[11:12].decode("ascii")
            flen = fd[16]
            fdec = fd[17]
            fields.append((name, ftype, flen, fdec))
        f.seek(header_size)
        cols: dict[str, list] = {name: [] for name, *_ in fields}
        for _ in range(n_records):
            rec = f.read(record_size)
            if len(rec) < record_size:
                break
            if rec[0:1] == b"*":  # deleted record
                continue
            off = 1
            for name, ftype, flen, fdec in fields:
                raw = rec[off: off + flen]
                off += flen
                s = raw.decode("ascii", "replace").strip()
                if ftype in ("N", "F"):
                    if s == "":
                        cols[name].append(None)
                    elif fdec > 0 or ftype == "F" or "." in s:
                        cols[name].append(float(s))
                    else:
                        cols[name].append(int(s))
                else:
                    cols[name].append(s)
    return cols


def read_shapefile(
    shp_path: str, dbf_path: str | None = None
) -> ray.data.Dataset:
    """Dataset (polygon_id, xs, ys [, dbf columns]) — rings grouped per
    polygon_id into one row (list columns hold the concatenated outer
    ring; multi-ring polygons emit one row per ring, same id).
    Point/MultiPoint files dispatch to the (id, x, y) points schema
    (attributes joined positionally for single-Point files)."""
    with open(shp_path, "rb") as f:
        header = f.read(36)
    shp_type = struct.unpack("<i", header[32:36])[0] if len(header) >= 36 \
        else -1
    if shp_type in (1, 8, 11, 18, 21, 28):
        ids, xs, ys = read_shp_points(shp_path)
        cols = {"id": pa.array(ids), "x": pa.array(xs), "y": pa.array(ys)}
        if dbf_path is not None and shp_type in (1, 11, 21):
            for name, vals in read_dbf(dbf_path).items():
                cols[name] = pa.array(vals)
        return ray.data.from_arrow(pa.table(cols))
    rings = read_shp_polygons(shp_path)
    pid = [r[0] for r in rings]
    xs = [r[1] for r in rings]
    ys = [r[2] for r in rings]
    cols: dict = {
        "polygon_id": pa.array(np.asarray(pid, np.int64)),
        "xs": pa.array(xs, pa.list_(pa.float64())),
        "ys": pa.array(ys, pa.list_(pa.float64())),
    }
    if dbf_path is not None:
        attrs = read_dbf(dbf_path)
        for name, vals in attrs.items():
            cols[name] = pa.array([vals[i] for i in pid])
    return ray.data.from_arrow(pa.table(cols))


def write_shp_polygons(
    path: str, polys: list[tuple[list, list]]
) -> None:
    """Minimal writer (tests/fixtures): one single-ring Polygon record
    per (xs, ys); rings closed automatically."""
    recs = []
    gx0 = gy0 = np.inf
    gx1 = gy1 = -np.inf
    for xs, ys in polys:
        x = np.asarray(xs, np.float64)
        y = np.asarray(ys, np.float64)
        if x[0] != x[-1] or y[0] != y[-1]:
            x = np.append(x, x[0])
            y = np.append(y, y[0])
        gx0, gy0 = min(gx0, x.min()), min(gy0, y.min())
        gx1, gy1 = max(gx1, x.max()), max(gy1, y.max())
        content = struct.pack("<i", 5)
        content += struct.pack(
            "<4d", x.min(), y.min(), x.max(), y.max()
        )
        content += struct.pack("<ii", 1, len(x))
        content += struct.pack("<i", 0)
        content += np.column_stack([x, y]).astype("<f8").tobytes()
        recs.append(content)
    with open(path, "wb") as f:
        total_len = 50 + sum(4 + len(c) // 2 for c in recs)
        f.write(struct.pack(">7i", 9994, 0, 0, 0, 0, 0, total_len))
        f.write(struct.pack("<2i", 1000, 5))
        f.write(struct.pack("<8d", gx0, gy0, gx1, gy1, 0, 0, 0, 0))
        for i, c in enumerate(recs):
            f.write(struct.pack(">ii", i + 1, len(c) // 2))
            f.write(c)


def write_dbf(path: str, cols: dict[str, list]) -> None:
    """Minimal dBASE III writer (tests/fixtures): N for numeric columns,
    C(32) for everything else."""
    names = list(cols)
    n = len(next(iter(cols.values()))) if cols else 0
    fields = []
    for name in names:
        vals = cols[name]
        numeric = all(isinstance(v, (int, float)) for v in vals)
        fields.append((name, "N" if numeric else "C", 18 if numeric else 32))
    record_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    with open(path, "wb") as f:
        f.write(bytes([3, 95, 7, 26]))
        f.write(struct.pack("<i", n))
        f.write(struct.pack("<hh", header_size, record_size))
        f.write(b"\x00" * 20)
        for name, ftype, flen in fields:
            f.write(name.encode("ascii")[:11].ljust(11, b"\x00"))
            f.write(ftype.encode("ascii"))
            f.write(b"\x00" * 4)
            f.write(bytes([flen, 0]))
            f.write(b"\x00" * 14)
        f.write(b"\r")
        for i in range(n):
            f.write(b" ")
            for name, ftype, flen in fields:
                v = cols[name][i]
                if ftype == "N":
                    s = (f"{v:.6f}" if isinstance(v, float) else str(v))
                    f.write(s.rjust(flen).encode("ascii")[:flen])
                else:
                    f.write(str(v).ljust(flen).encode("ascii")[:flen])
        f.write(b"\x1a")


def parse_wkt_polygon(wkt: str) -> tuple[list, list]:
    """Outer ring (xs, ys) of a WKT POLYGON (io parity with the
    reference's WKT reader, io/iohandlers/wkt.py; interior rings —
    holes — are ignored, matching the contiguity builders' outer-ring
    schema)."""
    s = wkt.strip()
    up = s.upper()
    if not up.startswith("POLYGON"):
        raise ValueError(f"not a WKT POLYGON: {s[:40]!r}")
    inner = s[s.index("(") + 1:s.rindex(")")]
    # first ring = up to the first ring-closing paren
    ring = inner[inner.index("(") + 1:inner.index(")")]
    xs, ys = [], []
    for pair in ring.split(","):
        px, py = pair.split()[:2]
        xs.append(float(px))
        ys.append(float(py))
    return xs, ys


def polygons_from_wkt(
    ds: ray.data.Dataset, wkt_col: str = "wkt", id_col: str = "polygon_id"
) -> ray.data.Dataset:
    """(id, wkt) Dataset → the engine polygon schema
    (polygon_id, xs, ys) — a vectorless map_batches parse, so WKT-keyed
    web tables feed the contiguity builders directly."""

    def _parse(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        xs_out, ys_out = [], []
        for w in t.column(wkt_col).to_pylist():
            xs, ys = parse_wkt_polygon(w)
            xs_out.append(xs)
            ys_out.append(ys)
        return pa.table(
            {
                "polygon_id": pa.array(ids),
                "xs": pa.array(xs_out, pa.list_(pa.float64())),
                "ys": pa.array(ys_out, pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(_parse, batch_format="pyarrow")
