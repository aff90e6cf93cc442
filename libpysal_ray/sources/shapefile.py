"""Shapefile (.shp/.dbf) ingestion — thin converter to the engine's
polygon schema ``(polygon_id, xs, ys)`` (+ DBF attribute columns).

Format layout per the public ESRI Shapefile Technical Description
(July 1998 whitepaper) and the dBASE III/IV header layout; reference
parity target: io/iohandlers/pyShpIO.py + weights/contiguity.py
``Rook.from_shapefile`` entry path.

Scope (the v1 reader the builders need):
* shape types 5 (Polygon) and 15 (PolygonZ, Z/M ignored); null shapes
  (type 0) skipped.
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
        if shp_type not in (0, 5, 15):
            raise NotImplementedError(
                f"shape type {shp_type}; only Polygon(5)/PolygonZ(15)"
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
            if rtype not in (5, 15):
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
    ring; multi-ring polygons emit one row per ring, same id)."""
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
