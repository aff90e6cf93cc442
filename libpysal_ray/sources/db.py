"""SQL-database geometry source (reference ``io/iohandlers/db.py``).

The reference reads geometry tables through sqlalchemy + shapely WKB into
GeoJSON-ish dicts (db.py:21-66). This engine keeps the same capability —
"feed polygon layers straight from a spatial SQLite/SpatiaLite-style
table" — with zero dependencies: stdlib ``sqlite3`` plus a hand-rolled
WKB polygon codec, emitting the engine polygon schema
``(polygon_id, xs, ys)`` that every contiguity builder consumes.

WKB support: 2-D ``Polygon`` (type 3), both byte orders, optional EWKB
SRID flag (0x20000000 — SRID word skipped). Interior rings raise — the
engine polygon schema is single-ring (same restriction as the WKT
parser, shapefile.py:229-251); MultiPolygon raises with a pointer to
exploding multiparts upstream.

Scale note: like the other legacy sources this is a driver-side ingest
boundary (a SQLite file is a single-machine artifact); the Dataset it
returns then distributes normally. Parquet remains the engine's native
exchange format.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pyarrow as pa
import ray.data

_EWKB_SRID = 0x20000000


def parse_wkb_polygon(buf: bytes) -> tuple[list[float], list[float]]:
    """WKB Polygon → (xs, ys) exterior ring."""
    if len(buf) < 9:
        raise ValueError("truncated WKB")
    bo = "<" if buf[0] == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", buf, 1)
    off = 5
    if gtype & _EWKB_SRID:
        gtype &= ~_EWKB_SRID
        off += 4  # skip SRID
    if gtype == 6:
        raise ValueError(
            "WKB MultiPolygon unsupported — explode multiparts into one "
            "row per part upstream"
        )
    if gtype != 3:
        raise ValueError(f"WKB geometry type {gtype} is not Polygon")
    (n_rings,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    if n_rings != 1:
        raise ValueError(
            f"polygon has {n_rings} rings; interior rings (holes) are "
            "unsupported by the single-ring engine schema"
        )
    (n_pts,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    coords = struct.unpack_from(bo + f"{2 * n_pts}d", buf, off)
    xs = list(coords[0::2])
    ys = list(coords[1::2])
    return xs, ys


def polygon_to_wkb(xs, ys) -> bytes:
    """(xs, ys) closed exterior ring → little-endian WKB Polygon."""
    n = len(xs)
    out = bytearray()
    out += struct.pack("<BII", 1, 3, 1)
    out += struct.pack("<I", n)
    for x, y in zip(xs, ys):
        out += struct.pack("<2d", float(x), float(y))
    return bytes(out)


def read_db_polygons(
    path: str,
    table: str,
    id_col: str = "polygon_id",
    geom_col: str = "geometry",
) -> ray.data.Dataset:
    """SQLite table with a WKB geometry column → (polygon_id, xs, ys)."""
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            f'SELECT "{id_col}", "{geom_col}" FROM "{table}"'  # noqa: S608
        ).fetchall()
    finally:
        con.close()
    ids, xs_out, ys_out = [], [], []
    for pid, blob in rows:
        xs, ys = parse_wkb_polygon(blob)
        ids.append(int(pid))
        xs_out.append(xs)
        ys_out.append(ys)
    return ray.data.from_arrow(
        pa.table(
            {
                "polygon_id": pa.array(np.asarray(ids, np.int64)),
                "xs": pa.array(xs_out, pa.list_(pa.float64())),
                "ys": pa.array(ys_out, pa.list_(pa.float64())),
            }
        )
    )


def write_db_polygons(
    polys: ray.data.Dataset,
    path: str,
    table: str,
    id_col: str = "polygon_id",
    geom_col: str = "geometry",
) -> None:
    """Engine polygon Dataset → SQLite WKB table (streamed per batch)."""
    con = sqlite3.connect(path)
    try:
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "{table}" '  # noqa: S608
            f'("{id_col}" INTEGER PRIMARY KEY, "{geom_col}" BLOB)'
        )
        for batch in polys.iter_batches(batch_format="pyarrow"):
            ids = batch.column("polygon_id").to_numpy(zero_copy_only=False)
            xs_l = batch.column("xs").to_pylist()
            ys_l = batch.column("ys").to_pylist()
            con.executemany(
                f'INSERT OR REPLACE INTO "{table}" VALUES (?, ?)',  # noqa: S608
                [
                    (int(i), polygon_to_wkb(xs, ys))
                    for i, xs, ys in zip(ids, xs_l, ys_l)
                ],
            )
        con.commit()
    finally:
        con.close()
