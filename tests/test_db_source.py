"""SQLite WKB geometry source: codec + roundtrip into the contiguity path."""

import struct

import numpy as np
import pytest

from libpysal_ray.builders.contiguity import rook
from libpysal_ray.sources.db import (
    parse_wkb_polygon,
    polygon_to_wkb,
    read_db_polygons,
    write_db_polygons,
)


def test_wkb_codec_roundtrip():
    xs = [0.0, 1.0, 1.0, 0.0, 0.0]
    ys = [0.0, 0.0, 1.0, 1.0, 0.0]
    buf = polygon_to_wkb(xs, ys)
    xs2, ys2 = parse_wkb_polygon(buf)
    assert xs2 == xs and ys2 == ys


def test_wkb_big_endian():
    xs = [0.0, 2.0, 2.0, 0.0]
    ys = [0.0, 0.0, 2.0, 0.0]
    buf = bytearray()
    buf += struct.pack(">BII", 0, 3, 1)
    buf += struct.pack(">I", 4)
    for x, y in zip(xs, ys):
        buf += struct.pack(">2d", x, y)
    xs2, ys2 = parse_wkb_polygon(bytes(buf))
    assert xs2 == xs and ys2 == ys


def test_wkb_ewkb_srid_skipped():
    xs = [0.0, 1.0, 0.0]
    ys = [0.0, 1.0, 1.0]
    buf = bytearray()
    buf += struct.pack("<BII", 1, 3 | 0x20000000, 4326)
    buf += struct.pack("<II", 1, 3)
    for x, y in zip(xs, ys):
        buf += struct.pack("<2d", x, y)
    xs2, _ = parse_wkb_polygon(bytes(buf))
    assert xs2 == xs


def test_wkb_rejects_holes_and_multipolygon():
    buf = bytearray()
    buf += struct.pack("<BII", 1, 3, 2)  # two rings
    with pytest.raises(ValueError, match="rings"):
        parse_wkb_polygon(bytes(buf) + b"\x00" * 64)
    mp = struct.pack("<BII", 1, 6, 0)
    with pytest.raises(ValueError, match="MultiPolygon"):
        parse_wkb_polygon(mp)


def test_sqlite_roundtrip_feeds_rook(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    # 2x2 block of unit squares
    ids, xs_l, ys_l = [], [], []
    for r in range(2):
        for c in range(2):
            ids.append(r * 2 + c)
            xs_l.append([c, c + 1, c + 1, c, c])
            ys_l.append([r, r, r + 1, r + 1, r])
    polys = ray.data.from_arrow(
        pa.table(
            {
                "polygon_id": pa.array(np.asarray(ids, np.int64)),
                "xs": pa.array([[float(v) for v in x] for x in xs_l],
                               pa.list_(pa.float64())),
                "ys": pa.array([[float(v) for v in y] for y in ys_l],
                               pa.list_(pa.float64())),
            }
        )
    )
    db = str(tmp_path / "polys.sqlite")
    write_db_polygons(polys, db, "lattice")
    back = read_db_polygons(db, "lattice")
    g = rook(back)
    nd = g.neighbors_dict()[0]
    assert {k: sorted(v) for k, v in nd.items()} == {
        0: [1, 2], 1: [0, 3], 2: [0, 3], 3: [1, 2]
    }
