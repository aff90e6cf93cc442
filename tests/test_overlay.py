"""spatial_overlay (intersection/difference attributes) vs closed-form
expected areas — rectangles, a triangle clip, a concave subject, and the
convexity guard."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.spatial.overlay import (
    overlay_difference,
    overlay_intersection,
)


def _polys(items):
    """items: list of (pid, xs, ys)."""
    return ray.data.from_arrow(
        pa.table(
            {
                "polygon_id": pa.array(
                    [p for p, _, _ in items], pa.int64()
                ),
                "xs": pa.array([list(map(float, x)) for _, x, _ in items],
                               pa.list_(pa.float64())),
                "ys": pa.array([list(map(float, y)) for _, _, y in items],
                               pa.list_(pa.float64())),
            }
        )
    )


def _unit_squares(n):
    items = []
    for r in range(n):
        for c in range(n):
            items.append(
                (r * n + c,
                 [c, c + 1, c + 1, c, c],
                 [r, r, r + 1, r + 1, r])
            )
    return _polys(items)


def test_overlay_rect_grid(ray_session):
    left = _unit_squares(3)
    right = _polys([(100, [0.5, 2.5, 2.5, 0.5, 0.5],
                     [0.5, 0.5, 2.5, 2.5, 0.5])])
    got = {
        (r["left_id"], r["right_id"]): r["area"]
        for r in overlay_intersection(left, right).take_all()
    }
    assert len(got) == 9
    # corners 0.25, edge-centers 0.5, center 1.0 — all exact
    assert got[(0, 100)] == 0.25
    assert got[(1, 100)] == 0.5
    assert got[(4, 100)] == 1.0
    assert abs(sum(got.values()) - 4.0) < 1e-12


def test_overlay_triangle_clip(ray_session):
    # square [0,2]^2 clipped by triangle (0,0),(3,0),(0,3):
    # the x+y=3 line cuts off a 0.5-area corner -> 3.5
    left = _polys([(0, [0, 2, 2, 0, 0], [0, 0, 2, 2, 0])])
    right = _polys([(7, [0, 3, 0], [0, 0, 3])])
    rows = overlay_intersection(left, right).take_all()
    assert len(rows) == 1
    assert abs(rows[0]["area"] - 3.5) < 1e-12


def test_overlay_cw_clip_reoriented(ray_session):
    # clockwise clip ring must be reoriented, not rejected
    left = _polys([(0, [0, 2, 2, 0, 0], [0, 0, 2, 2, 0])])
    right = _polys([(7, [0, 0, 3], [0, 3, 0])])  # CW triangle
    rows = overlay_intersection(left, right).take_all()
    assert len(rows) == 1
    assert abs(rows[0]["area"] - 3.5) < 1e-12


def test_overlay_concave_subject(ray_session):
    # L-shape (outer 2x2 minus top-right 1x1) clipped by the right
    # half-plane square [1,2]x[0,2]: remaining piece is [1,2]x[0,1] = 1.0
    left = _polys([(0,
                    [0, 2, 2, 1, 1, 0, 0],
                    [0, 0, 1, 1, 2, 2, 0])])
    right = _polys([(9, [1, 2, 2, 1, 1], [0, 0, 2, 2, 0])])
    rows = overlay_intersection(left, right).take_all()
    assert len(rows) == 1
    assert abs(rows[0]["area"] - 1.0) < 1e-12


def test_overlay_nonconvex_clip_raises(ray_session):
    left = _polys([(0, [0, 2, 2, 0, 0], [0, 0, 2, 2, 0])])
    right = _polys([(1,
                     [0, 2, 2, 1, 1, 0, 0],
                     [0, 0, 1, 1, 2, 2, 0])])  # L-shape: not convex
    with pytest.raises(Exception, match="convex"):
        overlay_intersection(left, right).take_all()


def test_overlay_difference(ray_session):
    left = _unit_squares(3)
    right = _polys([(100, [0.5, 2.5, 2.5, 0.5, 0.5],
                     [0.5, 0.5, 2.5, 2.5, 0.5])])
    got = {r["left_id"]: r["area"]
           for r in overlay_difference(left, right).take_all()}
    # center square fully covered -> dropped; corners keep 0.75
    assert 4 not in got
    assert got[0] == 0.75
    assert got[1] == 0.5
    assert abs(sum(got.values()) - (9.0 - 4.0)) < 1e-12


def test_overlay_disjoint_pair_absent(ray_session):
    left = _polys([(0, [0, 1, 1, 0, 0], [0, 0, 1, 1, 0])])
    right = _polys([(5, [10, 11, 11, 10, 10], [10, 10, 11, 11, 10])])
    assert overlay_intersection(left, right).take_all() == []
    got = overlay_difference(left, right).take_all()
    assert len(got) == 1 and got[0]["area"] == 1.0


def test_overlay_multi_tile_dedup(ray_session):
    # force tiny cells so both polygons span MANY tiles; the corner rule
    # must still count the pair exactly once with the exact area
    left = _polys([(0, [0, 10, 10, 0, 0], [0, 0, 10, 10, 0])])
    right = _polys([(1, [5, 15, 15, 5, 5], [5, 5, 15, 15, 5])])
    rows = overlay_intersection(left, right, cell_size=2.0).take_all()
    assert len(rows) == 1
    assert rows[0]["area"] == 25.0


def test_overlay_modes_closed_form(ray_session):
    from libpysal_ray.spatial.overlay import overlay

    left = _polys([
        (1, [0, 1, 1, 0, 0], [0, 0, 1, 1, 0]),
        (2, [3, 4, 4, 3, 3], [0, 0, 1, 1, 0]),
    ])
    right = _polys([(10, [0.5, 1.5, 1.5, 0.5, 0.5], [0, 0, 1, 1, 0])])

    def rows(how):
        return sorted(
            ((r["left_id"], r["right_id"], r["area"])
             for r in overlay(left, right, how=how).take_all()),
            key=lambda t: (t[0] is None, t[0] or 0, t[1] is None, t[1] or 0),
        )

    assert rows("intersection") == [(1, 10, 0.5)]
    assert sorted(
        (r["left_id"], r["area"])
        for r in overlay(left, right, how="difference").take_all()
    ) == [(1, 0.5), (2, 1.0)]
    assert rows("identity") == [
        (1, 10, 0.5), (1, None, 0.5), (2, None, 1.0)]
    assert rows("union") == [
        (1, 10, 0.5), (1, None, 0.5), (2, None, 1.0), (None, 10, 0.5)]
    assert rows("symmetric_difference") == [
        (1, None, 0.5), (2, None, 1.0), (None, 10, 0.5)]
    with pytest.raises(ValueError):
        overlay(left, right, how="bogus")
