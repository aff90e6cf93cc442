"""dissolve_stats: segment-cancellation area/perimeter on hand fixtures."""

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.spatial.ops import dissolve_stats


def _polys(cells):
    """cells: list of (label, r, c) unit squares."""
    ids, labs, xs_l, ys_l = [], [], [], []
    for i, (lab, r, c) in enumerate(cells):
        ids.append(i)
        labs.append(lab)
        xs_l.append([float(c), c + 1.0, c + 1.0, float(c), float(c)])
        ys_l.append([float(r), float(r), r + 1.0, r + 1.0, float(r)])
    return ray.data.from_arrow(
        pa.table(
            {
                "polygon_id": pa.array(np.asarray(ids, np.int64)),
                "xs": pa.array(xs_l, pa.list_(pa.float64())),
                "ys": pa.array(ys_l, pa.list_(pa.float64())),
                "label": pa.array(np.asarray(labs, np.int64)),
            }
        )
    )


def test_dissolve_square_block(ray_session):
    # 2x2 block of one label: area 4, exterior perimeter 8
    ds = _polys([(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1)])
    rows = dissolve_stats(ds).take_all()
    assert len(rows) == 1
    assert rows[0]["label"] == 0
    assert rows[0]["area"] == 4.0
    assert rows[0]["perimeter"] == 8.0


def test_dissolve_l_shape_and_singleton(ray_session):
    # label 0 is an L-tromino (area 3, perimeter 8); label 1 a single cell
    ds = _polys([(0, 0, 0), (0, 0, 1), (0, 1, 0), (1, 5, 5)])
    got = {r["label"]: r for r in dissolve_stats(ds).take_all()}
    assert got[0]["area"] == 3.0 and got[0]["perimeter"] == 8.0
    assert got[1]["area"] == 1.0 and got[1]["perimeter"] == 4.0


def test_dissolve_disjoint_group(ray_session):
    # two separated cells of one label: areas add, perimeters add
    ds = _polys([(0, 0, 0), (0, 0, 5)])
    rows = dissolve_stats(ds).take_all()
    assert rows[0]["area"] == 2.0 and rows[0]["perimeter"] == 8.0
