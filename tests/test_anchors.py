"""Anchor generation vs the canonical py-faster-rcnn values."""

import numpy as np

from dtt.core.anchors import generate_base_anchors, grid_anchors


# The famous 9-anchor table printed in py-faster-rcnn's generate_anchors.py
# docstring (base_size=16, ratios=[0.5,1,2], scales=[8,16,32]).
CANONICAL_9 = np.array(
    [
        [-84., -40., 99., 55.],
        [-176., -88., 191., 103.],
        [-360., -184., 375., 199.],
        [-56., -56., 71., 71.],
        [-120., -120., 135., 135.],
        [-248., -248., 263., 263.],
        [-36., -80., 51., 95.],
        [-80., -168., 95., 183.],
        [-168., -344., 183., 359.],
    ]
)


def test_canonical_base_anchors():
    got = generate_base_anchors(16, (0.5, 1.0, 2.0), (8.0, 16.0, 32.0))
    np.testing.assert_array_equal(got, CANONICAL_9.astype(np.float32))


def test_grid_anchor_shifts():
    a = grid_anchors(2, 3, feat_stride=16, scales=(8.0, 16.0, 32.0))
    assert a.shape == (2 * 3 * 9, 4)
    base = generate_base_anchors(16, (0.5, 1.0, 2.0), (8.0, 16.0, 32.0))
    # cell (y=1, x=2) -> flat index (1*3+2)*9
    np.testing.assert_allclose(a[(1 * 3 + 2) * 9], base[0] + np.array([32, 16, 32, 16]))
    np.testing.assert_allclose(a[:9], base)


def test_vid_default_anchor_count():
    a = grid_anchors(38, 68, feat_stride=16, scales=(4.0, 8.0, 16.0, 32.0))
    assert a.shape == (38 * 68 * 12, 4)
    # anchors must be centered on their cells
    ctr_x = (a[:, 0] + a[:, 2]) / 2.0
    cell_x = np.tile(np.repeat(np.arange(68) * 16, 12), 38) + 7.5
    np.testing.assert_allclose(ctr_x, cell_x, atol=0.51)
