"""Golden-vector tests for anchor generation.

Golden table below = the exact output of the reference's Python
generate_anchors() (ref lib/layer_utils/generate_anchors.py:41-107, verified
by executing its math).  Note: the MATLAB table in the reference's comment
block (generate_anchors.py:14-39) is the same anchors in MATLAB's 1-indexed
convention — each coordinate is +1 relative to the Python output.
"""

import numpy as np

from tpudenoise.ops.anchors import anchor_grid, generate_anchors, num_anchors

GOLDEN_ANCHORS = np.array([
    [-84., -40., 99., 55.],
    [-176., -88., 191., 103.],
    [-360., -184., 375., 199.],
    [-56., -56., 71., 71.],
    [-120., -120., 135., 135.],
    [-248., -248., 263., 263.],
    [-36., -80., 51., 95.],
    [-80., -168., 95., 183.],
    [-168., -344., 183., 359.],
])


def test_base_anchors_match_matlab_golden():
    anchors = generate_anchors()
    np.testing.assert_array_equal(anchors, GOLDEN_ANCHORS)


def test_num_anchors():
    assert num_anchors() == 9
    assert num_anchors(anchor_scales=(4, 8, 16, 32)) == 12


def test_anchor_grid_shape_and_shift():
    h, w, stride = 5, 7, 16
    grid = np.asarray(anchor_grid(h, w, stride))
    assert grid.shape == (h * w * 9, 4)
    # first cell = truncated base anchors (the reference _tf path casts the
    # base anchors to int32 before shifting, snippets.py:41)
    np.testing.assert_array_equal(grid[:9], GOLDEN_ANCHORS.astype(np.int32))
    # one step in x shifts all 4 coords' x by stride
    np.testing.assert_array_equal(grid[9:18],
                                  GOLDEN_ANCHORS + [stride, 0, stride, 0])
    # one row down shifts y by stride
    np.testing.assert_array_equal(grid[9 * w:9 * w + 9],
                                  GOLDEN_ANCHORS + [0, stride, 0, stride])


def test_anchor_grid_matches_numpy_reference_impl():
    """Cross-check vs a straight port of generate_anchors_pre
    (ref snippets.py:14-30)."""
    h, w, stride = 38, 63, 16
    anchors = generate_anchors()
    shift_x = np.arange(0, w) * stride
    shift_y = np.arange(0, h) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.vstack((sx.ravel(), sy.ravel(),
                        sx.ravel(), sy.ravel())).transpose()
    k = shifts.shape[0]
    ref = (anchors.reshape((1, 9, 4))
           + shifts.reshape((1, k, 4)).transpose((1, 0, 2)))
    ref = ref.reshape((k * 9, 4)).astype(np.float32)
    got = np.asarray(anchor_grid(h, w, stride))
    np.testing.assert_array_equal(got, ref)
