"""NMS parity: device NMS (scan + fixpoint) vs the py_cpu_nms oracle
(ref lib/nms/py_cpu_nms.py:10-38)."""

import numpy as np
import pytest

from tpudenoise.ops.nms import (build_suppression_masks,
                                build_suppression_masks_pallas, nms,
                                nms_fixpoint, nms_packed, nms_py)


def _rand_dets(rng, n, scale=200.0):
    x1 = rng.uniform(0, scale, n)
    y1 = rng.uniform(0, scale, n)
    w = rng.uniform(5, 80, n)
    h = rng.uniform(5, 80, n)
    # unique scores: greedy order under ties is implementation-defined
    # (reference argsort()[::-1] reverses index order, device argsort is
    # stable — same kept SET, different order; see nms() docstring)
    scores = rng.permutation(n).astype(np.float64) / n
    return np.stack([x1, y1, x1 + w, y1 + h, scores], axis=1).astype(
        np.float32)


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
@pytest.mark.parametrize('thresh', [0.3, 0.5, 0.7])
def test_nms_matches_oracle(seed, thresh):
    rng = np.random.RandomState(seed)
    dets = _rand_dets(rng, 200)
    want = nms_py(dets, thresh)
    keep, mask = nms(dets[:, :4], dets[:, 4], thresh, max_outputs=200)
    got = list(np.asarray(keep)[np.asarray(mask)])
    assert got == want


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('thresh', [0.3, 0.7])
def test_nms_fixpoint_matches_oracle(seed, thresh):
    rng = np.random.RandomState(seed)
    dets = _rand_dets(rng, 300)
    want = nms_py(dets, thresh)
    keep, mask = nms_fixpoint(dets[:, :4], dets[:, 4], thresh,
                              max_outputs=300)
    got = list(np.asarray(keep)[np.asarray(mask)])
    assert got == want


def test_nms_truncates_at_max_outputs():
    rng = np.random.RandomState(0)
    dets = _rand_dets(rng, 500)
    want = nms_py(dets, 0.7)[:20]
    keep, mask = nms(dets[:, :4], dets[:, 4], 0.7, max_outputs=20)
    got = list(np.asarray(keep)[np.asarray(mask)])
    assert got == want
    keep2, mask2 = nms_fixpoint(dets[:, :4], dets[:, 4], 0.7, max_outputs=20)
    got2 = list(np.asarray(keep2)[np.asarray(mask2)])
    assert got2 == want


def test_nms_respects_valid_mask():
    rng = np.random.RandomState(1)
    dets = _rand_dets(rng, 100)
    valid = rng.uniform(size=100) > 0.5
    want = nms_py(dets[valid], 0.5)
    # map back to original indices
    orig_idx = np.where(valid)[0]
    want = [int(orig_idx[i]) for i in want]
    keep, mask = nms(dets[:, :4], dets[:, 4], 0.5, max_outputs=100,
                     valid=valid)
    got = list(np.asarray(keep)[np.asarray(mask)])
    assert got == want


def test_nms_chain_not_oversuppressed():
    """A suppresses B, B would suppress C but B is dead -> C must be kept."""
    boxes = np.array([
        [0, 0, 100, 100],     # A (score .9)
        [0, 0, 80, 100],      # B: IoU(A,B)=0.8 -> suppressed by A
        [0, 0, 60, 100],      # C: IoU(A,C)=0.6 < .7 kept; IoU(B,C)=0.75
    ], dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    want = nms_py(dets, 0.7)
    assert want == [0, 2]
    for fn in (nms, nms_fixpoint):
        keep, mask = fn(boxes, scores, 0.7, max_outputs=3)
        assert list(np.asarray(keep)[np.asarray(mask)]) == [0, 2]


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('n,thresh', [(200, 0.3), (300, 0.7), (900, 0.5),
                                      (1300, 0.7)])
def test_nms_packed_matches_oracle(seed, n, thresh):
    """Packed-bitmask NMS == py_cpu_nms greedy, across tile boundaries
    (n > 512 exercises multi-tile mask builds + internal padding)."""
    rng = np.random.RandomState(seed)
    dets = _rand_dets(rng, n)
    want = nms_py(dets, thresh)
    keep, mask = nms_packed(dets[:, :4], dets[:, 4], thresh, max_outputs=n)
    got = list(np.asarray(keep)[np.asarray(mask)])
    assert got == want


def test_nms_packed_truncation_valid_and_chain():
    rng = np.random.RandomState(7)
    dets = _rand_dets(rng, 600)
    want = nms_py(dets, 0.7)[:20]
    keep, mask = nms_packed(dets[:, :4], dets[:, 4], 0.7, max_outputs=20)
    assert list(np.asarray(keep)[np.asarray(mask)]) == want

    valid = rng.uniform(size=600) > 0.5
    orig_idx = np.where(valid)[0]
    want = [int(orig_idx[i]) for i in nms_py(dets[valid], 0.5)]
    keep, mask = nms_packed(dets[:, :4], dets[:, 4], 0.5, max_outputs=600,
                            valid=valid)
    assert list(np.asarray(keep)[np.asarray(mask)]) == want

    # suppression chain: A kills B; dead B must not kill C
    boxes = np.array([[0, 0, 100, 100], [0, 0, 80, 100], [0, 0, 60, 100]],
                     dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    keep, mask = nms_packed(boxes, scores, 0.7, max_outputs=3)
    assert list(np.asarray(keep)[np.asarray(mask)]) == [0, 2]


def test_nms_packed_presorted_matches_unsorted():
    """presorted=True on score-sorted inputs == the argsort path == the
    oracle (the proposal_layer fast path: candidates come out of top_k
    already ordered).  Includes a masked tail like top_k's NEG_INF pad."""
    rng = np.random.RandomState(11)
    dets = _rand_dets(rng, 700)
    order = np.argsort(-dets[:, 4], kind='stable')
    sdets = dets[order]
    valid = np.arange(700) < 650          # sorted-suffix invalid tail
    want_keep, want_mask = nms_packed(sdets[:, :4], sdets[:, 4], 0.6,
                                      max_outputs=100, valid=valid)
    got_keep, got_mask = nms_packed(sdets[:, :4], sdets[:, 4], 0.6,
                                    max_outputs=100, valid=valid,
                                    presorted=True)
    np.testing.assert_array_equal(np.asarray(got_mask),
                                  np.asarray(want_mask))
    np.testing.assert_array_equal(np.asarray(got_keep)[np.asarray(got_mask)],
                                  np.asarray(want_keep)[np.asarray(want_mask)])
    want = nms_py(sdets[valid], 0.6)[:100]
    assert list(np.asarray(got_keep)[np.asarray(got_mask)]) == want


@pytest.mark.parametrize('n,tile', [(512, 512), (1024, 512), (256, 128)])
def test_packed_mask_builders_bit_identical(n, tile):
    """The Pallas tile kernel (interpret mode on CPU) and the XLA tile
    scan produce the same packed suppression words."""
    rng = np.random.RandomState(3)
    dets = _rand_dets(rng, n)
    order = np.argsort(-dets[:, 4])
    sboxes = dets[order, :4].astype(np.float32)
    want = np.asarray(build_suppression_masks(sboxes, 0.5, block=tile))
    got = np.asarray(build_suppression_masks_pallas(sboxes, 0.5, tile=tile,
                                                    interpret=True))
    np.testing.assert_array_equal(got, want)
    # sanity vs the dense formulation: unpack and compare to raw IoU>t
    from tpudenoise.ops.nms import _iou_tile
    import jax.numpy as jnp
    iou = np.asarray(_iou_tile(*(jnp.asarray(sboxes[:, k]) for k in
                                 range(4)),
                               *(jnp.asarray(sboxes[:, k]) for k in
                                 range(4))))
    dense = (iou > 0.5) & (np.arange(n)[:, None] < np.arange(n)[None, :])
    unpacked = np.zeros((n, n), bool)
    for wi in range(n // 32):
        for b in range(32):
            unpacked[wi * 32 + b] = (want[wi] >> b) & 1
    np.testing.assert_array_equal(unpacked, dense)


def test_nms_empty_valid():
    boxes = np.zeros((10, 4), dtype=np.float32)
    scores = np.zeros((10,), dtype=np.float32)
    keep, mask = nms(boxes, scores, 0.5, max_outputs=5,
                     valid=np.zeros(10, bool))
    assert not np.asarray(mask).any()


def test_nms_packed_grad_through_pallas_path():
    """jax.grad through nms_packed on the Pallas builder path must not hit
    pallas_call's missing JVP rule (regression: the TPU train step at the
    full RPN budget raised NotImplementedError).  NMS outputs are integer
    indices, so nms_packed severs tangents internally; downstream gathers
    of differentiable boxes still carry gradient."""
    import jax
    import jax.numpy as jnp

    def f(d):
        boxes = jnp.abs(d) * 100
        boxes = boxes.at[:, 2:].add(boxes[:, :2] + 5)
        scores = boxes[:, 0] * 0.01
        k, m = nms_packed(boxes, scores, 0.7, max_outputs=8,
                          use_pallas=True, interpret=True)
        rois = jnp.where(m[:, None], boxes[jnp.maximum(k, 0)], 0.0)
        return jnp.sum(rois)

    g = jax.grad(f)(jnp.ones((64, 4), jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert float(np.abs(np.asarray(g)).sum()) > 0.0
