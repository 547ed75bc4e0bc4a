"""Native C++ host kernels vs python oracles."""

import numpy as np
import pytest

from tpudenoise.ops.native import (bbox_decode_host, bbox_overlaps_host,
                                   native_available, nms_host)
from tpudenoise.ops.nms import nms_py


@pytest.fixture(scope='module')
def built():
    assert native_available(), 'native lib must build in this environment'


def _rand_dets(rng, n):
    x1 = rng.uniform(0, 300, n)
    y1 = rng.uniform(0, 300, n)
    w = rng.uniform(5, 120, n)
    h = rng.uniform(5, 120, n)
    s = rng.uniform(0, 1, n)
    return np.stack([x1, y1, x1 + w, y1 + h, s], 1).astype(np.float32)


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('thresh', [0.3, 0.5, 0.7])
def test_native_nms_matches_oracle(built, seed, thresh):
    rng = np.random.RandomState(seed)
    dets = _rand_dets(rng, 400)
    assert nms_host(dets, thresh) == nms_py(dets, thresh)


def test_native_overlaps(built):
    rng = np.random.RandomState(3)
    b = _rand_dets(rng, 50)[:, :4]
    q = _rand_dets(rng, 20)[:, :4]
    import jax.numpy as jnp
    from tpudenoise.ops.boxes import bbox_overlaps
    want = np.asarray(bbox_overlaps(jnp.asarray(b), jnp.asarray(q)))
    got = bbox_overlaps_host(b, q)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_native_decode(built):
    rng = np.random.RandomState(4)
    b = _rand_dets(rng, 64)[:, :4]
    d = (rng.randn(64, 4) * 0.2).astype(np.float32)
    import jax.numpy as jnp
    from tpudenoise.ops.boxes import bbox_transform_inv
    want = np.asarray(bbox_transform_inv(jnp.asarray(b), jnp.asarray(d)))
    got = bbox_decode_host(b, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
