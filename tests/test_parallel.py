"""Multi-device tests on the virtual 8-device CPU mesh: spatial halo
exchange, DP inference/pipeline sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpudenoise.core.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


@pytest.fixture(scope='module')
def mesh():
    return make_mesh()


def test_spatial_median_matches_single_device(mesh):
    from tpudenoise.denoise.stencils import median3
    from tpudenoise.parallel.spatial import make_spatial_filter
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (2, 64, 48, 3)).astype(np.float32)
    fn = make_spatial_filter(mesh, 'median')
    got = np.asarray(fn(jnp.asarray(imgs)))
    want = np.asarray(jax.vmap(median3)(imgs))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('kind', ['mean', 'gaussian'])
def test_spatial_separable_matches_single_device(mesh, kind):
    from tpudenoise.denoise.stencils import gaussian_blur3, mean3
    from tpudenoise.parallel.spatial import make_spatial_filter
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (2, 64, 48, 3)).astype(np.float32)
    fn = make_spatial_filter(mesh, kind)
    got = np.asarray(fn(jnp.asarray(imgs)))
    ref = mean3 if kind == 'mean' else gaussian_blur3
    want = np.asarray(jax.vmap(ref)(imgs))
    np.testing.assert_array_equal(got, want)


def test_dp_pipeline_sharded(mesh):
    from tpudenoise.noise.pipeline import make_pipeline
    from tpudenoise.parallel.dp import dp_noise_pipeline, shard_batch
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randint(0, 256, (8, 32, 48, 3)).astype(
        np.float32))
    pipe = make_pipeline('sap_median_var0.4', mode='TRAIN')
    out = dp_noise_pipeline(pipe, mesh)(jax.random.PRNGKey(0), imgs)
    assert out.shape == imgs.shape
    # output matches the unsharded run exactly (same keys, same program)
    want = pipe(jax.random.PRNGKey(0), imgs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_dp_inference_runs(mesh):
    from tpudenoise.core.config import default_config
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.parallel.dp import dp_inference
    cfg = default_config()
    cfg.TEST.RPN_PRE_NMS_TOP_N = 128
    cfg.TEST.RPN_POST_NMS_TOP_N = 32
    m = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
    params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(8, 64, 96, 3).astype(np.float32) * 20)
    infos = jnp.tile(jnp.asarray([60., 90., 1.]), (8, 1))
    out = dp_inference(m, mesh)(params, imgs, infos)
    assert out['cls_prob'].shape == (8, 32, 2)
    assert np.isfinite(np.asarray(out['cls_prob'])).all()
