"""Benchmark: fused noise+denoise throughput on device.

Default: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}
for the headline config (BASELINE.json config 2: s&p + median over batched
600x1000 tensors).  `--full` additionally prints one line per extra
config: config 1 (gaussian + gaussian-blur, fused Pallas) and config 3
(mixed-noise batches with a bilateral / wavelet denoise post-pass).

Baseline: the driver's north-star >5,000 600x1000 images/sec/chip for the
fused noise+denoise pipeline on TPU v5e (BASELINE.md).  The reference runs
this per image on the host (cv2 + skimage + sklearn, single image per
iteration) and publishes no throughput (BASELINE.json "published": {}).

Methodology: the per-dispatch tunnel overhead in this environment is
~31 ms regardless of batch size, so the pipeline is applied `INNER` times
inside one jit (lax.scan with per-step key/seed folding) over a
`BATCH`-image tensor — one dispatch measures INNER*BATCH images of pure
device work, which is what "images/sec/chip" means in production.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMGS_PER_SEC = 5000.0
H, W = 600, 1000
BATCH = 128
INNER = 8


def _time_scanned(step_fn, images, reps=3, inner=INNER):
    """step_fn(images, i) -> out; scanned `inner` times in one jit.
    Returns images/sec."""

    @jax.jit
    def run_many(images):
        def step(c, i):
            out = step_fn(images, i)
            return c + jnp.sum(out[0, ::97, ::89].astype(jnp.float32)), None
        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(inner))
        return c

    float(run_many(images))  # compile + warmup
    float(run_many(images))  # second warmup (scheduler settle)
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run_many(images))
    dt = (time.perf_counter() - t0) / reps
    return images.shape[0] * inner / dt


def _result(name, ips):
    return {
        "metric": f"fused noise+denoise ({name}) {H}x{W} images/sec/chip",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMGS_PER_SEC, 3),
    }


def bench_config2(images_u8, seeds):
    """Headline (driver-recorded): s&p + median^2, fused Pallas, uint8
    I/O — the dtype the loader actually ships."""
    from tpudenoise.noise.pallas_kernels import fused_sap_median_batched

    def step(images, i):
        return fused_sap_median_batched(images, seeds + i, amount=0.4,
                                        double_filter=True, tile_h=120)

    return _time_scanned(step, images_u8)


def bench_config1(images_u8, seeds):
    """gaussian var0.1 + GaussianBlur3^2, fused Pallas, uint8 I/O."""
    from tpudenoise.noise.pallas_kernels import fused_gaussian_blur

    def step(images, i):
        return fused_gaussian_blur(images, seeds + i, var=0.1,
                                   double_filter=True)

    return _time_scanned(step, images_u8)


def bench_config3(images, noise, inner=INNER, reps=3, fast_rng=False,
                  use_pallas=None):
    """Mixed-noise batch + denoise post-pass through the production
    make_pipeline routing (the fused Pallas mix kernel on TPU; bilateral
    rides the fused tail, wavelet the MXU band-matrix DWT).  Fused rows
    feed uint8 — the dtype the loader actually ships (same contract as
    the headline config) and bit-identical output to u8-valued f32 input
    (tests/test_pallas_mix.py::test_fused_pipeline_u8_input_bitequal_f32)
    without the f32->u8 planarize tax; the XLA parity rows keep f32.

    `inner` pipeline applications scanned inside one jit (the headline
    methodology) over a 64-image batch, best-of-reps, with a single
    full-sum readback — strided-slice readouts and per-call readbacks
    each cost ~2-31 ms through the tunnel and used to understate this
    config by ~2x.  Smaller batch than the headline: the mixed XLA
    program keeps several full-batch f32 temporaries live, so batch 128
    overflows HBM.  fast_rng rows force use_pallas=False: their purpose
    is the XLA parity pipeline with counter-hash draws (the fused kernel
    has hash RNG regardless, so the default routing would just repeat
    the fused row)."""
    from tpudenoise.noise.pipeline import make_pipeline
    if fast_rng and use_pallas is None:
        use_pallas = False
    fn = make_pipeline(noise, mode='TRAIN', fast_rng=fast_rng,
                       use_pallas=use_pallas)
    key = jax.random.PRNGKey(3)
    images = images[:64]
    b = images.shape[0]

    if fast_rng:
        # fast_rng timing must avoid the outer-scan shape (see
        # benchmarks/_timing.py for the fault story and recipe)
        from benchmarks._timing import time_chained_dispatches
        best = time_chained_dispatches(fn, key, images, inner, reps=reps,
                                       readout_scale=1e-12)
        return b * inner / best, fn.backend

    @jax.jit
    def run_many(images):
        def step(c, i):
            out = fn(jax.random.fold_in(key, i), images)
            return c + jnp.sum(out[0].astype(jnp.float32)) * 1e-12, None
        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(inner))
        return c

    float(run_many(images))  # compile + warmup
    float(run_many(images))
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_many(images))
        best = min(best, time.perf_counter() - t0)
    return b * inner / best, fn.backend


def bench_config5(shape=(608, 1024), batch=8, inner=4, reps=3):
    """res101 batched inference (the round-3 detect path: MXU
    crop_and_resize + bit-packed NMS): jit(vmap(forward_test)) at
    `batch`, `inner` chained batches, one readback."""
    from tpudenoise.models.faster_rcnn import FasterRCNN
    model = FasterRCNN(backbone='res101', num_classes=21)
    params = model.init(jax.random.PRNGKey(0), image_shape=shape)
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randn(batch, *shape, 3).astype(np.float32) * 30)
    infos = jnp.tile(jnp.asarray([[600., 1000., 1.]], jnp.float32),
                     (batch, 1))
    fwd = jax.jit(jax.vmap(
        lambda im, inf, p: model.forward_test(p, im, inf),
        in_axes=(0, 0, None)))

    def chain(n):
        acc = jnp.float32(0)
        for _ in range(n):
            out = fwd(imgs + acc, infos, params)
            acc = jnp.sum(out['cls_prob'].astype(jnp.float32)) * 1e-9
        return float(acc)

    chain(1)
    chain(2)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        chain(inner)
        best = min(best, (time.perf_counter() - t0) / inner)
    return batch / best


def bench_config4(shape=(608, 1024), inner=8, reps=3):
    """BASELINE.json config 4: vgg16 Faster R-CNN inference (RPN +
    anchors + device NMS + crop_and_resize RoI head) at the reference's
    1-image-per-batch contract, `inner` forwards scanned inside one jit
    (a vmapped batch-4 graph exceeds the remote-compile request limit).
    Reported as images/sec (no reference number exists; recorded for
    round-over-round regression)."""
    from tpudenoise.models.faster_rcnn import FasterRCNN
    model = FasterRCNN(backbone='vgg16', num_classes=21)
    params = model.init(jax.random.PRNGKey(0), image_shape=shape)
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(*shape, 3).astype(np.float32) * 30)
    info = jnp.asarray([600., 1000., 1.], jnp.float32)

    def chain(n):
        # `inner` async dispatches of the cached forward binary, serially
        # data-dependent (acc feeds the next input); one host readback at
        # the end blocks on the whole chain.  A scan-of-forward program
        # exceeds the remote-compile request size limit here, and a lone
        # block_until_ready doesn't actually block through the tunnel.
        acc = jnp.float32(0)
        for _ in range(n):
            out = model.forward_test(params, img + acc, info)
            acc = jnp.sum(out['cls_prob']).astype(jnp.float32) * 1e-9
        return float(acc)

    chain(2)  # compile + warmup
    chain(2)
    t0 = time.perf_counter()
    for _ in range(reps):
        chain(inner)
    dt = (time.perf_counter() - t0) / reps
    return inner / dt


def bench_config6(shape=(600, 1000), batch=8, inner=3, reps=3,
                  noise='sap_median_var0.4', bucket=(608, 1024)):
    """End-to-end production eval chunk on device: fused noise ->
    on-device prep (mean-subtract + bilinear rescale + bucket pad,
    ops/resize.py) -> batched res101 forward -> per-class NMS
    postprocess — the exact program chain test_net_batched dispatches
    per chunk (device_prep=True), with zero host hops between stages.
    Reported as images/sec; the host adds only JPEG decode (prefetched
    on a thread) around this in production."""
    from tpudenoise.core.config import default_config
    from tpudenoise.eval.harness import postprocess_detections
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.noise.pipeline import make_pipeline
    from tpudenoise.ops.resize import prep_on_device

    C = default_config()
    model = FasterRCNN(backbone='res101', num_classes=21, cfg=C)
    params = model.init(jax.random.PRNGKey(0), image_shape=bucket)
    noise_fn = make_pipeline(noise, mode='TEST')
    means = np.asarray(C.PIXEL_MEANS, np.float32)
    h0, w0 = shape
    scale, oh, ow = 1.0, h0, w0  # rrData geometry: min side 600 -> 600
    key = jax.random.PRNGKey(3)
    rng = np.random.RandomState(3)
    raw = jnp.asarray(rng.randint(0, 256, (batch, h0, w0, 3))
                      .astype(np.float32))
    idx = jnp.arange(batch, dtype=jnp.int32)
    info = jnp.tile(jnp.asarray([[oh, ow, scale]], jnp.float32),
                    (batch, 1))

    @jax.jit
    def chunk(key, idx, raw, infos):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
        noisy = noise_fn.keyed(keys, raw)
        imgs = jax.vmap(lambda im: prep_on_device(
            im, h0, w0, oh, ow, scale, means, bucket))(noisy)
        out = jax.vmap(lambda im, inf: model.forward_test(
            params, im, inf))(imgs, infos)
        return jax.vmap(lambda r, m, p, b, inf: postprocess_detections(
            r, m, p, b, inf, 21, C.TEST.NMS, 0.0))(
            out['rois'], out['roi_mask'], out['cls_prob'],
            out['bbox_pred'], infos)

    def run(n):
        acc = jnp.float32(0)
        for i in range(n):
            # fold the chain index (the ~1e-9-scaled acc truncates to 0
            # as int32, which would time identical-key programs); acc
            # still rides the image input as the serializing data dep
            _, s, _ = chunk(jax.random.fold_in(key, i), idx, raw + acc,
                            info)
            acc = jnp.sum(jnp.where(jnp.isfinite(s), s, 0.0)) * 1e-9
        return float(acc)

    run(1)
    run(2)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        run(inner)
        best = min(best, (time.perf_counter() - t0) / inner)
    return batch / best


def _backend_available():
    """Probe backend initialization without a stack-trace blowup.

    The TPU here rides a tunnel relay that can be down while the code is
    fine; a driver-facing bench must distinguish "environment
    unavailable" from "bench broken" (round-3 BENCH failed with a raw
    RuntimeError 40 frames deep in a device_put)."""
    try:
        dev = jax.devices()[0]
        return True, str(dev)
    except RuntimeError as e:  # jax raises RuntimeError on backend-init failure
        return False, str(e).splitlines()[0]


def main():
    jax.config.update('jax_threefry_partitionable', True)
    full = '--full' in sys.argv

    ok, detail = _backend_available()
    if not ok:
        print(json.dumps({
            "metric": "ENVIRONMENT UNAVAILABLE: accelerator backend failed to initialize",
            "value": None, "unit": None, "vs_baseline": None,
            "error": detail}))
        return 75  # EX_TEMPFAIL: retry when the environment is back

    rng = np.random.RandomState(3)
    raw = rng.randint(0, 256, (BATCH, H, W, 3))
    images_u8 = jax.device_put(jnp.asarray(raw.astype(np.uint8)))
    seeds = jnp.arange(BATCH, dtype=jnp.int32)

    print(json.dumps(_result('pallas sap_median_var0.4',
                             bench_config2(images_u8, seeds))))
    if full:
        print(json.dumps(_result('pallas gaussian_gaus_blur_var0.1',
                                 bench_config1(images_u8, seeds))))
        images_f32 = jax.device_put(jnp.asarray(raw.astype(np.float32)))
        for noise in ('noise_mix_var_all_bilateral',
                      'noise_mix_var_all_wavelet'):
            ips, backend = bench_config3(images_u8, noise)
            print(json.dumps(_result(f'{backend} {noise}', ips)))
        # same mix configs through the XLA parity pipeline with the
        # counter-hash sampler draws (--fast-rng knob; the fused kernel
        # above hash-draws regardless, so these rows track the fallback)
        for noise in ('noise_mix_var_all_bilateral',
                      'noise_mix_var_all_wavelet'):
            ips, backend = bench_config3(images_f32, noise, fast_rng=True)
            print(json.dumps(_result(f'{backend} {noise}', ips)))
        fps = bench_config4()
        print(json.dumps({
            "metric": "vgg16 faster-rcnn inference 608x1024",
            "value": round(fps, 2), "unit": "images/sec",
            "vs_baseline": None}))
        fps8 = bench_config5()
        print(json.dumps({
            "metric": "res101 faster-rcnn batch-8 inference 608x1024",
            "value": round(fps8, 2), "unit": "images/sec",
            "vs_baseline": None}))
        fps_e2e = bench_config6()
        print(json.dumps({
            "metric": ("res101 e2e eval chunk (noise+prep+detect+NMS) "
                       "600x1000 batch-8"),
            "value": round(fps_e2e, 2), "unit": "images/sec",
            "vs_baseline": None}))
        # curvelet LAST and guarded: the FFT-frame program has crashed
        # the TPU worker process on this runtime (kernel fault, see
        # README); a crash here must not poison the rows above
        try:
            ips, backend = bench_config3(images_f32, 'curvelet')
            print(json.dumps(_result(f'{backend} curvelet', ips)))
        except Exception as e:
            print(json.dumps({
                "metric": "curvelet (noise mix + FFT-frame denoise)",
                "value": None, "unit": "images/sec",
                "vs_baseline": None, "error": str(e).splitlines()[0][:200]}))


if __name__ == '__main__':
    sys.exit(main())
