"""Fused noise -> denoise pipeline: one jitted XLA program per parsed plan.

Replaces the reference's per-image host loop (cv2/skimage/sklearn calls per
image, ref lib/model/test.py:189-1831 and lib/roi_data_layer/minibatch.py:
77-1688) — the #1 hot path identified in SURVEY.md §3.1.  The full batch
runs on device: generator, denoise variant, standalone post-pass, with mix
mode as a `lax.switch` over per-image random choices (all branches compiled
once, selected per image at runtime — the XLA analogue of
random.choice(noise_list)).

Domain bookkeeping mirrors the reference's dtype round-trips exactly:
  * most variants produce uint8-domain float32 (values 0..255),
  * gaussian-with-no-denoise emits the float [0,1] image (quirk,
    test.py:290-305) — `NoiseSpec.unit_float_output`,
  * which array feeds the wavelet differs per kind (float image for
    gaussian/sap/speckle/uniform/gamma/rayleigh, uint8 for the rest).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpudenoise.denoise.stencils import (bilateral, gaussian_blur3, mean3,
                                         median3)
from tpudenoise.denoise.wavelet import denoise_wavelet
from tpudenoise.noise import generators as G
from tpudenoise.noise.kmeans import quantize_colors
from tpudenoise.noise.spec import (Denoise, GAUSSIAN_RANDOM_LEVELS, Kind,
                                   NoisePlan, NoiseSpec, parse)

_FILTERS = {
    Denoise.GAUS_BLUR: lambda im, r: gaussian_blur3(im, round_u8=r),
    Denoise.MEAN: lambda im, r: mean3(im, round_u8=r),
    # median/bilateral are value-selecting/normalized — no rounding mode
    Denoise.MEDIAN: lambda im, r: median3(im),
    Denoise.BILATERAL: lambda im, r: bilateral(im),
}


def _to_u8(images: jnp.ndarray) -> jnp.ndarray:
    """Exact-on-contract uint8 cast for the fused kernels' u8 DMA path:
    inputs are documented as integral u8-domain floats (cast exact), but a
    caller passing unit-floats or other non-integral values would get
    silent truncation/wrap to near-black — round+clip first (free on TPU:
    fuses into the surrounding program)."""
    return jnp.clip(jnp.round(images), 0, 255).astype(jnp.uint8)


def _apply_wavelet_from_float(imgf: jnp.ndarray, hw=None) -> jnp.ndarray:
    """denoise_wavelet on a float image then (255*out).astype(u8) wrap
    (ref test.py:197-201).  hw: valid extent for bucket-padded canvases —
    masks the BayesShrink statistics to the valid region."""
    w = denoise_wavelet(imgf, hw=hw)
    return G.wrap_cast_u8(255.0 * w)


def _noisy_float(spec: NoiseSpec, key, img_u8: jnp.ndarray, hw=None,
                 use_pallas: bool = False, level=None,
                 fast_bits: bool = False):
    """Run the generator, returning the float-domain noisy image plus how
    to get the u8-domain version (some kinds are natively u8).

    hw: optional valid (h, w) extent when img_u8 is a bucket-padded
    canvas — threaded to the raster-length-dependent generators
    (brownian/periodic/quant/bloom); elementwise generators need no
    adjustment (pad output is cropped by the caller).

    level: optional TRACED level overriding spec.level — the mix path
    collapses same-kind entries into one branch with the level as data
    (see _group_specs), so the 38-entry tables compile ~14 branches.

    fast_bits: counter-hash draws for every stochastic kind (the
    sampler-heavy poisson/gamma AND the elementwise threefry draws —
    see the generators salt registry / fast_samplers module doc)."""
    x01 = G.to_unit(img_u8)
    k = spec.kind
    lvl = spec.level if level is None else level
    if k == Kind.GAUSSIAN:
        if spec.is_random_level:
            kl, kn = jax.random.split(key)
            idx = jax.random.randint(kl, (), 0, len(GAUSSIAN_RANDOM_LEVELS))
            var = jnp.asarray(GAUSSIAN_RANDOM_LEVELS)[idx]
        else:
            kn, var = key, lvl
        return G.gaussian(kn, x01, var, fast_bits=fast_bits), 'unit'
    if k == Kind.POISSON:
        return G.poisson(key, x01, img_u8, fast_bits=fast_bits), 'unit'
    if k == Kind.SAP:
        return G.salt_and_pepper(key, x01, lvl,
                                 fast_bits=fast_bits), 'unit'
    if k == Kind.SPECKLE:
        return G.speckle(key, x01, lvl, fast_bits=fast_bits), 'unit'
    if k == Kind.UNIFORM:
        return G.uniform_add(key, x01, lvl, fast_bits=fast_bits), 'unit'
    if k == Kind.GAMMA:
        return G.gamma_add(key, x01, lvl, fast_bits=fast_bits), 'unit'
    if k == Kind.RAYLEIGH:
        return G.rayleigh_add(key, x01, lvl, fast_bits=fast_bits), 'unit'
    if k == Kind.BROWNIAN:
        return G.brownian(key, img_u8, lvl, hw=hw,
                          fast_bits=fast_bits), 'u8'
    if k == Kind.PERIODIC:
        return G.periodic(key, img_u8, lvl, hw=hw), 'u8'
    if k == Kind.QUANT:
        return quantize_colors(key, img_u8, int(spec.level), hw=hw), 'u8'
    if k == Kind.BLOOM:
        if use_pallas:
            # 48-step compositing in ONE HBM pass (pallas_bloom) instead
            # of the XLA scan's ~96; params drawn identically
            from tpudenoise.noise.pallas_bloom import bloom_pallas
            params = G.bloom_params(key, img_u8.shape[0], img_u8.shape[1],
                                    hw=hw)
            return bloom_pallas(img_u8, params), 'u8'
        return G.bloom(key, img_u8, hw=hw), 'u8'
    if k == Kind.SHADER:
        return G.shader(img_u8), 'u8'
    return img_u8, 'u8'  # ORIGINAL


# kinds whose `_wavelet` variant feeds the float image into the wavelet
# (the rest cast to uint8 first — see module docstring)
_WAVELET_ON_FLOAT = {Kind.GAUSSIAN, Kind.SAP, Kind.SPECKLE, Kind.UNIFORM,
                     Kind.GAMMA, Kind.RAYLEIGH}


def apply_spec(spec: NoiseSpec, key, img_u8: jnp.ndarray,
               hw=None, use_pallas: bool = False,
               level=None, fast_bits: bool = False) -> jnp.ndarray:
    """One (kind, level, denoise) combination on one image.

    Returns float32 in the domain the reference would feed downstream:
    u8-domain values except the gaussian-plain quirk (unit floats).
    hw: optional valid extent for bucket-padded inputs (see _noisy_float);
    denoise stencils run on the full canvas — callers pad with edge
    replication so the valid-boundary stencil halo sees plausible pixels.
    level: optional traced level override (mix branch collapsing).
    fast_bits: counter-hash sampler draws (see _noisy_float).
    """
    noisy, dom = _noisy_float(spec, key, img_u8, hw=hw,
                              use_pallas=use_pallas, level=level,
                              fast_bits=fast_bits)
    if dom == 'unit':
        u8 = G.wrap_cast_u8(255.0 * noisy)
    else:
        u8 = noisy
    d = spec.denoise
    if d == Denoise.NONE:
        if spec.unit_float_output and spec.kind == Kind.GAUSSIAN:
            return noisy  # float [0,1] quirk
        return u8
    if d == Denoise.WAVELET:
        src = noisy if spec.kind in _WAVELET_ON_FLOAT else G.to_unit(u8)
        return _apply_wavelet_from_float(src, hw=hw)
    return _FILTERS[d](u8, True)


def apply_post(denoise: Denoise, img: jnp.ndarray,
               unit_float: bool) -> jnp.ndarray:
    """Standalone denoise post-pass on the full noise string
    (ref minibatch.py:1636-1663; test path: wavelet only,
    test.py:1787-1819)."""
    if denoise == Denoise.NONE:
        return img
    if denoise == Denoise.WAVELET:
        src = img if unit_float else G.to_unit(img)
        return _apply_wavelet_from_float(src)
    if denoise == Denoise.CURVELET:
        from tpudenoise.denoise.curvelet import curvelet_denoise_u8
        return curvelet_denoise_u8(img)
    # cv2 filters round only for u8 inputs; the float (gaussian-plain)
    # path filters without rounding
    return _FILTERS[denoise](img, not unit_float)



# kinds whose generator accepts the level as TRACED data (pure jnp math
# on the scalar) — same-kind mix entries collapse into one switch branch
_TRACED_LEVEL_KINDS = {Kind.GAUSSIAN, Kind.SAP, Kind.SPECKLE, Kind.UNIFORM,
                       Kind.GAMMA, Kind.RAYLEIGH, Kind.PERIODIC,
                       Kind.BROWNIAN}


def _group_specs(specs):
    """Collapse the mix entry list to unique branch templates.

    The reference's mix tables repeat kinds at different levels
    (test.py:1612-1639: var_all has 38+ entries over 13 kinds); compiling
    one switch branch per ENTRY makes a huge program (slow to compile,
    slow to execute per scan step).  Where the generator takes its level
    as traced data the level rides a per-entry lookup table instead.
    Entries whose level changes SHAPES or sampling structure (quant's
    cluster count, gaussian's random-level redraw) keep distinct
    branches.

    Returns (templates, traced_flags, entry_branch i32[E], entry_level
    f32[E]).  The per-image entry draw (randint over E) is unchanged, so
    the noise stream and distribution are identical to the per-entry
    switch."""
    templates, traced_flags, keys = [], [], {}
    eb, el = [], []
    for s in specs:
        traced = s.kind in _TRACED_LEVEL_KINDS and not s.is_random_level
        if traced:
            k = (s.kind, s.denoise, s.unit_float_output, None)
            lvl = float(s.level)
        else:
            k = (s.kind, s.denoise, s.unit_float_output, s.level)
            lvl = 0.0
        if k not in keys:
            keys[k] = len(templates)
            templates.append(s)
            traced_flags.append(traced)
        eb.append(keys[k])
        el.append(lvl)
    return (templates, traced_flags, np.asarray(eb, np.int32),
            np.asarray(el, np.float32))


def _apply_specs_batched(specs, keys, images, hw=None,
                         use_pallas: bool = False,
                         fast_bits: bool = False):
    """Per-image spec application over a batch.

    Single spec: plain vmap.  Mix (>1 specs): lax.scan over images with a
    lax.switch per step — under scan the switch EXECUTES only the branch
    the image drew, whereas vmap(switch) lowers to running every branch
    on every image and selecting (a ~len(specs)x slowdown: the mix tables
    hold ~37 generators incl. K-Means quantization).  Images serialize,
    but one 600x1000 generator saturates the VPU on its own, and it all
    stays ONE dispatch.  Same-kind entries share one branch with the
    level as traced data (_group_specs) — identical stream, ~1/3 the
    branches.  Bit-identical to the vmap formulation."""
    if len(specs) == 1:
        if hw is None:
            return jax.vmap(functools.partial(apply_spec, specs[0],
                                              use_pallas=use_pallas,
                                              fast_bits=fast_bits)
                            )(keys, images)
        return jax.vmap(lambda k, im, e: apply_spec(
            specs[0], k, im, hw=e, use_pallas=use_pallas,
            fast_bits=fast_bits))(keys, images, hw)

    templates, traced_flags, entry_branch, entry_level = _group_specs(
        specs)
    eb = jnp.asarray(entry_branch)
    el = jnp.asarray(entry_level)

    if hw is None:
        branches = [
            (lambda s, t: lambda k, im, lv: apply_spec(
                s, k, im, use_pallas=use_pallas, fast_bits=fast_bits,
                level=lv if t else None))(s, t)
            for s, t in zip(templates, traced_flags)]

        def body(_, ki):
            k, img = ki
            kc, ka = jax.random.split(k)
            idx = jax.random.randint(kc, (), 0, len(specs))
            return None, jax.lax.switch(eb[idx], branches, ka, img,
                                        el[idx])

        _, out = jax.lax.scan(body, None, (keys, images))
        return out

    branches = [
        (lambda s, t: lambda k, im, e, lv: apply_spec(
            s, k, im, hw=e, use_pallas=use_pallas, fast_bits=fast_bits,
            level=lv if t else None))(s, t)
        for s, t in zip(templates, traced_flags)]

    def body(_, ki):
        k, img, e = ki
        kc, ka = jax.random.split(k)
        idx = jax.random.randint(kc, (), 0, len(specs))
        return None, jax.lax.switch(eb[idx], branches, ka, img, e,
                                    el[idx])

    _, out = jax.lax.scan(body, None, (keys, images, hw))
    return out


def _post_batched_for(plan: NoisePlan, unit_float: bool,
                      pallas_bilateral: bool = False):
    """The standalone post-pass over a (possibly mixed) batch — the SAME
    filter for every image, so a plain vmap (no switch); the wavelet goes
    through its planar-batched entry (one DWT matmul stack for the whole
    batch).  hw (bucketed path): masks the wavelet's BayesShrink
    statistics to each image's valid region; the stencil filters are
    hw-independent (edge-replicated pad, caller crops).
    pallas_bilateral routes a bilateral post through the batched Pallas
    stencil (one HBM pass) instead of the vmapped XLA chain."""
    def post(out, hw=None):
        if plan.post_denoise == Denoise.WAVELET:
            from tpudenoise.denoise.wavelet import denoise_wavelet_batched
            src = out if unit_float else G.to_unit(out)
            return G.wrap_cast_u8(
                255.0 * denoise_wavelet_batched(src, hw=hw))
        if plan.post_denoise == Denoise.BILATERAL and pallas_bilateral:
            from tpudenoise.denoise.pallas_bilateral import bilateral_pallas
            return bilateral_pallas(out)
        if plan.post_denoise == Denoise.CURVELET:
            # the FFT frame holds nbangles+wedge temporaries at full
            # resolution (29 x 600x1000 f32 x several live = ~4 GB per
            # 64-batch array): lax.map over 4-image chunks keeps the
            # batched path HBM-bounded at any batch size
            from tpudenoise.denoise.curvelet import curvelet_denoise_u8
            b = out.shape[0]
            chunk = 4
            if b <= chunk or b % chunk != 0:
                return jax.vmap(curvelet_denoise_u8)(out)
            folded = out.reshape(b // chunk, chunk, *out.shape[1:])
            mapped = jax.lax.map(jax.vmap(curvelet_denoise_u8), folded)
            return mapped.reshape(b, *out.shape[1:])
        return jax.vmap(lambda im: apply_post(plan.post_denoise, im,
                                              unit_float))(out)
    return post


def _fused_mix_pipeline(plan: NoisePlan, interpret: bool = False):
    """Mixed-noise plans through the fused Pallas mix kernel
    (noise/pallas_mix.py): per-image branch dispatch inside ONE batched
    HBM pass, with the bilateral post-pass fused into the same pass when
    the plan asks for it.  Replaces the scanned-switch XLA program
    (~0.5 ms/img of noise at 600x1000) on TPU; the XLA path remains the
    stream/parity reference (use_pallas=False).

    Entry-draw chain is bit-identical to the scanned switch; pixel
    streams are coordinate-hash (statistically pinned per kind,
    tests/test_pallas_mix.py).  The bucketed `masked` path keeps the XLA
    program: its per-image valid-extent semantics (noise following the
    un-padded geometry) are not worth a second kernel variant while eval
    is detector-bound.
    """
    from tpudenoise.noise.pallas_mix import (fused_mix_bilateral,
                                             fused_mix_noise,
                                             mix_prologue, plan_tables)
    specs = plan.specs
    kinds, eb, el = plan_tables(specs)
    unit_float = all(s.unit_float_output for s in specs)
    fuse_bilateral = plan.post_denoise == Denoise.BILATERAL
    if fuse_bilateral or plan.post_denoise == Denoise.NONE:
        post = None
    else:
        # wavelet/curvelet/stencil post-passes run on the fused noise
        # output exactly as they would on the scanned switch's
        post = _post_batched_for(plan, unit_float)

    def _apply(keys, images):
        branch, level, seeds, vals, centers, bloom = mix_prologue(
            keys, images, kinds, eb, el)
        if fuse_bilateral:
            return fused_mix_bilateral(images, branch, level, seeds,
                                       vals, centers, bloom, kinds,
                                       interpret=interpret)
        out = fused_mix_noise(images, branch, level, seeds, vals,
                              centers, bloom, kinds, interpret=interpret)
        return out if post is None else post(out)

    @jax.jit
    def run(key, images):
        keys = jax.random.split(key, images.shape[0])
        return _apply(keys, images)

    @jax.jit
    def run_keyed(keys, images):
        ks = jax.vmap(lambda k: jax.random.split(k, 1)[0])(keys)
        return _apply(ks, images)

    # bucketed path: the XLA scanned switch for the noise (see
    # docstring), with the post-pass still riding the batched Pallas
    # stencil where it exists (bilateral)
    _post_batched = _post_batched_for(plan, unit_float,
                                      pallas_bilateral=fuse_bilateral)

    @jax.jit
    def run_masked(keys, images, hw):
        ks = jax.vmap(lambda k: jax.random.split(k, 1)[0])(keys)
        return _post_batched(
            _apply_specs_batched(specs, ks, images, hw, use_pallas=True),
            hw=hw)

    run.keyed = run_keyed
    run.masked = run_masked
    run.backend = ('pallas:fused_mix'
                   + ('+bilateral' if fuse_bilateral else ''))
    return run


def _pallas_bilateral_pipeline(specs, n_stages: int,
                               fast_bits: bool = False):
    """Noise in the XLA program (scanned per-image lax.switch for mixes);
    each bilateral stage (generator `_bilateral` variant and/or standalone
    post-pass, ref minibatch.py:1636-1663) as ONE batched Pallas HBM pass
    over the whole batch instead of a per-image 9x9 stencil chain."""
    import dataclasses
    from tpudenoise.denoise.pallas_bilateral import bilateral_pallas
    stripped = tuple(dataclasses.replace(s, denoise=Denoise.NONE)
                     if s.denoise == Denoise.BILATERAL else s
                     for s in specs)

    @jax.jit
    def run(key, images):
        keys = jax.random.split(key, images.shape[0])
        out = _apply_specs_batched(stripped, keys, images,
                                   use_pallas=True, fast_bits=fast_bits)
        for _ in range(n_stages):
            out = bilateral_pallas(out)
        return out

    @jax.jit
    def run_keyed(keys, images):
        ks = jax.vmap(lambda k: jax.random.split(k, 1)[0])(keys)
        out = _apply_specs_batched(stripped, ks, images,
                                   use_pallas=True, fast_bits=fast_bits)
        for _ in range(n_stages):
            out = bilateral_pallas(out)
        return out

    @jax.jit
    def run_masked(keys, images, hw):
        ks = jax.vmap(lambda k: jax.random.split(k, 1)[0])(keys)
        out = _apply_specs_batched(stripped, ks, images, hw,
                                   use_pallas=True, fast_bits=fast_bits)
        for _ in range(n_stages):
            out = bilateral_pallas(out)
        return out

    run.keyed = run_keyed
    run.masked = run_masked
    run.backend = (f'pallas:bilateral_x{n_stages}'
                   + ('+fast_rng' if fast_bits else ''))
    return run


def make_pipeline(plan: NoisePlan | str, mode: str = 'TEST',
                  strict_ref: bool = False,
                  use_pallas: bool | None = None,
                  fast_rng: bool | None = None):
    """Build `fn(key, images) -> images` for a parsed plan (or raw noise
    string).  images: (B, H, W, 3) float32 u8-domain BGR.  The returned fn
    is jitted and vmapped over the batch; per-image PRNG via fold_in.

    use_pallas swaps in the single-HBM-pass fused Pallas kernels for the
    plans they cover (sap+median, gaussian+blur, any bilateral stage); the
    RNG stream differs (coordinate hash vs threefry) with identical
    statistics.  Default None = auto: Pallas on TPU, XLA elsewhere — this
    is what the production call sites (Solver, eval harness) use.

    fast_rng swaps EVERY stochastic generator's threefry draws for a
    splitmix counter-hash bitstream (fast_samplers._u01/_normal — the
    same stream-trade as the fused Pallas kernels' coordinate-hash RNG;
    ~9 vs ~20+ ALU ops per word): the sampler-heavy poisson/gamma (11-12
    fields per image) plus the elementwise gaussian/speckle/uniform/
    rayleigh/s&p fields and brownian's full-raster increment draw.
    Distribution unchanged (chi-square/KS/moment-pinned), stream
    differs.  Default None = OFF: the XLA threefry path is the semantics
    reference, and the recorded noise-grid baseline (RESULTS.md) pins its
    stream.  [An earlier fast_rng=rbg-hardware-keys experiment was
    removed: measured ~300x SLOWER inside the scanned-switch mix program
    on TPU v5e, and an outer lax.scan around it faulted the TPU worker.]
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    if fast_rng is None:
        fast_rng = False
    fast_bits = bool(fast_rng)
    if isinstance(plan, str):
        plan = parse(plan, mode=mode, strict_ref=strict_ref)
    specs = plan.specs

    if use_pallas and len(specs) == 1:
        s = specs[0]
        if (s.kind == Kind.SAP and s.denoise == Denoise.MEDIAN
                and plan.post_denoise in (Denoise.MEDIAN, Denoise.NONE)):
            from tpudenoise.noise.pallas_kernels import \
                fused_sap_median_batched
            amount = s.level
            double = plan.post_denoise == Denoise.MEDIAN

            # the kernel's uint8 I/O path moves 4x fewer HBM bytes each
            # way and is bit-identical (f32 compute in registers); the
            # round+clip makes the documented integral-u8-domain contract
            # robust to float inputs (no silent wrap to near-black), and
            # the f32 output cast keeps the pipeline contract
            @jax.jit
            def run_sap(key, images):
                seeds = jax.random.randint(
                    key, (images.shape[0],), 0, 2**31 - 1)
                out = fused_sap_median_batched(
                    _to_u8(images), seeds, amount, double)
                return out.astype(jnp.float32)

            @jax.jit
            def run_sap_keyed(keys, images):
                # one seed per per-image key, drawn exactly as a B=1 run
                # would (shape (1,)) so batched == sequential bit-exact
                seeds = jax.vmap(lambda k: jax.random.randint(
                    k, (1,), 0, 2**31 - 1)[0])(keys)
                out = fused_sap_median_batched(
                    _to_u8(images), seeds, amount, double)
                return out.astype(jnp.float32)

            run_sap.keyed = run_sap_keyed
            # sap noise + median are elementwise/stencil — no raster-
            # length dependence; the bucketed caller crops the pad region
            run_sap.masked = lambda keys, images, hw: run_sap_keyed(
                keys, images)
            run_sap.backend = 'pallas:sap_median'
            return run_sap
        if (s.kind == Kind.GAUSSIAN and s.denoise == Denoise.GAUS_BLUR
                and plan.post_denoise in (Denoise.GAUS_BLUR,
                                          Denoise.NONE)):
            from tpudenoise.noise.pallas_kernels import fused_gaussian_blur
            double = plan.post_denoise == Denoise.GAUS_BLUR
            levels = (GAUSSIAN_RANDOM_LEVELS if s.is_random_level
                      else [s.level])

            def _gauss_impl(seeds, sigmas, images):
                # uint8 kernel I/O (round+clip guards non-integral
                # inputs), f32 output for the pipeline contract
                images = _to_u8(images)
                if sigmas is None:
                    out = fused_gaussian_blur(images, seeds, levels[0],
                                              double)
                else:
                    out = fused_gaussian_blur(images, seeds, levels[0],
                                              double, sigmas=sigmas)
                return out.astype(jnp.float32)

            lvl_arr = jnp.sqrt(jnp.asarray(levels, jnp.float32))

            @jax.jit
            def run_gauss(key, images):
                k1, k2 = jax.random.split(key)
                seeds = jax.random.randint(
                    k1, (images.shape[0],), 0, 2**31 - 1)
                if len(levels) == 1:
                    return _gauss_impl(seeds, None, images)
                # randomized gaussian level quirk, drawn PER IMAGE like
                # the XLA path (ref test.py:1678-1682): the per-image
                # sigma rides the scalar-prefetch array into the kernel
                idx = jax.random.randint(k2, (images.shape[0],), 0,
                                         len(levels))
                return _gauss_impl(seeds, lvl_arr[idx], images)

            @jax.jit
            def run_gauss_keyed(keys, images):
                def draws(k):
                    k1, k2 = jax.random.split(k)
                    seed = jax.random.randint(k1, (1,), 0, 2**31 - 1)[0]
                    idx = jax.random.randint(k2, (1,), 0, len(levels))[0]
                    return seed, idx
                seeds, idx = jax.vmap(draws)(keys)
                if len(levels) == 1:
                    return _gauss_impl(seeds, None, images)
                return _gauss_impl(seeds, lvl_arr[idx], images)

            run_gauss.keyed = run_gauss_keyed
            # elementwise noise + stencil blur: hw-independent, cropped
            # by the bucketed caller
            run_gauss.masked = lambda keys, images, hw: run_gauss_keyed(
                keys, images)
            run_gauss.backend = 'pallas:gaussian_blur'
            return run_gauss

        # batched Pallas bilateral: covers any single-spec plan whose only
        # denoise stages are bilateral (the generator's `_bilateral`
        # variant and/or the standalone post-pass) — the noise itself runs
        # in the XLA program, the 9x9 stencil in one HBM pass per stage
        bilateral_stages = ((1 if s.denoise == Denoise.BILATERAL else 0)
                            + (1 if plan.post_denoise == Denoise.BILATERAL
                               else 0))
        if (bilateral_stages and s.denoise in (Denoise.NONE,
                                               Denoise.BILATERAL)
                and plan.post_denoise in (Denoise.NONE,
                                          Denoise.BILATERAL)):
            return _pallas_bilateral_pipeline((s,), bilateral_stages,
                                              fast_bits)

    if use_pallas and len(specs) > 1:
        # mixed-noise plans (BASELINE.json configs 3/5 shape): the fused
        # Pallas mix kernel — per-image branch dispatch in one batched
        # HBM pass, bilateral post fused into the same pass.  Covers
        # every mix the grammar produces (in-mix tokens never carry a
        # per-spec denoise and never use the randomized gaussian level).
        if (all(s.denoise == Denoise.NONE and not s.is_random_level
                for s in specs)):
            return _fused_mix_pipeline(plan)
    unit_float = all(s.unit_float_output for s in specs)
    # bilateral posts that reach this generic path already bypassed the
    # Pallas routing above (they coexist with non-bilateral stages), so
    # the post keeps the vmapped XLA stencil (pallas_bilateral=False)
    _post_batched = _post_batched_for(plan, unit_float)

    @jax.jit
    def run(key, images):
        keys = jax.random.split(key, images.shape[0])
        return _post_batched(_apply_specs_batched(
            specs, keys, images, use_pallas=use_pallas,
            fast_bits=fast_bits))

    @jax.jit
    def run_keyed(keys, images):
        # per-image keys (e.g. fold_in(key, image_index) from the batched
        # eval harness); reproduce the B=1 run() stream exactly:
        # split(k, 1)[0] per image
        ks = jax.vmap(lambda k: jax.random.split(k, 1)[0])(keys)
        return _post_batched(_apply_specs_batched(
            specs, ks, images, use_pallas=use_pallas,
            fast_bits=fast_bits))

    @jax.jit
    def run_masked(keys, images, hw):
        # bucketed eval path: images are padded to a static bucket, hw is
        # the per-image valid (h, w); raster-dependent generators follow
        # the valid geometry, caller crops the output back to (h, w)
        ks = jax.vmap(lambda k: jax.random.split(k, 1)[0])(keys)
        return _post_batched(_apply_specs_batched(
            specs, ks, images, hw, use_pallas=use_pallas,
            fast_bits=fast_bits), hw=hw)

    run.keyed = run_keyed
    run.masked = run_masked
    run.backend = 'xla+fast_rng' if fast_bits else 'xla'
    return run
