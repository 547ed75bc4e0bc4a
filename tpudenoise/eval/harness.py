"""Evaluation harness: the test_net pipeline (ref lib/model/test.py:166-2226)
rebuilt around the on-device model.

Per image: noise+denoise synthesis (device, fused plan) -> im_detect
(jitted forward) -> per-class score threshold + NMS(0.3) + top-100 cap
(all device) -> accumulate -> detections.pkl -> imdb.evaluate_detections.

The reference's per-image host noise lab and Cython/CUDA NMS round-trips
are gone; the host only decodes JPEGs and collects results.
"""

from __future__ import annotations

import functools
import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpudenoise.core.config import cfg as default_cfg, get_output_dir
from tpudenoise.models.faster_rcnn import pad_to_bucket
from tpudenoise.noise.pipeline import make_pipeline
from tpudenoise.ops.boxes import bbox_transform_inv, clip_boxes_lower_only
from tpudenoise.ops.nms import NEG_INF, nms_fixpoint
from tpudenoise.utils.logging import get_metrics_logger
from tpudenoise.utils.timer import Timer


def _log_det_scores(dets: 'np.ndarray', image_index: int):
    """Per-detection 'score' scalar summaries for confident (>= 0.8)
    detections, stepped by image index — the reference writes one
    tf.Summary per such detection during eval (ref lib/model/test.py:
    1864-1874).  No-op without an attached tb/wandb sink."""
    logger = get_metrics_logger()
    if not logger.active_sinks or len(dets) == 0:
        return
    for s in dets[dets[:, -1] >= 0.8, -1]:
        logger.log_scalar_quiet('score', float(s), step=image_index)


@functools.partial(jax.jit,
                   static_argnames=('num_classes', 'max_per_class'))
def postprocess_detections(rois, roi_mask, cls_prob, bbox_pred, im_info,
                           num_classes: int, nms_thresh,
                           score_thresh, max_per_class: int = 100):
    """Decode class boxes, per-class NMS, fixed-size padded output.

    Mirrors the test loop (ref test.py:111-133 im_detect bbox decode +
    :1852-1897 per-class NMS and thresholds).  rois are in network-input
    coordinates; boxes are rescaled to original-image coordinates by
    1/im_info[2].
    Returns per class: boxes (C, M, 4), scores (C, M), mask (C, M).
    """
    scale = im_info[2]
    boxes = rois / scale                                   # (R, 4)
    pred = bbox_transform_inv(boxes, bbox_pred)            # (R, 4C)
    orig_hw = (jnp.round(im_info[0] / scale),
               jnp.round(im_info[1] / scale))
    pred = clip_boxes_lower_only(pred, orig_hw)
    r = rois.shape[0]
    pred = pred.reshape(r, num_classes, 4)
    return _per_class_nms(pred, cls_prob, roi_mask, num_classes,
                          nms_thresh, score_thresh, max_per_class)


def _per_class_nms(pred, cls_prob, roi_mask, num_classes, nms_thresh,
                   score_thresh, max_per_class):
    """ONE vmapped per-class NMS over the foreground classes instead of
    num_classes-1 unrolled copies of the suppression graph (VOC-21
    builds 20 of them otherwise — slower to compile AND to run).
    pred: (R, C, 4), cls_prob: (R, C), roi_mask: (R,)."""
    def per_class(b, s):
        valid = roi_mask & (s > score_thresh)
        keep, kmask = nms_fixpoint(b, s, nms_thresh,
                                   max_outputs=max_per_class, valid=valid)
        safe = jnp.maximum(keep, 0)
        return (jnp.where(kmask[:, None], b[safe], 0.0),
                jnp.where(kmask, s[safe], NEG_INF), kmask)

    boxes_cls = jnp.moveaxis(pred[:, 1:, :], 1, 0)      # (C-1, R, 4)
    scores_cls = cls_prob[:, 1:].T                      # (C-1, R)
    boxes_c, scores_c, mask_c = jax.vmap(per_class)(boxes_cls, scores_cls)
    return boxes_c, scores_c, mask_c


@functools.partial(jax.jit,
                   static_argnames=('num_classes', 'max_per_class'))
def postprocess_detections_pyramid(rois, roi_masks, cls_probs, bbox_preds,
                                   im_infos, num_classes: int, nms_thresh,
                                   score_thresh, max_per_class: int = 100):
    """Multi-scale im_detect merge: decode each pyramid level through its
    own im_scale back into ORIGINAL-image coordinates (the reference's
    _rescale_boxes, test.py:105-109), pool all levels' candidates, then
    ONE per-class NMS over the union — classic py-faster-rcnn pyramid
    semantics.  The reference ships the pyramid plumbing
    (_get_image_blob loops cfg.TEST.SCALES, test.py:49-83) while its
    im_detect asserts a single scale; this completes the contract.

    Level arrays are stacked on axis 0: rois (S, R, 4), roi_masks (S, R),
    cls_probs (S, R, C), bbox_preds (S, R, 4C), im_infos (S, 3)."""
    def decode(rois_l, pred_l, info_l):
        scale = info_l[2]
        boxes = rois_l / scale
        out = bbox_transform_inv(boxes, pred_l)
        orig_hw = (jnp.round(info_l[0] / scale),
                   jnp.round(info_l[1] / scale))
        return clip_boxes_lower_only(out, orig_hw)

    pred = jax.vmap(decode)(rois, bbox_preds, im_infos)   # (S, R, 4C)
    s, r = pred.shape[0], pred.shape[1]
    pred = pred.reshape(s * r, num_classes, 4)
    probs = cls_probs.reshape(s * r, num_classes)
    mask = roi_masks.reshape(s * r)
    return _per_class_nms(pred, probs, mask, num_classes, nms_thresh,
                          score_thresh, max_per_class)


def limit_per_image(boxes_c, scores_c, mask_c, max_per_image: int):
    """Global top max_per_image across classes (ref test.py:1890-1897),
    on host over the small padded arrays."""
    scores = np.where(mask_c, scores_c, -np.inf).ravel()
    if (scores > -np.inf).sum() > max_per_image:
        thresh = np.sort(scores[scores > -np.inf])[-max_per_image]
        mask_c = mask_c & (scores_c >= thresh)
    return mask_c


def derive_noise_buckets(shapes):
    """Static noise buckets for a set of raw (h, w) image shapes.

    None when every image shares one shape (rrData: the noise program
    compiles once at the exact size — bit-identical to the unbucketed
    path).  Otherwise one bucket per orientation = the max extent of that
    orientation's shapes, so the raw-resolution noise stage compiles
    O(buckets) programs instead of O(distinct shapes) (was
    harness.py's documented per-shape recompile)."""
    if len(set(shapes)) <= 1:
        return None
    buckets = {}
    for h, w in shapes:
        o = 'p' if h > w else 'l'
        bh, bw = buckets.get(o, (0, 0))
        buckets[o] = (max(bh, h), max(bw, w))
    return buckets


def _pad_raw_to_bucket(im: 'np.ndarray', bucket):
    """Edge-replicate pad a raw image to the noise bucket: the denoise
    stencil halo at the valid boundary then sees plausible pixels instead
    of zeros (the crop below discards the pad anyway)."""
    h, w = im.shape[:2]
    bh, bw = bucket
    return np.pad(im, ((0, bh - h), (0, bw - w), (0, 0)), mode='edge')


def test_net(model, params, imdb_obj, weights_filename: str, noise: str,
             max_per_image: int = 100, thresh: float = 0.0,
             config=None, bucket=None, strict_ref: bool = False,
             target_size=None, max_size=None, compute_id: bool = False,
             fast_rng: bool = False):
    """Full dataset evaluation (ref test.py:166-2226).

    bucket=None derives orientation-aware static buckets from the TEST
    geometry (landscape (s, m) / portrait (m, s)) — at most two compiled
    programs regardless of dataset shapes.

    compute_id=True additionally collects per-layer backbone activations
    (the probe points of the reference's ID study, test.py:1919-2218 —
    specific bottleneck conv3 / vgg conv outputs) for every image and logs
    the TwoNN intrinsic dimension per probe.  Costs one extra backbone
    forward per image (the reference re-ran sess.run once PER PROBE).

    Noise is synthesized at the ORIGINAL image resolution (reference
    order, test.py:189-1831); on shape-diverse datasets (VOC/COCO) the
    raw images are edge-padded to per-orientation noise buckets with the
    valid extent threaded to the raster-dependent generators
    (noise_fn.masked), so the noise stage compiles at most 2 programs
    instead of one per distinct shape.  Single-shape datasets (rrData)
    skip bucketing entirely — bit-identical to the exact-size path."""
    import cv2
    from tpudenoise.utils.blob import derive_bucket, prep_im_for_blob
    C = config or default_cfg
    np.random.seed(C.RNG_SEED)
    num_images = imdb_obj.num_images
    num_classes = imdb_obj.num_classes
    all_boxes = [[[] for _ in range(num_images)]
                 for _ in range(num_classes)]
    probe_fn, feats = None, None
    if compute_id:
        from tpudenoise.analysis.twonn import make_probe_fn
        probe_fn = make_probe_fn(model)
        feats = {}
    output_dir = get_output_dir(imdb_obj.name, weights_filename, C)

    noise_fn = make_pipeline(noise, mode='TEST', strict_ref=strict_ref,
                             fast_rng=fast_rng)
    print(f'noise pipeline backend: {noise_fn.backend}')
    key = jax.random.PRNGKey(C.RNG_SEED)
    timers = {'im_detect': Timer(), 'misc': Timer()}
    # full TEST.SCALES pyramid (ref _get_image_blob loops the tuple,
    # test.py:49-83): one forward per scale, detections merged through
    # postprocess_detections_pyramid.  target_size overrides to one scale.
    t_sizes = ((target_size,) if target_size is not None
               else tuple(C.TEST.SCALES))
    t_size = t_sizes[0]
    m_size = max_size or C.TEST.MAX_SIZE
    if len(t_sizes) > 1:
        print(f'multi-scale test pyramid: SCALES={t_sizes}')

    import PIL.Image
    raw_shapes = []
    for i in range(num_images):
        w, h = PIL.Image.open(imdb_obj.image_path_at(i)).size
        raw_shapes.append((h, w))
    # strict_ref keeps the exact-size reference-order noise path (one
    # compiled program per distinct raw shape): bucketing changes the
    # RNG layout and introduces 1-px stencil-halo deviations (PARITY #6),
    # which a parity run must not absorb silently (ADVICE r3).
    noise_buckets = None if strict_ref else derive_noise_buckets(raw_shapes)
    if noise_buckets:
        print(f'noise buckets: {noise_buckets} '
              f'({len(set(raw_shapes))} distinct raw shapes)')

    for i in range(num_images):
        im = cv2.imread(imdb_obj.image_path_at(i))
        timers['im_detect'].tic()
        # fused device noise->denoise on the original image; a gaussian-
        # plain plan emits the float [0,1] image which flows into the
        # mean-subtract prep as-is (quirk, ref test.py:290-305)
        if noise_buckets is None:
            noisy = noise_fn(jax.random.fold_in(key, i),
                             jnp.asarray(im.astype(np.float32))[None])
            noisy = np.asarray(noisy[0])
        else:
            h0, w0 = im.shape[:2]
            bkt = noise_buckets['p' if h0 > w0 else 'l']
            padded_raw = _pad_raw_to_bucket(im.astype(np.float32), bkt)
            keys_i = jax.vmap(
                lambda j: jax.random.fold_in(key, j))(
                jnp.asarray([i], jnp.int32))
            noisy = noise_fn.masked(
                keys_i, jnp.asarray(padded_raw)[None],
                jnp.asarray([[h0, w0]], jnp.int32))
            noisy = np.asarray(noisy[0])[:h0, :w0]
        # prep: mean subtract + min/max-side rescale (test.py:49-83),
        # once per pyramid scale (one compiled bucket per scale)
        levels = []
        for ts in t_sizes:
            imf, scale = prep_im_for_blob(
                noisy, np.asarray(C.PIXEL_MEANS, np.float32), ts, m_size)
            h, w = imf.shape[:2]
            img_bucket = bucket or derive_bucket(ts, m_size,
                                                 portrait=h > w)
            padded, (ph, pw) = pad_to_bucket(imf, img_bucket)
            im_info = jnp.asarray([ph, pw, scale], jnp.float32)
            out = model.forward_test(params, jnp.asarray(padded), im_info)
            levels.append((out, im_info, padded, ph, pw))
        out, im_info, padded, ph, pw = levels[0]
        if len(levels) == 1:
            boxes_c, scores_c, mask_c = postprocess_detections(
                out['rois'], out['roi_mask'], out['cls_prob'],
                out['bbox_pred'], im_info, num_classes,
                C.TEST.NMS, thresh, max_per_class=max_per_image)
        else:
            boxes_c, scores_c, mask_c = postprocess_detections_pyramid(
                jnp.stack([o['rois'] for o, *_ in levels]),
                jnp.stack([o['roi_mask'] for o, *_ in levels]),
                jnp.stack([o['cls_prob'] for o, *_ in levels]),
                jnp.stack([o['bbox_pred'] for o, *_ in levels]),
                jnp.stack([info for _, info, *_ in levels]),
                num_classes, C.TEST.NMS, thresh,
                max_per_class=max_per_image)
        timers['im_detect'].toc()

        if feats is not None:
            # probe only the valid (ph, pw) region — bucket padding must
            # not enter the pooled ID features
            hw = jnp.asarray([[ph, pw]], jnp.int32)
            for p, v in probe_fn(params, jnp.asarray(padded)[None],
                                 hw).items():
                feats.setdefault(p, []).append(np.asarray(v[0]))

        timers['misc'].tic()
        bx = np.asarray(boxes_c)
        sc = np.asarray(scores_c)
        mk_pre = np.asarray(mask_c)
        mk = limit_per_image(bx, sc, mk_pre, max_per_image)
        for j in range(1, num_classes):
            sel = mk[j - 1]
            dets = np.hstack([bx[j - 1][sel],
                              sc[j - 1][sel][:, None]]).astype(np.float32)
            all_boxes[j][i] = dets
            # score summaries come from the PRE-cap detections: the
            # reference writes them before the global max_per_image cap
            # (ref test.py:1864-1874 precedes the cap at :1890-1897)
            _log_det_scores(sc[j - 1][mk_pre[j - 1]][:, None], i)
        timers['misc'].toc()
        if (i + 1) % 20 == 0 or i == num_images - 1:
            print(f'im_detect: {i + 1:d}/{num_images:d} '
                  f'{timers["im_detect"].average_time:.3f}s '
                  f'{timers["misc"].average_time:.3f}s')

    det_file = os.path.join(output_dir, 'detections.pkl')
    with open(det_file, 'wb') as f:
        pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)
    _finish_eval(all_boxes, feats, imdb_obj, output_dir)
    return imdb_obj.evaluate_detections(all_boxes, output_dir)


def _finish_eval(all_boxes, feats, imdb_obj, output_dir):
    if feats and len(next(iter(feats.values()))) >= 10:
        from tpudenoise.analysis.twonn import per_layer_id
        from tpudenoise.utils.logging import get_metrics_logger
        ids = per_layer_id({p: np.stack(v) for p, v in feats.items()},
                           nres=10)
        print('TwoNN intrinsic dimension per probe layer:')
        logs = {}
        for p, (mean_id, err_id) in ids.items():
            print(f'  {p:28s} {mean_id:6.2f} +/- {err_id:.2f}')
            logs[f'twonn_id/{p}'] = mean_id
            logs[f'twonn_id_err/{p}'] = err_id
        get_metrics_logger().log(logs)
    print(f'Evaluating detections (artifacts in {output_dir})')


def _batched_eval_fns(model, num_classes, nms, thresh, max_per_image):
    """Jitted vmapped forward + postprocess, memoized per (model, eval
    params) so multi-config sweeps (e.g. experiments/noise_grid.py: one
    model, 39 noise configs) compile the detector ONCE instead of per
    test_net_batched call.  params rides as an argument, not a closure.

    The cache lives ON the model instance (not module-global), so a sweep
    constructing many FasterRCNN objects releases each model's jitted
    executables with the model instead of retaining them process-wide.

    forward_test reads model._cfg.TEST.* at trace time, so those knobs
    join the cache key — mutating cfg.TEST between calls (the
    test_e2e/dryrun pattern) must re-trace, not reuse a stale program."""
    T = model._cfg.TEST
    cache = model.__dict__.setdefault('_batched_eval_fns_cache', {})
    key = (num_classes, float(nms), float(thresh),
           int(max_per_image), T.MODE, int(T.RPN_TOP_N),
           int(T.RPN_PRE_NMS_TOP_N), int(T.RPN_POST_NMS_TOP_N),
           float(T.RPN_NMS_THRESH))
    if key not in cache:
        fwd = jax.jit(jax.vmap(
            lambda params, im, info: model.forward_test(params, im, info),
            in_axes=(None, 0, 0)))
        post = jax.jit(jax.vmap(
            lambda rois, mask, prob, pred, info: postprocess_detections(
                rois, mask, prob, pred, info, num_classes, nms,
                thresh, max_per_class=max_per_image),
            in_axes=(0, 0, 0, 0, 0)))
        # multi-scale merge: per image, pool the pyramid levels' decoded
        # candidates and run ONE per-class NMS over the union (level
        # arrays stacked on axis 1: (B, S, R, ...))
        post_pyr = jax.jit(jax.vmap(
            lambda rois, mask, prob, pred, info:
            postprocess_detections_pyramid(
                rois, mask, prob, pred, info, num_classes, nms,
                thresh, max_per_class=max_per_image),
            in_axes=(0, 0, 0, 0, 0)))
        cache[key] = (fwd, post, post_pyr)
    return cache[key]


def test_net_batched(model, params, imdb_obj, weights_filename: str,
                     noise: str, eval_batch: int = 8,
                     max_per_image: int = 100, thresh: float = 0.0,
                     config=None, bucket=None, strict_ref: bool = False,
                     compute_id: bool = False, mesh='auto',
                     device_prep: bool = True, fast_rng: bool = False):
    """Batched evaluation: images grouped by original size (noise runs on
    the original-resolution batch) and by padded bucket; one vmapped
    forward + postprocess per chunk.  ~4x fewer dispatches and full MXU
    occupancy vs the one-image loop — the reference evaluates strictly one
    image per sess.run (ref test.py:189).

    mesh='auto': when >1 device is visible and eval_batch divides the
    cfg.TPU.MESH_SHAPE mesh, chunks shard over the 'data' axis (params
    replicated, noise inside shard_map) — multi-chip eval with bit-exact
    per-image fold_in noise keys.  Pass mesh=None to force single-device.

    device_prep=True (default) runs the mean-subtract + cv2-convention
    bilinear rescale + bucket pad ON DEVICE (ops/resize.py: separable
    matmuls), chained device-to-device into the detector program — the
    noisy batch never returns to the host (the host path round-tripped it
    per chunk for a cv2.resize).  Geometry (scale, output dims) is still
    computed on the host with prep_im_for_blob's double-precision rule,
    so im_info is bit-identical; pixel values deviate from cv2 by <= ~0.05
    u8-levels at scale != 1 (f32 coordinates — see ops/resize.py), exact
    at scale == 1.  device_prep=False keeps the host cv2 hop.

    Results are identical to test_net up to the PRNG stream (noise keys
    fold per image index, preserved here) and, with device_prep, the
    resize float tail above."""
    import cv2
    from collections import defaultdict
    from tpudenoise.utils.blob import derive_bucket, prep_im_for_blob
    C = config or default_cfg
    np.random.seed(C.RNG_SEED)
    num_images = imdb_obj.num_images
    num_classes = imdb_obj.num_classes
    all_boxes = [[[] for _ in range(num_images)]
                 for _ in range(num_classes)]
    probe_fn, feats = None, None
    if compute_id:
        from tpudenoise.analysis.twonn import make_probe_fn
        probe_fn = make_probe_fn(model)
        feats = {}
    output_dir = get_output_dir(imdb_obj.name, weights_filename, C)
    noise_fn = make_pipeline(noise, mode='TEST', strict_ref=strict_ref,
                             fast_rng=fast_rng)
    print(f'noise pipeline backend: {noise_fn.backend}')
    key = jax.random.PRNGKey(C.RNG_SEED)
    # full TEST.SCALES pyramid, batched: noise runs ONCE per chunk at
    # the original resolution, then one device-prep + vmapped forward per
    # scale (one compiled program per scale), merged per image through
    # postprocess_detections_pyramid — same semantics as the sequential
    # pyramid (ref _get_image_blob loops the tuple, test.py:49-83)
    t_sizes = tuple(C.TEST.SCALES)
    t_size, m_size = t_sizes[0], C.TEST.MAX_SIZE
    if len(t_sizes) > 1:
        print(f'multi-scale test pyramid: SCALES={t_sizes}')
    timers = {'im_detect': Timer(), 'misc': Timer()}

    if mesh == 'auto':
        from tpudenoise.core.mesh import production_mesh
        mesh = production_mesh(C, eval_batch)
    data_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from tpudenoise.parallel.dp import replicate
        params = replicate(mesh, params)
        data_sh = NamedSharding(mesh, P('data'))
        print(f'evaluating on a {mesh.devices.size}-device mesh')

    pixel_means = np.asarray(C.PIXEL_MEANS, np.float32)
    _chunk_progs = {}

    def _noise_chunk_prog(img_bucket=None):
        """ONE device program per chunk: per-image fold_in + noise, and —
        when img_bucket is given (device_prep) — the mean-subtract +
        bilinear rescale + bucket pad chained on device, so the noisy
        batch feeds the detector without a host hop.  Memoized per
        img_bucket (at most two orientations)."""
        if img_bucket in _chunk_progs:
            return _chunk_progs[img_bucket]

        def _prep(noisy, geom):
            from tpudenoise.ops.resize import prep_on_device
            return jax.vmap(lambda im, g: prep_on_device(
                im, g[0], g[1], g[2], g[3], g[4], pixel_means,
                img_bucket))(noisy, geom)

        @jax.jit
        def run(k, idx, raw, hw=None, geom=None):
            # per-image fold_in inside the jit, bit-identical to the
            # sequential noise_fn(fold_in(k, i), im[None]).  hw engages
            # the bucketed-noise path (raw padded to a static bucket,
            # valid extents threaded to the generators).
            keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(idx)

            def body(keys, raw, hw, geom):
                noisy = (noise_fn.keyed(keys, raw) if hw is None
                         else noise_fn.masked(keys, raw, hw))
                return noisy if geom is None else _prep(noisy, geom)

            if mesh is None:
                return body(keys, raw, hw, geom)
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P
            args = [keys, raw] + ([hw] if hw is not None else []) \
                + ([geom] if geom is not None else [])

            def shard_body(*a):
                it = iter(a[2:])
                return body(a[0], a[1],
                            next(it) if hw is not None else None,
                            next(it) if geom is not None else None)

            return shard_map(shard_body, mesh=mesh,
                             in_specs=tuple(P('data') for _ in args),
                             out_specs=P('data'))(*args)

        _chunk_progs[img_bucket] = run
        return run

    _prep_progs = {}

    def _prep_prog(img_bucket):
        """Device prep (mean-subtract + rescale + bucket pad) from an
        ALREADY-noisy device batch — the per-scale stage of the batched
        pyramid, memoized per bucket so the noise program runs once per
        chunk and each scale reuses its own compiled prep."""
        if img_bucket in _prep_progs:
            return _prep_progs[img_bucket]
        from tpudenoise.ops.resize import prep_on_device

        def body(noisy, geom):
            return jax.vmap(lambda im, g: prep_on_device(
                im, g[0], g[1], g[2], g[3], g[4], pixel_means,
                img_bucket))(noisy, geom)

        @jax.jit
        def run(noisy, geom):
            if mesh is None:
                return body(noisy, geom)
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P
            return shard_map(body, mesh=mesh,
                             in_specs=(P('data'), P('data')),
                             out_specs=P('data'))(noisy, geom)

        _prep_progs[img_bucket] = run
        return run

    def _geom_for(h0, w0, ts):
        """prep_im_for_blob's double-precision geometry rule (scale, oh,
        ow) — computed on host so im_info is bit-identical to the cv2
        path (np.round == cvRound: both half-to-even)."""
        from tpudenoise.utils.blob import rescale_geometry
        return rescale_geometry(h0, w0, ts, m_size)

    fwd, post, post_pyr = _batched_eval_fns(model, num_classes,
                                            C.TEST.NMS, thresh,
                                            max_per_image)

    # group by noise shape: the exact original size when the dataset has
    # one, else the per-orientation noise bucket (<= 2 noise programs on
    # shape-diverse datasets instead of one per distinct raw shape)
    import PIL.Image
    raw_shapes = {}
    for i in range(num_images):
        w, h = PIL.Image.open(imdb_obj.image_path_at(i)).size
        raw_shapes[i] = (h, w)
    noise_buckets = derive_noise_buckets(list(raw_shapes.values()))
    if noise_buckets:
        print(f'noise buckets: {noise_buckets} '
              f'({len(set(raw_shapes.values()))} distinct raw shapes)')
    groups = defaultdict(list)
    for i in range(num_images):
        h, w = raw_shapes[i]
        groups[noise_buckets['p' if h > w else 'l'] if noise_buckets
               else (h, w)].append(i)

    chunks = []
    for (nh, nw), idxs in groups.items():
        for c0 in range(0, len(idxs), eval_batch):
            chunk = idxs[c0:c0 + eval_batch]
            n_real = len(chunk)
            # pad partial chunks by repeating the last index so every
            # chunk compiles to the same batch shape; padded results are
            # dropped below
            chunk = chunk + [chunk[-1]] * (eval_batch - n_real)
            chunks.append((nh, nw, chunk, n_real))

    def _load_chunk(nh, nw, chunk):
        imgs_raw = [cv2.imread(imdb_obj.image_path_at(i))
                    .astype(np.float32) for i in chunk]
        if noise_buckets:
            imgs_raw = [_pad_raw_to_bucket(im, (nh, nw))
                        for im in imgs_raw]
        return np.stack(imgs_raw)

    # decode JPEGs for chunk k+1 while the device runs chunk k (the
    # dispatch below is async; only the result readback blocks)
    from concurrent.futures import ThreadPoolExecutor
    ex = ThreadPoolExecutor(max_workers=1)
    futs = ([ex.submit(_load_chunk, *chunks[0][:3])] if chunks else [])

    done = 0
    for ci, (nh, nw, chunk, n_real) in enumerate(chunks):
        timers['im_detect'].tic()
        raw = futs[ci].result()
        futs[ci] = None  # release the decoded chunk (futures retain results)
        if ci + 1 < len(chunks):
            futs.append(ex.submit(_load_chunk, *chunks[ci + 1][:3]))
        raw_dev = jnp.asarray(raw)
        idx_dev = jnp.asarray(chunk, jnp.int32)
        hw_dev = None
        if noise_buckets:
            hw_dev = jnp.asarray([raw_shapes[i] for i in chunk],
                                 jnp.int32)
        if data_sh is not None:
            raw_dev = jax.device_put(raw_dev, data_sh)
            idx_dev = jax.device_put(idx_dev, data_sh)
            if hw_dev is not None:
                hw_dev = jax.device_put(hw_dev, data_sh)
        def _scale_geom(ts, img_bucket):
            geom, info_rows = [], []
            for i in chunk:
                hi, wi = raw_shapes[i]
                s, ph, pw = _geom_for(hi, wi, ts)
                # the host path's pad_to_bucket assertion, kept here: a
                # too-small bucket would otherwise silently zero-truncate
                # the image edge (resize_weights zero-fills past the
                # canvas) while im_info still reports (ph, pw)
                assert ph <= img_bucket[0] and pw <= img_bucket[1], \
                    f'image {ph}x{pw} exceeds bucket {img_bucket}'
                geom.append((hi, wi, ph, pw, s))
                info_rows.append((ph, pw, s))
            geom_dev = jnp.asarray(np.asarray(geom, np.float32))
            infos = jnp.asarray(np.asarray(info_rows, np.float32))
            if data_sh is not None:
                geom_dev = jax.device_put(geom_dev, data_sh)
                infos = jax.device_put(infos, data_sh)
            return geom_dev, infos

        per_scale = []  # [(imgs, infos)] per pyramid level
        if device_prep:
            h0, w0 = raw_shapes[chunk[0]]
            if len(t_sizes) == 1:
                # noise + prep + pad in one program; the batch never
                # returns to the host between noise and the detector
                img_bucket = bucket or derive_bucket(t_size, m_size,
                                                     portrait=h0 > w0)
                geom_dev, infos = _scale_geom(t_size, img_bucket)
                per_scale.append((_noise_chunk_prog(img_bucket)(
                    key, idx_dev, raw_dev, hw_dev, geom_dev), infos))
            else:
                # pyramid: noise ONCE at original resolution, then one
                # device prep per scale — all device-to-device
                noisy = _noise_chunk_prog(None)(key, idx_dev, raw_dev,
                                                hw_dev)
                for ts in t_sizes:
                    img_bucket = bucket or derive_bucket(
                        ts, m_size, portrait=h0 > w0)
                    geom_dev, infos = _scale_geom(ts, img_bucket)
                    per_scale.append(
                        (_prep_prog(img_bucket)(noisy, geom_dev), infos))
        else:
            noisy = np.asarray(_noise_chunk_prog(None)(
                key, idx_dev, raw_dev, hw_dev))
            for ts in t_sizes:
                imgs, infos = [], []
                for j in range(len(chunk)):
                    nj = noisy[j]
                    if noise_buckets:
                        hj, wj = raw_shapes[chunk[j]]
                        nj = nj[:hj, :wj]
                    imf, scale = prep_im_for_blob(
                        nj, pixel_means, ts, m_size)
                    h, w = imf.shape[:2]
                    img_bucket = bucket or derive_bucket(
                        ts, m_size, portrait=h > w)
                    padded, (ph, pw) = pad_to_bucket(imf, img_bucket)
                    imgs.append(padded)
                    infos.append((ph, pw, scale))
                imgs = jnp.asarray(np.stack(imgs))
                infos = jnp.asarray(np.asarray(infos, np.float32))
                if data_sh is not None:
                    imgs = jax.device_put(imgs, data_sh)
                    infos = jax.device_put(infos, data_sh)
                per_scale.append((imgs, infos))
        outs = [fwd(params, im_s, in_s) for im_s, in_s in per_scale]
        imgs, infos = per_scale[0]
        if len(outs) == 1:
            out = outs[0]
            boxes_c, scores_c, mask_c = post(
                out['rois'], out['roi_mask'], out['cls_prob'],
                out['bbox_pred'], infos)
        else:
            boxes_c, scores_c, mask_c = post_pyr(
                jnp.stack([o['rois'] for o in outs], axis=1),
                jnp.stack([o['roi_mask'] for o in outs], axis=1),
                jnp.stack([o['cls_prob'] for o in outs], axis=1),
                jnp.stack([o['bbox_pred'] for o in outs], axis=1),
                jnp.stack([in_s for _, in_s in per_scale], axis=1))
        timers['im_detect'].toc()

        timers['misc'].tic()
        bx, sc, mk = (np.asarray(boxes_c), np.asarray(scores_c),
                      np.asarray(mask_c))
        if feats is not None:
            hw = infos[:, :2].astype(jnp.int32)
            for p, v in probe_fn(params, imgs, hw).items():
                feats.setdefault(p, []).extend(np.asarray(v)[:n_real])
        for j, i in enumerate(chunk[:n_real]):
            mkj = limit_per_image(bx[j], sc[j], mk[j], max_per_image)
            for cls in range(1, num_classes):
                sel = mkj[cls - 1]
                all_boxes[cls][i] = np.hstack(
                    [bx[j][cls - 1][sel],
                     sc[j][cls - 1][sel][:, None]]).astype(np.float32)
                # pre-cap scores, matching the reference's summary order
                # (ref test.py:1864-1874 precedes the cap at :1890-1897)
                _log_det_scores(sc[j][cls - 1][mk[j][cls - 1]][:, None], i)
        timers['misc'].toc()
        done += n_real
        print(f'im_detect: {done:d}/{num_images:d} '
              f'{timers["im_detect"].average_time:.3f}s/chunk '
              f'{timers["misc"].average_time:.3f}s')

    ex.shutdown(wait=False)
    det_file = os.path.join(output_dir, 'detections.pkl')
    with open(det_file, 'wb') as f:
        pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)
    _finish_eval(all_boxes, feats, imdb_obj, output_dir)
    return imdb_obj.evaluate_detections(all_boxes, output_dir)
