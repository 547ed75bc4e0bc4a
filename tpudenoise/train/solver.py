"""Training solver: the SolverWrapper loop rebuilt (ref lib/model/
train_val.py:32-455, train_net entry :498-516).

Differences by design:
  * the per-iteration host noise pipeline (minibatch.py) moves on device —
    the loader yields raw resized batches and the jitted step applies the
    parsed NoisePlan, then mean-subtraction, then the model;
  * snapshots are orbax checkpoints carrying params, optimizer state, PRNG
    key and loader cursors (the reference pickles numpy RNG state + data
    cursors next to the TF ckpt, train_val.py:50-108) — exact resume;
  * snapshot pruning keeps SNAPSHOT_KEPT latest (train_val.py:232-251);
  * stepwise LR lives inside the optimizer schedule (no manual sess.run
    assign, train_val.py:293-301).
"""

from __future__ import annotations

import glob
import os
import os.path as osp
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpudenoise.core.config import cfg as default_cfg
from tpudenoise.data.loader import RoiDataLoader
from tpudenoise.noise.pipeline import make_pipeline
from tpudenoise.noise.spec import parse as parse_noise
from tpudenoise.train.train_step import TrainState, make_train_step
from tpudenoise.utils.logging import MetricsLogger
from tpudenoise.utils.timer import Timer


class Solver:
    def __init__(self, model, imdb_obj, roidb, valroidb, output_dir,
                 tb_dir, noise: str = 'original', config=None,
                 batch_size: int = 1, bucket=None,
                 max_gt: int = 100, prefetch: bool = False,
                 fast_rng: bool = False):
        self.model = model
        self.imdb = imdb_obj
        self.roidb = roidb
        self.valroidb = valroidb
        self.output_dir = output_dir
        self.cfg = config or default_cfg
        self.noise = noise
        if bucket is None:
            from tpudenoise.utils.blob import derive_bucket
            C = self.cfg
            any_portrait = any(e.get('height', 0) > e.get('width', 1)
                               for e in roidb)
            bucket = (derive_bucket(C.TRAIN.MAX_SIZE, C.TRAIN.MAX_SIZE)
                      if any_portrait
                      else derive_bucket(C.TRAIN.SCALES[0],
                                         C.TRAIN.MAX_SIZE))
        self.bucket = tuple(bucket)
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.prefetch = prefetch
        os.makedirs(output_dir, exist_ok=True)
        # JSONL + real tfevents files under the reference's tensorboard
        # dir layout (ref train_val.py:156-157)
        self.logger = MetricsLogger(logdir=tb_dir, tb_dir=tb_dir)

        # fused on-device noise for the TRAIN pipeline semantics
        # (use_pallas auto: fused Pallas kernels on TPU, XLA elsewhere)
        self._noise_fn = make_pipeline(
            parse_noise(noise, mode='TRAIN'), mode='TRAIN',
            fast_rng=fast_rng)
        print(f'noise pipeline backend: {self._noise_fn.backend}')
        # production multi-chip: cfg.TPU.MESH_SHAPE mesh when >1 device
        # and the batch divides it — params replicate, batches shard on
        # 'data', XLA inserts the gradient psum over ICI
        from tpudenoise.core.mesh import production_mesh
        self.mesh = production_mesh(self.cfg, batch_size)
        if self.mesh is not None:
            print(f'training on a {self.mesh.devices.size}-device '
                  f'{dict(zip(self.mesh.axis_names, self.mesh.devices.shape))} mesh')
        self._init_state_fn, self._step_fn = make_train_step(
            model, self.cfg, mesh=self.mesh)
        self._act_fn = None  # lazy jitted activation probe (summaries)

    # ---------------------------------------------------- snapshots ----

    def _snapshot_path(self, iter_: int) -> str:
        prefix = self.cfg.TRAIN.SNAPSHOT_PREFIX
        return osp.join(self.output_dir, f'{prefix}_iter_{iter_}')

    def snapshot(self, state: TrainState, key, loader, val_loader,
                 iter_: int):
        import orbax.checkpoint as ocp
        path = self._snapshot_path(iter_)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(osp.abspath(path) + '.orbax',
                   {'params': state.params, 'opt_state': state.opt_state,
                    'step': state.step,
                    'key': jax.random.key_data(key)}, force=True)
        ckptr.wait_until_finished()
        # loader cursors + numpy RNG, exactly resumable
        # (ref train_val.py:62-83)
        with open(path + '.pkl', 'wb') as f:
            pickle.dump({'train_cursor': loader.get_state(),
                         'val_cursor': val_loader.get_state(),
                         'iter': iter_}, f)
        print(f'Wrote snapshot to {path}')
        return path

    def remove_old_snapshots(self):
        kept = self.cfg.TRAIN.SNAPSHOT_KEPT
        pkls = sorted(glob.glob(osp.join(
            self.output_dir, f'{self.cfg.TRAIN.SNAPSHOT_PREFIX}'
                             f'_iter_*.pkl')),
            key=lambda p: int(p.rsplit('_', 1)[1].split('.')[0]))
        import shutil
        for p in pkls[:-kept] if kept > 0 else []:
            base = p[:-4]
            os.remove(p)
            if osp.isdir(base + '.orbax'):
                shutil.rmtree(base + '.orbax')

    def find_previous(self):
        """Newest resumable snapshot iter (ref train_val.py:166-186)."""
        pkls = glob.glob(osp.join(
            self.output_dir,
            f'{self.cfg.TRAIN.SNAPSHOT_PREFIX}_iter_*.pkl'))
        iters = sorted(int(p.rsplit('_', 1)[1].split('.')[0])
                       for p in pkls)
        return iters[-1] if iters else 0

    def restore(self, state: TrainState, loader, val_loader, iter_: int):
        import orbax.checkpoint as ocp
        path = self._snapshot_path(iter_)
        ckptr = ocp.StandardCheckpointer()
        tpl = {'params': state.params, 'opt_state': state.opt_state,
               'step': state.step,
               'key': jax.random.key_data(jax.random.PRNGKey(0))}
        restored = ckptr.restore(osp.abspath(path) + '.orbax', tpl)
        with open(path + '.pkl', 'rb') as f:
            side = pickle.load(f)
        loader.set_state(side['train_cursor'])
        val_loader.set_state(side['val_cursor'])
        # coerce restored leaves back onto the live pytree structure and
        # dtypes.  The np.asarray hop is load-bearing: orbax-restored
        # jax.Arrays carry a device/buffer layout that poisons the jit
        # dispatch cache (2nd step after restore dies with "supplied N
        # buffers but compiled program expected M"); a host round-trip
        # yields standard uncommitted arrays.
        coerce = lambda tpl_leaf, got: jnp.asarray(np.asarray(got),
                                                   tpl_leaf.dtype)
        new_state = TrainState(
            jax.tree_util.tree_map(coerce, state.params,
                                   restored['params']),
            jax.tree_util.tree_map(coerce, state.opt_state,
                                   restored['opt_state']),
            jnp.asarray(restored['step'], jnp.int32))
        key = jax.random.wrap_key_data(jnp.asarray(restored['key']))
        return new_state, key, side['iter']

    # --------------------------------------------------------- train ----

    def _prep_batch(self, key, batch):
        """Device noise + mean subtraction on the raw loader batch.
        The loader ships uint8; the f32 cast happens after transfer.

        Batches whose images all fill the bucket (the rrData single-shape
        contract) take the exact-size path, bit-identical to round-2
        streams.  Shape-diverse batches arrive edge-replicate-padded from
        the loader and go through the MASKED pipeline — raster-dependent
        generators and the wavelet's BayesShrink statistics follow each
        image's valid (h, w), matching the reference's exact-size noise
        semantics — then the pad is re-zeroed, because the reference
        zero-pads AFTER the noise stage (minibatch.py:1676-1688 ->
        blob.py:17-30) and the network must see the same zero pad.

        Under a mesh the batch dim shards over 'data' and the noise runs
        inside shard_map (each device applies the fused kernels to its
        local shard — Pallas calls never cross the partitioner), with
        per-image fold_in keys; the PRNG stream differs from the
        single-device fn(key, batch) path the same way the batched eval
        harness's does (documented there)."""
        imgs = jnp.asarray(batch['image']).astype(jnp.float32)
        batch = dict(batch)
        bh, bw = imgs.shape[1], imgs.shape[2]
        hw_np = np.asarray(batch['im_info'])[:, :2].astype(np.int32)
        padded = bool((hw_np != (bh, bw)).any())
        if padded:
            hw = jnp.asarray(hw_np)
            b = imgs.shape[0]
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(b))
            if self.mesh is None:
                noisy = self._noise_fn.masked(keys, imgs, hw)
            else:
                from jax.experimental.shard_map import shard_map
                from jax.sharding import (NamedSharding,
                                          PartitionSpec as P)
                sh = NamedSharding(self.mesh, P('data'))
                imgs = jax.device_put(imgs, sh)
                hw = jax.device_put(hw, sh)
                keys = jax.device_put(keys, sh)
                noisy = shard_map(self._noise_fn.masked, mesh=self.mesh,
                                  in_specs=(P('data'), P('data'),
                                            P('data')),
                                  out_specs=P('data'))(keys, imgs, hw)
                for k in ('im_info', 'gt_boxes', 'gt_mask'):
                    batch[k] = jax.device_put(jnp.asarray(batch[k]), sh)
            valid = ((jnp.arange(bh)[None, :, None] < hw[:, 0:1, None])
                     & (jnp.arange(bw)[None, None, :] < hw[:, 1:2, None]))
        elif self.mesh is None:
            noisy = self._noise_fn(key, imgs)
        else:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P
            b = imgs.shape[0]
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(b))
            sh = NamedSharding(self.mesh, P('data'))
            imgs = jax.device_put(imgs, sh)
            noisy = shard_map(self._noise_fn.keyed, mesh=self.mesh,
                              in_specs=(P('data'), P('data')),
                              out_specs=P('data'))(keys, imgs)
            for k in ('im_info', 'gt_boxes', 'gt_mask'):
                batch[k] = jax.device_put(jnp.asarray(batch[k]), sh)
        means = jnp.asarray(np.asarray(self.cfg.PIXEL_MEANS, np.float32))
        out = noisy - means
        if padded:
            # the reference's blob pad is zero AFTER mean subtraction
            # (prep_im_for_blob -> im_list_to_blob, blob.py:17-47)
            out = jnp.where(valid[..., None], out, 0.0)
        batch['image'] = out
        batch['im_info'] = jnp.asarray(batch['im_info'])
        batch['gt_boxes'] = jnp.asarray(batch['gt_boxes'])
        batch['gt_mask'] = jnp.asarray(batch['gt_mask'])
        return batch

    def _log_gt_image_summary(self, batch, it: int):
        """gt-box-annotated training image -> TensorBoard image summary
        (ref lib/nets/network.py:40-68 _add_gt_image_summary +
        lib/utils/visualization.py:50-89): add the pixel means back,
        BGR->RGB, crop the bucket padding, draw the gt boxes (already in
        network-input coordinates)."""
        if self.logger._tb is None and self.logger._wandb is None:
            return
        from tpudenoise.utils.visualization import draw_bounding_boxes
        img = (np.asarray(batch['image'][0])
               + np.asarray(self.cfg.PIXEL_MEANS, np.float32))
        h, w = (int(np.asarray(batch['im_info'][0][0])),
                int(np.asarray(batch['im_info'][0][1])))
        img = img[:h, :w, ::-1]
        gtm = np.asarray(batch['gt_mask'][0])
        gtb = np.asarray(batch['gt_boxes'][0])[gtm]
        self.logger.log_image('train/gt_image',
                              draw_bounding_boxes(img, gtb), step=it)

    def _log_histogram_summaries(self, state, batch, it: int):
        """TRAIN/ variable, SCORE/ prediction and ACT/ activation
        histograms -> TensorBoard, the reference's summary triple (ref
        lib/nets/network.py:57-68 _add_act_summary / _add_score_summary /
        _add_train_summary, merged every summary interval,
        train_val.py:325-362).

        Deviations: the score/activation tensors come from one jitted
        test-mode forward on the first batch image (the reference reads
        them out of the train graph's extra fetches); the RPN activation
        logged is the class-score map, not the 512-d hidden relu (not an
        output of the functional RPN module)."""
        if not self.logger.active_sinks:
            return
        params = state.params
        # TRAIN/: one histogram per trainable variable, path-named
        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        for path, leaf in flat:
            name = '/'.join(getattr(p, 'key', str(getattr(p, 'idx', p)))
                            for p in path)
            self.logger.log_histogram(f'TRAIN/{name}', np.asarray(leaf),
                                      step=it)
        img, info = batch['image'][0], batch['im_info'][0]
        if self._act_fn is None:
            self._act_fn = jax.jit(
                lambda p, im: self.model._rpn_forward(p, im)[:4])
        feat, rpn_map, rpn_scores, rpn_deltas = self._act_fn(params, img)
        out = self.model.forward_test(params, img, info)
        for tag, t in (('rpn_cls_prob', rpn_scores),
                       ('rpn_bbox_pred', rpn_deltas),
                       ('rois', out['rois']),
                       ('roi_scores', out['roi_scores']),
                       ('cls_score', out['cls_score']),
                       ('cls_prob', out['cls_prob']),
                       ('bbox_pred', out['bbox_pred'])):
            self.logger.log_histogram(f'SCORE/{tag}', np.asarray(t),
                                      step=it)
        for tag, t in (('net_conv', feat), ('rpn_cls_map', rpn_map)):
            a = np.asarray(t)
            self.logger.log_histogram(f'ACT/{tag}/activations', a, step=it)
            # tf.nn.zero_fraction twin (network.py:59-60)
            self.logger.log_scalar_quiet(
                f'ACT/{tag}/zero_fraction', float((a == 0).mean()), step=it)
        self.logger.flush()

    def train_model(self, max_iters: int, resume: bool = True):
        C = self.cfg
        loader = RoiDataLoader(self.roidb, self.imdb.num_classes, C,
                               batch_size=self.batch_size,
                               bucket=self.bucket, max_gt=self.max_gt)
        if self.prefetch:
            # overlap JPEG decode/resize with the device step (the only
            # host work left once noise moved on device)
            from tpudenoise.data.prefetch import PrefetchLoader
            loader = PrefetchLoader(loader)
        val_loader = RoiDataLoader(self.valroidb, self.imdb.num_classes,
                                   C, random_seed=int(time.time()) % 2**31,
                                   batch_size=self.batch_size,
                                   bucket=self.bucket, max_gt=self.max_gt)
        key = jax.random.PRNGKey(C.RNG_SEED)
        state = self._init_state_fn(key, self.bucket)
        start = 0
        if resume:
            last = self.find_previous()
            if last > 0:
                print(f'Restoring from iteration {last}')
                state, key, start = self.restore(state, loader,
                                                 val_loader, last)
        if self.mesh is not None:
            # replicate params/optimizer over the mesh (restore already
            # coerced leaves to host arrays, so this holds after resume
            # too — the snapshot round-trip stays topology-agnostic)
            from tpudenoise.parallel.dp import replicate
            state = replicate(self.mesh, state)

        timer = Timer()
        last_summary = time.time()
        for it in range(start + 1, max_iters + 1):
            timer.tic()
            key, k_noise, k_step = jax.random.split(key, 3)
            batch = self._prep_batch(k_noise, loader.forward())
            state, losses = self._step_fn(state, k_step, batch)
            timer.toc()

            if it % C.TRAIN.DISPLAY == 0:
                vals = {k: float(v) for k, v in losses.items()}
                self.logger.log(vals, step=it)
                print(f'iter: {it} / {max_iters}, '
                      f'total loss: {vals["total_loss"]:.6f} '
                      f'({timer.average_time:.3f}s/iter)')
                if not np.isfinite(vals['total_loss']) and C.TRAIN.get(
                        'NAN_ABORT', True):
                    raise FloatingPointError(
                        f'non-finite loss at iter {it}: {vals} — '
                        f'aborting (set TRAIN.NAN_ABORT False to ignore)')
            if time.time() - last_summary > C.TRAIN.SUMMARY_INTERVAL:
                self._log_gt_image_summary(batch, it)
                self._log_histogram_summaries(state, batch, it)
                if self.valroidb:
                    key, k_vn, k_vs = jax.random.split(key, 3)
                    vbatch = self._prep_batch(k_vn, val_loader.forward())
                    _, vlosses = self._step_fn(state, k_vs, vbatch)
                    self.logger.log({'val_' + k: float(v)
                                     for k, v in vlosses.items()}, step=it)
                last_summary = time.time()
            if it % C.TRAIN.SNAPSHOT_ITERS == 0:
                self.snapshot(state, key, loader, val_loader, it)
                self.remove_old_snapshots()

        if max_iters % C.TRAIN.SNAPSHOT_ITERS != 0:
            self.snapshot(state, key, loader, val_loader, max_iters)
        return state


def train_net(model, imdb_obj, roidb, valroidb, output_dir, tb_dir,
              pretrained_params=None, max_iters: int = 40000,
              noise: str = 'original', config=None, batch_size: int = 1,
              bucket=None, fast_rng: bool = False,
              prefetch: bool = False):
    """Entry point (ref train_val.py:498-516)."""
    from tpudenoise.data.roidb import filter_roidb
    roidb = filter_roidb(roidb, config)
    valroidb = filter_roidb(valroidb, config) if valroidb else []
    solver = Solver(model, imdb_obj, roidb, valroidb, output_dir, tb_dir,
                    noise=noise, config=config, batch_size=batch_size,
                    bucket=bucket, fast_rng=fast_rng, prefetch=prefetch)
    if pretrained_params is not None:
        base = solver._init_state_fn(
            jax.random.PRNGKey((config or default_cfg).RNG_SEED),
            solver.bucket)
        merged = _merge_pretrained(base.params, pretrained_params)

        orig_init = solver._init_state_fn

        def init_with_pretrained(key, image_shape):
            st = orig_init(key, image_shape)
            return TrainState(merged, st.opt_state, st.step)

        solver._init_state_fn = init_with_pretrained
    print('Solving...')
    state = solver.train_model(max_iters)
    print('done solving')
    return state


def _merge_pretrained(params, pretrained):
    """Overlay pretrained leaves onto the init tree where paths match.

    Unmatched pretrained keys are loudly reported — a converter emitting
    wrong names would otherwise silently leave random weights (this
    exact failure shipped once: block4 under the wrong tail nesting)."""
    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    pre = dict(jax.tree_util.tree_flatten_with_path(pretrained)[0])
    unmatched = [k for k in pre if k not in flat]
    if unmatched:
        names = ['/'.join(str(getattr(p, "key", p)) for p in k)
                 for k in unmatched[:10]]
        print(f'WARNING: {len(unmatched)} pretrained entries matched no '
              f'model parameter and were ignored, e.g. {names}')
    n_hit = sum(1 for k in pre if k in flat)
    print(f'Loaded {n_hit}/{len(flat)} parameters from pretrained weights')
    merged = {k: pre.get(k, v) for k, v in flat.items()}
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [merged[k] for k, _ in
                  jax.tree_util.tree_flatten_with_path(params)[0]])
