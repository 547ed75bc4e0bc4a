"""Training step: SGD+momentum with the reference's optimizer semantics,
data-parallel over a jax.sharding.Mesh.

Reference semantics reproduced (ref lib/model/train_val.py:121-164):
  * MomentumOptimizer(lr, 0.9) with a stepwise lr schedule
    (LEARNING_RATE * GAMMA^k after each STEPSIZE, train_val.py:293-301);
  * bias gradients doubled before momentum (DOUBLE_BIAS, :139-148);
  * L2 weight decay folded into the loss on kernel weights only
    (BIAS_DECAY False; slim weights_regularizer, network.py:421-428);
  * frozen layers (backbone-specific filters) get zero updates.

TPU-native: the step is one pjit'd program; the batch dim is sharded over
the 'data' mesh axis and gradients are averaged with a mean over the batch
(XLA inserts the psum over ICI).  The reference is strictly batch=1 on one
GPU (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tpudenoise.core.config import AttrDict


def lr_schedule(cfg: AttrDict):
    # LEARNING_RATE scaled by GAMMA at each STEPSIZE boundary
    # (ref train_val.py:293-301)
    step = optax.piecewise_constant_schedule(
        cfg.TRAIN.LEARNING_RATE,
        {int(s): cfg.TRAIN.GAMMA for s in cfg.TRAIN.STEPSIZE})
    # optional linear warmup (TRAIN.WARMUP_ITERS, default 0 = reference
    # semantics).  Needed for FROM-SCRATCH resnet training: FrozenBN
    # never normalizes, so random-init features start large and the
    # first full-LR steps diverge; the reference never trains from
    # scratch (it always restores ImageNet weights).
    warmup = int(cfg.TRAIN.get('WARMUP_ITERS', 0))
    if warmup <= 0:
        return step

    def sched(count):
        scale = jnp.minimum(1.0, (count + 1) / warmup)
        return step(count) * scale

    return sched


def _is_bias(path) -> bool:
    last = str(path[-1].key if hasattr(path[-1], 'key') else path[-1])
    return last == 'bias'


def _is_kernel(path) -> bool:
    last = str(path[-1].key if hasattr(path[-1], 'key') else path[-1])
    return last == 'kernel'


def make_optimizer(cfg: AttrDict, frozen_filters: dict):
    """frozen_filters: {'head': filter_fn|None, 'rpn': None, 'tail': ...} —
    per-tree predicates over param paths (backbone freeze boundaries)."""

    def trainable_mask(params):
        def visit(path, _):
            tree = str(path[0].key if hasattr(path[0], 'key') else path[0])
            f = frozen_filters.get(tree)
            sub = [str(p.key if hasattr(p, 'key') else p) for p in path[1:]]
            return not (f is not None and f(sub))
        return jax.tree_util.tree_map_with_path(visit, params)

    def bias_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: _is_bias(p), params)

    clip = float(cfg.TRAIN.get('GRAD_CLIP', 0.0) or 0.0)
    chain = optax.chain(
        # optional global-norm gradient clipping (TRAIN.GRAD_CLIP, default
        # 0 = off = reference semantics); from-scratch resnets spike
        optax.clip_by_global_norm(clip) if clip > 0 else optax.identity(),
        optax.masked(optax.scale(2.0), bias_mask)
        if cfg.TRAIN.DOUBLE_BIAS else optax.identity(),
        optax.trace(decay=cfg.TRAIN.MOMENTUM, nesterov=False),
        optax.scale_by_learning_rate(lr_schedule(cfg)),
    )
    # freezing = zeroed grads before update (step_fn), so momentum state of
    # frozen params never accumulates
    return chain, trainable_mask


def l2_regularization(params, weight_decay: float):
    """slim l2_regularizer over kernel weights: wd * sum(w^2)/2
    (biases excluded, BIAS_DECAY=False)."""
    def term(path, w):
        return (weight_decay * 0.5 * jnp.sum(
            w.astype(jnp.float32) ** 2)) if _is_kernel(path) else 0.0
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map_with_path(term, params))
    return sum(leaves)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_step(model, cfg: AttrDict, mesh=None):
    """Returns (init_state_fn, step_fn).

    step_fn(state, key, batch) -> (state, losses); batch is a dict of
    batched arrays {image (B,H,W,3), im_info (B,3), gt_boxes (B,G,5),
    gt_mask (B,G)} — shard its leading dim over the 'data' mesh axis and
    jit with replicated params for multi-chip DP.

    mesh: when given, the step jits with EXPLICIT in/out shardings
    (state replicated, batch data-sharded) — inputs are resharded on
    entry and outputs pinned, so the dispatch cache stays stable across
    steps whatever provenance the arrays carry (step outputs, device_put,
    orbax restores).  Without it the second step could die with
    "supplied N buffers but compiled program expected M".
    """
    frozen = {'head': model.frozen_filter, 'rpn': None, 'tail': None}
    tx, trainable_mask = make_optimizer(cfg, frozen)

    def init_state(key, image_shape=(608, 1024)):
        params = model.init(key, image_shape)
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    wd = cfg.TRAIN.WEIGHT_DECAY

    def loss_fn(params, key, batch):
        b = batch['image'].shape[0]
        keys = jax.random.split(key, b)
        losses = jax.vmap(
            lambda k, im, info, gt, gm: model.forward_train(
                params, k, im, info, gt, gm))(
            keys, batch['image'], batch['im_info'], batch['gt_boxes'],
            batch['gt_mask'])
        mean_losses = jax.tree_util.tree_map(jnp.mean, losses)
        reg = l2_regularization(params, wd)
        total = mean_losses['total_loss'] + reg
        mean_losses = dict(mean_losses)
        mean_losses['total_loss'] = total
        return total, mean_losses

    def step_fn(state: TrainState, key, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, losses), grads = grad_fn(state.params, key, batch)
        # zero gradients of frozen params so momentum stays empty
        mask = trainable_mask(state.params)
        grads = jax.tree_util.tree_map(
            lambda g, m: g * m, grads,
            jax.tree_util.tree_map(
                lambda m: jnp.asarray(m, jnp.float32), mask))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), losses

    if mesh is None:
        step_fn = jax.jit(step_fn)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P('data'))
        step_fn = jax.jit(step_fn,
                          in_shardings=(repl, repl, data),
                          out_shardings=(repl, repl))

    return init_state, step_fn
