"""Non-maximum suppression on device.

The reference ships three NMS implementations: a pure-python oracle
(ref: lib/nms/py_cpu_nms.py:10-38), a serial Cython CPU kernel
(ref: lib/nms/cpu_nms.pyx:17-68) and a CUDA bitmask-tile kernel
(ref: lib/nms/nms_kernel.cu:34-144).  All are host<->device round-trips.

Here NMS is a fixed-shape XLA program that stays on device:

* `nms` — exact greedy NMS as a `lax.scan` over `max_outputs` selection
  steps.  Each step picks the highest-scoring live box and suppresses its
  IoU>thresh neighbours; provably identical to the reference greedy order.
  Cost: max_outputs sequential steps of O(N) vector work — ideal for the
  test path (max_outputs=300).

* `nms_fixpoint` — the TPU re-expression of the CUDA bitmask algorithm:
  iterate `alive[j] = valid[j] & !any_{i<j}(iou[i,j]>t & alive[i])` to its
  fixpoint.  Converges to the exact greedy solution in O(longest
  suppression chain) data-parallel sweeps (each one big VPU matrix op),
  so it wins when max_outputs is large (train path: 2000 of 12000).

Both return indices into the *original* box order (like the reference's
`keep`), padded with -1, plus a validity mask.

numpy oracle for tests: `nms_py` (bit-identical port of py_cpu_nms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = jnp.finfo(jnp.float32).min


def _iou_one_vs_all(box: jnp.ndarray, boxes: jnp.ndarray,
                    areas: jnp.ndarray, area_i: jnp.ndarray) -> jnp.ndarray:
    """IoU of one box vs (N,4) boxes with the +1 convention
    (matches py_cpu_nms.py:22-31)."""
    xx1 = jnp.maximum(box[0], boxes[:, 0])
    yy1 = jnp.maximum(box[1], boxes[:, 1])
    xx2 = jnp.minimum(box[2], boxes[:, 2])
    yy2 = jnp.minimum(box[3], boxes[:, 3])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    return inter / (area_i + areas - inter)


@functools.partial(jax.jit, static_argnames=('max_outputs',))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold,
        max_outputs: int, valid: jnp.ndarray | None = None):
    """Exact greedy NMS.

    Args:
      boxes: (N, 4) float (x1, y1, x2, y2).
      scores: (N,) float.
      iou_threshold: scalar; boxes with IoU > threshold are suppressed
        (strict >, matching py_cpu_nms.py:37 `ovr <= thresh` keep rule).
      max_outputs: static output count.
      valid: optional (N,) bool mask of live inputs.

    Returns:
      keep: (max_outputs,) int32 indices into the input order, -1 padded.
      keep_mask: (max_outputs,) bool.
    """
    n = boxes.shape[0]
    scores = scores.astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)

    # Descending-score order; ties broken by index like np.argsort(kind=stable)
    # on negated scores (the reference uses argsort()[::-1], whose tie order
    # is reversed-index; detection scores are continuous so ties are a
    # measure-zero event — we prefer the stable ordering).
    order = jnp.argsort(-scores)
    sboxes = boxes[order].astype(jnp.float32)
    sscores = scores[order]
    areas = ((sboxes[:, 2] - sboxes[:, 0] + 1.0)
             * (sboxes[:, 3] - sboxes[:, 1] + 1.0))
    alive0 = sscores > NEG_INF

    def step(alive, _):
        idx = jnp.argmax(alive)          # first live box in score order
        any_alive = alive[idx]
        box = sboxes[idx]
        iou = _iou_one_vs_all(box, sboxes, areas, areas[idx])
        suppress = iou > iou_threshold   # includes idx itself (iou = 1)
        suppress = suppress | (jnp.arange(n) == idx)
        alive = jnp.where(any_alive, alive & ~suppress, alive)
        kept = jnp.where(any_alive, idx, -1)
        return alive, kept

    _, kept_sorted = jax.lax.scan(step, alive0, None, length=max_outputs)
    keep_mask = kept_sorted >= 0
    keep = jnp.where(keep_mask, order[jnp.maximum(kept_sorted, 0)], -1)
    return keep.astype(jnp.int32), keep_mask


@functools.partial(jax.jit, static_argnames=('max_outputs', 'max_iters'))
def nms_fixpoint(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold,
                 max_outputs: int, valid: jnp.ndarray | None = None,
                 max_iters: int | None = None):
    """Exact greedy NMS via data-parallel fixpoint sweeps.

    alive^{k+1}[j] = valid[j] & !OR_{i<j} (M[i,j] & alive^k[i]) with
    M[i,j] = IoU(i,j) > t over the score-sorted order.  The iteration
    reaches the greedy fixpoint in at most the longest suppress-chain
    length; each sweep is one (N, N) VPU matrix op — the TPU analogue of
    the 64x64 bitmask tiles in nms_kernel.cu:34-78.

    max_iters defaults to N (a chain cannot be longer than the box count),
    guaranteeing convergence to the exact greedy solution; the loop exits
    early the sweep after nothing changes (typically < 10 sweeps).
    """
    n = boxes.shape[0]
    if max_iters is None:
        max_iters = n
    scores = scores.astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)
    sboxes = boxes[order].astype(jnp.float32)
    in_valid = scores[order] > NEG_INF

    x1, y1, x2, y2 = sboxes[:, 0], sboxes[:, 1], sboxes[:, 2], sboxes[:, 3]
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    iou = inter / (areas[:, None] + areas[None, :] - inter)
    tri = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)  # i<j as [j, i]
    m = (iou > iou_threshold) & tri.T                   # M[i, j], i < j
    m = m & in_valid[None, :] & in_valid[:, None]

    def cond(state):
        k, alive, changed = state
        return changed & (k < max_iters)

    def body(state):
        k, alive, _ = state
        suppressed = jnp.any(m & alive[:, None], axis=0)
        new_alive = in_valid & ~suppressed
        return k + 1, new_alive, jnp.any(new_alive != alive)

    _, alive, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), in_valid, jnp.bool_(True)))

    # first max_outputs alive boxes in score order: scatter each kept box's
    # rank-among-kept into its output slot (OOB ranks dropped)
    rank = jnp.cumsum(alive) - 1
    slot = jnp.where(alive, rank, max_outputs)  # dead boxes scatter OOB
    keep_sorted = jnp.full((max_outputs,), -1, dtype=jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode='drop')
    keep_mask = keep_sorted >= 0
    keep = jnp.where(keep_mask, order[jnp.maximum(keep_sorted, 0)], -1)
    return keep.astype(jnp.int32), keep_mask


# ---------------------------------------------------------------------
# Bit-packed NMS: the true re-expression of the CUDA bitmask kernel
# (ref lib/nms/nms_kernel.cu:34-78: 64x64 IoU tiles -> 64-bit suppression
# masks).  Here the suppression matrix over the score-sorted order is
# materialized as (N/32, N) int32 words — bit b of word [wi, j] says
# "box i = wi*32+b suppresses box j" (i < j, IoU > t) — 32x smaller than
# the dense f32 IoU + bool masks of `nms_fixpoint` (18 MB vs 576+ MB at
# the reference's 12,000-box train budget, config.py:145-148), then swept
# to the exact greedy fixpoint over the packed words.
# ---------------------------------------------------------------------

_PACK = 32  # bits per mask word


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., K*32) bool -> (..., K) int32 words; bit b of word w covers
    element w*32+b.  int32 (not uint32): Mosaic has no unsigned
    reductions, and summing disjoint bits is bitwise-OR in two's
    complement regardless of sign."""
    shape = bits.shape[:-1] + (bits.shape[-1] // _PACK, _PACK)
    b3 = bits.reshape(shape).astype(jnp.int32)
    shifts = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return jnp.sum(b3 << shifts, axis=-1)


def _iou_tile(bx1, by1, bx2, by2, x1, y1, x2, y2):
    """IoU of a row-block (TI,) of boxes vs all (N,) boxes -> (TI, N),
    +1 convention."""
    ba = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(bx1[:, None], x1[None, :])
    yy1 = jnp.maximum(by1[:, None], y1[None, :])
    xx2 = jnp.minimum(bx2[:, None], x2[None, :])
    yy2 = jnp.minimum(by2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    return inter / (ba[:, None] + areas[None, :] - inter)


def build_suppression_masks(sboxes: jnp.ndarray, iou_threshold,
                            block: int = 512) -> jnp.ndarray:
    """Packed suppression masks over score-SORTED boxes, XLA tile scan.

    Scans i-row blocks so the peak temporary is one (block, N) f32 IoU
    tile, never the full (N, N).  Returns (N/32, N) int32 words.  N must be a
    multiple of `block` (and block of 32) — `nms_packed` pads.
    """
    n = sboxes.shape[0]
    assert n % block == 0 and block % _PACK == 0, (n, block)
    x1, y1, x2, y2 = (sboxes[:, k].astype(jnp.float32) for k in range(4))
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (block, n), 1)

    def step(_, i0):
        sl = lambda v: jax.lax.dynamic_slice(v, (i0,), (block,))
        iou = _iou_tile(sl(x1), sl(y1), sl(x2), sl(y2), x1, y1, x2, y2)
        i_ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (block, n), 0)
        m = (iou > iou_threshold) & (i_ids < j_ids)
        return None, _pack_bits(m.swapaxes(-1, -2)).swapaxes(-1, -2)

    _, words = jax.lax.scan(step, None,
                            jnp.arange(0, n, block, dtype=jnp.int32))
    return words.reshape(n // _PACK, n)


def _mask_tile_kernel(thresh_ref, rows_ref, cols_ref, out_ref):
    """One (TI, TJ) IoU tile -> (TI/32, TJ) packed suppression words
    (the Pallas analogue of one 64x64 CUDA block, nms_kernel.cu:34-78)."""
    ti = rows_ref.shape[0]
    tj = cols_ref.shape[1]
    i0 = pl.program_id(0) * ti
    j0 = pl.program_id(1) * tj

    # suppression is upper-triangular (i < j): tiles fully below the
    # diagonal are identically zero — skip their IoU work (~half the grid
    # at the 6k/12k RPN budgets)
    @pl.when(i0 >= j0 + tj)
    def _lower_triangle():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(i0 < j0 + tj)
    def _compute():
        bx1, by1 = rows_ref[:, 0], rows_ref[:, 1]
        bx2, by2 = rows_ref[:, 2], rows_ref[:, 3]
        x1, y1 = cols_ref[0, :], cols_ref[1, :]
        x2, y2 = cols_ref[2, :], cols_ref[3, :]
        iou = _iou_tile(bx1, by1, bx2, by2, x1, y1, x2, y2)
        i_ids = i0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
        j_ids = j0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
        m = (iou > thresh_ref[0]) & (i_ids < j_ids)
        b3 = m.reshape(ti // _PACK, _PACK, tj).astype(jnp.int32)
        shifts = jax.lax.broadcasted_iota(
            jnp.int32, (ti // _PACK, _PACK, tj), 1)
        out_ref[...] = jnp.sum(b3 << shifts, axis=1)


def build_suppression_masks_pallas(sboxes: jnp.ndarray, iou_threshold,
                                   tile: int = 512,
                                   interpret: bool = False) -> jnp.ndarray:
    """Pallas twin of `build_suppression_masks`: grid of (TI, TJ) IoU
    tiles, each reduced in VMEM to packed int32 words — no O(N^2) f32
    ever leaves registers.  N must be a multiple of `tile`."""
    n = sboxes.shape[0]
    assert n % tile == 0 and tile % _PACK == 0, (n, tile)
    rows = sboxes.astype(jnp.float32)                      # (N, 4)
    cols = rows.T                                          # (4, N)
    thresh = jnp.asarray([iou_threshold], jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # thresh rides SMEM
        grid=(n // tile, n // tile),
        in_specs=[
            pl.BlockSpec((tile, 4), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((4, tile), lambda i, j, *_: (0, j)),
        ],
        out_specs=pl.BlockSpec((tile // _PACK, tile),
                               lambda i, j, *_: (i, j)),
    )
    return pl.pallas_call(
        _mask_tile_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n // _PACK, n), jnp.int32),
        interpret=interpret,
    )(thresh, rows, cols)


@functools.partial(jax.jit, static_argnames=('max_outputs', 'max_iters',
                                             'use_pallas', 'interpret',
                                             'presorted'))
def nms_packed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold,
               max_outputs: int, valid: jnp.ndarray | None = None,
               max_iters: int | None = None,
               use_pallas: bool | None = None, interpret: bool = False,
               presorted: bool = False):
    """Exact greedy NMS via bit-packed suppression masks + fixpoint sweeps.

    Same contract and result as `nms_fixpoint` (proven equal to the
    py_cpu_nms greedy oracle) but the O(N^2) state is (N/32, N) packed int32 bit-words —
    use for the RPN proposal budgets (12,000 train / 6,000 test) where the
    dense formulation's f32 IoU matrix would dominate HBM.

    use_pallas None = auto (Pallas tile kernel on TPU, XLA tile scan
    elsewhere); the two builders are bit-identical.

    presorted=True asserts scores (after the valid mask) are already
    non-increasing — true for proposal_layer, whose candidates come
    straight out of lax.top_k — and skips the argsort + both
    order-gathers (tests pin equality with the unsorted path).
    """
    n_in = boxes.shape[0]
    # NMS emits integer indices — no gradient ever flows through it.
    # Severing tangents here lets JVP/VJP tracing skip the Pallas mask
    # builder (pallas_call has no JVP rule; without this jax.grad through
    # proposal_layer at the train budget raises NotImplementedError).
    boxes = jax.lax.stop_gradient(boxes)
    scores = jax.lax.stop_gradient(scores)
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    # tile >= 256 keeps the packed output block (tile//32, tile) on the
    # Mosaic (8, 128) tiling grid; 512 amortizes grid overhead for the
    # real RPN budgets
    tile = 512 if n_in >= 512 else 256
    n = ((n_in + tile - 1) // tile) * tile
    scores = scores.astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    boxes = jnp.pad(boxes.astype(jnp.float32), ((0, n - n_in), (0, 0)))
    scores = jnp.pad(scores, (0, n - n_in), constant_values=NEG_INF)
    if max_iters is None:
        max_iters = n
    if presorted:
        order = None                  # identity; pad rides at the end
        sboxes = boxes
        in_valid = scores > NEG_INF
    else:
        order = jnp.argsort(-scores)
        sboxes = boxes[order]
        in_valid = scores[order] > NEG_INF

    if use_pallas:
        masks = build_suppression_masks_pallas(sboxes, iou_threshold,
                                               tile=tile,
                                               interpret=interpret)
    else:
        masks = build_suppression_masks(sboxes, iou_threshold, block=tile)

    def cond(state):
        k, alive, changed = state
        return changed & (k < max_iters)

    def body(state):
        k, alive, _ = state
        alive_p = _pack_bits(alive)                       # (N/32,)
        suppressed = jnp.any((masks & alive_p[:, None]) != 0, axis=0)
        new_alive = in_valid & ~suppressed
        return k + 1, new_alive, jnp.any(new_alive != alive)

    _, alive, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), in_valid, jnp.bool_(True)))

    rank = jnp.cumsum(alive) - 1
    slot = jnp.where(alive, rank, max_outputs)
    keep_sorted = jnp.full((max_outputs,), -1, dtype=jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode='drop')
    keep_mask = keep_sorted >= 0
    if presorted:
        keep = keep_sorted
    else:
        keep = jnp.where(keep_mask, order[jnp.maximum(keep_sorted, 0)], -1)
    return keep.astype(jnp.int32), keep_mask


def nms_py(dets: np.ndarray, thresh: float) -> list:
    """Pure-numpy greedy NMS oracle (mirrors ref lib/nms/py_cpu_nms.py:10-38).

    dets: (N, 5) [x1, y1, x2, y2, score]. Returns kept indices.
    """
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    scores = dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        inds = np.where(ovr <= thresh)[0]
        order = order[inds + 1]
    return keep
