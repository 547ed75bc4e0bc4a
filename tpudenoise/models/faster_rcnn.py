"""Faster R-CNN assembly: backbone -> RPN -> proposals -> RoI pool -> tail
-> classification/regression heads, everything on device under one jit.

Re-designs the reference's graph builder (ref lib/nets/network.py:237-267
`_build_network` and 391-460 `create_architecture`) as three functional
linen modules (head / rpn / tail+heads) glued by pure ops — no tf.py_func
host hops: proposals (ops/proposal.py), RoI pooling (ops/roi_align.py) and
the training target layers (train/targets.py) are all XLA.

Shapes are static: images arrive padded to a bucket (H, W) with the true
extent in `im_info = (h, w, scale)` (the reference feeds exact-size
placeholders per image, network.py:391-394); proposals/detections are
fixed-size padded tensors with validity masks.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpudenoise.core.config import AttrDict, cfg as default_cfg
from tpudenoise.models.backbones import mobilenet, resnet, vgg
from tpudenoise.models.rpn import RCNNHead, RPNHead, rpn_softmax_scores
from tpudenoise.ops.anchors import anchor_grid, num_anchors
from tpudenoise.ops.proposal import proposal_layer, proposal_top_layer
from tpudenoise.ops.roi_align import (crop_and_resize, max_pool_2x2_same,
                                      roi_boxes_to_normalized)

import flax.linen as nn

FEAT_STRIDE = 16


class _TailWithHeads(nn.Module):
    """RoI tail + cls/bbox heads share one param tree."""
    tail: nn.Module
    num_classes: int
    tail_takes_train: bool = False

    @nn.compact
    def __call__(self, crops, train: bool = False):
        if self.tail_takes_train:
            fc = self.tail(crops, train=train)
        else:
            fc = self.tail(crops)
        return RCNNHead(self.num_classes, name='rcnn')(fc)


@dataclasses.dataclass(eq=False)  # identity hash: jit-static by instance
class FasterRCNN:
    """Network factory + functional forward passes.

    backbone: 'vgg16' | 'res50' | 'res101' | 'res152' | 'mobile'
    (ref tools/trainval_net.py:134-145 net selection).
    """
    backbone: str = 'res101'
    num_classes: int = 21
    anchor_scales: tuple = (8, 16, 32)
    anchor_ratios: tuple = (0.5, 1, 2)
    cfg: AttrDict | None = None
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        C = self.cfg or default_cfg
        self._cfg = C
        self.num_anchors = num_anchors(self.anchor_scales,
                                       self.anchor_ratios)
        if self.backbone == 'vgg16':
            self.head_mod = vgg.VGG16Head(dtype=self.dtype)
            tail = vgg.VGG16Tail(dtype=self.dtype)
            takes_train = True
            self.pool_then_max = True   # crop 14 -> maxpool 7
            self.frozen_filter = vgg.frozen_param_filter()
        elif self.backbone in ('res50', 'res101', 'res152'):
            n = int(self.backbone[3:])
            self.head_mod = resnet.ResNetHead(n, dtype=self.dtype)
            tail = resnet.ResNetTail(n, dtype=self.dtype)
            takes_train = False
            # RESNET.MAX_POOL False: direct 7x7 crop (resnet_v1.py:60-81)
            self.pool_then_max = bool(C.RESNET.MAX_POOL)
            self.frozen_filter = resnet.frozen_param_filter(
                C.RESNET.FIXED_BLOCKS,
                freeze_root=bool(C.RESNET.get('FREEZE_ROOT', True)))
        elif self.backbone == 'mobile':
            dm = C.MOBILENET.DEPTH_MULTIPLIER
            self.head_mod = mobilenet.MobileNetV1Head(dm, dtype=self.dtype)
            tail = mobilenet.MobileNetV1Tail(dm, dtype=self.dtype)
            takes_train = False
            self.pool_then_max = True
            self.frozen_filter = mobilenet.frozen_param_filter(
                C.MOBILENET.FIXED_LAYERS)
        else:
            raise ValueError(f'unknown backbone {self.backbone}')
        self.tail_mod = _TailWithHeads(tail, self.num_classes, takes_train)
        self.rpn_mod = RPNHead(self.num_anchors, C.RPN_CHANNELS,
                               dtype=self.dtype)
        self.pool_size = C.POOLING_SIZE

    # ------------------------------------------------------------ init --

    def init(self, key, image_shape=(608, 1024)):
        """Initialize all parameter trees.  Returns {'head','rpn','tail'}."""
        kh, kr, kt = jax.random.split(key, 3)
        h, w = image_shape
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        head_p = self.head_mod.init(kh, dummy)['params']
        feat = self.head_mod.apply({'params': head_p}, dummy)
        rpn_p = self.rpn_mod.init(kr, feat)['params']
        dummy_crops = jnp.zeros(
            (2, self.pool_size, self.pool_size, feat.shape[-1]),
            self.dtype)
        tail_p = self.tail_mod.init(kt, dummy_crops)['params']
        if self.backbone.startswith('res'):
            # identity residual units at random init (see
            # resnet.zero_init_residual); overwritten by pretrained loads
            head_p = resnet.zero_init_residual(head_p)
            tail_p = resnet.zero_init_residual(tail_p)
        return {'head': head_p, 'rpn': rpn_p, 'tail': tail_p}

    # --------------------------------------------------------- helpers --

    def _rpn_forward(self, params, image):
        """image: (H, W, 3) preprocessed.  Returns feat (fh, fw, C),
        anchor-grid scores (K*A,), deltas (K*A, 4), anchors (K*A, 4)."""
        feat = self.head_mod.apply({'params': params['head']},
                                   image[None])[0]
        rpn_cls, rpn_bbox = self.rpn_mod.apply({'params': params['rpn']},
                                               feat[None])
        fh, fw = feat.shape[0], feat.shape[1]
        scores = rpn_softmax_scores(rpn_cls[0], self.num_anchors)
        deltas = rpn_bbox[0].reshape(-1, 4)
        anchors = anchor_grid(fh, fw, FEAT_STRIDE, self.anchor_scales,
                              self.anchor_ratios)
        return feat, rpn_cls[0], scores, deltas, anchors

    def _pool(self, params, feat, rois, train=False, dropout_rng=None):
        """RoI pooling + tail + heads.  rois: (R, 4) image-space boxes."""
        fh, fw = feat.shape[0], feat.shape[1]
        norm = roi_boxes_to_normalized(rois, (fh, fw), FEAT_STRIDE)
        if self.pool_then_max:
            crops = crop_and_resize(feat, norm, self.pool_size * 2)
            crops = max_pool_2x2_same(crops)
        else:
            crops = crop_and_resize(feat, norm, self.pool_size)
        rngs = {'dropout': dropout_rng} if dropout_rng is not None else None
        return self.tail_mod.apply({'params': params['tail']}, crops,
                                   train=train, rngs=rngs)

    # ------------------------------------------------------------ test --

    @functools.partial(jax.jit, static_argnames=('self',))
    def forward_test(self, params, image, im_info):
        """One image inference (ref network.py test path + test.py
        im_detect:111-133).

        image: (H, W, 3) float32, BGR, mean-subtracted, padded.
        im_info: (3,) = (true_h, true_w, scale).
        Returns dict with fixed-size padded rois/scores/boxes + mask.
        """
        C = self._cfg
        feat, _, scores, deltas, anchors = self._rpn_forward(params, image)
        if C.TEST.MODE == 'top':
            rois, roi_scores, mask = proposal_top_layer(
                scores, deltas, anchors, im_info[:2], C.TEST.RPN_TOP_N)
        else:
            rois, roi_scores, mask = proposal_layer(
                scores, deltas, anchors, im_info[:2], C.TEST.RPN_NMS_THRESH,
                C.TEST.RPN_PRE_NMS_TOP_N, C.TEST.RPN_POST_NMS_TOP_N)
        cls_score, bbox_pred = self._pool(params, feat, rois)
        cls_prob = jax.nn.softmax(cls_score, axis=-1)
        # test-time denormalization of bbox deltas (network.py:434-438)
        stds = jnp.tile(jnp.asarray(C.TRAIN.BBOX_NORMALIZE_STDS,
                                    jnp.float32), self.num_classes)
        means = jnp.tile(jnp.asarray(C.TRAIN.BBOX_NORMALIZE_MEANS,
                                     jnp.float32), self.num_classes)
        bbox_pred = bbox_pred * stds + means
        return {'rois': rois, 'roi_scores': roi_scores, 'roi_mask': mask,
                'cls_score': cls_score, 'cls_prob': cls_prob,
                'bbox_pred': bbox_pred,
                # pooled backbone feature for the TwoNN ID study
                # (ref test.py:1919-2218 samples conv activations per image)
                'feat_pooled': jnp.mean(feat, axis=(0, 1)).astype(
                    jnp.float32)}


    # ----------------------------------------------------------- train --

    def forward_train(self, params, key, image, im_info, gt_boxes, gt_mask):
        """One-image training forward: RPN -> proposals -> on-device target
        assignment -> RoI heads -> 4-term loss dict (ref network.py
        `_region_proposal` train branch :347-352 + `_add_losses` :284-326).

        gt_boxes: (G, 5) padded (x1, y1, x2, y2, class); gt_mask: (G,).
        """
        C = self._cfg
        k_at, k_pt, k_do = jax.random.split(key, 3)
        feat, rpn_cls_map, scores, deltas, anchors = self._rpn_forward(
            params, image)
        rois, roi_scores, mask = proposal_layer(
            scores, deltas, anchors, im_info[:2], C.TRAIN.RPN_NMS_THRESH,
            C.TRAIN.RPN_PRE_NMS_TOP_N, C.TRAIN.RPN_POST_NMS_TOP_N)

        from tpudenoise.train.losses import detection_losses
        from tpudenoise.train.targets import (anchor_target_layer,
                                              proposal_target_layer)
        at = anchor_target_layer(
            k_at, anchors, gt_boxes, gt_mask, im_info[:2],
            rpn_batch=C.TRAIN.RPN_BATCHSIZE,
            fg_fraction=C.TRAIN.RPN_FG_FRACTION,
            pos_thresh=C.TRAIN.RPN_POSITIVE_OVERLAP,
            neg_thresh=C.TRAIN.RPN_NEGATIVE_OVERLAP,
            clobber_positives=bool(C.TRAIN.RPN_CLOBBER_POSITIVES))
        pt = proposal_target_layer(
            k_pt, rois, mask, gt_boxes, gt_mask, self.num_classes,
            batch=C.TRAIN.BATCH_SIZE, fg_fraction=C.TRAIN.FG_FRACTION,
            fg_thresh=C.TRAIN.FG_THRESH, bg_hi=C.TRAIN.BG_THRESH_HI,
            bg_lo=C.TRAIN.BG_THRESH_LO,
            bbox_normalize_stds=tuple(C.TRAIN.BBOX_NORMALIZE_STDS),
            bbox_normalize_means=tuple(C.TRAIN.BBOX_NORMALIZE_MEANS),
            use_gt=bool(C.TRAIN.USE_GT))

        cls_score, bbox_pred = self._pool(params, feat, pt.rois,
                                          train=True, dropout_rng=k_do)
        # per-anchor (neg, pos) logit pairs in anchor-grid order
        a = self.num_anchors
        neg = rpn_cls_map[..., :a].reshape(-1)
        pos = rpn_cls_map[..., a:].reshape(-1)
        rpn_logits = jnp.stack([neg, pos], axis=1)
        rpn_deltas_flat = deltas  # (K*A, 4) — same raster as anchors
        losses = detection_losses(
            rpn_logits, at.labels, rpn_deltas_flat, at.bbox_targets,
            at.bbox_inside_weights, at.bbox_outside_weights,
            cls_score, pt.labels, bbox_pred, pt.bbox_targets,
            pt.bbox_inside_weights, pt.bbox_outside_weights)
        return losses


def preprocess(image_u8: np.ndarray, pixel_means, target_size: int = 600,
               max_size: int = 1000):
    """Host-side prep mirroring _get_image_blob (ref lib/model/test.py:
    49-83): delegates to utils.blob.prep_im_for_blob, the single source of
    truth for the mean-subtract + min/max-side rescale rule."""
    from tpudenoise.utils.blob import prep_im_for_blob
    return prep_im_for_blob(image_u8, pixel_means, target_size, max_size)


def pad_to_bucket(im: np.ndarray, bucket=(608, 1024)):
    """Zero-pad (H, W, 3) to the static bucket; returns padded + (h, w)."""
    h, w = im.shape[:2]
    bh, bw = bucket
    assert h <= bh and w <= bw, f'image {h}x{w} exceeds bucket {bh}x{bw}'
    out = np.zeros((bh, bw, 3), np.float32)
    out[:h, :w] = im
    return out, (h, w)
