"""Region Proposal Network head (ref lib/nets/network.py:328-364
`_region_proposal`): 3x3 conv (RPN_CHANNELS=512) + relu, then 1x1 convs for
2A objectness logits and 4A box deltas.  Initializers: normal(0.01)
(network.py:238-244, TRUNCATED=False default)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class RPNHead(nn.Module):
    num_anchors: int = 9
    channels: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feat):
        init = nn.initializers.normal(0.01)
        x = nn.Conv(self.channels, (3, 3), padding='SAME', name='rpn_conv',
                    kernel_init=init, dtype=self.dtype,
                    param_dtype=jnp.float32)(feat)
        x = nn.relu(x)
        cls = nn.Conv(self.num_anchors * 2, (1, 1), padding='VALID',
                      name='rpn_cls_score', kernel_init=init,
                      dtype=self.dtype, param_dtype=jnp.float32)(x)
        bbox = nn.Conv(self.num_anchors * 4, (1, 1), padding='VALID',
                       name='rpn_bbox_pred', kernel_init=init,
                       dtype=self.dtype, param_dtype=jnp.float32)(x)
        return cls.astype(jnp.float32), bbox.astype(jnp.float32)


def rpn_softmax_scores(rpn_cls: jnp.ndarray, num_anchors: int
                       ) -> jnp.ndarray:
    """Per-anchor positive-class probability.

    The reference reshapes (H, W, 2A) into a 2-channel map, softmaxes, and
    slices the positive half rpn_cls_prob[..., A:] (network.py:71-90,
    337-346).  Its channel layout makes prob[..., A + a] the positive score
    of anchor a.  Equivalently: softmax over the (neg, pos) logit pair
    (cls[..., a], cls[..., A + a]).
    Input (H, W, 2A) -> output (H*W*A,) in the anchor-grid raster order.
    """
    h, w, c = rpn_cls.shape
    a = num_anchors
    neg = rpn_cls[..., :a]
    pos = rpn_cls[..., a:]
    score = jnp.exp(pos - jnp.logaddexp(neg, pos))
    return score.reshape(-1)


class RCNNHead(nn.Module):
    """Region classification/regression heads (ref network.py:366-383):
    cls_score Dense(num_classes) init normal(0.01), bbox_pred
    Dense(4*num_classes) init normal(0.001)."""
    num_classes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, fc7):
        cls = nn.Dense(self.num_classes, name='cls_score',
                       kernel_init=nn.initializers.normal(0.01),
                       dtype=self.dtype, param_dtype=jnp.float32)(fc7)
        bbox = nn.Dense(self.num_classes * 4, name='bbox_pred',
                        kernel_init=nn.initializers.normal(0.001),
                        dtype=self.dtype, param_dtype=jnp.float32)(fc7)
        return cls.astype(jnp.float32), bbox.astype(jnp.float32)
