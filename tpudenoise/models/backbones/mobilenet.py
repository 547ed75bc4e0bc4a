"""MobileNetV1 backbone (flax.linen).

Mirrors the reference's hand-rolled mobilenet (ref lib/nets/
mobilenet_v1.py:63-250): standard conv-def ladder (1 full conv + 13
depthwise-separable layers); detector split = layers 0-11 as the stride-16
head (mobilenet_v1.py:214-238) and layers 12-13 (the stride-2 1024-wide
pair) as the RoI tail (240-250); first FIXED_LAYERS=5 layers frozen
(216, config.py:236); depth multiplier scales widths (min 8).

BN in the reference follows slim defaults (trainable, decay 0.9997) but the
detector trains with is_training only for non-frozen layers; round 1 models
BN as the same FrozenBatchNorm used by resnet (statistics loaded, never
updated) — the dominant regime for the 5k-iter rrData schedule.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpudenoise.models.backbones.resnet import FrozenBatchNorm

# (kernel, stride, out_channels, depthwise?) — ref mobilenet_v1.py:63-79
CONV_DEFS = [
    (3, 2, 32, False),
    (3, 1, 64, True), (3, 2, 128, True), (3, 1, 128, True),
    (3, 2, 256, True), (3, 1, 256, True), (3, 2, 512, True),
    (3, 1, 512, True), (3, 1, 512, True), (3, 1, 512, True),
    (3, 1, 512, True), (3, 1, 512, True),          # layers 0..11: head
    (3, 2, 1024, True), (3, 1, 1024, True),        # layers 12..13: tail
]


def _depth(ch: int, multiplier: float) -> int:
    return max(int(ch * multiplier), 8)


def _same_pad(k: int, s: int):
    if s == 1:
        return 'SAME'
    pad = (k - 1) // 2
    return ((pad, k - 1 - pad),) * 2  # conv2d_same (mobilenet_v1.py:21-49)


class _Layer(nn.Module):
    kernel: int
    stride: int
    out_ch: int
    depthwise: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.depthwise:
            x = nn.Conv(x.shape[-1], (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=_same_pad(self.kernel, self.stride),
                        feature_group_count=x.shape[-1], use_bias=False,
                        name='depthwise', dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
            x = FrozenBatchNorm(self.dtype, name='dw_bn')(x)
            x = nn.relu6(x)
            x = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                        name='pointwise', dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
            x = FrozenBatchNorm(self.dtype, name='pw_bn')(x)
            return nn.relu6(x)
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=_same_pad(self.kernel, self.stride),
                    use_bias=False, name='conv', dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = FrozenBatchNorm(self.dtype, name='bn')(x)
        return nn.relu6(x)


class MobileNetV1Head(nn.Module):
    depth_multiplier: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i, (k, s, ch, dw) in enumerate(CONV_DEFS[:12]):
            x = _Layer(k, s, _depth(ch, self.depth_multiplier), dw,
                       self.dtype, name=f'layer_{i}')(x)
        return x


class MobileNetV1Tail(nn.Module):
    depth_multiplier: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, rois):
        x = rois.astype(self.dtype)
        for i, (k, s, ch, dw) in enumerate(CONV_DEFS[12:], start=12):
            x = _Layer(k, s, _depth(ch, self.depth_multiplier), dw,
                       self.dtype, name=f'layer_{i}')(x)
        return jnp.mean(x, axis=(1, 2))


def frozen_param_filter(num_fixed_layers: int = 5):
    """First FIXED_LAYERS layers frozen (ref mobilenet_v1.py:216) plus all
    BN statistics."""
    fixed = {f'layer_{i}' for i in range(num_fixed_layers)}

    def is_frozen(path: Sequence[str]) -> bool:
        parts = [str(p) for p in path]
        if any('bn' in p for p in parts):
            return True
        return bool(parts) and parts[0] in fixed

    return is_frozen
