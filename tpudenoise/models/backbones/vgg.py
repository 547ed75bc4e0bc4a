"""VGG16 backbone (flax.linen).

Mirrors the reference's slim stack (ref lib/nets/vgg16.py:31-65): conv1-5
with 2x2 SAME max-pools between stages (13 convs, stride-16 head with 512
channels — conv5 has no following pool), fc6/fc7 4096 tail with dropout 0.5
in training.  conv1/conv2 are frozen (vgg16.py:33-37) — see
`frozen_param_filter`.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

_STAGES = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]


class VGG16Head(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for si, (reps, width) in enumerate(_STAGES):
            for ri in range(reps):
                x = nn.Conv(width, (3, 3), padding='SAME',
                            name=f'conv{si + 1}_{ri + 1}', dtype=self.dtype,
                            param_dtype=jnp.float32)(x)
                x = nn.relu(x)
            if si < 4:  # no pool after conv5
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding='SAME')
        return x


class VGG16Tail(nn.Module):
    """fc6/fc7 4096 with dropout (ref vgg16.py:53-65).  Input: pooled RoIs
    (R, 7, 7, 512), flattened like slim.flatten."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, rois, train: bool = False):
        x = rois.astype(self.dtype).reshape(rois.shape[0], -1)
        x = nn.Dense(4096, name='fc6', dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        if train:
            x = nn.Dropout(0.5, deterministic=False)(x)
        x = nn.Dense(4096, name='fc7', dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        if train:
            x = nn.Dropout(0.5, deterministic=False)(x)
        return x


def frozen_param_filter():
    """conv1_* and conv2_* frozen (ref vgg16.py:33-37)."""

    def is_frozen(path: Sequence[str]) -> bool:
        parts = [str(p) for p in path]
        return bool(parts) and (parts[0].startswith('conv1_')
                                or parts[0].startswith('conv2_'))

    return is_frozen
