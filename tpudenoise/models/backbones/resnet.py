"""ResNet-v1 50/101/152 backbones (flax.linen), detector configuration.

Re-expresses the reference's slim resnet_v1 usage (ref lib/nets/
resnet_v1.py:51-185): stride-16 head = root conv + blocks 1-3 with block3
stride 1; block4 (stride 1) + global average pool as the RoI tail; BN frozen
everywhere (inference mode, stats never updated — resnet_v1.py:27-49);
explicit 'conv2d_same' padding so geometry is deterministic for any input
size (resnet_v1.py:86-91).

TPU policy: params float32, compute bfloat16 (MXU-native).  Parameter
freezing (RESNET.FIXED_BLOCKS, resnet_v1.py:93-118) is an optimizer-mask
concern — `frozen_param_filter` exposes the reference's boundaries.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

BLOCK_UNITS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class FrozenBatchNorm(nn.Module):
    """BN with loaded statistics, never updated (slim is_training=False,
    trainable=False — ref resnet_v1.py:31-38).  A pure affine transform."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param('gamma', nn.initializers.ones, (c,), jnp.float32)
        beta = self.param('beta', nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param('mean', nn.initializers.zeros, (c,), jnp.float32)
        var = self.param('var', nn.initializers.ones, (c,), jnp.float32)
        scale = (gamma / jnp.sqrt(var + 1e-5)).astype(self.dtype)
        bias = (beta - mean * gamma / jnp.sqrt(var + 1e-5)).astype(
            self.dtype)
        return x * scale + bias


def _conv(features, kernel, stride=1, name=None, dtype=jnp.bfloat16):
    if stride > 1:
        # slim conv2d_same: explicit symmetric pad then VALID
        pad = (kernel - 1) // 2
        padding = ((pad, kernel - 1 - pad),) * 2
    else:
        padding = 'SAME'
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=padding, use_bias=False, name=name, dtype=dtype,
                   param_dtype=jnp.float32)


class Bottleneck(nn.Module):
    depth_bottleneck: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        depth = self.depth_bottleneck * 4
        depth_in = x.shape[-1]
        if depth_in == depth:
            # identity shortcut, subsampled if strided
            shortcut = x if self.stride == 1 else x[:, ::self.stride,
                                                    ::self.stride, :]
        else:
            shortcut = _conv(depth, 1, self.stride, 'shortcut',
                             self.dtype)(x)
            shortcut = FrozenBatchNorm(self.dtype, name='shortcut_bn')(
                shortcut)
        r = _conv(self.depth_bottleneck, 1, 1, 'conv1', self.dtype)(x)
        r = FrozenBatchNorm(self.dtype, name='bn1')(r)
        r = nn.relu(r)
        r = _conv(self.depth_bottleneck, 3, self.stride, 'conv2',
                  self.dtype)(r)
        r = FrozenBatchNorm(self.dtype, name='bn2')(r)
        r = nn.relu(r)
        r = _conv(depth, 1, 1, 'conv3', self.dtype)(r)
        r = FrozenBatchNorm(self.dtype, name='bn3')(r)
        return nn.relu(shortcut + r)


class ResNetBlock(nn.Module):
    """slim resnet_v1_block: stride applies to the LAST unit."""
    base_depth: int
    num_units: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_units):
            s = self.stride if i == self.num_units - 1 else 1
            x = Bottleneck(self.base_depth, s, self.dtype,
                           name=f'unit_{i + 1}')(x)
        return x


class ResNetHead(nn.Module):
    """Root + blocks 1..3 -> stride-16 feature map (1024 channels)."""
    num_layers: int = 101
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        units = BLOCK_UNITS[self.num_layers]
        x = x.astype(self.dtype)
        # root: conv7x7/2 (conv2d_same) + pad(1,1) + maxpool3x3/2 VALID
        x = _conv(64, 7, 2, 'conv1', self.dtype)(x)
        x = FrozenBatchNorm(self.dtype, name='conv1_bn')(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')
        x = ResNetBlock(64, units[0], 2, self.dtype, name='block1')(x)
        x = ResNetBlock(128, units[1], 2, self.dtype, name='block2')(x)
        x = ResNetBlock(256, units[2], 1, self.dtype, name='block3')(x)
        return x


class ResNetTail(nn.Module):
    """block4 over pooled RoIs + global average pool -> (R, 2048)
    (ref resnet_v1.py:120-132)."""
    num_layers: int = 101
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, rois):
        units = BLOCK_UNITS[self.num_layers]
        x = ResNetBlock(512, units[3], 1, self.dtype, name='block4')(
            rois.astype(self.dtype))
        return jnp.mean(x, axis=(1, 2))


def zero_init_residual(params):
    """Zero the final conv kernel (conv3) of every bottleneck so each
    residual unit is identity at init.

    FrozenBatchNorm never normalizes (it is a loaded affine), so a
    RANDOM-init resnet's activations grow with depth through the residual
    sums — res101 at LR 1e-3 diverges to NaN within two steps.  The
    reference never hits this (it always restores ImageNet stats,
    resnet_v1.py:175-185).  This is the zero-residual-branch trick
    ("Accurate, Large Minibatch SGD", Goyal et al.) applied to the CONV
    kernel, NOT the bn3 gamma: frozen_param_filter freezes every BN
    parameter, so a zeroed gamma would never train and the residual
    branches would stay permanently dead (zero gradient flows to
    conv1/conv2/conv3 through a frozen zero scale).  The conv3 kernel IS
    trainable and has a nonzero gradient at zero weight, so training
    revives every branch immediately.  Pretrained loads overwrite these
    kernels, so the transform is a no-op for the checkpoint path."""
    import jax

    def fix(path, leaf):
        keys = [getattr(p, 'key', str(p)) for p in path]
        if len(keys) >= 2 and keys[-2] == 'conv3' and keys[-1] == 'kernel':
            return jnp.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, params)


def frozen_param_filter(num_fixed_blocks: int = 1,
                        freeze_root: bool = True):
    """Param-path predicate implementing RESNET.FIXED_BLOCKS + always-frozen
    root and BN (ref resnet_v1.py:93-118: base always fixed; first
    FIXED_BLOCKS blocks fixed; BN frozen everywhere).

    freeze_root=False (cfg.RESNET.FREEZE_ROOT) unfreezes the root conv —
    the reference freezes it because it is PRETRAINED; when training from
    scratch a frozen random root would cripple learning.  BN stays frozen
    either way (it is an affine, not a statistic)."""
    fixed_blocks = {f'block{i + 1}' for i in range(num_fixed_blocks)}

    def is_frozen(path: Sequence[str]) -> bool:
        parts = [str(p) for p in path]
        if any(('bn' in p or p == 'conv1_bn' or p == 'shortcut_bn')
               for p in parts):
            return True
        if freeze_root and parts and (parts[0] == 'conv1'
                                      or parts[0] == 'conv1_bn'):
            return True
        if parts and parts[0] in fixed_blocks:
            return True
        return False

    return is_frozen
