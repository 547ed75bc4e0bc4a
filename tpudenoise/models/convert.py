"""Pretrained-weight conversion.

The reference performs in-graph checkpoint surgery at init time: RGB->BGR
flip of the first conv and (for vgg) conv->fc reshape of fc6/fc7
(ref lib/nets/vgg16.py:67-105, resnet_v1.py:160-185, mobilenet_v1.py:
266-278).  Here conversion is a one-shot offline step producing a .npz in
this framework's param layout; loading is then trivial and framework-pure.

Converters are gated on their source frameworks (tensorflow for tf-slim
ckpts, torch for torchvision state dicts) — neither is required at
runtime.

.npz layout: flat keys 'tree/sub/.../leaf' -> array, where tree is one of
head|rpn|tail.
"""

from __future__ import annotations

import numpy as np


def save_params_npz(params: dict, path: str):
    import jax
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f'{prefix}/{k}' if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    walk('', params)
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    data = np.load(path)
    out = {}
    for key in data.files:
        parts = key.split('/')
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = data[key]
    return out


def load_pretrained(path: str, net: str) -> dict:
    """Load pretrained weights for --weight: .npz (converted) only; raw
    tf-slim/torch files must be converted first (convert_tf_slim /
    convert_torch_resnet)."""
    if path.endswith('.npz'):
        return load_params_npz(path)
    raise ValueError(
        f'Unsupported weight file {path!r}: convert tf-slim/torch weights '
        f'to .npz first (tpudenoise.models.convert).')


# ---------------------------------------------------------------------
# tf-slim checkpoint -> npz (requires tensorflow; offline tool)
# ---------------------------------------------------------------------

def _bgr_flip_conv(w: np.ndarray) -> np.ndarray:
    """Reverse the input-channel axis of an HWIO conv kernel — the RGB->BGR
    surgery (ref resnet_v1.py:175-185)."""
    return w[:, :, ::-1, :]


def convert_tf_slim_resnet(ckpt_path: str, num_layers: int,
                           bgr_flip: bool = True) -> dict:
    """slim resnet_v1_{50,101,152} ImageNet checkpoint -> head/tail trees.

    Var-name mapping: resnet_v1_N/convN/... BatchNorm {gamma, beta,
    moving_mean, moving_variance} -> FrozenBatchNorm {gamma, beta, mean,
    var}; unit_k/bottleneck_v{1,2,3} -> unit_k/{conv1..3,bn1..3};
    shortcut convs map to shortcut/shortcut_bn.  conv1 gets the BGR flip
    (skip with bgr_flip=False for reference-TRAINED detector checkpoints,
    whose conv1 was already flipped at init — ref resnet_v1.py:175-185).
    """
    from tensorflow.python.training import py_checkpoint_reader
    reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    scope = f'resnet_v1_{num_layers}'
    units = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
             152: (3, 8, 36, 3)}[num_layers]

    def bn(prefix):
        return {'gamma': reader.get_tensor(prefix + '/gamma'),
                'beta': reader.get_tensor(prefix + '/beta'),
                'mean': reader.get_tensor(prefix + '/moving_mean'),
                'var': reader.get_tensor(prefix + '/moving_variance')}

    conv1 = reader.get_tensor(scope + '/conv1/weights')
    head = {'conv1': {'kernel':
                      _bgr_flip_conv(conv1) if bgr_flip else conv1},
            'conv1_bn': bn(scope + '/conv1/BatchNorm')}
    # the live tree nests the RoI tail one level deeper (the tail module
    # is the 'tail' submodule of _TailWithHeads): tail/tail/block4/...
    trees = {'head': head, 'tail': {'tail': {}}}
    for b in range(1, 5):
        block = {}
        for u in range(1, units[b - 1] + 1):
            base = f'{scope}/block{b}/unit_{u}/bottleneck_v1'
            unit = {}
            if reader.has_tensor(base + '/shortcut/weights'):
                unit['shortcut'] = {'kernel': reader.get_tensor(
                    base + '/shortcut/weights')}
                unit['shortcut_bn'] = bn(base + '/shortcut/BatchNorm')
            for i in (1, 2, 3):
                unit[f'conv{i}'] = {'kernel': reader.get_tensor(
                    f'{base}/conv{i}/weights')}
                unit[f'bn{i}'] = bn(f'{base}/conv{i}/BatchNorm')
            block[f'unit_{u}'] = unit
        dest = trees['head'] if b < 4 else trees['tail']['tail']
        dest[f'block{b}'] = block
    return trees


def convert_tf_slim_vgg16(ckpt_path: str) -> dict:
    """slim vgg_16 ImageNet checkpoint: conv1_1 BGR flip + fc6/fc7
    conv->dense reshape (ref vgg16.py:86-105)."""
    from tensorflow.python.training import py_checkpoint_reader
    reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    head = {}
    reps = [2, 2, 3, 3, 3]
    for s, rep in enumerate(reps, start=1):
        for r in range(1, rep + 1):
            w = reader.get_tensor(f'vgg_16/conv{s}/conv{s}_{r}/weights')
            b = reader.get_tensor(f'vgg_16/conv{s}/conv{s}_{r}/biases')
            if s == 1 and r == 1:
                w = _bgr_flip_conv(w)
            head[f'conv{s}_{r}'] = {'kernel': w, 'bias': b}
    tail = {'tail': {}}
    fc6 = reader.get_tensor('vgg_16/fc6/weights')      # (7,7,512,4096)
    tail['tail']['fc6'] = {'kernel': fc6.reshape(-1, 4096),
                           'bias': reader.get_tensor('vgg_16/fc6/biases')}
    fc7 = reader.get_tensor('vgg_16/fc7/weights')      # (1,1,4096,4096)
    tail['tail']['fc7'] = {'kernel': fc7.reshape(4096, 4096),
                           'bias': reader.get_tensor('vgg_16/fc7/biases')}
    return {'head': head, 'tail': tail}


def convert_tf_slim_mobilenet(ckpt_path: str,
                              depth_multiplier: float = 1.0,
                              surgery: bool = True) -> dict:
    """slim MobilenetV1 ImageNet checkpoint -> head/tail trees.

    Var-name mapping: MobilenetV1/Conv2d_0/{weights,BatchNorm} ->
    layer_0/{conv,bn}; Conv2d_{i}_depthwise/depthwise_weights (k,k,C,1) ->
    layer_i/depthwise (k,k,1,C); Conv2d_{i}_pointwise/weights ->
    layer_i/pointwise.

    surgery=True applies the reference's checkpoint fix for ImageNet
    mobilenet weights: Conv2d_0 RGB->BGR flip AND /(255/2) input-scale
    match (ref lib/nets/mobilenet_v1.py:266-278 — slim mobilenets were
    trained on [-1, 1] inputs while this framework feeds mean-subtracted
    pixel-scale BGR).  Use surgery=False for reference-TRAINED detector
    checkpoints where the fix was already applied at init.
    """
    from tensorflow.python.training import py_checkpoint_reader
    reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    scope = 'MobilenetV1'

    def bn(prefix):
        return {'gamma': reader.get_tensor(prefix + '/BatchNorm/gamma'),
                'beta': reader.get_tensor(prefix + '/BatchNorm/beta'),
                'mean': reader.get_tensor(
                    prefix + '/BatchNorm/moving_mean'),
                'var': reader.get_tensor(
                    prefix + '/BatchNorm/moving_variance')}

    conv0 = reader.get_tensor(scope + '/Conv2d_0/weights')
    if surgery:
        conv0 = _bgr_flip_conv(conv0) / (255.0 / 2.0)
    layers = {'layer_0': {'conv': {'kernel': conv0},
                          'bn': bn(scope + '/Conv2d_0')}}
    for i in range(1, 14):
        dw = reader.get_tensor(
            f'{scope}/Conv2d_{i}_depthwise/depthwise_weights')
        layers[f'layer_{i}'] = {
            # slim depthwise (k,k,C,1) -> flax grouped conv (k,k,1,C)
            'depthwise': {'kernel': np.transpose(dw, (0, 1, 3, 2))},
            'dw_bn': bn(f'{scope}/Conv2d_{i}_depthwise'),
            'pointwise': {'kernel': reader.get_tensor(
                f'{scope}/Conv2d_{i}_pointwise/weights')},
            'pw_bn': bn(f'{scope}/Conv2d_{i}_pointwise'),
        }
    head = {k: layers[k] for k in [f'layer_{i}' for i in range(12)]}
    tail = {'tail': {f'layer_{i}': layers[f'layer_{i}']
                     for i in (12, 13)}}
    return {'head': head, 'tail': tail}


# ---------------------------------------------------------------------
# reference-TRAINED detector checkpoint -> full {head, rpn, tail} npz
# ---------------------------------------------------------------------

_DETECTOR_SCOPES = {'vgg16': 'vgg_16', 'res50': 'resnet_v1_50',
                    'res101': 'resnet_v1_101', 'res152': 'resnet_v1_152',
                    'mobile': 'MobilenetV1'}


def convert_ref_detector(ckpt_path: str, net: str) -> dict:
    """Reference-trained Faster R-CNN checkpoint -> full param tree.

    Ingests the var scopes the reference trainer writes (ref lib/nets/
    network.py:328-383: `{scope}/rpn_conv/3x3`, `{scope}/rpn_cls_score`,
    `{scope}/rpn_bbox_pred`, `{scope}/cls_score`, `{scope}/bbox_pred`,
    plus the backbone scope; tools/convert_from_depre.py performs the
    analogous migration for pre-refactor snapshots).  No input-channel
    surgery: trained checkpoints already carry BGR conv1 / scaled
    mobilenet weights (the init-time fix_variables ran before training),
    and vgg fc6/fc7 are already dense (25088/4096-in — the conv->fc
    reshape also happened at init, ref vgg16.py:86-105).

    bbox_pred weights are stored UN-normalized in reference checkpoints
    (the stds/means de-normalization is applied to the OUTPUT at test
    time, ref network.py:434-438) — this framework does the same in
    forward_test, so weights convert verbatim.

    Returns {head, rpn, tail} matching FasterRCNN.init's tree; class
    count is implied by the checkpoint's cls_score shape.
    """
    from tensorflow.python.training import py_checkpoint_reader
    reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    scope = _DETECTOR_SCOPES[net]

    if net == 'vgg16':
        trees = _vgg_detector_backbone(reader, scope)
    elif net in ('res50', 'res101', 'res152'):
        trees = convert_tf_slim_resnet(ckpt_path, int(net[3:]),
                                       bgr_flip=False)
    elif net == 'mobile':
        trees = convert_tf_slim_mobilenet(ckpt_path, surgery=False)
    else:
        raise ValueError(f'unknown net {net!r}')

    def wb(name):
        return {'kernel': reader.get_tensor(f'{scope}/{name}/weights'),
                'bias': reader.get_tensor(f'{scope}/{name}/biases')}

    trees['rpn'] = {'rpn_conv': wb('rpn_conv/3x3'),
                    'rpn_cls_score': wb('rpn_cls_score'),
                    'rpn_bbox_pred': wb('rpn_bbox_pred')}
    trees['tail']['rcnn'] = {'cls_score': wb('cls_score'),
                             'bbox_pred': wb('bbox_pred')}
    return trees


def _vgg_detector_backbone(reader, scope: str) -> dict:
    """vgg_16 backbone vars from a TRAINED detector ckpt: conv stack
    verbatim (already BGR), fc6/fc7 already dense."""
    head = {}
    reps = [2, 2, 3, 3, 3]
    for s, rep in enumerate(reps, start=1):
        for r in range(1, rep + 1):
            head[f'conv{s}_{r}'] = {
                'kernel': reader.get_tensor(
                    f'{scope}/conv{s}/conv{s}_{r}/weights'),
                'bias': reader.get_tensor(
                    f'{scope}/conv{s}/conv{s}_{r}/biases')}
    tail = {'tail': {}}
    for fc in ('fc6', 'fc7'):
        w = reader.get_tensor(f'{scope}/{fc}/weights')
        if w.ndim == 4:          # tolerate pre-surgery conv layout
            w = w.reshape(-1, w.shape[-1])
        tail['tail'][fc] = {
            'kernel': w,
            'bias': reader.get_tensor(f'{scope}/{fc}/biases')}
    return {'head': head, 'tail': tail}


# ---------------------------------------------------------------------
# torchvision resnet -> npz (requires torch; offline tool)
# ---------------------------------------------------------------------

def convert_torch_resnet(state_dict, num_layers: int) -> dict:
    """torchvision resnet{50,101,152} state dict -> head/tail trees.

    torch OIHW conv kernels -> HWIO; BN running stats -> FrozenBatchNorm.
    NOTE: torchvision weights are RGB-trained with [0,1]-normalized inputs
    while this framework (like the reference) feeds BGR mean-subtracted
    pixels — apply the BGR flip on conv1 and fold the normalization into
    conv1 before using (left to the calling script; flip done here).

    Layout mapping: layer{1..4}.{k} -> block{1..4}/unit_{k+1};
    downsample -> shortcut; conv{1..3}/bn{1..3} direct.  torchvision
    resnets stride in conv2 of the FIRST unit per layer, whereas slim (and
    this framework) stride the LAST unit — weights are stride-agnostic so
    the mapping remains valid, but features differ slightly from slim
    models; prefer slim checkpoints for reference parity.
    """
    units = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
             152: (3, 8, 36, 3)}[num_layers]

    def conv(name):
        w = np.asarray(state_dict[name + '.weight'])
        return {'kernel': np.transpose(w, (2, 3, 1, 0))}

    def bn(name):
        return {'gamma': np.asarray(state_dict[name + '.weight']),
                'beta': np.asarray(state_dict[name + '.bias']),
                'mean': np.asarray(state_dict[name + '.running_mean']),
                'var': np.asarray(state_dict[name + '.running_var'])}

    head = {'conv1': {'kernel': _bgr_flip_conv(
                conv('conv1')['kernel'])},
            'conv1_bn': bn('bn1')}
    trees = {'head': head, 'tail': {'tail': {}}}
    for b in range(1, 5):
        block = {}
        for u in range(units[b - 1]):
            base = f'layer{b}.{u}'
            unit = {}
            if base + '.downsample.0.weight' in state_dict:
                unit['shortcut'] = conv(base + '.downsample.0')
                unit['shortcut_bn'] = bn(base + '.downsample.1')
            for i in (1, 2, 3):
                unit[f'conv{i}'] = conv(f'{base}.conv{i}')
                unit[f'bn{i}'] = bn(f'{base}.bn{i}')
            block[f'unit_{u + 1}'] = unit
        dest = trees['head'] if b < 4 else trees['tail']['tail']
        dest[f'block{b}'] = block
    return trees
