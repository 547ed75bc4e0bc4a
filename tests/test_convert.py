"""Checkpoint converters driven end-to-end against synthetic checkpoints
with the real tf-slim variable naming (TF is available in this image) and
a synthetic torchvision state dict.

The dangerous failure mode is silent: _merge_pretrained overlays only
matching paths, so a converter emitting wrong names would leave random
weights without an error — these tests assert specific leaves actually
changed and shapes line up with the live models.
"""

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')


def _make_slim_resnet50_ckpt(tmp_path):
    """Create a checkpoint with tf-slim resnet_v1_50 variable names."""
    rng = np.random.RandomState(0)
    units = (3, 4, 6, 3)
    g = tf.Graph()
    with g.as_default():
        vs = []

        def var(name, shape):
            # moving_variance must stay positive like a real checkpoint
            vals = rng.randn(*shape).astype(np.float32) * 0.01
            if name.endswith('moving_variance'):
                vals = np.abs(vals) + 0.5
            v = tf.compat.v1.get_variable(
                name, shape,
                initializer=tf.compat.v1.constant_initializer(vals))
            vs.append(v)
            return v

        def bn(prefix, c):
            for suffix in ('gamma', 'beta', 'moving_mean',
                           'moving_variance'):
                var(f'{prefix}/BatchNorm/{suffix}', (c,))

        var('resnet_v1_50/conv1/weights', (7, 7, 3, 64))
        bn('resnet_v1_50/conv1', 64)
        depth_in = 64
        for b, n in enumerate(units, start=1):
            base_depth = 64 * 2 ** (b - 1)
            depth = base_depth * 4
            for u in range(1, n + 1):
                p = f'resnet_v1_50/block{b}/unit_{u}/bottleneck_v1'
                if u == 1:
                    var(f'{p}/shortcut/weights', (1, 1, depth_in, depth))
                    bn(f'{p}/shortcut', depth)
                var(f'{p}/conv1/weights', (1, 1, depth_in, base_depth))
                bn(f'{p}/conv1', base_depth)
                var(f'{p}/conv2/weights', (3, 3, base_depth, base_depth))
                bn(f'{p}/conv2', base_depth)
                var(f'{p}/conv3/weights', (1, 1, base_depth, depth))
                bn(f'{p}/conv3', depth)
                depth_in = depth
        saver = tf.compat.v1.train.Saver(vs)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            path = saver.save(sess, str(tmp_path / 'resnet_v1_50.ckpt'))
    return path


def test_tf_slim_resnet50_roundtrip(tmp_path):
    import jax
    from tpudenoise.models.convert import convert_tf_slim_resnet
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.train.solver import _merge_pretrained
    ckpt = _make_slim_resnet50_ckpt(tmp_path)
    pre = convert_tf_slim_resnet(ckpt, 50)
    m = FasterRCNN(backbone='res50', num_classes=2)
    params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    merged = _merge_pretrained(params, pre)

    # every converted leaf must land on a live leaf of the same shape
    def count_changed(a, b):
        flat_a = jax.tree_util.tree_flatten_with_path(a)[0]
        flat_b = {tuple(str(k) for k in p): v
                  for p, v in jax.tree_util.tree_flatten_with_path(b)[0]}
        n = 0
        for p, va in flat_a:
            key = tuple(str(k) for k in p)
            vb = flat_b[key]
            assert np.shape(va) == np.shape(vb), key
            if not np.array_equal(np.asarray(va), np.asarray(vb)):
                n += 1
        return n

    changed = count_changed(params, merged)
    # head: conv1 w + 4 bn + blocks1-3 (3+4+6 units x (6 or 8 leaves));
    # tail: block4 — all converted leaves must differ from random init
    n_pre = len([1 for _ in _iter_leaves(pre)])
    assert changed == n_pre, (changed, n_pre)
    # the BGR flip happened: converted conv1 reversed on channel axis
    from tensorflow.python.training import py_checkpoint_reader
    reader = py_checkpoint_reader.NewCheckpointReader(ckpt)
    w = reader.get_tensor('resnet_v1_50/conv1/weights')
    np.testing.assert_array_equal(
        np.asarray(merged['head']['conv1']['kernel']), w[:, :, ::-1, :])
    # merged params still run
    feat = m.head_mod.apply({'params': merged['head']},
                            np.zeros((1, 64, 96, 3), np.float32))
    assert np.isfinite(np.asarray(feat)).all()


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


def _make_slim_vgg16_ckpt(tmp_path):
    rng = np.random.RandomState(2)
    g = tf.Graph()
    with g.as_default():
        vs = []

        def var(name, shape):
            v = tf.compat.v1.get_variable(
                name, shape,
                initializer=tf.compat.v1.constant_initializer(
                    rng.randn(*shape).astype(np.float32) * 0.01))
            vs.append(v)

        reps = [2, 2, 3, 3, 3]
        widths = [64, 128, 256, 512, 512]
        cin = 3
        for s, (rep, wdt) in enumerate(zip(reps, widths), start=1):
            for r in range(1, rep + 1):
                var(f'vgg_16/conv{s}/conv{s}_{r}/weights', (3, 3, cin, wdt))
                var(f'vgg_16/conv{s}/conv{s}_{r}/biases', (wdt,))
                cin = wdt
        var('vgg_16/fc6/weights', (7, 7, 512, 4096))
        var('vgg_16/fc6/biases', (4096,))
        var('vgg_16/fc7/weights', (1, 1, 4096, 4096))
        var('vgg_16/fc7/biases', (4096,))
        saver = tf.compat.v1.train.Saver(vs)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(sess, str(tmp_path / 'vgg_16.ckpt'))


def test_tf_slim_vgg16_roundtrip(tmp_path):
    import jax
    from tpudenoise.models.convert import convert_tf_slim_vgg16
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.train.solver import _merge_pretrained
    ckpt = _make_slim_vgg16_ckpt(tmp_path)
    pre = convert_tf_slim_vgg16(ckpt)
    m = FasterRCNN(backbone='vgg16', num_classes=2)
    params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    merged = _merge_pretrained(params, pre)
    # every converted leaf lands (26 conv + 4 fc leaves)
    n_pre = len([1 for _ in _iter_leaves(pre)])
    flat_m = {tuple(str(k) for k in p): v for p, v in
              jax.tree_util.tree_flatten_with_path(merged)[0]}
    flat_p = {tuple(str(k) for k in p): v for p, v in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    changed = sum(1 for k in flat_m
                  if not np.array_equal(np.asarray(flat_m[k]),
                                        np.asarray(flat_p[k])))
    assert changed == n_pre == 30
    # fc6 conv->dense reshape: (7,7,512,4096) -> (25088, 4096) flattened
    # like slim.flatten over the (7,7,512) crop
    from tensorflow.python.training import py_checkpoint_reader
    reader = py_checkpoint_reader.NewCheckpointReader(ckpt)
    fc6 = reader.get_tensor('vgg_16/fc6/weights')
    np.testing.assert_array_equal(
        np.asarray(merged['tail']['tail']['fc6']['kernel']),
        fc6.reshape(-1, 4096))
    # conv1_1 BGR flip
    w = reader.get_tensor('vgg_16/conv1/conv1_1/weights')
    np.testing.assert_array_equal(
        np.asarray(merged['head']['conv1_1']['kernel']), w[:, :, ::-1, :])


def test_torch_resnet_conversion_shapes():
    """Synthetic torchvision-style state dict -> our tree; shape + BGR
    flip checks without needing torchvision."""
    from tpudenoise.models.convert import convert_torch_resnet
    rng = np.random.RandomState(1)
    units = (3, 4, 6, 3)
    sd = {}

    def conv(name, o, i, k):
        sd[name + '.weight'] = rng.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        sd[name + '.weight'] = np.ones(c, np.float32)
        sd[name + '.bias'] = np.zeros(c, np.float32)
        sd[name + '.running_mean'] = np.zeros(c, np.float32)
        sd[name + '.running_var'] = np.ones(c, np.float32)

    conv('conv1', 64, 3, 7)
    bn('bn1', 64)
    depth_in = 64
    for b, n in enumerate(units, start=1):
        base = 64 * 2 ** (b - 1)
        depth = base * 4
        for u in range(n):
            p = f'layer{b}.{u}'
            if u == 0:
                conv(p + '.downsample.0', depth, depth_in, 1)
                bn(p + '.downsample.1', depth)
            conv(p + '.conv1', base, depth_in, 1)
            bn(p + '.bn1', base)
            conv(p + '.conv2', base, base, 3)
            bn(p + '.bn2', base)
            conv(p + '.conv3', depth, base, 1)
            bn(p + '.bn3', depth)
            depth_in = depth
    tree = convert_torch_resnet(sd, 50)
    # OIHW -> HWIO and BGR flip on conv1
    w = sd['conv1.weight'].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(tree['head']['conv1']['kernel'],
                                  w[:, :, ::-1, :])
    assert tree['head']['block1']['unit_1']['conv2']['kernel'].shape == \
        (3, 3, 64, 64)
    assert tree['tail']['tail']['block4']['unit_3']['bn3']['var'].shape == (2048,)
