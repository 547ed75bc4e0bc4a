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


# ---------------------------------------------------------------------
# mobilenet ImageNet checkpoint (surgery) and reference-TRAINED detector
# checkpoints (full tree, no surgery)
# ---------------------------------------------------------------------

def _make_slim_mobilenet_ckpt(tmp_path):
    """Checkpoint with slim MobilenetV1 naming (Conv2d_0 +
    Conv2d_{i}_{depthwise,pointwise})."""
    rng = np.random.RandomState(4)
    chans = [32, 64, 128, 128, 256, 256, 512, 512, 512, 512, 512, 512,
             1024, 1024]
    g = tf.Graph()
    with g.as_default():
        vs = []

        def var(name, shape):
            vals = rng.randn(*shape).astype(np.float32) * 0.01
            if name.endswith('moving_variance'):
                vals = np.abs(vals) + 0.5
            v = tf.compat.v1.get_variable(
                name, shape,
                initializer=tf.compat.v1.constant_initializer(vals))
            vs.append(v)

        def bn(prefix, c):
            for s in ('gamma', 'beta', 'moving_mean', 'moving_variance'):
                var(f'{prefix}/BatchNorm/{s}', (c,))

        var('MobilenetV1/Conv2d_0/weights', (3, 3, 3, 32))
        bn('MobilenetV1/Conv2d_0', 32)
        for i in range(1, 14):
            cin, cout = chans[i - 1], chans[i]
            var(f'MobilenetV1/Conv2d_{i}_depthwise/depthwise_weights',
                (3, 3, cin, 1))
            bn(f'MobilenetV1/Conv2d_{i}_depthwise', cin)
            var(f'MobilenetV1/Conv2d_{i}_pointwise/weights',
                (1, 1, cin, cout))
            bn(f'MobilenetV1/Conv2d_{i}_pointwise', cout)
        saver = tf.compat.v1.train.Saver(vs)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(sess, str(tmp_path / 'mobilenet_v1.ckpt'))


def test_tf_slim_mobilenet_roundtrip(tmp_path):
    import jax
    from tpudenoise.models.convert import convert_tf_slim_mobilenet
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.train.solver import _merge_pretrained
    ckpt = _make_slim_mobilenet_ckpt(tmp_path)
    pre = convert_tf_slim_mobilenet(ckpt)
    m = FasterRCNN(backbone='mobile', num_classes=2)
    params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    merged = _merge_pretrained(params, pre)
    flat_m = {tuple(str(k) for k in p): v for p, v in
              jax.tree_util.tree_flatten_with_path(merged)[0]}
    flat_p = {tuple(str(k) for k in p): v for p, v in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    changed = sum(1 for k in flat_m
                  if not np.array_equal(np.asarray(flat_m[k]),
                                        np.asarray(flat_p[k])))
    n_pre = len([1 for _ in _iter_leaves(pre)])
    # layer_0: conv + 4 bn; layers 1-13: dw + pw + 8 bn
    assert changed == n_pre == 5 + 13 * 10
    # the ImageNet surgery: BGR flip AND /(255/2) scale
    # (ref mobilenet_v1.py:266-278)
    from tensorflow.python.training import py_checkpoint_reader
    reader = py_checkpoint_reader.NewCheckpointReader(ckpt)
    w = reader.get_tensor('MobilenetV1/Conv2d_0/weights')
    np.testing.assert_allclose(
        np.asarray(merged['head']['layer_0']['conv']['kernel']),
        w[:, :, ::-1, :] / (255.0 / 2.0), rtol=1e-6)
    # depthwise layout transpose (k,k,C,1) -> (k,k,1,C)
    dw = reader.get_tensor(
        'MobilenetV1/Conv2d_1_depthwise/depthwise_weights')
    np.testing.assert_array_equal(
        np.asarray(merged['head']['layer_1']['depthwise']['kernel']),
        dw.transpose(0, 1, 3, 2))
    feat = m.head_mod.apply({'params': merged['head']},
                            np.zeros((1, 64, 96, 3), np.float32))
    assert np.isfinite(np.asarray(feat)).all()


def _add_detector_vars(var, scope, fc_in, num_classes, rng):
    """The trained-detector var set (ref lib/nets/network.py:328-383)."""
    var(f'{scope}/rpn_conv/3x3/weights', (3, 3, 512, 512))
    var(f'{scope}/rpn_conv/3x3/biases', (512,))
    var(f'{scope}/rpn_cls_score/weights', (1, 1, 512, 18))
    var(f'{scope}/rpn_cls_score/biases', (18,))
    var(f'{scope}/rpn_bbox_pred/weights', (1, 1, 512, 36))
    var(f'{scope}/rpn_bbox_pred/biases', (36,))
    var(f'{scope}/cls_score/weights', (fc_in, num_classes))
    var(f'{scope}/cls_score/biases', (num_classes,))
    var(f'{scope}/bbox_pred/weights', (fc_in, num_classes * 4))
    var(f'{scope}/bbox_pred/biases', (num_classes * 4,))


def _make_ref_vgg16_detector_ckpt(tmp_path, num_classes=2):
    """A TRAINED reference vgg16 Faster R-CNN checkpoint: backbone convs
    (already BGR), DENSE fc6/fc7 (the conv->fc surgery ran at init,
    ref vgg16.py:86-105), rpn + cls/bbox head vars."""
    rng = np.random.RandomState(5)
    g = tf.Graph()
    with g.as_default():
        vs = []

        def var(name, shape):
            scale = 0.001 if 'bbox_pred' in name else 0.01
            v = tf.compat.v1.get_variable(
                name, shape,
                initializer=tf.compat.v1.constant_initializer(
                    rng.randn(*shape).astype(np.float32) * scale))
            vs.append(v)

        reps = [2, 2, 3, 3, 3]
        widths = [64, 128, 256, 512, 512]
        cin = 3
        for s, (rep, wdt) in enumerate(zip(reps, widths), start=1):
            for r in range(1, rep + 1):
                var(f'vgg_16/conv{s}/conv{s}_{r}/weights',
                    (3, 3, cin, wdt))
                var(f'vgg_16/conv{s}/conv{s}_{r}/biases', (wdt,))
                cin = wdt
        var('vgg_16/fc6/weights', (25088, 4096))
        var('vgg_16/fc6/biases', (4096,))
        var('vgg_16/fc7/weights', (4096, 4096))
        var('vgg_16/fc7/biases', (4096,))
        _add_detector_vars(var, 'vgg_16', 4096, num_classes, rng)
        saver = tf.compat.v1.train.Saver(vs)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(sess, str(tmp_path / 'vgg16_det.ckpt'))


def test_ref_detector_vgg16_golden_logits(tmp_path):
    """Convert a trained-naming vgg16 detector ckpt and pin the ASSEMBLED
    jax graph against the pure-numpy forward twin at logit level — the
    end-to-end substitute for mAP parity on this box (no reference
    runtime/weights available)."""
    import jax
    import jax.numpy as jnp
    from numpy_forward import vgg16_forward_test_np
    from tpudenoise.core.config import default_config
    from tpudenoise.models.convert import convert_ref_detector
    from tpudenoise.models.faster_rcnn import FasterRCNN
    from tpudenoise.train.solver import _merge_pretrained

    ckpt = _make_ref_vgg16_detector_ckpt(tmp_path, num_classes=2)
    pre = convert_ref_detector(ckpt, 'vgg16')
    C = default_config()
    m = FasterRCNN(backbone='vgg16', num_classes=2, cfg=C,
                   dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    merged = _merge_pretrained(params, pre)

    # every live leaf is covered by the checkpoint (full tree: backbone +
    # rpn + rcnn heads) — nothing left at random init
    flat_m = {tuple(str(k) for k in p): v for p, v in
              jax.tree_util.tree_flatten_with_path(merged)[0]}
    flat_p = {tuple(str(k) for k in p): v for p, v in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    changed = sum(1 for k in flat_m
                  if not np.array_equal(np.asarray(flat_m[k]),
                                        np.asarray(flat_p[k])))
    n_pre = len([1 for _ in _iter_leaves(pre)])
    assert changed == n_pre == len(flat_m)
    # no flip on conv1_1 (trained ckpts are already BGR)
    from tensorflow.python.training import py_checkpoint_reader
    reader = py_checkpoint_reader.NewCheckpointReader(ckpt)
    np.testing.assert_array_equal(
        np.asarray(merged['head']['conv1_1']['kernel']),
        reader.get_tensor('vgg_16/conv1/conv1_1/weights'))

    rng = np.random.RandomState(7)
    img = rng.uniform(-60, 60, (64, 96, 3)).astype(np.float32)
    out = m.forward_test(merged, jnp.asarray(img),
                         jnp.asarray([64., 96., 1.], jnp.float32))
    want = vgg16_forward_test_np(merged, img, num_classes=2,
                                 rpn_nms_thresh=C.TEST.RPN_NMS_THRESH,
                                 pre_n=C.TEST.RPN_PRE_NMS_TOP_N,
                                 post_n=C.TEST.RPN_POST_NMS_TOP_N)
    mask = np.asarray(out['roi_mask'])
    n = int(mask.sum())
    assert mask[:n].all(), 'valid rois must be a prefix'
    assert n == want['rois'].shape[0]
    np.testing.assert_allclose(np.asarray(out['rois'])[:n], want['rois'],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out['cls_prob'])[:n],
                               want['cls_prob'], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out['bbox_pred'])[:n],
                               want['bbox_pred'], atol=2e-3)


def test_ref_detector_res50_no_flip(tmp_path):
    """res50 trained-detector conversion: backbone mapping reused WITHOUT
    the BGR flip, rpn/rcnn vars land in the right subtrees."""
    ckpt_dir = tmp_path / 'det'
    ckpt_dir.mkdir()
    # extend the slim resnet50 maker's graph with detector vars
    rng = np.random.RandomState(6)
    g = tf.Graph()
    with g.as_default():
        vs = []

        def var(name, shape):
            vals = rng.randn(*shape).astype(np.float32) * 0.01
            if name.endswith('moving_variance'):
                vals = np.abs(vals) + 0.5
            v = tf.compat.v1.get_variable(
                name, shape,
                initializer=tf.compat.v1.constant_initializer(vals))
            vs.append(v)

        def bn(prefix, c):
            for s in ('gamma', 'beta', 'moving_mean', 'moving_variance'):
                var(f'{prefix}/BatchNorm/{s}', (c,))

        var('resnet_v1_50/conv1/weights', (7, 7, 3, 64))
        bn('resnet_v1_50/conv1', 64)
        depth_in = 64
        for b, n in enumerate((3, 4, 6, 3), start=1):
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
        # resnet rpn rides the 1024-ch block3 output; tail fc is 2048
        var('resnet_v1_50/rpn_conv/3x3/weights', (3, 3, 1024, 512))
        var('resnet_v1_50/rpn_conv/3x3/biases', (512,))
        var('resnet_v1_50/rpn_cls_score/weights', (1, 1, 512, 18))
        var('resnet_v1_50/rpn_cls_score/biases', (18,))
        var('resnet_v1_50/rpn_bbox_pred/weights', (1, 1, 512, 36))
        var('resnet_v1_50/rpn_bbox_pred/biases', (36,))
        var('resnet_v1_50/cls_score/weights', (2048, 2))
        var('resnet_v1_50/cls_score/biases', (2,))
        var('resnet_v1_50/bbox_pred/weights', (2048, 8))
        var('resnet_v1_50/bbox_pred/biases', (8,))
        saver = tf.compat.v1.train.Saver(vs)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt = saver.save(sess, str(ckpt_dir / 'res50_det.ckpt'))

    from tpudenoise.models.convert import convert_ref_detector
    tree = convert_ref_detector(ckpt, 'res50')
    from tensorflow.python.training import py_checkpoint_reader
    reader = py_checkpoint_reader.NewCheckpointReader(ckpt)
    # NO flip
    np.testing.assert_array_equal(
        tree['head']['conv1']['kernel'],
        reader.get_tensor('resnet_v1_50/conv1/weights'))
    assert tree['rpn']['rpn_conv']['kernel'].shape == (3, 3, 1024, 512)
    assert tree['tail']['rcnn']['cls_score']['kernel'].shape == (2048, 2)
    assert tree['tail']['rcnn']['bbox_pred']['bias'].shape == (8,)
    assert 'block4' in tree['tail']['tail']
