"""Demo CLI (ref tools/demo.py:114-156): minimal end-to-end inference on
images with box rendering to output.png — the reference's smallest e2e
slice (SURVEY.md §3.4).  Accepts arbitrary --images; when none are given,
runs on the bundled real photos in data/demo/ (the reference's five demo
JPEGs — real images catch channel-order/scaling bugs synthetic gradients
cannot), falling back to one synthesized image if the assets are absent."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='Faster R-CNN demo (TPU)')
    p.add_argument('--net', default='res101',
                   choices=['vgg16', 'res50', 'res101', 'res152',
                            'mobile'])
    p.add_argument('--model', default=None,
                   help='orbax snapshot or .npz weights (random if unset)')
    p.add_argument('--images', nargs='*', default=None)
    p.add_argument('--noise', default='original')
    p.add_argument('--classes', nargs='*', default=None,
                   help='class names; default VOC-21')
    p.add_argument('--conf', type=float, default=0.8)
    p.add_argument('--out', default='output.png')
    return p.parse_args(argv)


def _demo_image(path):
    import cv2
    rng = np.random.RandomState(3)
    img = (rng.rand(480, 640, 3) * 40 + 90).astype(np.uint8)
    cv2.rectangle(img, (180, 120), (330, 420), (200, 170, 150), -1)
    cv2.circle(img, (255, 100), 40, (190, 160, 140), -1)
    cv2.imwrite(path, img)
    return path


def main(argv=None):
    args = parse_args(argv)
    import cv2
    import jax
    import jax.numpy as jnp
    from tpudenoise.core.config import cfg
    from tpudenoise.cli.test import load_params
    from tpudenoise.eval.harness import postprocess_detections
    from tpudenoise.models.faster_rcnn import (FasterRCNN, pad_to_bucket,
                                               preprocess)
    from tpudenoise.noise.pipeline import make_pipeline
    from tpudenoise.data.voc_like import VOC_CLASSES

    classes = args.classes or list(VOC_CLASSES)
    model = FasterRCNN(backbone=args.net, num_classes=len(classes),
                       anchor_scales=tuple(cfg.ANCHOR_SCALES),
                       anchor_ratios=tuple(cfg.ANCHOR_RATIOS), cfg=cfg)
    params, _ = load_params(model, args.model, args.net,
                            jax.random.PRNGKey(cfg.RNG_SEED))

    images = args.images
    if not images:
        import glob
        demo_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), 'data', 'demo')
        images = sorted(glob.glob(os.path.join(demo_dir, '*.jpg')))
    if not images:
        images = [_demo_image('/tmp/tpudenoise_demo.jpg')]
    noise_fn = make_pipeline(args.noise, mode='TEST')
    key = jax.random.PRNGKey(cfg.RNG_SEED)

    panels = []
    for idx, path in enumerate(images):
        im = cv2.imread(path)
        assert im is not None, path
        noisy = np.asarray(noise_fn(jax.random.fold_in(key, idx),
                                    jnp.asarray(im.astype(np.float32))
                                    [None])[0])
        prep, scale = preprocess(noisy, np.asarray(cfg.PIXEL_MEANS))
        padded, (h, w) = pad_to_bucket(prep)
        im_info = jnp.asarray([h, w, scale], jnp.float32)
        out = model.forward_test(params, jnp.asarray(padded), im_info)
        boxes_c, scores_c, mask_c = postprocess_detections(
            out['rois'], out['roi_mask'], out['cls_prob'],
            out['bbox_pred'], im_info, len(classes), cfg.TEST.NMS, 0.0)
        vis = np.clip(noisy, 0, 255).astype(np.uint8).copy()
        n_drawn = 0
        bx, sc, mk = (np.asarray(boxes_c), np.asarray(scores_c),
                      np.asarray(mask_c))
        for c in range(1, len(classes)):
            sel = mk[c - 1] & (sc[c - 1] >= args.conf)
            for b, s in zip(bx[c - 1][sel], sc[c - 1][sel]):
                x1, y1, x2, y2 = [int(v) for v in b]
                cv2.rectangle(vis, (x1, y1), (x2, y2), (0, 0, 255), 2)
                cv2.putText(vis, f'{classes[c]} {s:.2f}', (x1, y1 - 4),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 255), 1)
                n_drawn += 1
        print(f'{path}: {n_drawn} detections >= {args.conf}')
        panels.append(vis)
    h = max(p.shape[0] for p in panels)
    w = sum(p.shape[1] for p in panels)
    sheet = np.zeros((h, w, 3), np.uint8)
    x = 0
    for p in panels:
        sheet[:p.shape[0], x:x + p.shape[1]] = p
        x += p.shape[1]
    cv2.imwrite(args.out, sheet)
    print(f'Saved {args.out}')


if __name__ == '__main__':
    sys.exit(main())
