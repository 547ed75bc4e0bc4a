"""Checkpoint conversion CLI.

Replaces the reference's init-time checkpoint surgery and migration tools
(ref tools/convert_from_depre.py, experiments/scripts/convert_vgg16.sh,
lib/nets/*.fix_variables): converts tf-slim ImageNet checkpoints or
torchvision state dicts into this framework's .npz layout, applying the
RGB->BGR first-conv flip and (vgg) fc6/fc7 conv->dense reshape offline.

With --detector the source is a reference-TRAINED Faster R-CNN checkpoint
(the full var-scope set of lib/nets/network.py:328-383) and the output is
the complete {head, rpn, tail} tree ready for `--model detector.npz`
evaluation — no surgery applied (it already ran at the reference's init).

Usage:
  python -m tpudenoise.cli.convert --src vgg_16.ckpt --net vgg16 \
      --out vgg16_imagenet.npz
  python -m tpudenoise.cli.convert --src resnet101.pth --net res101 \
      --out res101_imagenet.npz
  python -m tpudenoise.cli.convert --src res101_faster_rcnn_iter_5000.ckpt \
      --net res101 --detector --out ref_detector.npz
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description='Convert pretrained weights '
                                            'to tpudenoise .npz')
    p.add_argument('--src', required=True,
                   help='tf-slim checkpoint prefix or torch .pth file')
    p.add_argument('--net', required=True,
                   choices=['vgg16', 'res50', 'res101', 'res152',
                            'mobile'])
    p.add_argument('--out', required=True, help='output .npz path')
    p.add_argument('--detector', action='store_true',
                   help='source is a reference-trained Faster R-CNN '
                        'checkpoint (full tree incl. rpn + cls/bbox '
                        'heads), not an ImageNet backbone')
    args = p.parse_args(argv)

    from tpudenoise.models import convert as C

    if args.detector:
        params = C.convert_ref_detector(args.src, args.net)
    elif args.src.endswith(('.pth', '.pt')):
        import torch
        sd = torch.load(args.src, map_location='cpu')
        if hasattr(sd, 'state_dict'):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items()}
        assert args.net.startswith('res'), \
            'torch conversion implemented for resnets'
        params = C.convert_torch_resnet(sd, int(args.net[3:]))
    else:
        if args.net == 'vgg16':
            params = C.convert_tf_slim_vgg16(args.src)
        elif args.net == 'mobile':
            params = C.convert_tf_slim_mobilenet(args.src)
        else:
            params = C.convert_tf_slim_resnet(args.src, int(args.net[3:]))
    C.save_params_npz(params, args.out)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    sys.exit(main())
