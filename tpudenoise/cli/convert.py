"""Checkpoint conversion CLI.

Replaces the reference's init-time checkpoint surgery and migration tools
(ref tools/convert_from_depre.py, experiments/scripts/convert_vgg16.sh,
lib/nets/*.fix_variables): converts tf-slim ImageNet checkpoints or
torchvision state dicts into this framework's .npz layout, applying the
RGB->BGR first-conv flip and (vgg) fc6/fc7 conv->dense reshape offline.

Usage:
  python -m tpudenoise.cli.convert --src vgg_16.ckpt --net vgg16 \
      --out vgg16_imagenet.npz
  python -m tpudenoise.cli.convert --src resnet101.pth --net res101 \
      --out res101_imagenet.npz
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
                   choices=['vgg16', 'res50', 'res101', 'res152'])
    p.add_argument('--out', required=True, help='output .npz path')
    args = p.parse_args(argv)

    from tpudenoise.models import convert as C

    if args.src.endswith(('.pth', '.pt')):
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
        else:
            params = C.convert_tf_slim_resnet(args.src, int(args.net[3:]))
    C.save_params_npz(params, args.out)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    sys.exit(main())
