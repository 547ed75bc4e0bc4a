"""Standalone curvelet-denoise CLI.

Contract of the reference's fdct.py subprocess tool (ref lib/model/
fdct.py:252-341: `python fdct.py <noise_type> <img_path>` -> regenerate the
noisy image, curvelet transform, keep top 50% coefficients, write
temp.png).  Here it's a thin wrapper over the in-process device pipeline —
kept for drop-in script compatibility; library users call
tpudenoise.denoise.curvelet directly.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description='Curvelet denoise tool')
    p.add_argument('noise_type', help='pre-noise to apply, e.g. '
                                      'gaussian_var1.0 or original')
    p.add_argument('img_path')
    p.add_argument('--out', default='temp.png',
                   help='output path (reference wrote cwd-relative '
                        'temp.png)')
    p.add_argument('--keep', type=float, default=0.5,
                   help='fraction of coefficients kept (ref fdct.py:244)')
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpudenoise.denoise.curvelet import curvelet_denoise_u8
    from tpudenoise.noise.pipeline import make_pipeline

    im = cv2.imread(args.img_path)
    assert im is not None, args.img_path
    key = jax.random.PRNGKey(3)
    noisy = make_pipeline(args.noise_type, mode='TEST')(
        key, jnp.asarray(im.astype(np.float32))[None])[0]
    out = np.asarray(curvelet_denoise_u8(noisy, keep=args.keep))
    cv2.imwrite(args.out, np.clip(out, 0, 255).astype(np.uint8))
    print(f'wrote {args.out}')


if __name__ == '__main__':
    sys.exit(main())
