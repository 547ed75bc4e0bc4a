"""Relayout MCG proposal .mat files into the nested directory scheme the
COCO proposal loader expects (ref lib/datasets/tools/mcg_munge.py — a
Python-2 script upstream; same contract here, runnable).

Downloaded MCG boxes arrive flat:
    MCG-COCO-val2014-boxes/COCO_val2014_000000193401.mat
The loader wants them nested by the first 14 / first 22 characters:
    MCG/mat/COCO_val2014_0/COCO_val2014_000000193/COCO_val2014_000000193401.mat

NB (reference doc): MCG-website boxes are (y1, x1, y2, x2); Hosang et
al.'s are (x1, y1, x2, y2).
"""

from __future__ import annotations

import os
import sys


def munge(src_dir: str, dst_root: str = 'MCG') -> int:
    """Move every file in `src_dir` into dst_root/mat/<first14>/<first22>/.
    Returns the number of files moved."""
    moved = 0
    for fn in sorted(os.listdir(src_dir)):
        base, _ = os.path.splitext(fn)
        first = base[:14]
        second = base[:22]
        dst_dir = os.path.join(dst_root, 'mat', first, second)
        os.makedirs(dst_dir, exist_ok=True)
        src = os.path.join(src_dir, fn)
        dst = os.path.join(dst_dir, fn)
        print(f'MV: {src} -> {dst}')
        os.rename(src, dst)
        moved += 1
    return moved


if __name__ == '__main__':
    munge(sys.argv[1])
