"""roidb preparation (ref lib/roi_data_layer/roidb.py:19-50 and
tools/trainval_net.py:67-90 combined_roidb + lib/model/train_val.py:458-495
get_training_roidb/filter_roidb).

The noise string is stamped into every entry exactly like the reference
(`roidb[i]['noise_type'] = noise`, roidb.py:50) — the loader turns it into
a parsed NoisePlan once.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from tpudenoise.core.config import cfg as default_cfg


def prepare_roidb(imdb_obj, noise: str):
    """Enrich roidb entries with image path/size, max overlap stats and the
    noise type (ref roidb.py:19-50)."""
    roidb = imdb_obj.roidb
    sizes = [Image.open(imdb_obj.image_path_at(i)).size
             for i in range(imdb_obj.num_images)]
    for i in range(len(imdb_obj.image_index)):
        roidb[i]['img_id'] = i
        roidb[i]['image'] = imdb_obj.image_path_at(i)
        roidb[i]['width'] = sizes[i][0]
        roidb[i]['height'] = sizes[i][1]
        gt_overlaps = np.asarray(roidb[i]['gt_overlaps'])
        max_overlaps = gt_overlaps.max(axis=1) if gt_overlaps.size else \
            np.zeros((0,))
        max_classes = gt_overlaps.argmax(axis=1) if gt_overlaps.size else \
            np.zeros((0,), np.int64)
        roidb[i]['max_classes'] = max_classes
        roidb[i]['max_overlaps'] = max_overlaps
        if max_overlaps.size:
            zero_inds = np.where(max_overlaps == 0)[0]
            assert all(max_classes[zero_inds] == 0)
            nonzero_inds = np.where(max_overlaps > 0)[0]
            assert all(max_classes[nonzero_inds] != 0)
        roidb[i]['noise_type'] = noise


def get_training_roidb(imdb_obj, noise: str, config=None):
    """Flip + prepare (ref train_val.py:458-469)."""
    C = config or default_cfg
    if C.TRAIN.USE_FLIPPED:
        print('Appending horizontally-flipped training examples...')
        imdb_obj.append_flipped_images()
    prepare_roidb(imdb_obj, noise)
    return imdb_obj.roidb


def filter_roidb(roidb, config=None):
    """Drop entries with neither fg nor valid bg RoIs
    (ref train_val.py:472-495)."""
    C = config or default_cfg

    def is_valid(entry):
        overlaps = entry['max_overlaps']
        fg_inds = np.where(overlaps >= C.TRAIN.FG_THRESH)[0]
        bg_inds = np.where((overlaps < C.TRAIN.BG_THRESH_HI)
                           & (overlaps >= C.TRAIN.BG_THRESH_LO))[0]
        return len(fg_inds) > 0 or len(bg_inds) > 0

    num = len(roidb)
    filtered = [e for e in roidb if is_valid(e)]
    print(f'Filtered {num - len(filtered)} roidb entries: '
          f'{num} -> {len(filtered)}')
    return filtered


def combined_roidb(imdb_names: str, noise: str, config=None,
                   training: bool = True):
    """'+'-concatenated multi-imdb roidb (ref trainval_net.py:67-90)."""
    from tpudenoise.data.factory import get_imdb
    from tpudenoise.data.imdb import imdb as imdb_cls

    def get_roidb(name):
        obj = get_imdb(name)
        print(f'Loaded dataset `{obj.name}`')
        obj.set_proposal_method(
            (config or default_cfg).TRAIN.PROPOSAL_METHOD)
        if training:
            return obj, get_training_roidb(obj, noise, config)
        prepare_roidb(obj, noise)
        return obj, obj.roidb

    names = imdb_names.split('+')
    pairs = [get_roidb(s) for s in names]
    roidb = pairs[0][1]
    if len(pairs) > 1:
        for _, r in pairs[1:]:
            roidb.extend(r)
        out_imdb = imdb_cls(imdb_names, pairs[0][0].classes)
        return out_imdb, roidb
    return pairs[0][0], roidb
