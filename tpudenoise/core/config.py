"""Layered config system.

Re-expresses the reference's global easydict config
(ref: lib/model/config.py:11-291) as a self-contained attribute dict with the
same key names, defaults, YAML overlay (`cfg_from_file`,
ref: lib/model/config.py:358) and `KEY VALUE` CLI overlay (`cfg_from_list`,
ref: lib/model/config.py:367).  easydict is not a dependency — `AttrDict`
below is a minimal typed replacement.

Unlike the reference we avoid module-global mutation in library code: every
public function takes a `cfg` argument; the module-level `cfg` instance exists
for CLI compatibility only.
"""

from __future__ import annotations

import copy
import os.path as osp
from typing import Any

import numpy as np
import yaml


class AttrDict(dict):
    """dict with attribute access; recursive over nested dicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @classmethod
    def from_dict(cls, d: dict) -> "AttrDict":
        out = cls()
        for k, v in d.items():
            out[k] = cls.from_dict(v) if isinstance(v, dict) else v
        return out

    def clone(self) -> "AttrDict":
        return copy.deepcopy(self)


def default_config() -> AttrDict:
    """Defaults mirror ref lib/model/config.py:19-291 key-for-key."""
    C = AttrDict()

    # -- Training options (ref config.py:19-160) --
    C.TRAIN = AttrDict()
    C.TRAIN.LEARNING_RATE = 0.001
    C.TRAIN.MOMENTUM = 0.9
    C.TRAIN.WEIGHT_DECAY = 0.0001
    C.TRAIN.GAMMA = 0.1
    C.TRAIN.STEPSIZE = [30000]
    # linear LR warmup iters; 0 = reference semantics (no warmup).  Set
    # for FROM-SCRATCH resnet training (see train_step.lr_schedule)
    C.TRAIN.WARMUP_ITERS = 0
    # global-norm gradient clip; 0 = off = reference semantics
    C.TRAIN.GRAD_CLIP = 0.0
    C.TRAIN.DISPLAY = 10
    C.TRAIN.DOUBLE_BIAS = True
    C.TRAIN.TRUNCATED = False
    C.TRAIN.BIAS_DECAY = False
    C.TRAIN.USE_GT = False
    C.TRAIN.ASPECT_GROUPING = False
    C.TRAIN.SNAPSHOT_KEPT = 3
    C.TRAIN.SUMMARY_INTERVAL = 180
    C.TRAIN.SCALES = (600,)
    C.TRAIN.MAX_SIZE = 1000
    C.TRAIN.IMS_PER_BATCH = 1
    C.TRAIN.BATCH_SIZE = 128
    C.TRAIN.FG_FRACTION = 0.25
    C.TRAIN.FG_THRESH = 0.5
    C.TRAIN.BG_THRESH_HI = 0.5
    C.TRAIN.BG_THRESH_LO = 0.1
    C.TRAIN.USE_FLIPPED = True
    C.TRAIN.BBOX_REG = True
    C.TRAIN.BBOX_THRESH = 0.5
    C.TRAIN.SNAPSHOT_ITERS = 5000
    C.TRAIN.SNAPSHOT_PREFIX = 'res101_faster_rcnn'
    C.TRAIN.BBOX_NORMALIZE_TARGETS = True
    C.TRAIN.BBOX_INSIDE_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    C.TRAIN.BBOX_NORMALIZE_TARGETS_PRECOMPUTED = True
    C.TRAIN.BBOX_NORMALIZE_MEANS = (0.0, 0.0, 0.0, 0.0)
    C.TRAIN.BBOX_NORMALIZE_STDS = (0.1, 0.1, 0.2, 0.2)
    C.TRAIN.PROPOSAL_METHOD = 'gt'
    C.TRAIN.HAS_RPN = True
    C.TRAIN.RPN_POSITIVE_OVERLAP = 0.7
    C.TRAIN.RPN_NEGATIVE_OVERLAP = 0.3
    C.TRAIN.RPN_CLOBBER_POSITIVES = False
    C.TRAIN.RPN_FG_FRACTION = 0.5
    C.TRAIN.RPN_BATCHSIZE = 256
    C.TRAIN.RPN_NMS_THRESH = 0.7
    C.TRAIN.RPN_PRE_NMS_TOP_N = 12000
    C.TRAIN.RPN_POST_NMS_TOP_N = 2000
    C.TRAIN.RPN_BBOX_INSIDE_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    C.TRAIN.RPN_POSITIVE_WEIGHT = -1.0
    C.TRAIN.USE_ALL_GT = True

    # -- Testing options (ref config.py:165-208) --
    C.TEST = AttrDict()
    C.TEST.SCALES = (600,)
    C.TEST.MAX_SIZE = 1000
    C.TEST.NMS = 0.3
    C.TEST.SVM = False
    C.TEST.BBOX_REG = True
    C.TEST.HAS_RPN = False
    C.TEST.PROPOSAL_METHOD = 'gt'
    C.TEST.RPN_NMS_THRESH = 0.7
    C.TEST.RPN_PRE_NMS_TOP_N = 6000
    C.TEST.RPN_POST_NMS_TOP_N = 300
    C.TEST.MODE = 'nms'
    C.TEST.RPN_TOP_N = 5000

    # -- ResNet options (ref config.py:214-224) --
    C.RESNET = AttrDict()
    C.RESNET.MAX_POOL = False
    C.RESNET.FIXED_BLOCKS = 1
    # reference always freezes the (pretrained) root conv; set False for
    # from-scratch training (see resnet.frozen_param_filter)
    C.RESNET.FREEZE_ROOT = True

    # -- MobileNet options (ref config.py:230-243) --
    C.MOBILENET = AttrDict()
    C.MOBILENET.REGU_DEPTH = False
    C.MOBILENET.FIXED_LAYERS = 5
    C.MOBILENET.WEIGHT_DECAY = 0.00004
    C.MOBILENET.DEPTH_MULTIPLIER = 1.

    # -- MISC (ref config.py:247-290) --
    # Pixel mean values, *BGR* order, matching the reference exactly
    # (ref config.py:252).  Images in this framework are kept BGR to match
    # the cv2.imread convention of the reference.
    C.PIXEL_MEANS = np.array([[[102.9801, 115.9465, 122.7717]]])
    C.RNG_SEED = 3
    C.ROOT_DIR = osp.abspath(osp.join(osp.dirname(__file__), '..', '..'))
    C.DATA_DIR = osp.abspath(osp.join(C.ROOT_DIR, 'data'))
    C.MATLAB = 'matlab'
    C.EXP_DIR = 'default'
    # TPU build: all NMS is on-device XLA; this flag selects the native C++
    # host NMS for the (numpy) eval fallback path instead
    # (ref config.py:270 USE_GPU_NMS selected CUDA vs Cython).
    C.USE_NATIVE_NMS = True
    # legacy keys kept so reference-era YAML overlays load cleanly; both
    # are no-ops here (everything is end-to-end on device)
    C.USE_GPU_NMS = True
    C.USE_E2E_TF = True
    C.POOLING_MODE = 'crop'
    C.POOLING_SIZE = 7
    C.ANCHOR_SCALES = [8, 16, 32]
    C.ANCHOR_RATIOS = [0.5, 1, 2]
    C.RPN_CHANNELS = 512

    # -- TPU-native additions (no reference equivalent) --
    C.TPU = AttrDict()
    C.TPU.MESH_SHAPE = [-1]          # 1-D data-parallel mesh by default
    C.TPU.MESH_AXES = ['data']
    C.TPU.COMPUTE_DTYPE = 'bfloat16'  # backbone matmul/conv dtype
    C.TPU.PARAM_DTYPE = 'float32'
    # Padded static geometry buckets (H, W); min-side-600/max-side-1000
    # rescale (ref config.py:63-66) always fits in the largest bucket.
    C.TPU.IMAGE_BUCKETS = [[608, 1024]]
    C.TPU.MAX_GT_BOXES = 100

    return C


# Module-level instance for CLI compatibility with the reference's
# `from model.config import cfg` pattern. Library code takes cfg explicitly.
cfg = default_config()


def _merge_a_into_b(a: dict, b: AttrDict) -> None:
    """Type-checked recursive merge (ref lib/model/config.py:325-355)."""
    if not isinstance(a, dict):
        raise TypeError(f'expected dict, got {type(a)}')
    for k, v in a.items():
        if k not in b:
            raise KeyError(f'{k} is not a valid config key')
        old = b[k]
        # promote types like the reference: ndarray <- list, etc.
        if isinstance(old, np.ndarray):
            v = np.array(v, dtype=old.dtype)
        elif isinstance(old, tuple) and isinstance(v, list):
            v = tuple(v)
        elif old is not None and v is not None \
                and not isinstance(v, type(old)) \
                and not (isinstance(old, dict) and isinstance(v, dict)):
            if isinstance(old, float) and isinstance(v, int):
                v = float(v)
            elif isinstance(old, int) and isinstance(v, float) and v == int(v):
                v = int(v)
            else:
                raise ValueError(
                    f'type mismatch ({type(old)} vs {type(v)}) for key {k}')
        if isinstance(old, dict):
            _merge_a_into_b(v, b[k])
        else:
            b[k] = v


def cfg_from_file(filename: str, into: AttrDict | None = None) -> AttrDict:
    """Load YAML overrides into a config (ref lib/model/config.py:358-364)."""
    target = cfg if into is None else into
    with open(filename, 'r') as f:
        yaml_cfg = yaml.safe_load(f)
    if yaml_cfg:
        _merge_a_into_b(yaml_cfg, target)
    return target


def cfg_from_list(cfg_list: list, into: AttrDict | None = None) -> AttrDict:
    """Set config keys from ['KEY', 'VALUE', ...] pairs
    (ref lib/model/config.py:367-387)."""
    target = cfg if into is None else into
    assert len(cfg_list) % 2 == 0, 'cfg_from_list takes KEY VALUE pairs'
    from ast import literal_eval
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = full_key.split('.')
        d = target
        for subkey in key_list[:-1]:
            assert subkey in d, f'{full_key} is not a valid config key'
            d = d[subkey]
        subkey = key_list[-1]
        assert subkey in d, f'{full_key} is not a valid config key'
        try:
            value = literal_eval(v)
        except (ValueError, SyntaxError):
            value = v  # string value
        old = d[subkey]
        if isinstance(old, np.ndarray):
            value = np.array(value, dtype=old.dtype)
        elif isinstance(old, tuple):
            value = tuple(value)
        elif isinstance(old, float) and isinstance(value, int):
            value = float(value)
        elif old is not None and value is not None \
                and not isinstance(value, type(old)):
            raise ValueError(
                f'type mismatch ({type(old)} vs {type(value)}) '
                f'for key {full_key}')
        d[subkey] = value
    return target


def get_output_dir(imdb_name: str, weights_filename: str | None,
                   config: AttrDict | None = None) -> str:
    """Canonical artifact directory (ref lib/model/config.py:293-307)."""
    import os
    C = config or cfg
    outdir = osp.abspath(osp.join(C.ROOT_DIR, 'output', C.EXP_DIR, imdb_name))
    if weights_filename is None:
        weights_filename = 'default'
    outdir = osp.join(outdir, weights_filename)
    os.makedirs(outdir, exist_ok=True)
    return outdir


def get_output_tb_dir(imdb_name: str, weights_filename: str | None,
                      config: AttrDict | None = None) -> str:
    """Canonical log directory (ref lib/model/config.py:309-322)."""
    import os
    C = config or cfg
    outdir = osp.abspath(
        osp.join(C.ROOT_DIR, 'tensorboard', C.EXP_DIR, imdb_name))
    if weights_filename is None:
        weights_filename = 'default'
    outdir = osp.join(outdir, weights_filename)
    os.makedirs(outdir, exist_ok=True)
    return outdir
