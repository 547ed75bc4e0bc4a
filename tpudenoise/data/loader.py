"""Batched training data loader.

Replaces RoIDataLayer + get_minibatch (ref lib/roi_data_layer/layer.py:
24-88, minibatch.py:42-75): epoch shuffling with a persisted cursor (exact
resume like the reference's snapshot pickles, train_val.py:62-83), but
producing *fixed-shape batched* tensors:

  {image (B, H, W, 3) u8-domain f32, im_info (B, 3),
   gt_boxes (B, G, 5), gt_mask (B, G)}

Noise synthesis does NOT happen here: the reference burns its train loop on
host-side cv2/skimage per image (SURVEY.md §3.1 hot loop); this framework
applies the parsed NoisePlan on device inside the train step.  The loader
only decodes JPEGs, resizes (min-side/max-side rule), flips, and pads to
the static bucket.

Noise-before-resize note: the reference injects noise at the original
resolution, then rescales (minibatch.py:1676-1688).  On device we noise
the resized image (static shapes).  For the blur/median/statistical noise
family the difference is a resample of iid noise — statistically identical
at the detector input; documented as the one intentional pipeline-order
deviation.
"""

from __future__ import annotations

import numpy as np

from tpudenoise.core.config import cfg as default_cfg


class RoiDataLoader:
    def __init__(self, roidb, num_classes: int, config=None,
                 random_seed=None, batch_size: int = 1,
                 bucket=None, max_gt: int = 100,
                 training: bool = True):
        self._roidb = roidb
        self._num_classes = num_classes
        self._cfg = config or default_cfg
        self._batch = batch_size
        if bucket is None:
            # derive a static bucket covering every rescaled image; if any
            # entry is portrait the long side can land on H, so cover both
            # orientations with a square bucket
            from tpudenoise.utils.blob import derive_bucket
            C = self._cfg
            scales = C.TRAIN.SCALES if training else C.TEST.SCALES
            max_size = C.TRAIN.MAX_SIZE if training else C.TEST.MAX_SIZE
            any_portrait = any(e.get('height', 0) > e.get('width', 1)
                               for e in roidb)
            bucket = (derive_bucket(max_size, max_size) if any_portrait
                      else derive_bucket(scales[0], max_size))
        self._bucket = tuple(bucket)
        self._max_gt = max_gt
        self._training = training
        self._rng = np.random.RandomState(
            self._cfg.RNG_SEED if random_seed is None else random_seed)
        self._shuffle_roidb_inds()

    # --- cursor protocol (ref layer.py:32-83), checkpointable ---
    def _shuffle_roidb_inds(self):
        self._perm = self._rng.permutation(np.arange(len(self._roidb)))
        self._cur = 0

    def get_state(self):
        return {'perm': self._perm.copy(), 'cur': self._cur,
                'rng': self._rng.get_state()}

    def set_state(self, state):
        self._perm = state['perm'].copy()
        self._cur = int(state['cur'])
        self._rng.set_state(state['rng'])

    def _next_inds(self):
        if self._cur + self._batch > len(self._roidb):
            self._shuffle_roidb_inds()
        inds = self._perm[self._cur:self._cur + self._batch]
        self._cur += self._batch
        return inds

    # --- minibatch assembly ---
    def _load_image(self, entry):
        import cv2
        im = cv2.imread(entry['image'])
        assert im is not None, entry['image']
        if entry.get('flipped'):
            im = im[:, ::-1, :]
        return im

    def _resize(self, im):
        import cv2
        C = self._cfg
        scales = C.TRAIN.SCALES if self._training else C.TEST.SCALES
        max_size = C.TRAIN.MAX_SIZE if self._training else C.TEST.MAX_SIZE
        target = scales[self._rng.randint(len(scales))]
        h, w = im.shape[:2]
        scale = float(target) / min(h, w)
        if round(scale * max(h, w)) > max_size:
            scale = float(max_size) / max(h, w)
        im = cv2.resize(im, None, None, fx=scale, fy=scale,
                        interpolation=cv2.INTER_LINEAR)
        return im, scale

    def forward(self):
        """Next fixed-shape batch (ref layer.py:85-88).

        Images are uint8 (the resize happens in u8, before device-side
        noise + mean subtraction) — 4x less host->device traffic than
        f32; the consumer casts on device.
        """
        inds = self._next_inds()
        bh, bw = self._bucket
        b = len(inds)
        images = np.zeros((b, bh, bw, 3), np.uint8)
        im_info = np.zeros((b, 3), np.float32)
        gt_boxes = np.zeros((b, self._max_gt, 5), np.float32)
        gt_mask = np.zeros((b, self._max_gt), bool)
        for j, i in enumerate(inds):
            entry = self._roidb[int(i)]
            im = self._load_image(entry)
            im, scale = self._resize(im)
            h, w = im.shape[:2]
            assert h <= bh and w <= bw, \
                f'image {h}x{w} exceeds bucket {bh}x{bw}'
            images[j, :h, :w] = im
            # edge-replicate the pad so the device noise/denoise stencils
            # see plausible halo pixels at the valid boundary (the masked
            # pipeline's contract); the solver re-zeroes the pad after
            # the noise stage to restore the reference's zero-pad network
            # input (im_list_to_blob pads AFTER noise, blob.py:17-30)
            if h < bh:
                images[j, h:, :w] = im[-1:]
            if w < bw:
                images[j, :, w:] = images[j, :, w - 1:w]
            im_info[j] = (h, w, scale)
            # gt boxes scaled into the network input frame
            # (ref minibatch.py:66-71)
            if self._training:
                gt_inds = np.where(entry['gt_classes'] != 0)[0]
                gt_inds = gt_inds[:self._max_gt]
                n = len(gt_inds)
                gt_boxes[j, :n, :4] = (
                    entry['boxes'][gt_inds].astype(np.float32) * scale)
                gt_boxes[j, :n, 4] = entry['gt_classes'][gt_inds]
                gt_mask[j, :n] = True
        return {'image': images, 'im_info': im_info,
                'gt_boxes': gt_boxes, 'gt_mask': gt_mask}
