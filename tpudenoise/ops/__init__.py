from tpudenoise.ops.anchors import anchor_grid, generate_anchors, num_anchors
from tpudenoise.ops.boxes import (bbox_overlaps, bbox_transform,
                                  bbox_transform_inv, clip_boxes,
                                  clip_boxes_lower_only)
from tpudenoise.ops.nms import nms, nms_fixpoint, nms_py
