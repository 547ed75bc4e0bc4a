"""Visualization utilities.

Mirrors lib/utils/visualization.py (PIL gt-box drawing with the fixed
120-color class table, used for image summaries) and the vendored
Helpers.py image-grid visualizer (ref tools/Helpers.py:34-97).
"""

from __future__ import annotations

import numpy as np

# the reference's STANDARD_COLORS table (visualization.py:17-43) is a list
# of named CSS colors; a deterministic HSV wheel gives the same per-class
# color stability without the 120-name table
NUM_COLORS = 120


def class_color(class_id: int) -> tuple:
    import colorsys
    h = (class_id * 0.61803398875) % 1.0
    r, g, b = colorsys.hsv_to_rgb(h, 0.85, 1.0)
    return int(r * 255), int(g * 255), int(b * 255)


def draw_bounding_boxes(image: np.ndarray, gt_boxes: np.ndarray,
                        im_info=None) -> np.ndarray:
    """Draw gt boxes (N, 5) = (x1, y1, x2, y2, class) on an image
    (ref visualization.py:50-89: rescales by 1/im_info[2] and draws with
    class-colored outlines + labels)."""
    from PIL import Image, ImageDraw
    img = np.clip(np.asarray(image), 0, 255).astype(np.uint8)
    scale = float(im_info[2]) if im_info is not None else 1.0
    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)
    for box in np.asarray(gt_boxes):
        x1, y1, x2, y2 = [float(v) / scale for v in box[:4]]
        cls = int(box[4]) if box.shape[0] > 4 else 0
        color = class_color(cls)
        draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
        draw.text((x1 + 2, max(y1 - 12, 0)), str(cls), fill=color)
    return np.asarray(pil)


def image_grid(images, cols: int = 4, pad: int = 2) -> np.ndarray:
    """Tile images into one grid canvas (the Helpers.py visualizer,
    ref tools/Helpers.py:34-97)."""
    images = [np.clip(np.asarray(im), 0, 255).astype(np.uint8)
              for im in images]
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    rows = (len(images) + cols - 1) // cols
    canvas = np.zeros((rows * (h + pad) - pad, cols * (w + pad) - pad, 3),
                      np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        y, x = r * (h + pad), c * (w + pad)
        canvas[y:y + im.shape[0], x:x + im.shape[1]] = im[..., :3]
    return canvas


def save_image(path: str, image: np.ndarray):
    import cv2
    cv2.imwrite(path, np.clip(np.asarray(image), 0, 255).astype(np.uint8))


def load_images(path_glob: str, size=(1280, 720)):
    """Glob-load images as RGB, resized to `size` (ref tools/Helpers.py:
    87-94 — the Automold notebooks' loader; BGR->RGB + 1280x720)."""
    import glob as _glob

    import cv2
    out = []
    for p in sorted(_glob.glob(path_glob)):
        im = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        out.append(cv2.resize(im, size))
    return out
