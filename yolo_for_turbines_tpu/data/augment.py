"""Host-side image augmentations in numpy + PIL (no cv2/albumentations).

Replicates the reference's Albumentations pipelines
(reference: code/config.py:60-113):

- train: LongestMaxSize + center PadIfNeeded (letterbox) -> HSV jitter
  (hue 2/180, sat 50/255, val 40/255, p=0.5) -> shift-scale (scale 1..1.5,
  shift +-6.25%, p=0.5, constant border) -> horizontal flip (p=0.5) ->
  normalize /255. Boxes are yolo-normalized [cx, cy, w, h, class]; after
  geometric transforms they are clipped to the image and dropped when less
  than 40% of the transformed box remains visible (min_visibility=0.4).
- test: letterbox + normalize.
- image-only: letterbox + normalize, no box handling.

Randomness comes from an explicit np.random.Generator so the pipeline is
reproducible and safe under parallel workers. Pixel-level parity with
Albumentations is not a goal (it is random augmentation); the geometry and
parameter distributions match.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

MIN_VISIBILITY = 0.4  # reference: code/config.py:82


# ---------------------------------------------------------------------------
# Geometry primitives
# ---------------------------------------------------------------------------


def resize_longest(img: np.ndarray, size: int) -> np.ndarray:
    """Resize so the longest side equals `size`, keeping aspect ratio."""
    h, w = img.shape[:2]
    scale = size / max(h, w)
    nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
    if (nh, nw) == (h, w):
        return img
    return np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))


def pad_center(
    img: np.ndarray, min_h: int, min_w: int, fill: int = 0
) -> Tuple[np.ndarray, int, int]:
    """Center-pad to at least (min_h, min_w). Returns (img, pad_top, pad_left)."""
    h, w = img.shape[:2]
    pad_h, pad_w = max(0, min_h - h), max(0, min_w - w)
    top, left = pad_h // 2, pad_w // 2
    if pad_h == 0 and pad_w == 0:
        return img, 0, 0
    out = np.full((h + pad_h, w + pad_w) + img.shape[2:], fill, dtype=img.dtype)
    out[top : top + h, left : left + w] = img
    return out, top, left


def letterbox(
    img: np.ndarray, boxes: Optional[np.ndarray], size: int, fill: int = 0
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """LongestMaxSize + center pad to (size, size); adjusts normalized boxes."""
    h0, w0 = img.shape[:2]
    img = resize_longest(img, size)
    h1, w1 = img.shape[:2]
    img, top, left = pad_center(img, size, size, fill)
    if boxes is not None and len(boxes):
        boxes = np.asarray(boxes, np.float64).copy()
        boxes[:, 0] = (boxes[:, 0] * w1 + left) / size
        boxes[:, 1] = (boxes[:, 1] * h1 + top) / size
        boxes[:, 2] = boxes[:, 2] * w1 / size
        boxes[:, 3] = boxes[:, 3] * h1 / size
    return img, boxes


def unletterbox_boxes(
    boxes: Sequence[Sequence[float]], original_hw: Tuple[int, int], resized_hw: Tuple[int, int]
) -> List[List[float]]:
    """Map normalized letterboxed boxes back to the original image frame
    (reference: code/utils.py:475-501 `plot_original` math)."""
    o_h, o_w = original_hw
    r_h, r_w = resized_hw
    scale = min(r_w / o_w, r_h / o_h)
    new_w, new_h = int(o_w * scale), int(o_h * scale)
    pad_w, pad_h = (r_w - new_w) // 2, (r_h - new_h) // 2
    out = []
    for box in boxes:
        out.append(
            [
                (box[0] * r_w - pad_w) / new_w,
                (box[1] * r_h - pad_h) / new_h,
                box[2] * r_w / new_w,
                box[3] * r_h / new_h,
            ]
            + list(box[4:])
        )
    return out


def clip_boxes_min_visibility(
    boxes: np.ndarray, min_visibility: float = MIN_VISIBILITY
) -> np.ndarray:
    """Clip normalized cxcywh boxes to [0, 1]; drop those with less than
    `min_visibility` of their (pre-clip) area remaining, and zero-area boxes."""
    if len(boxes) == 0:
        return boxes
    b = np.asarray(boxes, np.float64)
    x1 = b[:, 0] - b[:, 2] / 2
    y1 = b[:, 1] - b[:, 3] / 2
    x2 = b[:, 0] + b[:, 2] / 2
    y2 = b[:, 1] + b[:, 3] / 2
    area = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
    cx1, cy1 = np.clip(x1, 0, 1), np.clip(y1, 0, 1)
    cx2, cy2 = np.clip(x2, 0, 1), np.clip(y2, 0, 1)
    carea = np.maximum(0, cx2 - cx1) * np.maximum(0, cy2 - cy1)
    with np.errstate(invalid="ignore", divide="ignore"):
        vis = np.where(area > 0, carea / area, 0.0)
    keep = (vis >= min_visibility) & (carea > 0)
    out = b[keep].copy()
    if len(out):
        out[:, 0] = (cx1[keep] + cx2[keep]) / 2
        out[:, 1] = (cy1[keep] + cy2[keep]) / 2
        out[:, 2] = cx2[keep] - cx1[keep]
        out[:, 3] = cy2[keep] - cy1[keep]
    return out


# ---------------------------------------------------------------------------
# Photometric / geometric random augs
# ---------------------------------------------------------------------------


def hsv_jitter(
    img: np.ndarray,
    rng: np.random.Generator,
    hue_shift: float = 2.0,
    sat_shift: float = 50.0,
    val_shift: float = 40.0,
) -> np.ndarray:
    """HueSaturationValue with OpenCV-unit limits (H/180, S,V/255)."""
    from matplotlib.colors import hsv_to_rgb, rgb_to_hsv

    dh = rng.uniform(-hue_shift, hue_shift) / 180.0
    ds = rng.uniform(-sat_shift, sat_shift) / 255.0
    dv = rng.uniform(-val_shift, val_shift) / 255.0
    hsv = rgb_to_hsv(img.astype(np.float32) / 255.0)
    hsv[..., 0] = (hsv[..., 0] + dh) % 1.0
    hsv[..., 1] = np.clip(hsv[..., 1] + ds, 0, 1)
    hsv[..., 2] = np.clip(hsv[..., 2] + dv, 0, 1)
    return (hsv_to_rgb(hsv) * 255.0).astype(img.dtype)


def shift_scale(
    img: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.Generator,
    shift_limit: float = 0.0625,
    scale_low: float = 1.0,
    scale_high: float = 1.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """ShiftScaleRotate with rotate=0: scale about the center + translate.

    scale_limit=(0, 0.5) in the reference means scale factor in [1.0, 1.5]
    (reference: code/config.py:72); shift_limit is Albumentations' default.
    Border is constant 0.
    """
    h, w = img.shape[:2]
    s = rng.uniform(scale_low, scale_high)
    dx = rng.uniform(-shift_limit, shift_limit)
    dy = rng.uniform(-shift_limit, shift_limit)

    # PIL's AFFINE takes the *inverse* map: output (x, y) -> input coords.
    # Forward: x' = (x - cx) * s + cx + dx*w  =>  x = (x' - cx - dx*w)/s + cx
    cx, cy = w / 2.0, h / 2.0
    inv = (
        1 / s, 0.0, cx - (cx + dx * w) / s,
        0.0, 1 / s, cy - (cy + dy * h) / s,
    )
    out = np.asarray(
        Image.fromarray(img).transform((w, h), Image.AFFINE, inv, Image.BILINEAR)
    )
    if len(boxes):
        b = np.asarray(boxes, np.float64).copy()
        b[:, 0] = (b[:, 0] - 0.5) * s + 0.5 + dx
        b[:, 1] = (b[:, 1] - 0.5) * s + 0.5 + dy
        b[:, 2] *= s
        b[:, 3] *= s
        boxes = clip_boxes_min_visibility(b)
    return out, boxes


def hflip(img: np.ndarray, boxes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    img = img[:, ::-1].copy()
    if len(boxes):
        boxes = np.asarray(boxes, np.float64).copy()
        boxes[:, 0] = 1.0 - boxes[:, 0]
    return img, boxes


# ---------------------------------------------------------------------------
# Composed pipelines (reference transform-factory equivalents)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Transform:
    """A composed augmentation pipeline over (image, yolo boxes).

    Calling convention mirrors Albumentations Compose:
    `t(image=img, bboxes=boxes, rng=...)` -> {"image": ..., "bboxes": ...}.
    Output image is float32 HWC in [0, 1] (TPU-native NHWC; the reference
    emits CHW tensors via ToTensorV2).
    """

    size: Optional[int]
    train: bool
    letterbox_first: bool = True

    def __call__(self, image, bboxes=None, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        boxes = (
            np.asarray(bboxes, np.float64).reshape(-1, 5)
            if bboxes is not None and len(bboxes)
            else np.zeros((0, 5))
        )
        if self.letterbox_first and self.size is not None:
            image, boxes = letterbox(image, boxes, self.size)
            boxes = clip_boxes_min_visibility(boxes) if len(boxes) else boxes
        if self.train:
            if rng.uniform() < 0.5:
                image = hsv_jitter(image, rng)
            if rng.uniform() < 0.5:
                image, boxes = shift_scale(image, boxes, rng)
            if rng.uniform() < 0.5:
                image, boxes = hflip(image, boxes)
        image = image.astype(np.float32) / 255.0
        return {"image": image, "bboxes": boxes}


def set_train_transforms(image_size: int, mosaic: bool = True) -> Transform:
    """Train pipeline; when mosaic, the image is already (size, size) so the
    letterbox stage is skipped (reference: code/config.py:77-87)."""
    return Transform(size=image_size, train=True, letterbox_first=not mosaic)


def test_transforms(image_size: int) -> Transform:
    return Transform(size=image_size, train=False)


# Reference-parity name starts with "test_"; keep pytest from collecting it.
test_transforms.__test__ = False


def set_only_image_transforms(image_size: int) -> Transform:
    return Transform(size=image_size, train=False)
