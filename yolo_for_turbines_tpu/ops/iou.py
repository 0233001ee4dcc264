"""IoU kernels (pure jnp; broadcastable, jit/vmap friendly).

Semantics match the reference's torch implementations
(reference: code/utils.py:22-36 `iou_aligned`, code/utils.py:38-84 `calc_iou`):

- `iou_aligned`: width/height-only IoU for center-aligned boxes (used for
  anchor matching). No epsilon in the denominator (parity).
- `calc_iou`: elementwise/broadcast IoU. `box_format="center"` takes cxcywh;
  any other value takes **top-left xywh** -- note the reference's "corners"
  branch actually treats boxes as (x_tl, y_tl, w, h), not x1y1x2y2, and we
  preserve that behavior. Denominator has +1e-6 (parity).
"""

from __future__ import annotations

import jax.numpy as jnp


def iou_aligned(box1, box2):
    """IoU of wh-only boxes aligned at their centers.

    Args:
        box1: (..., 2) array of [w, h]
        box2: (..., 2) array of [w, h]

    Returns:
        broadcast IoU array.
    """
    box1 = jnp.asarray(box1)
    box2 = jnp.asarray(box2)
    intersection = jnp.minimum(box1[..., 0], box2[..., 0]) * jnp.minimum(
        box1[..., 1], box2[..., 1]
    )
    union = box1[..., 0] * box1[..., 1] + box2[..., 0] * box2[..., 1] - intersection
    return intersection / union


def calc_iou(boxes1, boxes2, box_format: str = "center"):
    """Broadcast IoU between two sets of boxes.

    Args:
        boxes1: (..., 4) array
        boxes2: (..., 4) array (broadcast-compatible with boxes1)
        box_format: "center" for cxcywh, anything else for top-left xywh.

    Returns:
        broadcast IoU array (shape = broadcast of leading dims).
    """
    boxes1 = jnp.asarray(boxes1)
    boxes2 = jnp.asarray(boxes2)

    if box_format == "center":
        b1_xy = boxes1[..., :2] - boxes1[..., 2:4] / 2
        b2_xy = boxes2[..., :2] - boxes2[..., 2:4] / 2
    else:
        b1_xy = boxes1[..., :2]
        b2_xy = boxes2[..., :2]
    b1_wh = boxes1[..., 2:4]
    b2_wh = boxes2[..., 2:4]

    xA = jnp.maximum(b1_xy[..., 0], b2_xy[..., 0])
    yA = jnp.maximum(b1_xy[..., 1], b2_xy[..., 1])
    xB = jnp.minimum(b1_xy[..., 0] + b1_wh[..., 0], b2_xy[..., 0] + b2_wh[..., 0])
    yB = jnp.minimum(b1_xy[..., 1] + b1_wh[..., 1], b2_xy[..., 1] + b2_wh[..., 1])

    inter = jnp.clip(xB - xA, 0) * jnp.clip(yB - yA, 0)
    area1 = b1_wh[..., 0] * b1_wh[..., 1]
    area2 = b2_wh[..., 0] * b2_wh[..., 1]
    return inter / (area1 + area2 - inter + 1e-6)
