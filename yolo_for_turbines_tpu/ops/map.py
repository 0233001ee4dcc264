"""mAP@IoU computation, numerically matching the reference.

Mirrors reference code/utils.py:193-274 exactly: per class, sort detections
by score descending, greedily match each detection to its image's best-IoU
unmatched ground truth (strictly > iou_threshold), cumulative TP/FP ->
precision/recall with a prepended (recall 0, precision 1) point, trapezoidal
AP, mean over classes that have at least one ground truth.

Runs in numpy on the host. The expensive parts of eval (forward, decode,
NMS) stay on device; what reaches this function is only the per-image NMS
survivors (K boxes/image), a tiny transfer.
"""

from __future__ import annotations

import numpy as np


def _iou_center(box1, boxes2):
    """IoU of one cxcywh box against (M, 4) cxcywh boxes (+1e-6, parity)."""
    b1 = np.asarray(box1, dtype=np.float64)
    b2 = np.asarray(boxes2, dtype=np.float64)
    b1_xy = b1[:2] - b1[2:4] / 2
    b2_xy = b2[:, :2] - b2[:, 2:4] / 2
    xA = np.maximum(b1_xy[0], b2_xy[:, 0])
    yA = np.maximum(b1_xy[1], b2_xy[:, 1])
    xB = np.minimum(b1_xy[0] + b1[2], b2_xy[:, 0] + b2[:, 2])
    yB = np.minimum(b1_xy[1] + b1[3], b2_xy[:, 1] + b2[:, 3])
    inter = np.clip(xB - xA, 0, None) * np.clip(yB - yA, 0, None)
    union = b1[2] * b1[3] + b2[:, 2] * b2[:, 3] - inter
    return inter / (union + 1e-6)


def _iou_corner(box1, boxes2):
    """IoU with top-left xywh boxes (reference's 'corner' branch)."""
    b1 = np.asarray(box1, dtype=np.float64)
    b2 = np.asarray(boxes2, dtype=np.float64)
    xA = np.maximum(b1[0], b2[:, 0])
    yA = np.maximum(b1[1], b2[:, 1])
    xB = np.minimum(b1[0] + b1[2], b2[:, 0] + b2[:, 2])
    yB = np.minimum(b1[1] + b1[3], b2[:, 1] + b2[:, 3])
    inter = np.clip(xB - xA, 0, None) * np.clip(yB - yA, 0, None)
    union = b1[2] * b1[3] + b2[:, 2] * b2[:, 3] - inter
    return inter / (union + 1e-6)


def calc_map(
    pred_boxes,
    true_boxes,
    iou_threshold: float = 0.5,
    box_format: str = "center",
    num_classes: int = 20,
) -> float:
    """Mean average precision at a single IoU threshold.

    Args:
        pred_boxes: rows [image_id, cx, cy, w, h, score, class].
        true_boxes: rows [image_id, cx, cy, w, h, score, class].
        iou_threshold: match threshold (strict >, parity with
            reference code/utils.py:249).
        box_format: "center" or "corner".
        num_classes: classes to average over (classes without GT skipped).

    Returns:
        float mAP. 0.0 if no class has ground truth (the reference would
        divide by zero here; we define it as 0).
    """
    preds = np.asarray(pred_boxes, dtype=np.float64).reshape(-1, 7)
    truths = np.asarray(true_boxes, dtype=np.float64).reshape(-1, 7)
    iou_fn = _iou_center if box_format == "center" else _iou_corner

    average_precisions = []
    for c in range(num_classes):
        det = preds[preds[:, 6] == c]
        gts = truths[truths[:, 6] == c]
        total_true = len(gts)
        if total_true == 0:
            continue

        # Per-image GT pools and matched flags.
        gt_by_image = {}
        for row in gts:
            gt_by_image.setdefault(row[0], []).append(row[1:5])
        gt_by_image = {k: np.asarray(v) for k, v in gt_by_image.items()}
        matched = {k: np.zeros(len(v), dtype=bool) for k, v in gt_by_image.items()}

        # Sort detections by descending score (stable, parity with list.sort).
        order = np.argsort(-det[:, 5], kind="stable")
        det = det[order]

        tp = np.zeros(len(det))
        fp = np.zeros(len(det))
        for i, d in enumerate(det):
            img = d[0]
            img_gts = gt_by_image.get(img)
            best_iou, best_idx = 0.0, 0
            if img_gts is not None and len(img_gts):
                ious = iou_fn(d[1:5], img_gts)
                best_idx = int(np.argmax(ious))
                best_iou = float(ious[best_idx])
            if best_iou > iou_threshold:
                if not matched[img][best_idx]:
                    tp[i] = 1
                    matched[img][best_idx] = True
                else:
                    fp[i] = 1
            else:
                fp[i] = 1

        cum_tp = np.cumsum(tp)
        cum_fp = np.cumsum(fp)
        with np.errstate(invalid="ignore", divide="ignore"):
            precisions = cum_tp / (cum_tp + cum_fp)
        recalls = cum_tp / total_true
        precisions = np.concatenate(([1.0], precisions))
        recalls = np.concatenate(([0.0], recalls))
        trapezoid = getattr(np, "trapezoid", np.trapz)
        average_precisions.append(trapezoid(precisions, recalls))

    if not average_precisions:
        return 0.0
    return float(sum(average_precisions) / len(average_precisions))
