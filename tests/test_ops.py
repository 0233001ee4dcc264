"""Unit tests for IoU / decode / NMS / mAP.

Oracles are independent numpy re-derivations of the reference semantics
(reference: code/utils_test.py covers iou==1, perfect mAP==1, decode shapes;
we add randomized agreement tests against naive greedy implementations).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from yolo_for_turbines_tpu.ops.iou import calc_iou, iou_aligned
from yolo_for_turbines_tpu.ops.decode import decode_scale
from yolo_for_turbines_tpu.ops.nms import batched_nms, nms_single, nms_to_list, non_max_suppression
from yolo_for_turbines_tpu.ops.map import calc_map


# ---------------------------------------------------------------------- IoU


def test_iou_identity():
    box = jnp.array([0.5, 0.5, 0.2, 0.3])
    assert float(calc_iou(box, box, "center")) == pytest.approx(1.0, abs=1e-4)


def test_iou_aligned_basic():
    assert float(iou_aligned(jnp.array([2.0, 2.0]), jnp.array([1.0, 1.0]))) == (
        pytest.approx(0.25)
    )
    assert float(iou_aligned(jnp.array([3.0, 4.0]), jnp.array([3.0, 4.0]))) == (
        pytest.approx(1.0)
    )


def _naive_iou_center(a, b):
    ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2
    bx1, by1 = b[0] - b[2] / 2, b[1] - b[3] / 2
    xA, yA = max(ax1, bx1), max(ay1, by1)
    xB, yB = min(ax1 + a[2], bx1 + b[2]), min(ay1 + a[3], by1 + b[3])
    inter = max(0, xB - xA) * max(0, yB - yA)
    return inter / (a[2] * a[3] + b[2] * b[3] - inter + 1e-6)


def test_iou_random_agreement(rng):
    a = rng.uniform(0.1, 0.9, (50, 4))
    b = rng.uniform(0.1, 0.9, (50, 4))
    got = np.asarray(calc_iou(a, b, "center"))
    want = np.array([_naive_iou_center(x, y) for x, y in zip(a, b)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_iou_corner_format_is_tl_xywh(rng):
    # the reference's "corners" branch treats boxes as top-left xywh
    a = np.array([0.0, 0.0, 1.0, 1.0])
    b = np.array([0.5, 0.5, 1.0, 1.0])
    got = float(calc_iou(a, b, "corner"))
    assert got == pytest.approx(0.25 / 1.75, rel=1e-4)


# -------------------------------------------------------------------- decode


def test_decode_shape_and_grid_offsets(rng):
    b, a, s, c = 2, 3, 4, 6
    anchors = np.abs(rng.normal(1.0, 0.3, (a, 2))).astype(np.float32)
    preds = rng.normal(0, 1, (b, a, s, s, 5 + c)).astype(np.float32)
    out = np.asarray(decode_scale(preds, anchors, s, is_pred=True))
    assert out.shape == (b, a * s * s, 6)

    # manual check of one cell: anchor k, row i, col j
    k, i, j = 1, 2, 3
    flat = k * s * s + i * s + j
    tx, ty, tw, th = preds[0, k, i, j, :4]
    sig = lambda v: 1 / (1 + np.exp(-v))
    np.testing.assert_allclose(out[0, flat, 0], (sig(tx) + j) / s, rtol=1e-5)
    np.testing.assert_allclose(out[0, flat, 1], (sig(ty) + i) / s, rtol=1e-5)
    np.testing.assert_allclose(
        out[0, flat, 2], np.exp(tw) * anchors[k, 0] / s, rtol=1e-5
    )
    np.testing.assert_allclose(out[0, flat, 4], sig(preds[0, k, i, j, 4]), rtol=1e-5)
    assert out[0, flat, 5] == np.argmax(preds[0, k, i, j, 5:])


def test_decode_targets_roundtrip(rng):
    """Encoded target -> decode(is_pred=False) recovers the original box."""
    from yolo_for_turbines_tpu.data.dataset import assign_targets

    anchors = np.array(
        [[0.28, 0.22], [0.38, 0.48], [0.9, 0.78],
         [0.07, 0.15], [0.15, 0.11], [0.14, 0.29],
         [0.02, 0.03], [0.04, 0.07], [0.08, 0.06]]
    )
    grid_sizes = [13, 26, 52]
    boxes = [[0.5, 0.4, 0.3, 0.2, 1.0], [0.2, 0.7, 0.05, 0.08, 0.0]]
    targets = assign_targets(boxes, anchors, grid_sizes)

    # decode the finest scale (every box gets one anchor per scale)
    dec = np.asarray(
        decode_scale(targets[2][None], anchors[6:] * 52, 52, is_pred=False)
    )
    found = dec[0][dec[0][:, 4] == 1]
    assert len(found) == len(boxes)
    for box in boxes:
        dists = np.abs(found[:, :4] - np.asarray(box[:4])).max(axis=1)
        m = int(np.argmin(dists))
        np.testing.assert_allclose(found[m, :4], box[:4], atol=1e-5)
        assert found[m, 5] == box[4]


# ----------------------------------------------------------------------- NMS


def _naive_greedy_nms(boxes, iou_threshold, obj_threshold):
    """Reference algorithm (code/utils.py:150-191) re-derived in numpy."""
    boxes = [list(map(float, b)) for b in boxes if b[4] > obj_threshold]
    boxes.sort(key=lambda x: x[4], reverse=True)
    kept = []
    while boxes:
        best = boxes.pop(0)
        kept.append(best)
        boxes = [
            b
            for b in boxes
            if b[5] != best[5] or _naive_iou_center(best[:4], b[:4]) < iou_threshold
        ]
    return kept


def test_nms_matches_reference_greedy(rng):
    for trial in range(5):
        n = 60
        boxes = np.zeros((n, 6), np.float32)
        boxes[:, 0:2] = rng.uniform(0.2, 0.8, (n, 2))
        boxes[:, 2:4] = rng.uniform(0.05, 0.4, (n, 2))
        boxes[:, 4] = rng.uniform(0, 1, n)
        boxes[:, 5] = rng.integers(0, 3, n)
        got = non_max_suppression(boxes.tolist(), 0.45, 0.3, box_format="center")
        want = _naive_greedy_nms(boxes.tolist(), 0.45, 0.3)
        assert len(got) == len(want)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)


def test_nms_fixed_capacity_and_batch(rng):
    boxes = rng.uniform(0.1, 0.9, (4, 500, 6)).astype(np.float32)
    boxes[..., 5] = 0
    kept, mask = batched_nms(boxes, 0.5, 0.5, max_boxes=64)
    assert kept.shape == (4, 64, 6)
    assert mask.shape == (4, 64)
    # survivors sorted descending by score
    for i in range(4):
        scores = np.asarray(kept[i][np.asarray(mask[i])][:, 4])
        assert np.all(np.diff(scores) <= 1e-6)


def test_nms_empty():
    boxes = np.zeros((10, 6), np.float32)  # all scores 0 < threshold
    assert non_max_suppression(boxes.tolist(), 0.5, 0.5) == []


# ----------------------------------------------------------------------- mAP


def test_map_perfect_match():
    preds = [[0, 0.5, 0.5, 0.2, 0.2, 0.9, 0], [1, 0.3, 0.3, 0.1, 0.1, 0.8, 1]]
    truths = [[0, 0.5, 0.5, 0.2, 0.2, 1.0, 0], [1, 0.3, 0.3, 0.1, 0.1, 1.0, 1]]
    assert calc_map(preds, truths, 0.5, "center", num_classes=2) == pytest.approx(1.0)


def test_map_all_wrong():
    preds = [[0, 0.9, 0.9, 0.05, 0.05, 0.9, 0]]
    truths = [[0, 0.1, 0.1, 0.05, 0.05, 1.0, 0]]
    assert calc_map(preds, truths, 0.5, "center", num_classes=1) == pytest.approx(0.0)


def test_map_duplicate_detections_penalized():
    # second detection of the same GT is a FP (greedy matching)
    preds = [
        [0, 0.5, 0.5, 0.2, 0.2, 0.9, 0],
        [0, 0.5, 0.5, 0.2, 0.2, 0.8, 0],
    ]
    truths = [[0, 0.5, 0.5, 0.2, 0.2, 1.0, 0]]
    got = calc_map(preds, truths, 0.5, "center", num_classes=1)
    assert got == pytest.approx(1.0)  # AP: recall reaches 1 at precision 1 first


def test_map_classes_without_gt_are_skipped():
    preds = [[0, 0.5, 0.5, 0.2, 0.2, 0.9, 0]]
    truths = [[0, 0.5, 0.5, 0.2, 0.2, 1.0, 0]]
    # num_classes=5 but only class 0 has GT
    assert calc_map(preds, truths, 0.5, "center", num_classes=5) == pytest.approx(1.0)


def test_device_map_matches_host(rng):
    """calc_map_device (jit, padded) == calc_map (numpy) on random data."""
    import jax.numpy as jnp
    from yolo_for_turbines_tpu.ops.map import calc_map_device

    for trial in range(3):
        n_img, n_cls = 4, 3
        gt_rows, pred_rows = [], []
        for img in range(n_img):
            for _ in range(int(rng.integers(1, 4))):
                gt_rows.append(
                    [img, *rng.uniform(0.2, 0.8, 2), *rng.uniform(0.1, 0.3, 2),
                     1.0, int(rng.integers(n_cls))]
                )
            for _ in range(int(rng.integers(1, 6))):
                pred_rows.append(
                    [img, *rng.uniform(0.2, 0.8, 2), *rng.uniform(0.1, 0.3, 2),
                     float(rng.uniform(0.3, 1.0)), int(rng.integers(n_cls))]
                )
        want = calc_map(pred_rows, gt_rows, 0.5, "center", n_cls)

        # pad to fixed sizes
        P, G = 32, 24
        preds = np.zeros((P, 7), np.float32)
        gts = np.zeros((G, 7), np.float32)
        preds[: len(pred_rows)] = pred_rows
        gts[: len(gt_rows)] = gt_rows
        pv = np.arange(P) < len(pred_rows)
        gv = np.arange(G) < len(gt_rows)
        got = float(
            calc_map_device(preds, pv, gts, gv, iou_threshold=0.5,
                            num_classes=n_cls)
        )
        assert got == pytest.approx(want, abs=1e-5), (trial, got, want)


def _random_bucketed_eval(rng, n_img, n_cls, K, G, max_det, max_gt):
    """Random per-image padded eval slots + the equivalent flat host rows."""
    preds = np.zeros((n_img, K, 6), np.float32)
    gts = np.zeros((n_img, G, 6), np.float32)
    pv = np.zeros((n_img, K), bool)
    gv = np.zeros((n_img, G), bool)
    pred_rows, gt_rows = [], []
    for img in range(n_img):
        nd = int(rng.integers(1, max_det + 1))
        ng = int(rng.integers(1, max_gt + 1))
        for i in range(nd):
            row = [*rng.uniform(0.2, 0.8, 2), *rng.uniform(0.1, 0.3, 2),
                   float(rng.uniform(0.3, 1.0)), int(rng.integers(n_cls))]
            preds[img, i] = row
            pv[img, i] = True
            pred_rows.append([img] + row)
        for i in range(ng):
            row = [*rng.uniform(0.2, 0.8, 2), *rng.uniform(0.1, 0.3, 2),
                   1.0, int(rng.integers(n_cls))]
            gts[img, i] = row
            gv[img, i] = True
            gt_rows.append([img] + row)
    return preds, pv, gts, gv, pred_rows, gt_rows


def test_batched_device_map_matches_host(rng):
    """calc_map_device_batched (image-bucketed, scalable) == calc_map."""
    from yolo_for_turbines_tpu.ops.map import calc_map_device_batched

    for trial in range(3):
        preds, pv, gts, gv, pred_rows, gt_rows = _random_bucketed_eval(
            rng, n_img=5, n_cls=3, K=16, G=8, max_det=10, max_gt=5
        )
        want = calc_map(pred_rows, gt_rows, 0.5, "center", 3)
        got = float(
            calc_map_device_batched(preds, pv, gts, gv, iou_threshold=0.5,
                                    num_classes=3)
        )
        assert got == pytest.approx(want, abs=1e-5), (trial, got, want)


def test_batched_device_map_scales_to_1000_images(rng):
    """The production device-mAP path must handle a real val-set size: 1,000
    images with padded K=64/G=32 slots (the flat formulation's IoU matrix
    would be (64k, 32k) = 8 GB f32; the bucketed one is 8 MB)."""
    from yolo_for_turbines_tpu.ops.map import calc_map_device_batched

    preds, pv, gts, gv, pred_rows, gt_rows = _random_bucketed_eval(
        rng, n_img=1000, n_cls=2, K=64, G=32, max_det=8, max_gt=4
    )
    want = calc_map(pred_rows, gt_rows, 0.5, "center", 2)
    got = float(
        calc_map_device_batched(preds, pv, gts, gv, iou_threshold=0.5,
                                num_classes=2)
    )
    assert got == pytest.approx(want, abs=1e-4)


def test_batched_device_map_leading_other_class():
    """Regression (round 5): slots before a class's first detection in the
    shared global score order must carry precision 1 (the prepended-point
    semantics), not 0. With class 1's det scoring highest, class 0's first
    (perfect) det was integrated against a spurious precision-0 left height
    and lost 1/(2*total_true) of AP: device said 0.75 where host says 1.0.
    The random parity tests above missed it because they only trigger the
    loss when a class's top-scored det is a TP — rare under their loose
    box distributions, near-certain for a converged detector."""
    from yolo_for_turbines_tpu.ops.map import calc_map_device_batched

    preds = np.zeros((1, 4, 6), np.float32)
    gts = np.zeros((1, 4, 6), np.float32)
    pv = np.zeros((1, 4), bool)
    gv = np.zeros((1, 4), bool)
    gts[0, 0] = [0.3, 0.3, 0.2, 0.2, 1.0, 0]
    gts[0, 1] = [0.7, 0.7, 0.2, 0.2, 1.0, 1]
    gv[0, :2] = True
    preds[0, 0] = [0.7, 0.7, 0.2, 0.2, 0.9, 1]  # TP class 1, top score
    preds[0, 1] = [0.3, 0.3, 0.2, 0.2, 0.8, 0]  # TP class 0, after it
    pv[0, :2] = True
    want = calc_map(
        [[0, *preds[0, 0]], [0, *preds[0, 1]]],
        [[0, *gts[0, 0]], [0, *gts[0, 1]]], 0.5, "center", 2,
    )
    got = float(
        calc_map_device_batched(preds, pv, gts, gv, iou_threshold=0.5,
                                num_classes=2)
    )
    assert want == 1.0
    assert got == pytest.approx(1.0, abs=1e-6)


def test_batched_device_map_gt_replay_is_perfect(rng):
    """GT-replay oracle: feeding the ground truth back as predictions must
    score exactly 1.0 (this is what exposed the leading-slot bug)."""
    from yolo_for_turbines_tpu.ops.map import calc_map_device_batched

    preds, pv, gts, gv, _, _ = _random_bucketed_eval(
        rng, n_img=6, n_cls=3, K=8, G=8, max_det=1, max_gt=6
    )
    got = float(
        calc_map_device_batched(gts, gv, gts, gv, iou_threshold=0.5,
                                num_classes=3)
    )
    assert got == pytest.approx(1.0, abs=1e-6)


def test_batched_device_map_range_matches_host(rng):
    """Device COCO-range mAP == host calc_map_range threshold by threshold."""
    from yolo_for_turbines_tpu.ops.map import calc_map_device_range, calc_map_range

    preds, pv, gts, gv, pred_rows, gt_rows = _random_bucketed_eval(
        rng, n_img=5, n_cls=3, K=16, G=8, max_det=10, max_gt=5
    )
    want = calc_map_range(pred_rows, gt_rows, box_format="center", num_classes=3)
    got = calc_map_device_range(preds, pv, gts, gv, num_classes=3)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-5), k


def test_map_range():
    from yolo_for_turbines_tpu.ops.map import calc_map_range

    preds = [[0, 0.5, 0.5, 0.2, 0.2, 0.9, 0]]
    truths = [[0, 0.5, 0.5, 0.2, 0.2, 1.0, 0]]
    out = calc_map_range(preds, truths, num_classes=1)
    assert out["mAP@0.5"] == pytest.approx(1.0)
    assert out["mAP@0.95"] == pytest.approx(1.0)  # exact-match box
    assert out["mAP@[.5:.95]"] == pytest.approx(1.0)
    # offset box: IoU ~0.59 -> passes 0.5/0.55, fails higher
    preds2 = [[0, 0.53, 0.5, 0.2, 0.2, 0.9, 0]]
    out2 = calc_map_range(preds2, truths, num_classes=1)
    assert out2["mAP@0.5"] == pytest.approx(1.0)
    assert out2["mAP@0.95"] == pytest.approx(0.0)
    assert 0 < out2["mAP@[.5:.95]"] < 1
