"""Eval stack: accuracy counters + eval-box collection + mAP.

Device-side equivalents of reference code/utils.py:276-381:

- `get_eval_boxes`: per batch, one jitted program runs forward -> 3-scale
  decode -> fixed-shape class-aware NMS; only the K survivors per image are
  transferred (the reference round-trips every cell via `.tolist()` and runs
  Python NMS per image). Ground truth comes from the finest-scale targets
  only (parity with reference code/utils.py:311-315 -- every GT box is
  assigned one anchor per scale).
- `check_model_accuracy`: masked class/obj/noobj accuracies accumulated as
  device scalars per batch.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..ops.decode import decode_all_scales, decode_scale
from ..ops.map import calc_map, calc_map_device_batched
from ..ops.nms import batched_nms
from .loss import total_yolo_loss

# One process-wide executable per (I, K, G, threshold, classes) shape combo.
_jitted_map_batched = jax.jit(
    calc_map_device_batched, static_argnames=("iou_threshold", "num_classes")
)


@functools.lru_cache(maxsize=16)
def make_eval_boxes_step(
    model,
    compute_dtype=jnp.bfloat16,
    max_boxes: int = 256,
    max_gt: int = 128,
    obj_threshold: float = cfg.CONF_THRESHOLD,
    nms_iou_threshold: float = cfg.NMS_IOU_THRESHOLD,
):
    """Returns jitted fn(params, batch_stats, images, targets2, anchors)
    -> (kept (B,K,6), mask (B,K), true (B, max_gt, 6)).

    Cached on (model, dtype, K, G, thresholds): the model handle is a
    hashable frozen dataclass, so repeated eval epochs reuse ONE jit (and
    its compiled executables) instead of paying a fresh trace+compile per
    call — on the TPU a full-model compile is ~90s (benchmarks/RESULTS.md).
    The thresholds are baked into the compiled NMS, so callers that pass
    non-default values get a distinct executable rather than a silently
    ignored argument.

    Ground truth is top-k'd by objectness ON DEVICE (real GT cells carry
    score 1.0, empty cells 0.0), so the host transfer is K+max_gt rows per
    image instead of every grid cell -- the reference `.tolist()`s the whole
    (B, 3*S*S, 6) tensor (code/utils.py:148)."""

    strides = model.strides

    @functools.partial(jax.jit, static_argnames=("image_size",))
    def eval_boxes_step(params, batch_stats, images, targets_fine, anchors, *, image_size):
        grid_sizes = cfg.grid_sizes_for(image_size, strides)
        scaled = jnp.asarray(anchors, jnp.float32) * jnp.asarray(
            grid_sizes, jnp.float32
        ).reshape(-1, 1, 1)
        preds, _ = model.apply(
            params, batch_stats, images, train=False, compute_dtype=compute_dtype
        )
        boxes = decode_all_scales(preds, scaled, grid_sizes)
        kept, mask = batched_nms(
            boxes,
            iou_threshold=nms_iou_threshold,
            obj_threshold=obj_threshold,
            max_boxes=max_boxes,
        )
        true = decode_scale(targets_fine, scaled[-1], grid_sizes[-1], is_pred=False)
        k = min(max_gt, true.shape[1])
        _, idx = jax.lax.top_k(true[..., 4], k)
        true = jnp.take_along_axis(true, idx[..., None], axis=1)
        return kept, mask, true

    return eval_boxes_step


@functools.lru_cache(maxsize=16)
def make_fused_eval_step(
    model,
    object_threshold: float = cfg.CONF_THRESHOLD,
    compute_dtype=jnp.bfloat16,
    max_boxes: int = 256,
    max_gt: int = 128,
    nms_iou_threshold: float = cfg.NMS_IOU_THRESHOLD,
):
    """ONE jitted program per batch for the every-10th-epoch eval: forward
    once, then (a) the 4-term val loss, (b) accuracy counts, (c) decode +
    NMS survivors + top-k GT — everything `val_one_epoch`'s three consumers
    need (reference seam: code/utils.py:276-381 + code/train.py:94-156).

    The previous shape ran THREE loader traversals with three compiled
    programs (loss loop, check_model_accuracy, evaluate_map_device); on a
    1-core host each traversal re-pays the full decode/augment cost of the
    val set, and each program re-runs the same forward. This step returns
    (metrics dict, counts (6,), kept (B,K,6), mask (B,K), true (B,G,6)) so
    one traversal feeds all three. Cached on (model, threshold, dtype, K, G)
    like make_eval_boxes_step.
    """
    strides = model.strides

    @functools.partial(jax.jit, static_argnames=("image_size",))
    def fused_val_step(params, batch_stats, images, targets, anchors, *, image_size):
        grid_sizes = cfg.grid_sizes_for(image_size, strides)
        scaled = jnp.asarray(anchors, jnp.float32) * jnp.asarray(
            grid_sizes, jnp.float32
        ).reshape(-1, 1, 1)
        preds, _ = model.apply(
            params, batch_stats, images, train=False, compute_dtype=compute_dtype
        )
        total, comps = total_yolo_loss(preds, targets, scaled)
        metrics = dict(comps)
        metrics["loss"] = total
        counts = _accuracy_counts(preds, targets, object_threshold)
        boxes = decode_all_scales(preds, scaled, grid_sizes)
        kept, mask = batched_nms(
            boxes,
            iou_threshold=nms_iou_threshold,
            obj_threshold=object_threshold,
            max_boxes=max_boxes,
        )
        true = decode_scale(
            targets[-1], scaled[-1], grid_sizes[-1], is_pred=False
        )
        k = min(max_gt, true.shape[1])
        _, idx = jax.lax.top_k(true[..., 4], k)
        true = jnp.take_along_axis(true, idx[..., None], axis=1)
        return metrics, counts, kept, mask, true

    return fused_val_step


def rows_from_eval_step(kept, mask, true, start_idx: int, obj_threshold: float):
    """Convert one batch's device eval output to host prediction/GT rows
    [image_id, cx, cy, w, h, score, class] (the host-mAP input format)."""
    preds_rows: List[List[float]] = []
    true_rows: List[List[float]] = []
    kept, mask, true = jax.device_get((kept, mask, true))
    idx = start_idx
    for b in range(kept.shape[0]):
        for row in kept[b][mask[b]]:
            preds_rows.append([idx] + row.tolist())
        tb = true[b]
        for row in tb[tb[:, 4] > obj_threshold]:
            true_rows.append([idx] + row.tolist())
        idx += 1
    return preds_rows, true_rows, idx


def get_eval_boxes(
    loader,
    model,
    state,
    anchors,
    obj_threshold: float = cfg.CONF_THRESHOLD,
    nms_iou_threshold: float = cfg.NMS_IOU_THRESHOLD,
    max_boxes: int = 256,
    compute_dtype=jnp.bfloat16,
) -> Tuple[List[List[float]], List[List[float]]]:
    """Collect [image_id, cx, cy, w, h, score, class] prediction/GT rows
    (output parity with reference code/utils.py:276-332)."""
    step = make_eval_boxes_step(
        model, compute_dtype, max_boxes,
        obj_threshold=obj_threshold, nms_iou_threshold=nms_iou_threshold,
    )
    all_preds: List[List[float]] = []
    all_true: List[List[float]] = []
    data_idx = 0
    for images, targets in loader:
        kept, mask, true = step(
            state.params,
            state.batch_stats,
            jnp.asarray(images),
            jnp.asarray(targets[-1]),  # finest scale (parity: utils.py:311-315)
            np.asarray(anchors, np.float32),
            image_size=images.shape[1],
        )
        p_rows, t_rows, data_idx = rows_from_eval_step(
            kept, mask, true, data_idx, obj_threshold
        )
        all_preds.extend(p_rows)
        all_true.extend(t_rows)
    return all_preds, all_true


def _accuracy_counts(preds, targets, object_threshold: float):
    """Per-batch class/obj/noobj correctness counts, (6,) f32
    (parity with reference code/utils.py:334-381). Shared by the standalone
    counter and the fused eval step so the two paths are the same math."""
    counts = jnp.zeros((6,), jnp.float32)
    for p, t in zip(preds, targets):
        obj = t[..., 4] == 1
        noobj = t[..., 4] == 0
        correct_class = (jnp.argmax(p[..., 5:], axis=-1) == t[..., 5]) & obj
        obj_pred = jax.nn.sigmoid(p[..., 4]) > object_threshold
        correct_obj = (obj_pred == (t[..., 4] == 1)) & obj
        correct_noobj = (obj_pred == (t[..., 4] == 1)) & noobj
        counts = counts + jnp.stack(
            [
                jnp.sum(correct_class),
                jnp.sum(obj),
                jnp.sum(correct_obj),
                jnp.sum(obj),
                jnp.sum(correct_noobj),
                jnp.sum(noobj),
            ]
        ).astype(jnp.float32)
    return counts


@functools.lru_cache(maxsize=16)
def _make_accuracy_counts(model, object_threshold: float, compute_dtype):
    """Build-once jitted per-batch accuracy counters (cached like
    make_eval_boxes_step — a new closure per eval call would recompile)."""

    @jax.jit
    def batch_counts(params, batch_stats, images, targets):
        preds, _ = model.apply(
            params, batch_stats, images, train=False, compute_dtype=compute_dtype
        )
        return _accuracy_counts(preds, targets, object_threshold)

    return batch_counts


def check_model_accuracy(
    loader, model, state, object_threshold: float = cfg.CONF_THRESHOLD,
    compute_dtype=jnp.bfloat16,
):
    """Masked class / no-obj / obj accuracies
    (parity with reference code/utils.py:334-381)."""
    batch_counts = _make_accuracy_counts(model, object_threshold, compute_dtype)

    totals = np.zeros(6)
    for images, targets in loader:
        totals += np.asarray(
            batch_counts(
                state.params,
                state.batch_stats,
                jnp.asarray(images),
                tuple(jnp.asarray(t) for t in targets),
            )
        )
    class_acc = totals[0] / (totals[1] + 1e-16)
    obj_acc = totals[2] / (totals[3] + 1e-16)
    noobj_acc = totals[4] / (totals[5] + 1e-16)
    return float(class_acc), float(noobj_acc), float(obj_acc)


def evaluate_map(
    loader,
    model,
    state,
    anchors,
    num_classes: int,
    map_iou_threshold: float = cfg.MAP_IOU_THRESHOLD,
    compute_dtype=jnp.bfloat16,
) -> float:
    """Full eval: boxes on device, mAP aggregation on host."""
    preds, trues = get_eval_boxes(
        loader, model, state, anchors, compute_dtype=compute_dtype
    )
    return calc_map(
        preds, trues, iou_threshold=map_iou_threshold,
        box_format="center", num_classes=num_classes,
    )


def evaluate_map_device(
    loader,
    model,
    state,
    anchors,
    num_classes: int,
    map_iou_threshold: float = cfg.MAP_IOU_THRESHOLD,
    obj_threshold: float = cfg.CONF_THRESHOLD,
    max_boxes: int = 256,
    max_gt: int = 128,
    compute_dtype=jnp.bfloat16,
) -> float:
    """mAP eval that never round-trips boxes to the host (BASELINE north
    star): per-batch forward/decode/NMS results stay on device, bucketed by
    image, and `ops.map.calc_map_device_batched` reduces them to one scalar.
    Only that scalar crosses the wire.

    Memory is O(images * K * G): ~131 MB of IoU for a 1,000-image val set at
    K=256/G=128 — the image-bucketed layout is what makes device eval viable
    at real val-set sizes (the flat calc_map_device would need an
    (I*K, I*G) matrix)."""
    step = make_eval_boxes_step(
        model, compute_dtype, max_boxes, max_gt, obj_threshold=obj_threshold
    )
    pred_rows, pred_ok, true_rows, true_ok = [], [], [], []
    for images, targets in loader:
        kept, mask, true = step(
            state.params,
            state.batch_stats,
            jnp.asarray(images),
            jnp.asarray(targets[-1]),
            np.asarray(anchors, np.float32),
            image_size=images.shape[1],
        )
        pred_rows.append(kept)
        pred_ok.append(mask)
        true_rows.append(true)
        true_ok.append(true[..., 4] > obj_threshold)
    mAP = _jitted_map_batched(
        jnp.concatenate(pred_rows),
        jnp.concatenate(pred_ok),
        jnp.concatenate(true_rows),
        jnp.concatenate(true_ok),
        iou_threshold=map_iou_threshold,
        num_classes=num_classes,
    )
    return float(mAP)
