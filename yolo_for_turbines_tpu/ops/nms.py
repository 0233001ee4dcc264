"""Class-aware greedy NMS with fixed shapes, on device under jit.

The reference's NMS (reference: code/utils.py:150-191) is a host-side Python
while-loop over a list of boxes: filter score > threshold, sort descending,
pop the best, vectorized-IoU against the rest, keep different-class or
low-IoU boxes. Its greedy semantics (a box suppressed by an earlier kept box
cannot itself suppress) are preserved here, but the whole thing is a
fixed-shape jnp program:

1. top-k (k = max_boxes) candidates by masked score -- descending order,
   padded/masked, so shapes are static under jit.
2. one K x K IoU matrix (this is the Pallas-kernel hot spot; see
   ops/pallas/iou_kernel.py which computes it tiled in VMEM).
3. a sequential `lax.fori_loop` sweep that replicates the greedy pop loop:
   step i clears later boxes of the same class with IoU >= threshold iff
   box i itself is still kept.

`batched_nms` vmaps this over a batch so per-image NMS of an eval batch is a
single device computation -- no per-image host round-trips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .iou import calc_iou


def _pairwise_iou(boxes4, box_format: str):
    """(K, 4) -> (K, K) IoU matrix."""
    return calc_iou(boxes4[:, None, :], boxes4[None, :, :], box_format)


def nms_single(
    boxes,
    iou_threshold: float,
    obj_threshold: float,
    max_boxes: int = 256,
    box_format: str = "center",
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMS for one image's candidate boxes.

    Args:
        boxes: (N, 6) [cx, cy, w, h, score, class].
        iou_threshold: suppress same-class boxes with IoU >= this.
        obj_threshold: pre-filter: keep score > this (strict, parity with
            reference code/utils.py:165).
        max_boxes: K, the fixed survivor capacity.
        box_format: "center" or "corner" (top-left xywh).

    Returns:
        (kept_boxes, keep_mask): (K, 6) sorted by descending score and (K,)
        bool. Rows where keep_mask is False are padding/suppressed.
    """
    boxes = jnp.asarray(boxes)
    n = boxes.shape[0]
    k = min(max_boxes, n)

    scores = boxes[:, 4]
    valid = scores > obj_threshold
    masked_scores = jnp.where(valid, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked_scores, k)
    cand = boxes[top_idx]
    keep = top_scores > obj_threshold

    if use_pallas:
        # fused kernel: IoU matrix + greedy sweep in ONE launch (the XLA
        # fori_loop below costs a kernel launch per candidate -- ~31ms p50
        # at K=256 on v5e vs microseconds fused)
        from .pallas.nms_kernel import greedy_nms_pallas

        keep = greedy_nms_pallas(
            cand[None], keep[None], iou_threshold, box_format=box_format
        )[0]
        return cand, keep

    iou = _pairwise_iou(cand[:, :4], box_format)
    same_class = cand[:, 5][:, None] == cand[:, 5][None, :]
    later = jnp.arange(k)[None, :] > jnp.arange(k)[:, None]
    # suppress[i, j] = kept box i would suppress later box j
    suppress = same_class & (iou >= iou_threshold) & later

    def body(i, keep):
        sup_i = suppress[i] & keep[i]
        return keep & ~sup_i

    keep = jax.lax.fori_loop(0, k, body, keep)
    return cand, keep


def batched_nms(
    boxes,
    iou_threshold: float,
    obj_threshold: float,
    max_boxes: int = 256,
    box_format: str = "center",
    use_pallas: bool = False,
):
    """Batched NMS: (B, N, 6) -> ((B, K, 6), (B, K) bool).

    use_pallas runs the fused greedy kernel over the whole batch in one
    launch (grid over B); otherwise the XLA formulation is vmapped.
    """
    boxes = jnp.asarray(boxes)
    # The fused Pallas kernel wins at small batch (one launch instead of a
    # K-step launch train: 1.14ms vs 1.31ms at B=1 on v5e) but its grid
    # serializes per-image sweeps, so the vmapped XLA sweep -- K iterations
    # of (B, K) work -- wins at batch (2.9ms vs 7.4ms at B=128).
    if use_pallas and boxes.shape[0] <= 8:
        from .pallas.nms_kernel import greedy_nms_pallas

        k = min(max_boxes, boxes.shape[1])
        scores = boxes[..., 4]
        valid = scores > obj_threshold
        masked = jnp.where(valid, scores, -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(masked, k)
        cand = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        keep = top_scores > obj_threshold
        keep = greedy_nms_pallas(cand, keep, iou_threshold, box_format=box_format)
        return cand, keep

    fn = functools.partial(
        nms_single,
        iou_threshold=iou_threshold,
        obj_threshold=obj_threshold,
        max_boxes=max_boxes,
        box_format=box_format,
        use_pallas=False,
    )
    return jax.vmap(fn)(boxes)


def nms_to_list(kept_boxes, keep_mask):
    """(K, 6) + (K,) -> reference-style list of [x, y, w, h, score, class]."""
    import numpy as np

    kept = np.asarray(kept_boxes)
    mask = np.asarray(keep_mask)
    return [row.tolist() for row in kept[mask]]


def non_max_suppression(
    boxes, iou_threshold: float, obj_threshold: float, box_format: str = "corners"
):
    """Reference-compatible API (reference: code/utils.py:150-191).

    Takes a list of [x, y, w, h, score, class] rows, returns the surviving
    rows sorted by descending score. Runs the fixed-shape device NMS under
    the hood.

    WARNING — host-loop API, not for TPU serving: this dispatches
    `nms_single` UNJITTED (op-by-op) and round-trips the survivors to host
    per call. On a tunneled TPU host each of the ~10 op dispatches pays a
    full RTT (~25 ms), so a per-image loop through this function costs
    seconds per batch. It exists for reference-parity tests and host-side
    (CPU) use; on-device pipelines must use `batched_nms` inside their jit
    (the Predictor/eval paths already do).
    """
    import numpy as np

    arr = np.asarray(boxes, dtype=np.float32)
    if arr.size == 0:
        return []
    kept, mask = nms_single(
        arr,
        iou_threshold=iou_threshold,
        obj_threshold=obj_threshold,
        max_boxes=arr.shape[0],
        box_format=box_format,
    )
    return nms_to_list(kept, mask)
