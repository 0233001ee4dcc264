"""Fused Pallas greedy-NMS kernel: IoU matrix + sequential sweep, one launch.

The XLA formulation (ops/nms.py) runs the greedy suppression as a K-step
`lax.fori_loop` of tiny kernels -- ~31ms p50 for K=256 on v5e, pure kernel-
launch latency. Here the whole thing is ONE Pallas program per image:

1. build the (K, K) IoU + same-class + strictly-later suppression matrix in
   VMEM (K=256 -> 256KB f32, trivially fits),
2. run the K-step greedy sweep *inside* the kernel: step i reads row i with
   a dynamic sublane slice, extracts keep[i] with a one-hot dot (dynamic
   lane indexing is not a thing on the VPU), and clears suppressed lanes --
   each step is a few (1, K) VPU ops, so the sweep is microseconds, not
   milliseconds.

Inputs are the top-K candidates sorted by descending score (the caller's
`lax.top_k` output), packed as rows (K, 8) = [x1, y1, w, h, class, valid,
0, 0] and their transpose (8, K) so both broadcast orientations come from
natural slices (same trick as iou_kernel.py). Batched via a grid over B.

Greedy semantics match the reference's pop-loop (code/utils.py:150-191):
a box cleared by an earlier kept box no longer suppresses anyone.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _nms_kernel(rows_ref, cols_ref, thr_ref, out_ref, sup_ref):
    r = rows_ref[0]  # (K, 8) -- blocks carry a leading batch dim of 1
    c = cols_ref[0]  # (8, K)
    k = r.shape[0]
    thr = thr_ref[0]

    x1i, y1i, wi, hi = r[:, 0:1], r[:, 1:2], r[:, 2:3], r[:, 3:4]
    clsi = r[:, 4:5]
    x1j, y1j, wj, hj = c[0:1, :], c[1:2, :], c[2:3, :], c[3:4, :]
    clsj = c[4:5, :]
    valid = c[5:6, :]  # (1, K)

    xA = jnp.maximum(x1i, x1j)
    yA = jnp.maximum(y1i, y1j)
    xB = jnp.minimum(x1i + wi, x1j + wj)
    yB = jnp.minimum(y1i + hi, y1j + hj)
    inter = jnp.maximum(xB - xA, 0.0) * jnp.maximum(yB - yA, 0.0)
    union = wi * hi + wj * hj - inter
    iou = inter / (union + 1e-6)

    same = clsi == clsj
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    later = row_ids < col_ids
    # stage the suppression matrix in VMEM scratch: Mosaic supports dynamic
    # sublane slicing on refs, not on values
    sup_ref[:] = jnp.where(same & (iou >= thr) & later, 1.0, 0.0)  # (K, K)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, keep):
        row_i = sup_ref[pl.ds(i, 1), :]  # (1, K)
        onehot = jnp.where(col_iota == i, 1.0, 0.0)
        keep_i = jnp.sum(keep * onehot)
        return keep * (1.0 - row_i * keep_i)

    keep = jax.lax.fori_loop(0, k, body, valid)
    out_ref[0, 0, :] = keep[0]


@functools.partial(jax.jit, static_argnames=("box_format",))
def greedy_nms_pallas(
    cand, valid, iou_threshold, box_format: str = "center"
):
    """Fused greedy NMS over pre-sorted candidates.

    Args:
        cand: (B, K, 6) top-K candidates per image, descending score.
        valid: (B, K) bool candidate validity (score above threshold).
        iou_threshold: scalar.
        box_format: "center" (cxcywh) or top-left xywh otherwise.

    Returns:
        (B, K) bool keep mask.
    """
    cand = jnp.asarray(cand, jnp.float32)
    b, k = cand.shape[0], cand.shape[1]
    kp = max(_LANE, -(-k // _LANE) * _LANE)

    boxes = cand[..., :4]
    if box_format == "center":
        xy = boxes[..., :2] - boxes[..., 2:4] / 2
        boxes = jnp.concatenate([xy, boxes[..., 2:4]], axis=-1)
    packed = jnp.concatenate(
        [
            boxes,
            cand[..., 5:6],  # class
            jnp.asarray(valid, jnp.float32)[..., None],
            jnp.zeros((b, k, 2), jnp.float32),
        ],
        axis=-1,
    )  # (B, K, 8)
    if kp != k:
        packed = jnp.pad(packed, ((0, 0), (0, kp - k), (0, 0)))

    rows = packed  # (B, Kp, 8)
    cols = jnp.swapaxes(packed, 1, 2)  # (B, 8, Kp)
    thr = jnp.full((1,), iou_threshold, jnp.float32)

    keep = pl.pallas_call(
        _nms_kernel,
        # out is (B, 1, Kp) so each block's trailing dims (1, Kp) are
        # TPU-legal regardless of B
        out_shape=jax.ShapeDtypeStruct((b, 1, kp), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kp, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((kp, kp), jnp.float32)],
    )(rows, cols, thr)
    return keep[:, 0, :k] > 0.5
