"""Pallas TPU kernel: tiled pairwise-IoU matrix for NMS.

Computes the (K, K) IoU matrix used by the greedy NMS sweep entirely in VMEM,
tiled (BK, BK) over a 2-D grid. This is the hot op of the eval/NMS path (the
reference's vectorized-NMS inner product, code/utils.py:170-187, recomputes
row IoUs per surviving box on the host; here the whole matrix is one fused
on-chip pass).

Layout trick: the kernel needs box i's coordinates broadcast along lanes and
box j's along sublanes. Instead of transposing inside the kernel (expensive
relayout on TPU), the wrapper passes the same boxes twice -- once as (K, 4)
rows for the sublane axis and once as (4, K) columns for the lane axis -- and
each (BKi, 1) x (1, BKj) pair broadcasts to the (BKi, BKj) output tile on the
VPU for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BK = 128  # output tile (lane width; f32 min tile is (8, 128))


def _iou_tile_kernel(rows_ref, cols_ref, out_ref):
    """rows_ref: (BK, 4) boxes i (top-left xywh); cols_ref: (4, BK) boxes j."""
    r = rows_ref[:]
    c = cols_ref[:]
    x1i, y1i = r[:, 0:1], r[:, 1:2]
    wi, hi = r[:, 2:3], r[:, 3:4]
    x1j, y1j = c[0:1, :], c[1:2, :]
    wj, hj = c[2:3, :], c[3:4, :]

    xA = jnp.maximum(x1i, x1j)
    yA = jnp.maximum(y1i, y1j)
    xB = jnp.minimum(x1i + wi, x1j + wj)
    yB = jnp.minimum(y1i + hi, y1j + hj)
    inter = jnp.maximum(xB - xA, 0.0) * jnp.maximum(yB - yA, 0.0)
    union = wi * hi + wj * hj - inter
    out_ref[:] = inter / (union + 1e-6)


@functools.partial(jax.jit, static_argnames=("box_format",))
def pairwise_iou_pallas(boxes4, box_format: str = "center"):
    """(K, 4) boxes -> (K, K) IoU matrix via a tiled Pallas kernel.

    Matches ops.iou.calc_iou semantics: "center" is cxcywh, anything else is
    top-left xywh; +1e-6 in the union.
    """
    boxes4 = jnp.asarray(boxes4, jnp.float32)
    k = boxes4.shape[0]
    if box_format == "center":
        xy = boxes4[:, :2] - boxes4[:, 2:4] / 2
        boxes4 = jnp.concatenate([xy, boxes4[:, 2:4]], axis=1)

    kp = max(_BK, -(-k // _BK) * _BK)
    if kp != k:
        # Pad with degenerate zero-area boxes (IoU 0 against everything).
        boxes4 = jnp.pad(boxes4, ((0, kp - k), (0, 0)))

    rows = boxes4  # (Kp, 4)
    cols = boxes4.T  # (4, Kp)

    grid = (kp // _BK, kp // _BK)
    out = pl.pallas_call(
        _iou_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((kp, kp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BK, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _BK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_BK, _BK), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
    )(rows, cols)
    return out[:k, :k]
