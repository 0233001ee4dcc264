"""Pallas TPU kernel: fused folded-inference residual-block chains.

A Darknet-53 residual block at inference is
    x = x + act(conv3x3(act(conv1x1(x) + b1)) + b2)
(reference: code/model.py:88-121 + the BN fold). Run layer-by-layer, every
block costs four full HBM activation passes (read x for the 1x1, write mid,
read mid for the 3x3, write/read x for the add) even though XLA fuses the
bias+activation epilogues — at 52x52xB128 that is ~5.5 MB of traffic per
image per block for ~1.8 GFLOP, and the profiled 1x1 layers sit at
95-155 TFLOP/s, partly HBM-bound (benchmarks/RESULTS.md "Headline ceiling
analysis").

This kernel runs a CHUNK of consecutive blocks per grid step with the
activation resident in VMEM the whole time: one HBM read of x and one write
of the result per chunk, everything in between on-chip.

Formulation: the image stays FLATTENED as (H*W, C) rows — every matmul is a
clean 2D (H*W, C) @ (C, C') MXU shape, no 3D dot_general, no strided-slice
relayouts. The 3x3 conv is its im2col decomposition: nine taps, each a
sublane shift of the mid activation by s = (u-1)*W + (v-1) rows (zero-fill,
realized as a static slice + zero concat), masked where the tap crosses the
image border or a row boundary (masks from iota-derived x/y coordinates,
computed once per kernel), then a (H*W, C/2) @ (C/2, C) matmul accumulated
in f32. Same multiplies as the conv — no FLOP blowup — and the VPU
shift/mask traffic is VMEM-local.

The grid is (B,): consecutive batch elements revisit the same weight blocks
(Pallas keeps them resident, no re-DMA) and double-buffer the x tiles.
Chunks are sized by `resblock_chunk_for` to keep weights + f32 accumulator
+ double-buffered tiles under VMEM (~16 MB/core); stages that cannot fit a
useful chunk (104x104's 5.5 MB f32 accumulator) stay on the XLA path, as
does 13x13 where XLA already runs 86-97% MFU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.blocks import get_activation


def _shift_rows(a, s: int):
    """rows shifted so out[p] = a[p + s], zero-filled (static s)."""
    if s == 0:
        return a
    zeros = jnp.zeros((abs(s), a.shape[1]), a.dtype)
    if s > 0:
        return jnp.concatenate([a[s:], zeros], axis=0)
    return jnp.concatenate([zeros, a[:s]], axis=0)


def _stage_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                  *, n_blocks: int, h: int, w: int, activation: str):
    act = get_activation(activation)
    c = x_ref.shape[2]
    x = x_ref[0]  # (H*W, C), resident in VMEM for the whole chunk

    # Tap validity masks from flattened-row coordinates: tap (u, v) reads
    # source pixel (y+u-1, x+v-1), valid iff it lies inside the image.
    pid = jax.lax.broadcasted_iota(jnp.int32, (h * w, 1), 0)
    xc = pid % w
    yc = pid // w
    y_ok = [yc >= 1, None, yc <= h - 2]  # tap u reads y + (u-1)
    x_ok = [xc >= 1, None, xc <= w - 2]  # tap v reads x + (v-1)

    for i in range(n_blocks):  # static unroll over the chunk's blocks
        # 1x1 halve: f32 accumulation on the MXU, bias+act on the VPU
        mid = jnp.dot(x, w1_ref[i], preferred_element_type=jnp.float32)
        mid = act(mid + b1_ref[i]).astype(x.dtype)  # (H*W, C/2)

        # 3x3 restore: nine shifted+masked matmuls, f32 accumulator
        acc = jnp.broadcast_to(
            b2_ref[i].astype(jnp.float32), (h * w, c)
        )
        for u in range(3):
            for v in range(3):
                tap = _shift_rows(mid, (u - 1) * w + (v - 1))
                ok = y_ok[u]
                if x_ok[v] is not None:
                    ok = x_ok[v] if ok is None else (ok & x_ok[v])
                if ok is not None:
                    tap = jnp.where(ok, tap, jnp.zeros_like(tap))
                acc = acc + jnp.dot(
                    tap, w2_ref[i, u * 3 + v],
                    preferred_element_type=jnp.float32,
                )
        x = x + act(acc).astype(x.dtype)

    out_ref[0] = x


@functools.partial(
    jax.jit, static_argnames=("chunk", "activation", "interpret")
)
def fused_residual_stage(
    x,
    w1s,
    b1s,
    w2s,
    b2s,
    *,
    chunk: int,
    activation: str = "leaky_relu",
    interpret: bool = False,
):
    """Run a stack of folded residual blocks through the fused kernel.

    Args:
        x: (B, H, W, C) activation (bf16 on TPU).
        w1s: (n, 1, 1, C, C/2) or (n, C, C/2) folded 1x1 weights.
        b1s: (n, C/2) folded 1x1 biases.
        w2s: (n, 3, 3, C/2, C) folded 3x3 weights (HWIO).
        b2s: (n, C) folded 3x3 biases.
        chunk: blocks fused per kernel launch (must divide n); bounds VMEM.

    Returns (B, H, W, C), numerically the XLA layer-by-layer path within
    bf16 rounding (equivalence: tests/test_resblock_kernel.py).
    """
    b, h, w, c = x.shape
    n = w2s.shape[0]
    assert n % chunk == 0, (n, chunk)
    ch = c // 2
    dtype = x.dtype

    w1s = w1s.reshape(n, c, ch).astype(dtype)
    # (n, 3, 3, C/2, C) -> (n, 9, C/2, C), taps row-major to match the kernel
    w2s = w2s.reshape(n, 9, ch, c).astype(dtype)
    # biases as (n, 1, C) rows (broadcast along H*W inside the kernel)
    b1s = b1s.reshape(n, 1, ch).astype(jnp.float32)
    b2s = b2s.reshape(n, 1, c).astype(jnp.float32)

    x = x.reshape(b, h * w, c)
    n_chunks = n // chunk
    kernel = functools.partial(
        _stage_kernel, n_blocks=chunk, h=h, w=w, activation=activation
    )

    for ci in range(n_chunks):
        x = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, h * w, c), dtype),
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (1, h * w, c), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (chunk, c, ch), lambda i, _ci=ci: (_ci, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (chunk, 1, ch), lambda i, _ci=ci: (_ci, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (chunk, 9, ch, c), lambda i, _ci=ci: (_ci, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (chunk, 1, c), lambda i, _ci=ci: (_ci, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
            # donate x into the output: each grid step reads exactly the
            # block it overwrites, and halving the buffered tiles frees
            # ~2 * H*W*C bf16 bytes of VMEM for bigger chunks
            input_output_aliases={0: 0},
            cost_estimate=pl.CostEstimate(
                flops=2 * b * h * w * c * ch * 10 * chunk,
                bytes_accessed=2 * b * h * w * c * 2
                + chunk * 10 * ch * c * 2,
                transcendentals=0,
            ),
        )(x, w1s, b1s, w2s, b2s)
    return x.reshape(b, h, w, c)


def stack_block_params(blocks):
    """Folded per-block param dicts [{'conv1': {w,b}, 'conv2': {w,b}}, ...]
    -> stacked (w1s, b1s, w2s, b2s) arrays for `fused_residual_stage`."""
    w1s = jnp.stack([bp["conv1"]["w"] for bp in blocks])
    b1s = jnp.stack([bp["conv1"]["b"] for bp in blocks])
    w2s = jnp.stack([bp["conv2"]["w"] for bp in blocks])
    b2s = jnp.stack([bp["conv2"]["b"] for bp in blocks])
    return w1s, b1s, w2s, b2s


def resblock_chunk_for(h: int, w: int, c: int, n_blocks: int) -> int:
    """VMEM-aware chunk choice. Budget: double-buffered x in + out tiles
    (4 * H*W*C bf16) + f32 accumulator + mid/tap temporaries + chunk weights
    (10*C*C/2 bf16 each) must stay well under ~16 MB. Returns 0 when the
    stage shouldn't use the fused kernel at all."""
    tile = h * w * c * 2
    acc = h * w * c * 4
    fixed = 4 * tile + acc + 2 * (h * w * (c // 2) * 4)
    budget = 13 * 2**20 - fixed
    if budget <= 0:
        return 0
    per_block = 10 * c * (c // 2) * 2
    chunk = min(n_blocks, budget // per_block)
    if chunk <= 0:
        return 0
    while n_blocks % chunk:
        chunk -= 1
    return chunk


def stage_wins(b: int, h: int, w: int, c: int, n_blocks: int) -> bool:
    """Measured policy for where the fused kernel beats XLA (v5e,
    benchmarks/bench_resblock.py): the 26x26x512-class stage wins (-7% at
    B=128, -4% at B=8); 52x52x256 loses (VPU shift traffic over 2704-row
    tiles), 13x13x1024 can't hold its weights in VMEM, and B=1 loses
    outright (launch overhead + per-launch weight DMA can't amortize:
    forward 2.30 vs 1.58 ms). Gate on the winning class: mid-size spatial
    extent, c >= 512, a usable chunk, and batch >= 8."""
    if b < 8 or c < 512 or h * w > 32 * 32 or h * w < 16 * 16:
        return False
    return resblock_chunk_for(h, w, c, n_blocks) >= 2


def apply_residual_stage_fused(params, x, activation: str):
    """Drop-in for the PlanResidual branch of `apply_inference` (use_residual
    stages whose geometry measures faster fused; returns None when the XLA
    path should run instead)."""
    if jax.default_backend() in ("cpu",):  # Mosaic kernels are TPU-only
        return None
    b, h, w, c = x.shape
    n = len(params["blocks"])
    if not stage_wins(b, h, w, c, n):
        return None
    chunk = min(4, resblock_chunk_for(h, w, c, n))
    while n % chunk:
        chunk -= 1
    w1s, b1s, w2s, b2s = stack_block_params(params["blocks"])
    return fused_residual_stage(
        x, w1s, b1s, w2s, b2s, chunk=chunk, activation=activation
    )
