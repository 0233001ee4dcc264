"""Pallas TPU kernel: fused int8 residual-block chains (PTQ serving path).

int8 twin of `resblock_kernel.py` (see its docstring for the im2col
formulation): a chunk of consecutive residual blocks runs with the s8
activation VMEM-resident — one HBM read of x and one write per chunk —
mirroring `models/quantize.py::apply_inference_int8`'s per-block math
exactly:

    mid = requant( act(conv1x1_i8(x) * (s_in*sw1) + b1), s_mid )
    y   = requant( act(conv3x3_i8(mid) * (s_mid*sw2) + b2) + x*s_in, s_out )

All dequant/requant constants are folded OUTSIDE the kernel into per-block
row vectors (d1 = s_in*sw1, vm1 = 1/s_mid, d2 = s_mid*sw2, vout = 1/s_out,
rres = s_in/s_out — the scale chain s_in[i] = s_out[i-1] is resolved at
trace time from the calibrated scales), so the kernel body is two int8 MXU
matmul groups + one fused f32 epilogue per conv, with s8 tap shifts
(half the VPU shift traffic of the bf16 kernel) and an i32 accumulator.

Numerics: identical operations in the same order as the XLA path except
matmul-accumulation order inside the MXU; int8 outputs match the XLA path
bit-for-bit except at exact .5 rounding boundaries of the f32 requant
(asserted ~exact in tests/test_resblock_int8_kernel.py).

Measured policy (v5e, benchmarks/bench_resblock_int8.py): see
`int8_stage_wins` — the profile expectation (benchmarks/RESULTS.md
"int8 post-training quantization") is that residual stages are already
compute-bound, so wins are small or negative; this kernel exists to
measure that, and self-gates to measured winners only.

reference: code/model.py:88-121 (ResidualBlock) — the reference has no
quantized or fused path; this is TPU-native extension work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.blocks import get_activation
from .resblock_kernel import _shift_rows


def _stage_kernel_i8(
    x_ref, w1_ref, d1_ref, b1_ref, vm1_ref, w2_ref, d2_ref, b2_ref,
    vout_ref, rres_ref, out_ref, *, n_blocks: int, h: int, w: int,
    activation: str,
):
    act = get_activation(activation)
    c = x_ref.shape[2]
    x = x_ref[0]  # (H*W, C) s8, VMEM-resident across the chunk

    pid = jax.lax.broadcasted_iota(jnp.int32, (h * w, 1), 0)
    xc = pid % w
    yc = pid // w
    y_ok = [yc >= 1, None, yc <= h - 2]
    x_ok = [xc >= 1, None, xc <= w - 2]

    for i in range(n_blocks):  # static unroll
        # 1x1 halve on the int8 MXU; dequant+act+requant epilogue on the VPU
        m32 = jnp.dot(x, w1_ref[i], preferred_element_type=jnp.int32)
        mid_f = act(m32.astype(jnp.float32) * d1_ref[i] + b1_ref[i])
        mid = jnp.clip(
            jnp.round(mid_f * vm1_ref[i]), -127, 127
        ).astype(jnp.int8)  # (H*W, C/2)

        # 3x3 restore: nine shifted+masked s8 matmuls, i32 accumulator
        acc = jnp.zeros((h * w, c), jnp.int32)
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
                    preferred_element_type=jnp.int32,
                )
        y = act(acc.astype(jnp.float32) * d2_ref[i] + b2_ref[i])
        # residual add + requant, scales folded: (y + x*s_in)/s_out
        y = y * vout_ref[i] + x.astype(jnp.float32) * rres_ref[i]
        x = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    out_ref[0] = x


@functools.partial(
    jax.jit, static_argnames=("chunk", "activation", "interpret")
)
def fused_residual_stage_int8(
    xq,
    w1q,
    d1,
    b1,
    vm1,
    w2q,
    d2,
    b2,
    vout,
    rres,
    *,
    chunk: int,
    activation: str = "leaky_relu",
    interpret: bool = False,
):
    """Run a stack of quantized residual blocks through the fused kernel.

    Args:
        xq: (B, H, W, C) int8 activation.
        w1q: (n, C, C/2) int8 1x1 weights.
        d1/b1/vm1: (n, C/2) f32 epilogue rows (dequant, bias, 1/s_mid).
        w2q: (n, 9, C/2, C) int8 3x3 tap weights (row-major taps).
        d2/b2/vout/rres: (n, C) f32 epilogue rows.
        chunk: blocks fused per launch (must divide n).

    Returns (B, H, W, C) int8, matching the XLA int8 path's block loop.
    """
    b, h, w, c = xq.shape
    n = w1q.shape[0]
    assert n % chunk == 0, (n, chunk)
    ch = c // 2

    def rows(a, k):
        return a.reshape(n, 1, k).astype(jnp.float32)

    d1, b1, vm1 = rows(d1, ch), rows(b1, ch), rows(vm1, ch)
    d2, b2 = rows(d2, c), rows(b2, c)
    vout, rres = rows(vout, c), rows(rres, c)

    xq = xq.reshape(b, h * w, c)
    kernel = functools.partial(
        _stage_kernel_i8, n_blocks=chunk, h=h, w=w, activation=activation
    )

    for ci in range(n // chunk):
        vspec = lambda k, _ci=ci: pl.BlockSpec(  # noqa: E731
            (chunk, 1, k), lambda i, _c=_ci: (_c, 0, 0),
            memory_space=pltpu.VMEM,
        )
        xq = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, h * w, c), jnp.int8),
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
                vspec(ch), vspec(ch), vspec(ch),
                pl.BlockSpec(
                    (chunk, 9, ch, c), lambda i, _ci=ci: (_ci, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                vspec(c), vspec(c), vspec(c), vspec(c),
            ],
            out_specs=pl.BlockSpec(
                (1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * h * w * c * ch * 10 * chunk,
                bytes_accessed=2 * b * h * w * c
                + chunk * 10 * ch * c,
                transcendentals=0,
            ),
        )(xq, w1q, d1, b1, vm1, w2q, d2, b2, vout, rres)
    return xq.reshape(b, h, w, c)


def pack_int8_stage(blocks_q, s_in, s1_list, s2_list):
    """Per-block quantized dicts (models/quantize.py::_q_blocks layout:
    w1q/s1/b1/w2q/s2/b2) + the calibrated activation-scale chain ->
    stacked kernel operands. `s_in` is the stage input activation scale;
    s1_list/s2_list are each block's mid/out scales (traced f32 scalars).
    """
    n = len(blocks_q)
    w1q = jnp.stack([b["w1q"].reshape(b["w1q"].shape[-2], -1)
                     if b["w1q"].ndim == 4 else b["w1q"] for b in blocks_q])
    w2q = jnp.stack([
        b["w2q"].reshape(9, *b["w2q"].shape[-2:]) for b in blocks_q
    ])
    d1, b1, vm1, d2, b2, vout, rres = [], [], [], [], [], [], []
    s = s_in
    for i in range(n):
        s_mid, s_out = s1_list[i], s2_list[i]
        d1.append(blocks_q[i]["s1"] * s)
        b1.append(blocks_q[i]["b1"])
        vm1.append(jnp.broadcast_to(1.0 / s_mid, blocks_q[i]["s1"].shape))
        d2.append(blocks_q[i]["s2"] * s_mid)
        b2.append(blocks_q[i]["b2"])
        vout.append(jnp.broadcast_to(1.0 / s_out, blocks_q[i]["s2"].shape))
        rres.append(jnp.broadcast_to(s / s_out, blocks_q[i]["s2"].shape))
        s = s_out
    return (
        w1q, jnp.stack(d1), jnp.stack(b1), jnp.stack(vm1),
        w2q, jnp.stack(d2), jnp.stack(b2), jnp.stack(vout), jnp.stack(rres),
    )


def int8_chunk_for(h: int, w: int, c: int, n_blocks: int) -> int:
    """VMEM-aware chunk choice for the int8 kernel: s8 tiles (half the
    bf16 kernel's), i32 accumulator, s8 weights + small f32 epilogue rows.
    """
    tile = h * w * c  # s8 in + (aliased) out
    acc = h * w * c * 4
    mid = h * w * (c // 2) * 2  # mid s8 + a shifted tap copy
    fixed = 2 * tile + acc + mid
    budget = 13 * 2**20 - fixed
    if budget <= 0:
        return 0
    per_block = 10 * c * (c // 2) + 7 * c * 4
    chunk = min(n_blocks, budget // per_block)
    if chunk <= 0:
        return 0
    while n_blocks % chunk:
        chunk -= 1
    return chunk


# Geometry classes measured to beat the XLA int8 path on v5e, mapped to
# their measured-best chunk (benchmarks/bench_resblock_int8.py, B=128).
#
# EMPTY BY DESIGN — measured negative result (RESULTS.md "int8 stage
# fusion A/B"): in ISOLATION the kernel wins big (52x52x256 n=8: 8.7 ms
# fused vs 61.8 ms XLA; 26x26x512 n=8: 7.1 vs 24.0), but END TO END the
# full int8 pipeline is ~2% SLOWER with the kernel routed in (2756 vs
# 2801 img/s, same-session repeated A/B). The isolated XLA baseline
# under-fuses; inside the full program every int8 conv already lowers to
# one clamp_convert_fusion (conv + dequant/bias/act/requant epilogue,
# s8 out), so the stage loop's HBM traffic is already near-minimal and
# the kernel boundary only breaks XLA's cross-op fusion. The kernel and
# router are kept as measured-win opt-in infrastructure: populate
# {(h*w, c): chunk} from bench_resblock_int8.py if a future
# geometry/toolchain shifts the balance.
_WINNING = {}


def int8_stage_wins(b: int, h: int, w: int, c: int, n_blocks: int) -> bool:
    if b < 8:
        return False
    return (h * w, c) in _WINNING and int8_chunk_for(h, w, c, n_blocks) >= 2


def int8_winning_chunk(h: int, w: int, c: int, n_blocks: int) -> int:
    """Measured-best chunk for a winning geometry, clamped to what VMEM
    fits and to a divisor of n_blocks."""
    chunk = min(_WINNING[(h * w, c)], max(int8_chunk_for(h, w, c, n_blocks), 1))
    while n_blocks % chunk:
        chunk -= 1
    return chunk
