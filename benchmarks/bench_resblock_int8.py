"""Isolated A/B: fused int8 Pallas residual stage vs the XLA int8 loop.

Same methodology as bench_resblock.py (chained iterations, real TPU):
per stage geometry, ms per pass for the XLA int8 block loop vs the fused
kernel at several chunk sizes. Inputs/outputs are s8 so iterations chain
without dtype glue. VERDICT round-2 item 6: a win past ~2950 img/s e2e or
a documented negative result with the traffic math (RESULTS.md).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from yolo_for_turbines_tpu.models.blocks import get_activation
from yolo_for_turbines_tpu.models.quantize import _conv_i8, _wq
from yolo_for_turbines_tpu.ops.pallas.resblock_int8_kernel import (
    fused_residual_stage_int8,
    int8_chunk_for,
    pack_int8_stage,
)


def make_stage(rng, c, n):
    blocks = []
    for _ in range(n):
        w1q, s1 = _wq(rng.normal(0, 0.5, (1, 1, c, c // 2)).astype(np.float32))
        w2q, s2 = _wq(rng.normal(0, 0.2, (3, 3, c // 2, c)).astype(np.float32))
        blocks.append({
            "w1q": w1q, "s1": s1,
            "b1": jnp.asarray(rng.normal(0, 0.1, (c // 2,)), jnp.float32),
            "w2q": w2q, "s2": s2,
            "b2": jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32),
        })
    return blocks


def xla_stage(xq, blocks, s_x, s1_list, s2_list, activation="leaky_relu"):
    act = get_activation(activation)

    def requant(y, s):
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

    x, s = xq, s_x
    for bp, s1_out, s2_out in zip(blocks, s1_list, s2_list):
        t1 = requant(
            act(_conv_i8(x, bp["w1q"], 1, 0).astype(jnp.float32)
                * (s * bp["s1"]) + bp["b1"]),
            s1_out,
        )
        y = act(_conv_i8(t1, bp["w2q"], 1, 1).astype(jnp.float32)
                * (s1_out * bp["s2"]) + bp["b2"])
        x = requant(y + x.astype(jnp.float32) * s, s2_out)
        s = s2_out
    return x


def bench(f, x, iters=30):
    r = f(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(r)  # chain: s8 in, s8 out
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    for (h, c, n) in [(104, 128, 2), (52, 256, 8), (26, 512, 8)]:
        blocks = make_stage(rng, c, n)
        s_x = jnp.float32(0.02)
        s1 = [jnp.float32(v) for v in rng.uniform(0.01, 0.05, n)]
        s2 = [jnp.float32(v) for v in rng.uniform(0.01, 0.05, n)]
        xq = jnp.asarray(rng.integers(-127, 128, (B, h, h, c)), jnp.int8)

        f_xla = jax.jit(lambda t: xla_stage(t, blocks, s_x, s1, s2))
        ms = bench(f_xla, xq)
        print(f"stage {h}x{h}x{c} n={n} B={B}: XLA int8 {ms:.2f} ms",
              flush=True)

        ops = pack_int8_stage(blocks, s_x, s1, s2)
        vmax = int8_chunk_for(h, h, c, n)
        for chunk in (1, 2, 4, 8):
            if n % chunk or chunk > max(vmax, 1):
                continue
            try:
                f_fused = jax.jit(
                    lambda t, _c=chunk: fused_residual_stage_int8(
                        t, *ops, chunk=_c
                    )
                )
                ms = bench(f_fused, xq)
                print(f"  fused chunk={chunk}: {ms:.2f} ms", flush=True)
            except Exception as e:
                print(f"  fused chunk={chunk}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
