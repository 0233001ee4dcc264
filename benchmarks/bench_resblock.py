"""Isolated A/B: fused Pallas residual stage vs the XLA conv loop (real TPU).

Run per stage geometry; prints ms per pass at B=128 for each path.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from yolo_for_turbines_tpu.models.blocks import conv2d, get_activation
from yolo_for_turbines_tpu.ops.pallas.resblock_kernel import fused_residual_stage


def xla_stage(x, w1s, b1s, w2s, b2s, activation="leaky_relu"):
    act = get_activation(activation)
    for i in range(w1s.shape[0]):
        y = act(conv2d(x, w1s[i].reshape(1, 1, *w1s.shape[-2:]), 1, 0) + b1s[i])
        y = act(conv2d(y, w2s[i], 1, 1) + b2s[i])
        x = x + y
    return x


def bench(f, x, iters=30):
    r = f(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(r)  # chain through the output: no dispatch overlap ambiguity
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    for (h, c, n) in [(52, 256, 8), (26, 512, 8)]:
        ch = c // 2
        x = jnp.asarray(rng.normal(size=(B, h, h, c)) * 0.1, jnp.bfloat16)
        w1s = jnp.asarray(rng.normal(size=(n, 1, 1, c, ch)) * 0.05, jnp.bfloat16)
        b1s = jnp.asarray(rng.normal(size=(n, ch)) * 0.05, jnp.bfloat16)
        w2s = jnp.asarray(rng.normal(size=(n, 3, 3, ch, c)) * 0.05, jnp.bfloat16)
        b2s = jnp.asarray(rng.normal(size=(n, c)) * 0.05, jnp.bfloat16)

        f_xla = jax.jit(lambda t: xla_stage(t, w1s, b1s, w2s, b2s))
        ms = bench(f_xla, x)
        print(f"stage {h}x{h}x{c} n={n} B={B}: XLA {ms:.2f} ms", flush=True)

        for chunk in (1, 2, 4, 8):
            if n % chunk:
                continue
            try:
                f_fused = jax.jit(
                    lambda t, _c=chunk: fused_residual_stage(
                        t, w1s, b1s, w2s, b2s, chunk=_c
                    )
                )
                ms = bench(f_fused, x)
                print(f"  fused chunk={chunk}: {ms:.2f} ms", flush=True)
            except Exception as e:
                print(f"  fused chunk={chunk}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
