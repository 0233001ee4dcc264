"""Fused residual-stage Pallas kernel: equivalence vs the XLA conv path.

The kernel's shift+mask im2col decomposition must reproduce conv2d(pad=1)
exactly (same multiplies, f32 accumulation), including image borders, for
any chunk split and for both activations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_for_turbines_tpu.models.blocks import conv2d, get_activation
from yolo_for_turbines_tpu.ops.pallas.resblock_kernel import (
    fused_residual_stage,
    resblock_chunk_for,
)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    )


def _make_stage(n, c, seed=0):
    ch = c // 2
    return (
        _rand((n, 1, 1, c, ch), seed),
        _rand((n, ch), seed + 1) * 0.1,
        _rand((n, 3, 3, ch, c), seed + 2) * 0.2,
        _rand((n, c), seed + 3) * 0.1,
    )


def _xla_stage(x, w1s, b1s, w2s, b2s, activation):
    act = get_activation(activation)
    for i in range(w1s.shape[0]):
        y = act(conv2d(x, w1s[i].reshape(1, 1, *w1s.shape[-2:]), 1, 0) + b1s[i])
        y = act(conv2d(y, w2s[i], 1, 1) + b2s[i])
        x = x + y
    return x


@pytest.mark.parametrize("chunk", [1, 2, 4])
def test_fused_stage_matches_xla(chunk):
    c, n = 16, 4
    x = _rand((2, 6, 10, c), 9)
    w1s, b1s, w2s, b2s = _make_stage(n, c)
    got = fused_residual_stage(
        x, w1s, b1s, w2s, b2s, chunk=chunk, interpret=True
    )
    want = _xla_stage(x, w1s, b1s, w2s, b2s, "leaky_relu")
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


def test_fused_stage_mish():
    c, n = 8, 2
    x = _rand((1, 5, 7, c), 3)
    w1s, b1s, w2s, b2s = _make_stage(n, c, seed=11)
    got = fused_residual_stage(
        x, w1s, b1s, w2s, b2s, chunk=2, activation="mish", interpret=True
    )
    want = _xla_stage(x, w1s, b1s, w2s, b2s, "mish")
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


def test_chunk_sizer():
    # 52x52x256 stage of 8 blocks: must fit a divisor chunk >= 2
    assert resblock_chunk_for(52, 52, 256, 8) >= 2
    # 26x26x512 stage: some usable chunk
    assert resblock_chunk_for(26, 26, 512, 8) >= 1
    # 104x104x128: f32 accumulator + tiles blow VMEM -> XLA path
    assert resblock_chunk_for(104, 104, 128, 2) == 0


def test_stage_wins_gate():
    from yolo_for_turbines_tpu.ops.pallas.resblock_kernel import stage_wins

    # the winning class: 26x26x512, batched
    assert stage_wins(128, 26, 26, 512, 8)
    assert stage_wins(8, 26, 26, 512, 8)
    # single/tiny-batch serving keeps the XLA path (launch overhead)
    assert not stage_wins(1, 26, 26, 512, 8)
    assert not stage_wins(4, 26, 26, 512, 8)
    # losing geometries
    assert not stage_wins(128, 52, 52, 256, 8)
    assert not stage_wins(128, 104, 104, 128, 2)
    assert not stage_wins(128, 13, 13, 1024, 4)
