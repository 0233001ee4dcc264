"""Equivalence: fused int8 Pallas residual stage vs the XLA int8 block loop.

Runs the kernel in interpret mode on CPU against a reference that mirrors
`models/quantize.py::apply_inference_int8`'s PlanResidual branch exactly
(same epilogue formula, same scale chain). int8 outputs must match
bit-for-bit except at exact .5 requant boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_for_turbines_tpu.models.blocks import get_activation
from yolo_for_turbines_tpu.models.quantize import _conv_i8, _wq
from yolo_for_turbines_tpu.ops.pallas.resblock_int8_kernel import (
    fused_residual_stage_int8,
    int8_chunk_for,
    pack_int8_stage,
)


def _make_stage(rng, c, n):
    blocks = []
    for _ in range(n):
        w1 = rng.normal(0, 0.5, (1, 1, c, c // 2)).astype(np.float32)
        w2 = rng.normal(0, 0.2, (3, 3, c // 2, c)).astype(np.float32)
        w1q, s1 = _wq(w1)
        w2q, s2 = _wq(w2)
        blocks.append({
            "w1q": w1q, "s1": s1,
            "b1": jnp.asarray(rng.normal(0, 0.1, (c // 2,)), jnp.float32),
            "w2q": w2q, "s2": s2,
            "b2": jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32),
        })
    return blocks


def _ref_stage(xq, blocks, s_x, s1_list, s2_list, activation):
    """Mirror of apply_inference_int8's use_residual block loop."""
    act = get_activation(activation)

    def requant(y, s):
        return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

    x, s = xq, s_x
    for bp, s1_out, s2_out in zip(blocks, s1_list, s2_list):
        y32 = _conv_i8(x, bp["w1q"], 1, 0)
        t1 = requant(
            act(y32.astype(jnp.float32) * (s * bp["s1"]) + bp["b1"]), s1_out
        )
        y32b = _conv_i8(t1, bp["w2q"], 1, 1)
        y = act(y32b.astype(jnp.float32) * (s1_out * bp["s2"]) + bp["b2"])
        y = y + x.astype(jnp.float32) * s
        x = requant(y, s2_out)
        s = s2_out
    return x


@pytest.mark.parametrize("activation", ["leaky_relu", "mish"])
def test_fused_int8_stage_matches_xla_loop(activation):
    rng = np.random.default_rng(7)
    b, h, w, c, n = 2, 8, 8, 32, 4
    blocks = _make_stage(rng, c, n)
    xq = jnp.asarray(rng.integers(-127, 128, (b, h, w, c)), jnp.int8)
    s_x = jnp.float32(0.021)
    s1_list = [jnp.float32(v) for v in rng.uniform(0.01, 0.05, n)]
    s2_list = [jnp.float32(v) for v in rng.uniform(0.01, 0.05, n)]

    want = _ref_stage(xq, blocks, s_x, s1_list, s2_list, activation)
    ops = pack_int8_stage(blocks, s_x, s1_list, s2_list)
    got = fused_residual_stage_int8(
        xq, *ops, chunk=2, activation=activation, interpret=True
    )

    want = np.asarray(want, np.int32)
    got = np.asarray(got, np.int32)
    diff = np.abs(want - got)
    # identical math reassociated: only exact-.5 requant boundaries may
    # flip, and only by one quantization step
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01


def test_apply_inference_int8_fused_routing_matches_xla():
    """Integration glue: `apply_inference_int8`'s PlanResidual branch with
    the fused router forced on (interpret mode) must match the XLA block
    loop end-to-end — scale-chain hoisting, operand packing, routing."""
    from helpers import mini_model
    from yolo_for_turbines_tpu.models import quantize as qz

    model = mini_model()
    params, stats = model.init(jax.random.PRNGKey(0))
    folded = model.fold(params, stats)
    rng = np.random.default_rng(11)
    xc = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    qp = qz.quantize_folded(model.plan, folded, xc)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    want = qz.apply_inference_int8(model.plan, qp, x, raw_heads=True)
    assert not qz._FORCE_FUSED_INT8_INTERPRET
    qz._FORCE_FUSED_INT8_INTERPRET = True
    try:
        got = qz.apply_inference_int8(model.plan, qp, x, raw_heads=True)
    finally:
        qz._FORCE_FUSED_INT8_INTERPRET = False

    for g, r in zip(got, want):
        g = np.asarray(g, np.float64)
        r = np.asarray(r, np.float64)
        # downstream of the stage requants, drift is bounded by single
        # +/-1 int8 flips at exact-.5 boundaries inside the stages
        cos = float(
            (g.ravel() @ r.ravel())
            / (np.linalg.norm(g) * np.linalg.norm(r) + 1e-12)
        )
        assert cos > 0.999, cos


def test_int8_chunk_sizing():
    # 26x26x512-class geometry fits a multi-block chunk
    assert int8_chunk_for(26, 26, 512, 8) >= 2
    # absurd geometry returns 0 (no fused path)
    assert int8_chunk_for(104, 104, 2048, 8) == 0


def test_int8_winner_routing():
    """Measured-winner gating: the production table is EMPTY (e2e A/B
    negative result, see _WINNING's comment) so nothing routes to the
    kernel by default; when a geometry is entered, routing picks its
    measured chunk clamped to a divisor of n_blocks."""
    from yolo_for_turbines_tpu.ops.pallas import resblock_int8_kernel as rk

    # production default: kernel off everywhere
    assert not rk._WINNING
    assert not rk.int8_stage_wins(128, 52, 52, 256, 8)
    assert not rk.int8_stage_wins(128, 26, 26, 512, 8)

    rk._WINNING[(52 * 52, 256)] = 4
    rk._WINNING[(26 * 26, 512)] = 2
    try:
        assert rk.int8_stage_wins(128, 52, 52, 256, 8)
        assert rk.int8_winning_chunk(52, 52, 256, 8) == 4
        assert rk.int8_stage_wins(128, 26, 26, 512, 8)
        assert rk.int8_winning_chunk(26, 26, 512, 8) == 2
        # unlisted geometries stay on XLA
        assert not rk.int8_stage_wins(128, 104, 104, 128, 2)
        assert not rk.int8_stage_wins(128, 13, 13, 1024, 4)
        # small batches never route to the kernel
        assert not rk.int8_stage_wins(4, 52, 52, 256, 8)
        # chunk must divide n_blocks: a 6-block stage clamps 4 -> 3
        assert rk.int8_winning_chunk(52, 52, 256, 6) == 3
    finally:
        rk._WINNING.clear()
