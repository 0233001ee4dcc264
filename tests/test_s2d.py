"""Space-to-depth stem: exact-equivalence tests against the plain layout.

The s2d stem (models/s2d.py) must be an arithmetic relayout, not an
approximation: every kernel transform is checked against the direct conv,
and the full forward/backward through the mini model is checked end to end
with s2d_stem on vs off (f32; diffs are pure reassociation noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import MINI_CSP_LAYERS, mini_model
from yolo_for_turbines_tpu.config import ModelConfig
from yolo_for_turbines_tpu.models import s2d as S
from yolo_for_turbines_tpu.models import yolov3 as M
from yolo_for_turbines_tpu.models.blocks import conv2d
from yolo_for_turbines_tpu.models.yolov3 import YOLOv3


@pytest.fixture(scope="module")
def mini():
    model = mini_model()
    params, stats = model.init(jax.random.PRNGKey(0))
    return model, params, stats


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


class TestKernelTransforms:
    def test_s1_3x3(self):
        x, k = _rand((2, 16, 16, 3)), _rand((3, 3, 3, 5), 1)
        ref = S.space_to_depth(conv2d(x, k, 1, 1))
        out = conv2d(S.space_to_depth(x), S.s2d_kernel_s1(k), 1, 1)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_s1_1x1(self):
        x, k = _rand((2, 16, 16, 4)), _rand((1, 1, 4, 6), 1)
        ref = S.space_to_depth(conv2d(x, k, 1, 0))
        out = conv2d(S.space_to_depth(x), S.s2d_kernel_s1(k), 1, 0)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_s2_to_s2d(self):
        x, k = _rand((2, 16, 16, 3)), _rand((3, 3, 3, 5), 2)
        ref = S.space_to_depth(conv2d(x, k, 2, 1))
        out = conv2d(S.space_to_depth(x), S.s2d_kernel_s2_s2d(k), 2, 1)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_s2_to_plain(self):
        x, k = _rand((2, 16, 16, 3)), _rand((3, 3, 3, 5), 2)
        ref = conv2d(x, k, 2, 1)
        out = conv2d(
            S.space_to_depth(x), S.s2d_kernel_s2_plain(k), 1, ((1, 0), (1, 0))
        )
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestStemPrefix:
    def test_darknet53_full(self, mini):
        assert M._s2d_stem_prefix(mini[0].plan) == 4

    def test_csp_partial(self):
        model = YOLOv3(ModelConfig(num_classes=2, layer_config=MINI_CSP_LAYERS))
        assert M._s2d_stem_prefix(model.plan) == 2

    def test_tiny_no_match(self):
        model = YOLOv3(
            ModelConfig(num_classes=2, backbone="yolov3_tiny", strides=(32, 16))
        )
        assert M._s2d_stem_prefix(model.plan) == 0


class TestEndToEnd:
    def _fwd(self, model, params, stats, x, flag, train):
        return M.apply(
            model.plan, params, stats, x,
            activation=model.cfg.activation, train=train,
            compute_dtype=jnp.float32, s2d_stem=flag,
        )

    def test_train_forward_and_stats_match(self, mini):
        model, params, stats = mini
        x = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
        )
        f = jax.jit(
            lambda flag: self._fwd(model, params, stats, x, flag, True),
            static_argnums=0,
        )
        p1, ns1 = f(True)
        p0, ns0 = f(False)
        for a, b in zip(p1, p0):
            np.testing.assert_allclose(a, b, atol=5e-3)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4), ns1, ns0
        )

    def test_eval_forward_matches(self, mini):
        model, params, stats = mini
        x = jnp.asarray(
            np.random.default_rng(2).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
        )
        f = jax.jit(
            lambda flag: self._fwd(model, params, stats, x, flag, False)[0],
            static_argnums=0,
        )
        for a, b in zip(f(True), f(False)):
            np.testing.assert_allclose(a, b, atol=5e-3)

    def test_folded_inference_consistent_with_eval_apply(self, mini):
        """Folded inference (plain stem) matches eval-mode apply (s2d stem):
        the two code paths cross-check each other's stem layouts."""
        model, params, stats = mini
        folded = model.fold(params, stats)
        x = jnp.asarray(
            np.random.default_rng(3).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
        )
        ref, _ = jax.jit(
            lambda: self._fwd(model, params, stats, x, True, False)
        )()
        out = jax.jit(
            lambda: M.apply_inference(
                model.plan, folded, x,
                activation=model.cfg.activation, compute_dtype=jnp.float32,
            )
        )()
        for a, b in zip(out, ref):
            np.testing.assert_allclose(a, b, atol=5e-3)

    def test_stem_gradients_match(self, mini):
        """Gradients land on the canonical stem weights identically either
        way. Checked on the stem in isolation: through the FULL mini model a
        sum-of-squares logit loss amplifies f32 reassociation noise by the
        train-BN condition number (~1e6), which would swamp any real signal
        of a transform bug; stem-local grads isolate the transform itself."""
        from yolo_for_turbines_tpu.models.blocks import (
            apply_conv_block,
            get_activation,
        )

        model, params, stats = mini
        plan4, p4, s4 = model.plan[:4], params[:4], stats[:4]
        act = get_activation("leaky_relu")
        x = jnp.asarray(
            np.random.default_rng(4).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
        )

        def cb(p, s, t, stride, padding):
            y, _ = apply_conv_block(
                p, s, t, stride=stride, padding=padding, activation=act,
                train=True, compute_dtype=jnp.float32,
            )
            return y

        def plain(p):
            t = cb(p[0]["conv"], s4[0]["conv"], x, 1, 1)
            t = cb(p[1]["conv"], s4[1]["conv"], t, 2, 1)
            bp, bs = p[2]["blocks"][0], s4[2]["blocks"][0]
            y = cb(bp["conv1"], bs["conv1"], t, 1, 0)
            y = cb(bp["conv2"], bs["conv2"], y, 1, 1)
            t = t + y
            return cb(p[3]["conv"], s4[3]["conv"], t, 2, 1)

        def s2d(p):
            t, _ = M._apply_stem_s2d(plan4, p, s4, x, act, True, jnp.float32)
            return t

        def loss(fn):
            return lambda p: jnp.sum(jnp.square(fn(p)))

        g0 = jax.jit(jax.grad(loss(plain)))(p4)
        g1 = jax.jit(jax.grad(loss(s2d)))(p4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-3),
            g0, g1,
        )

    def test_csp_stem_matches(self):
        model = YOLOv3(ModelConfig(num_classes=2, layer_config=MINI_CSP_LAYERS))
        params, stats = model.init(jax.random.PRNGKey(5))
        x = jnp.asarray(
            np.random.default_rng(5).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
        )
        f = jax.jit(
            lambda flag: M.apply(
                model.plan, params, stats, x, activation="leaky_relu",
                train=False, compute_dtype=jnp.float32, s2d_stem=flag,
            )[0],
            static_argnums=0,
        )
        for a, b in zip(f(True), f(False)):
            np.testing.assert_allclose(a, b, atol=5e-3)

    def test_indivisible_size_falls_back(self):
        """H not divisible by 4: the gate in apply() must skip the s2d stem
        (space_to_depth would crash reshaping odd dims) and still produce
        the plain-path outputs. Uses a stride-4 single-head plan so an
        18px input is shape-valid while failing the %4 check."""
        layers = ((4, 3, 1), (8, 3, 2), ("B", 1), (16, 3, 2), (8, 1, 1),
                  (16, 3, 1), "S")
        model = YOLOv3(
            ModelConfig(num_classes=2, layer_config=layers, strides=(4,))
        )
        assert M._s2d_stem_prefix(model.plan) == 4
        params, stats = model.init(jax.random.PRNGKey(7))
        x = jnp.asarray(
            np.random.default_rng(7).uniform(0, 1, (2, 18, 18, 3)), jnp.float32
        )
        f = jax.jit(
            lambda flag: M.apply(
                model.plan, params, stats, x, activation="leaky_relu",
                train=True, compute_dtype=jnp.float32, s2d_stem=flag,
            )[0],
            static_argnums=0,
        )
        for a, b in zip(f(True), f(False)):
            np.testing.assert_allclose(a, b, atol=1e-6)
        assert M._s2d_stem_prefix(()) == 0
