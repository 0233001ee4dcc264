"""Model shape + structure tests (reference: code/model_tests.py:16-66)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_for_turbines_tpu.config import ModelConfig
from yolo_for_turbines_tpu.models import yolov3
from yolo_for_turbines_tpu.models.blocks import (
    apply_conv_block,
    fold_conv_bn,
    init_conv,
    leaky_relu,
    mish,
    upsample2x,
)


def test_conv_block_shapes():
    rng = jax.random.PRNGKey(0)
    p, s = init_conv(rng, 3, 32, 3)
    x = jnp.zeros((2, 16, 16, 3))
    y, _ = apply_conv_block(
        p, s, x, stride=1, padding=1, activation=leaky_relu, compute_dtype=jnp.float32
    )
    assert y.shape == (2, 16, 16, 32)
    y, _ = apply_conv_block(
        p, s, x, stride=2, padding=1, activation=leaky_relu, compute_dtype=jnp.float32
    )
    assert y.shape == (2, 8, 8, 32)


def test_conv_block_matches_torch_conv_bn():
    """Numerical parity of conv+BN eval vs torch's Conv2d+BatchNorm2d."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    in_ch, out_ch, k = 4, 8, 3
    x = rng.normal(0, 1, (2, 10, 10, in_ch)).astype(np.float32)
    w = rng.normal(0, 0.2, (k, k, in_ch, out_ch)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, out_ch).astype(np.float32)
    bias = rng.normal(0, 0.2, out_ch).astype(np.float32)
    mean = rng.normal(0, 0.2, out_ch).astype(np.float32)
    var = rng.uniform(0.5, 1.5, out_ch).astype(np.float32)

    p = {"w": jnp.asarray(w), "scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    s = {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}
    got, _ = apply_conv_block(
        p, s, jnp.asarray(x), stride=1, padding=1,
        activation=lambda v: v, compute_dtype=jnp.float32,
    )

    conv = torch.nn.Conv2d(in_ch, out_ch, k, padding=1, bias=False)
    conv.weight.data = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())
    bn = torch.nn.BatchNorm2d(out_ch).eval()
    bn.weight.data = torch.from_numpy(scale)
    bn.bias.data = torch.from_numpy(bias)
    bn.running_mean.data = torch.from_numpy(mean)
    bn.running_var.data = torch.from_numpy(var)
    with torch.no_grad():
        want = bn(conv(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())))
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_fold_conv_bn_equivalence():
    rng = jax.random.PRNGKey(1)
    p, s = init_conv(rng, 3, 16, 3)
    s = {"mean": s["mean"] + 0.3, "var": s["var"] * 1.7}
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 3))
    y_bn, _ = apply_conv_block(
        p, s, x, stride=1, padding=1, activation=lambda v: v,
        compute_dtype=jnp.float32,
    )
    from yolo_for_turbines_tpu.models.blocks import conv2d

    folded = fold_conv_bn(p, s)
    y_folded = conv2d(x, folded["w"], 1, 1) + folded["b"]
    np.testing.assert_allclose(np.asarray(y_bn), np.asarray(y_folded), atol=1e-4)


def test_upsample2x():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample2x(x)
    assert y.shape == (1, 4, 4, 1)
    want = [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]]
    np.testing.assert_array_equal(np.asarray(y[0, :, :, 0]), want)


def test_mish_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.linspace(-5, 5, 101).astype(np.float32)
    got = np.asarray(mish(jnp.asarray(x)))
    want = torch.nn.Mish()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.parametrize("num_classes", [80, 2])
def test_yolov3_output_shapes(num_classes):
    """Forward contract: 3 tensors (B, 3, S, S, 5+C), S in {size/32, /16, /8}
    (reference: code/model.py:349-351)."""
    model = yolov3.YOLOv3(ModelConfig(num_classes=num_classes))
    params, stats = model.init(jax.random.PRNGKey(0))
    size = 128  # small multiple of 32 to keep CPU tests fast
    x = jnp.zeros((1, size, size, 3))
    preds, _ = model.apply(params, stats, x, compute_dtype=jnp.float32)
    assert len(preds) == 3
    for stride, p in zip((32, 16, 8), preds):
        s = size // stride
        assert p.shape == (1, 3, s, s, 5 + num_classes)


def test_param_count_matches_reference():
    """~62M params for 80 classes (reference: README + model.py:345)."""
    model = yolov3.YOLOv3(ModelConfig(num_classes=80))
    params, _ = model.init(jax.random.PRNGKey(0))
    n = yolov3.param_count(params)
    assert 61_000_000 < n < 62_500_000


def test_csp_backbone_shapes():
    from helpers import MINI_CSP_LAYERS

    model = yolov3.YOLOv3(
        ModelConfig(num_classes=2, layer_config=MINI_CSP_LAYERS)
    )
    params, stats = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 128, 128, 3))
    preds, _ = model.apply(params, stats, x, compute_dtype=jnp.float32)
    assert [p.shape for p in preds] == [
        (1, 3, 4, 4, 7),
        (1, 3, 8, 8, 7),
        (1, 3, 16, 16, 7),
    ]


def test_train_mode_updates_batch_stats():
    from helpers import mini_model

    model = mini_model(num_classes=2)
    params, stats = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    _, new_stats = model.apply(params, stats, x, train=True, compute_dtype=jnp.float32)
    before = stats[0]["conv"]["mean"]
    after = new_stats[0]["conv"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_shifted_bn_moments_stable():
    """Shifted single-pass variance (blocks.bn_batch_moments with the
    running mean as shift) is exact algebra — same moments as numpy's
    two-pass on benign data — and stays accurate where the unshifted
    E[x^2]-E[x]^2 catastrophically cancels (|mean| >> std)."""
    import numpy as np

    from yolo_for_turbines_tpu.models.blocks import bn_batch_moments

    rng = np.random.default_rng(0)
    # benign scale: shifted == unshifted == numpy
    y = rng.normal(0.5, 2.0, (4, 8, 8, 16)).astype(np.float32)
    m_ref = y.reshape(-1, 16).mean(0)
    v_ref = y.reshape(-1, 16).var(0)
    for shift in [None, np.asarray(m_ref * 0.9, np.float32)]:
        mean, var = bn_batch_moments(jnp.asarray(y), None if shift is None else jnp.asarray(shift))
        np.testing.assert_allclose(np.asarray(mean), m_ref, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(var), v_ref, rtol=1e-3)

    # hostile scale: mean 1000, std 1 — cancellation regime
    y = rng.normal(1000.0, 1.0, (4, 16, 16, 8)).astype(np.float32)
    v_ref = y.reshape(-1, 8).astype(np.float64).var(0)
    shift = np.full((8,), 1000.0, np.float32)  # what the running mean tracks
    _, v_shifted = bn_batch_moments(jnp.asarray(y), jnp.asarray(shift))
    np.testing.assert_allclose(np.asarray(v_shifted), v_ref, rtol=1e-3)
