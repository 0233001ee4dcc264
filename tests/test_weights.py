"""Darknet binary importer tests.

The official yolov3.weights is not shippable, so parity is anchored three
ways: (a) export->load round-trips exactly; (b) an independent sequential
parser re-reads the file per the documented darknet layout and matches the
loaded pytree; (c) the plan's expected float count for 80 classes equals the
official yolov3.weights payload ((248007048 bytes - 20-byte header) / 4 =
62001757 floats).
"""

import numpy as np
import pytest

import jax

from yolo_for_turbines_tpu.config import ModelConfig
from yolo_for_turbines_tpu.models import yolov3
from yolo_for_turbines_tpu.models.darknet_weights import (
    expected_num_floats,
    export_darknet_weights,
    load_darknet_weights,
    parse_cutoff,
)


from helpers import mini_model


@pytest.fixture(scope="module")
def small_model():
    # mini 1/8-width model: the importer walks plan structure, so cutoff/
    # round-trip/freeze semantics are fully exercised without 62M params
    model = mini_model(num_classes=2)
    params, stats = model.init(jax.random.PRNGKey(0))
    return model, params, stats


def test_parse_cutoff():
    assert parse_cutoff("weights/darknet53.conv.74") == 74
    assert parse_cutoff("yolov3.weights") is None


def test_expected_floats_match_official_yolov3_weights():
    model = yolov3.YOLOv3(ModelConfig(num_classes=80))
    assert expected_num_floats(model.plan) == 62_001_757


def test_roundtrip_exact(tmp_path, small_model):
    model, params, stats = small_model
    path = tmp_path / "test.weights"
    export_darknet_weights(model.plan, params, stats, str(path))

    params2, stats2 = model.init(jax.random.PRNGKey(99))
    loaded_p, loaded_s, frozen, consumed = load_darknet_weights(
        str(path), model.plan, params2, stats2
    )
    assert consumed == expected_num_floats(model.plan)

    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded_p)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sa = jax.tree_util.tree_leaves(
        stats, is_leaf=lambda x: x is None
    )
    sb = jax.tree_util.tree_leaves(loaded_s, is_leaf=lambda x: x is None)
    for a, b in zip(sa, sb):
        if a is None:
            assert b is None
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_independent_sequential_parse(tmp_path, small_model):
    """Re-read the exported file with a from-scratch parser following the
    documented darknet order (BN beta,gamma,mean,var then conv OIHW) and
    check the first stem conv + first head bias conv."""
    model, params, stats = small_model
    path = tmp_path / "test.weights"
    export_darknet_weights(model.plan, params, stats, str(path))

    raw = np.fromfile(path, dtype=np.float32)[5:]  # skip int32 header
    # Stem conv: nf filters, 3 in, 3x3, with BN
    nf = 4
    off = 0
    beta, off = raw[off : off + nf], off + nf
    gamma, off = raw[off : off + nf], off + nf
    mean, off = raw[off : off + nf], off + nf
    var, off = raw[off : off + nf], off + nf
    w = raw[off : off + nf * 3 * 9].reshape(nf, 3, 3, 3)

    stem_p, stem_s = params[0]["conv"], stats[0]["conv"]
    np.testing.assert_array_equal(beta, np.asarray(stem_p["bias"]))
    np.testing.assert_array_equal(gamma, np.asarray(stem_p["scale"]))
    np.testing.assert_array_equal(mean, np.asarray(stem_s["mean"]))
    np.testing.assert_array_equal(var, np.asarray(stem_s["var"]))
    np.testing.assert_array_equal(
        w.transpose(2, 3, 1, 0), np.asarray(stem_p["w"])
    )


def test_cutoff_skips_but_advances(tmp_path, small_model):
    """cutoff=4 = first 2 convs (BN id + conv id each) loaded; layer 3+ kept
    at init (parity with reference code/model.py:277-291 counting)."""
    model, params, stats = small_model
    path = tmp_path / "dummy.conv.4"
    export_darknet_weights(model.plan, params, stats, str(path))

    params2, stats2 = model.init(jax.random.PRNGKey(123))
    orig2 = jax.tree_util.tree_map(np.asarray, params2)
    loaded_p, _, _, consumed = load_darknet_weights(
        str(path), model.plan, params2, stats2
    )
    # file fully parsed even past cutoff
    assert consumed == expected_num_floats(model.plan)
    # conv 1 (plan[0]) and conv 2 (plan[1]) loaded
    np.testing.assert_array_equal(
        np.asarray(loaded_p[0]["conv"]["w"]), np.asarray(params[0]["conv"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(loaded_p[1]["conv"]["w"]), np.asarray(params[1]["conv"]["w"])
    )
    # conv 3 (first residual block conv1) NOT loaded -> still init values
    np.testing.assert_array_equal(
        np.asarray(loaded_p[2]["blocks"][0]["conv1"]["w"]),
        orig2[2]["blocks"][0]["conv1"]["w"],
    )


def test_freeze_mask_marks_loaded_layers(tmp_path, small_model):
    model, params, stats = small_model
    path = tmp_path / "dummy.conv.4"
    export_darknet_weights(model.plan, params, stats, str(path))
    params2, stats2 = model.init(jax.random.PRNGKey(5))
    _, _, frozen, _ = load_darknet_weights(
        str(path), model.plan, params2, stats2, freeze=True
    )
    assert frozen[0]["conv"]["w"] is True
    assert frozen[2]["blocks"][0]["conv1"]["w"] is False

    # freeze=False -> nothing frozen
    params3, stats3 = model.init(jax.random.PRNGKey(6))
    _, _, frozen2, _ = load_darknet_weights(
        str(path), model.plan, params3, stats3, freeze=False
    )
    assert not any(jax.tree_util.tree_leaves(frozen2))
