"""Training-stack tests: step mechanics, overfit sanity, checkpoint, trainer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_for_turbines_tpu.config import ModelConfig, TrainConfig
from yolo_for_turbines_tpu.models.yolov3 import YOLOv3
from helpers import mini_model
from yolo_for_turbines_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    make_optimizer,
    warmup_schedule,
)


TINY = dict(num_classes=2)


def _tiny_batch(rng, b=2, size=64):
    images = rng.uniform(0, 1, (b, size, size, 3)).astype(np.float32)
    targets = tuple(
        np.zeros((b, 3, size // s, size // s, 6), np.float32) for s in (32, 16, 8)
    )
    for i in range(b):
        targets[0][i, 0, 1, 1] = [0.5, 0.5, 1.0, 1.0, 1.0, 1.0]
        targets[2][i, 1, 3, 3] = [0.2, 0.8, 0.5, 0.5, 1.0, 0.0]
    anchors = np.abs(rng.normal(1.0, 0.3, (3, 3, 2))).astype(np.float32)
    return jnp.asarray(images), tuple(map(jnp.asarray, targets)), jnp.asarray(anchors)


@pytest.fixture
def setup():
    # function-scoped: train_step donates the state, so a shared TrainState
    # would be invalidated for later tests
    model = mini_model()
    cfg = TrainConfig(
        lr=1e-3, batch_size=2, max_num_steps=100, compute_dtype="float32"
    )
    state, tx, schedule = create_train_state(model, cfg, rng=jax.random.PRNGKey(0))
    return model, cfg, state, tx, schedule


def test_warmup_schedule_shape():
    cfg = TrainConfig(lr=0.1, max_num_steps=1000, warmup=0.01)
    sched = warmup_schedule(cfg)
    # optax computes (init-end)*(1-frac) + end in f32; cancellation leaves
    # ~4% error at the 1e-7 scale -- tolerance reflects that
    assert float(sched(0)) == pytest.approx(0.1 * 1e-6, rel=0.1)
    assert float(sched(10)) == pytest.approx(0.1, rel=1e-3)
    assert float(sched(500)) == pytest.approx(0.1, rel=1e-3)


def test_train_step_updates_params_and_stats(setup, rng):
    model, cfg, state, tx, _ = setup
    step = make_train_step(model, tx, cfg)
    x, y, anchors = _tiny_batch(rng)
    state0_param = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    ).copy()
    new_state, metrics = step(state, x, y, anchors)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert set(metrics) == {
        "loss", "box_loss", "obj_loss", "no_obj_loss", "class_loss",
    }
    after = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    assert not np.allclose(state0_param, after)


def test_overfit_tiny_batch(rng):
    """Loss decreases markedly when overfitting one batch (sanity of grads,
    schedule, and optimizer wiring)."""
    model = mini_model()
    cfg = TrainConfig(
        lr=1e-3, max_num_steps=200, warmup_enabled=False,
        compute_dtype="float32", weight_decay=0.0,
    )
    state, tx, _ = create_train_state(model, cfg, rng=jax.random.PRNGKey(1))
    step = make_train_step(model, tx, cfg)
    x, y, anchors = _tiny_batch(rng)
    first = None
    for i in range(30):
        state, metrics = step(state, x, y, anchors)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.2, (first, last)


def test_frozen_mask_blocks_updates(rng):
    model = mini_model()
    cfg = TrainConfig(lr=1e-2, max_num_steps=10, compute_dtype="float32")
    params, stats = model.init(jax.random.PRNGKey(0))
    # freeze the stem conv only
    frozen = jax.tree_util.tree_map(lambda _: False, params)
    frozen[0]["conv"] = {k: True for k in params[0]["conv"]}
    state, tx, _ = create_train_state(
        model, cfg, params=params, batch_stats=stats, frozen_mask=frozen
    )
    # snapshot before the step: the step donates (and deletes) state buffers
    w0_before = np.asarray(state.params[0]["conv"]["w"]).copy()
    w1_before = np.asarray(state.params[1]["conv"]["w"]).copy()
    step = make_train_step(model, tx, cfg)
    x, y, anchors = _tiny_batch(rng)
    new_state, _ = step(state, x, y, anchors)
    np.testing.assert_array_equal(
        np.asarray(new_state.params[0]["conv"]["w"]), w0_before
    )
    assert not np.allclose(np.asarray(new_state.params[1]["conv"]["w"]), w1_before)


def test_eval_step_no_mutation(setup, rng):
    model, cfg, state, tx, _ = setup
    estep = make_eval_step(model, cfg)
    x, y, anchors = _tiny_batch(rng)
    metrics = estep(state, x, y, anchors)
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path, setup, rng):
    model, cfg, state, tx, _ = setup
    from yolo_for_turbines_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    step = make_train_step(model, tx, cfg)
    x, y, anchors = _tiny_batch(rng)
    state1, _ = step(state, x, y, anchors)
    save_checkpoint(state1, tmp_path / "ckpt")

    state2, _, _ = create_train_state(model, cfg, rng=jax.random.PRNGKey(7))
    restored = load_checkpoint(state2, tmp_path / "ckpt")
    assert int(restored.step) == int(state1.step)
    a = jax.tree_util.tree_leaves(state1.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
