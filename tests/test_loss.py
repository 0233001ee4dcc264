"""Loss tests: masking semantics, gradient flow, zero-loss fixed points."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_for_turbines_tpu.train.loss import total_yolo_loss, yolo_loss


def _setup(rng, b=2, a=3, s=4, c=5):
    preds = jnp.asarray(rng.normal(0, 1, (b, a, s, s, 5 + c)), jnp.float32)
    targets = np.zeros((b, a, s, s, 6), np.float32)
    anchors = np.abs(rng.normal(1.0, 0.3, (a, 2))).astype(np.float32)
    return preds, targets, anchors


def test_all_background(rng):
    preds, targets, anchors = _setup(rng)
    box, obj, noobj, cls = yolo_loss(preds, jnp.asarray(targets), anchors)
    assert float(box) == 0.0 and float(obj) == 0.0 and float(cls) == 0.0
    assert float(noobj) > 0.0


def test_ignore_cells_contribute_nothing(rng):
    preds, targets, anchors = _setup(rng)
    t2 = targets.copy()
    t2[0, 1, 2, 2, 4] = -1  # ignore marker
    l1 = yolo_loss(preds, jnp.asarray(targets), anchors)
    l2 = yolo_loss(preds, jnp.asarray(t2), anchors)
    # ignore cell only leaves the noobj mean (denominator changes slightly)
    assert float(l2[0]) == float(l1[0]) == 0.0
    assert float(l2[2]) != float(l1[2])  # removed from noobj mean


def test_perfect_prediction_box_class_zero(rng):
    preds, targets, anchors = _setup(rng)
    targets[0, 0, 1, 1] = [0.5, 0.5, anchors[0, 0], anchors[0, 1], 1.0, 2.0]
    p = np.asarray(preds).copy()
    p[0, 0, 1, 1, 0:2] = 0.0  # sigmoid(0) = 0.5 = x_cell
    p[0, 0, 1, 1, 2:4] = 0.0  # exp(0)*anchor = anchor = target wh
    p[0, 0, 1, 1, 5:] = -20.0
    p[0, 0, 1, 1, 7] = 20.0  # class 2
    p[0, 0, 1, 1, 4] = 20.0  # sigmoid -> 1.0, iou = 1.0
    box, obj, noobj, cls = yolo_loss(jnp.asarray(p), jnp.asarray(targets), anchors)
    assert float(box) == pytest.approx(0.0, abs=1e-6)
    assert float(cls) == pytest.approx(0.0, abs=1e-6)
    assert float(obj) == pytest.approx(0.0, abs=1e-6)


def test_loss_differentiable_and_finite(rng):
    preds, targets, anchors = _setup(rng)
    targets[0, 0, 1, 1] = [0.3, 0.7, 0.5, 0.5, 1.0, 1.0]
    targets[1, 2, 0, 3, 4] = -1

    def f(p):
        box, obj, noobj, cls = yolo_loss(p, jnp.asarray(targets), anchors)
        return box + obj + noobj + cls

    g = jax.grad(f)(preds)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_total_loss_sums_scales(rng):
    anchors9 = np.abs(rng.normal(1.0, 0.3, (3, 3, 2))).astype(np.float32)
    preds = [
        jnp.asarray(rng.normal(0, 1, (1, 3, s, s, 7)), jnp.float32)
        for s in (4, 8, 16)
    ]
    targets = [jnp.zeros((1, 3, s, s, 6)) for s in (4, 8, 16)]
    total, comps = total_yolo_loss(preds, targets, anchors9)
    assert float(total) == pytest.approx(
        sum(float(v) for v in comps.values()), rel=1e-6
    )
    per_scale = [
        yolo_loss(preds[i], targets[i], anchors9[i]) for i in range(3)
    ]
    want = sum(float(sum(t)) for t in per_scale)
    assert float(total) == pytest.approx(want, rel=1e-6)


def test_loss_weights_applied(rng):
    """lambda weights: box 5, obj 1, noobj 0.5, class 1 (reference
    code/loss.py:24-27)."""
    from yolo_for_turbines_tpu.train import loss as L

    assert (L.LAMBDA_BOX, L.LAMBDA_OBJ, L.LAMBDA_NOOBJ, L.LAMBDA_CLASS) == (
        5.0, 1.0, 0.5, 1.0,
    )


def test_legacy_quirk_mode(rng):
    """Legacy mode reproduces the reference's in-place quirks: raw tx/th in
    the box loss, sigmoid on (ty, tw), raw obj logit vs IoU target."""
    preds, targets, anchors = _setup(rng)
    targets[0, 0, 1, 1] = [0.3, 0.7, 0.5, 0.5, 1.0, 1.0]
    std = yolo_loss(jnp.asarray(preds), jnp.asarray(targets), anchors)
    leg = yolo_loss(jnp.asarray(preds), jnp.asarray(targets), anchors, legacy=True)
    # box and obj terms differ; noobj and class identical
    assert float(std[0]) != float(leg[0])
    assert float(std[1]) != float(leg[1])
    assert float(std[2]) == float(leg[2])
    assert float(std[3]) == float(leg[3])

    import numpy as np

    p = np.asarray(preds)
    t = np.asarray(targets)
    a = np.asarray(anchors).reshape(1, -1, 1, 1, 2)
    sig = lambda v: 1 / (1 + np.exp(-v))
    # hand-computed legacy box loss at the single object cell
    cell_p = p[0, 0, 1, 1]
    box_terms = np.array([cell_p[0], sig(cell_p[1]), sig(cell_p[2]), cell_p[3]])
    tgt = np.array(
        [0.3, 0.7, np.log(1e-16 + 0.5 / a[0, 0, 0, 0, 0]),
         np.log(1e-16 + 0.5 / a[0, 0, 0, 0, 1])]
    )
    want_box = 5.0 * np.mean((box_terms - tgt) ** 2)
    np.testing.assert_allclose(float(leg[0]), want_box, rtol=1e-5)
