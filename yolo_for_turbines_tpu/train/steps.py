"""Compiled train/eval steps: optax SGD + warmup, donated state, DP sharding.

TPU-first replacements for the reference's loop internals
(reference: code/train.py:34-92):

- AMP autocast + GradScaler -> bf16 compute with f32 params/BN/loss. bf16 has
  f32's exponent range, so no loss scaling is needed.
- optimizer.zero_grad/backward/step -> one jitted `train_step` with donated
  state (params update in place in HBM, no copy).
- warmup LinearLR -> an optax schedule (linear 1e-6*lr -> lr over
  warmup*max_num_steps steps, then constant; reference code/train.py:186-189).
- backbone freezing -> optax.masked zero-updates over the importer's frozen
  mask (reference sets requires_grad=False, code/model.py:306-309).
- data parallelism -> the step is jitted with the batch sharded over the
  mesh's "data" axis and state replicated; XLA inserts the gradient
  all-reduce over ICI (no NCCL/DDP analogue needed).

One compiled executable exists per image-size bucket (multi-scale training's
7 sizes, reference code/config.py:43-45) -- shapes are static per bucket.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..models.yolov3 import YOLOv3
from .loss import total_yolo_loss


class TrainState(NamedTuple):
    """Replicated training state (a pytree; donated through train_step)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def warmup_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Linear warmup from 1e-6 * lr to lr (reference: code/train.py:186-189);
    optional cosine decay afterwards when cfg.decay_lr."""
    if not cfg.warmup_enabled:
        return optax.constant_schedule(cfg.lr)
    warmup_steps = max(1, int(cfg.max_num_steps * cfg.warmup))
    if cfg.decay_lr:
        return optax.warmup_cosine_decay_schedule(
            init_value=cfg.lr * 1e-6,
            peak_value=cfg.lr,
            warmup_steps=warmup_steps,
            decay_steps=cfg.max_num_steps,
        )
    return optax.join_schedules(
        [
            optax.linear_schedule(cfg.lr * 1e-6, cfg.lr, warmup_steps),
            optax.constant_schedule(cfg.lr),
        ],
        [warmup_steps],
    )


def make_optimizer(
    cfg: TrainConfig, frozen_mask=None
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """SGD + momentum + coupled weight decay (torch SGD semantics:
    grad += wd * param before the momentum buffer; reference
    code/train.py:171-172), with optional frozen-leaf masking."""
    schedule = warmup_schedule(cfg)
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(schedule, momentum=cfg.momentum),
    )
    if frozen_mask is not None and any(jax.tree_util.tree_leaves(frozen_mask)):
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), frozen_mask),
            tx,
        )
    return tx, schedule


def create_train_state(
    model: YOLOv3, cfg: TrainConfig, rng=None, params=None, batch_stats=None,
    frozen_mask=None,
) -> Tuple[TrainState, optax.GradientTransformation, optax.Schedule]:
    if params is None:
        params, batch_stats = model.init(rng)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None,
        batch_stats,
        is_leaf=lambda x: x is None,
    )
    tx, schedule = make_optimizer(cfg, frozen_mask)
    opt_state = tx.init(params)
    state = TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))
    return state, tx, schedule


def make_train_step(model: YOLOv3, tx, cfg: TrainConfig, mesh=None):
    """Build the jitted train step.

    Signature: step(state, images, targets3, scaled_anchors) ->
    (state, metrics dict). When a mesh is given, inputs are expected sharded
    on the "data" axis and the state replicated (pjit-style annotations).
    """
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def step(state: TrainState, images, targets, scaled_anchors):
        def loss_fn(params):
            preds, new_stats = model.apply(
                params,
                state.batch_stats,
                images,
                train=True,
                compute_dtype=compute_dtype,
            )
            total, comps = total_yolo_loss(preds, targets, scaled_anchors)
            return total, (new_stats, comps)

        (total, (new_stats, comps)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        metrics = dict(comps)
        metrics["loss"] = total
        return new_state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, data, (data, data, data), repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model: YOLOv3, cfg: TrainConfig, mesh=None):
    """Jitted forward + loss (no grad) for validation epochs
    (reference: code/train.py:94-156)."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def step(state: TrainState, images, targets, scaled_anchors):
        preds, _ = model.apply(
            state.params,
            state.batch_stats,
            images,
            train=False,
            compute_dtype=compute_dtype,
        )
        total, comps = total_yolo_loss(preds, targets, scaled_anchors)
        metrics = dict(comps)
        metrics["loss"] = total
        return metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, data, (data, data, data), repl),
            out_shardings=repl,
        )
    return jax.jit(step)


def make_forward_eval(model: YOLOv3, cfg: TrainConfig):
    """Jitted inference forward returning raw predictions (for accuracy /
    mAP eval); batch-stats eval mode."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def fwd(state: TrainState, images):
        preds, _ = model.apply(
            state.params,
            state.batch_stats,
            images,
            train=False,
            compute_dtype=compute_dtype,
        )
        return preds

    return fwd
