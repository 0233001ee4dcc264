"""Drive the FULL trainer to a converged mAP on real TPU hardware.

The one reference capability never previously demonstrated on-chip
(reference: code/train.py:158-239 trained to mAP 0.45, README.md:40): this
script runs `train()` end to end — multi-scale buckets, fused C++ augmenter
+ image cache, every-10th-epoch fused device eval, 25% checkpoints, early
stop — on a synthetic shape-detection dataset
(yolo_for_turbines_tpu/data/synthetic.py) until mAP converges, and supports
a mid-run resume from the written checkpoint to prove checkpoint/resume on
hardware.

Usage (on the TPU host):
  python benchmarks/convergence_run.py --max-num-steps 1650          # run 1
  python benchmarks/convergence_run.py --max-num-steps 3300 --resume # run 2

Prints the mAP trajectory parsed from the metrics JSONL at the end.
Results are recorded in benchmarks/RESULTS.md ("TPU convergence run").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/convergence")
    ap.add_argument("--num-images", type=int, default=416)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--max-num-steps", type=int, default=3300)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--identifier", default="conv_r3")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the run's best checkpoint")
    ap.add_argument("--no-multi-scale", action="store_true")
    ap.add_argument("--warmup", type=float, default=0.05,
                    help="warmup fraction of max_num_steps (the default "
                         "TrainConfig 0.01 is ~9 steps at 900 total; "
                         "lr=1e-3 needs a few epochs of warmup from "
                         "random init, see RESULTS.md shakedown)")
    ap.add_argument("--decay-lr", action="store_true",
                    help="warmup + cosine decay (stabilizes late epochs; "
                         "constant post-warmup lr=1e-3 oscillates on the "
                         "354-image overfit)")
    ap.add_argument("--mosaic", action="store_true")
    ap.add_argument("--freeze-backbone", action="store_true",
                    help="the reference's PRIMARY recipe (code/train.py:"
                         "166-177): import a darknet53.conv.74 backbone "
                         "(synthetic here — zero egress) and fine-tune with "
                         "the backbone frozen; after training, asserts every "
                         "frozen leaf is BITWISE unchanged in the written "
                         "checkpoint")
    ap.add_argument("--early-stop", type=int, default=30)
    ap.add_argument("--num-workers", type=int, default=8)
    args = ap.parse_args()

    from yolo_for_turbines_tpu.config import ModelConfig, TrainConfig
    from yolo_for_turbines_tpu.data.splits import create_csv_files
    from yolo_for_turbines_tpu.data.synthetic import generate_synthetic_dataset
    from yolo_for_turbines_tpu.train.trainer import train

    root = Path(args.root)
    if not (root / "train.csv").exists():
        print("generating synthetic dataset ...", flush=True)
        generate_synthetic_dataset(root, num_images=args.num_images)
        create_csv_files(
            root / "images", root / "labels", root,
            {"train": 0.85, "val": 0.15}, image_ext=".jpg",
        )

    tc = TrainConfig(
        lr=args.lr,
        batch_size=args.batch_size,
        max_num_steps=args.max_num_steps,
        multi_scale=not args.no_multi_scale,
        mosaic=args.mosaic,
        cache_images=True,
        load_checkpoint=args.resume,
        decay_lr=args.decay_lr,
        warmup=args.warmup,
        load_weights=args.freeze_backbone,
        freeze_backbone=args.freeze_backbone,
    )
    model_dir = root / "models"
    model_dir.mkdir(parents=True, exist_ok=True)

    weights_path = None
    if args.freeze_backbone:
        # synthetic stand-in for the official darknet53.conv.74 (egress-
        # blocked): export a deterministic init through the darknet binary
        # format; the loader parses the .conv.74 cutoff from the filename
        # exactly as for the official file (code/model.py:169-170)
        import jax

        from yolo_for_turbines_tpu.models.darknet_weights import (
            export_darknet_weights,
        )
        from yolo_for_turbines_tpu.models.yolov3 import YOLOv3

        weights_path = root / "backbone.conv.74"
        if not weights_path.exists():
            m = YOLOv3(ModelConfig(num_classes=2, activation="mish"))
            p, s = m.init(jax.random.PRNGKey(7))
            # bulk-fetch the tree in ONE device_get (async copies, one
            # barrier) — the exporter converts leaves one at a time, and
            # ~150 individual tiny transfers over the axon tunnel is where
            # the round-4 first attempt hit a transient FAILED_PRECONDITION
            p, s = jax.device_get((p, s))
            export_darknet_weights(m.plan, p, s, str(weights_path))
            print(f"exported synthetic backbone {weights_path}", flush=True)

    t0 = time.time()
    best = train(
        tc,
        root,
        model_dir,
        identifier=args.identifier,
        early_stop=args.early_stop,
        checkpoint_name=f"best_model_{args.identifier}.ckpt",
        image_folder=root / "images",
        annotation_folder=root / "labels",
        num_workers=args.num_workers,
        weights_path=weights_path,
    )
    wall = time.time() - t0

    frozen_ok = None
    if args.freeze_backbone:
        frozen_ok = _check_frozen_leaves(
            tc, weights_path,
            model_dir / f"best_model_{args.identifier}.ckpt",
        )

    metrics_file = (
        model_dir / f"YOLOv3_Turbine_Detection_{args.identifier}_metrics.jsonl"
    )
    traj = []
    if metrics_file.exists():
        for line in open(metrics_file):
            row = json.loads(line)
            if "mAP" in row:
                traj.append(row["mAP"])
    out = {
        "best_mAP": best,
        "mAP_trajectory": [round(m, 4) for m in traj],
        "wall_clock_s": round(wall, 1),
        "steps": args.max_num_steps,
        "resumed": args.resume,
        "mosaic": args.mosaic,
    }
    if frozen_ok is not None:
        out["frozen_leaves_bitwise_unchanged"] = frozen_ok
    print(json.dumps(out))


def _check_frozen_leaves(tc, weights_path, ckpt_path) -> bool:
    """Assert every frozen backbone leaf in the trained checkpoint is
    bitwise identical to the value loaded from the weight file."""
    import jax
    import numpy as np

    from yolo_for_turbines_tpu.config import ModelConfig
    from yolo_for_turbines_tpu.models.darknet_weights import (
        load_darknet_weights,
    )
    from yolo_for_turbines_tpu.models.yolov3 import YOLOv3
    from yolo_for_turbines_tpu.train.checkpoint import load_checkpoint
    from yolo_for_turbines_tpu.train.steps import create_train_state

    model = YOLOv3(ModelConfig(num_classes=2, activation=tc.activation))
    # a DIFFERENT init seed than any training run used: unloaded leaves
    # cannot spuriously match, loaded-and-frozen ones must
    p0, s0 = model.init(jax.random.PRNGKey(1234))
    params_ref, stats_ref, frozen, _ = load_darknet_weights(
        str(weights_path), model.plan, p0, s0, freeze=True
    )
    state, _, _ = create_train_state(
        model, tc, params=params_ref, batch_stats=stats_ref, frozen_mask=frozen
    )
    state = load_checkpoint(state, ckpt_path)

    ref_leaves = jax.tree_util.tree_leaves(params_ref)
    ckpt_leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    mask_leaves = jax.tree_util.tree_leaves(frozen)
    assert len(ref_leaves) == len(ckpt_leaves) == len(mask_leaves)
    n_frozen = 0
    for ref, got, m in zip(ref_leaves, ckpt_leaves, mask_leaves):
        if not m:
            continue
        n_frozen += 1
        if not np.array_equal(np.asarray(ref), np.asarray(got)):
            print(f"FROZEN LEAF CHANGED: shape {np.asarray(ref).shape}",
                  flush=True)
            return False
    assert n_frozen > 0, "freeze mask is empty — nothing was frozen"
    print(f"{n_frozen} frozen leaves bitwise unchanged", flush=True)
    return True


if __name__ == "__main__":
    main()
