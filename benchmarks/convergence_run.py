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
    ap.add_argument("--early-stop", type=int, default=30)
    ap.add_argument("--num-workers", type=int, default=8)
    args = ap.parse_args()

    from yolo_for_turbines_tpu.config import TrainConfig
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
    )
    model_dir = root / "models"
    model_dir.mkdir(parents=True, exist_ok=True)

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
    )
    wall = time.time() - t0

    metrics_file = (
        model_dir / f"YOLOv3_Turbine_Detection_{args.identifier}_metrics.jsonl"
    )
    traj = []
    if metrics_file.exists():
        for line in open(metrics_file):
            row = json.loads(line)
            if "mAP" in row:
                traj.append(row["mAP"])
    print(json.dumps({
        "best_mAP": best,
        "mAP_trajectory": [round(m, 4) for m in traj],
        "wall_clock_s": round(wall, 1),
        "steps": args.max_num_steps,
        "resumed": args.resume,
    }))


if __name__ == "__main__":
    main()
