"""Drive the hermetic StableHLO serving export on the real TPU chip.

tests/test_serving.py proves the bundle/export surface on CPU (bitwise
bundle round-trip, exported-vs-live equality, multi-platform lowering);
this driver closes the remaining seam: the SAME .jaxexport blob a C++/PJRT
binary would load actually *executes on TPU hardware*, agrees with the
live Predictor, and serves at a competitive rate — for BOTH serving modes:

- bf16: the baseline apples-to-apples config (B=128).
- int8 PTQ: the framework's FASTEST serving mode (quantize -> bundle with
  both trees -> portable pure-XLA int8 export -> ExportedPredictor), at
  B=128 and at the measured int8 sweet spot B=384 (RESULTS.md "int8 batch
  sweep"). The deployment artifact for the best config is what a user
  actually ships (reference hand-off seam: code/demo.py:16-21).

Bundles are REBUILT from scratch every run (the round-3 advisor flagged
that reusing a pre-existing /tmp bundle can silently A/B against blobs
lowered from older model code), and the blob size is read via the
manifest's export index, never a directory glob.

Usage (TPU host): python benchmarks/serve_export_tpu.py [--mode bf16|int8|both]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def throughput(f, iters=15, warmup=3):
    for _ in range(warmup):
        r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def build_and_run(live, batch, out, label):
    """Fresh bundle -> export -> execute on chip -> A/B vs `live`."""
    from yolo_for_turbines_tpu.serving import (
        ExportedPredictor,
        add_export_to_bundle,
        save_predictor,
    )

    bundle = Path(out)
    if bundle.exists():
        shutil.rmtree(bundle)  # never A/B against a stale blob
    save_predictor(live, bundle)
    blob_path = add_export_to_bundle(
        bundle, batch_size=batch, image_size=416, platforms=("cpu", "tpu")
    )
    manifest = json.loads((bundle / "manifest.json").read_text())
    name = blob_path.name
    assert name in manifest["exports"], "export must be manifest-indexed"
    exported = ExportedPredictor(bundle, name=name)

    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.uniform(0, 1, (batch, 416, 416, 3)), jnp.float32)
    # bf16 feed is the standard bf16 serving config; the int8 path
    # requantizes its input from whatever dtype arrives, so the live side
    # must see the SAME f32 tensor as the export or the input int8 codes
    # (round(x/s)) differ at bf16-rounding boundaries and pollute the A/B
    quantized = bool(manifest["exports"][name]["quantized"])
    xbf = x32 if quantized else x32.astype(jnp.bfloat16)

    ek, em = exported.predict_batch(x32)
    lk, lm = live.predict_batch(xbf)
    ek, em, lk, lm = map(np.asarray, (ek, em, lk, lm))

    # the export runs the pure-XLA NMS/resblock twins of the live Pallas
    # kernels; survivors should agree up to bf16 score-tie reordering
    mask_agree = float((em == lm).mean())
    both = em.astype(bool) & lm.astype(bool)
    box_mad = float(np.abs(ek[both] - lk[both]).max()) if both.any() else 0.0

    t_exp = throughput(lambda: exported.predict_batch(x32))
    t_live = throughput(lambda: live.predict_batch(xbf))

    print(json.dumps({
        "mode": label,
        "platform": jax.devices()[0].platform,
        "batch": batch,
        "quantized_export": bool(manifest["exports"][name]["quantized"]),
        "mask_agreement": round(mask_agree, 5),
        "kept_box_max_abs_diff": round(box_mad, 5),
        "exported_img_per_sec": round(batch / t_exp, 1),
        "live_img_per_sec": round(batch / t_live, 1),
        "export_bytes": (bundle / "exports" / name).stat().st_size,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["bf16", "int8", "both"], default="both")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--int8-batches", type=int, nargs="*", default=[128, 384])
    args = ap.parse_args()

    from yolo_for_turbines_tpu.config import ModelConfig
    from yolo_for_turbines_tpu.inference import Predictor
    from yolo_for_turbines_tpu.models.yolov3 import YOLOv3

    model = YOLOv3(ModelConfig(num_classes=80))
    params, stats = model.init(jax.random.PRNGKey(0))
    folded = model.fold(params, stats)

    if args.mode in ("bf16", "both"):
        live = Predictor(model, folded, image_size=416, use_pallas_nms=True)
        build_and_run(live, args.batch, "/tmp/serve_export_bf16", "bf16")

    if args.mode in ("int8", "both"):
        rng = np.random.default_rng(1)
        calib = rng.uniform(0, 1, (8, 416, 416, 3)).astype(np.float32)
        live8 = Predictor(model, folded, image_size=416, use_pallas_nms=True)
        live8.quantize(calib)
        for b in args.int8_batches:
            build_and_run(live8, b, f"/tmp/serve_export_int8_b{b}", "int8")


if __name__ == "__main__":
    main()
