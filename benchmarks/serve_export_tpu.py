"""Drive the hermetic StableHLO serving export on the real TPU chip.

tests/test_serving.py proves the bundle/export surface on CPU (bitwise
bundle round-trip, exported-vs-live equality, multi-platform lowering);
this driver closes the remaining seam: the SAME .jaxexport blob a C++/PJRT
binary would load actually *executes on TPU hardware*, agrees with the
live Predictor, and serves at a competitive rate.

Flow: synthetic 80-class weights -> save_predictor_bundle ->
add_export_to_bundle(batch, 416, platforms=(cpu,tpu)) ->
ExportedPredictor.predict_batch on the chip vs the live bf16 Predictor
(Pallas NMS) on the same batch -> survivor agreement + pipelined
throughput for both.

Usage (TPU host): python benchmarks/serve_export_tpu.py
"""

from __future__ import annotations

import json
import os
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


def main(batch: int = 128, out: str = "/tmp/serve_export_bundle"):
    from yolo_for_turbines_tpu.config import ModelConfig
    from yolo_for_turbines_tpu.inference import Predictor
    from yolo_for_turbines_tpu.models.yolov3 import YOLOv3
    from yolo_for_turbines_tpu.serving import (
        ExportedPredictor,
        add_export_to_bundle,
        save_predictor,
    )

    model = YOLOv3(ModelConfig(num_classes=80))
    params, stats = model.init(jax.random.PRNGKey(0))
    folded = model.fold(params, stats)
    live = Predictor(model, folded, image_size=416, use_pallas_nms=True)

    bundle = Path(out)
    if not (bundle / "manifest.json").exists():
        save_predictor(live, bundle)
        add_export_to_bundle(bundle, batch_size=batch, image_size=416,
                             platforms=("cpu", "tpu"))
    exported = ExportedPredictor(bundle)

    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.uniform(0, 1, (batch, 416, 416, 3)), jnp.float32)
    xbf = x32.astype(jnp.bfloat16)

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
        "platform": jax.devices()[0].platform,
        "batch": batch,
        "mask_agreement": round(mask_agree, 5),
        "kept_box_max_abs_diff": round(box_mad, 5),
        "exported_img_per_sec": round(batch / t_exp, 1),
        "live_img_per_sec": round(batch / t_live, 1),
        "export_bytes": (bundle / "exports").glob("*.jaxexport").__next__().stat().st_size,
    }))


if __name__ == "__main__":
    main()
