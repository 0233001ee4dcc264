"""Serving bundles: a pickle-free deployment artifact for trained detectors.

The reference ships its demo model as a pickled full torch module downloaded
from Google Drive (reference: code/demo.py:16-21) -- unversioned, code-coupled,
and unloadable anywhere torch class paths drift. The TPU-native deployment
story is a directory bundle that is (a) pure data -- a JSON manifest plus
npz tensors, no pickle, no code objects -- and (b) optionally *hermetic*: a
serialized StableHLO module (`jax.export`) of the full serve pipeline
(folded forward -> decode -> NMS) that any PJRT runtime can execute without
this package's Python on the serving host.

Layout of a bundle directory:

    bundle/
      manifest.json      # format version, model config, predictor knobs,
                         # pytree specs, export index
      folded.npz         # full-precision folded conv weights (f32, host)
      quantized.npz      # optional: int8 PTQ tree (models/quantize.py)
      exports/*.jaxexport  # optional: serialized StableHLO serve modules

Weights travel at full precision; the load path re-applies the exact same
compute-dtype cast the live `Predictor` does, so a bundle round-trip is
bit-identical to the in-process pipeline (asserted in tests/test_serving.py).
"""

from __future__ import annotations

import dataclasses
import functools
import json
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import config as cfg
from .inference import Predictor
from .models.yolov3 import YOLOv3

FORMAT_VERSION = 1

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "float32": jnp.float32,
}


# ---------------------------------------------------------------------------
# Pytree <-> (JSON spec, npz leaves) codec
# ---------------------------------------------------------------------------
# The folded / quantized parameter trees are plan-aligned nests of lists,
# dicts, arrays, and the occasional static python scalar. jax treedefs are
# not serializable, so the bundle stores a JSON skeleton that distinguishes
# containers, static scalars (config baked into the tree), and array leaves
# (stored in the npz by key). bfloat16 arrays are stored as f32 (npz has no
# stable bf16 encoding) and re-cast on load from the recorded dtype.


def tree_to_spec(tree) -> Tuple[dict, dict]:
    """Encode a parameter pytree as (JSON-safe spec, {key: np.ndarray})."""
    leaves: dict = {}

    def rec(t):
        if t is None:
            return {"t": "none"}
        if isinstance(t, dict):
            return {"t": "dict", "k": {k: rec(v) for k, v in t.items()}}
        if isinstance(t, (list, tuple)):
            return {
                "t": "list" if isinstance(t, list) else "tuple",
                "v": [rec(v) for v in t],
            }
        if isinstance(t, bool):
            return {"t": "bool", "v": t}
        if isinstance(t, int) and not isinstance(t, np.generic):
            return {"t": "int", "v": t}
        if isinstance(t, float) and not isinstance(t, np.generic):
            return {"t": "float", "v": t}
        if isinstance(t, str):
            return {"t": "str", "v": t}
        a = np.asarray(t)  # device arrays come back to host here
        key = f"L{len(leaves):05d}"
        orig = a.dtype.name
        if a.dtype == np.dtype(jnp.bfloat16):
            a = a.astype(np.float32)
        leaves[key] = a
        return {"t": "arr", "key": key, "dtype": orig}

    return rec(tree), leaves


def spec_to_tree(spec: dict, leaves):
    """Inverse of `tree_to_spec`; array leaves come back as numpy (bf16 via
    ml_dtypes when that was the stored dtype)."""

    def rec(s):
        t = s["t"]
        if t == "none":
            return None
        if t == "dict":
            return {k: rec(v) for k, v in s["k"].items()}
        if t in ("list", "tuple"):
            out = [rec(v) for v in s["v"]]
            return out if t == "list" else tuple(out)
        if t in ("bool", "int", "float", "str"):
            return s["v"]
        a = np.asarray(leaves[s["key"]])
        if s["dtype"] != a.dtype.name:
            a = a.astype(np.dtype(jnp.bfloat16) if s["dtype"] == "bfloat16"
                         else np.dtype(s["dtype"]))
        return a

    return rec(spec)


def _tuplify(x):
    """JSON round-trips tuples as lists; ModelConfig needs hashable tuples."""
    return tuple(_tuplify(v) for v in x) if isinstance(x, list) else x


# ---------------------------------------------------------------------------
# Save / load
# ---------------------------------------------------------------------------


def save_predictor(pred: Predictor, path) -> Path:
    """Write `pred` (bf16 and, if quantized, int8 trees) as a bundle dir.

    Overwriting an existing bundle resets the manifest's exports index, so
    any prior exports/*.jaxexport blobs (lowered from the OLD weights) are
    deleted rather than left orphaned on disk where a glob could pick them
    up (round-3 advisor finding)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    if (path / "exports").is_dir():
        import shutil

        shutil.rmtree(path / "exports")

    folded_spec, folded_leaves = tree_to_spec(pred._folded_input)
    np.savez(path / "folded.npz", **folded_leaves)

    manifest = {
        "format_version": FORMAT_VERSION,
        "framework": "yolo_for_turbines_tpu",
        "model": dataclasses.asdict(pred.model.cfg),
        "predictor": {
            "anchors": np.asarray(pred.anchors).tolist(),
            "image_size": pred.image_size,
            "conf_threshold": pred.conf_threshold,
            "nms_iou_threshold": pred.nms_iou_threshold,
            "max_boxes": pred.max_boxes,
            "compute_dtype": np.dtype(pred.compute_dtype).name,
        },
        "folded_spec": folded_spec,
        "exports": {},
    }

    qparams = getattr(pred, "_qparams", None)
    if qparams is not None:
        q_spec, q_leaves = tree_to_spec(qparams)
        np.savez(path / "quantized.npz", **q_leaves)
        manifest["quantized_spec"] = q_spec

    (path / "manifest.json").write_text(json.dumps(manifest))
    return path


def _device_arrays(tree):
    """Upload every array leaf once. A host-numpy leaf left in a jitted
    argument tree re-transfers on every call over the tunnel (measured
    2850 -> 95 img/s on the int8 path; see CLAUDE.md)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree
    )


def load_predictor_bundle(path, mesh=None, use_pallas_nms: Optional[bool] = None) -> Predictor:
    """Rebuild a live Predictor from a bundle directory.

    The compute-dtype cast happens in Predictor.__init__ exactly as it does
    for an in-process fold, so outputs match the saved predictor bitwise."""
    path = Path(path)
    manifest = json.loads((path / "manifest.json").read_text())
    if manifest["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"bundle format {manifest['format_version']} is newer than this "
            f"framework's {FORMAT_VERSION}"
        )

    m = dict(manifest["model"])
    m["strides"] = _tuplify(m["strides"])
    if m.get("layer_config") is not None:
        m["layer_config"] = _tuplify(m["layer_config"])
    model = YOLOv3(cfg.ModelConfig(**m))

    with np.load(path / "folded.npz") as z:
        folded = spec_to_tree(manifest["folded_spec"], z)

    p = manifest["predictor"]
    if use_pallas_nms is None:
        use_pallas_nms = jax.devices()[0].platform not in ("cpu",)
    pred = Predictor(
        model,
        folded,
        anchors=np.asarray(p["anchors"], np.float32),
        image_size=p["image_size"],
        conf_threshold=p["conf_threshold"],
        nms_iou_threshold=p["nms_iou_threshold"],
        max_boxes=p["max_boxes"],
        compute_dtype=_DTYPES[p["compute_dtype"]],
        use_pallas_nms=use_pallas_nms,
        mesh=mesh,
    )

    if "quantized_spec" in manifest:
        with np.load(path / "quantized.npz") as z:
            pred._qparams = _device_arrays(
                spec_to_tree(manifest["quantized_spec"], z)
            )
    return pred


# ---------------------------------------------------------------------------
# Hermetic StableHLO export (jax.export)
# ---------------------------------------------------------------------------


def _portable_predictor(pred: Predictor) -> Predictor:
    """Clone `pred` onto pure-XLA paths: no Pallas NMS, no Pallas residual
    fusion. Mosaic kernels only lower on a live TPU backend, so a portable
    multi-platform export must stay on the XLA formulations (which are
    exact-arithmetic twins of the fused kernels)."""
    portable = Predictor(
        YOLOv3(dataclasses.replace(pred.model.cfg, fuse_resblocks=False)),
        pred._folded_input,
        anchors=pred.anchors,
        image_size=pred.image_size,
        conf_threshold=pred.conf_threshold,
        nms_iou_threshold=pred.nms_iou_threshold,
        max_boxes=pred.max_boxes,
        compute_dtype=pred.compute_dtype,
        use_pallas_nms=False,
    )
    # pin the int8 path to pure XLA too: its fused-kernel router gates on
    # jax.default_backend() at trace time, which is the EXPORT host's
    # backend, not the serving platform (round-3 advisor finding)
    portable._portable_int8 = True
    if getattr(pred, "_qparams", None) is not None:
        portable._qparams = pred._qparams
    return portable


def export_serving_module(
    pred: Predictor,
    batch_size: int,
    image_size: Optional[int] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> bytes:
    """Serialize the full serve pipeline (forward -> decode -> NMS) for one
    (batch, size) bucket as a portable StableHLO module.

    Parameters stay a call-time argument (not baked-in constants), so the
    blob is ~1 MB of program rather than 250 MB of weights; pair it with the
    bundle's npz. Call signature of the deserialized module:
    `call(params, x)` with x (B, S, S, 3) f32 in [0, 1] ->
    ((B, K, 6) boxes, (B, K) mask)."""
    portable = _portable_predictor(pred)
    image_size = image_size or pred.image_size
    params = getattr(portable, "_qparams", None) or portable.folded_params

    fn = jax.jit(
        functools.partial(portable._pipeline, image_size=image_size)
    )
    sds = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
        if isinstance(a, (jnp.ndarray, np.ndarray))
        else a,
        params,
    )
    x_sds = jax.ShapeDtypeStruct(
        (batch_size, image_size, image_size, 3), jnp.float32
    )
    exported = jax.export.export(fn, platforms=list(platforms))(sds, x_sds)
    return exported.serialize()


def add_export_to_bundle(
    bundle_path,
    batch_size: int,
    image_size: Optional[int] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> Path:
    """Export one (batch, size) serve bucket into an existing bundle and
    index it in the manifest."""
    bundle_path = Path(bundle_path)
    manifest = json.loads((bundle_path / "manifest.json").read_text())
    pred = load_predictor_bundle(bundle_path, use_pallas_nms=False)
    image_size = image_size or pred.image_size
    blob = export_serving_module(pred, batch_size, image_size, platforms)
    (bundle_path / "exports").mkdir(exist_ok=True)
    name = f"serve_b{batch_size}_s{image_size}.jaxexport"
    (bundle_path / "exports" / name).write_bytes(blob)
    manifest.setdefault("exports", {})[name] = {
        "batch_size": batch_size,
        "image_size": image_size,
        "platforms": list(platforms),
        "quantized": "quantized_spec" in manifest,
    }
    (bundle_path / "manifest.json").write_text(json.dumps(manifest))
    return bundle_path / "exports" / name


class ExportedPredictor:
    """Serve from a bundle's StableHLO export: no model code runs at call
    time, only the deserialized module + the bundle's weights.

    In-process this still goes through jax; the same .jaxexport blob is
    what a C++/PJRT serving binary would load."""

    def __init__(self, bundle_path, name: Optional[str] = None):
        bundle_path = Path(bundle_path)
        manifest = json.loads((bundle_path / "manifest.json").read_text())
        exports = manifest.get("exports") or {}
        if not exports:
            raise ValueError(f"{bundle_path} has no exports; run add_export_to_bundle")
        if name is None:
            if len(exports) > 1:
                raise ValueError(f"multiple exports {sorted(exports)}; pass name=")
            name = next(iter(exports))
        self.meta = exports[name]
        self._exported = jax.export.deserialize(
            (bundle_path / "exports" / name).read_bytes()
        )
        # identical param materialization to the live Predictor so dtypes
        # match the exported calling convention; the EXPORT's own recorded
        # quantized flag picks the tree (not whichever tree happens to
        # exist in the bundle — a bundle re-saved with different trees
        # would otherwise fail with an opaque pytree-flatten error)
        pred = load_predictor_bundle(bundle_path, use_pallas_nms=False)
        if self.meta.get("quantized"):
            self._params = getattr(pred, "_qparams", None)
            if self._params is None:
                raise ValueError(
                    f"export {name} was lowered for the int8 tree but "
                    f"{bundle_path} has no quantized.npz"
                )
        else:
            self._params = pred.folded_params

    def predict_batch(self, x) -> Tuple[np.ndarray, np.ndarray]:
        """x: (B, S, S, 3) f32 in [0, 1] with B, S matching the export."""
        kept, mask = self._exported.call(
            self._params, jnp.asarray(x, jnp.float32)
        )
        return kept, mask
