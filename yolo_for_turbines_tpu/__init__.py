"""TPU-native YOLOv3 framework (JAX / XLA / Pallas / pjit).

A brand-new implementation of the capabilities of the PyTorch reference
GabeTsai/YOLO-For-Turbines, designed TPU-first:

- functional model over parameter pytrees, NHWC layout, bf16 compute
- on-device decode + fixed-shape class-aware NMS (Pallas IoU kernel)
- host-side numpy/PIL data pipeline with bucketed multi-scale shapes
- data-parallel training via jax.sharding.Mesh + jit sharding annotations
"""

__version__ = "0.1.0"
