"""Shared test fixtures: a 1/8-width mini YOLOv3 through the same layer DSL.

Same topology as the full model (5 downsamples, routes at the two 8-block
stages, 3 heads) so every code path is exercised, but ~1% of the params --
keeps CPU jit compiles and step times fast.
"""

MINI_LAYERS = (
    (4, 3, 1),
    (8, 3, 2),
    ("B", 1),
    (16, 3, 2),
    ("B", 2),
    (32, 3, 2),
    ("B", 8),
    (64, 3, 2),
    ("B", 8),
    (128, 3, 2),
    ("B", 4),
    (64, 1, 1),
    (128, 3, 1),
    "S",
    (32, 1, 1),
    "U",
    (32, 1, 1),
    (64, 3, 1),
    "S",
    (16, 1, 1),
    "U",
    (16, 1, 1),
    (32, 3, 1),
    "S",
)


def mini_model(num_classes: int = 2, activation: str = "leaky_relu"):
    from yolo_for_turbines_tpu.config import ModelConfig
    from yolo_for_turbines_tpu.models.yolov3 import YOLOv3

    return YOLOv3(
        ModelConfig(
            num_classes=num_classes,
            activation=activation,
            layer_config=MINI_LAYERS,
        )
    )


# CSP variant of the mini model (("C", n) stages; same routes/heads).
MINI_CSP_LAYERS = tuple(
    ("C", e[1]) if isinstance(e, tuple) and e[0] == "B" else e
    for e in MINI_LAYERS
)
