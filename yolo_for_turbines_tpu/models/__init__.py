from .yolov3 import YOLOv3, LAYER_CONFIG, build_plan, init, apply, param_count
from .cspdarknet import CSP_LAYER_CONFIG
