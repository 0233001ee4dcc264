from .iou import iou_aligned, calc_iou
from .decode import cells_to_boxes, decode_scale
from .nms import non_max_suppression, batched_nms, nms_to_list
from .map import calc_map
