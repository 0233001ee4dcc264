from .loss import yolo_loss, total_yolo_loss
