from .augment import (
    Transform,
    letterbox,
    set_train_transforms,
    test_transforms,
    set_only_image_transforms,
)
from .dataset import YOLODataset, assign_targets
from .mosaic import mosaic_augmentation
from .splits import check_boxes, create_csv_files
from .loader import DataLoader, get_loaders
