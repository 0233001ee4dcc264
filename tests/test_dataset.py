"""Dataset / augmentation / splits tests (reference: code/dataset_test.py,
code/utils_test.py:42-58).

Uses synthetic PNG images + label txts written to tmp dirs.
"""

import numpy as np
import pytest
from PIL import Image

from yolo_for_turbines_tpu import config as cfg
from yolo_for_turbines_tpu.data.augment import (
    clip_boxes_min_visibility,
    letterbox,
    set_train_transforms,
    test_transforms,
    unletterbox_boxes,
)
from yolo_for_turbines_tpu.data.dataset import YOLODataset, assign_targets
from yolo_for_turbines_tpu.data.loader import DataLoader, collate, get_loaders
from yolo_for_turbines_tpu.data.mosaic import mosaic_augmentation
from yolo_for_turbines_tpu.data.splits import check_boxes, create_csv_files


@pytest.fixture
def data_dir(tmp_path, rng):
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    for i in range(8):
        img = (rng.uniform(0, 255, (80 + 10 * i, 100, 3))).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"img{i}.png")
        if i < 6:  # two negatives
            boxes = np.array(
                [[0, 0.5, 0.5, 0.2, 0.3], [1, 0.25, 0.25, 0.1, 0.1]]
            )
            np.savetxt(lbl_dir / f"img{i}.txt", boxes, fmt="%.6f", delimiter=" ")
    return tmp_path


def test_letterbox_geometry():
    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.array([[0.5, 0.5, 0.4, 0.6, 0.0]])
    out, b = letterbox(img, boxes, 416)
    assert out.shape == (416, 416, 3)
    # width fills, height centered: scale 416/200, new_h=208, pad 104
    np.testing.assert_allclose(b[0, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(b[0, 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(b[0, 2], 0.4, atol=1e-6)
    np.testing.assert_allclose(b[0, 3], 0.6 * 208 / 416, atol=1e-2)


def test_letterbox_unletterbox_roundtrip():
    boxes = [[0.5, 0.5, 0.2, 0.1, 0.9, 1.0]]
    img = np.zeros((300, 500, 3), np.uint8)
    lb_img, lb_boxes = letterbox(img, np.asarray([b[:4] + [b[5]] for b in boxes]), 416)
    restored = unletterbox_boxes(
        [list(lb_boxes[0][:4]) + [0.9, 1.0]], (300, 500), (416, 416)
    )
    np.testing.assert_allclose(restored[0][:4], boxes[0][:4], atol=5e-3)


def test_clip_min_visibility():
    # box half outside -> visibility 0.5 >= 0.4 -> kept and clipped
    boxes = np.array([[0.0, 0.5, 0.4, 0.4, 1.0]])
    out = clip_boxes_min_visibility(boxes)
    assert len(out) == 1
    np.testing.assert_allclose(out[0, 0], 0.1, atol=1e-6)
    # box 90% outside -> dropped
    boxes = np.array([[-0.16, 0.5, 0.4, 0.4, 1.0]])
    assert len(clip_boxes_min_visibility(boxes)) == 0


def test_assign_targets_reference_semantics():
    anchors = np.asarray(cfg.ANCHORS, np.float64).reshape(-1, 2)
    boxes = [[0.5, 0.5, 0.3, 0.25, 1.0]]
    targets = assign_targets(boxes, anchors, [13, 26, 52])
    # exactly one positive anchor per scale
    for t in targets:
        assert (t[..., 4] == 1).sum() == 1
    # scale 0: cell (6, 6), coords recoverable
    t0 = targets[0]
    a, i, j = np.argwhere(t0[..., 4] == 1)[0]
    assert (i, j) == (6, 6)
    np.testing.assert_allclose(t0[a, i, j, 0], 13 * 0.5 - 6, atol=1e-6)
    np.testing.assert_allclose(t0[a, i, j, 2], 0.3 * 13, atol=1e-5)
    assert t0[a, i, j, 5] == 1.0


def test_assign_targets_ignore_marker():
    # box whose wh has IoU > 0.5 with TWO anchors of the same scale: the
    # best is assigned, the runner-up gets the -1 ignore marker
    # (reference: code/dataset.py:157-161)
    anchors = np.asarray(cfg.ANCHORS, np.float64).reshape(-1, 2)
    boxes = [[0.5, 0.5, 0.12, 0.15, 0.0]]
    targets = assign_targets(boxes, anchors, [13, 26, 52])
    vals = np.concatenate([t[..., 4].ravel() for t in targets])
    assert (vals == 1).sum() == 3  # one anchor per scale
    assert (vals == -1).sum() >= 1  # mid-scale runner-up ignored
    assert (targets[1][..., 4] == -1).sum() >= 1


def test_mosaic_geometry(rng):
    imgs = [(rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8) for _ in range(4)]
    anns = [np.array([[0.5, 0.5, 0.5, 0.5, float(i)]]) for i in range(4)]
    out, boxes = mosaic_augmentation(imgs, anns, 64, rng=rng)
    assert out.shape == (64, 64, 3)
    assert len(boxes) >= 1
    assert np.all(boxes[:, :4] >= 0) and np.all(boxes[:, :4] <= 2.0)


def test_mosaic_no_boxes_sentinel(rng):
    imgs = [(rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8) for _ in range(4)]
    anns = [[] for _ in range(4)]
    out, boxes = mosaic_augmentation(imgs, anns, 64, rng=rng)
    assert out == -1 and boxes == -1


def test_create_csv_and_dataset_roundtrip(data_dir, rng):
    create_csv_files(
        data_dir / "images",
        data_dir / "labels",
        data_dir,
        {"train": 0.5, "val": 0.25, "test": 0.25},
    )
    assert (data_dir / "train.csv").exists()

    ds = YOLODataset(
        csv_split_file=data_dir / "train.csv",
        img_folder=data_dir / "images",
        annotation_folder=data_dir / "labels",
        anchors=cfg.ANCHORS,
        image_size=416,
        grid_sizes=[13, 26, 52],
        num_classes=2,
        transform=test_transforms(416),
    )
    assert len(ds) > 0
    img, targets = ds[0]
    assert img.shape == (416, 416, 3)
    assert img.dtype == np.float32
    assert img.max() <= 1.0
    assert len(targets) == 3
    assert targets[0].shape == (3, 13, 13, 6)


def test_dataset_encode_decode_roundtrip(data_dir):
    """targets -> cells_to_boxes(is_pred=False) -> NMS recovers the GT boxes
    (reference: code/dataset_test.py:13-35)."""
    from yolo_for_turbines_tpu.ops.decode import decode_scale
    from yolo_for_turbines_tpu.ops.nms import non_max_suppression

    create_csv_files(
        data_dir / "images", data_dir / "labels", data_dir,
        {"train": 1.0},
    )
    ds = YOLODataset(
        csv_split_file=data_dir / "train.csv",
        img_folder=data_dir / "images",
        annotation_folder=data_dir / "labels",
        anchors=cfg.ANCHORS,
        image_size=416,
        grid_sizes=[13, 26, 52],
        num_classes=2,
        transform=test_transforms(416),
    )
    # find a positive sample
    for i in range(len(ds)):
        if ds.annotations[i][1] is not None:
            img, targets = ds[i]
            break
    anchors = np.asarray(cfg.ANCHORS, np.float32)
    dec = np.asarray(
        decode_scale(targets[2][None], anchors[2] * 52, 52, is_pred=False)
    )[0]
    kept = non_max_suppression(dec.tolist(), 0.9, 0.5, box_format="center")
    assert 1 <= len(kept) <= 2
    for box in kept:
        assert 0 <= box[0] <= 1 and 0 <= box[1] <= 1


def test_dataloader_batching(data_dir):
    create_csv_files(
        data_dir / "images", data_dir / "labels", data_dir, {"train": 1.0}
    )
    ds = YOLODataset(
        csv_split_file=data_dir / "train.csv",
        img_folder=data_dir / "images",
        annotation_folder=data_dir / "labels",
        anchors=cfg.ANCHORS,
        image_size=128,
        grid_sizes=[4, 8, 16],
        num_classes=2,
        transform=test_transforms(128),
    )
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader)
    x, targets = batches[0]
    assert x.shape == (4, 128, 128, 3)
    assert targets[0].shape == (4, 3, 4, 4, 6)


def test_load_image_jpeg_draft_decode(tmp_path):
    """Oversized JPEGs decode at reduced scale (PIL draft) without breaking
    geometry: the dataset still produces a (size, size) image and valid
    targets — normalized box labels are resolution-independent."""
    img_dir, lbl_dir = tmp_path / "images", tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    big = rng.uniform(0, 255, (1200, 1600, 3)).astype(np.uint8)
    Image.fromarray(big).save(img_dir / "big.jpg", quality=90)
    np.savetxt(lbl_dir / "big.txt", np.array([[0, 0.5, 0.5, 0.25, 0.25]]),
               fmt="%.6f", delimiter=" ")
    create_csv_files(img_dir, lbl_dir, tmp_path, {"train": 1.0},
                     image_ext=".jpg")
    ds = YOLODataset(
        csv_split_file=tmp_path / "train.csv",
        img_folder=img_dir,
        annotation_folder=lbl_dir,
        anchors=cfg.ANCHORS,
        image_size=416,
        grid_sizes=[13, 26, 52],
        num_classes=2,
        transform=test_transforms(416),
    )
    raw = ds.load_image(0)
    assert max(raw.shape[:2]) < 1600  # draft actually reduced the decode
    assert max(raw.shape[:2]) >= 416  # but not below the train size
    img, targets = ds[0]
    assert img.shape == (416, 416, 3)
    assert targets[2][..., 4].max() == 1.0  # the box landed in a cell


def test_dataloader_early_exit_joins_producer(data_dir):
    """Abandoning iteration mid-epoch must not deadlock the producer on a
    full prefetch queue (it blocks in q.put; the stop event has to win)."""
    import threading
    import time

    create_csv_files(
        data_dir / "images", data_dir / "labels", data_dir, {"train": 1.0}
    )
    ds = YOLODataset(
        csv_split_file=data_dir / "train.csv",
        img_folder=data_dir / "images",
        annotation_folder=data_dir / "labels",
        anchors=cfg.ANCHORS,
        image_size=128,
        grid_sizes=[4, 8, 16],
        num_classes=2,
        transform=test_transforms(128),
    )
    # batch_size=1 + tiny queue: the producer outruns the consumer and is
    # guaranteed to be blocked in put() when we bail
    loader = DataLoader(ds, batch_size=1, num_workers=2, prefetch=1)
    it = iter(loader)
    next(it)
    time.sleep(0.3)  # let the producer fill the queue and block
    it.close()  # runs the generator's finally: stop + join

    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not any(
            t.name == "DataLoader-producer" and t.is_alive()
            for t in threading.enumerate()
        ):
            break
        time.sleep(0.05)
    alive = [
        t.name for t in threading.enumerate()
        if t.name == "DataLoader-producer" and t.is_alive()
    ]
    assert not alive, "producer thread leaked after early exit"


def test_multi_scale_change_scale(data_dir):
    create_csv_files(
        data_dir / "images", data_dir / "labels", data_dir, {"train": 1.0}
    )
    ds = YOLODataset(
        csv_split_file=data_dir / "train.csv",
        img_folder=data_dir / "images",
        annotation_folder=data_dir / "labels",
        anchors=cfg.ANCHORS,
        image_size=416,
        grid_sizes=[13, 26, 52],
        num_classes=2,
        transform=set_train_transforms(416, mosaic=False),
        multi_scale=True,
        seed=3,
    )
    ds.change_scale()
    assert ds.image_size in cfg.MULTI_SCALE_TRAIN_SIZES
    img, targets = ds[0]
    assert img.shape == (ds.image_size, ds.image_size, 3)
    assert targets[0].shape == (3, ds.image_size // 32, ds.image_size // 32, 6)


def test_check_boxes(data_dir):
    assert check_boxes(data_dir / "labels", "img0.txt")
    bad = np.array([[0, 1.5, 0.5, 0.2, 0.3]])
    np.savetxt(data_dir / "labels" / "bad.txt", bad, fmt="%.6f")
    assert not check_boxes(data_dir / "labels", "bad.txt")


def test_dataset_rng_thread_safety(data_dir):
    """Concurrent __getitem__ from many threads must not corrupt the shared
    generator (numpy Generators are not thread-safe; the dataset hands each
    item a spawned child under a lock)."""
    from concurrent.futures import ThreadPoolExecutor

    create_csv_files(
        data_dir / "images", data_dir / "labels", data_dir, {"train": 1.0}
    )
    ds = YOLODataset(
        csv_split_file=data_dir / "train.csv",
        img_folder=data_dir / "images",
        annotation_folder=data_dir / "labels",
        anchors=cfg.ANCHORS,
        image_size=96,
        grid_sizes=[3, 6, 12],
        num_classes=2,
        transform=set_train_transforms(96, mosaic=False),
        multi_scale=True,
        seed=1,
    )
    idxs = list(range(len(ds))) * 8
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(ds.__getitem__, idxs))
    for img, targets in results:
        assert img.shape == (96, 96, 3)
        assert np.all(np.isfinite(img))
        for t in targets:
            assert np.all(np.isfinite(t))


def test_dataloader_producer_exception_propagates():
    """A failing __getitem__ (corrupt image, bad label) must surface in the
    consumer as the original exception, not hang q.get() forever."""

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise ValueError("corrupt sample")

    loader = DataLoader(Broken(), batch_size=2, num_workers=2)
    with pytest.raises(ValueError, match="corrupt sample"):
        for _ in loader:
            pass


def test_cache_images_hits_and_matches(data_dir):
    """cache_images=True: second load returns the cached decode (no disk
    read) and identical pixels; multi-scale drafts at the largest bucket."""
    create_csv_files(
        data_dir / "images", data_dir / "labels", data_dir, {"train": 1.0}
    )
    kw = dict(
        csv_split_file=data_dir / "train.csv",
        img_folder=data_dir / "images",
        annotation_folder=data_dir / "labels",
        anchors=cfg.ANCHORS,
        image_size=128,
        grid_sizes=[4, 8, 16],
        num_classes=2,
        transform=test_transforms(128),
    )
    plain = YOLODataset(**kw)
    cached = YOLODataset(**kw, cache_images=True)
    a = cached.load_image(0)
    assert 0 in cached._image_cache
    np.testing.assert_array_equal(a, plain.load_image(0))
    # cache hit: same object back even if the file disappears
    cached.img_folder = data_dir / "nonexistent"
    b = cached.load_image(0)
    assert b is a
    # __getitem__ works off the cache
    img, targets = cached[0]
    assert img.shape == (128, 128, 3)


def test_cache_images_byte_budget(data_dir):
    """The cache stops inserting once cache_images_bytes is reached (no
    eviction), logs one warning, and never exceeds the budget by more than
    one racing worker's image; uncached images still load correctly."""
    create_csv_files(
        data_dir / "images", data_dir / "labels", data_dir, {"train": 1.0}
    )
    kw = dict(
        csv_split_file=data_dir / "train.csv",
        img_folder=data_dir / "images",
        annotation_folder=data_dir / "labels",
        anchors=cfg.ANCHORS,
        image_size=128,
        grid_sizes=[4, 8, 16],
        num_classes=2,
        transform=test_transforms(128),
    )
    one_img = YOLODataset(**kw, cache_images=True).load_image(0).nbytes
    budget = 2 * one_img + one_img // 2  # room for ~2 images, not 3
    ds = YOLODataset(**kw, cache_images=True, cache_images_bytes=budget)
    imgs = [ds.load_image(i) for i in range(len(ds))]
    assert ds._image_cache_nbytes <= budget
    assert 0 < len(ds._image_cache) < len(ds)
    assert ds._cache_full_warned
    # images past the budget still decode (just uncached)
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(im, ds.load_image(i))
    # unbounded opt-out caches everything
    ds_unb = YOLODataset(**kw, cache_images=True, cache_images_bytes=None)
    for i in range(len(ds_unb)):
        ds_unb.load_image(i)
    assert len(ds_unb._image_cache) == len(ds_unb)


def test_splits_cli(data_dir, capsys):
    """`python -m yolo_for_turbines_tpu.data.splits` writes split CSVs
    (reference: code/utils.py:862-863 runs create_csv_files as __main__)."""
    from yolo_for_turbines_tpu.data.splits import main as splits_main

    out = data_dir / "cli_out"
    out.mkdir()
    splits_main([
        "--images", str(data_dir / "images"),
        "--labels", str(data_dir / "labels"),
        "--out", str(out),
        "--train", "0.5", "--val", "0.5", "--test", "0",
    ])
    assert (out / "train.csv").exists() and (out / "val.csv").exists()
    assert not (out / "test.csv").exists()
    rows = (out / "train.csv").read_text().strip().splitlines()
    assert rows and all("," in r for r in rows)
