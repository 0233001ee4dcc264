"""Host-side plotting of detections (reference: code/utils.py:418-501)."""

from __future__ import annotations

from typing import List, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.patches as patches
import matplotlib.pyplot as plt
import numpy as np
from PIL import Image


def plot_image_with_boxes(
    image, boxes: Sequence[Sequence[float]], class_list: Sequence[str],
    image_name: str = "example", savefig: bool = False,
):
    """Draw [cx, cy, w, h, score, class] boxes (normalized) on an image.

    Returns a PIL image of the rendered figure (parity with
    reference code/utils.py:418-473).
    """
    cmap = plt.get_cmap("tab20b")
    colors = [cmap(i) for i in np.linspace(0, 1, len(class_list))]
    image = np.array(image)
    if len(boxes) == 0:
        return Image.fromarray(image) if image.dtype == np.uint8 else image

    fig, ax = plt.subplots(figsize=(image.shape[1] / 100, image.shape[0] / 100))
    ax.imshow(image)
    im_h, im_w = image.shape[0], image.shape[1]

    for box in boxes:
        x, y, w, h = box[0], box[1], box[2], box[3]
        class_label = int(box[5])
        tl_x, tl_y = (x - w / 2) * im_w, (y - h / 2) * im_h
        rect = patches.Rectangle(
            (tl_x, tl_y),
            w * im_w,
            h * im_h,
            linewidth=max(1, int(0.003 * max(im_h, im_w))),
            edgecolor=colors[class_label],
            facecolor="none",
        )
        ax.add_patch(rect)
        plt.text(
            tl_x - 2,
            tl_y - 2,
            s=class_list[class_label],
            fontsize=max(4, int(0.01 * max(im_h, im_w))),
            color="white",
            bbox={"color": colors[class_label], "pad": 0},
        )

    plt.axis("off")
    plt.subplots_adjust(left=0, right=1, top=1, bottom=0)
    if savefig:
        plt.savefig(f"{image_name}.png", bbox_inches="tight", pad_inches=0)
    fig.canvas.draw()
    img_pil = Image.fromarray(np.array(fig.canvas.renderer.buffer_rgba()))
    plt.close(fig)
    return img_pil


def plot_original(
    original_image, resized_hw, boxes: Sequence[Sequence[float]],
    class_list: Sequence[str],
):
    """Un-letterbox boxes to the original image and plot
    (reference: code/utils.py:475-501)."""
    from ..data.augment import unletterbox_boxes

    o_h, o_w = np.asarray(original_image).shape[:2]
    adjusted = unletterbox_boxes(boxes, (o_h, o_w), resized_hw)
    return plot_image_with_boxes(original_image, adjusted, class_list)
