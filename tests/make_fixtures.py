"""Synthetic COCO-format dataset generator for tests and smoke training.

Draws solid rectangles (one per class color) on noise backgrounds so a
detector can actually learn/detect something; writes a COCO-style
annotations JSON + JPEG images.
"""

from __future__ import annotations

import json
import os

import numpy as np

CLASS_COLORS = [
    (220, 40, 40),
    (40, 220, 40),
    (40, 40, 220),
    (220, 220, 40),
]


def make_coco_dataset(
    root: str,
    num_images: int = 8,
    num_classes: int = 3,
    img_w: int = 320,
    img_h: int = 256,
    max_objects: int = 3,
    seed: int = 0,
):
    """Returns (images_dir, annotations_path)."""
    import cv2

    rng = np.random.default_rng(seed)
    images_dir = os.path.join(root, "images")
    os.makedirs(images_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, num_images + 1):
        img = rng.integers(60, 120, (img_h, img_w, 3), dtype=np.uint8)
        n_obj = int(rng.integers(1, max_objects + 1))
        for _ in range(n_obj):
            cls = int(rng.integers(num_classes))
            w = int(rng.integers(40, img_w // 2))
            h = int(rng.integers(40, img_h // 2))
            x = int(rng.integers(0, img_w - w))
            y = int(rng.integers(0, img_h - h))
            color = CLASS_COLORS[cls % len(CLASS_COLORS)]
            img[y : y + h, x : x + w] = color
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": cls + 1,
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "area": float(w * h),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
        fname = f"img_{img_id:04d}.jpg"
        cv2.imwrite(os.path.join(images_dir, fname), img[:, :, ::-1])
        images.append(
            {"id": img_id, "file_name": fname, "width": img_w, "height": img_h}
        )

    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": c + 1, "name": f"shape_{c}"} for c in range(num_classes)
        ],
    }
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump(coco, f)
    return images_dir, ann_path
