"""Data layer tests: COCO parsing, augmentations, padded batch loader."""

import json
import os

import numpy as np
import pytest

from tests.make_fixtures import make_coco_dataset
from yolo_ms_tpu.data.augment import (
    EvalTransform,
    TrainAugment,
    coco_to_xyxy,
    horizontal_flip,
    letterbox,
    mosaic4,
    normalize_imagenet,
    resize_linear,
    xyxy_to_norm_cxcywh,
)
from yolo_ms_tpu.data.coco import CocoDetectionDataset
from yolo_ms_tpu.data.loader import DetectionLoader


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco"))
    images_dir, ann_path = make_coco_dataset(root, num_images=8, num_classes=3)
    return images_dir, ann_path


class TestCocoDataset:
    def test_parse_and_load(self, coco_dir):
        images_dir, ann_path = coco_dir
        ds = CocoDetectionDataset(images_dir, ann_path, num_classes=3, verbose=False)
        assert len(ds) == 8
        img, boxes, labels = ds[0]
        assert img.dtype == np.uint8 and img.shape[2] == 3
        assert boxes.shape[1] == 4 and len(boxes) == len(labels)
        assert labels.min() >= 0 and labels.max() < 3

    def test_category_truncation(self, coco_dir):
        """num_classes < |categories| keeps the first N ids (dataset.py:52-63)."""
        images_dir, ann_path = coco_dir
        ds = CocoDetectionDataset(images_dir, ann_path, num_classes=2, verbose=False)
        for i in range(len(ds)):
            _, _, labels = ds[i]
            assert (labels < 2).all()

    def test_missing_image_filtered(self, coco_dir, tmp_path):
        images_dir, ann_path = coco_dir
        with open(ann_path) as f:
            coco = json.load(f)
        coco["images"].append(
            {"id": 999, "file_name": "missing.jpg", "width": 10, "height": 10}
        )
        bad = tmp_path / "ann_bad.json"
        bad.write_text(json.dumps(coco))
        ds = CocoDetectionDataset(images_dir, str(bad), num_classes=3, verbose=False)
        assert len(ds) == 8  # missing file dropped (dataset.py:69-81)

    def test_missing_paths_raise(self, coco_dir):
        images_dir, ann_path = coco_dir
        with pytest.raises(FileNotFoundError):
            CocoDetectionDataset(images_dir, "/nope.json", verbose=False)
        with pytest.raises(NotADirectoryError):
            CocoDetectionDataset("/nope_dir", ann_path, verbose=False)


class TestAugment:
    def test_box_conversions_roundtrip(self):
        xywh = np.asarray([[10, 20, 30, 40]], np.float32)
        xyxy = coco_to_xyxy(xywh)
        np.testing.assert_allclose(xyxy, [[10, 20, 40, 60]])
        norm = xyxy_to_norm_cxcywh(xyxy, 100, 200)
        np.testing.assert_allclose(norm, [[0.25, 0.2, 0.3, 0.2]], atol=1e-6)

    def test_horizontal_flip_boxes(self):
        img = np.zeros((10, 20, 3), np.uint8)
        boxes = np.asarray([[2.0, 1.0, 8.0, 5.0]], np.float32)
        _, flipped = horizontal_flip(img, boxes)
        np.testing.assert_allclose(flipped, [[12, 1, 18, 5]])

    def test_resize_scales_boxes(self):
        img = np.zeros((100, 200, 3), np.uint8)
        boxes = np.asarray([[20.0, 10.0, 100.0, 60.0]], np.float32)
        out, b = resize_linear(img, boxes, 50, 100)
        assert out.shape == (50, 100, 3)
        np.testing.assert_allclose(b, [[10, 5, 50, 30]])

    def test_letterbox_preserves_aspect(self):
        img = np.full((100, 200, 3), 50, np.uint8)
        boxes = np.asarray([[0.0, 0.0, 200.0, 100.0]], np.float32)
        out, b, r, (px, py) = letterbox(img, boxes, 64, 64)
        assert out.shape == (64, 64, 3)
        assert r == 64 / 200
        assert py == (64 - 32) // 2
        np.testing.assert_allclose(b, [[0, py, 64, py + 32]])

    def test_normalize(self):
        img = np.full((4, 4, 3), 255, np.uint8)
        out = normalize_imagenet(img)
        np.testing.assert_allclose(
            out[0, 0], (1.0 - np.asarray([0.485, 0.456, 0.406])) / [0.229, 0.224, 0.225],
            rtol=1e-5,
        )

    def test_train_augment_deterministic(self, coco_dir):
        images_dir, ann_path = coco_dir
        ds = CocoDetectionDataset(images_dir, ann_path, num_classes=3, verbose=False)
        img, boxes_xywh, labels = ds[0]
        boxes = coco_to_xyxy(boxes_xywh)
        aug = TrainAugment(
            {"hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "fliplr": 0.5,
             "translate": 0.1, "scale": 0.5},
            (128, 128),
        )
        a1 = aug(img.copy(), boxes.copy(), labels.copy(), np.random.default_rng(7))
        a2 = aug(img.copy(), boxes.copy(), labels.copy(), np.random.default_rng(7))
        np.testing.assert_array_equal(a1[0], a2[0])
        np.testing.assert_allclose(a1[1], a2[1])

    def test_eval_transform_shapes(self, coco_dir):
        images_dir, ann_path = coco_dir
        ds = CocoDetectionDataset(images_dir, ann_path, num_classes=3, verbose=False)
        img, boxes_xywh, labels = ds[0]
        tr = EvalTransform((96, 160))
        out, b, l = tr(img, coco_to_xyxy(boxes_xywh), labels)
        assert out.shape == (96, 160, 3)
        if len(b):
            assert b[:, 0::2].max() <= 160 and b[:, 1::2].max() <= 96

    def test_mosaic(self, coco_dir):
        images_dir, ann_path = coco_dir
        ds = CocoDetectionDataset(images_dir, ann_path, num_classes=3, verbose=False)
        samples = []
        for i in range(4):
            img, bx, lb = ds[i]
            samples.append((img, coco_to_xyxy(bx), lb))
        canvas, boxes, labels = mosaic4(samples, np.random.default_rng(0), 128)
        assert canvas.shape == (256, 256, 3)
        assert len(boxes) == len(labels)
        if len(boxes):
            assert boxes[:, 0::2].max() <= 256 and boxes[:, 1::2].max() <= 256


class TestLoader:
    def test_padded_batches(self, coco_dir):
        images_dir, ann_path = coco_dir
        ds = CocoDetectionDataset(images_dir, ann_path, num_classes=3, verbose=False)
        loader = DetectionLoader(
            ds, batch_size=4, img_size=(128, 128), max_gt=16, is_train=True,
            augmentation={"fliplr": 0.5, "mosaic": 0.5}, num_workers=1,
        )
        assert len(loader) == 2
        batches = list(loader.epoch(0))
        assert len(batches) == 2
        for b in batches:
            assert b["images"].shape == (4, 128, 128, 3)
            assert b["boxes"].shape == (4, 16, 4)
            assert b["labels"].shape == (4, 16)
            assert b["mask"].shape == (4, 16)
            assert b["images"].dtype == np.float32
            # normalized cxcywh in [0, 1]
            valid_boxes = b["boxes"][b["mask"]]
            if len(valid_boxes):
                assert valid_boxes.min() >= 0.0 and valid_boxes.max() <= 1.0

    def test_epoch_determinism_and_resume(self, coco_dir):
        images_dir, ann_path = coco_dir
        ds = CocoDetectionDataset(images_dir, ann_path, num_classes=3, verbose=False)
        loader = DetectionLoader(
            ds, batch_size=4, img_size=(64, 64), max_gt=8, is_train=True,
            augmentation={"fliplr": 0.5}, num_workers=1,
        )
        run1 = [b["images"] for b in loader.epoch(3)]
        run2 = [b["images"] for b in loader.epoch(3)]
        for a, b in zip(run1, run2):
            np.testing.assert_array_equal(a, b)
        # resume from step 1 reproduces the tail exactly
        tail = [b["images"] for b in loader.epoch(3, start_step=1)]
        np.testing.assert_array_equal(run1[1], tail[0])
        # different epoch shuffles differently
        other = [b["images"] for b in loader.epoch(4)]
        assert not np.array_equal(run1[0], other[0])

    def test_multiscale_sizes_deterministic_and_resumable(self, coco_dir):
        """Multi-scale training: per-block square sizes from the configured
        set, identical across re-runs (multi-host consistency comes from the
        same (seed, epoch, block)-keyed draw) and across mid-epoch resume."""
        images_dir, ann_path = coco_dir
        ds = CocoDetectionDataset(images_dir, ann_path, num_classes=3, verbose=False)
        loader = DetectionLoader(
            ds, batch_size=2, img_size=(64, 64), max_gt=8, is_train=True,
            augmentation={}, num_workers=1,
            multiscale_sizes=[32, 64, 96], multiscale_interval=2,
        )
        sizes1 = [b["images"].shape[1:3] for b in loader.epoch(0)]
        sizes2 = [b["images"].shape[1:3] for b in loader.epoch(0)]
        assert sizes1 == sizes2
        for h, w in sizes1:
            assert h == w and h in (32, 64, 96)
        # blocks of multiscale_interval batches share one size
        for i in range(0, len(sizes1) - 1, 2):
            assert sizes1[i] == sizes1[i + 1]
        # boxes stay normalized regardless of canvas size
        for b in loader.epoch(0):
            valid = b["boxes"][b["mask"]]
            if len(valid):
                assert valid.min() >= 0.0 and valid.max() <= 1.0
        # resume re-derives the same absolute-index sizes
        tail = [b["images"].shape[1:3] for b in loader.epoch(0, start_step=1)]
        assert tail == sizes1[1:]
        # several epochs hit more than one size overall
        all_sizes = {h for h, _ in sizes1}
        for e in range(1, 4):
            all_sizes |= {b["images"].shape[1] for b in loader.epoch(e)}
        assert len(all_sizes) > 1

    def test_multiscale_rejects_non_stride32(self, coco_dir):
        images_dir, ann_path = coco_dir
        ds = CocoDetectionDataset(images_dir, ann_path, num_classes=3, verbose=False)
        with pytest.raises(ValueError):
            DetectionLoader(
                ds, batch_size=2, img_size=(64, 64), is_train=True,
                multiscale_sizes=[48],
            )

    def test_val_loader_keeps_short_batch(self, coco_dir):
        images_dir, ann_path = coco_dir
        ds = CocoDetectionDataset(images_dir, ann_path, num_classes=3, verbose=False)
        loader = DetectionLoader(
            ds, batch_size=5, img_size=(64, 64), is_train=False, num_workers=1,
        )
        batches = list(loader.epoch(0))
        assert len(batches) == 2
        assert batches[-1]["num_valid"] == 3
        assert batches[-1]["images"].shape[0] == 5  # padded to full batch
