"""Native C++ decode/resize loader tests (skipped until native/build.sh)."""

import os

import numpy as np
import pytest

from yolo_ms_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="libyolodata.so not built (run native/build.sh)"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    img[100:200, 150:350] = (255, 0, 0)
    jp, pp = str(d / "t.jpg"), str(d / "t.png")
    cv2.imwrite(jp, img[:, :, ::-1])
    cv2.imwrite(pp, img[:, :, ::-1])
    return img, jp, pp


def test_png_decode_exact(images):
    img, _, pp = images
    got = nl.decode(pp)
    np.testing.assert_array_equal(got, img)


def test_jpeg_decode_matches_cv2(images):
    import cv2

    _, jp, _ = images
    got = nl.decode(jp)
    ref = cv2.cvtColor(cv2.imread(jp), cv2.COLOR_BGR2RGB)
    assert got.shape == ref.shape
    # libjpeg vs libjpeg: identical output
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_resize_matches_cv2_inter_linear(images):
    import cv2

    img, _, pp = images
    got = nl.decode_resize(pp, 240, 320)
    ref = cv2.resize(img, (320, 240), interpolation=cv2.INTER_LINEAR)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_batch_and_error_slots(images):
    _, jp, pp = images
    out = nl.decode_resize_batch([jp, pp, "/nonexistent.jpg"], 64, 64, 2)
    assert out.shape == (3, 64, 64, 3)
    assert out[0].max() > 0 and out[1].max() > 0
    assert out[2].max() == 0  # failed slot zero-filled


def test_missing_file_returns_none():
    assert nl.decode("/definitely/missing.jpg") is None
    assert nl.decode_resize("/definitely/missing.jpg", 32, 32) is None


def test_loader_native_eval_batch_parity(tmp_path_factory, monkeypatch):
    """DetectionLoader's whole-batch native eval path must produce the same
    batches as the per-sample Python fallback (images within resize-rounding
    tolerance, targets exact)."""
    from tests.make_fixtures import make_coco_dataset
    from yolo_ms_tpu.data.coco import CocoDetectionDataset
    from yolo_ms_tpu.data.loader import DetectionLoader

    root = str(tmp_path_factory.mktemp("coco_native"))
    images_dir, ann_path = make_coco_dataset(root, num_images=6, num_classes=3)
    ds = CocoDetectionDataset(images_dir, ann_path, num_classes=3, verbose=False)

    def make(batches_native: bool):
        if not batches_native:
            monkeypatch.setattr(nl, "available", lambda: False)
        else:
            monkeypatch.undo()
        loader = DetectionLoader(
            ds,
            batch_size=4,
            img_size=(96, 96),
            max_gt=8,
            is_train=False,
            num_workers=2,
            device_normalize=True,
        )
        return list(loader.epoch(0))

    fast = make(True)
    slow = make(False)
    assert len(fast) == len(slow) == 2
    for bf, bs in zip(fast, slow):
        assert bf["num_valid"] == bs["num_valid"]
        np.testing.assert_array_equal(bf["mask"], bs["mask"])
        np.testing.assert_array_equal(bf["labels"], bs["labels"])
        np.testing.assert_allclose(bf["boxes"], bs["boxes"], atol=1e-5)
        diff = np.abs(bf["images"].astype(int) - bs["images"].astype(int))
        # JPEG fixtures: the native path decodes with libjpeg DCT prescale
        # (reduced-scale IDCT) before the bilinear resize — a deliberate,
        # documented approximation vs cv2's full decode + INTER_LINEAR, so
        # pixels agree closely but not exactly on noisy JPEG content.
        assert diff.mean() <= 6.0, f"mean pixel diff {diff.mean():.2f}"
        assert diff.max() <= 64
