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
