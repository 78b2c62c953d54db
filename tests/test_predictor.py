"""Predictor unit tests: detection schema, rescaling, COCO export, sources."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_ms_tpu.infer.predictor import Predictor, draw_detections, find_images
from yolo_ms_tpu.models.registry import build_model, init_model


@pytest.fixture(scope="module")
def predictor():
    m = build_model("n", num_classes=2)
    v = init_model(m, jax.random.PRNGKey(0), (64, 64))
    return Predictor("n", v, num_classes=2, input_size=(64, 64),
                     conf_thresh=0.01, batch_size=2)


def test_predict_image_schema_and_rescale(predictor):
    img = np.random.default_rng(0).integers(0, 255, (128, 256, 3), dtype=np.uint8)
    dets = predictor.predict_image(img)
    for d in dets:
        assert set(d) == {"box_xyxy", "score", "class_id", "class_name"}
        x1, y1, x2, y2 = d["box_xyxy"]
        assert x2 >= x1 and y2 >= y1
        assert 0 <= d["class_id"] < 2


def test_export_coco_json(predictor, tmp_path):
    results = {
        "/x/000123.jpg": [
            {"box_xyxy": [10.0, 20.0, 30.0, 50.0], "score": 0.9,
             "class_id": 1, "class_name": "b"}
        ],
        "/x/photo.png": [
            {"box_xyxy": [0.0, 0.0, 5.0, 5.0], "score": 0.5,
             "class_id": 0, "class_name": "a"}
        ],
    }
    path = str(tmp_path / "dets.json")
    predictor.export_coco_json(results, path, label2cat={0: 7, 1: 9})
    with open(path) as f:
        records = json.load(f)
    assert len(records) == 2
    by_id = {r["image_id"]: r for r in records}
    assert by_id[123]["category_id"] == 9
    assert by_id[123]["bbox"] == [10.0, 20.0, 20.0, 30.0]  # xywh
    assert by_id["photo"]["category_id"] == 7


def test_find_images(tmp_path):
    import cv2

    img = np.zeros((8, 8, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "a.jpg"), img)
    cv2.imwrite(str(tmp_path / "b.png"), img)
    (tmp_path / "notes.txt").write_text("x")
    paths = find_images(str(tmp_path))
    assert len(paths) == 2
    assert find_images(str(tmp_path / "a.jpg")) == [str(tmp_path / "a.jpg")]
    with pytest.raises(FileNotFoundError):
        find_images(str(tmp_path / "missing"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        find_images(str(empty))


def test_draw_detections_marks_pixels():
    img = np.zeros((64, 64, 3), np.uint8)
    out = draw_detections(
        img,
        [{"box_xyxy": [10, 10, 40, 40], "score": 0.8, "class_id": 0,
          "class_name": "a"}],
    )
    assert out.sum() > 0  # green rectangle drawn
    assert img.sum() == 0  # original untouched
