"""Real-photograph golden tests: full pipeline vs the PyTorch reference.

The reference's closest-to-integration check runs a checked-in photograph
through its model (yolov8/test/test_model.py:19-33, fixture
yolov8/test/sample.png). These tests run the SAME image through both
complete pipelines and pin every stage:

1. ``test_decode_tensor_parity_on_sample_png`` — model forward + decode on
   the real photo: our [1,8400,84] output matches torch within float
   tolerance (the reference's eval contract, yolov8_head.py:115-144).
2. ``test_postprocess_set_equality_on_sample_png`` — conf filter + per-class
   NMS + top-k + rescale (tools/test.py:160-229) on the torch-decoded tensor
   of the real photo: our batched on-device NMS and a numpy transcription of
   the reference tail consume the SAME tensor and must produce the SAME
   detection set. (Feeding both sides one tensor isolates post-process
   semantics from cross-framework float noise: a randomly-initialized model
   has a near-tied score landscape where 1e-5 noise legitimately flips
   greedy-NMS decisions, so end-to-end bitwise set equality across
   frameworks is not a meaningful assertion.)
3. ``test_predictor_end_to_end_on_sample_png`` — our complete serving path
   (decode_image -> resize -> device normalize -> forward -> NMS -> rescale
   -> drawn JPEG + JSON) runs on the photograph and produces sane artifacts
   (tools/test.py:249-273 output contract).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"
SAMPLE = os.path.join(REFERENCE_ROOT, "yolov8", "test", "sample.png")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(SAMPLE), reason="reference sample.png not available"
)


def _load_sample_rgb() -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(SAMPLE).convert("RGB"))


def _preprocessed(resized_u8: np.ndarray) -> np.ndarray:
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    return (resized_u8.astype(np.float32) / 255.0 - mean) / std


def _build_seeded_torch_model(nc=80):
    import torch

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from yolov8.yolov8 import YOLOv8 as TorchYOLO

    torch.manual_seed(0)
    tm = TorchYOLO(version="n", num_classes=nc).eval()
    tm.head.stride = torch.tensor([8.0, 16.0, 32.0])
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)
                mod.weight.uniform_(0.8, 1.2)
                mod.bias.normal_(0, 0.05)
    return tm


def _spread_scores(tm, xt):
    """Make the detection landscape meaningful for the post-process test:
    amplify the final cls convs for spatial variation, then re-center each
    class's logit field over the probe image at -2 so scores span
    ~0.02-0.95 instead of a 0.006-wide tie band."""
    import torch

    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "head.cls" in name and ".2." in name and "weight" in name:
                p.mul_(150.0)
    acts = []
    hooks = [
        lvl[2].register_forward_hook(lambda m, i, o: acts.append(o.detach()))
        for lvl in tm.head.cls
    ]
    with torch.no_grad():
        tm(xt)
    for h in hooks:
        h.remove()
    with torch.no_grad():
        for lvl, a in zip(tm.head.cls, acts):
            lvl[2].bias -= a.mean(dim=(0, 2, 3)) + 2.0


def _reference_postprocess(decoded, orig_hw, conf=0.25, iou=0.45, max_det=300):
    """numpy transcription of the reference inference tail
    (tools/test.py:160-229; torchvision.ops.nms supplied by the greedy numpy
    oracle from tests/test_nms.py)."""
    from test_nms import np_greedy_nms

    oh, ow = orig_hw
    boxes_cxcywh = decoded[:, :4]
    cls_scores = decoded[:, 4:]
    scores = cls_scores.max(axis=1)
    classes = cls_scores.argmax(axis=1)
    keep = scores > conf
    boxes_cxcywh, scores, classes = boxes_cxcywh[keep], scores[keep], classes[keep]
    xy, wh = boxes_cxcywh[:, :2], boxes_cxcywh[:, 2:]
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=1)
    kept = []
    for c in np.unique(classes):
        sel = np.nonzero(classes == c)[0]
        k = np_greedy_nms(boxes[sel], scores[sel], iou)
        kept.extend(sel[k].tolist())
    kept = np.asarray(sorted(kept, key=lambda i: -scores[i]))[:max_det]
    b = boxes[kept].copy()
    b[:, [0, 2]] = np.clip(b[:, [0, 2]] * (ow / 640.0), 0, ow)
    b[:, [1, 3]] = np.clip(b[:, [1, 3]] * (oh / 640.0), 0, oh)
    return b, scores[kept], classes[kept]


def test_decode_tensor_parity_on_sample_png():
    """Model + decode parity on the real photograph (not random tensors)."""
    import cv2
    import torch

    import jax.numpy as jnp

    from yolo_ms_tpu.models.decode import decode_predictions
    from yolo_ms_tpu.models.registry import build_model
    from yolo_ms_tpu.utils.checkpoint import torch_state_dict_to_variables

    rgb = _load_sample_rgb()
    resized = cv2.resize(rgb, (640, 640), interpolation=cv2.INTER_LINEAR)
    x = _preprocessed(resized)

    tm = _build_seeded_torch_model()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(2, 0, 1))[None]).numpy()[0]

    variables = torch_state_dict_to_variables(tm.state_dict())
    model = build_model("n", num_classes=80)
    raw = model.apply(variables, jnp.asarray(x)[None], train=False)
    ours = np.asarray(decode_predictions(raw, 80))[0]

    assert ours.shape == ref.shape == (8400, 84)
    np.testing.assert_allclose(ours[:, 4:], ref[:, 4:], atol=1e-3)
    rel = np.abs(ours[:, :4] - ref[:, :4]).max() / np.abs(ref[:, :4]).max()
    assert rel < 1e-3, f"box decode rel diff {rel:.2e}"


def test_postprocess_set_equality_on_sample_png():
    """conf filter -> class-aware NMS -> top-k -> rescale: our on-device
    batched path and the reference tail must agree exactly on the same
    decoded tensor from the real photograph."""
    import cv2
    import torch

    import jax.numpy as jnp

    from yolo_ms_tpu.ops.nms import batched_nms

    rgb = _load_sample_rgb()
    oh, ow = rgb.shape[:2]
    resized = cv2.resize(rgb, (640, 640), interpolation=cv2.INTER_LINEAR)
    x = _preprocessed(resized)
    xt = torch.from_numpy(x.transpose(2, 0, 1))[None]

    tm = _build_seeded_torch_model()
    _spread_scores(tm, xt)
    with torch.no_grad():
        decoded = tm(xt).numpy()[0]  # [8400, 84]

    ref_boxes, ref_scores, ref_classes = _reference_postprocess(decoded, (oh, ow))
    assert 20 < len(ref_boxes) <= 300, len(ref_boxes)
    assert len(np.unique(ref_classes)) >= 3
    assert ref_scores.max() > 0.6 and ref_scores.min() < 0.6  # spread, not ties

    out = batched_nms(
        jnp.asarray(decoded)[None],
        conf_thresh=0.25,
        iou_thresh=0.45,
        pre_nms_topk=8400,
        max_det=300,
    )
    valid = np.asarray(out["valid"][0])
    got_boxes = np.asarray(out["boxes"][0])[valid]
    got_scores = np.asarray(out["scores"][0])[valid]
    got_classes = np.asarray(out["classes"][0])[valid]
    # rescale like the predictor does (tools/test.py:221-229)
    got_boxes[:, [0, 2]] = np.clip(got_boxes[:, [0, 2]] * (ow / 640.0), 0, ow)
    got_boxes[:, [1, 3]] = np.clip(got_boxes[:, [1, 3]] * (oh / 640.0), 0, oh)

    assert len(got_boxes) == len(ref_boxes)
    # Same input tensor -> the SETS must match exactly; ordering may differ
    # on tied scores (sigmoid saturates at 1.0), so match 1:1 instead of
    # comparing row-wise.
    used = np.zeros(len(got_boxes), bool)
    for i in range(len(ref_boxes)):
        cand = np.nonzero((got_classes == ref_classes[i]) & ~used)[0]
        assert len(cand) > 0, f"ref det {i} (class {ref_classes[i]}) unmatched"
        d = np.abs(got_boxes[cand] - ref_boxes[i]).max(axis=1)
        j = cand[np.argmin(d)]
        assert d.min() < 0.05, f"ref det {i}: best box diff {d.min():.3f}"
        assert abs(got_scores[j] - ref_scores[i]) < 1e-5
        used[j] = True
    assert used.all()


def test_predictor_end_to_end_on_sample_png(tmp_path):
    """Our complete serving pipeline on the photograph: detections + drawn
    JPEG + JSON artifacts (tools/test.py:249-273 contract)."""
    import torch

    from yolo_ms_tpu.infer.predictor import Predictor
    from yolo_ms_tpu.utils.checkpoint import torch_state_dict_to_variables

    rgb = _load_sample_rgb()
    oh, ow = rgb.shape[:2]
    import cv2

    resized = cv2.resize(rgb, (640, 640), interpolation=cv2.INTER_LINEAR)
    xt = torch.from_numpy(_preprocessed(resized).transpose(2, 0, 1))[None]
    tm = _build_seeded_torch_model()
    _spread_scores(tm, xt)
    variables = torch_state_dict_to_variables(tm.state_dict())

    predictor = Predictor(
        "n",
        variables,
        num_classes=80,
        input_size=(640, 640),
        conf_thresh=0.25,
        iou_thresh=0.45,
        pre_nms_topk=8400,
    )
    results = predictor.predict_paths(
        SAMPLE, output_dir=str(tmp_path), save_images=True, save_json=True,
        verbose=False,
    )
    dets = results[SAMPLE]
    assert len(dets) > 10
    for d in dets:
        x1, y1, x2, y2 = d["box_xyxy"]
        assert 0 <= x1 <= x2 <= ow and 0 <= y1 <= y2 <= oh
        assert 0.25 < d["score"] <= 1.0
        assert isinstance(d["class_name"], str)
    assert os.path.exists(tmp_path / "sample_detected.jpg")
    assert os.path.exists(tmp_path / "sample_detections.json")
