"""Inference pipeline: preprocess -> jit(forward+decode+NMS) -> outputs.

Rebuild of the reference inference entry (tools/test.py:63-276) with the
post-process moved on-device: ONE jitted graph covers normalize -> model ->
decode -> batched NMS, and only fixed-size [max_det] detection tensors return
to the host (vs the reference's per-class Python NMS loops + .cpu() transfers,
tools/test.py:192-218).

Host work parity:
- preprocess: plain resize to input_size + ImageNet normalize — exact
  reference semantics (tools/test.py:114-119, including *resize, not
  letterbox*),
- box rescale from model scale to original image size (tools/test.py:221-229),
- drawing (green boxes + labels, tools/test.py:19-61) and per-image JSON dump
  with the same record schema (tools/test.py:254-273).

Batched streaming: a directory of images runs through the SAME compiled
graph in fixed-size batches (the reference is batch=1 per image,
tools/test.py:138).
"""

from __future__ import annotations

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from yolo_ms_tpu.data.augment import device_normalize_images
from yolo_ms_tpu.data.decode import decode_and_resize, decode_image
from yolo_ms_tpu.models.deploy import (
    deploy_mode,
    fold_batchnorm,
    is_deploy_variables,
)
from yolo_ms_tpu.models.registry import build_model
from yolo_ms_tpu.infer.layouts import AutoLayoutInfer
from yolo_ms_tpu.ops.postprocess import fused_postprocess

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff")


class Predictor:
    def __init__(
        self,
        architecture: str,
        variables,
        num_classes: int,
        class_names: list[str] | None = None,
        input_size: tuple[int, int] = (640, 640),
        conf_thresh: float = 0.25,
        iou_thresh: float = 0.45,
        max_det: int = 300,
        batch_size: int = 1,
        reg_max: int = 16,
        letterbox: bool = False,
        dtype=jnp.float32,
        pre_nms_topk: int = 1024,
        deploy: bool = True,
        entry_layouts: str = "auto",
    ):
        self.model = build_model(
            architecture, num_classes=num_classes, reg_max=reg_max, dtype=dtype
        )
        # Deploy-time BN folding (models/deploy.py): fold BN affine into the
        # conv weights so the serving graph is conv(+bias)+SiLU only —
        # removes the layout-copy sandwich around every narrow-channel conv
        # (measured 43% of bs=32 forward; PERF.md). Pre-folded checkpoints
        # (tools/export.py) are detected and used as-is.
        if is_deploy_variables(variables):
            self.deploy = True
            self.variables = variables
        elif deploy and "batch_stats" in variables:
            self.deploy = True
            self.variables = fold_batchnorm(variables)
        else:
            self.deploy = False
            self.variables = variables
        self.num_classes = num_classes
        self.class_names = class_names or [f"class_{i}" for i in range(num_classes)]
        self.input_size = tuple(input_size)
        self.conf_thresh = conf_thresh
        self.iou_thresh = iou_thresh
        self.max_det = max_det
        self.batch_size = batch_size
        self.reg_max = reg_max
        self.letterbox = letterbox
        self.pre_nms_topk = pre_nms_topk
        # entry_layouts="auto": AOT-compile with XLA-preferred entry layouts
        # and relayout each arriving batch into the preferred image format —
        # +7-16% single-dispatch serving on v5e (infer/layouts.py, PERF.md
        # round-5 serving A/B). "default" keeps plain jit (row-major entry).
        if entry_layouts == "auto":
            self._infer = AutoLayoutInfer(self._infer_impl)
        else:
            self._infer = jax.jit(self._infer_impl)

    def _infer_impl(self, variables, images_u8):
        """images_u8: [B, H, W, 3] uint8 -> NMS outputs. Normalization runs
        on-device so only uint8 pixels cross the host->device boundary
        (3/4 of the transfer bytes of float32)."""
        x = device_normalize_images(images_u8, self.model.dtype)
        # split_head: the serving tail reads box/cls maps separately, so the
        # head's channel concat (a pure HBM copy) never enters the graph
        if self.deploy:
            with deploy_mode():
                raw = self.model.apply(variables, x, train=False, split_head=True)
        else:
            raw = self.model.apply(variables, x, train=False, split_head=True)
        # fused tail: argmax on raw logits, f32 DFL decode, on-device NMS —
        # same outputs as decode_predictions+batched_nms, ~25% less
        # post-process cost at bs=128 (benchmarks/postproc_probe.py)
        return fused_postprocess(
            raw,
            self.num_classes,
            self.reg_max,
            conf_thresh=self.conf_thresh,
            iou_thresh=self.iou_thresh,
            max_det=self.max_det,
            pre_nms_topk=self.pre_nms_topk,
        )

    # ------------------------------------------------------------------ #

    def predict_batch(self, images_u8: np.ndarray):
        """images_u8: [B, H, W, 3] uint8 at input_size. Returns host dict."""
        out = self._infer(self.variables, jnp.asarray(images_u8))
        return jax.device_get(out)

    def _preprocess(self, image_rgb: np.ndarray):
        """Original-size RGB -> (model-input uint8, unmap meta).

        Default: plain resize (exact reference semantics, tools/test.py:116).
        With ``letterbox=True``: aspect-preserving resize + gray padding (the
        standard deployment preprocessing; boxes unmap exactly)."""
        import cv2

        oh, ow = image_rgb.shape[:2]
        ih, iw = self.input_size
        if self.letterbox:
            from yolo_ms_tpu.data.augment import letterbox as lb

            canvas, _, r, (px, py) = lb(
                image_rgb, np.zeros((0, 4), np.float32), ih, iw
            )
            return canvas, (1.0 / r, 1.0 / r, px, py, ow, oh)
        resized = cv2.resize(image_rgb, (iw, ih), interpolation=cv2.INTER_LINEAR)
        return resized, (ow / iw, oh / ih, 0, 0, ow, oh)

    def predict_image(self, image_rgb: np.ndarray):
        """Single original-size RGB image -> list of detection dicts
        (rescaled to original size, reference JSON schema)."""
        inp, meta = self._preprocess(image_rgb)
        out = self.predict_batch(inp[None])
        return self._to_detections(out, 0, meta)

    def _to_detections(self, out, i: int, meta):
        sx, sy, px, py, ow, oh = meta
        dets = []
        valid = out["valid"][i]
        for j in np.nonzero(valid)[0]:
            x1, y1, x2, y2 = out["boxes"][i, j]
            cid = int(out["classes"][i, j])
            bx = [
                float(np.clip((x1 - px) * sx, 0, ow)),
                float(np.clip((y1 - py) * sy, 0, oh)),
                float(np.clip((x2 - px) * sx, 0, ow)),
                float(np.clip((y2 - py) * sy, 0, oh)),
            ]
            dets.append(
                {
                    "box_xyxy": [round(c, 2) for c in bx],
                    "score": round(float(out["scores"][i, j]), 4),
                    "class_id": cid,
                    "class_name": self.class_names[cid]
                    if cid < len(self.class_names)
                    else f"class_{cid}",
                }
            )
        return dets

    # ------------------------------------------------------------------ #

    def export_coco_json(self, results: dict, path: str,
                         label2cat: dict | None = None) -> None:
        """Write detections in COCO results format (list of
        {image_id, category_id, bbox xywh, score}) for server submission —
        the reference's noted-but-unimplemented TODO (annotations.md:42-43).
        image_id is the file stem when not an int."""
        records = []
        for img_path, dets in results.items():
            stem = os.path.splitext(os.path.basename(img_path))[0]
            image_id = int(stem) if stem.isdigit() else stem
            for d in dets:
                x1, y1, x2, y2 = d["box_xyxy"]
                cid = d["class_id"]
                records.append(
                    {
                        "image_id": image_id,
                        "category_id": (
                            label2cat.get(cid, cid) if label2cat else cid
                        ),
                        "bbox": [x1, y1, round(x2 - x1, 2), round(y2 - y1, 2)],
                        "score": d["score"],
                    }
                )
        with open(path, "w") as f:
            json.dump(records, f)

    def predict_paths(self, source_path: str, output_dir: str | None = None,
                      save_images: bool = True, save_json: bool = True,
                      verbose: bool = True):
        """Directory-or-file inference with drawing + JSON, streaming in
        fixed-size batches through one compiled graph.

        Returns {image_path: [detections]}.
        """
        paths = find_images(source_path)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
        ih, iw = self.input_size
        results = {}
        bs = self.batch_size

        def prepare(chunk):
            batch = np.zeros((bs, ih, iw, 3), np.uint8)
            metas = []
            for k, p in enumerate(chunk):
                orig = decode_image(p)
                if self.letterbox:
                    inp, meta = self._preprocess(orig)
                else:
                    # fused native decode+resize fast path (plain resize)
                    inp = decode_and_resize(p, ih, iw)
                    oh, ow = orig.shape[:2]
                    meta = (ow / iw, oh / ih, 0, 0, ow, oh)
                batch[k] = inp
                metas.append((p, orig, meta))
            return batch, metas

        def consume(out, metas):
            for k, (p, orig, meta) in enumerate(metas):
                dets = self._to_detections(out, k, meta)
                results[p] = dets
                if verbose:
                    print(f"{p}: {len(dets)} detections")
                if output_dir:
                    base = os.path.splitext(os.path.basename(p))[0]
                    if save_images:
                        drawn = draw_detections(orig, dets)
                        import cv2

                        cv2.imwrite(
                            os.path.join(output_dir, f"{base}_detected.jpg"),
                            cv2.cvtColor(drawn, cv2.COLOR_RGB2BGR),
                        )
                    if save_json:
                        with open(
                            os.path.join(output_dir, f"{base}_detections.json"), "w"
                        ) as f:
                            json.dump(dets, f, indent=4)

        # Software pipelining: jax dispatch is async, so batch i computes on
        # the device while the host decodes batch i+1 and draws/writes
        # batch i-1's outputs; only the final device_get blocks.
        pending = None  # (device output, metas)
        for start in range(0, len(paths), bs):
            batch, metas = prepare(paths[start : start + bs])
            out_dev = self._infer(self.variables, jnp.asarray(batch))
            if pending is not None:
                consume(jax.device_get(pending[0]), pending[1])
            pending = (out_dev, metas)
        if pending is not None:
            consume(jax.device_get(pending[0]), pending[1])
        return results


def find_images(source_path: str) -> list[str]:
    """File or directory -> image paths (tools/test.py:122-135 semantics)."""
    if os.path.isdir(source_path):
        paths = []
        for ext in IMAGE_EXTENSIONS:
            paths.extend(glob.glob(os.path.join(source_path, f"*{ext}")))
            paths.extend(glob.glob(os.path.join(source_path, f"*{ext.upper()}")))
        if not paths:
            raise FileNotFoundError(f"No images found in directory: {source_path}")
        return sorted(set(paths))
    if os.path.isfile(source_path):
        return [source_path]
    raise FileNotFoundError(
        f"Source path not found or not a file/directory: {source_path}"
    )


def draw_detections(
    image_rgb: np.ndarray, detections: list[dict], conf_thresh: float = 0.0
) -> np.ndarray:
    """Green boxes + filled label tags (tools/test.py:19-61 output style).
    Operates on RGB; caller converts for cv2.imwrite."""
    import cv2

    img = image_rgb.copy()
    for det in detections:
        if det["score"] < conf_thresh:
            continue
        x1, y1, x2, y2 = map(int, det["box_xyxy"])
        label = f"{det['class_name']}: {det['score']:.2f}"
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
        (lw, lh), baseline = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        cv2.rectangle(img, (x1, y1 - lh - baseline), (x1 + lw, y1), (0, 255, 0), -1)
        cv2.putText(
            img, label, (x1, y1 - baseline), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1
        )
    return img
