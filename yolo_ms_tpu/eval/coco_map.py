"""COCO-protocol mean-average-precision evaluator (host-side numpy).

Own implementation of the metric the reference delegates to torchmetrics'
MeanAveragePrecision (train.py:17,41-47: box_format='xyxy',
iou_thresholds=[0.5]). Protocol:

- per class, detections sorted by score across the dataset,
- greedy match to the unmatched GT with highest IoU >= threshold,
- 101-point interpolated precision (COCO standard),
- AP averaged over classes that have GT; mAP@[.5:.95] = mean over the 10
  standard IoU thresholds; map_50 reported separately for parity with the
  reference's 'Validation/mAP_50' scalar (train.py:407).

Accumulation is update()/compute() like torchmetrics so the validation loop
shape matches the reference's (train.py:146,152).
"""

from __future__ import annotations

import numpy as np

COCO_IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,4] x [M,4] xyxy -> [N,M] IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-9)


class MeanAveragePrecision:
    def __init__(
        self,
        iou_thresholds=None,
        max_dets: int = 100,
        num_classes: int | None = None,
    ):
        self.iou_thresholds = (
            np.asarray(iou_thresholds, np.float64)
            if iou_thresholds is not None
            else COCO_IOU_THRESHOLDS
        )
        self.max_dets = max_dets
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self._preds = []  # per image: (boxes, scores, labels)
        self._targets = []  # per image: (boxes, labels)

    def update(self, preds: list[dict], targets: list[dict]):
        """torchmetrics-compatible update: lists of per-image dicts with
        'boxes' [N,4] xyxy, 'scores' [N], 'labels' [N] (preds) and
        'boxes'/'labels' (targets)."""
        assert len(preds) == len(targets)
        for p, t in zip(preds, targets):
            self._preds.append(
                (
                    np.asarray(p["boxes"], np.float32).reshape(-1, 4),
                    np.asarray(p["scores"], np.float32).reshape(-1),
                    np.asarray(p["labels"], np.int64).reshape(-1),
                )
            )
            self._targets.append(
                (
                    np.asarray(t["boxes"], np.float32).reshape(-1, 4),
                    np.asarray(t["labels"], np.int64).reshape(-1),
                )
            )

    # ------------------------------------------------------------------ #

    def _ap_for_class(self, cls: int) -> np.ndarray | None:
        """AP at each IoU threshold for one class, or None if no GT."""
        n_img = len(self._preds)
        gt_count = 0
        dets = []  # (score, img_idx, box)
        gts = []  # per image arrays
        for i in range(n_img):
            pb, ps, pl = self._preds[i]
            sel = pl == cls
            for s, b in zip(ps[sel], pb[sel]):
                dets.append((s, i, b))
            tb, tl = self._targets[i]
            g = tb[tl == cls]
            gts.append(g)
            gt_count += len(g)
        if gt_count == 0:
            return None
        dets.sort(key=lambda x: -x[0])
        dets = dets[: self.max_dets * n_img]

        n_thr = len(self.iou_thresholds)
        tp = np.zeros((n_thr, len(dets)), bool)
        matched = [
            np.zeros((n_thr, len(g)), bool) for g in gts
        ]  # per image per threshold

        # Pre-compute IoUs lazily per (det, image)
        for d_idx, (score, img, box) in enumerate(dets):
            g = gts[img]
            if len(g) == 0:
                continue
            ious = _iou_matrix(box[None], g)[0]
            order = np.argsort(-ious)
            for t_idx, thr in enumerate(self.iou_thresholds):
                for gi in order:
                    if ious[gi] < thr:
                        break
                    if not matched[img][t_idx, gi]:
                        matched[img][t_idx, gi] = True
                        tp[t_idx, d_idx] = True
                        break

        aps = np.zeros(n_thr)
        if not dets:
            return aps  # GT exists but nothing predicted -> AP 0
        for t_idx in range(n_thr):
            tps = np.cumsum(tp[t_idx])
            fps = np.cumsum(~tp[t_idx])
            recall = tps / gt_count
            precision = tps / np.maximum(tps + fps, 1e-9)
            # monotonically decreasing precision envelope
            for i in range(len(precision) - 2, -1, -1):
                precision[i] = max(precision[i], precision[i + 1])
            # 101-point interpolation
            idx = np.searchsorted(recall, RECALL_POINTS, side="left")
            ap = np.where(
                idx < len(precision),
                precision[np.minimum(idx, len(precision) - 1)],
                0.0,
            )
            aps[t_idx] = ap.mean()
        return aps

    def compute(self) -> dict:
        classes = set()
        for _, tl in self._targets:
            classes.update(np.unique(tl).tolist())
        if self.num_classes is not None:
            classes &= set(range(self.num_classes))
        per_class = {}
        for c in sorted(classes):
            aps = self._ap_for_class(int(c))
            if aps is not None:
                per_class[int(c)] = aps
        if not per_class:
            zero = float("nan")
            return {"map": zero, "map_50": zero, "map_75": zero, "per_class": {}}
        stack = np.stack(list(per_class.values()))  # [C, n_thr]
        result = {
            "map": float(stack.mean()),
            "per_class": {c: float(a.mean()) for c, a in per_class.items()},
        }
        thr = list(np.round(self.iou_thresholds, 2))
        if 0.5 in thr:
            result["map_50"] = float(stack[:, thr.index(0.5)].mean())
        if 0.75 in thr:
            result["map_75"] = float(stack[:, thr.index(0.75)].mean())
        return result
