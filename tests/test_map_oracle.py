"""Differential test: eval/coco_map.py vs an independent brute-force oracle.

torchmetrics (the reference's metric backend, train.py:41-47) and
pycocotools are not installable in this environment, so the oracle is a
from-scratch, loop-everything transcription of the COCOeval protocol
written here with no shared code with the evaluator under test:

- per (image, class): score-sorted detections truncated to max_dets,
  greedy matching (highest IoU >= threshold among available GTs, crowds
  only if no real match), crowd IoU = intersection / det-area,
- dataset-global score sort per class, precision envelope, 101-point
  interpolated AP, mean over classes with non-crowd GT.

Any protocol bug in the vectorized evaluator (envelope, truncation,
crowd-ignore, tie handling) shows up as a disagreement on random data.
"""

import numpy as np

from yolo_ms_tpu.eval.coco_map import MeanAveragePrecision


def _iou_single(a, b, crowd):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    denom = area_a if crowd else area_a + area_b - inter
    return inter / max(denom, 1e-9)


def brute_force_ap(preds, targets, cls, thr, max_dets=100):
    """AP for one class at one IoU threshold; None if class has no real GT."""
    records = []  # (score, is_tp, is_ignored)
    gt_total = 0
    for p, t in zip(preds, targets):
        keep_p = [i for i, l in enumerate(p["labels"]) if l == cls]
        keep_p.sort(key=lambda i: -p["scores"][i])
        keep_p = keep_p[:max_dets]
        keep_t = [i for i, l in enumerate(t["labels"]) if l == cls]
        crowd = t.get("iscrowd", np.zeros(len(t["labels"]), bool))
        # real GTs first (COCOeval sorts by ignore flag)
        keep_t.sort(key=lambda i: bool(crowd[i]))
        gt_total += sum(1 for i in keep_t if not crowd[i])
        matched = set()
        for di in keep_p:
            best_iou, m = min(thr, 1.0 - 1e-10), -1
            for gi in keep_t:
                if gi in matched and not crowd[gi]:
                    continue
                if m > -1 and not crowd[m] and crowd[gi]:
                    break  # real match found; never trade for a crowd
                iou = _iou_single(p["boxes"][di], t["boxes"][gi], crowd[gi])
                if iou < best_iou:
                    continue
                best_iou, m = iou, gi
            if m == -1:
                records.append((p["scores"][di], False, False))
            elif crowd[m]:
                records.append((p["scores"][di], False, True))
            else:
                matched.add(m)
                records.append((p["scores"][di], True, False))
    if gt_total == 0:
        return None
    records.sort(key=lambda r: -r[0])
    tp = fp = 0
    pr = []  # (recall, precision) at each non-ignored detection
    for _, is_tp, ign in records:
        if ign:
            continue
        tp += is_tp
        fp += not is_tp
        pr.append((tp / gt_total, tp / (tp + fp)))
    ap = 0.0
    for r in np.linspace(0, 1, 101):
        p_at = max((p for rr, p in pr if rr >= r), default=0.0)
        ap += p_at / 101
    return ap


def brute_force_map(preds, targets, thr, max_dets=100):
    classes = set()
    for t in targets:
        classes.update(int(l) for l in t["labels"])
    for p in preds:
        classes.update(int(l) for l in p["labels"])
    aps = [brute_force_ap(preds, targets, c, thr, max_dets) for c in sorted(classes)]
    aps = [a for a in aps if a is not None]
    return float(np.mean(aps)) if aps else float("nan")


def _random_case(rng, n_images, n_classes, with_crowd):
    preds, targets = [], []
    for _ in range(n_images):
        n_gt = int(rng.integers(0, 6))
        gt = rng.uniform(0, 200, (n_gt, 2))
        gt = np.concatenate([gt, gt + rng.uniform(5, 60, (n_gt, 2))], -1)
        gl = rng.integers(0, n_classes, n_gt)
        crowd = (
            rng.random(n_gt) < 0.3 if with_crowd else np.zeros(n_gt, bool)
        )
        n_pred = int(rng.integers(0, 10))
        pb = rng.uniform(0, 200, (n_pred, 2))
        pb = np.concatenate([pb, pb + rng.uniform(5, 60, (n_pred, 2))], -1)
        # half the predictions perturb real GT boxes
        for i in range(min(n_gt, n_pred // 2)):
            pb[i] = gt[i] + rng.normal(0, 4, 4)
        pl = rng.integers(0, n_classes, n_pred)
        for i in range(min(n_gt, n_pred // 2)):
            pl[i] = gl[i]
        ps = np.round(rng.uniform(0.05, 1.0, n_pred), 2)  # rounded -> ties
        preds.append(
            {"boxes": pb.astype(np.float32), "scores": ps.astype(np.float32), "labels": pl}
        )
        targets.append(
            {"boxes": gt.astype(np.float32), "labels": gl, "iscrowd": crowd}
        )
    return preds, targets


def test_matches_brute_force_oracle():
    rng = np.random.default_rng(7)
    for seed_case in range(6):
        with_crowd = seed_case % 2 == 1
        preds, targets = _random_case(rng, 8, 4, with_crowd)
        for thr in (0.5, 0.75):
            m = MeanAveragePrecision(iou_thresholds=[thr])
            m.update(preds, targets)
            got = m.compute()["map_50" if thr == 0.5 else "map_75"]
            want = brute_force_map(preds, targets, thr)
            assert abs(got - want) < 1e-6, (
                f"case {seed_case} thr {thr}: got {got}, oracle {want}"
            )


def test_coco_val_scale_under_60s():
    """COCO-val2017-scale smoke: 5,000 images x 100 dets x 80 classes at all
    10 IoU thresholds must finish in well under a minute (the matching is a
    per-detection [T, G] argmax, not a T x D x G Python scan), and must agree
    with the brute-force oracle on a subsample of the same stream."""
    import time

    rng = np.random.default_rng(3)
    n_images, n_dets, n_gt, n_classes = 5000, 100, 20, 80
    preds, targets = [], []
    for _ in range(n_images):
        gt = rng.uniform(0, 600, (n_gt, 2)).astype(np.float32)
        gt = np.concatenate([gt, gt + rng.uniform(8, 120, (n_gt, 2))], -1)
        gl = rng.integers(0, n_classes, n_gt)
        crowd = rng.random(n_gt) < 0.05
        pb = rng.uniform(0, 600, (n_dets, 2)).astype(np.float32)
        pb = np.concatenate([pb, pb + rng.uniform(8, 120, (n_dets, 2))], -1)
        pb[:n_gt] = gt + rng.normal(0, 6, (n_gt, 4))
        pl = rng.integers(0, n_classes, n_dets)
        pl[:n_gt] = gl
        ps = np.round(rng.uniform(0.05, 1.0, n_dets), 3).astype(np.float32)
        preds.append({"boxes": pb, "scores": ps, "labels": pl})
        targets.append({"boxes": gt, "labels": gl, "iscrowd": crowd})

    m = MeanAveragePrecision()  # all 10 COCO thresholds
    t0 = time.time()
    m.update(preds, targets)
    result = m.compute()
    elapsed = time.time() - t0
    assert np.isfinite(result["map"]) and 0.0 < result["map"] < 1.0
    assert elapsed < 60.0, f"COCO-scale eval took {elapsed:.1f}s (budget 60s)"

    # protocol equality vs the oracle on a subsample of the same stream
    sub_p, sub_t = preds[:40], targets[:40]
    m2 = MeanAveragePrecision(iou_thresholds=[0.5])
    m2.update(sub_p, sub_t)
    got = m2.compute()["map_50"]
    want = brute_force_map(sub_p, sub_t, 0.5)
    assert abs(got - want) < 1e-6


def test_max_dets_truncation_per_image():
    """11 detections on one image, max_dets=10: the lowest-score one must
    not enter matching even though a second image has spare budget."""
    rng = np.random.default_rng(1)
    preds, targets = _random_case(rng, 2, 1, False)
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    n = 11
    pb = np.tile(np.asarray([[100, 100, 110, 110]], np.float32), (n, 1))
    pb[-1] = gt[0]  # the TP-quality box has the LOWEST score
    ps = np.linspace(0.9, 0.1, n).astype(np.float32)
    preds = [{"boxes": pb, "scores": ps, "labels": np.zeros(n, np.int64)}]
    targets = [{"boxes": gt, "labels": np.zeros(1, np.int64)}]
    m = MeanAveragePrecision(iou_thresholds=[0.5], max_dets=10)
    m.update(preds, targets)
    got = m.compute()["map_50"]
    want = brute_force_map(preds, targets, 0.5, max_dets=10)
    assert abs(got - want) < 1e-6
    assert got == 0.0  # the matching box was truncated away
