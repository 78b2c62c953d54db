"""Vectorized IoU family (IoU / GIoU / DIoU / CIoU) in jax.numpy.

Replaces the reference's hand-rolled torch IoU (loss.py:9-91) and the
delegated torchvision C++ kernels (`box_iou`, `complete_box_iou`,
simplified_loss.py:4,123,183-185) with pure jnp that XLA fuses into the
surrounding loss graph — no custom kernel needed, it is all VPU elementwise
work.

All functions broadcast: box1 [..., 4] against box2 [..., 4].
"""

from __future__ import annotations

import jax.numpy as jnp


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    c, wh = boxes[..., :2], boxes[..., 2:4]
    half = wh / 2.0
    return jnp.concatenate([c - half, c + half], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    p1, p2 = boxes[..., :2], boxes[..., 2:4]
    return jnp.concatenate([(p1 + p2) / 2.0, p2 - p1], axis=-1)


def box_iou_xyxy(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7):
    """Elementwise (broadcasting) IoU for xyxy boxes. Returns IoU [...]."""
    ix1 = jnp.maximum(box1[..., 0], box2[..., 0])
    iy1 = jnp.maximum(box1[..., 1], box2[..., 1])
    ix2 = jnp.minimum(box1[..., 2], box2[..., 2])
    iy2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    a1 = (box1[..., 2] - box1[..., 0]) * (box1[..., 3] - box1[..., 1])
    a2 = (box2[..., 2] - box2[..., 0]) * (box2[..., 3] - box2[..., 1])
    return inter / (a1 + a2 - inter + eps)


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """IoU / GIoU / DIoU / CIoU with the reference's exact math (loss.py:9-91).

    CIoU's aspect-ratio coefficient alpha is treated as a constant w.r.t. the
    gradient (loss.py:88-89's detach) via stop_gradient.
    """
    import jax

    b1 = xywh_to_xyxy(box1) if xywh else box1
    b2 = xywh_to_xyxy(box2) if xywh else box2

    ix1 = jnp.maximum(b1[..., 0], b2[..., 0])
    iy1 = jnp.maximum(b1[..., 1], b2[..., 1])
    ix2 = jnp.minimum(b1[..., 2], b2[..., 2])
    iy2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)

    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = a1 + a2 - inter + eps
    iou = inter / union

    if not (GIoU or DIoU or CIoU):
        return iou

    ex1 = jnp.minimum(b1[..., 0], b2[..., 0])
    ey1 = jnp.minimum(b1[..., 1], b2[..., 1])
    ex2 = jnp.maximum(b1[..., 2], b2[..., 2])
    ey2 = jnp.maximum(b1[..., 3], b2[..., 3])
    ew = jnp.clip(ex2 - ex1, 0)
    eh = jnp.clip(ey2 - ey1, 0)

    if GIoU:
        enclose_area = ew * eh + eps
        return iou - (enclose_area - union) / enclose_area

    c1x = (b1[..., 0] + b1[..., 2]) / 2
    c1y = (b1[..., 1] + b1[..., 3]) / 2
    c2x = (b2[..., 0] + b2[..., 2]) / 2
    c2y = (b2[..., 1] + b2[..., 3]) / 2
    center_dist_sq = (c1x - c2x) ** 2 + (c1y - c2y) ** 2
    diag_sq = ew**2 + eh**2 + eps
    diou_term = center_dist_sq / diag_sq
    if DIoU:
        return iou - diou_term

    w1 = b1[..., 2] - b1[..., 0]
    h1 = b1[..., 3] - b1[..., 1]
    w2 = b2[..., 2] - b2[..., 0]
    h2 = b2[..., 3] - b2[..., 1]
    v = (4 / jnp.pi**2) * (
        jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))
    ) ** 2
    alpha = jax.lax.stop_gradient(v / (1 - iou + v + eps))
    return iou - diou_term - alpha * v


def ciou(box1: jnp.ndarray, box2: jnp.ndarray, xywh: bool = False) -> jnp.ndarray:
    """Complete IoU (broadcasting elementwise)."""
    return bbox_iou(box1, box2, xywh=xywh, CIoU=True)
