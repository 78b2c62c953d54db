"""Bit-exact equivalence of the assigner's A/B lowering variants.

benchmarks/r5_assigner_ab.py times these on TPU (VERDICT r4 item 1); this
test pins the correctness contract on CPU: every variant must produce
EXACTLY the default's outputs — same picks, same tie-breaks, same targets —
on inputs engineered to contain ties, exhausted rows, and empty images.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_ms_tpu.train import assigner


def _inputs(seed=0, B=3, M=17, A=784, nc=20, dtype=jnp.bfloat16):
    """Random-but-adversarial assigner inputs: coarse-quantized scores (tie
    pressure after the bf16 metric rounding), duplicated gt boxes (identical
    IoU rows), a low-gt image (top-k exhausts its candidates), and an empty
    image (all rows masked)."""
    rng = np.random.default_rng(seed)
    side = int(np.sqrt(A))
    assert side * side == A, "test uses a square anchor grid"
    xs = (np.arange(side) + 0.5) * (640.0 / side)
    gx, gy = np.meshgrid(xs, xs)
    anchors = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)

    # quarter-resolution score grid -> many exact ties
    scores = rng.integers(0, 8, (B, A, nc)).astype(np.float32) / 8.0
    centers = rng.uniform(100, 540, (B, A, 2))
    sizes = rng.uniform(20, 200, (B, A, 2))
    pd_boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1)

    gc = rng.uniform(100, 540, (B, M, 2))
    gs = rng.uniform(40, 300, (B, M, 2))
    gt_boxes = np.concatenate([gc - gs / 2, gc + gs / 2], -1).astype(np.float32)
    gt_boxes[:, 3] = gt_boxes[:, 2]  # duplicated gt -> identical IoU rows
    gt_labels = rng.integers(0, nc, (B, M)).astype(np.int32)
    mask = np.ones((B, M), bool)
    mask[0, 2:] = False  # low-gt image
    mask[1, :] = False  # empty image
    gt_boxes[1, :4] = [310.0, 310.0, 330.0, 330.0]  # tiny box: few candidates
    mask[1, :2] = True
    return (
        jnp.asarray(scores, dtype),
        jnp.asarray(pd_boxes, jnp.float32),
        jnp.asarray(anchors),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_boxes),
        jnp.asarray(mask),
    )


def _assign(cls_variant, topk_variant, args, nc):
    old = (assigner._VARIANT_CLS, assigner._VARIANT_TOPK)
    assigner._VARIANT_CLS = cls_variant
    assigner._VARIANT_TOPK = topk_variant
    # the flags are read at trace time — drop cached traces
    assigner.task_aligned_assign.clear_cache()
    try:
        out = assigner.task_aligned_assign(*args, num_classes=nc)
        return jax.device_get(out)
    finally:
        assigner._VARIANT_CLS, assigner._VARIANT_TOPK = old
        assigner.task_aligned_assign.clear_cache()


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize(
    "cls_variant,topk_variant",
    [
        ("pad128", "argmax"),
        ("swap", "argmax"),
        ("gather", "argmax"),
        ("einsum", "block"),
        ("pad128", "block"),
    ],
)
def test_variant_bit_identical(seed, cls_variant, topk_variant):
    nc = 20
    args = _inputs(seed=seed, nc=nc)
    ref = _assign("einsum", "argmax", args, nc)
    got = _assign(cls_variant, topk_variant, args, nc)
    names = ("target_labels", "target_bboxes", "target_scores", "fg_mask")
    for name, r, g in zip(names, ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g)), (
            f"{cls_variant}/{topk_variant}: {name} diverged "
            f"({np.sum(np.asarray(r) != np.asarray(g))} mismatches)"
        )
    assert np.asarray(ref[3]).sum() > 0, "degenerate fixture: no positives"


def test_block_size_picker():
    # 8400 anchors (640x640, strides 8/16/32): 35 blocks x 240 lanes
    assert assigner._pick_block_s(8400) == 240
    assert 8400 % assigner._pick_block_s(8400) == 0
    # no divisor in range -> flat fallback
    assert assigner._pick_block_s(67) is None
    assert assigner._pick_block_s(63) is None
