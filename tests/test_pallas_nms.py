"""Pallas NMS kernel tests (interpret mode on the CPU backend)."""

import jax.numpy as jnp
import numpy as np

from yolo_ms_tpu.ops.nms import nms_greedy_scan
from yolo_ms_tpu.ops.pallas.nms_kernel import nms_pallas


def _random_case(rng, b, n, invalid_frac=0.0):
    c = rng.uniform(50, 400, (b, n, 2))
    s = rng.uniform(10, 90, (b, n, 2))
    boxes = np.concatenate([c - s / 2, c + s / 2], -1).astype(np.float32)
    scores = -np.sort(-rng.uniform(0.01, 1, (b, n)).astype(np.float32), axis=1)
    if invalid_frac:
        scores[rng.uniform(size=(b, n)) < invalid_frac] = -1.0
    return boxes, scores


def test_matches_greedy_scan():
    rng = np.random.default_rng(0)
    boxes, scores = _random_case(rng, 3, 128, invalid_frac=0.2)
    keep = np.asarray(
        nms_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5, interpret=True)
    )
    for b in range(3):
        ref = np.asarray(
            nms_greedy_scan(jnp.asarray(boxes[b]), jnp.asarray(scores[b]), 0.5)
        )
        np.testing.assert_array_equal(keep[b], ref)


def test_all_invalid():
    boxes = jnp.zeros((1, 128, 4))
    scores = jnp.full((1, 128), -1.0)
    keep = np.asarray(nms_pallas(boxes, scores, 0.5, interpret=True))
    assert keep.sum() == 0


def test_non_multiple_of_128_rejected():
    import pytest

    with pytest.raises(AssertionError):
        nms_pallas(jnp.zeros((1, 100, 4)), jnp.zeros((1, 100)), 0.5, interpret=True)
