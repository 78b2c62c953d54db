"""TAL assigner tests: synthetic geometry with known correct assignments."""

import jax.numpy as jnp
import numpy as np

from yolo_ms_tpu.train.assigner import task_aligned_assign


def make_inputs(nc=4, a_grid=8, stride=8.0):
    """Anchor grid a_grid x a_grid with centers (i+0.5)*stride."""
    xs = (np.arange(a_grid) + 0.5) * stride
    gx, gy = np.meshgrid(xs, xs, indexing="xy")
    anchors = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    return anchors


def test_assigns_anchors_inside_gt():
    anchors = make_inputs()
    a = anchors.shape[0]
    nc = 4
    # One GT box covering grid cells around (16..32) px
    gt_boxes = jnp.asarray([[[12.0, 12.0, 36.0, 36.0]]])
    gt_labels = jnp.asarray([[2]])
    mask = jnp.asarray([[True]])

    # predictions: perfect box at every anchor, uniform scores
    pd_boxes = jnp.broadcast_to(gt_boxes[:, 0:1, :], (1, a, 4))
    pd_scores = jnp.full((1, a, nc), 0.5)

    tl, tb, ts, fg = task_aligned_assign(
        pd_scores, pd_boxes, jnp.asarray(anchors), gt_labels, gt_boxes, mask,
        num_classes=nc, topk=10,
    )
    fg = np.asarray(fg[0])
    inside = (
        (anchors[:, 0] > 12) & (anchors[:, 0] < 36)
        & (anchors[:, 1] > 12) & (anchors[:, 1] < 36)
    )
    # every fg anchor must be inside the gt; topk limits count to <= 10
    assert fg.sum() > 0 and fg.sum() <= 10
    assert np.all(inside[fg])
    # labels/boxes gathered correctly
    assert np.all(np.asarray(tl[0])[fg] == 2)
    np.testing.assert_allclose(
        np.asarray(tb[0])[fg], np.tile([12.0, 12.0, 36.0, 36.0], (int(fg.sum()), 1))
    )
    # target scores only on assigned class channel
    ts = np.asarray(ts[0])
    assert np.all(ts[fg][:, [0, 1, 3]] == 0)
    assert np.all(ts[fg][:, 2] > 0)
    assert np.all(ts[~fg] == 0)


def test_padding_rows_ignored():
    anchors = make_inputs()
    a = anchors.shape[0]
    nc = 2
    gt_boxes = jnp.asarray([[[12.0, 12.0, 36.0, 36.0], [0.0, 0.0, 64.0, 64.0]]])
    gt_labels = jnp.asarray([[0, 1]])
    # second row is padding
    mask = jnp.asarray([[True, False]])
    pd_boxes = jnp.broadcast_to(gt_boxes[:, 0:1, :], (1, a, 4))
    pd_scores = jnp.full((1, a, nc), 0.5)

    tl, tb, ts, fg = task_aligned_assign(
        pd_scores, pd_boxes, jnp.asarray(anchors), gt_labels, gt_boxes, mask,
        num_classes=nc,
    )
    # no anchor may be labeled with the padded gt's class
    assert np.all(np.asarray(tl[0])[np.asarray(fg[0])] == 0)


def test_no_gt_no_fg():
    anchors = make_inputs()
    a = anchors.shape[0]
    gt_boxes = jnp.zeros((1, 3, 4))
    gt_labels = jnp.zeros((1, 3), dtype=jnp.int32)
    mask = jnp.zeros((1, 3), dtype=bool)
    pd_boxes = jnp.broadcast_to(jnp.asarray([10.0, 10, 20, 20]), (1, a, 4))
    pd_scores = jnp.full((1, a, 2), 0.5)
    _, _, ts, fg = task_aligned_assign(
        pd_scores, pd_boxes, jnp.asarray(anchors), gt_labels, gt_boxes, mask,
        num_classes=2,
    )
    assert np.asarray(fg).sum() == 0
    assert np.asarray(ts).sum() == 0


def test_targets_match_onehot_contraction_oracle():
    """The take_along_axis target gather (r3) must equal the dense one-hot
    contraction it replaced, on random multi-gt geometry."""
    rng = np.random.default_rng(7)
    anchors = make_inputs(a_grid=16, stride=4.0)
    a = anchors.shape[0]
    b, m, nc = 3, 9, 6
    ctr = rng.uniform(8, 56, (b, m, 2))
    half = rng.uniform(4, 20, (b, m, 2))
    gt_boxes = jnp.asarray(
        np.concatenate([ctr - half, ctr + half], -1), jnp.float32
    )
    gt_labels = jnp.asarray(rng.integers(0, nc, (b, m)), jnp.int32)
    mask = jnp.asarray(rng.random((b, m)) < 0.8)
    pd_boxes = jnp.asarray(
        np.concatenate(
            [
                anchors[None].repeat(b, 0) - rng.uniform(2, 14, (b, a, 2)),
                anchors[None].repeat(b, 0) + rng.uniform(2, 14, (b, a, 2)),
            ],
            -1,
        ),
        jnp.float32,
    )
    pd_scores = jnp.asarray(rng.random((b, a, nc)), jnp.float32)

    tl, tb, ts, fg = task_aligned_assign(
        pd_scores, pd_boxes, jnp.asarray(anchors), gt_labels, gt_boxes, mask,
        num_classes=nc,
    )
    fg = np.asarray(fg)
    assert fg.sum() > 0  # non-degenerate geometry
    # Oracle: per fg anchor, targets must be SOME valid gt's box+label with
    # the anchor strictly inside it (the contraction form guaranteed this).
    tb_n, tl_n = np.asarray(tb), np.asarray(tl)
    gtb, gtl = np.asarray(gt_boxes), np.asarray(gt_labels)
    msk = np.asarray(mask)
    for bi in range(b):
        for ai in np.flatnonzero(fg[bi]):
            hits = np.flatnonzero(
                msk[bi]
                & np.all(np.isclose(gtb[bi], tb_n[bi, ai][None]), axis=1)
                & (gtl[bi] == tl_n[bi, ai])
            )
            assert hits.size > 0, (bi, ai, tb_n[bi, ai])
            ax, ay = anchors[ai]
            gx1, gy1, gx2, gy2 = gtb[bi, hits[0]]
            assert gx1 < ax < gx2 and gy1 < ay < gy2
    # non-fg rows are exactly zero (the contraction produced zeros there)
    assert np.all(tb_n[~fg] == 0)
    assert np.all(tl_n[~fg] == 0)
    assert np.all(np.asarray(ts)[~fg] == 0)


def test_conflict_resolution_prefers_higher_iou():
    """An anchor inside two GTs goes to the GT its prediction overlaps more."""
    anchors = make_inputs()
    a = anchors.shape[0]
    nc = 2
    # Two overlapping GTs sharing the center region
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0], [8.0, 8.0, 30.0, 30.0]]])
    gt_labels = jnp.asarray([[0, 1]])
    mask = jnp.asarray([[True, True]])
    # every prediction equals gt0's box -> IoU with gt0 is 1
    pd_boxes = jnp.broadcast_to(gt_boxes[:, 0:1, :], (1, a, 4))
    pd_scores = jnp.full((1, a, nc), 0.5)

    tl, _, _, fg = task_aligned_assign(
        pd_scores, pd_boxes, jnp.asarray(anchors), gt_labels, gt_boxes, mask,
        num_classes=nc, topk=13,
    )
    fg = np.asarray(fg[0])
    inside_both = (
        (anchors[:, 0] > 8) & (anchors[:, 0] < 30)
        & (anchors[:, 1] > 8) & (anchors[:, 1] < 30)
    )
    labels = np.asarray(tl[0])
    # anchors claimed by both must resolve to gt0 (higher IoU with preds)
    contested_fg = fg & inside_both
    assert contested_fg.sum() > 0
    assert np.all(labels[contested_fg] == 0)
