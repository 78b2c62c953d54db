"""Smoke test for the analyzer CLI (the reference's main.py:20-74 /
test_model.py:185-302 introspection surface): param audit, staged shapes,
anchor check, staged==full consistency assert, and the XLA-cost-model
FLOPs report — all at a small image size so the test stays fast."""

from __future__ import annotations

import re


def test_analyze_runs_and_reports(capsys):
    from yolo_ms_tpu.tools.analyze import analyze

    decoded = analyze("n", num_classes=4, img_size=128)
    out = capsys.readouterr().out

    assert "Total parameters:" in out
    # anchor check at 128px: 16^2 + 8^2 + 4^2 = 336
    assert decoded.shape[1] == 336
    assert "-> OK" in out
    assert "Full model == staged pipeline: OK" in out

    # FLOPs line present with a sane magnitude (v8-n at 128px is ~0.2-0.5
    # GFLOP/image; anything positive and < 10 G passes — the assertion is
    # about the reporting path, not the cost model's exact number)
    m = re.search(r"Forward FLOPs \(XLA cost model, 128x128\): ([\d.]+) G", out)
    assert m, f"FLOPs line missing in:\n{out}"
    assert 0.0 < float(m.group(1)) < 10.0


def test_visualize_writes_all_stage_renders(tmp_path):
    """tools.visualize end-to-end at a small size, MS family included:
    every per-stage PNG the reference's test_model.py viz produces must be
    written (runs/visualize_sample/ holds the 640px v8-n set)."""
    from yolo_ms_tpu.tools.visualize import visualize

    out = visualize(
        "yolo-ms-xs", None, str(tmp_path / "viz"), num_classes=4, img_size=128
    )
    import os

    expected = [
        "backbone_P3.png", "backbone_P4.png", "backbone_P5.png",
        "neck_N1.png", "neck_N2.png", "neck_N3.png",
        "head_histograms.png", "confidence_distribution.png",
    ]
    for name in expected:
        path = os.path.join(out, name)
        assert os.path.exists(path) and os.path.getsize(path) > 0, name


def test_analyze_ms_family(capsys):
    """The analyzer's staged pipeline must also cover the MS family (QUICKSTART
    documents `yolo-ms-*` as analyzable architectures)."""
    from yolo_ms_tpu.tools.analyze import analyze

    decoded = analyze("yolo-ms-xs", num_classes=4, img_size=128)
    out = capsys.readouterr().out
    assert "YOLO-MS-XS analysis" in out
    assert decoded.shape[1] == 336
    assert "Full model == staged pipeline: OK" in out
