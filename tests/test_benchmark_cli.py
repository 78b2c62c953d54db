"""The benchmark CLI (tools/benchmark.py) measures any registry model.

The reference's closest surface is the untimed main.py smoke driver
(/root/reference/main.py:20-74); here measurement is a first-class CLI, so
it gets a first-class test: tiny shapes, CPU, both report paths.
"""

from yolo_ms_tpu.tools.benchmark import run_benchmark

REPORT_KEYS = {
    "arch",
    "mode",
    "batch",
    "img_size",
    "device",
    "steady_state_ms_per_batch",
    "steady_state_img_per_s",
    "k_wall_ms_per_batch",
    "k_wall_img_per_s",
}


def test_forward_mode_report():
    r = run_benchmark("n", batch=1, mode="forward", img_size=64, k=2, reps=1)
    assert REPORT_KEYS <= set(r)
    assert r["arch"] == "n" and r["mode"] == "forward" and r["batch"] == 1
    assert r["k_wall_ms_per_batch"] > 0
    assert r["steady_state_img_per_s"] > 0
    # steady-state can never be slower than 1.5x the wall (guard clamps it)
    assert r["steady_state_ms_per_batch"] <= r["k_wall_ms_per_batch"] * 1.5


def test_train_mode_report():
    r = run_benchmark("n", batch=2, mode="train", img_size=64, k=2, reps=1)
    assert REPORT_KEYS <= set(r)
    assert r["mode"] == "train"
    assert r["k_wall_ms_per_batch"] > 0


def test_cli_main_prints_json(capsys):
    import json

    from yolo_ms_tpu.tools.benchmark import main

    main(
        [
            "--arch", "n", "--batch", "1", "--mode", "forward",
            "--img_size", "64", "--k", "2", "--reps", "1",
        ]
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(out)
    assert report["arch"] == "n"
