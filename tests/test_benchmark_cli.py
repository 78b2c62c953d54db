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
    "steady_state_clamped",
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


def test_train_mode_state_is_live():
    """The scan must thread the updated TrainState (backward pass live).

    With a dead carry, XLA drops the grad + optax update and train-mode
    rates collapse toward forward-mode rates. Structural check: the jitted
    loop's HLO must contain the optimizer update (mul by -lr via scatter or
    the adam moment ops) — cheapest proxy: train wall >= forward wall on
    identical tiny shapes is flaky, so instead assert the carry fn returns
    a changed state.
    """
    import jax
    import jax.numpy as jnp

    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.train.loss import DetectionLoss
    from yolo_ms_tpu.train.optim import build_optimizer
    from yolo_ms_tpu.train.trainer import TrainState, make_train_step
    from yolo_ms_tpu.utils.config import TrainingConfig

    model = build_model("n", num_classes=4, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    loss_fn = DetectionLoss(num_classes=4)
    tx, _ = build_optimizer(TrainingConfig(batch_size=2, epochs=1), 10)
    step = jax.jit(make_train_step(model, loss_fn, tx))
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(0),
    )
    # Non-degenerate images: an all-constant batch gives zero-variance
    # train-mode BN whose backward overflows (the guard freezes the state
    # and the moments legitimately stay zero — not what this test probes).
    data = {
        "images": jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)),
        "boxes": jnp.tile(jnp.asarray([0.5, 0.5, 0.4, 0.4]), (2, 4, 1)),
        "labels": jnp.zeros((2, 4), jnp.int32),
        "mask": jnp.ones((2, 4), jnp.bool_),
    }
    new_state, _ = step(state, data)
    assert int(new_state.step) == 1
    # Warmup LR is 0 at step 0, so params may not move — the Adam first
    # moment is grad-dependent and LR-independent: it must be nonzero.
    mu_norm = sum(
        float(jnp.sum(jnp.abs(leaf)))
        for leaf in jax.tree_util.tree_leaves(new_state.opt_state)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
    )
    assert mu_norm > 0.0


def test_streaming_fixture_and_run(tmp_path):
    """Streaming serving benchmark: disk JPEGs -> host decode -> H2D ->
    deploy graph, sustained rate + per-leg rates + bound verdict."""
    from yolo_ms_tpu.tools.benchmark import ensure_stream_fixture, run_streaming

    fx = str(tmp_path / "fixture")
    paths = ensure_stream_fixture(fx, 12, seed=1)
    assert len(paths) == 12
    # idempotent: second call reuses the manifest (no rewrite)
    import os

    mtime = os.path.getmtime(paths[0])
    assert ensure_stream_fixture(fx, 12, seed=1)[0] == paths[0]
    assert os.path.getmtime(paths[0]) == mtime

    r = run_streaming(
        "n",
        batch=4,
        img_size=64,
        num_classes=4,
        images_dir=fx,
        n_images=12,
        threads=2,
        depth=2,
    )
    assert r["mode"] == "streaming"
    assert r["n_images"] == 12
    assert r["sustained_img_per_s"] > 0
    assert r["host_decode_img_per_s"] > 0
    assert r["h2d_img_per_s"] > 0
    assert r["device_only_img_per_s"] > 0
    assert r["bound"] in ("host", "transfer", "device", "balanced")
    # burst-proof decode cost: CPU-seconds per image (user+sys, incl. the
    # loader's pthread pool) and the derived cores-per-chip requirement
    assert r["host_decode_cpu_s_per_img"] > 0
    assert r["cores_per_chip_derived"] > 0


def test_pipelined_sustained_overlap():
    """VERDICT r4 item 4: the streaming harness's overlap accounting has to
    deliver sustained ≈ the slower leg alone at ANY host:device ratio — the
    tunnel attachment can't produce calibrated ratios, synthetic legs can.

    The 'device' is modeled as a single-lane async queue (a 1-thread
    executor): dispatch is non-blocking, sync drains one handle — exactly
    the contract the real device dispatch satisfies. The 'host' leg is a
    sleep on the producer thread. For per-item costs (h, d), pipelined wall
    per item must approach max(h, d); with no overlap it would be h + d —
    the assertions reject the no-overlap wall, so a harness that silently
    serializes fails this test.
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    from yolo_ms_tpu.tools.benchmark import pipelined_sustained

    n = 24
    for h_ms, d_ms in ((30.0, 10.0), (10.0, 30.0), (20.0, 20.0)):
        with ThreadPoolExecutor(max_workers=1) as device:

            def produce(_):
                time.sleep(h_ms / 1e3)
                return object()

            def dispatch(_payload):
                return device.submit(time.sleep, d_ms / 1e3)

            elapsed, done = pipelined_sustained(
                range(n), produce, dispatch, lambda f: f.result(), depth=4
            )
        assert done == n
        per_item_ms = elapsed / n * 1e3
        floor = max(h_ms, d_ms)  # perfect overlap
        serial = h_ms + d_ms  # no overlap
        # generous tolerance for the 1-core CI host; the key property is
        # that the wall tracks the slower LEG, not the leg SUM
        assert per_item_ms < floor + 0.45 * (serial - floor), (
            f"h={h_ms} d={d_ms}: {per_item_ms:.1f} ms/item — overlap lost "
            f"(floor {floor}, serial {serial})"
        )
        assert per_item_ms > 0.9 * floor, (
            f"h={h_ms} d={d_ms}: {per_item_ms:.1f} ms/item is faster than "
            f"the slower leg — the harness is not timing real work"
        )


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
