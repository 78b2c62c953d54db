"""Separate per-dispatch from per-iteration overhead in the scan harness.

Runs the v8-n bs=128 deploy e2e graph with K = 5/10/20/40 scan iterations
and fits t_wall(K) = a + b*K. `b` is the true per-image-batch device cost;
`a` is the per-dispatch overhead (tunnel RTT + host sync) that the standard
K=10 methodology folds into every reported number at a/10 per iteration.
"""

from __future__ import annotations


def main() -> None:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.data.augment import device_normalize_images
    from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    nc, bs = 80, 128
    model = build_model("n", num_classes=nc, dtype=jnp.bfloat16)
    v = init_model(model, jax.random.PRNGKey(0), (640, 640))
    folded = fold_batchnorm(v)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (bs, 640, 640, 3), dtype=np.uint8))
    )
    print(f"device: {jax.devices()[0]}", flush=True)

    def make(k):
        @jax.jit
        def loop(v_, imgs_):
            def body(c, i):
                x = device_normalize_images(
                    imgs_ + i.astype(jnp.uint8), jnp.bfloat16
                )
                with deploy_mode():
                    raw = model.apply(v_, x, train=False, split_head=True)
                out = fused_postprocess(raw, nc)
                return c + out["scores"].sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(k))
            return acc

        return loop

    pts = []
    for k in (5, 10, 20, 40):
        loop = make(k)
        _ = jax.device_get(loop(folded, imgs))  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(loop(folded, imgs))
            times.append(time.perf_counter() - t0)
        t = min(times)
        pts.append((k, t))
        print(f"K={k:3d}: {t * 1e3:8.2f} ms total, {t / k * 1e3:6.2f} ms/iter", flush=True)

    ks = np.array([p[0] for p in pts], dtype=np.float64)
    ts = np.array([p[1] for p in pts], dtype=np.float64)
    b_fit, a_fit = np.polyfit(ks, ts, 1)
    print(
        f"fit: per-dispatch a = {a_fit * 1e3:.2f} ms, per-iter b = "
        f"{b_fit * 1e3:.2f} ms ({bs / b_fit:.0f} img/s asymptotic)",
        flush=True,
    )


if __name__ == "__main__":
    main()
