"""Round-5 serving A/B: the two unexplored levers from NEXT.md:128-133
(VERDICT r4 item 5) on the deploy graph.

  A. Conv layout pinning: compile the e2e pipeline with AUTO entry layouts
     (XLA picks its preferred layout per input instead of row-major
     defaults), feed inputs device_put INTO those layouts, and compare
     against the default-layout compile. If AUTO == default for every
     input, the lever is a structural no-op and is recorded as such.
  B. Double-buffer half-batches: 2N dispatches of bs/2 vs N dispatches of
     bs, back-to-back pipelined dispatch with one final sync — does
     splitting let the tail of half-batch i hide under the forward of
     half-batch i+1? (Single TPU core executes one program at a time, so
     the expected answer is no — this measures it.)

Methodology: pipelined dispatch loops (the streaming device-leg pattern),
marginal rate between N and 3N dispatches to cancel fixed sync cost.

Usage: python benchmarks/r5_serving_ab.py [arch] [batch] [n_batches]
"""

from __future__ import annotations

import json
import sys
import time


def main(arch="yolov8-n", bs=128, n=30):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.layout import Format, Layout

    from yolo_ms_tpu.data.augment import device_normalize_images
    from yolo_ms_tpu.models.deploy import deploy_mode, fold_batchnorm
    from yolo_ms_tpu.models.registry import build_model, init_model
    from yolo_ms_tpu.ops.postprocess import fused_postprocess
    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    model = build_model(arch, num_classes=80, dtype=jnp.bfloat16)
    variables = fold_batchnorm(
        init_model(model, jax.random.PRNGKey(0), (640, 640))
    )

    def e2e(v, imgs):
        x = device_normalize_images(imgs, jnp.bfloat16)
        with deploy_mode():
            raw = model.apply(v, x, train=False, split_head=True)
        return fused_postprocess(raw, 80)

    def sync(out):
        jax.device_get(out["valid"])

    rng = np.random.default_rng(0)

    def images_for(b):
        return jnp.asarray(
            rng.integers(0, 256, (b, 640, 640, 3), dtype=np.uint8)
        )

    def rate(fn, v, imgs, reps):
        """marginal img/s between reps and 3*reps pipelined dispatches"""
        last = None
        for _ in range(2):  # warm
            last = fn(v, imgs)
        sync(last)
        walls = []
        for k in (reps, 3 * reps):
            t0 = time.perf_counter()
            for _ in range(k):
                last = fn(v, imgs)
            sync(last)
            walls.append(time.perf_counter() - t0)
        marginal_s = (walls[1] - walls[0]) / (2 * reps)
        return imgs.shape[0] / marginal_s, marginal_s

    report = {"arch": arch, "batch": bs}

    # --- baseline: default layouts, full batch ---
    full = jax.jit(e2e)
    imgs = jax.device_put(images_for(bs))
    base_rate, base_s = rate(full, variables, imgs, n)
    report["baseline_img_per_s"] = round(base_rate, 1)
    report["baseline_ms_per_batch"] = round(base_s * 1e3, 2)
    print(json.dumps({"leg": "baseline", **report}), flush=True)

    # --- A: AUTO entry layouts ---
    auto = jax.jit(e2e, in_shardings=Format(Layout.AUTO))
    compiled_auto = auto.lower(variables, imgs).compile()
    compiled_def = full.lower(variables, imgs).compile()
    auto_fmt = jax.tree_util.tree_leaves(compiled_auto.input_formats)
    def_fmt = jax.tree_util.tree_leaves(compiled_def.input_formats)
    diff = [
        (str(a), str(d)) for a, d in zip(auto_fmt, def_fmt) if str(a) != str(d)
    ]
    report["auto_layout_inputs_differing"] = len(diff)
    if diff:
        report["auto_layout_examples"] = diff[:4]
        # re-put inputs into the compiler-preferred formats and time
        fmt_tree = compiled_auto.input_formats
        if (
            isinstance(fmt_tree, tuple)
            and len(fmt_tree) == 2
            and isinstance(fmt_tree[1], dict)
        ):
            fmt_tree = fmt_tree[0]  # (args, kwargs) -> args
        v_fmt, img_fmt = fmt_tree
        v2 = jax.tree_util.tree_map(
            lambda x, f: jax.device_put(x, f), variables, v_fmt
        )
        imgs2 = jax.device_put(imgs, img_fmt)
        auto_rate, auto_s = rate(compiled_auto, v2, imgs2, n)
        report["auto_layout_img_per_s"] = round(auto_rate, 1)
        report["auto_layout_ms_per_batch"] = round(auto_s * 1e3, 2)
    print(
        json.dumps(
            {
                "leg": "layout",
                "differing": len(diff),
                **{
                    k: v
                    for k, v in report.items()
                    if k.startswith("auto_layout")
                },
            }
        ),
        flush=True,
    )

    # --- A1b: row-major arrival honesty — device relayout of the uint8
    # batch into the compiler-preferred image format, CHAINED with the
    # AUTO-layout e2e. If (relayout + e2e_auto) still beats baseline, the
    # layout win survives production row-major input arrival.
    if diff:
        img_fmt_pinned = img_fmt

        def relayout(x):
            return jax.device_put(x, img_fmt_pinned)

        def chained(v, raw_imgs):
            return compiled_auto(v, relayout(raw_imgs))

        # relayout cost in isolation (pipelined marginal, same harness)
        def relayout_only(v, raw_imgs):
            # sync() device_gets ['valid'] — keep it tiny (tunnel!); the
            # slice dispatches after the relayout, FIFO implies completion
            return {"valid": relayout(raw_imgs)[0, 0, 0, :3]}

        rl_rate, rl_s = rate(relayout_only, variables, imgs, n)
        report["relayout_ms_per_batch"] = round(rl_s * 1e3, 2)
        ch_rate, ch_s = rate(chained, v2, imgs, n)
        report["chained_img_per_s"] = round(ch_rate, 1)
        report["chained_ms_per_batch"] = round(ch_s * 1e3, 2)
        print(
            json.dumps(
                {
                    "leg": "relayout+auto (row-major arrival)",
                    "relayout_ms": report["relayout_ms_per_batch"],
                    "img_per_s": report["chained_img_per_s"],
                    "vs_baseline": round(ch_rate / base_rate, 3),
                }
            ),
            flush=True,
        )

    # --- A2: AUTO layouts for WEIGHTS only (image stays row-major, so any
    # image relayout the graph wants remains INSIDE the timed program —
    # matches production serving where batches arrive row-major from host)
    if diff:
        w_auto = jax.jit(
            e2e,
            in_shardings=(
                jax.tree_util.tree_map(
                    lambda _: Format(Layout.AUTO), variables
                ),
                None,
            ),
        )
        compiled_w = w_auto.lower(variables, imgs).compile()
        wf = compiled_w.input_formats
        if (
            isinstance(wf, tuple)
            and len(wf) == 2
            and isinstance(wf[1], dict)
        ):
            wf = wf[0]
        v_wf, _ = wf
        v3 = jax.tree_util.tree_map(
            lambda x, f: jax.device_put(x, f), variables, v_wf
        )
        wr, ws = rate(compiled_w, v3, imgs, n)
        report["weightsauto_img_per_s"] = round(wr, 1)
        report["weightsauto_ms_per_batch"] = round(ws * 1e3, 2)
        print(
            json.dumps(
                {
                    "leg": "weights-auto",
                    "img_per_s": report["weightsauto_img_per_s"],
                    "vs_baseline": round(wr / base_rate, 3),
                }
            ),
            flush=True,
        )

    # --- B: double-buffered half batches ---
    half = jax.jit(e2e)
    imgs_h0 = jax.device_put(images_for(bs // 2))
    imgs_h1 = jax.device_put(images_for(bs // 2))  # distinct: relay caching

    def two_halves(v, ih):
        # two pipelined dispatches; the device runs programs in FIFO order,
        # so syncing the second implies the first completed
        half(v, ih)
        return half(v, imgs_h1)

    hb_rate, hb_s = rate(two_halves, variables, imgs_h0, n)
    # two_halves processes bs images total (2 x bs/2)
    hb_rate *= 2.0
    report["halfbatch_img_per_s"] = round(hb_rate, 1)
    report["halfbatch_ms_per_full_batch"] = round(hb_s * 1e3, 2)
    print(
        json.dumps(
            {
                "leg": "halfbatch",
                "img_per_s": report["halfbatch_img_per_s"],
                "vs_baseline": round(hb_rate / base_rate, 3),
            }
        ),
        flush=True,
    )

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0] if a else "v8-n",
        int(a[1]) if len(a) > 1 else 128,
        int(a[2]) if len(a) > 2 else 30,
    )
