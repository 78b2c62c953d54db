"""Deploy-checkpoint export CLI — `python -m yolo_ms_tpu.tools.export`.

Converts a training checkpoint (orbax train state, eval variables, or a
reference .pt file) into a serving artifact: BatchNorm folded into conv
kernels/biases (models/deploy.py), optionally cast to bfloat16 for a
half-size file. The exported checkpoint loads directly into the Predictor
and tools.test (detected via models.deploy.is_deploy_variables) and traces
the conv(+bias)+SiLU deploy graph — the reference has no deploy/export
story at all (its serving path re-runs train-mode BN every forward).

`--stablehlo out.bin` additionally serializes the ENTIRE serving pipeline
(uint8 normalize -> BN-folded bf16 forward -> fused DFL decode + NMS) as a
self-contained jax.export StableHLO artifact with the weights baked in as
constants: `jax.export.deserialize(bytes).call(images_u8)` reproduces the
Predictor's device outputs with no model code, checkpoint, or Python
package on the serving side — the TPU-native analog of TorchScript/ONNX
export (which the reference lacks entirely).
"""

from __future__ import annotations

import argparse


def run(checkpoint_path: str, output_path: str, bf16: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from yolo_ms_tpu.models.deploy import fold_batchnorm, is_deploy_variables
    from yolo_ms_tpu.utils.checkpoint import (
        load_torch_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    if checkpoint_path.endswith((".pt", ".pth")):
        variables = load_torch_checkpoint(checkpoint_path)
    else:
        restored = restore_checkpoint(checkpoint_path)
        if "params" not in restored and "state" in restored:
            state = restored["state"]
            # EMA-trained runs validate (and pick best.ckpt by) the EMA
            # weights — export those, not the raw params, or the serving
            # artifact silently differs from the validated model.
            params = state.get("ema_params") or state["params"]
            batch_stats = state.get("ema_batch_stats") or state["batch_stats"]
            restored = {
                "params": params,
                "batch_stats": batch_stats,
            }
        variables = restored

    if is_deploy_variables(variables):
        folded = {"params": variables["params"]}
    else:
        folded = fold_batchnorm(variables)
    if bf16:
        folded = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            folded,
        )

    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(folded["params"])
    )
    nbytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(folded["params"])
    )
    save_checkpoint(output_path, folded)
    info = {
        "output": output_path,
        "params": int(n_params),
        "bytes": int(nbytes),
        "dtype": "bfloat16" if bf16 else "float32",
    }
    print(
        f"Exported deploy checkpoint: {output_path} "
        f"({n_params / 1e6:.2f}M params, {nbytes / 1e6:.1f} MB, "
        f"{'bf16' if bf16 else 'f32'})"
    )
    return info


def export_stablehlo(
    variables: dict,
    arch: str,
    num_classes: int,
    output_path: str,
    batch: int = 1,
    img_size: tuple[int, int] = (640, 640),
    platforms: list[str] | None = None,
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
) -> dict:
    """Serialize the full serving fn to a self-contained StableHLO artifact.

    `variables` must be deploy-mode (BN-folded) variables; they are baked
    into the graph as constants. The artifact's calling convention is
    images_u8 [batch, H, W, 3] uint8 -> the fused_postprocess output dict
    (boxes/scores/classes/valid), identical to the Predictor's device step.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from yolo_ms_tpu.data.augment import device_normalize_images
    from yolo_ms_tpu.models.deploy import deploy_mode, is_deploy_variables
    from yolo_ms_tpu.models.registry import build_model
    from yolo_ms_tpu.ops.postprocess import fused_postprocess

    assert is_deploy_variables(variables), "fold_batchnorm first"
    model = build_model(arch, num_classes=num_classes, dtype=jnp.bfloat16)

    def serve(images_u8):
        x = device_normalize_images(images_u8, jnp.bfloat16)
        with deploy_mode():
            raw = model.apply(variables, x, train=False, split_head=True)
        return fused_postprocess(
            raw, num_classes, conf_thresh=conf_thresh, iou_thresh=iou_thresh
        )

    spec = jax.ShapeDtypeStruct((batch, *img_size, 3), jnp.uint8)
    exp = jexport.export(
        jax.jit(serve),
        platforms=tuple(platforms) if platforms else None,
    )(spec)
    blob = exp.serialize()
    with open(output_path, "wb") as f:
        f.write(blob)
    info = {
        "output": output_path,
        "bytes": len(blob),
        "platforms": list(exp.platforms),
        "input": f"uint8[{batch},{img_size[0]},{img_size[1]},3]",
    }
    print(
        f"Exported StableHLO serving artifact: {output_path} "
        f"({len(blob) / 1e6:.1f} MB, platforms {list(exp.platforms)}, "
        f"input {info['input']})"
    )
    return info


def main() -> None:
    p = argparse.ArgumentParser(description="Export a BN-folded deploy checkpoint")
    p.add_argument("--checkpoint", required=True, help=".ckpt dir or .pt file")
    p.add_argument("--output", required=True, help="output .ckpt path")
    p.add_argument(
        "--bf16", action="store_true", help="store weights in bfloat16 (half size)"
    )
    p.add_argument(
        "--stablehlo",
        default=None,
        help="also serialize the full serving fn (weights baked in) to this path",
    )
    p.add_argument("--arch", default="yolo-ms-xs", help="model for --stablehlo")
    p.add_argument("--num_classes", type=int, default=80)
    p.add_argument("--batch", type=int, default=1, help="--stablehlo batch size")
    p.add_argument(
        "--img_size", type=int, nargs=2, default=[640, 640], metavar=("H", "W")
    )
    p.add_argument(
        "--platforms",
        default=None,
        help="comma list (e.g. tpu,cpu); default: current backend",
    )
    args = p.parse_args()
    run(args.checkpoint, args.output, bf16=args.bf16)
    if args.stablehlo:
        from yolo_ms_tpu.utils.checkpoint import restore_checkpoint

        export_stablehlo(
            restore_checkpoint(args.output),
            args.arch,
            args.num_classes,
            args.stablehlo,
            batch=args.batch,
            img_size=tuple(args.img_size),
            platforms=args.platforms.split(",") if args.platforms else None,
        )


if __name__ == "__main__":
    main()
