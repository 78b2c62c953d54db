"""Deploy-checkpoint export CLI — `python -m yolo_ms_tpu.tools.export`.

Converts a training checkpoint (orbax train state, eval variables, or a
reference .pt file) into a serving artifact: BatchNorm folded into conv
kernels/biases (models/deploy.py), optionally cast to bfloat16 for a
half-size file. The exported checkpoint loads directly into the Predictor
and tools.test (detected via models.deploy.is_deploy_variables) and traces
the conv(+bias)+SiLU deploy graph — the reference has no deploy/export
story at all (its serving path re-runs train-mode BN every forward).
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


def main() -> None:
    p = argparse.ArgumentParser(description="Export a BN-folded deploy checkpoint")
    p.add_argument("--checkpoint", required=True, help=".ckpt dir or .pt file")
    p.add_argument("--output", required=True, help="output .ckpt path")
    p.add_argument(
        "--bf16", action="store_true", help="store weights in bfloat16 (half size)"
    )
    args = p.parse_args()
    run(args.checkpoint, args.output, bf16=args.bf16)


if __name__ == "__main__":
    main()
