"""Deploy-time graph optimization: fold BatchNorm into conv weights.

The serving-path equivalent of the reference's implicit torch eval
semantics, taken one step further: at inference, BatchNorm is an affine
per-channel transform that folds exactly into the preceding conv

    kernel' = kernel * gamma / sqrt(var + eps)        (per out-channel)
    bias'   = beta - mean * gamma / sqrt(var + eps)

Removing the BN ops from the traced graph matters far beyond the FLOPs
they cost: with BN as separate ops, XLA's layout assignment places each
narrow-channel conv in batch-minor layout but the per-channel BN broadcasts
in channel-minor layout, inserting a full relayout copy on BOTH sides of
every early conv — measured 43% of the v8-n bs=32 forward on v5e
(PERF.md). With folding, bias+SiLU fuse into the conv epilogue.

Usage:

    variables = fold_batchnorm(variables)        # train -> deploy params
    with deploy_mode():
        out = jax.jit(model.apply)(variables, x, train=False)

``deploy_mode`` (re-exported from nn.blocks) must be active whenever the
folded variables are traced — ConvBnSiLU then builds conv(+bias)+SiLU with
no BN. Equivalence with the train-structure eval path is asserted in
tests/test_deploy.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from yolo_ms_tpu.nn.blocks import BN_EPS, deploy_mode  # noqa: F401 (re-export)


def _is_conv_bn(sub: dict) -> bool:
    return (
        isinstance(sub, dict)
        and isinstance(sub.get("conv"), dict)
        and "kernel" in sub["conv"]
        and isinstance(sub.get("bn"), dict)
        and "scale" in sub["bn"]
    )


def _has_bn_stats(stats: dict) -> bool:
    return (
        isinstance(stats, dict)
        and isinstance(stats.get("bn"), dict)
        and "mean" in stats["bn"]
    )


def _fold(params: dict, stats: dict, path: str = "") -> dict:
    out = {}
    for key, sub in params.items():
        sub_path = f"{path}/{key}" if path else key
        sub_stats = stats.get(key, {}) if isinstance(stats, dict) else {}
        if _is_conv_bn(sub):
            if not _has_bn_stats(sub_stats):
                # Fail fast: silently skipping would export an artifact with
                # 'bn' params but no batch_stats, which only surfaces later
                # as a confusing flax structure error at load time.
                raise ValueError(
                    f"fold_batchnorm: conv+bn params at '{sub_path}' have no "
                    "matching batch_stats['bn'] (mean/var) — cannot fold; "
                    "was the model initialized/trained with mutable "
                    "batch_stats?"
                )
            gamma = sub["bn"]["scale"]
            beta = sub["bn"]["bias"]
            mean = sub_stats["bn"]["mean"]
            var = sub_stats["bn"]["var"]
            f = gamma / jnp.sqrt(var + BN_EPS)  # [C_out]
            folded = {
                "conv": {
                    # HWIO (and depthwise [k,k,1,C]): C_out is the last axis
                    "kernel": sub["conv"]["kernel"] * f,
                    "bias": beta - mean * f,
                }
            }
            rest = {
                k: v for k, v in sub.items() if k not in ("conv", "bn")
            }
            if rest:
                folded.update(_fold(rest, sub_stats, sub_path))
            out[key] = folded
        elif isinstance(sub, dict):
            out[key] = _fold(sub, sub_stats, sub_path)
        else:
            out[key] = sub
    return out


def fold_batchnorm(variables: dict) -> dict:
    """{'params', 'batch_stats'} train-structure variables -> {'params'}
    deploy-structure variables (every ConvBnSiLU's BN folded into conv)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return {"params": _fold(params, stats)}


def _tree_has_key(tree, key: str) -> bool:
    if not isinstance(tree, dict):
        return False
    return any(
        k == key or _tree_has_key(v, key) for k, v in tree.items()
    )


def is_deploy_variables(variables: dict) -> bool:
    """True when the variables are already BN-folded (deploy structure):
    no batch_stats collection and no 'bn' subtree anywhere in params
    (every train-structure ConvBnSiLU owns one)."""
    return "batch_stats" not in variables and not _tree_has_key(
        variables.get("params", {}), "bn"
    )
