"""Optimizer / LR-schedule factories — optax equivalents of utils.py:11-43.

Parity notes:
- adam: betas + L2 weight decay added to gradients (torch Adam semantics,
  NOT decoupled AdamW) — optax.add_decayed_weights before the adam transform.
- sgd: momentum + nesterov + L2 weight decay (utils.py:20-23).
- schedulers: cosine annealing (T_max, eta_min) and step decay
  (step_size, gamma), stepped PER EPOCH like torch's schedulers
  (train.py:400-401) — the factory converts to per-step boundaries given
  steps_per_epoch.
- freeze_layers: substring-pattern parameter freezing (utils.py:84-94) via
  optax.masked zero-gradients.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

from yolo_ms_tpu.utils.config import TrainingConfig


def build_schedule(cfg: TrainingConfig, steps_per_epoch: int) -> Callable:
    base_lr = cfg.learning_rate
    s = cfg.scheduler
    kind = (s.type or "none").lower()
    if kind == "cosine":
        t_max_epochs = s.cosine_t_max or cfg.epochs
        sched = optax.cosine_decay_schedule(
            init_value=base_lr,
            decay_steps=max(1, t_max_epochs * steps_per_epoch),
            alpha=s.cosine_eta_min / base_lr if base_lr > 0 else 0.0,
        )
    elif kind == "step":
        boundaries = {}
        n_drops = max(1, cfg.epochs // max(1, s.step_lr_size))
        for i in range(1, n_drops + 1):
            boundaries[i * s.step_lr_size * steps_per_epoch] = s.step_lr_gamma
        sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    elif kind == "none":
        sched = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"Unsupported scheduler: {s.type}")

    if s.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base_lr, s.warmup_steps)
        sched = optax.join_schedules([warmup, sched], [s.warmup_steps])
    return sched


def freeze_mask(params, patterns: list[str]):
    """True = trainable. Substring match on the '/'-joined param path
    (utils.py:84-94 semantics).

    Reference configs write patterns with torch's dot separator
    ("backbone.conv1", finetune_example.yaml / utils.py:84-94); flax paths
    join with '/'. Both separators are accepted — dots in patterns are
    normalized to '/' so reference finetune configs freeze what they say.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    norm_patterns = [pat.replace(".", "/") for pat in patterns]

    def path_str(path):
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )

    frozen_paths = {
        path_str(p)
        for p, _ in flat
        if any(pat in path_str(p) for pat in norm_patterns)
    }

    def mask_fn(path, _):
        return path_str(path) not in frozen_paths

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def build_optimizer(
    cfg: TrainingConfig, steps_per_epoch: int, params=None
) -> tuple[optax.GradientTransformation, Callable]:
    """Returns (optimizer, lr_schedule_fn)."""
    sched = build_schedule(cfg, steps_per_epoch)
    name = cfg.optimizer.lower()
    chain = []
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay and cfg.weight_decay > 0:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    if name == "adam":
        b1, b2 = cfg.adam_betas
        chain.append(optax.scale_by_adam(b1=b1, b2=b2))
    elif name == "sgd":
        if cfg.sgd_momentum > 0:
            chain.append(
                optax.trace(decay=cfg.sgd_momentum, nesterov=cfg.sgd_nesterov)
            )
    else:
        raise ValueError(f"Unsupported optimizer: {cfg.optimizer}")
    chain.append(optax.scale_by_learning_rate(sched))
    tx = optax.chain(*chain)

    if params is not None and cfg.freeze_layers:
        mask = freeze_mask(params, cfg.freeze_layers)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "frozen", mask),
        )
    accum = getattr(cfg, "grad_accum_steps", 1) or 1
    if accum > 1:
        # Gradient accumulation: the wrapped transform averages gradients
        # over k consecutive train-step calls and applies the inner update
        # (incl. the LR schedule's step count) once per k — effective batch
        # k*batch_size for configs whose real batch doesn't fit HBM. Wrapped
        # OUTSIDE the freeze mask so frozen params stay zero every step.
        tx = optax.MultiSteps(tx, every_k_schedule=accum).gradient_transformation()
    return tx, sched
