"""Checkpointing: Orbax save/restore + PyTorch .pt weight converter.

Goes beyond the reference's save-only torch.save of bare state_dicts
(train.py:410-425 — no optimizer/epoch state, so no true resume,
SURVEY.md §5): checkpoints here carry params + batch_stats + opt_state +
step/epoch + PRNG key, so training resumes exactly. Policies preserved:
best.ckpt on metric improvement, last.ckpt every epoch, epoch_N every
save_period.

`torch_state_dict_to_variables` converts a reference-format .pt checkpoint
(including 'model'/'state_dict' wrappers and the DataParallel 'module.'
prefix, utils.py:54-67) into our flax variable pytree for parity testing and
fine-tuning from reference weights. Layout transposes: torch conv OIHW ->
flax HWIO; BN weight/bias -> scale/bias; running stats -> batch_stats.
"""

from __future__ import annotations

import os

from typing import Any

import jax
import numpy as np


# --------------------------------------------------------------------------
# Orbax
# --------------------------------------------------------------------------


def _checkpointer(local_only: bool = False):
    import orbax.checkpoint as ocp

    if local_only:
        # Process-0-only save for preemption on a pod: orbax's default save
        # barriers over ALL processes (Checkpointer.save ->
        # sync_global_processes), which deadlocks when peers have already
        # exited on SIGTERM. active_processes={0} restricts every barrier to
        # the primary, so the save completes alone. The tree passed in is
        # host numpy (see _to_host), so no device collectives either.
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0,
                active_processes={0},
                barrier_sync_key_prefix="local_only",
            ),
        )
    return ocp.PyTreeCheckpointer()


def _to_host(tree: Any) -> Any:
    """Fetch a pytree to host WITHOUT cross-host collectives.

    `jax.device_get` on a multi-process global array issues an allgather —
    which deadlocks during preemption when a peer process has already
    exited (its Gloo/ICI handshake never completes). The train state is
    replicated, so every host's local shard IS the global value: read it
    directly. Sharded leaves (no current caller saves any) still go through
    device_get, which is collective-free for fully-addressable arrays.
    """

    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            shard = x.addressable_data(0)
            if shard.shape == x.shape:  # replicated: local replica == value
                return np.asarray(shard)
        return jax.device_get(x)

    return jax.tree_util.tree_map(leaf, tree)


def save_checkpoint(path: str, state: Any, local_only: bool = False) -> None:
    """Save a pytree checkpoint (params/opt_state/step/...).

    ``local_only=True`` saves from process 0 without any cross-process
    barrier — required during preemption, when peer processes may already
    be gone (they drain and exit while the primary saves)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer(local_only and jax.process_count() > 1)
    ckptr.save(path, _to_host(state), force=True)


def restore_checkpoint(path: str, target: Any | None = None) -> Any:
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if target is not None:
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)


class CheckpointManager:
    """best / last / periodic checkpoint policy (train.py:410-425 parity).

    ``best_metric`` persists to ``best_metric.json`` beside the checkpoints
    and is reloaded on construction, so a resumed run never overwrites
    ``best.ckpt`` with a worse model than the pre-preemption best.

    Multi-host: every process constructs the manager (so ``best_metric``
    tracking stays consistent for the return value of ``on_epoch_end``), but
    only process 0 writes — concurrent writers on a pod's shared output dir
    would corrupt/interleave checkpoints and the json.
    """

    def __init__(self, directory: str, save_period: int = 10):
        from yolo_ms_tpu.parallel.distributed import is_primary_process

        self.dir = os.path.abspath(directory)
        self.primary = is_primary_process()
        if self.primary:
            os.makedirs(self.dir, exist_ok=True)
        self.save_period = save_period
        self.best_metric = self._load_best_metric()

    def _best_metric_path(self) -> str:
        return os.path.join(self.dir, "best_metric.json")

    def _load_best_metric(self) -> float:
        import json

        try:
            with open(self._best_metric_path()) as f:
                return float(json.load(f)["best_metric"])
        except (OSError, ValueError, KeyError):
            return float("-inf")

    def _save_best_metric(self) -> None:
        import json

        with open(self._best_metric_path(), "w") as f:
            json.dump({"best_metric": self.best_metric}, f)

    def on_epoch_end(self, state, epoch: int, metric: float | None = None):
        # local_only: these saves run on the PRIMARY only, so the default
        # orbax checkpointer — whose save barriers over ALL processes —
        # would deadlock every multi-process fit at the first epoch end.
        # The process-0-scoped checkpointer completes alone; the state
        # passed in is host numpy (Trainer.fit fetches it collective-free).
        if self.primary:
            save_checkpoint(
                os.path.join(self.dir, "last.ckpt"), state, local_only=True
            )
            if (epoch + 1) % self.save_period == 0:
                save_checkpoint(
                    os.path.join(self.dir, f"epoch_{epoch + 1}.ckpt"),
                    state,
                    local_only=True,
                )
        if metric is not None and metric > self.best_metric:
            self.best_metric = metric
            if self.primary:
                self._save_best_metric()
                save_checkpoint(
                    os.path.join(self.dir, "best.ckpt"), state, local_only=True
                )
            return True
        return False


# --------------------------------------------------------------------------
# PyTorch .pt -> flax variables
# --------------------------------------------------------------------------


def _unwrap_state_dict(ckpt) -> dict:
    if isinstance(ckpt, dict):
        if "model" in ckpt and isinstance(ckpt["model"], dict):
            ckpt = ckpt["model"]
        elif "state_dict" in ckpt and isinstance(ckpt["state_dict"], dict):
            ckpt = ckpt["state_dict"]
    if any(k.startswith("module.") for k in ckpt):
        ckpt = {k.removeprefix("module."): v for k, v in ckpt.items()}
    return ckpt


def _set(tree: dict, path: list[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_SEQ_IDX_TO_NAME = {0: "conv1", 1: "conv2", 2: "pred"}


def torch_state_dict_to_variables(state_dict: dict) -> dict:
    """Map a reference-architecture torch state dict to flax variables.

    Key grammar (reference module tree, yolov8.py:8-21):
      backbone.(conv0|conv1|conv3|conv5|conv7).(conv|bn).*
      backbone.(c2f_2|c2f_4|c2f_6|c2f_8).(conv1|conv2).(conv|bn).* | .m.{i}.conv{1,2}.(conv|bn).*
      backbone.sppf.(conv1|conv2).(conv|bn).*
      neck.(c2f_1..c2f_4) like c2f; neck.(conv1|conv2).(conv|bn).*
      head.(box|cls).{lvl}.{0|1}.(conv|bn).* | .{2}.(weight|bias)   [branch seq]
      head.dfl.conv.weight  -> dropped (frozen arange conv; decode is
                               computed analytically in models/decode.py)
    """
    sd = _unwrap_state_dict(state_dict)
    params: dict = {}
    batch_stats: dict = {}

    for key, tensor in sd.items():
        t = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parts = key.split(".")
        if parts[0] == "head" and parts[1] == "dfl":
            continue  # analytic in decode
        if "num_batches_tracked" in key:
            continue

        # normalize head branch indices: head.box.0.1.bn.weight
        if parts[0] == "head" and parts[1] in ("box", "cls"):
            lvl, seq = parts[2], int(parts[3])
            base = [parts[0], f"{parts[1]}_{lvl}", _SEQ_IDX_TO_NAME[seq]]
            rest = parts[4:]
            if seq == 2:  # plain Conv2d: weight/bias
                name = rest[0]
                if name == "weight":
                    _set(params, base + ["kernel"], t.transpose(2, 3, 1, 0))
                else:
                    _set(params, base + ["bias"], t)
                continue
            parts = base + rest  # fall through to Conv/BN handling
        else:
            # C2f bottleneck list: ...m.{i}... -> m_{i}
            parts = [
                f"m_{parts[i + 1]}" if p == "m" and parts[i + 1].isdigit() else p
                for i, p in enumerate(parts)
            ]
            parts = [p for i, p in enumerate(parts) if not (p.isdigit() and parts[i - 1].startswith("m_"))]

        leaf = parts[-1]
        mod = parts[-2]
        base = parts[:-2]
        if mod == "conv" and leaf == "weight":
            _set(params, base + ["conv", "kernel"], t.transpose(2, 3, 1, 0))
        elif mod == "bn":
            if leaf == "weight":
                _set(params, base + ["bn", "scale"], t)
            elif leaf == "bias":
                _set(params, base + ["bn", "bias"], t)
            elif leaf == "running_mean":
                _set(batch_stats, base + ["bn", "mean"], t)
            elif leaf == "running_var":
                _set(batch_stats, base + ["bn", "var"], t)
        else:
            raise KeyError(f"Unmapped torch key: {key}")

    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pt file into flax variables (requires torch, CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return torch_state_dict_to_variables(ckpt)


def load_serving_variables(checkpoint_path: str) -> dict:
    """Any checkpoint flavor -> serving variables (shared by the test/val
    CLIs): reference .pt files (auto-converted), full orbax train states
    (EMA weights + EMA BN stats preferred — the validated pair), plain eval
    variables, or BN-folded deploy exports ({'params'} only)."""
    import os

    if not os.path.exists(checkpoint_path):
        raise FileNotFoundError(f"Checkpoint file not found: {checkpoint_path}")
    if checkpoint_path.endswith((".pt", ".pth")):
        return load_torch_checkpoint(checkpoint_path)
    restored = restore_checkpoint(checkpoint_path)
    if "params" not in restored and "state" in restored:
        state = restored["state"]
        restored = {
            "params": state.get("ema_params") or state["params"],
            "batch_stats": state.get("ema_batch_stats") or state["batch_stats"],
        }
    if "batch_stats" in restored:
        return {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }
    return {"params": restored["params"]}  # deploy export: BN folded
