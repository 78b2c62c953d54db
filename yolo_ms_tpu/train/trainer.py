"""Training pipeline: jit+GSPMD data-parallel train step, validation, ckpts.

Rebuild of the reference training entry (tools/train.py:167-437) as a
TPU-native pipeline:

- ONE compiled train step (forward + TAL loss + backward + optax update +
  BatchNorm stat update) over a `jax.sharding.Mesh`; the batch is sharded on
  the 'data' axis, params replicated — XLA inserts the gradient all-reduce
  over ICI and BatchNorm statistics are global-batch (SyncBN) for free.
- jit-safe NaN/Inf guard: a non-finite loss leaves params/opt_state unchanged
  (the reference skips the batch in Python, train.py:365-368).
- Validation: jitted forward+decode+NMS, host-side COCO-protocol mAP
  (train.py:20-165 semantics — conf filter, per-class NMS, mAP@0.5 — without
  the per-class Python loops).
- Checkpoints: best/last/epoch_N with FULL training state (params, EMA batch
  stats, opt_state, step, epoch, PRNG) — true resume, which the reference
  lacks (SURVEY.md §5).
- TensorBoard scalars with the reference's tag names (utils/logging.py).
- Fine-tuning: reference .pt weights via the converter, and
  freeze_layers substring patterns via optax.multi_transform masking
  (utils.py:45-94 parity).
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from yolo_ms_tpu.data.augment import device_normalize_images
from yolo_ms_tpu.data.coco import CocoDetectionDataset
from yolo_ms_tpu.data.loader import DetectionLoader
from yolo_ms_tpu.eval.coco_map import MeanAveragePrecision
from yolo_ms_tpu.models.registry import build_model, init_model
from yolo_ms_tpu.ops.iou import xywh_to_xyxy
from yolo_ms_tpu.ops.postprocess import fused_postprocess
from yolo_ms_tpu.parallel.distributed import barrier
from yolo_ms_tpu.parallel.mesh import (
    batch_sharding,
    hybrid_batch_sharding,
    make_mesh,
    make_mesh_2d,
    replicated_sharding,
)
from yolo_ms_tpu.train.loss import DetectionLoss
from yolo_ms_tpu.train.optim import build_optimizer
from yolo_ms_tpu.utils.checkpoint import CheckpointManager, load_torch_checkpoint, restore_checkpoint
from yolo_ms_tpu.utils.config import Config
from yolo_ms_tpu.utils.logging import MetricLogger


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray
    ema_params: Any = None  # exponential moving average (None = disabled)
    # EMA of the BatchNorm running stats, kept in lockstep with ema_params:
    # evaluating EMA params against raw batch stats is internally
    # inconsistent (ultralytics EMAs the WHOLE model incl. BN buffers).
    ema_batch_stats: Any = None


def make_train_step(model, loss_fn: DetectionLoss, tx, ema_decay: float = 0.0):
    """Build the pure train-step function (jit it with shardings outside).

    ema_decay > 0 maintains an exponential moving average of the params
    (standard detection-training practice; evaluated weights are the EMA).
    """

    def train_step(state: TrainState, batch):
        images = device_normalize_images(batch["images"], model.dtype)

        def compute_loss(params):
            raw, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            loss, metrics = loss_fn(
                raw, batch["boxes"], batch["labels"], batch["mask"]
            )
            return loss, (metrics, updates["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # NaN/Inf guard: freeze the state on a bad step (train.py:365-368).
        # Checks the optimizer UPDATES, not just the loss: a finite loss can
        # coexist with nonfinite grads (e.g. zero-variance train-mode BN on a
        # degenerate constant input amplifies the backward by ~rsqrt(eps) per
        # layer until it overflows, then inf * zero-activation = nan in the
        # conv kernel grads while every loss term stays finite).
        good = jnp.isfinite(loss) & jax.tree_util.tree_reduce(
            lambda acc, u: acc & jnp.all(jnp.isfinite(u)),
            updates,
            jnp.asarray(True),
        )

        def pick(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(good, n, o), new, old
            )

        new_ema = state.ema_params
        new_ema_bs = state.ema_batch_stats
        if ema_decay > 0.0 and state.ema_params is not None:
            # warmup-aware decay (ramps in over the first ~2k steps)
            d = ema_decay * (
                1.0 - jnp.exp(-(state.step.astype(jnp.float32) + 1.0) / 2000.0)
            )

            def ema_update(avg, new):
                return jax.tree_util.tree_map(
                    lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), avg, new
                )

            new_ema = pick(ema_update(state.ema_params, new_params), state.ema_params)
            if state.ema_batch_stats is not None:
                new_ema_bs = pick(
                    ema_update(state.ema_batch_stats, new_bs),
                    state.ema_batch_stats,
                )

        new_state = state.replace(
            params=pick(new_params, state.params),
            batch_stats=pick(new_bs, state.batch_stats),
            opt_state=pick(new_opt_state, state.opt_state),
            step=state.step + 1,
            ema_params=new_ema,
            ema_batch_stats=new_ema_bs,
        )
        metrics = dict(metrics)
        metrics["skipped_nonfinite"] = 1.0 - good.astype(jnp.float32)
        return new_state, metrics

    return train_step


class Trainer:
    def __init__(self, cfg: Config, verbose: bool = True):
        self.cfg = cfg
        self.verbose = verbose
        mcfg, dcfg, tcfg = cfg.model, cfg.dataset, cfg.training
        self.img_size = tuple(mcfg.input_size)
        dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else jnp.float32
        if dtype == jnp.float32:
            # float32 means float32: TPU's default matmul precision runs f32
            # contractions as fast reduced-precision bf16 passes, which is
            # NOT what a user asking for float32 compute (reference torch
            # semantics) expects — measured 0.70 vs 0.94 final mAP@0.5 on
            # the synthetic learning recipe (PERF.md r3). bfloat16 compute
            # is unaffected (bf16 MXU ops are native single-pass).
            jax.config.update("jax_default_matmul_precision", "highest")

        self.model = build_model(
            mcfg.architecture,
            num_classes=dcfg.num_classes,
            reg_max=mcfg.reg_max,
            dtype=dtype,
        )
        self.loss_fn = DetectionLoss(
            num_classes=dcfg.num_classes,
            reg_max=mcfg.reg_max,
            box_weight=cfg.loss.box_weight,
            cls_weight=cfg.loss.cls_weight,
            dfl_weight=cfg.loss.dfl_weight,
            use_focal=cfg.loss.use_focal,
            alpha=cfg.loss.alpha,
            gamma=cfg.loss.gamma,
            tal_topk=cfg.loss.tal_topk,
            iou_type=cfg.loss.iou_type,
        )

        # --- data ---
        self.train_loader = None
        self.val_loader = None
        if dcfg.train_annotations_path:
            train_ds = CocoDetectionDataset(
                dcfg.train_images_path,
                dcfg.train_annotations_path,
                num_classes=dcfg.num_classes,
                verbose=verbose,
            )
            self.train_loader = DetectionLoader(
                train_ds,
                batch_size=tcfg.batch_size,
                img_size=self.img_size,
                max_gt=dcfg.max_gt,
                is_train=True,
                augmentation=tcfg.augmentation.as_dict(),
                seed=tcfg.seed,
                num_workers=cfg.workers,
                device_normalize=True,
                multiscale_sizes=getattr(tcfg, "multiscale_sizes", None),
                multiscale_interval=getattr(tcfg, "multiscale_interval", 10),
                # pod data parallelism: batch_size is the GLOBAL batch; each
                # host decodes only its own rows (deterministic shard of the
                # identical global batch — see DetectionLoader.process_shard)
                process_shard=(jax.process_index(), jax.process_count()),
            )
        if dcfg.val_annotations_path:
            val_ds = CocoDetectionDataset(
                dcfg.val_images_path,
                dcfg.val_annotations_path,
                num_classes=dcfg.num_classes,
                verbose=verbose,
            )
            # Pod val feed (VERDICT r4 item 6): when the eval batch shards
            # over the pure-DP mesh, each host decodes only ITS image rows
            # (targets stay global — mAP accumulation is identical on every
            # host). Requires the sharded-eval preconditions below, computed
            # here without the mesh (built later in __init__): pure DP
            # (spatial==1 => mesh 'data' axis == total devices) and the eval
            # batch dividing the device count.
            val_images_shard = (
                jax.process_count() > 1
                and max(1, int(cfg.parallel.spatial)) == 1
                and cfg.evaluation.batch_size % len(jax.devices()) == 0
                and cfg.evaluation.batch_size % jax.process_count() == 0
            )
            self.val_loader = DetectionLoader(
                val_ds,
                batch_size=cfg.evaluation.batch_size,
                img_size=self.img_size,
                max_gt=dcfg.max_gt,
                is_train=False,
                seed=tcfg.seed,
                num_workers=cfg.workers,
                drop_last=False,
                device_normalize=True,
                process_shard=(
                    (jax.process_index(), jax.process_count())
                    if val_images_shard
                    else None
                ),
                shard_images_only=val_images_shard,
            )
            self._val_images_local = val_images_shard

        # --- init / pretrained ---
        rng = jax.random.PRNGKey(tcfg.seed)
        variables = init_model(self.model, rng, self.img_size)
        variables = self._maybe_load_pretrained(variables)
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]

        steps_per_epoch = len(self.train_loader) if self.train_loader else 1
        # With gradient accumulation the schedule sees one step per APPLIED
        # optimizer update, so per-epoch boundaries shrink by the factor.
        accum = max(1, getattr(tcfg, "grad_accum_steps", 1) or 1)
        self.tx, self.lr_schedule = build_optimizer(
            tcfg, max(1, steps_per_epoch // accum), params=self.params
        )

        # --- mesh + shardings ---
        # parallel.spatial > 1: hybrid DP x SP — batch over 'data', image
        # height over 'spatial' (high-res training where per-chip activation
        # memory binds; equivalence vs pure DP in tests/test_spatial_sharding.py)
        spatial = max(1, int(cfg.parallel.spatial))
        if spatial > 1:
            n_dev = len(jax.devices())
            if n_dev % spatial:
                raise ValueError(
                    f"parallel.spatial={spatial} must divide the device "
                    f"count ({n_dev})"
                )
            if self.img_size[0] % spatial:
                raise ValueError(
                    f"parallel.spatial={spatial} must divide the image "
                    f"height ({self.img_size[0]})"
                )
            for s in getattr(tcfg, "multiscale_sizes", None) or []:
                if int(s) % spatial:
                    raise ValueError(
                        f"parallel.spatial={spatial} must divide every "
                        f"multiscale size (got {s})"
                    )
            self.mesh = make_mesh_2d(n_dev // spatial, spatial)
            image_sh = hybrid_batch_sharding(self.mesh)
        else:
            self.mesh = make_mesh()
            image_sh = None
        self.repl = replicated_sharding(self.mesh)
        self.data_sh = batch_sharding(self.mesh)

        step_fn = make_train_step(
            self.model, self.loss_fn, self.tx, ema_decay=tcfg.ema_decay
        )
        batch_shardings = {
            "images": image_sh or self.data_sh,
            "boxes": self.data_sh,
            "labels": self.data_sh,
            "mask": self.data_sh,
        }
        self._train_step = jax.jit(
            step_fn,
            in_shardings=(self.repl, batch_shardings),
            out_shardings=(self.repl, self.repl),
            donate_argnums=(0,),
        )
        self._batch_shardings = batch_shardings
        # Validation forward is DP-sharded over the same mesh as training:
        # images split over 'data', outputs replicated (the detection tensors
        # are small — [B, topk] — so the gather is negligible and every
        # host/device ends with the full batch for metric accumulation).
        # Falls back to replicated input when the eval batch doesn't divide
        # over the mesh (every loader batch is padded to the full size, so
        # divisibility is a static property of the config).
        eval_divisible = (
            cfg.evaluation.batch_size % self.mesh.shape["data"] == 0
        )
        self._infer = jax.jit(
            self._infer_impl,
            in_shardings=(
                self.repl,
                self.repl,
                self.data_sh if eval_divisible else self.repl,
            ),
            out_shardings=self.repl,
        )
        self._eval_sharded = eval_divisible
        # Multi-process compile-skew fence: per-specialization AOT
        # executables, compiled then barriered before first execution
        # (see _run_synced).
        self._synced_exe: dict = {}

        self.state = TrainState(
            params=self.params,
            batch_stats=self.batch_stats,
            opt_state=self.tx.init(self.params),
            step=jnp.zeros((), jnp.int32),
            rng=rng,
            ema_params=(
                jax.tree_util.tree_map(lambda p: p, self.params)
                if tcfg.ema_decay > 0
                else None
            ),
            ema_batch_stats=(
                jax.tree_util.tree_map(lambda p: p, self.batch_stats)
                if tcfg.ema_decay > 0
                else None
            ),
        )
        self.start_epoch = 0
        self.start_step = 0
        # Checkpoint cursor: (epoch, committed_steps_this_epoch). ONE tuple
        # stored with a single STORE_ATTR so the SIGTERM handler (which runs
        # between bytecodes on this same thread) can never observe a
        # half-updated epoch/step pair (see _install_preemption_handler).
        self._cursor = (0, 0)
        # True exactly while a train step is in flight (dispatch through
        # state commit). In that window the previous state's buffers are
        # DONATED to the running step, so the handler must not save — it
        # defers to the loop's commit point instead.
        self._step_active = False
        self._preempt_signum: int | None = None

        # --- output dirs / logging / checkpoints (process 0 writes only:
        # on a pod every host sees the same shared output dir) ---
        from yolo_ms_tpu.parallel.distributed import is_primary_process

        self._primary = is_primary_process()
        # GT shape buckets (see _bucket_gt). Multi-host runs must execute
        # the same program on every process; per-process bucket choices
        # would diverge (each host sees a different local batch), so on
        # pods the bucket is agreed via one tiny cross-host max collective
        # per batch (parallel.distributed.global_max_int).
        self._gt_buckets: tuple[int, ...] = tuple(
            sorted(b for b in (dcfg.gt_buckets or []) if 0 < b < dcfg.max_gt)
        )
        self._seen_buckets: set[int] = set()
        self.output_dir = os.path.join(tcfg.log_dir, tcfg.experiment_name)
        if self._primary:
            os.makedirs(self.output_dir, exist_ok=True)
            cfg.save(os.path.join(self.output_dir, "config.yaml"))
        self.logger = MetricLogger(os.path.join(self.output_dir, "tensorboard_logs"))
        self.ckpt = CheckpointManager(
            os.path.join(self.output_dir, "weights"), save_period=tcfg.save_period
        )

    # ------------------------------------------------------------------ #

    def _maybe_load_pretrained(self, variables):
        for path in (
            self.cfg.model.pretrained_weights_path,
            self.cfg.training.pretrained_weights,
        ):
            if not path:
                continue
            if not os.path.exists(path):
                print(f"Warning: pretrained weights not found: {path}")
                continue
            try:
                if path.endswith((".pt", ".pth")):
                    loaded = load_torch_checkpoint(path)
                else:
                    loaded = restore_checkpoint(path)
                variables = _merge_matching(variables, loaded, verbose=self.verbose)
                print(f"Loaded pretrained weights from {path}")
            except Exception as e:  # non-strict load (utils.py:45-82)
                print(f"Error loading pretrained weights: {e}. Training from scratch.")
        return variables

    def _bucket_gt(self, host_batch):
        """Slice the padded GT tensors to the smallest configured static
        bucket that covers every valid GT slot in the batch.

        Exact: padding rows are fully masked through the TAL assigner and
        loss (metric zeroed by mask_in, gathers ride mask_pos), so removing
        them changes no output — it only removes [B, max_gt, A]-proportional
        HBM traffic from the assigner, the train step's second-biggest cost
        after the backward pass (PERF.md). Each bucket is one extra jit
        specialization of the train step (static shapes — the TPU-idiomatic
        answer to ragged GT counts). The bucket covers the highest USED slot
        index (not the count), so non-prefix padding layouts stay correct.
        Equivalence is asserted in tests/test_trainer_unit.py.
        """
        buckets = self._gt_buckets
        if not buckets:
            return host_batch
        mask = np.asarray(host_batch["mask"])
        used = np.flatnonzero(mask.any(axis=0))
        needed = int(used[-1]) + 1 if used.size else 1
        if jax.process_count() > 1:
            # every host must pick the SAME jit specialization (same XLA
            # program) or the step's collectives deadlock — agree on the
            # max needed slot across hosts with one tiny DCN collective
            from yolo_ms_tpu.parallel.distributed import global_max_int

            needed = global_max_int(needed)
        m = next((b for b in buckets if b >= needed), mask.shape[1])
        if m not in self._seen_buckets:
            # each bucket is a fresh XLA specialization of the train step
            # (minutes on TPU) — say so, or the first such batch looks hung
            self._seen_buckets.add(m)
            print(f"  GT bucket {m}: compiling train step specialization")
        if m >= mask.shape[1]:
            return host_batch
        return {
            "images": host_batch["images"],
            "boxes": host_batch["boxes"][:, :m],
            "labels": host_batch["labels"][:, :m],
            "mask": host_batch["mask"][:, :m],
        }

    def _globalize(self, host_batch):
        """Host-local numpy -> global jax.Arrays for the multi-host train feed.

        On a single process jit's in_shardings device-put numpy directly; on
        a pod each host holds only ITS rows of the global batch (the loader's
        process_shard), so the arrays must be assembled into global Arrays
        via make_array_from_process_local_data — a host-local operation (no
        transfer): each host's rows land on its own devices and the jit call
        sees one [global_B, ...] array.
        """
        if jax.process_count() == 1:
            return host_batch
        cnt = jax.process_count()
        out = {}
        for k, v in host_batch.items():
            v = np.asarray(v)
            gshape = (v.shape[0] * cnt,) + v.shape[1:]
            out[k] = jax.make_array_from_process_local_data(
                self._batch_shardings[k], v, gshape
            )
        return out

    def _globalize_eval_images(self, images):
        """Eval-feed analog of _globalize: each host contributes the image
        rows its own devices hold. Under the process-sharded val feed
        (shard_images_only) the loader already decoded ONLY those rows, so
        they pass straight through; otherwise the host slices its rows out
        of the full batch (sharded eval) or replicates it (fallback)."""
        if jax.process_count() == 1:
            return images
        v = np.asarray(images)
        cnt, idx = jax.process_count(), jax.process_index()
        if getattr(self, "_val_images_local", False):
            # loader decoded exactly this host's rows
            sh = self.data_sh
            part = v
            gshape = (v.shape[0] * cnt,) + v.shape[1:]
        elif self._eval_sharded:
            local = v.shape[0] // cnt
            sh = self.data_sh
            part = v[idx * local : (idx + 1) * local]
            gshape = v.shape
        else:
            sh = self.repl
            part = v
            gshape = v.shape
        return jax.make_array_from_process_local_data(sh, part, gshape)

    def _run_synced(self, name, jit_fn, *args):
        """Call a jitted fn; on multi-process runs, fence each NEW shape
        specialization with AOT-compile + coordination-service barrier.

        A collective's first execution opens peer connections with a finite
        handshake timeout (Gloo's KV exchange gives up at 30 s); host-level
        compile skew — different cache state, different compile speed — can
        exceed it, so the fast host times out inside a psum while a peer is
        still compiling. Compiling ahead of time and rendezvousing through
        the coordination service (which has a generous, configurable
        timeout) makes the first step immune to skew. Single-process: plain
        jit dispatch, zero overhead. Specializations arrive in the same
        order on every process (GT buckets agree via global_max_int, canvas
        sizes are pure functions of (seed, epoch, block)), so the barrier
        tags match.
        """
        if jax.process_count() == 1:
            return jit_fn(*args)
        leaves, treedef = jax.tree_util.tree_flatten(args)
        key = (name, treedef, tuple((l.shape, str(l.dtype)) for l in leaves))
        exe = self._synced_exe.get(key)
        if exe is None:
            exe = jit_fn.lower(*args).compile()
            barrier(f"compile_{name}_{len(self._synced_exe)}")
            self._synced_exe[key] = exe
        return exe(*args)

    def _infer_impl(self, params, batch_stats, images):
        images = device_normalize_images(images, self.model.dtype)
        raw = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        return fused_postprocess(
            raw,
            self.cfg.dataset.num_classes,
            self.cfg.model.reg_max,
            conf_thresh=self.cfg.evaluation.confidence_threshold,
            iou_thresh=self.cfg.evaluation.iou_threshold,
        )

    # ------------------------------------------------------------------ #

    def validate(self, epoch: int = -1) -> float:
        """mAP@0.5 over the val set (validate_epoch parity, train.py:20-165).

        evaluation.map_iou_thresholds = "coco" additionally computes the
        COCO-standard AP@[.50:.05:.95]; the returned/best-model metric stays
        mAP@0.5 for reference parity."""
        assert self.val_loader is not None, "no validation dataset configured"
        thresholds = getattr(self.cfg.evaluation, "map_iou_thresholds", [0.5])
        if isinstance(thresholds, str):
            if thresholds.lower() != "coco":
                raise ValueError(
                    f"map_iou_thresholds: unknown preset {thresholds!r}"
                )
            thresholds = [0.5 + 0.05 * i for i in range(10)]
        if 0.5 not in [round(float(t), 2) for t in thresholds]:
            thresholds = [0.5] + list(thresholds)
        metric = MeanAveragePrecision(iou_thresholds=thresholds)
        img_h, img_w = self.img_size
        n_images = 0
        total_dets = 0
        eval_params = (
            self.state.ema_params
            if self.state.ema_params is not None
            else self.state.params
        )
        eval_bs = (
            self.state.ema_batch_stats
            if self.state.ema_batch_stats is not None
            else self.state.batch_stats
        )
        for batch in self.val_loader.epoch(0):
            out = jax.device_get(
                self._run_synced(
                    "infer",
                    self._infer,
                    eval_params,
                    eval_bs,
                    self._globalize_eval_images(batch["images"]),
                )
            )
            nv = batch["num_valid"]
            preds, targets = [], []
            for i in range(nv):
                valid = out["valid"][i]
                preds.append(
                    {
                        "boxes": out["boxes"][i][valid],
                        "scores": out["scores"][i][valid],
                        "labels": out["classes"][i][valid],
                    }
                )
                m = batch["mask"][i]
                gt_cxcywh = batch["boxes"][i][m] * np.asarray(
                    [img_w, img_h, img_w, img_h], np.float32
                )
                targets.append(
                    {
                        "boxes": np.asarray(xywh_to_xyxy(gt_cxcywh)),
                        "labels": batch["labels"][i][m],
                    }
                )
                total_dets += int(valid.sum())
            metric.update(preds, targets)
            n_images += nv
        result = metric.compute()
        map50 = result.get("map_50", result["map"])
        self._last_val_result = result
        if len(thresholds) > 1:
            self.logger.scalar(
                "Validation/mAP_50_95", result["map"], max(epoch, 0)
            )
        if self.verbose:
            extra = (
                f", AP@[.5:.95] = {result['map']:.4f}"
                if len(thresholds) > 1
                else ""
            )
            print(
                f"Validation epoch {epoch}: {n_images} images, "
                f"{total_dets} detections, mAP@0.5 = {map50:.4f}{extra}"
            )
        return map50

    # ------------------------------------------------------------------ #

    def resume(self, path: str) -> None:
        """Restore full training state (params/opt/step/epoch, step-in-epoch)
        for exact resume — capability the reference lacks. Restores against
        the live TrainState template so optimizer-state structure survives."""
        template = jax.device_get(
            {"state": self.state, "epoch": 0, "step_in_epoch": 0}
        )
        try:
            restored = restore_checkpoint(path, template)
        except Exception:
            # older checkpoints without step_in_epoch
            template.pop("step_in_epoch")
            restored = restore_checkpoint(path, template)
        self.state = jax.tree_util.tree_map(jnp.asarray, restored["state"])
        step_in_epoch = int(restored.get("step_in_epoch", 0) or 0)
        if step_in_epoch > 0:
            self.start_epoch = int(restored["epoch"])
            self.start_step = step_in_epoch
        else:
            self.start_epoch = int(restored["epoch"]) + 1
            self.start_step = 0

    def _save_preempt_and_exit(self, signum: int):
        """Drain, save the preemption checkpoint (primary), exit 128+signum.

        Pod-safe ordering: EVERY process first drains its in-flight work
        (block_until_ready participates in any outstanding collective, so
        the primary's device_get cannot hang behind a peer that exited
        mid-psum), and only then non-primaries exit while the primary saves
        (the save itself reads replicated shards — process-local)."""
        try:
            jax.block_until_ready(
                jax.tree_util.tree_leaves(self.state.params)
            )
        except Exception:
            pass  # backend already torn down — save what the host has
        if not self._primary:
            raise SystemExit(128 + signum)
        path = os.path.join(self.ckpt.dir, "preempt.ckpt")
        print(f"\nSignal {signum}: saving preemption checkpoint to {path}")
        from yolo_ms_tpu.utils.checkpoint import save_checkpoint

        epoch, step = self._cursor
        if step == 0:
            # resume() reads step_in_epoch==0 as "epoch complete, start the
            # next one" (the end-of-epoch checkpoint format). A preemption
            # before the first commit of epoch E must instead restart E from
            # its top — encode that as "epoch E-1 complete".
            epoch -= 1
        # local_only: peers drain and exit on the same signal, so the
        # save must not barrier over them; save_checkpoint fetches the
        # replicated state from local shards (no collectives).
        save_checkpoint(
            path,
            {
                "state": self.state,
                "epoch": epoch,
                # deterministic loader => exact mid-epoch resume
                "step_in_epoch": step,
            },
            local_only=True,
        )
        raise SystemExit(128 + signum)

    def _install_preemption_handler(self):
        """Save a full-state checkpoint on SIGTERM/SIGINT before exiting —
        the elastic-recovery hook the reference lacks (SURVEY.md §5).

        Two paths, both ending in exit 128+signum on every process:

        - idle (no train step in flight): the handler saves directly —
          self.state is the last committed state and nothing holds its
          buffers.
        - a step IN FLIGHT: the previous state's buffers are donated to the
          running XLA program and the cursor points at the not-yet-committed
          step, so saving here would read deleted buffers / skip a batch.
          The handler only records the signal; the fit loop notices it at
          the next commit point — state, cursor, and collectives all
          consistent — and saves there. Signals run between bytecodes on the
          main thread, so the _step_active flag can never be observed
          mid-transition.

        A grace watchdog (YOLO_MS_PREEMPT_GRACE_S) hard-exits if a peer died
        before draining, so shutdown is bounded even on a wedged
        collective."""
        import signal
        import threading

        grace = float(os.environ.get("YOLO_MS_PREEMPT_GRACE_S", "60"))

        def handler(signum, frame):
            # a dead peer / wedged in-flight collective must not wedge
            # shutdown forever — armed at signal time for BOTH paths
            w = threading.Timer(grace, lambda: os._exit(128 + signum))
            w.daemon = True
            w.start()
            self._preempt_signum = signum
            if self._step_active:
                return  # defer: fit commits the in-flight step, then saves
            self._save_preempt_and_exit(signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, handler)
            except ValueError:
                pass  # not in main thread (e.g. under pytest workers)

    def fit(self) -> None:
        assert self.train_loader is not None, "no training dataset configured"
        tcfg = self.cfg.training
        steps_per_epoch = len(self.train_loader)
        self._cursor = (self.start_epoch, self.start_step)
        self._install_preemption_handler()
        print(f"Starting training for {tcfg.epochs} epochs ({steps_per_epoch} steps/epoch)")

        for epoch in range(self.start_epoch, tcfg.epochs):
            first_step = self.start_step if epoch == self.start_epoch else 0
            self._cursor = (epoch, first_step)
            t0 = time.time()
            # state.step counts train-step calls; with gradient accumulation
            # the schedule advances once per APPLIED optimizer step
            accum = max(1, getattr(tcfg, "grad_accum_steps", 1) or 1)
            lr = float(self.lr_schedule(int(self.state.step) // accum))
            self.logger.scalar("Training/Learning_Rate", lr, epoch)
            # Per-step losses kept as device scalars (no sync — dispatch
            # stays pipelined); one device_get at epoch end gives the TRUE
            # epoch mean the reference logs (train.py:396), not a subsample.
            step_losses, n_steps = [], 0

            for batch_idx, batch in enumerate(
                self.train_loader.epoch(epoch, start_step=first_step),
                start=first_step,
            ):
                host_batch = {
                    k: batch[k] for k in ("images", "boxes", "labels", "mask")
                }
                host_batch = self._globalize(self._bucket_gt(host_batch))
                # In-flight window: the state buffers are donated to the
                # dispatched step; a SIGTERM landing here is deferred to the
                # commit point below (see _install_preemption_handler).
                self._step_active = True
                self.state, metrics = self._run_synced(
                    "train_step", self._train_step, self.state, host_batch
                )
                self._cursor = (epoch, batch_idx + 1)
                self._step_active = False
                if self._preempt_signum is not None:
                    self._save_preempt_and_exit(self._preempt_signum)
                n_steps += 1
                step_losses.append(metrics["total_loss"])
                gstep = epoch * steps_per_epoch + batch_idx
                if (batch_idx + 1) % 10 == 0 or batch_idx == 0:
                    m = jax.device_get(metrics)
                    print(
                        f"  epoch {epoch + 1} batch {batch_idx + 1}/{steps_per_epoch} "
                        f"loss {float(m['total_loss']):.4f} "
                        f"(box {float(m['loss_box']):.4f} cls {float(m['loss_cls']):.4f} "
                        f"dfl {float(m['loss_dfl']):.4f})"
                    )
                    self.logger.scalar("Loss/Batch/Total", float(m["total_loss"]), gstep)
                    self.logger.scalar("Loss/Batch/Box", float(m["loss_box"]), gstep)
                    self.logger.scalar("Loss/Batch/Cls", float(m["loss_cls"]), gstep)
                    self.logger.scalar("Loss/Batch/DFL", float(m["loss_dfl"]), gstep)

            avg_loss = (
                float(np.mean(jax.device_get(step_losses))) if step_losses else 0.0
            )
            self.logger.scalar("Loss/Epoch/Total", avg_loss, epoch)
            print(
                f"Epoch {epoch + 1}/{tcfg.epochs}: avg loss {avg_loss:.4f}, "
                f"{time.time() - t0:.1f}s"
            )

            val_metric = None
            if self.val_loader is not None and (epoch + 1) % tcfg.val_interval == 0:
                val_metric = self.validate(epoch + 1)
                self.logger.scalar("Validation/mAP_50", val_metric, epoch)

            # _to_host, not device_get: the state is replicated, and on a
            # pod device_get of a non-fully-addressable array can issue a
            # cross-host gather — the local replica IS the global value
            from yolo_ms_tpu.utils.checkpoint import _to_host

            ckpt_state = {
                "state": _to_host(self.state),
                "epoch": epoch,
                "step_in_epoch": 0,
            }
            if self.ckpt.on_epoch_end(ckpt_state, epoch, val_metric):
                print(f"New best mAP@0.5: {val_metric:.4f}")

        self.logger.close()
        print("Training finished.")


def _merge_matching(variables, loaded, verbose=True):
    """Non-strict weight merge: copy leaves whose path+shape match
    (load_state_dict(strict=False) parity, utils.py:69-74)."""
    flat_v = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    missing, unexpected, mismatched = [], [], []
    out = dict(flat_v)
    for path, val in flat_l.items():
        if path in flat_v:
            if flat_v[path].shape == val.shape:
                out[path] = jnp.asarray(val)
            else:
                mismatched.append(path)
        else:
            unexpected.append(path)
    for path in flat_v:
        if path not in flat_l:
            missing.append(path)
    if verbose and (missing or unexpected or mismatched):
        print(
            f"Pretrained merge: {len(missing)} missing, "
            f"{len(unexpected)} unexpected, {len(mismatched)} shape-mismatched"
        )
    treedef = jax.tree_util.tree_structure(variables)
    paths = [p for p, _ in jax.tree_util.tree_flatten_with_path(variables)[0]]
    return jax.tree_util.tree_unflatten(treedef, [out[p] for p in paths])


def train(config_path: str) -> None:
    """CLI-compatible entry: train(config_path) (tools/train.py:167)."""
    from yolo_ms_tpu.utils.config import load_config

    cfg = load_config(config_path)
    Trainer(cfg).fit()
