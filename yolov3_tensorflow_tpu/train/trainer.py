"""The training loop: jitted train/eval steps + orchestration.

Rebuild of /root/reference/train.py. The reference pays a Python<->C++
session round trip per step and even fetches full y_pred/y_true back to host
every iteration (train.py:138-140); here one donated, jitted `train_step`
(forward + loss + grad + clip + optimizer + BN update) runs per step with
only scalar metrics leaving the device, and in-training evaluation reuses the
same compiled postprocess instead of a second placeholder-fed NMS graph
(train.py:27-29,150-152).

Multi-scale training uses bucketed static shapes: jax caches one compiled
program per image size (10 buckets, data/loader.py MULTI_SCALE_SIZES), the
TPU answer to the reference's free-form dynamic shapes (SURVEY.md §5).
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.data.loader import DataLoader
from yolov3_tensorflow_tpu.evaluation.metrics import (AverageMeter,
                                                      detections_to_pred_rows,
                                                      evaluate_batch)
from yolov3_tensorflow_tpu.evaluation.voc import evaluate_map, parse_gt_records
from yolov3_tensorflow_tpu.models.decode import predict_boxes
from yolov3_tensorflow_tpu.models.yolov3 import init_yolov3, yolov3_forward
from yolov3_tensorflow_tpu.ops.losses import compute_loss, l2_regularization
from yolov3_tensorflow_tpu.ops.nms import batched_nms_auto
from yolov3_tensorflow_tpu.train.checkpoint import (CheckpointStore,
                                                    partial_restore)
from yolov3_tensorflow_tpu.train.optimizers import (build_optimizer,
                                                    path_prefix_mask)
from yolov3_tensorflow_tpu.train.schedules import build_schedule
from yolov3_tensorflow_tpu.utils.profiling import StepTimer
from yolov3_tensorflow_tpu.utils.summary import SummaryWriter

TrainState = Dict[str, Any]  # {"params", "batch_stats", "opt_state", "step"}


def make_train_step(cfg: Config, optimizer: optax.GradientTransformation,
                    axis_name: Optional[str] = None,
                    schedule: Optional[Callable] = None,
                    device_augment: bool = False,
                    device_encode: bool = False,
                    out_size: Optional[Tuple[int, int]] = None) -> Callable:
    """Build the pure train-step function (jit/shard_map-ready).

    state -> batch(images, y_true tuple) -> (new_state, metrics). When
    `axis_name` is set (data-parallel shard_map), gradients and BN moments
    are averaged across the mesh axis. When `schedule` is given, the current
    learning rate is computed inside the jitted step and returned in
    `metrics["lr"]` so the host never replays the schedule.

    device_augment=True changes the batch argument from float images to
    `(staged, staged2, aug_params)` (loader device-augment mode): the full
    augmentation chain runs on-device as a prologue fused into the same jit
    (data/device_augment.py). The target resolution is recovered from the
    y_true shapes, so multi-scale buckets compile per size exactly as in the
    host-augment path.

    device_encode=True changes the y_true argument to the loader's padded
    `(gt_boxes, gt_labels, gt_mask)` triple; the dense grids are scattered
    on-device as a second prologue (data/device_encode.py). The target
    resolution then comes from the images — or, when device_augment is also
    on (nothing in the batch carries it), from the STATIC `out_size` (w, h);
    the Trainer keeps one compiled step per multi-scale bucket.
    """
    anchors = np.asarray(cfg.anchors, np.float32)
    m = cfg.model
    compute_dtype = jnp.dtype(m.compute_dtype)
    if device_augment and device_encode and out_size is None:
        raise ValueError("device_augment + device_encode needs a static "
                         "out_size (nothing in the batch carries it)")

    def train_step(state: TrainState, images: jax.Array,
                   y_true: Tuple[jax.Array, ...]):
        if device_augment:
            from yolov3_tensorflow_tpu.data.device_augment import \
                augment_batch
            staged, staged2, aug = images
            if device_encode:
                out_w, out_h = out_size
            else:
                out_h = y_true[2].shape[1] * 8
                out_w = y_true[2].shape[2] * 8
            images = augment_batch(staged, staged2, aug, (out_w, out_h),
                                   mixup=cfg.data.use_mix_up,
                                   distort=cfg.data.use_color_distort)
        if device_encode:
            from yolov3_tensorflow_tpu.data.device_encode import \
                encode_labels_device
            gt_boxes, gt_labels, gt_mask = y_true
            y_true = tuple(encode_labels_device(
                gt_boxes, gt_labels, gt_mask,
                (images.shape[2], images.shape[1]), m.num_classes, anchors))
        img_size = (images.shape[1], images.shape[2])  # (h, w)

        def loss_fn(params):
            fmaps, new_stats = yolov3_forward(
                {"params": params, "batch_stats": state["batch_stats"]},
                images, train=True, compute_dtype=compute_dtype,
                bn_momentum=m.batch_norm_decay, bn_eps=m.batch_norm_epsilon,
                axis_name=axis_name)
            losses = compute_loss(
                fmaps, y_true, anchors, m.num_classes, img_size,
                use_label_smooth=m.use_label_smooth,
                use_focal_loss=m.use_focal_loss,
                max_gt=cfg.data.max_boxes_per_image,
                box_loss=m.box_loss)
            l2 = l2_regularization(params, m.weight_decay)
            return losses["total"] + l2, (losses, l2, new_stats)

        grads, (losses, l2, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state["params"])
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, new_opt = optimizer.update(grads, state["opt_state"],
                                            state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_state = {"params": new_params, "batch_stats": new_stats,
                     "opt_state": new_opt, "step": state["step"] + 1}
        metrics = {**losses, "l2": l2}
        if schedule is not None:
            metrics["lr"] = schedule(new_state["step"].astype(jnp.float32))
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config) -> Callable:
    """Eval-mode forward + loss + fixed-shape NMS detections, one jit."""
    anchors = np.asarray(cfg.anchors, np.float32)
    m, e = cfg.model, cfg.eval
    compute_dtype = jnp.dtype(m.compute_dtype)

    @jax.jit
    def eval_step(state: TrainState, images: jax.Array,
                  y_true: Tuple[jax.Array, ...]):
        img_size = (images.shape[1], images.shape[2])
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        fmaps, _ = yolov3_forward(variables, images, train=False,
                                  compute_dtype=compute_dtype,
                                  bn_eps=m.batch_norm_epsilon)
        losses = compute_loss(fmaps, y_true, anchors, m.num_classes, img_size,
                              use_label_smooth=m.use_label_smooth,
                              use_focal_loss=m.use_focal_loss,
                              max_gt=cfg.data.max_boxes_per_image,
                              box_loss=m.box_loss)
        boxes, confs, probs = predict_boxes(fmaps, anchors, m.num_classes,
                                            img_size)
        dets = batched_nms_auto(boxes, confs * probs, max_out=e.nms_topk,
                           pre_topk=e.pre_nms_topk,
                           score_thresh=e.score_threshold,
                           iou_thresh=e.nms_threshold)
        return losses, dets

    return eval_step


class Trainer:
    """End-to-end training orchestration (reference train.py:122-226)."""

    def __init__(self, cfg: Config, seed: int = 0):
        from yolov3_tensorflow_tpu.parallel.multihost import is_primary
        from yolov3_tensorflow_tpu.utils.summary import NullSummaryWriter

        self.cfg = cfg
        self.seed = seed
        self.is_primary = is_primary()  # multi-host: only rank 0 writes
        self.log = logging.getLogger("yolov3_tpu.train")
        if cfg.train.progress_log_path and self.is_primary:
            os.makedirs(os.path.dirname(cfg.train.progress_log_path) or ".",
                        exist_ok=True)
            handler = logging.FileHandler(cfg.train.progress_log_path, "w")
            handler.setFormatter(logging.Formatter(
                "%(asctime)s %(levelname)s %(message)s"))
            self.log.addHandler(handler)
        self.log.setLevel(logging.INFO)

        self.schedule = build_schedule(cfg)
        self.store = CheckpointStore(cfg.train.save_dir)
        self.writer = (SummaryWriter(cfg.train.log_dir) if self.is_primary
                       else NullSummaryWriter())
        self.best_map = -np.inf
        self._train_step = None  # built after params exist (freeze mask)

    # ---------------- state management ----------------

    def init_state(self) -> TrainState:
        variables = init_yolov3(jax.random.PRNGKey(self.seed),
                                self.cfg.model.num_classes)
        mask = path_prefix_mask(variables["params"],
                                self.cfg.train.update_part)
        self.optimizer = build_optimizer(
            self.cfg.train.optimizer, self.schedule,
            momentum=self.cfg.train.momentum,
            rmsprop_decay=self.cfg.train.rmsprop_decay,
            grad_clip_norm=self.cfg.train.grad_clip_norm,
            update_mask=mask)
        state: TrainState = {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "opt_state": self.optimizer.init(variables["params"]),
            "step": jnp.asarray(self.cfg.train.global_step, jnp.int32),
        }

        ndp = self.cfg.train.num_data_parallel
        if ndp > 1:
            # data-parallel training over a device mesh: sharded batches,
            # pmean gradients, cross-replica sync BN (SURVEY.md §2.3 plan)
            from yolov3_tensorflow_tpu.parallel.mesh import (make_data_mesh,
                                                             replicate)
            self._mesh = make_data_mesh(ndp)
            state = replicate(self._mesh,
                              jax.tree_util.tree_map(jnp.asarray, state))
        else:
            self._mesh = None
        # device_augment + device_encode: nothing in the batch carries the
        # multi-scale bucket resolution, so the step is compiled per size on
        # first use (_get_train_step); otherwise one step serves all buckets
        self._train_step_cache: Dict[Tuple[int, int], Callable] = {}
        d = self.cfg.data
        if not (d.device_augment and d.device_encode):
            self._train_step = self._build_train_step(out_size=None)
        self._eval_step = make_eval_step(self.cfg)
        if self.cfg.data.device_augment:
            from yolov3_tensorflow_tpu.data.device_augment import \
                augment_batch

            # standalone jitted augmentation for paths that need materialized
            # images from a device-augment batch (in-train batch eval)
            @functools.partial(jax.jit, static_argnums=(3,))
            def _augment(staged, staged2, params, out_size):
                return augment_batch(
                    staged, staged2, params, out_size,
                    mixup=self.cfg.data.use_mix_up,
                    distort=self.cfg.data.use_color_distort)

            self._augment_fn = _augment
        return state

    def _build_train_step(self, out_size) -> Callable:
        """One compiled train step (DP-sharded when a mesh is active)."""
        d = self.cfg.data
        if self._mesh is not None:
            from yolov3_tensorflow_tpu.parallel.data_parallel import (
                make_dp_train_step)
            return make_dp_train_step(
                self.cfg, self.optimizer, self._mesh, schedule=self.schedule,
                device_augment=d.device_augment,
                device_encode=d.device_encode, out_size=out_size)
        return jax.jit(
            make_train_step(self.cfg, self.optimizer, schedule=self.schedule,
                            device_augment=d.device_augment,
                            device_encode=d.device_encode,
                            out_size=out_size),
            donate_argnums=(0,))

    def _get_train_step(self, img_size) -> Callable:
        """The step for a batch's (w, h) bucket (cached per size in
        device_augment + device_encode mode; a single step otherwise)."""
        d = self.cfg.data
        if not (d.device_augment and d.device_encode):
            return self._train_step
        key = tuple(img_size)
        fn = self._train_step_cache.get(key)
        if fn is None:
            fn = self._build_train_step(out_size=key)
            self._train_step_cache[key] = fn
        return fn

    def _batch_images(self, batch) -> jax.Array:
        """Materialized images for a loader batch in either mode (device
        array in device-augment mode)."""
        if batch.images is not None:
            return jnp.asarray(batch.images)
        return self._augment_fn(batch.staged, batch.staged2,
                                batch.params, tuple(batch.img_size))

    def _batch_y_true(self, batch) -> Tuple[jax.Array, ...]:
        """Materialized label grids for a loader batch in either mode
        (scattered on-device in device-encode mode)."""
        if batch.y_true is not None:
            return tuple(jnp.asarray(y) for y in batch.y_true)
        from yolov3_tensorflow_tpu.data.device_encode import (
            encode_labels_device)
        if not hasattr(self, "_encode_fn"):
            self._encode_fn = jax.jit(
                encode_labels_device, static_argnums=(3, 4))
        return tuple(self._encode_fn(
            jnp.asarray(batch.gt_boxes), jnp.asarray(batch.gt_labels),
            jnp.asarray(batch.gt_mask), tuple(batch.img_size),
            self.cfg.model.num_classes,
            np.asarray(self.cfg.anchors, np.float32)))

    def _put_batch(self, array) -> jax.Array:
        """Host batch -> device(s): sharded over the mesh data axis when
        data-parallel, plain transfer otherwise."""
        if self._mesh is not None:
            from yolov3_tensorflow_tpu.parallel.mesh import shard_batch
            return shard_batch(self._mesh, jnp.asarray(array))
        return jnp.asarray(array)

    def restore_into(self, state: TrainState, path: str) -> TrainState:
        """Partial restore honoring restore_include/exclude
        (train.py:81 + args.py:47-57)."""
        restored = self.store.restore(path)
        t = self.cfg.train
        state = dict(state)
        state["params"] = partial_restore(
            state["params"], restored["params"],
            include=t.restore_include, exclude=t.restore_exclude)
        if "batch_stats" in restored:
            state["batch_stats"] = partial_restore(
                state["batch_stats"], restored["batch_stats"],
                include=t.restore_include, exclude=t.restore_exclude)
        if "opt_state" in restored and t.restore_include is None \
                and t.restore_exclude is None:
            # orbax restores namedtuple states as plain dicts; re-restore with
            # the live opt_state as target to recover the optax containers
            with_target = self.store.restore(
                path, target={**restored, "opt_state": state["opt_state"]})
            state["opt_state"] = jax.tree_util.tree_map(
                jnp.asarray, with_target["opt_state"])
        if "step" in restored and t.global_step == 0:
            state["step"] = jnp.asarray(int(restored["step"]), jnp.int32)
        return state

    # ---------------- loops ----------------

    def train_epoch(self, state: TrainState, loader: DataLoader, epoch: int,
                    val_loader: Optional[DataLoader] = None) -> TrainState:
        """One epoch, fully async-dispatched.

        Steps queue on the device back to back; per-step metric scalars stay
        on device in `pending` and leave the chip as ONE packed [K, N] array
        every `train.log_step` steps. The host never blocks inside the step
        loop — the exact round-trip the reference pays every iteration
        (train.py:138-148) and that this trainer's round-1 version still paid
        via per-step float() casts.
        """
        import time

        cfg = self.cfg
        meters = {k: AverageMeter() for k in
                  ("total", "xy", "wh", "conf", "class")}
        timer = StepTimer()
        step = int(state["step"])  # one sync at epoch start
        flush_every = max(1, cfg.train.log_step)
        pending: list = []  # [(step, batch_n, device-metrics dict)]
        last_lr = 0.0
        t_prev = time.perf_counter()

        def flush():
            nonlocal pending, last_lr, t_prev
            if not pending:
                return
            keys = sorted(pending[0][2])
            packed = jnp.stack([jnp.stack([m[k] for _, _, m in pending])
                                for k in keys])
            host = np.asarray(jax.device_get(packed))  # one host round trip
            now = time.perf_counter()
            per_step = (now - t_prev) / len(pending)
            t_prev = now
            cols = {k: host[i] for i, k in enumerate(keys)}
            for j, (s, n, _) in enumerate(pending):
                timer.record(per_step)
                for k in meters:
                    meters[k].update(float(cols[k][j]), n)
                for k in meters:
                    self.writer.scalar(f"train_batch_statistics/loss_{k}",
                                       float(cols[k][j]), s)
                self.writer.scalar("train_batch_statistics/loss_l2",
                                   float(cols["l2"][j]), s)
                if "lr" in cols:
                    self.writer.scalar("learning_rate", float(cols["lr"][j]), s)
            if "lr" in cols:
                last_lr = float(cols["lr"][-1])
            pending = []
            if np.isnan(meters["total"].average):
                # NaN abort (train.py:163-166)
                raise ArithmeticError(
                    "Gradient exploded! Please train again and you may "
                    "need modify some parameters.")

        for batch in loader.epoch(epoch):
            if batch.images is None:   # device-augment mode
                batch_arg = (
                    self._put_batch(batch.staged),
                    self._put_batch(batch.staged2),
                    {k: self._put_batch(v) for k, v in batch.params.items()})
                batch_n = batch.staged.shape[0]
            else:
                batch_arg = self._put_batch(batch.images)
                batch_n = batch.images.shape[0]
            if batch.y_true is None:   # device-encode mode: padded GT
                y_arg = (self._put_batch(batch.gt_boxes),
                         self._put_batch(batch.gt_labels),
                         self._put_batch(batch.gt_mask))
            else:
                y_arg = tuple(self._put_batch(y) for y in batch.y_true)
            state, metrics = self._get_train_step(batch.img_size)(
                state, batch_arg, y_arg)
            step += 1
            pending.append((step, batch_n, metrics))
            eval_now = (cfg.train.train_evaluation_step and step > 0
                        and step % cfg.train.train_evaluation_step == 0
                        and jax.process_count() == 1)
            if len(pending) >= flush_every or eval_now:
                flush()
            if eval_now:
                _, dets = self._eval_step(
                    state, self._batch_images(batch),
                    self._batch_y_true(batch))
                dets_np = jax.device_get(dets)  # one host round trip
                recall, precision = evaluate_batch(
                    dets_np, batch.y_true, cfg.model.num_classes,
                    cfg.eval.eval_threshold,
                    gt=(None if batch.y_true is not None else
                        (batch.gt_boxes, batch.gt_labels, batch.gt_mask)))
                info = (f"Epoch: {epoch}, global_step: {step} | "
                        f"loss: total: {meters['total'].average:.2f}, "
                        f"xy: {meters['xy'].average:.2f}, "
                        f"wh: {meters['wh'].average:.2f}, "
                        f"conf: {meters['conf'].average:.2f}, "
                        f"class: {meters['class'].average:.2f} | "
                        f"Last batch: rec: {recall:.3f}, "
                        f"prec: {precision:.3f} | lr: {last_lr:.5g}")
                print(info)
                self.log.info(info)
                self.writer.scalar("evaluation/train_batch_recall", recall, step)
                self.writer.scalar("evaluation/train_batch_precision",
                                   precision, step)
                t_prev = time.perf_counter()  # exclude eval from step timing
        flush()
        self._last_epoch_loss = meters["total"].average
        self._last_lr = last_lr or float(
            self.schedule(jnp.asarray(step, jnp.float32)))
        stats = timer.summary()
        if stats.get("count"):
            info = (f"Epoch {epoch} step time: p50 {stats['p50_ms']:.1f} ms, "
                    f"p95 {stats['p95_ms']:.1f} ms, "
                    f"mean {stats['mean_ms']:.1f} ms over {stats['count']} steps")
            self.log.info(info)
            self.writer.scalar("train_batch_statistics/step_time_ms",
                               stats["p50_ms"], step)
        self._last_step_stats = stats
        return state

    def validate(self, state: TrainState, val_loader: DataLoader,
                 epoch: int) -> Dict[str, Any]:
        """Full-dataset VOC mAP evaluation (train.py:174-216).

        Multi-host: each process evaluates its stride of val batches with a
        process-local copy of the (replicated) params, prediction rows and
        loss sums are all-gathered over DCN, and every process computes the
        identical mAP (so the best-ckpt decision needs no broadcast)."""
        cfg = self.cfg
        eval_state = state
        if jax.process_count() > 1:
            # globally-sharded state can't feed a process-local jit; pull the
            # replicated values once and re-place locally
            eval_state = jax.device_get(
                {k: state[k] for k in ("params", "batch_stats")})
        val_meters = {k: AverageMeter() for k in
                      ("total", "xy", "wh", "conf", "class")}
        rows = []
        for batch in val_loader.epoch(0):
            losses, dets = self._eval_step(
                eval_state, jnp.asarray(batch.images),
                tuple(jnp.asarray(y) for y in batch.y_true))
            # one host round trip per batch (per-array fetches each cost a
            # full RPC on remotely-attached devices)
            losses_np, dets_np = jax.device_get((losses, dets))
            rows.extend(detections_to_pred_rows(dets_np, batch.image_ids))
            for k in val_meters:
                val_meters[k].update(float(losses_np[k]),
                                     batch.images.shape[0])

        if jax.process_count() > 1:
            from yolov3_tensorflow_tpu.parallel.multihost import (
                gather_prediction_rows, gather_meter_sums)
            rows = gather_prediction_rows(rows)
            gather_meter_sums(val_meters)

        gt = parse_gt_records(cfg.data.val_file,
                              cfg.data.img_size, cfg.data.letterbox_resize)
        result = evaluate_map(gt, rows, cfg.model.num_classes,
                              cfg.eval.eval_threshold,
                              cfg.eval.use_voc_07_metric)
        step = int(state["step"])
        info = [f"======> Epoch: {epoch}, global_step: {step} <======"]
        for c, r in result["per_class"].items():
            info.append(f"EVAL: Class {c}: Recall: {r['recall']:.4f}, "
                        f"Precision: {r['precision']:.4f}, AP: {r['ap']:.4f}")
        info.append(f"EVAL: Recall: {result['recall']:.4f}, "
                    f"Precison: {result['precision']:.4f}, "
                    f"mAP: {result['mAP']:.4f}")
        info.append(
            "EVAL: loss: total: {:.2f}, xy: {:.2f}, wh: {:.2f}, "
            "conf: {:.2f}, class: {:.2f}".format(
                *[val_meters[k].average for k in
                  ("total", "xy", "wh", "conf", "class")]))
        text = "\n".join(info)
        print(text)
        self.log.info(text)
        self.writer.scalar("evaluation/val_mAP", result["mAP"], epoch)
        self.writer.scalar("evaluation/val_recall", result["recall"], epoch)
        self.writer.scalar("evaluation/val_precision", result["precision"],
                           epoch)
        for k in val_meters:
            self.writer.scalar(f"validation_statistics/loss_{k}",
                               val_meters[k].average, epoch)
        result["val_loss"] = val_meters["total"].average
        return result

    def fit(self, state: Optional[TrainState] = None) -> TrainState:
        """The full schedule: epochs, periodic ckpts, best-mAP ckpts
        (train.py:128-226)."""
        cfg = self.cfg
        if state is None:
            state = self.init_state()
            latest = self.store.latest() if cfg.train.auto_resume else None
            if latest is not None:
                # crash recovery: full restore from the newest checkpoint in
                # save_dir (params-only ckpts restore what they have);
                # overrides restore_path
                raw = self.store.restore(latest)
                target = {k: state[k] for k in state if k in raw}
                restored = self.store.restore(latest, target=target)
                state = dict(state)
                state.update(jax.tree_util.tree_map(jnp.asarray, restored))
                self.log.info("auto-resumed from checkpoint %s "
                              "(step %d)", latest, int(state["step"]))
                print(f"auto-resumed from {latest} at step "
                      f"{int(state['step'])}")
            elif cfg.train.restore_path:
                state = self.restore_into(state, cfg.train.restore_path)

        # multi-host: each process loads its slice of every train batch
        # (batch_size stays the GLOBAL batch; the loader plan, step count and
        # multi-scale schedule are identical on all processes) and its stride
        # of val batches (rows gathered in validate())
        pi, pc = jax.process_index(), jax.process_count()
        train_loader = DataLoader(
            cfg.data.train_file, cfg.model.num_classes, cfg.anchors,
            cfg.train.batch_size, cfg.data.img_size, mode="train",
            letterbox=cfg.data.letterbox_resize,
            multi_scale=cfg.data.multi_scale_train,
            multi_scale_interval=cfg.data.multi_scale_interval,
            multi_scale_sizes=cfg.data.multi_scale_sizes,
            use_mix_up=cfg.data.use_mix_up,
            use_color_distort=cfg.data.use_color_distort,
            num_threads=cfg.data.num_threads,
            prefetch=cfg.data.prefetch_buffer, seed=self.seed,
            shard_within_batch=(pi, pc),
            device_augment=cfg.data.device_augment,
            staged_size=cfg.data.staged_size,
            device_encode=cfg.data.device_encode,
            max_boxes=cfg.data.max_boxes_per_image)
        val_loader = DataLoader(
            cfg.data.val_file, cfg.model.num_classes, cfg.anchors,
            cfg.eval.batch_size, cfg.data.img_size, mode="val",
            letterbox=cfg.data.letterbox_resize,
            num_threads=cfg.data.num_threads,
            prefetch=cfg.data.prefetch_buffer, seed=self.seed,
            shard_batches=(pi, pc))

        # After a resume, start from the epoch the restored step belongs to
        # instead of re-running total_epochs from scratch (the reference's
        # resume is fully manual and restarts its epoch loop, README.md:180).
        steps_per_epoch = max(1, len(train_loader))
        start_epoch = min(int(state["step"]) // steps_per_epoch,
                          cfg.train.total_epochs)
        if start_epoch:
            self.log.info("resuming epoch loop at epoch %d (step %d)",
                          start_epoch, int(state["step"]))

        for epoch in range(start_epoch, cfg.train.total_epochs):
            state = self.train_epoch(state, train_loader, epoch)
            step = int(state["step"])

            # periodic save gated on loss (train.py:169-171). Multi-host:
            # every process calls save — orbax coordinates internally (rank 0
            # writes, others participate in its barriers)
            if (cfg.train.save_epoch and epoch % cfg.train.save_epoch == 0
                    and epoch > 0 and self._last_epoch_loss <= 2.0):
                name = (f"model-epoch_{epoch}_step_{step}"
                        f"_loss_{self._last_epoch_loss:.4f}"
                        f"_lr_{self._last_lr:.5g}")
                self.store.save(name, state,
                                include_opt=cfg.train.save_optimizer)

            # full validation + best-ckpt (train.py:174-216)
            if (cfg.train.val_evaluation_epoch
                    and epoch % cfg.train.val_evaluation_epoch == 0
                    and epoch >= cfg.train.warm_up_epoch
                    and val_loader.num_examples() > 0):
                result = self.validate(state, val_loader, epoch)
                if result["mAP"] > self.best_map:
                    self.best_map = result["mAP"]
                    name = (f"best_model_Epoch_{epoch}_step_{step}"
                            f"_mAP_{self.best_map:.4f}"
                            f"_loss_{result['val_loss']:.4f}"
                            f"_lr_{self._last_lr:.7g}")
                    self.store.save(name, state,
                                    include_opt=cfg.train.save_optimizer)
        self.writer.flush()
        return state
