"""Stage-by-stage TRAIN-step profiler (chained-differential timing).

Round-2 left training at ~42% MFU with no breakdown of where the non-conv
time goes (VERDICT round 2, weak #3). This splits the jitted train step into
incremental stages so the optimization work targets measured costs:

  fwd(train)      training-mode forward (BN batch stats) only
  loss(fmaps)     fp32 YOLO loss from precomputed feature maps
                  (incl. the fixed-capacity ignore-mask top_k)
  fwd+loss        forward + loss, value only
  grad            jax.grad of fwd+loss (fwd + bwd)
  full step       grad + pmean-free optimizer + BN update (make_train_step)
  opt(grads)      optimizer update + apply from precomputed grads
  l2(params)      the weight-decay reduction alone

Each stage reports XLA's own FLOP count for its compiled program and the
implied MFU share, so "where do the other 58% go" has a number per stage.

Usage: python scripts/profile_train.py [--batch 32] [--size 416]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_BF16_FLOPS = 197e12  # TPU v5e


def measure(fn, *args, n1: int = 5, n2: int = 20) -> float:
    import jax.numpy as jnp

    fb = fn(*args, jnp.float32(0))
    np.asarray(fb)

    def run(n):
        fb = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            fb = fn(*args, fb)
        np.asarray(fb)
        return time.perf_counter() - t0

    diffs = []
    for _ in range(3):
        t1, t2 = run(n1), run(n2)
        diffs.append((t2 - t1) / (n2 - n1))
    return max(min(diffs), 1e-9)


def xla_flops(jitted, *args) -> float:
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float((cost or {}).get("flops", 0.0))
    except Exception:
        return 0.0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=416)
    args = p.parse_args(argv)
    b, size = args.batch, args.size

    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.models.yolov3 import (init_yolov3,
                                                     yolov3_forward)
    from yolov3_tensorflow_tpu.ops.losses import (compute_loss,
                                                  l2_regularization)
    from yolov3_tensorflow_tpu.train.optimizers import build_optimizer
    from yolov3_tensorflow_tpu.train.schedules import build_schedule
    from yolov3_tensorflow_tpu.train.trainer import make_train_step

    cfg = Config()
    cfg.train.update_part = None
    cfg.train.restore_exclude = None
    cfg.train_img_cnt = 117000
    cfg.train_batch_num = 1000
    cfg.finalize(count_files=False)
    m = cfg.model
    anchors = np.asarray(cfg.anchors, np.float32)

    schedule = build_schedule(cfg)
    optimizer = build_optimizer(cfg.train.optimizer, schedule,
                                momentum=cfg.train.momentum,
                                grad_clip_norm=cfg.train.grad_clip_norm)

    variables = init_yolov3(jax.random.PRNGKey(0), m.num_classes)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"],
             "opt_state": optimizer.init(variables["params"]),
             "step": jnp.asarray(0, jnp.int32)}
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (b, size, size, 3)).astype(np.float32)))
    c = 6 + m.num_classes
    y_true = tuple(
        jax.device_put(jnp.asarray(
            rng.uniform(0, 0.01, (b, size // s, size // s, 3, c))
            .astype(np.float32)))
        for s in (32, 16, 8))

    def fwd(params, stats, im):
        return yolov3_forward(
            {"params": params, "batch_stats": stats}, im, train=True,
            compute_dtype=jnp.dtype(m.compute_dtype),
            bn_momentum=m.batch_norm_decay, bn_eps=m.batch_norm_epsilon)

    def loss_of(fmaps, imgsz):
        losses = compute_loss(fmaps, y_true, anchors, m.num_classes, imgsz,
                              use_label_smooth=m.use_label_smooth,
                              use_focal_loss=m.use_focal_loss,
                              max_gt=cfg.data.max_boxes_per_image,
                              box_loss=m.box_loss)
        return losses["total"]

    rows = []

    def report(name, t, fl):
        mfu = fl / t / PEAK_BF16_FLOPS if fl else 0.0
        rows.append((name, t, fl, mfu))
        print(f"{name:<14s} {t*1e3:8.2f} ms/batch  {b/t:7.1f} img/s   "
              f"XLA {fl/1e12:6.2f} TFLOP  MFU {mfu*100:5.1f}%", flush=True)

    # ---- fwd(train) ----
    @jax.jit
    def s_fwd(params, stats, im, fb):
        fmaps, _ = fwd(params, stats, im + fb * 0.0)
        return fmaps[0][0, 0, 0, 0].astype(jnp.float32)

    fl = xla_flops(s_fwd, state["params"], state["batch_stats"], images,
                   jnp.float32(0))
    report("fwd(train)", measure(s_fwd, state["params"],
                                 state["batch_stats"], images), fl)

    # ---- loss from precomputed fmaps ----
    fmaps, _ = jax.jit(fwd)(state["params"], state["batch_stats"], images)
    fmaps = tuple(jax.device_put(x) for x in fmaps)
    np.asarray(fmaps[0][0, 0, 0, 0].astype(jnp.float32))

    @jax.jit
    def s_loss(fm, fb):
        fm = tuple(x + fb.astype(x.dtype) for x in fm)
        return loss_of(fm, (size, size))

    fl = xla_flops(s_loss, fmaps, jnp.float32(0))
    report("loss(fmaps)", measure(s_loss, fmaps), fl)

    # ---- fwd + loss value ----
    @jax.jit
    def s_fwd_loss(params, stats, im, fb):
        fmaps, _ = fwd(params, stats, im + fb * 0.0)
        return loss_of(fmaps, (size, size))

    fl = xla_flops(s_fwd_loss, state["params"], state["batch_stats"], images,
                   jnp.float32(0))
    report("fwd+loss", measure(s_fwd_loss, state["params"],
                               state["batch_stats"], images), fl)

    # ---- grad ----
    @jax.jit
    def s_grad(params, stats, im, fb):
        def f(p):
            fmaps, _ = fwd(p, stats, im + fb * 0.0)
            return loss_of(fmaps, (size, size)) \
                + l2_regularization(p, m.weight_decay)
        g = jax.grad(f)(params)
        return g["backbone"]["conv_0"]["w"][0, 0, 0, 0].astype(jnp.float32)

    fl = xla_flops(s_grad, state["params"], state["batch_stats"], images,
                   jnp.float32(0))
    report("grad(fwd+bwd)", measure(s_grad, state["params"],
                                    state["batch_stats"], images), fl)

    # ---- optimizer from precomputed grads ----
    grads = jax.jit(lambda p, st, im: jax.grad(
        lambda q: loss_of(fwd(q, st, im)[0], (size, size)))(p))(
            state["params"], state["batch_stats"], images)
    jax.block_until_ready(grads)

    @jax.jit
    def s_opt(g, opt_state, params, fb):
        g = jax.tree_util.tree_map(
            lambda x: x + fb.astype(x.dtype) * 0.0, g)
        import optax
        updates, _ = optimizer.update(g, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params["backbone"]["conv_0"]["w"][0, 0, 0, 0] \
            .astype(jnp.float32)

    fl = xla_flops(s_opt, grads, state["opt_state"], state["params"],
                   jnp.float32(0))
    report("opt(grads)", measure(s_opt, grads, state["opt_state"],
                                 state["params"]), fl)

    # ---- l2 alone ----
    @jax.jit
    def s_l2(params, fb):
        params = jax.tree_util.tree_map(
            lambda x: x + fb.astype(x.dtype) * 0.0, params)
        return l2_regularization(params, m.weight_decay)

    fl = xla_flops(s_l2, state["params"], jnp.float32(0))
    report("l2(params)", measure(s_l2, state["params"]), fl)

    # ---- full step (the production program) ----
    step_fn = jax.jit(make_train_step(cfg, optimizer))

    def s_full(st, im, fb):
        new_state, metrics = step_fn(st, im + fb * 0.0, y_true)
        return metrics["total"]

    fl = xla_flops(step_fn, state, images, y_true)
    report("full step", measure(s_full, state, images), fl)

    print("\nderived (ms/batch):", flush=True)
    t = {name: tt for name, tt, _, _ in rows}
    print(f"  loss attach overhead (fwd+loss - fwd):   "
          f"{(t['fwd+loss'] - t['fwd(train)'])*1e3:7.2f}")
    print(f"  bwd cost        (grad - fwd+loss):       "
          f"{(t['grad(fwd+bwd)'] - t['fwd+loss'])*1e3:7.2f}")
    print(f"  step scaffolding (full - grad - opt):    "
          f"{(t['full step'] - t['grad(fwd+bwd)'] - t['opt(grads)'])*1e3:7.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
