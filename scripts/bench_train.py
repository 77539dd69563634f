"""Training-step throughput + MFU on the real chip.

Measures the jitted train step (forward + loss + backward + clip + optimizer
+ sync-free BN update) at several batch sizes with device-resident data, so
the number is pure device step time — the host pipeline is benchmarked
separately (it overlaps with device compute in the real Trainer).

Timing uses the chained-differential method (see bench.py docstring): steps
chain naturally through the donated TrainState, one host sync at the end,
and per-step time is (T(N2) - T(N1)) / (N2 - N1).

MFU = model FLOPs / (step time * peak); model FLOPs are taken from XLA's own
cost analysis of the compiled step (not an analytic guess). Peak bf16 on
v5e: 197 TFLOP/s.

  python scripts/bench_train.py [--batches 8,16,32,64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_BF16_FLOPS = 197e12  # TPU v5e


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="8,16,32,64")
    p.add_argument("--img", type=int, default=416)
    args = p.parse_args(argv)

    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.config import Config
    from yolov3_tensorflow_tpu.train.optimizers import build_optimizer
    from yolov3_tensorflow_tpu.train.schedules import build_schedule
    from yolov3_tensorflow_tpu.train.trainer import make_train_step

    cfg = Config()
    cfg.train.update_part = None
    cfg.train.restore_exclude = None
    cfg.train_img_cnt = 117000  # schedule derivations only
    cfg.train_batch_num = 1000
    cfg.finalize(count_files=False)

    schedule = build_schedule(cfg)
    optimizer = build_optimizer(cfg.train.optimizer, schedule,
                                momentum=cfg.train.momentum,
                                grad_clip_norm=cfg.train.grad_clip_norm)
    step_fn = jax.jit(make_train_step(cfg, optimizer), donate_argnums=(0,))

    from yolov3_tensorflow_tpu.models.yolov3 import init_yolov3
    rng = np.random.default_rng(0)
    size = args.img
    rows = []
    for batch in (int(b) for b in args.batches.split(",")):
        variables = init_yolov3(jax.random.PRNGKey(0), cfg.model.num_classes)
        state = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"],
                 "opt_state": optimizer.init(variables["params"]),
                 "step": jnp.asarray(0, jnp.int32)}
        images = jnp.asarray(
            rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32))
        c = 6 + cfg.model.num_classes
        y_true = tuple(
            jnp.zeros((batch, size // s, size // s, 3, c), jnp.float32)
            for s in (32, 16, 8))

        # compile + XLA's own FLOP count for this program
        compiled = step_fn.lower(state, images, y_true).compile()
        cost = compiled.cost_analysis()
        flops = float((cost or {}).get("flops", 0.0))

        state, metrics = compiled(state, images, y_true)
        np.asarray(metrics["total"])  # full sync

        def run(n, state):
            t0 = time.perf_counter()
            for _ in range(n):
                state, metrics = compiled(state, images, y_true)
            np.asarray(metrics["total"])
            return time.perf_counter() - t0, state

        diffs = []
        for _ in range(2):
            t1, state = run(4, state)
            t2, state = run(16, state)
            diffs.append((t2 - t1) / 12)
        dt = max(min(diffs), 1e-9)
        mfu = flops / dt / PEAK_BF16_FLOPS if flops else float("nan")
        rows.append({"batch": batch, "ms_per_step": round(dt * 1e3, 2),
                     "img_per_sec": round(batch / dt, 1),
                     "xla_flops_per_step": flops,
                     "mfu_vs_bf16_peak": round(mfu, 3)})
        print(f"batch {batch:3d}: {dt * 1e3:8.2f} ms/step  "
              f"{batch / dt:8.1f} img/s  MFU {mfu * 100:5.1f}%",
              file=sys.stderr, flush=True)
        del state

    print(json.dumps({"metric": "train_step_416", "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
