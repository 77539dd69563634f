"""Round-5: why does the objectness score stage cost ~3x its read floor?

Variants of the packed-head selection score, measured standalone from
device-resident packed outputs. Iterations are serialized by the device
queue and the final fetched scalar depends additively on every iteration's
result (output-chaining — no DCE, and unlike input-chaining it adds no
full-operand copy per iteration).

  v0 where-mask + lane max (current)
  v1 constant-vector additive mask + lane max (fusion-friendlier?)
  v2 4D form (no [B,nc,3row] reshape), where-mask
  v3 conf-lane only (read-floor probe: one lane per block, no max)
  v4 v1 in bf16 score dtype
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_out_chain(fn, *args, n1=5, n2=25, reps=3):
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
    for _ in range(reps):
        t1, t2 = run(n1), run(n2)
        diffs.append((t2 - t1) / (n2 - n1))
    return max(min(diffs), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from yolov3_tensorflow_tpu.models.yolov3 import fold_batch_norm, init_yolov3
    from yolov3_tensorflow_tpu.ops import fast_postprocess as fpp

    b, c = 128, 80
    variables = init_yolov3(jax.random.PRNGKey(0), c)
    packed = fpp.pack_serving_head(fold_batch_norm(variables, jnp.bfloat16), c)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (b, 416, 416, 3)).astype(np.float32)))
    row = fpp.head_row_width(c)

    packed_outs = jax.jit(
        lambda im: fpp.yolov3_forward_packed(packed, im))(images)
    for x in packed_outs:
        x.block_until_ready()
    np.asarray(packed_outs[0][0, 0, 0, 0].astype(jnp.float32))

    lane = jax.lax.broadcasted_iota(jnp.int32, (row,), 0)
    # additive mask: 0 on class lanes, -1e4 elsewhere (pad lanes are -30
    # already; conf/box lanes are the ones that must not win)
    addmask = jnp.where(lane < c, 0.0, -1e4).astype(jnp.bfloat16)

    def v0(po, fb):
        neg = jnp.asarray(-jnp.inf, po[0].dtype)
        tot = fb
        for p_ in po:
            bb, hg, wg, _ = p_.shape
            pc = p_.reshape(bb, hg * wg, 3 * row)
            for a3 in range(3):
                blk = pc[..., a3 * row:(a3 + 1) * row]
                m = jnp.max(jnp.where(lane < c, blk, neg),
                            axis=-1).astype(jnp.float32)
                conf = blk[..., c].astype(jnp.float32)
                tot = tot + jnp.sum(jax.nn.sigmoid(conf) * jax.nn.sigmoid(m))
        return tot

    def v1(po, fb):
        tot = fb
        for p_ in po:
            bb, hg, wg, _ = p_.shape
            pc = p_.reshape(bb, hg * wg, 3 * row)
            for a3 in range(3):
                blk = pc[..., a3 * row:(a3 + 1) * row]
                m = jnp.max(blk + addmask, axis=-1).astype(jnp.float32)
                conf = blk[..., c].astype(jnp.float32)
                tot = tot + jnp.sum(jax.nn.sigmoid(conf) * jax.nn.sigmoid(m))
        return tot

    def v2(po, fb):
        neg = jnp.asarray(-jnp.inf, po[0].dtype)
        tot = fb
        for p_ in po:
            for a3 in range(3):
                blk = p_[..., a3 * row:(a3 + 1) * row]     # 4D static slice
                m = jnp.max(jnp.where(lane < c, blk, neg),
                            axis=-1).astype(jnp.float32)
                conf = blk[..., c].astype(jnp.float32)
                tot = tot + jnp.sum(jax.nn.sigmoid(conf) * jax.nn.sigmoid(m))
        return tot

    def v3(po, fb):
        tot = fb
        for p_ in po:
            for a3 in range(3):
                conf = p_[..., a3 * row + c].astype(jnp.float32)
                tot = tot + jnp.sum(jax.nn.sigmoid(conf))
        return tot

    def v4(po, fb):
        tot = fb
        for p_ in po:
            bb, hg, wg, _ = p_.shape
            pc = p_.reshape(bb, hg * wg, 3 * row)
            for a3 in range(3):
                blk = pc[..., a3 * row:(a3 + 1) * row]
                m = jnp.max(blk + addmask, axis=-1)
                conf = blk[..., c]
                tot = tot + jnp.sum(
                    (jax.nn.sigmoid(conf) * jax.nn.sigmoid(m)
                     ).astype(jnp.float32))
        return tot

    for name, fn in (("v0 where+max (current)", v0),
                     ("v1 addmask+max", v1),
                     ("v2 4D where+max", v2),
                     ("v3 conf-only (floor)", v3),
                     ("v4 addmask bf16", v4)):
        t = measure_out_chain(jax.jit(fn), packed_outs)
        print(f"{name:<26s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
