"""Stage-by-stage serving-path profiler (chained-differential timing).

Breaks the 416x416 bf16 serving pipeline into incremental stages so the
optimization work targets measured costs, not guesses:

  forward            folded bf16 forward only
  +score             + objectness scores over all anchors
  +topk              + candidate top_k (exact and approx)
  +decode            + candidate gather + box decode
  +nms               + Pallas shared-candidate NMS (= full pipeline)

Plus microbenches for layout questions:
  copy of a narrow-channel high-res tensor vs a wide low-res tensor of the
  same logical byte count (detects lane-padding HBM waste), and stem-only
  truncated forwards.

Usage: python scripts/profile_stages.py [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, *args, n1: int = 5, n2: int = 25) -> float:
    """Chained-differential seconds per iteration of fn(*args, fb)->scalar."""
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
    for _ in range(2):
        t1, t2 = run(n1), run(n2)
        diffs.append((t2 - t1) / (n2 - n1))
    return max(min(diffs), 1e-9)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, nargs=2, default=[416, 416])
    args = p.parse_args()
    b = args.batch
    img_h, img_w = args.size

    import jax
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS
    from yolov3_tensorflow_tpu.models.yolov3 import (fold_batch_norm,
                                                     init_yolov3,
                                                     yolov3_forward_folded)
    from yolov3_tensorflow_tpu.ops import fast_postprocess as fpp

    num_classes = 80
    anchors = np.asarray(DEFAULT_ANCHORS, np.float32)
    variables = init_yolov3(jax.random.PRNGKey(0), num_classes)
    folded = fold_batch_norm(variables, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (b, img_h, img_w, 3)).astype(np.float32)))

    def fwd(im):
        return yolov3_forward_folded(folded, im, compute_dtype=jnp.bfloat16)

    # ---- stage: forward only ----
    # NB: the fetched scalar must touch ALL THREE feature maps — returning
    # only fm[0][0,0,0,0] lets XLA dead-code-eliminate the stride-16/8 head
    # branches entirely (measured: 51.6 vs 59+ ms/batch-128, a ~2/3-of-the-
    # head underestimate that round 3 briefly reported as "forward only").
    @jax.jit
    def s_forward(im, fb):
        fm = fwd(im + fb * 0.0)
        return sum(x[0, 0, 0, 0].astype(jnp.float32) for x in fm)

    t_fwd = measure(s_forward, images)
    print(f"forward only:            {t_fwd*1e3:8.2f} ms/batch "
          f"({b/t_fwd:7.1f} img/s)")

    # ---- stage: packed serving forward (the bench path's forward) ----
    packed = fpp.pack_serving_head(folded, num_classes)

    @jax.jit
    def s_forward_packed(im, fb):
        fm = fpp.yolov3_forward_packed(packed, im + fb * 0.0)
        return sum(x[0, 0, 0, 0].astype(jnp.float32) for x in fm)

    t_fp = measure(s_forward_packed, images)
    print(f"forward packed:          {t_fp*1e3:8.2f} ms/batch "
          f"({b/t_fp:7.1f} img/s)")

    # ---- postprocess stages from precomputed fmaps ----
    fmaps = jax.jit(fwd)(images)
    for x in fmaps:
        x.block_until_ready()
    np.asarray(fmaps[0][0, 0, 0, 0].astype(jnp.float32))

    def scores_of(fm):
        raw = fpp.flatten_feature_maps(fm, num_classes)
        conf = raw[..., 4].astype(jnp.float32)
        best = jnp.max(raw[..., 5:5 + num_classes], axis=-1).astype(jnp.float32)
        return raw, jax.nn.sigmoid(conf) * jax.nn.sigmoid(best)

    @jax.jit
    def s_score(fm, fb):
        fm = tuple(x + fb * 0.0 for x in fm)
        _, obj = scores_of(fm)
        return obj[0, 0]

    @jax.jit
    def s_topk(fm, fb):
        fm = tuple(x + fb * 0.0 for x in fm)
        _, obj = scores_of(fm)
        _, idx = jax.lax.top_k(obj, 128)
        return idx[0, 0].astype(jnp.float32)

    @jax.jit
    def s_topk_approx(fm, fb):
        fm = tuple(x + fb * 0.0 for x in fm)
        _, obj = scores_of(fm)
        _, idx = jax.lax.approx_max_k(obj, 128, recall_target=0.95)
        return idx[0, 0].astype(jnp.float32)

    def post(fm, approx):
        return fpp.postprocess_prefilter(
            fm, anchors, num_classes, (img_h, img_w), max_out=50,
            box_topk=128, pre_topk=128, score_thresh=0.3, iou_thresh=0.45,
            use_pallas=jax.default_backend() == "tpu", approx_topk=approx)

    @jax.jit
    def s_full(fm, fb):
        fm = tuple(x + fb * 0.0 for x in fm)
        out = post(fm, True)
        return out["scores"][0, 0]

    @jax.jit
    def s_full_exact(fm, fb):
        fm = tuple(x + fb * 0.0 for x in fm)
        out = post(fm, False)
        return out["scores"][0, 0]

    for name, fn in (("score", s_score), ("score+topk", s_topk),
                     ("score+approx_topk", s_topk_approx),
                     ("full post (approx)", s_full),
                     ("full post (exact)", s_full_exact)):
        t = measure(fn, fmaps)
        print(f"post {name:<20s} {t*1e3:8.2f} ms/batch "
              f"({t/b*1e3:6.3f} ms/img)")

    # ---- packed-path postprocess breakdown (the bench path) ----
    packed_outs = jax.jit(
        lambda im: fpp.yolov3_forward_packed(packed, im))(images)
    for x in packed_outs:
        x.block_until_ready()
    np.asarray(packed_outs[0][0, 0, 0, 0].astype(jnp.float32))
    row = fpp.head_row_width(num_classes)

    def packed_scores(po):
        lane = jax.lax.broadcasted_iota(jnp.int32, (row,), 0)
        neg = jnp.asarray(-jnp.inf, po[0].dtype)
        objs = []
        for p_ in po:
            bb, hg, wg, _ = p_.shape
            pr = p_.reshape(bb, hg * wg * 3, row)
            lane_max = jnp.max(jnp.where(lane < num_classes, pr, neg),
                               axis=-1).astype(jnp.float32)
            conf = pr[..., num_classes].astype(jnp.float32)
            objs.append(jax.nn.sigmoid(conf) * jax.nn.sigmoid(lane_max))
        return jnp.concatenate(objs, axis=1)

    @jax.jit
    def pp_score(po, fb):
        # sum (not a single element) so XLA cannot DCE the score compute
        po = tuple(x + fb.astype(x.dtype) for x in po)
        return jnp.sum(packed_scores(po))

    @jax.jit
    def pp_topk(po, fb):
        po = tuple(x + fb.astype(x.dtype) for x in po)
        _, idx = jax.lax.approx_max_k(packed_scores(po), 64,
                                      recall_target=0.95)
        return idx[0, 0].astype(jnp.float32)

    def pp_full_of(max_out):
        @jax.jit
        def f(po, fb):
            po = tuple(x + fb.astype(x.dtype) for x in po)
            out = fpp.postprocess_packed(
                po, anchors, num_classes, (img_h, img_w), max_out=max_out,
                box_topk=64, score_thresh=0.3, iou_thresh=0.45,
                approx_topk=True,
                use_pallas=jax.default_backend() == "tpu")
            return out["scores"][0, 0]
        return f

    @jax.jit
    def pp_gather_decode(po, fb):
        # everything up to (but excluding) the NMS kernel: score, approx
        # top-k, candidate row gather, box decode
        po = tuple(x + fb.astype(x.dtype) for x in po)
        obj = packed_scores(po)
        _, cand_idx = jax.lax.approx_max_k(obj, 64, recall_target=0.95)
        rows = None
        off = 0
        for p_ in po:
            bb, hg, wg, _ = p_.shape
            na = hg * wg * 3
            pr = p_.reshape(bb, na, row)
            local = jnp.clip(cand_idx - off, 0, na - 1)
            g = jnp.take_along_axis(pr, local[..., None], axis=1)
            in_scale = ((cand_idx >= off) & (cand_idx < off + na))[..., None]
            rows = g if rows is None else jnp.where(in_scale, g, rows)
            off += na
        box = rows[..., num_classes + 1:num_classes + 5].astype(jnp.float32)
        conf = rows[..., num_classes].astype(jnp.float32)
        return (jnp.sum(box[0, 0]) + conf[0, 0]
                + cand_idx[0, 0].astype(jnp.float32))

    for name, fn in (("packed score", pp_score),
                     ("packed score+topk", pp_topk),
                     ("packed +gather+decode", pp_gather_decode),
                     ("packed full (max_out=128)", pp_full_of(128)),
                     ("packed full (max_out=64)", pp_full_of(64))):
        t = measure(fn, packed_outs)
        print(f"post {name:<26s} {t*1e3:8.2f} ms/batch "
              f"({t/b*1e3:6.3f} ms/img)")

    # ---- layout probe: narrow vs wide channel copies, same bytes ----
    # The full added array must be a jit OUTPUT, else XLA computes only the
    # one fetched element (the first version of this probe read "43 TB/s").
    narrow = jax.device_put(jnp.zeros((b, img_h, img_w, 32), jnp.bfloat16))
    wide = jax.device_put(jnp.zeros((b, img_h // 2, img_w // 2, 128),
                                    jnp.bfloat16))

    @jax.jit
    def s_copy(x, fb):
        y = x + fb.astype(x.dtype)
        return y, y[0, 0, 0, 0].astype(jnp.float32)

    def copy_once(x, fb):
        y, fb = s_copy(x, fb)
        return fb

    for name, t_ in (("narrow  [b,416,416,32]", narrow),
                     ("wide    [b,208,208,128]", wide)):
        t = measure(copy_once, t_)
        gb = t_.size * 2 / 1e9
        print(f"copy {name}: {t*1e3:7.2f} ms  "
              f"({2*gb/t:6.0f} GB/s effective r+w)")

    # ---- stem probe: cumulative cost of the first K backbone convs ----
    from yolov3_tensorflow_tpu.models.layers import conv_folded
    bb = folded["backbone"]

    def stem(im, upto):
        # plan: conv0 3x3s1(32) conv1 3x3s2(64) res[conv2 1x1(32) conv3 3x3(64)]
        # conv4 3x3s2(128) res[conv5,conv6] res[conv7,conv8] conv9 3x3s2(256)...
        strides = {1: 2, 4: 2, 9: 2, 26: 2, 43: 2}
        x = im.astype(jnp.bfloat16)
        shortcut = None
        res_at = set()
        # reconstruct residual adds from the plan
        from yolov3_tensorflow_tpu.models.yolov3 import BACKBONE_PLAN
        idx = 0
        for op in BACKBONE_PLAN:
            if op[0] == "conv":
                if idx >= upto:
                    break
                x = conv_folded(x, bb[f"conv_{idx}"], stride=op[3])
                idx += 1
            elif op[0] == "res_begin":
                shortcut = x
            elif op[0] == "res_end":
                if idx <= upto and shortcut is not None \
                        and shortcut.shape == x.shape:
                    x = x + shortcut
        return x

    prev = 0.0
    for upto in (1, 2, 4, 9, 12, 26, 43, 52):
        f = jax.jit(lambda im, fb, u=upto: stem(
            im + fb * 0.0, u)[0, 0, 0, 0].astype(jnp.float32))
        t = measure(f, images)
        print(f"backbone conv_0..conv_{upto-1:<3d} cumulative "
              f"{t*1e3:8.2f} ms/batch  (+{(t-prev)*1e3:7.2f})")
        prev = t


if __name__ == "__main__":
    main()
