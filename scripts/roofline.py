"""Quantitative roofline close-out for the bf16 416^2 serving pipeline.

VERDICT r4 asked for either a decisive bf16 >= 2000 img/s driver capture or
"the arithmetic (bytes + FLOPs per image vs measured 670 GB/s and 197 TF/s)"
committed to BENCHMARKS.md. This script is that arithmetic, derived from the
model plan itself (models/yolov3.py BACKBONE_PLAN + head_plan) rather than
hand-copied layer tables, so it stays correct if the plan changes.

Per conv layer i the execution-time lower bound is
    t_i = max(FLOPs_i / PEAK_FLOPS, bytes_i / MEAS_HBM)
with bytes counted optimistically (perfect fusion: one read of the input,
one write of the output, weights amortized over the batch; BN/leaky/residual
adds ride the conv epilogue for free; the split-neck junction never
materializes a concat). Summing t_i assumes perfect inter-layer overlap and
zero scheduling overhead, so sum(t_i) is a true per-batch LOWER bound and
batch/sum(t_i) a throughput CEILING for this dtype on this chip.

Constants are this chip's MEASURED numbers (docs/BENCHMARKS.md "Hardware
context"): 197 TFLOP/s bf16 conv peak (194 measured on a fat shape) and
670 GB/s effective HBM bandwidth (honest r+w copy probe; the 819 GB/s paper
figure is not achievable on tiled conv activation layouts).

Run: python scripts/roofline.py [--batch 128] [--size 416 416]
Prints the per-stage table and the ceiling; the committed copy lives in
docs/BENCHMARKS.md (round-5 close-out section).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12     # bf16 MXU peak, v5e (measured 194 on 52^2x512 conv)
MEAS_HBM = 670e9        # measured effective HBM bandwidth (r+w probe)
BYTES = 2               # bf16


def conv_cost(h, w, cin, cout, k, stride, batch, extra_read_c=0):
    """(flops, bytes) for one fused conv(+BN+leaky[+residual-add]) layer.

    extra_read_c: channels of an extra full-resolution operand the epilogue
    must read (residual shortcut).
    """
    ho, wo = h // stride, w // stride
    flops = 2.0 * batch * ho * wo * cin * cout * k * k
    bytes_ = BYTES * batch * (h * w * cin            # read input
                              + ho * wo * cout       # write output
                              + ho * wo * extra_read_c)
    bytes_ += BYTES * k * k * cin * cout             # weights, once per batch
    return flops, bytes_


def walk(batch, img_h, img_w, num_classes=80):
    from yolov3_tensorflow_tpu.models.yolov3 import BACKBONE_PLAN, head_plan

    rows = []   # (label, flops, bytes)
    h, w, cin = img_h, img_w, 3
    route_c = {}
    in_res = False
    res_in_c = 0
    for op in BACKBONE_PLAN:
        if op[0] == "conv":
            _, cout, k, stride = op
            # closing conv of a residual block also reads the shortcut
            extra = res_in_c if (in_res and k == 3) else 0
            f, b = conv_cost(h, w, cin, cout, k, stride, batch,
                             extra_read_c=extra)
            rows.append((f"bb {h//stride}^2x{cout} k{k}", f, b))
            h, w, cin = h // stride, w // stride, cout
            if in_res and k == 3:
                in_res = False
        elif op[0] == "res_begin":
            in_res, res_in_c = True, cin
        elif op[0] == "route":
            route_c[len(route_c)] = (h, w, cin)

    # head: 3 yolo blocks; split-neck junction = the first 1x1 conv of
    # blocks 2 and 3 reads (lateral-upsampled, route) as two partial convs —
    # same bytes as one conv over the concat, no concat materialization.
    # Upsample itself is modeled as one read+write of the lateral tensor
    # (reshape-broadcast; XLA materializes the 2x map the junction reads).
    (h3, w3, c3), (h2, w2, c2), (h1, w1, c1) = (
        route_c[2], route_c[1], route_c[0])

    def yolo_block(h, w, cin, f, label):
        ks = [1, 3, 1, 3, 1, 3]
        cs = [f, 2 * f, f, 2 * f, f, 2 * f]
        c = cin
        for k, co in zip(ks, cs):
            fl, b = conv_cost(h, w, c, co, k, 1, batch)
            rows.append((f"{label} {h}x{w} k{k}x{co}", fl, b))
            c = co
        # detection conv (packed head: one conv, 3*(5+C) rounded into
        # per-anchor 128-lane blocks -> 384 lanes at C=80)
        out_c = 3 * (5 + num_classes)
        fl, b = conv_cost(h, w, c, out_c, 1, 1, batch)
        rows.append((f"{label} det {h}x{w}", fl, b))
        return c

    c = yolo_block(h3, w3, c3, 512, "head13")
    # lateral 1x1 (512->256) + upsample write+read at 26^2
    fl, b = conv_cost(h3, w3, c, 256, 1, 1, batch)
    rows.append(("lat13->26", fl, b))
    rows.append(("upsample 26^2x256", 0.0,
                 BYTES * batch * h2 * w2 * 256 * 2))
    yolo_block(h2, w2, 256 + c2, 256, "head26")
    fl, b = conv_cost(h2, w2, 256, 128, 1, 1, batch)
    rows.append(("lat26->52", fl, b))
    rows.append(("upsample 52^2x128", 0.0,
                 BYTES * batch * h1 * w1 * 128 * 2))
    yolo_block(h1, w1, 128 + c1, 128, "head52")
    return rows


def train_cost(rows):
    """Map forward (flops, bytes) rows to training-step lower bounds.

    Per conv layer the train step does 3 matmul-shaped passes (forward,
    input-cotangent, weight-gradient), each the same FLOPs as forward;
    optimistic byte count: forward reads X + writes Y; backward reads dY,
    re-reads the saved X (weight grad), writes dX — 3*in + 2*out activation
    traffic total, weights touched 3x per batch (fwd, dgrad, wgrad) plus a
    gradient write. BN train-mode stat passes, the loss/ignore-mask block,
    and the optimizer's elementwise sweeps are all EXCLUDED, so this bound
    is generous to the hardware (a true ceiling).
    """
    out = []
    for label, f, b in rows:
        # recover in/out activation bytes from the fwd row: b ~= in + out
        # (+ weights, negligible at batch scale). Training ~ (3*in + 2*out)
        # <= 2.5x fwd activation bytes; use 2.5x as the optimistic midpoint.
        out.append((label, 3.0 * f, 2.5 * b))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, nargs=2, default=[416, 416])
    p.add_argument("--train", action="store_true",
                   help="bound the TRAINING step (fwd+bwd) instead of "
                        "inference")
    p.add_argument("--measured_ms", type=float, default=0.0,
                   help="measured ms/batch to compare against")
    args = p.parse_args(argv)

    rows = walk(args.batch, *args.size)
    if args.train:
        rows = train_cost(rows)
    tot_f = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    t_flop = sum(r[1] / PEAK_FLOPS for r in rows)
    t_hbm = sum(r[2] / MEAS_HBM for r in rows)
    t_bound = sum(max(r[1] / PEAK_FLOPS, r[2] / MEAS_HBM) for r in rows)
    n_hbm = sum(1 for r in rows if r[2] / MEAS_HBM > r[1] / PEAK_FLOPS)

    print(f"batch {args.batch} @ {args.size[0]}x{args.size[1]} bf16")
    print(f"  total FLOPs/img: {tot_f / args.batch / 1e9:.1f} GF; "
          f"HBM bytes/img (perfect fusion): {tot_b / args.batch / 1e6:.0f} MB")
    print(f"  pure-FLOP time:  {t_flop * 1e3:7.2f} ms/batch "
          f"({args.batch / t_flop:7.0f} img/s)")
    print(f"  pure-HBM time:   {t_hbm * 1e3:7.2f} ms/batch "
          f"({args.batch / t_hbm:7.0f} img/s)")
    print(f"  per-layer max(F,B) bound: {t_bound * 1e3:.2f} ms/batch "
          f"-> CEILING {args.batch / t_bound:.0f} img/s "
          f"({n_hbm}/{len(rows)} stages HBM-bound)")
    if args.measured_ms:
        print(f"  measured: {args.measured_ms:.2f} ms/batch = "
              f"{args.batch / args.measured_ms * 1e3:.0f} img/s = "
              f"{t_bound * 1e3 / args.measured_ms * 100:.0f}% of the bound")
    print("  top HBM-bound stages (bound_ms, flop_ms):")
    hb = sorted(rows, key=lambda r: -(r[2] / MEAS_HBM - r[1] / PEAK_FLOPS))
    for label, f, b in hb[:8]:
        print(f"    {label:24s} hbm {b / MEAS_HBM * 1e3:6.2f} ms  "
              f"flop {f / PEAK_FLOPS * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
