"""Microbench: achievable MXU rates for fused-stem candidate matmul shapes.

The bf16 forward's remaining gap to its conv roofline is concentrated in
conv_0..conv_11 (measured 18.9 ms vs ~7.9 ms FLOP roofline at batch 128 —
scripts/profile_stages.py), which is HBM-bandwidth-bound under XLA because
every low-channel high-resolution activation round-trips HBM. A Pallas
fused stem keeps them in VMEM, but then the cost becomes MXU time at
small-K/small-N shapes. This script measures the actual matmul throughput
of every candidate shape with a Pallas kernel that keeps both operands in
VMEM and chains R dependent matmuls (so neither HBM bandwidth nor XLA
DCE/CSE can pollute the reading — a first XLA-level version of this script
was completely DCE'd and printed teraflop nonsense).

Shapes map to stem layers under a space-to-depth(2) formulation:
  c0'  [M,108]x[108,128]    conv_0 as s2d (12ch x 9 taps -> 4x32 out)
  c1'  [M,512]x[512,64]     conv_1 as 2x2 cells over s2d(conv_0 out)
  c3'  [M,512]x[512,256]    conv_3 3x3 as 2x2 cells in s2d-104 domain
  c4'  [M,1024]x[1024,128]  conv_4 3x3 s2 as 2x2 cells (s2d-104 -> native)
  c5   [M,128]x[128,64]     conv_5 1x1 native 104^2
  c6   [M,576]x[576,128]    conv_6 3x3 via 9-tap im2col patches

Also measures the VMEM im2col patch-build cost (9 sublane-shifted slices
lane-concatenated at 64-lane offsets), which is the non-matmul tax of any
in-kernel 3x3 formulation.

Usage: python scripts/exp_mxu_shapes.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 64          # dependent matmuls per grid step
MT = 1024          # M tile (sublanes) per grid step


def _rate_kernel(a_ref, b_ref, o_ref, *, reps):
    import jax
    import jax.numpy as jnp

    def body(i, acc):
        # acc feeds back into b via a scalar so iterations are order-forced
        # and the dot cannot be CSE'd; the multiply is VPU noise. The
        # epsilon scale (not *0.0) defeats XLA/Mosaic algebraic folding,
        # which turned a `*0.0` version of this chain into a constant and
        # let the loop collapse (readings of 400%+ of peak).
        s = (1.0 + acc[0, 0] * 1e-30).astype(jnp.bfloat16)
        return acc + jax.lax.dot(
            a_ref[:], b_ref[:] * s, preferred_element_type=jnp.float32)

    o_ref[:] = jax.lax.fori_loop(
        0, reps, body, jnp.zeros(o_ref.shape, jnp.float32))


def mxu_rate(m_total, k, n, reps=REPS):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m_total, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

    grid = (m_total // MT,)
    f = pl.pallas_call(
        functools.partial(_rate_kernel, reps=reps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((MT, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((MT, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_total, n), jnp.float32),
    )

    # chained differential (bench.py methodology): the ~26 ms tunnel RPC
    # floor swamps a per-call block, so serialize iterations through a
    # scalar and time the marginal cost
    @jax.jit
    def g(a, b, fb):
        # fb*1e-30, not fb*0.0: the zero form gets algebraically folded,
        # the chain breaks, and timings read dispatch rather than compute
        return f(a, (b.astype(jnp.float32) * (1.0 + fb * 1e-30))
                 .astype(b.dtype))[0, 0]

    t = _measure_chained(lambda fb: g(a, b, fb))
    fl = 2.0 * m_total * k * n * reps
    return t, fl / t / 1e12


def _measure_chained(step, n1=3, n2=13):
    import jax.numpy as jnp
    np.asarray(step(jnp.float32(0)))     # compile + sync

    def run(n):
        fb = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            fb = step(fb)
        np.asarray(fb)
        return time.perf_counter() - t0

    diffs = []
    for _ in range(3):
        t1, t2 = run(n1), run(n2)
        diffs.append((t2 - t1) / (n2 - n1))
    return max(min(diffs), 1e-9)


def _concat_kernel(x_ref, o_ref, *, taps, mt):
    import jax.numpy as jnp
    o_ref[:] = jnp.concatenate(
        [x_ref[i:i + mt - 16, :] for i in range(taps)], axis=1)


def concat_rate(m_total, c, taps=9):
    """im2col patch build: taps sublane-shifted [MT-16, c] slices
    concatenated along lanes (shifts stay inside the block — only the VMEM
    op cost is being measured, not im2col numerics). Returns seconds and
    effective GB/s of patch bytes written."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m_total, c)), jnp.bfloat16)
    mo = MT - 16

    f = pl.pallas_call(
        functools.partial(_concat_kernel, taps=taps, mt=MT),
        grid=(m_total // MT,),
        in_specs=[pl.BlockSpec((MT, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((mo, taps * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_total // MT * mo, taps * c),
                                       jnp.bfloat16),
    )
    @jax.jit
    def g(x, fb):
        return f((x.astype(jnp.float32) * (1.0 + fb * 1e-30))
                 .astype(x.dtype))[0, 0].astype(jnp.float32)

    t = _measure_chained(lambda fb: g(x, fb))
    return t, (m_total // MT) * mo * taps * c * 2 / t / 1e9


def main():
    import jax
    print(f"backend: {jax.default_backend()}")

    shapes = [
        ("c0'  s2d conv_0 ", 108, 128),
        ("c0'  padK=128   ", 128, 128),
        ("c1'  s2d conv_1 ", 512, 64),
        ("c1'  N=128 ctrl ", 512, 128),
        ("c2'  s2d conv_2 ", 256, 128),
        ("c3'  s2d conv_3 ", 512, 256),
        ("c4'  s2d conv_4 ", 1024, 128),
        ("c5   1x1 native ", 128, 64),
        ("c6   im2col 3x3 ", 576, 128),
        ("ctrl 512x512    ", 512, 512),
    ]
    m_total = 16 * MT
    for name, k, n in shapes:
        t, tf = mxu_rate(m_total, k, n)
        print(f"{name} K={k:4d} N={n:3d}: {tf:6.1f} TF/s "
              f"({tf/197*100:5.1f}% of peak)")

    for c in (32, 64, 128):
        t, gbs = concat_rate(m_total * 4, c)
        print(f"im2col concat 9x[M,{c:3d}] lanes: {gbs:7.0f} GB/s of patches")


if __name__ == "__main__":
    main()
