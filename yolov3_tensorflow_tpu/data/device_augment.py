"""Device-resident training augmentation: the host decodes JPEGs, the TPU
does the pixels.

The reference's training pipeline does all augmentation in numpy/cv2 inside
tf.py_func workers (reference utils/data_utils.py:118-176 + utils/
data_aug.py); our host loader mirrors that chain. On a host with few cores
that chain bottlenecks training (measured ~73 img/s/core vs ~430 img/s device
step — docs/BENCHMARKS.md "Host data pipeline"). This module relocates the
per-pixel work onto the TPU, keeping the transform *distribution* and the
PRNG streams identical:

- host (`plan_example` via `loader.parse_example(emit="plan")`): image
  decode, ALL random draws (shared sampler functions with the host path, so
  a fixed (seed, epoch, step, slot) key yields the same transform in both
  modes), all box geometry, y_true encoding, and zero-padded staging of the
  decoded uint8 BGR pixels into a static [S, S, 3] tile;
- device (`augment_batch`, jit/vmap): mixup blend, photometric distort
  (cv2-uint8-HSV-equivalent math), and the whole geometric chain
  (expand -> crop -> resize/letterbox -> flip) collapsed into ONE separable
  resampling expressed as two small matmuls per image — TPU-native: the
  gather-free interpolation rides the MXU, and every shape is static.

Equivalences and deviations vs the host/cv2 path (tests/test_device_augment.py):
- geometry (boxes, y_true): bit-identical by construction — same sampler
  draws, same box code;
- pixels: nearest-resize images match exactly; linear/cubic/area/lanczos4
  and the photometric ops match cv2 within small integer-rounding tolerances
  (cv2 uses fixed-point tables; we use the same formulas in fp32);
- images larger than the staging tile S are pre-shrunk on the host with one
  cv2 resize (boxes rescaled) before planning — configure
  `data.staged_size` >= the dataset's largest side to avoid this.

The resampling math: every cv2 interpolation used by the reference
(rng.integers(0, 5) -> nearest/linear/cubic/area/lanczos4, reference
data_utils.py:156-160) is a separable kernel, so resize(crop) is
  out[y, x] = sum_v Wy[y, v] * sum_u Wx[x, u] * src[v, u]
with [out, S] weight matrices built on-device from the sampled crop window
and cv2's sampling conventions (including cv2's no-center-offset nearest and
its edge clamping at the crop border). Out-of-crop regions (random_expand
canvas) contribute zeros; the letterbox pad is masked to 128 afterwards.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Host side: plan + staging
# ---------------------------------------------------------------------------


@dataclass
class ExamplePlan:
    """Everything the device needs to reproduce one example's augmentation."""
    staged: np.ndarray            # [S, S, 3] uint8 BGR, zero-padded
    staged2: Optional[np.ndarray]  # mixup partner tile (None when unpaired)
    lam: float                    # mixup blend factor (1.0 = no blend)
    color: Tuple[float, float, float, float]  # delta, hue, sat, val
    crop_x0: int                  # crop origin in source-image coords
    crop_y0: int                  # (can be negative / exceed the image when
    crop_w: int                   # the window covers random_expand canvas)
    crop_h: int
    rw: int                       # letterbox content rect (plain resize:
    rh: int                       # rw=W, rh=H, dw=dh=0)
    dw: int
    dh: int
    interp: int                   # cv2 interpolation code 0..4
    flip: bool                    # horizontal flip of the final image


def stage_image(img: np.ndarray, staged_size: int,
                boxes: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Zero-pad a decoded uint8 image into the static [S, S, 3] tile.

    Images with a side larger than S are first shrunk with one aspect-
    preserving cv2 resize (INTER_AREA) and their boxes rescaled — a
    documented deviation from the host path for oversized inputs; size S to
    the dataset to avoid it.
    """
    import cv2
    h, w = img.shape[:2]
    if max(h, w) > staged_size:
        r = staged_size / max(h, w)
        nw, nh = max(int(w * r), 1), max(int(h * r), 1)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
        if boxes is not None and boxes.size:
            boxes = boxes.copy()
            boxes[:, [0, 2]] *= nw / w
            boxes[:, [1, 3]] *= nh / h
        h, w = nh, nw
    tile = np.zeros((staged_size, staged_size, 3), np.uint8)
    tile[:h, :w] = img
    return tile, boxes


def pack_plans(plans) -> Dict[str, np.ndarray]:
    """Stack per-example plans into the loader batch's parameter arrays."""
    f32 = np.float32
    i32 = np.int32
    return {
        "lam": np.asarray([p.lam for p in plans], f32),
        "color": np.asarray([p.color for p in plans], f32),     # [B, 4]
        "crop": np.asarray([[p.crop_x0, p.crop_y0, p.crop_w, p.crop_h]
                            for p in plans], i32),              # [B, 4]
        "rect": np.asarray([[p.dw, p.dh, p.rw, p.rh]
                            for p in plans], i32),              # [B, 4]
        "interp": np.asarray([p.interp for p in plans], i32),
        "flip": np.asarray([1 if p.flip else 0 for p in plans], i32),
    }


# ---------------------------------------------------------------------------
# Device side: photometric ops (cv2 uint8-HSV-equivalent math, fp32)
# ---------------------------------------------------------------------------


def _bgr_to_hsv(x):
    """cv2 uint8 BGR->HSV semantics in fp32: H in [0,180), S,V in [0,255]."""
    import jax.numpy as jnp
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    s = jnp.where(v > 0, jnp.round(diff * 255.0 / jnp.where(v > 0, v, 1.0)),
                  0.0)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(diff > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h)
    return jnp.stack([jnp.round(h * 0.5), s, v], axis=-1)


def _hsv_to_bgr(x):
    """cv2 uint8 HSV->BGR semantics in fp32."""
    import jax.numpy as jnp
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    h60 = h * 2.0 / 60.0
    i = jnp.floor(h60)
    f = h60 - i
    i = i.astype(jnp.int32) % 6
    sn = s / 255.0
    p = v * (1.0 - sn)
    q = v * (1.0 - sn * f)
    t = v * (1.0 - sn * (1.0 - f))
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t],
                   v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p],
                   p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v],
                   q)
    return jnp.round(jnp.stack([b, g, r], axis=-1))


def _color_distort_device(x, color):
    """Per-image photometric jitter on [S,S,3] fp32 BGR in [0,255].

    color = (delta, hue_delta, sat_mult, val_mult); mirrors
    augment.apply_color_distort including its uint8 rounding points."""
    import jax.numpy as jnp
    delta, hue, sat, val = color[0], color[1], color[2], color[3]
    x = jnp.floor(jnp.clip(x + delta, 0.0, 255.0))
    hsv = _bgr_to_hsv(x)
    h = jnp.mod(hsv[..., 0] + hue, 180.0)
    s = hsv[..., 1] * sat
    v = hsv[..., 2] * val
    hsv = jnp.clip(jnp.stack([h, s, v], axis=-1), 0.0, 255.0)
    return _hsv_to_bgr(jnp.floor(hsv))


# ---------------------------------------------------------------------------
# Device side: separable resampling weights (cv2 conventions)
# ---------------------------------------------------------------------------


def _tap_weights(frac, interp):
    """Per-kernel tap offsets and weights at fractional phase `frac` [O].

    Returns (offsets tuple of ints relative to floor(center), weights list
    of [O] arrays) for the tap-based kernels; cv2 conventions:
      1 linear   taps {0,1}
      2 cubic    A=-0.75, taps {-1..2}
      4 lanczos4 taps {-3..4}, weights normalized to sum 1
    """
    import jax.numpy as jnp

    if interp == 1:
        return (0, 1), [1.0 - frac, frac]
    if interp == 2:
        a = -0.75

        def cub(x):
            ax = jnp.abs(x)
            return jnp.where(
                ax <= 1.0, ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
                jnp.where(ax < 2.0,
                          ((a * ax - 5.0 * a) * ax + 8.0 * a) * ax - 4.0 * a,
                          0.0))
        offs = (-1, 0, 1, 2)
        return offs, [cub(frac - t) for t in offs]
    if interp == 4:
        def lz(x):
            import jax.numpy as jnp
            pix = jnp.pi * x
            out = jnp.where(
                jnp.abs(x) < 1e-7, 1.0,
                jnp.sin(pix) * jnp.sin(pix / 4.0)
                / jnp.maximum(pix * pix / 4.0, 1e-30))
            return jnp.where(jnp.abs(x) < 4.0, out, 0.0)
        offs = tuple(range(-3, 5))
        ws = [lz(frac - t) for t in offs]
        tot = sum(ws)
        return offs, [w / tot for w in ws]
    raise ValueError(interp)


def _axis_weights(out_len: int, s_len: int, crop0, csz, rsz, dpad, interp,
                  area_decimate=None):
    """Build the [out_len, s_len] resampling weight matrix for one axis.

    crop0/csz: crop window origin (source coords, may be negative) and size;
    rsz/dpad: resized content length and letterbox pad offset; interp: cv2
    code (traced). Rows outside the content rect are all-zero (masked to the
    letterbox fill later). Out-of-crop taps are edge-clamped (cv2 resize sees
    only the cropped array); clamped taps landing outside [0, s_len) carry
    zero weight (those samples are random_expand canvas zeros).
    """
    import jax
    import jax.numpy as jnp

    d = jnp.arange(out_len, dtype=jnp.float32) - dpad.astype(jnp.float32)
    valid_row = (d >= 0) & (d < rsz.astype(jnp.float32))     # [O]
    scale = csz.astype(jnp.float32) / jnp.maximum(rsz.astype(jnp.float32), 1.0)
    j = jnp.arange(s_len, dtype=jnp.int32)                   # [S]

    def accumulate(offs, ws, s0):
        w = jnp.zeros((out_len, s_len), jnp.float32)
        for t, wt in zip(offs, ws):
            s = jnp.clip(s0 + t, 0, csz - 1) + crop0         # [O] int
            hit = (j[None, :] == s[:, None]) & (s[:, None] >= 0) \
                & (s[:, None] < s_len)
            w = w + jnp.where(hit, wt[:, None], 0.0)
        return w

    def w_nearest():
        # cv2 INTER_NEAREST: s = floor(d * scale), no center offset
        s0 = jnp.floor(d * scale).astype(jnp.int32)
        one = jnp.ones((out_len,), jnp.float32)
        return accumulate((0,), [one], s0)

    def w_taps(interp_code):
        f = (d + 0.5) * scale - 0.5
        s0f = jnp.floor(f)
        frac = f - s0f
        offs, ws = _tap_weights(frac, interp_code)
        return accumulate(offs, ws, s0f.astype(jnp.int32))

    def w_area():
        # cv2 INTER_AREA has two regimes:
        # - BOTH axes downscaling -> true area decimation: box-filter overlap
        #   of the dst footprint [d*scale, (d+1)*scale) with each source cell
        a = d * scale
        b = a + scale
        sj = (j - crop0).astype(jnp.float32)                 # [S]
        ov = jnp.clip(jnp.minimum(b[:, None], sj[None, :] + 1.0)
                      - jnp.maximum(a[:, None], sj[None, :]), 0.0, None)
        w_down = ov / jnp.maximum(scale, 1e-30)
        inside = (sj[None, :] >= 0) & (sj[None, :] < csz.astype(jnp.float32))
        w_down = jnp.where(inside, w_down, 0.0)
        # - otherwise (any axis upscaling) cv2's generic path with 2-tap
        #   "area" coefficients: s0 = floor(d*scale),
        #   f = (d+1) - (s0+1)/scale, clipped to 0 when <= 0
        inv_scale = rsz.astype(jnp.float32) / jnp.maximum(
            csz.astype(jnp.float32), 1.0)
        s0 = jnp.floor(d * scale)
        f = (d + 1.0) - (s0 + 1.0) * inv_scale
        f = jnp.where(f <= 0.0, 0.0, f - jnp.floor(f))
        w_gen = accumulate((0, 1), [1.0 - f, f], s0.astype(jnp.int32))
        decim = area_decimate if area_decimate is not None else scale > 1.0
        return jnp.where(decim, w_down, w_gen)

    w = jax.lax.switch(jnp.clip(interp, 0, 4),
                       [w_nearest, lambda: w_taps(1), lambda: w_taps(2),
                        w_area, lambda: w_taps(4)])
    return jnp.where(valid_row[:, None], w, 0.0), valid_row


# ---------------------------------------------------------------------------
# Device side: full per-batch augmentation
# ---------------------------------------------------------------------------


def _augment_one(staged, staged2, lam, color, crop, rect, interp, flip,
                 out_h: int, out_w: int, *, mixup: bool, distort: bool,
                 pad_value: float):
    """One example: blend -> distort -> warp -> letterbox pad -> flip.
    staged [S,S,3] uint8 BGR; returns [out_h, out_w, 3] fp32 RGB in [0,1]."""
    import jax.numpy as jnp

    s_len = staged.shape[0]
    x = staged.astype(jnp.float32)
    if mixup:
        x = jnp.floor(lam * x + (1.0 - lam) * staged2.astype(jnp.float32))
    if distort:
        x = _color_distort_device(x, color)

    # cv2 INTER_AREA picks true decimation only when BOTH axes downscale
    sx = crop[2].astype(jnp.float32) / jnp.maximum(
        rect[2].astype(jnp.float32), 1.0)
    sy = crop[3].astype(jnp.float32) / jnp.maximum(
        rect[3].astype(jnp.float32), 1.0)
    decim = (sx >= 1.0) & (sy >= 1.0)
    wx, vx = _axis_weights(out_w, s_len, crop[0], crop[2], rect[2], rect[0],
                           interp, area_decimate=decim)
    wy, vy = _axis_weights(out_h, s_len, crop[1], crop[3], rect[3], rect[1],
                           interp, area_decimate=decim)
    t = jnp.einsum("hv,vuc->huc", wy, x)                 # rows
    out = jnp.einsum("wu,huc->hwc", wx, t)               # cols
    out = jnp.clip(jnp.round(out), 0.0, 255.0)           # cv2 uint8 resize

    inside = vy[:, None] & vx[None, :]
    out = jnp.where(inside[..., None], out, pad_value)
    out = jnp.where(flip > 0, out[:, ::-1, :], out)
    return out[..., ::-1] / 255.0                        # BGR -> RGB, [0,1]


def augment_batch(staged, staged2, params: Dict, out_size: Tuple[int, int],
                  *, mixup: bool, distort: bool, pad_value: float = 128.0):
    """Jittable batched augmentation (vmapped `_augment_one`).

    staged/staged2: [B, S, S, 3] uint8 (staged2 ignored when mixup=False —
    pass staged); params: `pack_plans` arrays; out_size: (width, height)
    like the loader's img_size. Returns [B, H, W, 3] fp32 RGB in [0, 1].
    """
    import functools

    import jax
    out_w, out_h = int(out_size[0]), int(out_size[1])
    fn = functools.partial(_augment_one, out_h=out_h, out_w=out_w,
                           mixup=mixup, distort=distort, pad_value=pad_value)
    return jax.vmap(fn)(staged, staged2, params["lam"], params["color"],
                        params["crop"], params["rect"], params["interp"],
                        params["flip"])
