"""Image + box augmentation ops (numpy/cv2, host side).

Behavioral parity with /root/reference/utils/data_aug.py — mixup, SSD-style
constrained random crop, photometric jitter, letterbox/plain resize, flips,
random expansion — with one systemic change: every stochastic op takes an
explicit `np.random.Generator`, killing the reference's global-RNG thread
races (data_utils.py:190-198, SURVEY.md §5).

Boxes are [N, 4+] float arrays: xyxy in pixels; columns beyond 4 (e.g. the
mixup weight) ride along untouched by geometric transforms.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import cv2
import numpy as np


# ---------------------------------------------------------------------------
# mixup
# ---------------------------------------------------------------------------

def mix_up(img1: np.ndarray, img2: np.ndarray, boxes1: np.ndarray,
           boxes2: np.ndarray, rng: np.random.Generator
           ) -> Tuple[np.ndarray, np.ndarray]:
    """Pixel-blend two images on a max-size canvas; boxes gain a weight col.

    Blend factor ~ Beta(1.5, 1.5) (reference data_aug.py:12-36). Returns
    (uint8 image, [N1+N2, 5] boxes with per-box mixup weight appended).
    """
    h = max(img1.shape[0], img2.shape[0])
    w = max(img1.shape[1], img2.shape[1])
    lam = float(np.clip(rng.beta(1.5, 1.5), 0.0, 1.0))

    canvas = np.zeros((h, w, 3), np.float32)
    canvas[:img1.shape[0], :img1.shape[1]] = img1.astype(np.float32) * lam
    canvas[:img2.shape[0], :img2.shape[1]] += img2.astype(np.float32) * (1 - lam)

    def with_weight(b: np.ndarray, wt: float) -> np.ndarray:
        col = np.full((b.shape[0], 1), wt, b.dtype)
        return np.concatenate([b, col], axis=-1)

    boxes = np.concatenate(
        [with_weight(boxes1, lam), with_weight(boxes2, 1 - lam)], axis=0)
    return canvas.astype(np.uint8), boxes


# ---------------------------------------------------------------------------
# cropping
# ---------------------------------------------------------------------------

def crop_boxes(boxes: np.ndarray, crop: Tuple[int, int, int, int],
               require_center_inside: bool = True) -> np.ndarray:
    """Clip boxes to a crop window (x, y, w, h) and translate to its origin.

    Drops boxes whose center falls outside (when required) or that collapse
    to zero area — reference data_aug.py:39-91 `bbox_crop` semantics with
    allow_outside_center inverted into a positive flag.
    """
    x0, y0, cw, ch = crop
    out = boxes.copy()
    window = np.array([x0, y0, x0 + cw, y0 + ch], np.float64)

    if require_center_inside:
        centers = (out[:, 0:2] + out[:, 2:4]) / 2
        keep = np.logical_and(window[0:2] <= centers,
                              centers < window[2:4]).all(axis=1)
    else:
        keep = np.ones(out.shape[0], bool)

    out[:, 0:2] = np.maximum(out[:, 0:2], window[0:2])
    out[:, 2:4] = np.minimum(out[:, 2:4], window[2:4])
    out[:, 0:2] -= window[0:2]
    out[:, 2:4] -= window[0:2]
    keep &= (out[:, 0:2] < out[:, 2:4]).all(axis=1)
    return out[keep]


def _iou_one_vs_many(window: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    tl = np.maximum(boxes[:, 0:2], window[0:2])
    br = np.minimum(boxes[:, 2:4], window[2:4])
    wh = np.clip(br - tl, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    area_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    area_w = (window[2] - window[0]) * (window[3] - window[1])
    return inter / (area_b + area_w - inter)


def random_crop_with_constraints(
        boxes: np.ndarray, size: Tuple[int, int], rng: np.random.Generator,
        min_scale: float = 0.3, max_scale: float = 1.0,
        max_aspect_ratio: float = 2.0,
        constraints: Optional[Sequence[Tuple[Optional[float], Optional[float]]]] = None,
        max_trial: int = 50) -> Tuple[np.ndarray, Tuple[int, int, int, int]]:
    """SSD-paper min/max-IoU constrained random crop sampler.

    Same sampling scheme as reference data_aug.py:123-217: for each IoU
    constraint, try up to `max_trial` windows and keep the first satisfying
    one as a candidate; then pick candidates at random until one retains at
    least one box. Returns (cropped boxes, (x, y, w, h)).
    """
    if constraints is None:
        constraints = ((0.1, None), (0.3, None), (0.5, None), (0.7, None),
                       (0.9, None), (None, 1.0))
    w, h = size
    candidates = [(0, 0, w, h)]

    for lo, hi in constraints:
        lo = -np.inf if lo is None else lo
        hi = np.inf if hi is None else hi
        for _ in range(max_trial):
            scale = rng.uniform(min_scale, max_scale)
            ar = rng.uniform(max(1 / max_aspect_ratio, scale * scale),
                             min(max_aspect_ratio, 1 / (scale * scale)))
            ch = int(h * scale / np.sqrt(ar))
            cw = int(w * scale * np.sqrt(ar))
            cy = int(rng.integers(0, max(h - ch, 1)))
            cx = int(rng.integers(0, max(w - cw, 1)))
            window = np.array([cx, cy, cx + cw, cy + ch], np.float64)

            if len(boxes) == 0:
                return boxes, (cx, cy, cw, ch)
            iou = _iou_one_vs_many(window, boxes)
            if lo <= iou.min() and iou.max() <= hi:
                candidates.append((cx, cy, cw, ch))
                break

    order = list(range(len(candidates)))
    while order:
        pick = order.pop(int(rng.integers(0, len(order))))
        crop = candidates[pick]
        new_boxes = crop_boxes(boxes, crop, require_center_inside=True)
        if new_boxes.size:
            return new_boxes, crop
    return boxes, (0, 0, w, h)


# ---------------------------------------------------------------------------
# photometric
# ---------------------------------------------------------------------------

def random_color_distort(img: np.ndarray, rng: np.random.Generator,
                         brightness_delta: int = 32, hue_vari: int = 18,
                         sat_vari: float = 0.5, val_vari: float = 0.5
                         ) -> np.ndarray:
    """Brightness + HSV jitter, each applied with probability 0.5.

    Reference data_aug.py:220-271 parity: brightness in BGR space first, then
    hue/saturation/value in HSV, with the H/S/V application order itself
    randomized between two permutations.
    """
    if rng.uniform() > 0.5:
        delta = int(rng.uniform(-brightness_delta, brightness_delta))
        img = np.clip(img.astype(np.float32) + delta, 0, 255)
    img = img.astype(np.uint8)

    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)

    def jitter_hue(x):
        if rng.uniform() > 0.5:
            x[:, :, 0] = (x[:, :, 0] + rng.integers(-hue_vari, hue_vari)) % 180
        return x

    def jitter_sat(x):
        if rng.uniform() > 0.5:
            x[:, :, 1] *= 1 + rng.uniform(-sat_vari, sat_vari)
        return x

    def jitter_val(x):
        if rng.uniform() > 0.5:
            x[:, :, 2] *= 1 + rng.uniform(-val_vari, val_vari)
        return x

    if rng.integers(0, 2):
        hsv = jitter_hue(jitter_sat(jitter_val(hsv)))
    else:
        hsv = jitter_val(jitter_hue(jitter_sat(hsv)))

    hsv = np.clip(hsv, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


# ---------------------------------------------------------------------------
# resizing
# ---------------------------------------------------------------------------

def letterbox_resize(img: np.ndarray, new_width: int, new_height: int,
                     interp: int = 0
                     ) -> Tuple[np.ndarray, float, int, int]:
    """Aspect-preserving resize onto a gray-128 canvas.

    Returns (padded image, resize_ratio, dw, dh) — exactly the reference
    contract (data_aug.py:274-293) that the demo scripts use to invert the
    transform (test_single_image.py:65-70).
    """
    oh, ow = img.shape[:2]
    ratio = min(new_width / ow, new_height / oh)
    rw, rh = int(ratio * ow), int(ratio * oh)
    resized = cv2.resize(img, (rw, rh), interpolation=interp)
    canvas = np.full((new_height, new_width, 3), 128, np.uint8)
    dw = (new_width - rw) // 2
    dh = (new_height - rh) // 2
    canvas[dh:dh + rh, dw:dw + rw] = resized
    return canvas, ratio, dw, dh


def resize_with_boxes(img: np.ndarray, boxes: np.ndarray, new_width: int,
                      new_height: int, interp: int = 0,
                      letterbox: bool = False
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Resize image and remap boxes (reference data_aug.py:296-320)."""
    boxes = boxes.copy()
    if letterbox:
        out, ratio, dw, dh = letterbox_resize(img, new_width, new_height, interp)
        boxes[:, [0, 2]] = boxes[:, [0, 2]] * ratio + dw
        boxes[:, [1, 3]] = boxes[:, [1, 3]] * ratio + dh
        return out, boxes
    oh, ow = img.shape[:2]
    out = cv2.resize(img, (new_width, new_height), interpolation=interp)
    boxes[:, [0, 2]] *= new_width / ow
    boxes[:, [1, 3]] *= new_height / oh
    return out, boxes


# ---------------------------------------------------------------------------
# geometric
# ---------------------------------------------------------------------------

def random_flip(img: np.ndarray, boxes: np.ndarray, rng: np.random.Generator,
                px: float = 0.0, py: float = 0.0
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Horizontal/vertical flips with given probabilities
    (reference data_aug.py:323-346)."""
    boxes = boxes.copy()
    h, w = img.shape[:2]
    if rng.uniform() < px:
        img = cv2.flip(img, 1)
        boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    if rng.uniform() < py:
        img = cv2.flip(img, 0)
        boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
    return img, boxes


def random_expand(img: np.ndarray, boxes: np.ndarray,
                  rng: np.random.Generator, max_ratio: float = 4.0,
                  fill: int = 0, keep_ratio: bool = True
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Place the image at a random offset on a larger canvas
    (reference data_aug.py:349-380)."""
    boxes = boxes.copy()
    h, w, c = img.shape
    rx = rng.uniform(1, max_ratio)
    ry = rx if keep_ratio else rng.uniform(1, max_ratio)
    oh, ow = int(h * ry), int(w * rx)
    oy = int(rng.integers(0, max(oh - h, 1)))
    ox = int(rng.integers(0, max(ow - w, 1)))

    canvas = np.full((oh, ow, c), fill, img.dtype)
    canvas[oy:oy + h, ox:ox + w] = img
    boxes[:, 0:4] += np.array([ox, oy, ox, oy], boxes.dtype)
    return canvas, boxes
