"""Device-resident augmentation parity vs the host cv2/numpy path.

The geometry (boxes -> y_true) must be bit-identical between modes (shared
sampler draws + shared box code); the pixels must match cv2 within small
integer-rounding tolerances per interpolation mode (see
data/device_augment.py module docstring for the documented deviations).
"""

import cv2
import numpy as np
import pytest

from yolov3_tensorflow_tpu.data import augment
from yolov3_tensorflow_tpu.data.device_augment import (augment_batch,
                                                       pack_plans)
from yolov3_tensorflow_tpu.data.loader import (DataLoader, parse_example,
                                               plan_example)

ANCHORS = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                    [59, 119], [116, 90], [156, 198], [373, 326]], np.float32)


def _rand_img(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _device_resize(img, out_w, out_h, interp, letterbox):
    """Run the device warp alone on one image (identity color, no mixup)."""
    from yolov3_tensorflow_tpu.data.device_augment import (ExamplePlan,
                                                           stage_image)
    h, w = img.shape[:2]
    s = max(h, w)
    tile, _ = stage_image(img, s)
    if letterbox:
        _, rw, rh, dw, dh = augment.letterbox_params(w, h, out_w, out_h)
    else:
        rw, rh, dw, dh = out_w, out_h, 0, 0
    plan = ExamplePlan(staged=tile, staged2=None, lam=1.0,
                       color=(0.0, 0.0, 1.0, 1.0), crop_x0=0, crop_y0=0,
                       crop_w=w, crop_h=h, rw=rw, rh=rh, dw=dw, dh=dh,
                       interp=interp, flip=False)
    out = augment_batch(tile[None], tile[None], pack_plans([plan]),
                        (out_w, out_h), mixup=False, distort=False)
    return np.asarray(out[0] * 255.0)[..., ::-1]   # back to BGR 0..255


# ---------------------------------------------------------------------------
# warp vs cv2.resize per interpolation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("interp,atol,frac_exact", [
    (0, 0.0, 1.0),       # nearest: exact
    (1, 2.0, 0.95),      # linear
    (2, 2.0, 0.90),      # cubic
    (3, 2.0, 0.90),      # area (downscale + upscale-bilinear fallback)
    (4, 2.0, 0.85),      # lanczos4
])
@pytest.mark.parametrize("shape", [(96, 128), (61, 47)])
def test_resize_matches_cv2(interp, atol, frac_exact, shape):
    rng = np.random.default_rng(3)
    img = _rand_img(rng, *shape)
    for out_w, out_h in ((64, 64), (160, 96)):
        want = cv2.resize(img, (out_w, out_h),
                          interpolation=interp).astype(np.float32)
        got = _device_resize(img, out_w, out_h, interp, letterbox=False)
        d = np.abs(got - want)
        assert d.max() <= atol + 1e-4, (interp, out_w, out_h, d.max())
        assert (d <= 1.0).mean() >= frac_exact, (interp, (d <= 1.0).mean())


def test_letterbox_matches_host():
    rng = np.random.default_rng(4)
    img = _rand_img(rng, 75, 131)
    want, _, _, _ = augment.letterbox_resize(img, 128, 96, interp=0)
    got = _device_resize(img, 128, 96, 0, letterbox=True)
    np.testing.assert_array_equal(got, want.astype(np.float32))


# ---------------------------------------------------------------------------
# photometric parity
# ---------------------------------------------------------------------------

def test_color_distort_matches_cv2():
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.data.device_augment import \
        _color_distort_device
    rng = np.random.default_rng(5)
    img = _rand_img(rng, 40, 56)
    for seed in range(6):
        prng = np.random.default_rng(seed)
        p = augment.sample_color_distort(prng)
        want = augment.apply_color_distort(img, p).astype(np.float32)
        got = np.asarray(_color_distort_device(
            jnp.asarray(img, jnp.float32),
            jnp.asarray([p.delta, p.hue_delta, p.sat_mult, p.val_mult],
                        jnp.float32)))
        d = np.abs(got - want)
        # cv2 uses fixed-point HSV tables; allow small rounding skew on a
        # few pixels but require near-universal (+-2) agreement
        assert (d <= 2.0).mean() >= 0.97, (seed, (d <= 2.0).mean(), d.max())
        assert d.mean() <= 1.0, (seed, d.mean())


# ---------------------------------------------------------------------------
# full-pipeline parity through the loader
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        img = _rand_img(rng, int(rng.integers(60, 180)),
                        int(rng.integers(60, 180)))
        p = str(root / f"img{i}.png")
        cv2.imwrite(p, img)
        h, w = img.shape[:2]
        lines.append(f"{i} {p} {w} {h} {i % 3} 5 5 {w - 5} {h - 5}")
    ann = str(root / "train.txt")
    with open(ann, "w") as f:
        f.write("\n".join(lines))
    return ann


def _lines(path):
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


@pytest.mark.parametrize("mode,letterbox", [("train", True), ("train", False),
                                            ("val", True)])
def test_plan_geometry_identical(dataset, mode, letterbox):
    """y_true (hence boxes) must be bit-identical between host and plan."""
    for i, line in enumerate(_lines(dataset)):
        r1 = np.random.default_rng((7, i))
        r2 = np.random.default_rng((7, i))
        idx_h, _, yt_h = parse_example(line, 3, (128, 128), ANCHORS, mode,
                                       letterbox, r1)
        idx_p, _, yt_p = plan_example(line, 3, (128, 128), ANCHORS, mode,
                                      letterbox, r2, staged_size=256)
        assert idx_h == idx_p
        for a, b in zip(yt_h, yt_p):
            np.testing.assert_array_equal(a, b)


def test_plan_pixels_close(dataset):
    """Full train-mode augmentation: device pixels track the host chain."""
    worst_mean = 0.0
    for i, line in enumerate(_lines(dataset)):
        r1 = np.random.default_rng((11, i))
        r2 = np.random.default_rng((11, i))
        _, img_h, _ = parse_example(line, 3, (96, 96), ANCHORS, "train",
                                    True, r1)
        _, plan, _ = plan_example(line, 3, (96, 96), ANCHORS, "train",
                                  True, r2, staged_size=256)
        out = augment_batch(plan.staged[None], plan.staged[None],
                            pack_plans([plan]), (96, 96), mixup=False,
                            distort=True)
        got = np.asarray(out[0])
        d = np.abs(got - img_h) * 255.0
        worst_mean = max(worst_mean, float(d.mean()))
        # interpolation + HSV rounding skew; the transform itself must agree
        assert d.mean() <= 3.0, (i, d.mean(), d.max())
    assert worst_mean <= 3.0


def test_plan_pixels_val_exact(dataset):
    """Val mode (plain bilinear resize, no distort) matches to 1 LSB."""
    for i, line in enumerate(_lines(dataset)[:3]):
        r1 = np.random.default_rng((13, i))
        r2 = np.random.default_rng((13, i))
        _, img_h, _ = parse_example(line, 3, (128, 128), ANCHORS, "val",
                                    True, r1)
        _, plan, _ = plan_example(line, 3, (128, 128), ANCHORS, "val",
                                  True, r2, staged_size=256)
        out = augment_batch(plan.staged[None], plan.staged[None],
                            pack_plans([plan]), (128, 128), mixup=False,
                            distort=False)
        d = np.abs(np.asarray(out[0]) - img_h) * 255.0
        assert d.max() <= 2.0, (i, d.max())
        assert (d <= 1.0).mean() >= 0.95


def test_mixup_plan_parity(dataset):
    """Mixup pair: blended device pixels track the host mix_up chain and the
    geometry stays bit-identical."""
    lines = _lines(dataset)
    pair = (lines[0], lines[1])
    r1 = np.random.default_rng(17)
    r2 = np.random.default_rng(17)
    idx_h, img_h, yt_h = parse_example(pair, 3, (96, 96), ANCHORS, "train",
                                       True, r1)
    idx_p, plan, yt_p = plan_example(pair, 3, (96, 96), ANCHORS, "train",
                                     True, r2, staged_size=256)
    assert idx_h == idx_p
    for a, b in zip(yt_h, yt_p):
        np.testing.assert_array_equal(a, b)
    out = augment_batch(plan.staged[None], plan.staged2[None],
                        pack_plans([plan]), (96, 96), mixup=True,
                        distort=True)
    d = np.abs(np.asarray(out[0]) - img_h) * 255.0
    assert d.mean() <= 3.0, (d.mean(), d.max())


def test_loader_device_mode_batches(dataset):
    """DataLoader(device_augment=True) produces staged batches whose y_true
    equals the host-mode loader's."""
    kw = dict(num_classes=3, anchors=ANCHORS, batch_size=3,
              img_size=(96, 96), mode="train", letterbox=True, seed=5,
              use_mix_up=True)
    host = DataLoader(dataset, **kw)
    dev = DataLoader(dataset, device_augment=True, staged_size=256, **kw)
    for bh, bd in zip(host.epoch(0), dev.epoch(0)):
        np.testing.assert_array_equal(bh.image_ids, bd.image_ids)
        for a, b in zip(bh.y_true, bd.y_true):
            np.testing.assert_array_equal(a, b)
        assert bd.staged.dtype == np.uint8
        assert bd.staged.shape == (3, 256, 256, 3)
        out = augment_batch(bd.staged, bd.staged2, bd.params, bd.img_size,
                            mixup=True, distort=True)
        d = np.abs(np.asarray(out) - bh.images) * 255.0
        assert d.mean() <= 3.0
