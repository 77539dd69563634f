"""Device-resident y_true encoding (data/device_encode.py).

Parity contract: bit-identical dense grids vs the host encoder
(data/encoder.py `encode_labels`, reference utils/data_utils.py:51-115
`process_box`) on the same padded ground truth — including the reference's
collision semantics (last writer's coords, class-bit union).
"""

from __future__ import annotations

import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import DEFAULT_ANCHORS, Config
from yolov3_tensorflow_tpu.data.device_encode import encode_labels_device
from yolov3_tensorflow_tpu.data.encoder import encode_labels, pad_ground_truth

ANCHORS = np.asarray(DEFAULT_ANCHORS, np.float32)


def _random_gt(rng, w_img, h_img, n, num_classes):
    x0 = rng.uniform(0, w_img - 20, (n, 1))
    y0 = rng.uniform(0, h_img - 20, (n, 1))
    w = rng.uniform(4, w_img / 2, (n, 1))
    h = rng.uniform(4, h_img / 2, (n, 1))
    boxes = np.concatenate(
        [x0, y0, np.minimum(x0 + w, w_img), np.minimum(y0 + h, h_img),
         rng.uniform(0.2, 1.0, (n, 1))], axis=1).astype(np.float32)
    labels = rng.integers(0, num_classes, n).astype(np.int32)
    return boxes, labels


@pytest.mark.parametrize("img_size", [(416, 416), (320, 416), (160, 160)])
def test_matches_host_encoder(img_size):
    rng = np.random.default_rng(7)
    C = 7
    for _ in range(4):
        n = int(rng.integers(1, 24))
        boxes, labels = _random_gt(rng, img_size[0], img_size[1], n, C)
        host = encode_labels(boxes, labels, img_size, C, ANCHORS)
        pb, pl, pm = pad_ground_truth(boxes, labels, 64)
        dev = encode_labels_device(pb[None], pl[None], pm[None],
                                   img_size, C, ANCHORS)
        for s in range(3):
            np.testing.assert_array_equal(np.asarray(dev[s][0]), host[s])


def test_collision_semantics_match_host():
    """Two boxes into the same (cell, anchor) slot: coords/mixup-weight from
    the LAST box, class one-hot bits of BOTH set (the host loop only ever
    sets channels — reference process_box parity)."""
    C = 7
    boxes = np.asarray([[100, 100, 180, 180, 0.5],
                        [102, 98, 182, 178, 0.9]], np.float32)
    labels = np.asarray([2, 5], np.int32)
    host = encode_labels(boxes, labels, (416, 416), C, ANCHORS)
    pb, pl, pm = pad_ground_truth(boxes, labels, 64)
    dev = encode_labels_device(pb[None], pl[None], pm[None],
                               (416, 416), C, ANCHORS)
    for s in range(3):
        np.testing.assert_array_equal(np.asarray(dev[s][0]), host[s])
    # the collision really happened: one slot carries two class bits
    occupied = [np.asarray(d[0])[..., 4] > 0 for d in dev]
    total_slots = sum(int(o.sum()) for o in occupied)
    assert total_slots == 1
    s = max(range(3), key=lambda i: occupied[i].sum())
    slot = np.asarray(dev[s][0])[occupied[s]][0]
    assert slot[5 + 2] == 1.0 and slot[5 + 5] == 1.0
    assert slot[-1] == np.float32(0.9)


def test_empty_and_padded_rows_ignored():
    C = 3
    pb = np.zeros((2, 8, 5), np.float32)
    pl = np.zeros((2, 8), np.int32)
    pm = np.zeros((2, 8), bool)
    dev = encode_labels_device(pb, pl, pm, (96, 96), C, ANCHORS)
    for s, stride in enumerate((32, 16, 8)):
        g = np.asarray(dev[s])
        assert g.shape == (2, 96 // stride, 96 // stride, 3, 6 + C)
        assert (g[..., 4] == 0).all()
        assert (g[..., -1] == 1.0).all()          # mixup-weight default


def test_loader_device_encode_matches_host_grids(tmp_path):
    """Same seed, two loader modes: the device-encoded grids from the padded
    GT must equal the host loader's y_true bit-for-bit (the PRNG stream is
    unchanged by emit_gt)."""
    from yolov3_tensorflow_tpu.data.loader import DataLoader
    from yolov3_tensorflow_tpu.data.synthetic import generate_dataset

    data = generate_dataset(str(tmp_path / "ds"), num_images=6, seed=5,
                            img_size=(128, 128), max_shapes=3)
    kw = dict(num_classes=3, anchors=ANCHORS, batch_size=3,
              img_size=(96, 96), mode="train", letterbox=True,
              use_mix_up=True, use_color_distort=True, num_threads=2,
              seed=11, device_augment=True, staged_size=128)
    host_loader = DataLoader(data["annotation_file"], **kw)
    dev_loader = DataLoader(data["annotation_file"], **kw,
                            device_encode=True, max_boxes=16)
    for bh, bd in zip(host_loader.epoch(0), dev_loader.epoch(0)):
        np.testing.assert_array_equal(bh.image_ids, bd.image_ids)
        assert bd.y_true is None
        assert bd.gt_boxes.shape == (3, 16, 5)
        grids = encode_labels_device(bd.gt_boxes, bd.gt_labels, bd.gt_mask,
                                     (96, 96), 3, ANCHORS)
        for s in range(3):
            np.testing.assert_array_equal(np.asarray(grids[s]), bh.y_true[s])
        # staging tiles identical across modes
        np.testing.assert_array_equal(bh.staged, bd.staged)


def test_trainer_device_encode_learns(tmp_path):
    """Full north-star path: device augmentation AND device label encoding
    inside one jitted step — loss decreases over real optimizer steps."""
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.data.loader import DataLoader
    from yolov3_tensorflow_tpu.data.synthetic import generate_dataset
    from yolov3_tensorflow_tpu.train.trainer import Trainer

    data = generate_dataset(str(tmp_path / "ds"), num_images=4, seed=1,
                            img_size=(96, 96), max_shapes=1)
    cfg = Config()
    cfg.data.train_file = data["annotation_file"]
    cfg.data.val_file = data["annotation_file"]
    cfg.data.class_name_path = data["names_file"]
    cfg.data.img_size = (96, 96)
    cfg.data.multi_scale_train = False
    cfg.data.use_mix_up = False
    cfg.data.use_color_distort = False
    cfg.data.device_augment = True
    cfg.data.device_encode = True
    cfg.data.staged_size = 96
    cfg.data.num_threads = 2
    cfg.train.batch_size = 4
    cfg.train.optimizer = "adam"
    cfg.train.lr_type = "fixed"
    cfg.train.learning_rate_init = 1e-3
    cfg.train.use_warm_up = False
    cfg.train.update_part = None
    cfg.train.restore_exclude = None
    cfg.train.progress_log_path = ""
    cfg.train.save_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    cfg.finalize()

    trainer = Trainer(cfg, seed=0)
    state = trainer.init_state()
    loader = DataLoader(cfg.data.train_file, 3, cfg.anchors, 4, (96, 96),
                        mode="train", letterbox=True, use_mix_up=False,
                        use_color_distort=False, num_threads=2, seed=0,
                        device_augment=True, staged_size=96,
                        device_encode=True,
                        max_boxes=cfg.data.max_boxes_per_image)
    step_fn = trainer._get_train_step((96, 96))
    totals = []
    for step in range(15):
        batch = next(iter(loader.epoch(step)))
        assert batch.y_true is None and batch.images is None
        batch_arg = (jnp.asarray(batch.staged), jnp.asarray(batch.staged2),
                     {k: jnp.asarray(v) for k, v in batch.params.items()})
        y_arg = (jnp.asarray(batch.gt_boxes), jnp.asarray(batch.gt_labels),
                 jnp.asarray(batch.gt_mask))
        state, metrics = step_fn(state, batch_arg, y_arg)
        totals.append(float(metrics["total"]))
    assert np.isfinite(totals).all()
    first, last = np.mean(totals[:3]), np.mean(totals[-3:])
    assert last < first / 2, f"loss did not learn: {first:.1f} -> {last:.1f}"
