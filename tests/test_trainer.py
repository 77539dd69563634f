"""End-to-end training smoke test on a tiny synthetic dataset: losses stay
finite, frozen scopes stay frozen, checkpoints save/restore, validation runs
(reference train.py:122-226 behavior)."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.data.loader import DataLoader
from yolov3_tensorflow_tpu.train.trainer import Trainer, make_train_step


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_ds")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        img = rng.integers(0, 255, (100, 120, 3), dtype=np.uint8)
        p = str(root / f"t{i}.jpg")
        cv2.imwrite(p, np.asarray(img))
        lines.append(f"{i} {p} 120 100 {i % 2} 10 10 90 80")
    train_txt = str(root / "train.txt")
    val_txt = str(root / "val.txt")
    with open(train_txt, "w") as f:
        f.write("\n".join(lines[:3]))
    with open(val_txt, "w") as f:
        f.write("\n".join(lines[3:]))

    cfg = Config()
    cfg.model.num_classes = 2
    cfg.data.train_file = train_txt
    cfg.data.val_file = val_txt
    cfg.data.img_size = (64, 64)
    cfg.data.multi_scale_train = False
    cfg.data.use_mix_up = True
    cfg.data.num_threads = 2
    cfg.train.batch_size = 3
    cfg.train.total_epochs = 1
    cfg.train.train_evaluation_step = 0  # skip in-train eval for speed
    cfg.train.val_evaluation_epoch = 1
    cfg.train.warm_up_epoch = 0
    cfg.train.use_warm_up = False
    cfg.train.lr_type = "fixed"
    cfg.train.learning_rate_init = 1e-3
    cfg.train.update_part = ("head",)
    cfg.train.restore_exclude = None
    cfg.train.save_dir = str(root / "ckpt")
    cfg.train.log_dir = str(root / "logs")
    cfg.train.progress_log_path = str(root / "progress.log")
    cfg.eval.batch_size = 1
    cfg.eval.pre_nms_topk = 64
    cfg.eval.nms_topk = 8
    return cfg.finalize()


def test_train_step_updates_head_only(tiny_cfg):
    trainer = Trainer(tiny_cfg, seed=0)
    state = trainer.init_state()
    p0 = jax.tree_util.tree_map(np.asarray, state["params"])

    images = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    y_true = tuple(
        jnp.zeros((2, 64 // s, 64 // s, 3, 6 + 2), jnp.float32)
        .at[..., -1].set(1.0) for s in (32, 16, 8))

    state, metrics = trainer._train_step(state, images, y_true)
    assert np.isfinite(float(metrics["total"]))
    assert int(state["step"]) == 1

    p1 = jax.tree_util.tree_map(np.asarray, state["params"])
    # frozen backbone identical, head moved (update_part=('head',))
    np.testing.assert_array_equal(p0["backbone"]["conv_0"]["w"],
                                  p1["backbone"]["conv_0"]["w"])
    assert not np.allclose(p0["head"]["conv_22"]["w"],
                           p1["head"]["conv_22"]["w"])
    # BN stats updated even for frozen scopes (train-mode forward)
    assert not np.allclose(
        np.asarray(state["batch_stats"]["backbone"]["conv_0"]["mean"]), 0.0)


def test_fit_end_to_end(tiny_cfg):
    trainer = Trainer(tiny_cfg, seed=1)
    state = trainer.fit()
    assert int(state["step"]) == 1  # 3 imgs / batch 3 = 1 step
    # validation produced a best checkpoint (mAP >= 0 > -inf)
    names = trainer.store.list()
    assert any(n.startswith("best_model_") for n in names)
    # logs written
    assert os.path.exists(tiny_cfg.train.progress_log_path)
    restored = trainer.store.restore(names[0])
    assert "params" in restored and "opt_state" in restored


def test_restore_roundtrip(tiny_cfg):
    trainer = Trainer(tiny_cfg, seed=2)
    state = trainer.init_state()
    trainer.store.save("unit_restore", state)
    state2 = trainer.init_state()
    merged = trainer.restore_into(state2, "unit_restore")
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["head"]["conv_6"]["w"]),
        np.asarray(state["params"]["head"]["conv_6"]["w"]))


def test_loss_decreases_over_real_steps(tmp_path):
    """The committed learning evidence at unit scale: 15 real optimizer steps
    on a synthetic shape set must cut the total loss by >2x (the full-scale
    gate is scripts/overfit_gate.py, recorded at mAP 0.9953 in
    BENCHMARKS.md — this test catches gradient/sign regressions in CI)."""
    from yolov3_tensorflow_tpu.data.synthetic import generate_dataset

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
                        use_color_distort=False, num_threads=2, seed=0)
    totals = []
    for step in range(15):
        batch = next(iter(loader.epoch(step)))
        state, metrics = trainer._train_step(
            state, jnp.asarray(batch.images),
            tuple(jnp.asarray(y) for y in batch.y_true))
        totals.append(float(metrics["total"]))
    assert np.isfinite(totals).all()
    first, last = np.mean(totals[:3]), np.mean(totals[-3:])
    assert last < first / 2, f"loss did not learn: {first:.1f} -> {last:.1f}"


def test_device_augment_training_learns(tmp_path):
    """Device-resident augmentation end to end: the jitted train step takes
    staged uint8 tiles + transform params, augments on-device, and the loss
    decreases over real optimizer steps (twin of
    test_loss_decreases_over_real_steps on the device-augment path)."""
    from yolov3_tensorflow_tpu.data.synthetic import generate_dataset

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
                        device_augment=True, staged_size=96)
    totals = []
    for step in range(15):
        batch = next(iter(loader.epoch(step)))
        assert batch.images is None and batch.staged.dtype == np.uint8
        batch_arg = (jnp.asarray(batch.staged), jnp.asarray(batch.staged2),
                     {k: jnp.asarray(v) for k, v in batch.params.items()})
        state, metrics = trainer._train_step(
            state, batch_arg, tuple(jnp.asarray(y) for y in batch.y_true))
        totals.append(float(metrics["total"]))
    assert np.isfinite(totals).all()
    first, last = np.mean(totals[:3]), np.mean(totals[-3:])
    assert last < first / 2, f"loss did not learn: {first:.1f} -> {last:.1f}"


def test_fit_device_data_path(tmp_path):
    """Trainer.fit end to end in device-augment + device-encode mode: loader
    wiring, per-bucket step cache, in-train eval from the GT triple, and
    checkpointing all work through the public entry point."""
    from yolov3_tensorflow_tpu.data.synthetic import generate_dataset

    data = generate_dataset(str(tmp_path / "ds"), num_images=4, seed=2,
                            img_size=(96, 96), max_shapes=2)
    cfg = Config()
    cfg.data.train_file = data["annotation_file"]
    cfg.data.val_file = data["annotation_file"]
    cfg.data.class_name_path = data["names_file"]
    cfg.data.img_size = (96, 96)
    cfg.data.multi_scale_train = False
    cfg.data.use_mix_up = True
    cfg.data.use_color_distort = True
    cfg.data.device_augment = True
    cfg.data.device_encode = True
    cfg.data.staged_size = 96
    cfg.data.num_threads = 2
    cfg.train.batch_size = 4
    cfg.train.total_epochs = 2
    cfg.train.train_evaluation_step = 2   # exercises eval on a device batch
    cfg.train.val_evaluation_epoch = 0
    cfg.train.save_epoch = 2
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
    state = trainer.fit()
    assert int(state["step"]) == 2
    # the device-encode step cache was actually used (one 96x96 bucket)
    assert list(trainer._train_step_cache) == [(96, 96)]
