"""Auto-resume crash recovery: fit() picks up the latest checkpoint."""

import cv2
import jax
import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.train.trainer import Trainer


@pytest.fixture()
def cfg(tmp_path):
    rng = np.random.default_rng(0)
    lines = []
    for i in range(2):
        img = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
        p = str(tmp_path / f"r{i}.jpg")
        cv2.imwrite(p, np.asarray(img))
        lines.append(f"{i} {p} 80 80 0 10 10 70 70")
    (tmp_path / "train.txt").write_text("\n".join(lines))
    (tmp_path / "val.txt").write_text("")

    cfg = Config()
    cfg.model.num_classes = 2
    cfg.data.train_file = str(tmp_path / "train.txt")
    cfg.data.val_file = str(tmp_path / "val.txt")
    cfg.data.img_size = (64, 64)
    cfg.data.multi_scale_train = False
    cfg.data.use_mix_up = False
    cfg.data.num_threads = 1
    cfg.train.batch_size = 2
    cfg.train.total_epochs = 1
    cfg.train.train_evaluation_step = 0
    cfg.train.val_evaluation_epoch = 0
    cfg.train.save_epoch = 0
    cfg.train.use_warm_up = False
    cfg.train.lr_type = "fixed"
    cfg.train.update_part = None
    cfg.train.restore_exclude = None
    cfg.train.auto_resume = True
    cfg.train.save_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    cfg.train.progress_log_path = ""
    return cfg.finalize()


def test_auto_resume_restores_step_and_optimizer(cfg):
    t1 = Trainer(cfg, seed=0)
    state = t1.fit()                     # 1 epoch = 1 step ("crash" after it)
    t1.store.save("model-epoch_0_step_1", state)
    step_before = int(state["step"])
    assert step_before == 1

    # the "restarted" run wants 2 epochs total; epoch 0 already ran, so the
    # resumed fit must do exactly the remaining epoch (not 2 more)
    cfg.train.total_epochs = 2
    t2 = Trainer(cfg, seed=0)
    state2 = t2.fit()
    assert int(state2["step"]) == step_before + 1
    # resumed params differ from fresh init (they carry t1's update)
    fresh = Trainer(cfg, seed=0).init_state()
    assert not np.allclose(
        np.asarray(state2["params"]["head"]["conv_6"]["b"]),
        np.asarray(fresh["params"]["head"]["conv_6"]["b"]))


def test_no_resume_when_disabled(cfg):
    cfg.train.auto_resume = False
    t = Trainer(cfg, seed=0)
    state = t.fit()
    assert int(state["step"]) == 1


def test_resume_of_finished_run_adds_no_epochs(cfg):
    t1 = Trainer(cfg, seed=0)
    state = t1.fit()                     # completes all 1 epochs
    t1.store.save("model-epoch_0_step_1", state)
    state2 = Trainer(cfg, seed=0).fit()  # nothing left to train
    assert int(state2["step"]) == int(state["step"])


def test_latest_checkpoint_is_by_mtime_not_name(tmp_path):
    import time

    from yolov3_tensorflow_tpu.train.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path / "s"))
    tree = {"step": np.int32(1)}
    store.save("model-epoch_9_step_9", tree)   # older, sorts last by name
    time.sleep(0.05)
    store.save("model-epoch_10_step_10", tree)  # newer, sorts first by name
    assert store.latest() == "model-epoch_10_step_10"
