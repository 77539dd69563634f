"""Trainer-level data parallelism: train.num_data_parallel=8 drives the
shard_map step (sync grads + sync BN) from the normal Trainer API on the
virtual CPU mesh."""

import cv2
import jax
import numpy as np
import pytest

from yolov3_tensorflow_tpu.config import Config
from yolov3_tensorflow_tpu.train.trainer import Trainer


@pytest.mark.slow
def test_trainer_with_data_parallel(tmp_path):
    assert jax.device_count() >= 8
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        img = rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)
        p = str(tmp_path / f"d{i}.jpg")
        cv2.imwrite(p, np.asarray(img))
        lines.append(f"{i} {p} 90 70 {i % 2} 10 10 80 60")
    (tmp_path / "train.txt").write_text("\n".join(lines))
    (tmp_path / "val.txt").write_text("")

    cfg = Config()
    cfg.model.num_classes = 2
    cfg.model.compute_dtype = "float32"
    cfg.data.train_file = str(tmp_path / "train.txt")
    cfg.data.val_file = str(tmp_path / "val.txt")
    cfg.data.img_size = (64, 64)
    cfg.data.multi_scale_train = False
    cfg.data.use_mix_up = False
    cfg.data.num_threads = 2
    cfg.train.batch_size = 8            # global batch, 1 image per device
    cfg.train.num_data_parallel = 8
    cfg.train.total_epochs = 1
    cfg.train.train_evaluation_step = 0
    cfg.train.val_evaluation_epoch = 0
    cfg.train.save_epoch = 0
    cfg.train.use_warm_up = False
    cfg.train.lr_type = "fixed"
    cfg.train.update_part = None
    cfg.train.restore_exclude = None
    cfg.train.save_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    cfg.train.progress_log_path = ""
    cfg.finalize()

    trainer = Trainer(cfg, seed=0)
    state = trainer.fit()
    assert int(np.asarray(state["step"])) == 1
    # params are fully replicated across the mesh and finite
    w = state["params"]["head"]["conv_22"]["w"]
    assert np.isfinite(np.asarray(w)).all()
    assert trainer._mesh is not None
    # the state must carry mesh shardings (replicated)
    assert len(w.sharding.device_set) == 8


def test_dp_device_augment_step(tmp_path):
    """Data-parallel + device-augment: the sharded train step accepts the
    (staged, staged2, params) triple with every array batch-sharded over the
    mesh and produces finite, decreasing loss."""
    import jax.numpy as jnp

    from yolov3_tensorflow_tpu.data.loader import DataLoader
    from yolov3_tensorflow_tpu.data.synthetic import generate_dataset
    from yolov3_tensorflow_tpu.train.trainer import Trainer

    data = generate_dataset(str(tmp_path / "ds"), num_images=8, seed=3,
                            img_size=(96, 96), max_shapes=1)
    cfg = Config()
    cfg.data.train_file = data["annotation_file"]
    cfg.data.val_file = data["annotation_file"]
    cfg.data.class_name_path = data["names_file"]
    cfg.data.img_size = (96, 96)
    cfg.data.multi_scale_train = False
    cfg.data.use_mix_up = True
    cfg.data.use_color_distort = True
    cfg.data.device_augment = True
    cfg.data.staged_size = 96
    cfg.data.num_threads = 2
    cfg.train.batch_size = 8
    cfg.train.num_data_parallel = 8
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
    loader = DataLoader(cfg.data.train_file, 3, cfg.anchors, 8, (96, 96),
                        mode="train", letterbox=True, use_mix_up=True,
                        use_color_distort=True, num_threads=2, seed=0,
                        device_augment=True, staged_size=96)
    totals = []
    for step in range(3):
        batch = next(iter(loader.epoch(step)))
        batch_arg = (trainer._put_batch(batch.staged),
                     trainer._put_batch(batch.staged2),
                     {k: trainer._put_batch(v)
                      for k, v in batch.params.items()})
        state, metrics = trainer._train_step(
            state, batch_arg,
            tuple(trainer._put_batch(y) for y in batch.y_true))
        totals.append(float(metrics["total"]))
    assert np.isfinite(totals).all()
