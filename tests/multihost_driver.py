"""Subprocess driver for the 2-process multi-host CPU test.

NOT named test_* — launched by tests/test_multihost.py, one instance per
simulated host. Configures a CPU backend with 2 local devices, then runs the
real training CLI with jax.distributed bring-up (4 global devices, DP=4).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from yolov3_tensorflow_tpu.cli import train as train_cli  # noqa: E402

if __name__ == "__main__":
    coordinator, process_id, ann_file, names_file, out_dir = sys.argv[1:6]
    rc = train_cli.main([
        "--coordinator_address", coordinator,
        "--num_processes", "2",
        "--process_id", process_id,
        f"data.train_file={ann_file}",
        f"data.val_file={ann_file}",
        f"data.class_name_path={names_file}",
        "data.img_size=96,96",
        "data.multi_scale_train=false",
        "data.use_mix_up=false",
        "data.num_threads=2",
        "train.batch_size=4",
        "train.total_epochs=1",
        "train.train_evaluation_step=0",
        "train.val_evaluation_epoch=1",
        "train.save_epoch=0",
        "train.use_warm_up=false",
        "train.warm_up_epoch=0",
        "train.lr_type=fixed",
        "train.update_part=None",
        "train.restore_exclude=None",
        "train.num_data_parallel=4",
        f"train.save_dir={out_dir}/ckpt",
        f"train.log_dir={out_dir}/logs_p{process_id}",
        "train.progress_log_path=",
    ])
    sys.exit(rc)
