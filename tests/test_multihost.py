"""Two-process multi-host training + evaluation on CPU.

Launches tests/multihost_driver.py twice (jax.distributed over localhost,
2 processes x 2 CPU devices = a 4-device global DP mesh) and checks:

- both processes finish training + the validate() gather without error
- both report the IDENTICAL mAP (prediction rows + loss sums were gathered)
- only process 0 wrote checkpoints and TensorBoard events

This is the CI stand-in for a real multi-slice run (SURVEY.md §2.3 plan —
the reference is single-process; its multi-GPU support is an unimplemented
TODO, reference README.md:210).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

from yolov3_tensorflow_tpu.data.synthetic import generate_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_and_eval(tmp_path):
    data = generate_dataset(str(tmp_path / "data"), num_images=8, seed=3,
                            img_size=(96, 96), max_shapes=2)
    out_dir = str(tmp_path / "run")
    os.makedirs(out_dir, exist_ok=True)
    coordinator = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # driver sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_driver.py"),
             coordinator, str(pid), data["annotation_file"],
             data["names_file"], out_dir],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=850)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    # identical mAP on both processes => rows + meters really were gathered
    maps = []
    for out in outs:
        m = re.search(r"mAP: ([0-9.]+)", out)
        assert m, f"no mAP line in output:\n{out[-4000:]}"
        maps.append(float(m.group(1)))
    assert maps[0] == pytest.approx(maps[1], abs=1e-9)

    # the epoch-0 validation always beats best_map=-inf, so exactly one
    # best-model checkpoint exists, written by process 0 alone (two writers
    # to the same orbax path would have crashed or duplicated)
    ckpts = os.listdir(os.path.join(out_dir, "ckpt"))
    assert len(ckpts) == 1 and ckpts[0].startswith("best_model_"), ckpts
    assert os.path.isdir(os.path.join(out_dir, "logs_p0"))
    assert not os.path.isdir(os.path.join(out_dir, "logs_p1")), \
        "non-primary process wrote TensorBoard events"
