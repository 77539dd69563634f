"""Convert darknet .weights to an orbax checkpoint
(reference convert_weight.py parity).

  python -m yolov3_tensorflow_tpu.cli.convert_weights \
      --weights yolov3.weights --output ./data/darknet_weights/yolov3_ckpt
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from yolov3_tensorflow_tpu.cli.common import load_classes
from yolov3_tensorflow_tpu.models.yolov3 import init_yolov3
from yolov3_tensorflow_tpu.train.checkpoint import CheckpointStore
from yolov3_tensorflow_tpu.utils.weights import load_darknet_weights


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="darknet .weights -> checkpoint")
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--output", type=str, required=True,
                   help="checkpoint directory to create")
    p.add_argument("--class_name_path", type=str, default="")
    p.add_argument("--num_classes", type=int, default=0,
                   help="override class count (default: from names file/80)")
    return p


def main(argv=None) -> int:
    from yolov3_tensorflow_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    num_classes = args.num_classes or len(load_classes(args.class_name_path))
    fresh = init_yolov3(jax.random.PRNGKey(0), num_classes)
    variables = load_darknet_weights(fresh, args.weights, num_classes)

    out = os.path.abspath(args.output)
    store = CheckpointStore(os.path.dirname(out))
    store.save(os.path.basename(out),
               {"params": variables["params"],
                "batch_stats": variables["batch_stats"],
                "step": np.int64(0)})
    total = sum(int(np.prod(np.shape(leaf)))
                for leaf in jax.tree_util.tree_leaves(variables))
    print(f"converted {total} parameters -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
