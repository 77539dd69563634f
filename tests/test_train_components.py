"""Schedules, optimizers, checkpointing (reference misc_utils.py:129-161,
train.py:81-120, args.py:47-60 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from yolov3_tensorflow_tpu.train import schedules
from yolov3_tensorflow_tpu.train.checkpoint import (CheckpointStore,
                                                    partial_restore,
                                                    scope_filter,
                                                    strip_optimizer)
from yolov3_tensorflow_tpu.train.optimizers import (build_optimizer,
                                                    clip_by_per_leaf_norm,
                                                    path_prefix_mask)


def _s(fn, step):
    return float(fn(jnp.asarray(step)))


def test_piecewise():
    fn = schedules.piecewise([30.0, 50.0], [1e-4, 3e-5, 1e-5])
    assert _s(fn, 0) == pytest.approx(1e-4)
    assert _s(fn, 29) == pytest.approx(1e-4)
    assert _s(fn, 30) == pytest.approx(3e-5)   # tf boundary: >= switches
    assert _s(fn, 50) == pytest.approx(1e-5)
    assert _s(fn, 500) == pytest.approx(1e-5)


def test_exponential_staircase_floor():
    fn = schedules.exponential(1e-2, decay_steps=10, decay_factor=0.5,
                               lower_bound=2e-3)
    assert _s(fn, 0) == pytest.approx(1e-2)
    assert _s(fn, 9) == pytest.approx(1e-2)
    assert _s(fn, 10) == pytest.approx(5e-3)
    assert _s(fn, 1000) == pytest.approx(2e-3)  # floored


def test_cosine():
    fn = schedules.cosine(1e-2, total_steps=100, lower_bound=1e-4)
    assert _s(fn, 0) == pytest.approx(1e-2)
    assert _s(fn, 50) == pytest.approx((1e-2 + 1e-4) / 2, rel=1e-4)
    assert _s(fn, 100) == pytest.approx(1e-4, rel=1e-3)


def test_cosine_restarts_t_mul_2():
    fn = schedules.cosine_restarts(1.0, first_decay_steps=10, t_mul=2.0)
    assert _s(fn, 0) == pytest.approx(1.0)
    assert _s(fn, 10) == pytest.approx(1.0, abs=1e-5)   # restart 1
    assert _s(fn, 30) == pytest.approx(1.0, abs=1e-5)   # restart 2 (10+20)
    assert 0 < _s(fn, 5) < 1
    assert _s(fn, 20) == pytest.approx(0.5, abs=1e-5)   # mid of 2nd cycle


def test_warmup():
    base = schedules.fixed(1e-2)
    fn = schedules.with_warmup(base, 1e-2, warmup_steps=10)
    assert _s(fn, 0) == 0.0
    assert _s(fn, 5) == pytest.approx(5e-3)
    assert _s(fn, 10) == pytest.approx(1e-2)
    assert _s(fn, 100) == pytest.approx(1e-2)


def test_per_leaf_clip():
    tx = clip_by_per_leaf_norm(1.0)
    grads = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([0.1])}
    out, _ = tx.update(grads, tx.init(grads))
    np.testing.assert_allclose(np.asarray(out["a"]), [0.6, 0.8], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), [0.1], rtol=1e-6)


def test_momentum_matches_tf_semantics():
    """TF MomentumOptimizer: a = m*a + g; p -= lr*a."""
    tx = build_optimizer("momentum", schedules.fixed(0.1), momentum=0.9,
                         grad_clip_norm=None)
    params = {"w": jnp.asarray([1.0])}
    state = tx.init(params)
    g = {"w": jnp.asarray([1.0])}
    u1, state = tx.update(g, state, params)
    np.testing.assert_allclose(np.asarray(u1["w"]), [-0.1], rtol=1e-6)
    u2, state = tx.update(g, state, params)
    np.testing.assert_allclose(np.asarray(u2["w"]), [-0.19], rtol=1e-6)


def test_freeze_mask():
    params = {"backbone": {"conv_0": {"w": jnp.ones(2)}},
              "head": {"conv_0": {"w": jnp.ones(2)}}}
    mask = path_prefix_mask(params, ("head",))
    assert mask["head"]["conv_0"]["w"] is True
    assert mask["backbone"]["conv_0"]["w"] is False

    tx = build_optimizer("sgd", schedules.fixed(1.0), update_mask=mask,
                         grad_clip_norm=None)
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(g, state, params)
    assert float(jnp.sum(jnp.abs(updates["backbone"]["conv_0"]["w"]))) == 0
    assert float(jnp.sum(jnp.abs(updates["head"]["conv_0"]["w"]))) > 0


def test_scope_filter_include_exclude():
    tree = {"backbone": {"conv_0": {"w": 1}},
            "head": {"conv_6": {"w": 1}, "conv_7": {"w": 1}}}
    # restore everything except the output conv (args.py:56-57 pattern)
    m = scope_filter(tree, None, ("head/conv_6",))
    assert m["backbone"]["conv_0"]["w"] is True
    assert m["head"]["conv_6"]["w"] is False
    assert m["head"]["conv_7"]["w"] is True
    # include narrows (args.py:52-54 pattern)
    m = scope_filter(tree, ("backbone",), None)
    assert m["head"]["conv_7"]["w"] is False


def test_checkpoint_roundtrip_and_partial_restore(tmp_path):
    store = CheckpointStore(str(tmp_path / "ckpt"))
    state = {
        "params": {"backbone": {"conv_0": {"w": np.ones((2, 2), np.float32)}},
                   "head": {"conv_6": {"w": np.full((2,), 3.0, np.float32)}}},
        "opt_state": {"trace": np.zeros(2, np.float32)},
        "step": np.int64(17),
    }
    store.save("model-epoch_1", state)
    assert store.latest() == "model-epoch_1"
    back = store.restore("model-epoch_1")
    assert int(back["step"]) == 17
    np.testing.assert_array_equal(back["params"]["head"]["conv_6"]["w"],
                                  state["params"]["head"]["conv_6"]["w"])

    # params-only save (save_optimizer=False parity)
    store.save("infer", state, include_opt=False)
    assert "opt_state" not in store.restore("infer")

    # partial restore: keep current head, take restored backbone
    current = jax.tree_util.tree_map(lambda x: x * 0 - 1.0, state["params"])
    merged = partial_restore(current, back["params"],
                             exclude=("head/conv_6",))
    np.testing.assert_array_equal(merged["backbone"]["conv_0"]["w"],
                                  np.ones((2, 2)))
    np.testing.assert_array_equal(merged["head"]["conv_6"]["w"],
                                  current["head"]["conv_6"]["w"])

    assert "opt_state" not in strip_optimizer(state)
