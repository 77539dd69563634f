"""Optimizer construction (optax).

Parity with reference utils/misc_utils.py:151-161 `config_optimizer`
(momentum / rmsprop / adam / sgd), the per-variable gradient clip by norm 100
(train.py:112-114 — note: per *variable*, not global norm), and the
`update_part` scope freeze (args.py:58-60, train.py:82) expressed as an
optax.masked transform over parameter-path prefixes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def clip_by_per_leaf_norm(max_norm: float) -> optax.GradientTransformation:
    """tf.clip_by_norm applied independently to every gradient leaf
    (train.py:113-114)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-20))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def path_prefix_mask(params: Any, include: Optional[Sequence[str]]) -> Any:
    """Boolean pytree: True where the '/'-joined parameter path starts with
    any of `include` (None -> train everything), mirroring the reference's
    scope-name matching (args.py:58-60)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def match(path) -> bool:
        if include is None:
            return True
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        return any(key.startswith(pref) or f"/{pref}" in key
                   for pref in include)

    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [match(path) for path, _ in flat])


def build_optimizer(name: str, schedule, *, momentum: float = 0.9,
                    rmsprop_decay: float = 0.9,
                    grad_clip_norm: Optional[float] = 100.0,
                    update_mask: Optional[Any] = None
                    ) -> optax.GradientTransformation:
    """Assemble clip -> optimizer -> (freeze mask) chain.

    TF semantics parity:
    - momentum: accumulator a = m*a + g; update = -lr*a (optax.trace)
    - rmsprop: decay 0.9, momentum 0.9, eps 1e-10 (TF defaults)
    - adam: b1 0.9, b2 0.999, eps 1e-8 (TF defaults)
    - sgd: plain
    """
    if name == "momentum":
        core = optax.chain(optax.trace(decay=momentum),
                           optax.scale_by_learning_rate(schedule))
    elif name == "rmsprop":
        core = optax.chain(
            optax.scale_by_rms(decay=rmsprop_decay, eps=1e-10),
            optax.trace(decay=momentum),
            optax.scale_by_learning_rate(schedule))
    elif name == "adam":
        core = optax.chain(optax.scale_by_adam(eps=1e-8),
                           optax.scale_by_learning_rate(schedule))
    elif name == "sgd":
        core = optax.chain(optax.scale_by_learning_rate(schedule))
    else:
        raise ValueError(f"unsupported optimizer: {name!r}")

    parts = []
    if grad_clip_norm is not None:
        parts.append(clip_by_per_leaf_norm(grad_clip_norm))
    parts.append(core)
    tx = optax.chain(*parts)

    if update_mask is not None:
        # frozen params receive exactly zero updates
        tx = optax.chain(
            optax.masked(tx, update_mask),
            optax.masked(optax.set_to_zero(),
                         jax.tree_util.tree_map(lambda m: not m, update_mask)),
        )
    return tx
