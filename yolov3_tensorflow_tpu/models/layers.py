"""Pure-functional NHWC conv / batch-norm / upsample building blocks.

TPU-native equivalent of the reference layer library
(/root/reference/utils/layer_utils.py): every layer is a pure function of an
explicit parameter pytree, NHWC layout, convs computed in bf16 on the MXU with
fp32 accumulation, batch-norm statistics kept in fp32. No framework layer
classes — parameters are plain nested dicts so that sharding, checkpointing
and the darknet weight importer can address them by path.

Conv padding parity note: the reference uses explicit symmetric "fixed"
padding for stride-2 convs (layer_utils.py:10-19) and SAME for stride-1
(layer_utils.py:21); for the odd kernel sizes used (1, 3) both reduce to
symmetric (k-1)//2 padding, which is what `conv2d` below applies.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]

_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jax.Array, w: jax.Array, stride: int = 1,
           compute_dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC in `compute_dtype`.

    On TPU the MXU accumulates bf16 x bf16 in fp32 internally; emitting the
    result in compute_dtype keeps forward and backward convs homogeneous
    (mixed in/out dtypes break the transposed-conv VJP) and halves the HBM
    traffic of intermediate activations.
    """
    k = w.shape[0]
    pad = (k - 1) // 2
    return lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DIMENSION_NUMBERS,
    )


def batch_norm(y: jax.Array, p: Params, s: Params, *,
               train: bool, momentum: float = 0.99, eps: float = 1e-5,
               axis_name: Optional[str] = None,
               ) -> Tuple[jax.Array, Params]:
    """Batch normalization in fp32.

    Parity with the reference's slim.batch_norm config (model.py:35-41):
    decay (here `momentum`) 0.99, epsilon 1e-5, scale=True, center=True.

    When `axis_name` is set and we are inside a `shard_map`/`pmap`, batch
    moments are averaged across that mesh axis — cross-replica sync BN, the
    TPU answer to the reference's "multi-GPUs with sync batch norm" TODO
    (README.md:210).

    Returns (normalized activations, updated moving statistics).
    """
    if train:
        # statistics accumulate in fp32 (the upcast+square fuses into the
        # reduction, reading the conv output at its native width)
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(0, 1, 2))
        mean_sq = jnp.mean(jnp.square(yf), axis=(0, 1, 2))
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean_sq = lax.pmean(mean_sq, axis_name)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        new_s = {
            "mean": momentum * s["mean"] + (1.0 - momentum) * mean,
            "var": momentum * s["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    # normalize as one per-channel scale/shift in the activation dtype:
    # out = y*a + b with a/b folded in fp32. Keeping the elementwise chain
    # (and therefore every backward cotangent and residual that flows
    # through it) at the conv's native bf16 width instead of upcasting the
    # whole tensor to fp32 measured ~neutral at batch 32 and ~1.6% faster
    # at batch 64 (146.1 -> 143.7 ms/step) — XLA was already keeping most
    # of the fp32 chain fused. Kept because it halves the *bytes* the BN
    # chain is entitled to, and final precision is unchanged (the old fp32
    # result was cast to bf16 immediately after the leaky anyway).
    inv = lax.rsqrt(var + eps) * p["gamma"]
    a = inv.astype(y.dtype)
    b = (p["beta"] - mean * inv).astype(y.dtype)
    out = y * a + b
    return out, new_s


def leaky_relu(x: jax.Array, alpha: float = 0.1) -> jax.Array:
    """LeakyReLU(0.1) — the activation on every BN conv (model.py:48)."""
    return jnp.where(x >= 0, x, alpha * x)


def conv_bn_leaky(x: jax.Array, p: Params, s: Params, *,
                  stride: int = 1, train: bool = False,
                  momentum: float = 0.99, eps: float = 1e-5,
                  compute_dtype: jnp.dtype = jnp.bfloat16,
                  axis_name: Optional[str] = None,
                  ) -> Tuple[jax.Array, Params]:
    """The standard darknet conv: conv (no bias) -> BN -> LeakyReLU(0.1).

    Equivalent of the slim arg_scope'd conv2d in the reference
    (model.py:43-49 + layer_utils.py:9-22). Returns activations in
    `compute_dtype` and the updated BN state.
    """
    y = conv2d(x, p["w"], stride=stride, compute_dtype=compute_dtype)
    y, new_s = batch_norm(y, p, s, train=train, momentum=momentum, eps=eps,
                          axis_name=axis_name)
    return leaky_relu(y).astype(compute_dtype), new_s


def conv_bias(x: jax.Array, p: Params, *,
              compute_dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """Plain conv + bias, no BN, no activation — the 3 detection output convs
    (reference model.py:55-77). Output upcast to fp32 for the decode/loss."""
    y = conv2d(x, p["w"], stride=1, compute_dtype=compute_dtype)
    return y.astype(jnp.float32) + p["b"].astype(jnp.float32)


def conv_folded(x: jax.Array, p: Params, *, stride: int = 1,
                compute_dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """Inference fast path: conv with BN folded into (w, b), then leaky.

    The BN multiply/add is pre-applied to the kernel and bias by
    `models.yolov3.fold_batch_norm`, halving HBM traffic per layer and letting
    XLA emit a single fused conv+bias+leaky per layer.
    """
    y = conv2d(x, p["w"], stride=stride, compute_dtype=compute_dtype)
    y = y + p["b"].astype(y.dtype)
    return leaky_relu(y).astype(compute_dtype)


def conv_folded_asym(x: jax.Array, p: Params, *,
                     padding: Tuple[Tuple[int, int], Tuple[int, int]],
                     compute_dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """conv_folded with explicit (possibly asymmetric) padding and stride 1.

    Used by the space-to-depth stem rewrite, whose 2x2 equivalent kernel
    needs top/left-only padding (models.yolov3.space_to_depth_stem).
    """
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), p["w"].astype(compute_dtype),
        window_strides=(1, 1), padding=padding,
        dimension_numbers=_DIMENSION_NUMBERS)
    y = y + p["b"].astype(y.dtype)
    return leaky_relu(y).astype(compute_dtype)


def neck_split_folded(inter: jax.Array, route: jax.Array, p_lat: Params,
                      p_first: Params, *,
                      compute_dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """FPN junction with the upsample and concat materializations eliminated.

    The reference neck (model.py:59-63,69-73) computes
        conv_first(concat(upsample2x(conv_lat(inter)), route))
    where conv_first (head conv_8 / conv_16) is 1x1. Two exact identities
    rewrite this without ever materializing the upsampled tensor or the
    concat in HBM:

      1. conv1x1 over a channel concat == sum of two conv1x1 on the parts
         (the K-dim contraction is split; the partial sums are added in
         conv_first's fp32 accumulation domain).
      2. a 1x1 conv commutes with nearest-neighbor upsampling, so the
         concat's upsampled half is convolved at the LOW resolution and
         the result broadcast-upsampled into conv_first_b's epilogue.

    At 416^2 batch-128 this removes ~700 MB of HBM round trips per forward
    (upsample buffers + concats at the 26^2 and 52^2 junctions) and runs
    conv_first's upsampled half at 1/4 the pixels. Measured: -1.4 ms/batch
    end-to-end (docs/BENCHMARKS.md).

    `p_lat` is the folded lateral conv (head conv_7 / conv_15), `p_first`
    the folded first post-concat conv (conv_8 / conv_16, both 1x1).
    """
    a = conv_folded(inter, p_lat, compute_dtype=compute_dtype)
    ca = a.shape[-1]
    w = p_first["w"].astype(compute_dtype)
    ya = conv2d(a, w[:, :, :ca, :], compute_dtype=compute_dtype)
    yb = conv2d(route.astype(compute_dtype), w[:, :, ca:, :],
                compute_dtype=compute_dtype)
    y = (upsample_nearest_2x(ya).astype(jnp.float32) + yb.astype(jnp.float32)
         + p_first["b"].astype(jnp.float32))
    return leaky_relu(y).astype(compute_dtype)


def neck_split_bn_leaky(inter: jax.Array, route: jax.Array,
                        p_lat: Params, s_lat: Params,
                        p_first: Params, s_first: Params, *,
                        train: bool, momentum: float = 0.99,
                        eps: float = 1e-5,
                        compute_dtype: jnp.dtype = jnp.bfloat16,
                        axis_name: Optional[str] = None,
                        ) -> Tuple[jax.Array, Params, Params]:
    """Training-mode FPN junction with the same materialization-free rewrite
    as `neck_split_folded`, but with live batch norm.

    The reference junction (model.py:59-63,69-73) is
        conv_first(concat(upsample2x(conv_lat(inter)), route))
    with conv_first a 1x1 BN conv. Splitting conv_first's kernel over the
    concat's channel halves and commuting the lateral half through the
    nearest-neighbor upsample produces the IDENTICAL pre-BN tensor (modulo
    fp32-accumulation reassociation), so the live BN — whose input is that
    tensor — is untouched: batch moments, moving stats, and gradients all
    match the literal dataflow. Neither the upsampled lateral tensor nor the
    concat ever exists in HBM, in forward OR backward (the concat's
    cotangent never materializes; the upsample VJP reduces at low res).

    Returns (activations, new_lat_stats, new_first_stats).
    """
    lat, new_s_lat = conv_bn_leaky(
        inter, p_lat, s_lat, stride=1, train=train, momentum=momentum,
        eps=eps, compute_dtype=compute_dtype, axis_name=axis_name)
    ca = lat.shape[-1]
    w = p_first["w"].astype(compute_dtype)
    ya = conv2d(lat, w[:, :, :ca, :], compute_dtype=compute_dtype)
    yb = conv2d(route.astype(compute_dtype), w[:, :, ca:, :],
                compute_dtype=compute_dtype)
    y = upsample_nearest_2x(ya) + yb
    y, new_s_first = batch_norm(y, p_first, s_first, train=train,
                                momentum=momentum, eps=eps,
                                axis_name=axis_name)
    return leaky_relu(y).astype(compute_dtype), new_s_lat, new_s_first


def space_to_depth_2x(x: jax.Array) -> jax.Array:
    """[N, H, W, C] -> [N, H/2, W/2, 4C]; channel block order is
    (py*2 + px)*C + c for pixel phase (py, px) within each 2x2 cell."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample via reshape-broadcast.

    Equivalent of the reference's tf.image.resize_nearest_neighbor
    (layer_utils.py:82-87), which is always called with exactly 2x the input
    spatial dims. The broadcast trick avoids a gather and fuses cleanly.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def init_conv_bn(key: jax.Array, k: int, cin: int, cout: int
                 ) -> Tuple[Params, Params]:
    """Initialize a conv+BN layer: glorot-uniform kernel (slim's default
    xavier initializer), gamma=1, beta=0, moving mean=0, moving var=1."""
    w = jax.nn.initializers.glorot_uniform()(key, (k, k, cin, cout), jnp.float32)
    params = {
        "w": w,
        "gamma": jnp.ones((cout,), jnp.float32),
        "beta": jnp.zeros((cout,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((cout,), jnp.float32),
        "var": jnp.ones((cout,), jnp.float32),
    }
    return params, state


def init_conv_bias(key: jax.Array, k: int, cin: int, cout: int) -> Params:
    """Initialize an output conv: glorot kernel + zero bias (model.py:55-57)."""
    w = jax.nn.initializers.glorot_uniform()(key, (k, k, cin, cout), jnp.float32)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}
