"""YOLOv3: Darknet-53 backbone + upsample/concat FPN neck + 3 detection heads.

TPU-native rebuild of /root/reference/model.py `yolov3.forward`
(model.py:30-80) and /root/reference/utils/layer_utils.py (darknet53_body:24,
yolo_block:71). The architecture is declared as a layer *plan* that drives
initialization, the forward pass, and the darknet weight importer alike, so
parameter order/naming is defined in exactly one place (the reference instead
relies on TF variable creation order — misc_utils.py:70-126).

Parameter tree layout (all convs named in darknet .weights serialization
order, which the importer walks):

    variables = {
      "params": {
        "backbone": {"conv_0": {w, gamma, beta}, ..., "conv_51": {...}},
        "head":     {"conv_0": {...}, ..., "conv_6": {w, b}, ...,
                     "conv_14": {w, b}, ..., "conv_22": {w, b}},
      },
      "batch_stats": {  # mirrors params for every BN conv
        "backbone": {"conv_0": {mean, var}, ...},
        "head":     {"conv_0": {mean, var}, ...},
      },
    }

head conv_6 / conv_14 / conv_22 are the three bias-carrying detection output
convs (the reference's Conv_6/Conv_14/Conv_22, args.py:57).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tensorflow_tpu.models.layers import (
    conv_bias, conv_bn_leaky, conv_folded, conv_folded_asym, init_conv_bias,
    init_conv_bn, space_to_depth_2x, upsample_nearest_2x,
)

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# Architecture plan
# ---------------------------------------------------------------------------

# Backbone plan ops: ("conv", cout, k, stride) | ("res_begin",) | ("res_end",)
# | ("route",). Mirrors darknet53_body (layer_utils.py:24-68): stage layout of
# 1-2-8-8-4 residual blocks with stride-2 transition convs, emitting 3 routes
# at strides 8/16/32.
def _darknet53_plan() -> List[Tuple]:
    plan: List[Tuple] = []

    def c(cout: int, k: int, stride: int = 1) -> None:
        plan.append(("conv", cout, k, stride))

    def res(filters: int) -> None:
        plan.append(("res_begin",))
        c(filters, 1)
        c(filters * 2, 3)
        plan.append(("res_end",))

    c(32, 3)
    c(64, 3, 2)
    res(32)
    c(128, 3, 2)
    for _ in range(2):
        res(64)
    c(256, 3, 2)
    for _ in range(8):
        res(128)
    plan.append(("route",))          # route_1, stride 8
    c(512, 3, 2)
    for _ in range(8):
        res(256)
    plan.append(("route",))          # route_2, stride 16
    c(1024, 3, 2)
    for _ in range(4):
        res(512)
    plan.append(("route",))          # route_3, stride 32
    return plan


BACKBONE_PLAN = _darknet53_plan()

# Head conv table, darknet serialization order. Entries:
#   (name_idx, cout_or_None, k, has_bn)    cout=None -> 3*(5+num_classes)
# yolo_block(f) = 5 alternating 1x1/3x3 convs + one 3x3 (layer_utils.py:71-79).
def head_plan(num_classes: int) -> List[Tuple[int, int, int, bool]]:
    out_c = 3 * (5 + num_classes)

    def block(start: int, f: int) -> List[Tuple[int, int, int, bool]]:
        ks = [1, 3, 1, 3, 1, 3]
        cs = [f, 2 * f, f, 2 * f, f, 2 * f]
        return [(start + i, cs[i], ks[i], True) for i in range(6)]

    plan: List[Tuple[int, int, int, bool]] = []
    plan += block(0, 512)
    plan += [(6, out_c, 1, False)]       # detection output, stride 32
    plan += [(7, 256, 1, True)]          # pre-upsample lateral conv
    plan += block(8, 256)
    plan += [(14, out_c, 1, False)]      # detection output, stride 16
    plan += [(15, 128, 1, True)]         # pre-upsample lateral conv
    plan += block(16, 128)
    plan += [(22, out_c, 1, False)]      # detection output, stride 8
    return plan


def darknet_layer_order(num_classes: int) -> List[Tuple[str, str, bool]]:
    """Ordered (scope, conv_name, has_bn) matching darknet .weights layout:
    52 backbone convs then 23 head convs (SURVEY.md §3.5)."""
    order = []
    idx = 0
    for op in BACKBONE_PLAN:
        if op[0] == "conv":
            order.append(("backbone", f"conv_{idx}", True))
            idx += 1
    for name_idx, _, _, has_bn in head_plan(num_classes):
        order.append(("head", f"conv_{name_idx}", has_bn))
    return order


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_yolov3(key: jax.Array, num_classes: int = 80) -> Dict[str, Params]:
    """Initialize the full variable tree for a given class count."""
    params: Params = {"backbone": {}, "head": {}}
    stats: Params = {"backbone": {}, "head": {}}

    cin = 3
    idx = 0
    for op in BACKBONE_PLAN:
        if op[0] != "conv":
            continue
        _, cout, k, _ = op
        key, sub = jax.random.split(key)
        p, s = init_conv_bn(sub, k, cin, cout)
        params["backbone"][f"conv_{idx}"] = p
        stats["backbone"][f"conv_{idx}"] = s
        cin = cout
        idx += 1

    # Head input channels follow the dataflow in `yolov3_forward` below.
    head_cin = _head_input_channels(num_classes)
    for name_idx, cout, k, has_bn in head_plan(num_classes):
        key, sub = jax.random.split(key)
        cin = head_cin[name_idx]
        name = f"conv_{name_idx}"
        if has_bn:
            p, s = init_conv_bn(sub, k, cin, cout)
            params["head"][name] = p
            stats["head"][name] = s
        else:
            params["head"][name] = init_conv_bias(sub, k, cin, cout)
    return {"params": params, "batch_stats": stats}


def _head_input_channels(num_classes: int) -> Dict[int, int]:
    """Input channel count for each head conv, from the FPN dataflow."""
    cin: Dict[int, int] = {}
    # block 1 on route_3 (1024 ch)
    c = 1024
    for i, (_, cout, _, _) in enumerate(head_plan(num_classes)[:6]):
        cin[i] = c
        c = cout
    cin[6] = 1024        # after conv_5 (3x3, 1024)
    cin[7] = 512         # inter1 = output of conv_4 (512)
    # block 2 on concat(upsample(conv_7)=256, route_2=512) = 768
    c = 768
    for i in range(8, 14):
        cin[i] = c
        c = head_plan(num_classes)[i][1]
    cin[14] = 512
    cin[15] = 256        # inter2 = output of conv_12 (256)
    # block 3 on concat(upsample(conv_15)=128, route_1=256) = 384
    c = 384
    for i in range(16, 22):
        cin[i] = c
        c = head_plan(num_classes)[i][1]
    cin[22] = 256
    return cin


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _backbone_forward(conv_fn, x: jax.Array, *,
                      fused_residual: bool = False) -> Tuple[jax.Array, ...]:
    """Walk BACKBONE_PLAN; `conv_fn(idx, x, stride)` applies conv idx.

    fused_residual=True passes the pending shortcut to the LAST conv of each
    residual block as `conv_fn(idx, x, stride, shortcut)` and skips the
    `x + shortcut` here — for executions that fold the add into the conv
    epilogue (the int8-chained serving forward, where the add must happen in
    the dequantized domain before requantization)."""
    routes: List[jax.Array] = []
    shortcut: Optional[jax.Array] = None
    idx = 0
    for i, op in enumerate(BACKBONE_PLAN):
        kind = op[0]
        if kind == "conv":
            _, _, _, stride = op
            closes_res = (fused_residual and i + 1 < len(BACKBONE_PLAN)
                          and BACKBONE_PLAN[i + 1][0] == "res_end")
            if closes_res:
                x = conv_fn(idx, x, stride, shortcut)
                shortcut = None
            else:
                x = conv_fn(idx, x, stride)
            idx += 1
        elif kind == "res_begin":
            shortcut = x
        elif kind == "res_end":
            if not fused_residual:
                x = x + shortcut
        elif kind == "route":
            routes.append(x)
    return tuple(routes)


def _head_forward(conv_fn, out_fn, routes: Sequence[jax.Array], *,
                  neck_fn=None
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """FPN neck + 3 heads (model.py:53-78). `conv_fn(idx, x)` is a BN conv,
    `out_fn(idx, x)` a bias conv producing a raw feature map.

    neck_fn, when given, replaces each upsample+concat+first-conv junction:
    `neck_fn(lat_idx, first_idx, inter, route)` must return the output of
    head conv `first_idx` (post BN/bias + activation) — see
    layers.neck_split_folded for the materialization-free serving rewrite.
    """
    route_1, route_2, route_3 = routes

    def junction(lat_idx, first_idx, inter, route):
        if neck_fn is not None:
            return neck_fn(lat_idx, first_idx, inter, route)
        x = conv_fn(lat_idx, inter)
        x = upsample_nearest_2x(x)
        x = jnp.concatenate([x, route.astype(x.dtype)], axis=-1)
        return conv_fn(first_idx, x)

    x = route_3
    for i in range(5):
        x = conv_fn(i, x)
    inter1 = x
    x = conv_fn(5, x)
    fmap_1 = out_fn(6, x)                       # stride 32

    x = junction(7, 8, inter1, route_2)
    for i in range(9, 13):
        x = conv_fn(i, x)
    inter2 = x
    x = conv_fn(13, x)
    fmap_2 = out_fn(14, x)                      # stride 16

    x = junction(15, 16, inter2, route_1)
    for i in range(17, 21):
        x = conv_fn(i, x)
    x = conv_fn(21, x)
    fmap_3 = out_fn(22, x)                      # stride 8
    return fmap_1, fmap_2, fmap_3


def yolov3_forward(variables: Dict[str, Params], images: jax.Array, *,
                   train: bool = False,
                   compute_dtype: jnp.dtype = jnp.bfloat16,
                   bn_momentum: float = 0.99, bn_eps: float = 1e-5,
                   axis_name: Optional[str] = None,
                   split_neck: bool = True,
                   ) -> Tuple[Tuple[jax.Array, jax.Array, jax.Array],
                              Dict[str, Params]]:
    """Full forward pass.

    images: [N, H, W, 3] float in [0, 1], H and W divisible by 32.
    Returns ((fmap_1, fmap_2, fmap_3), new_batch_stats) where fmap_i is
    [N, H/s, W/s, 3*(5+C)] fp32, s in (32, 16, 8) — same contract as
    reference model.py:30-80.

    split_neck=True (default) applies the exact FPN-junction rewrite
    (layers.neck_split_bn_leaky) to the live-BN path too: the pre-BN tensor
    is identical, so training numerics are unchanged up to fp32-accumulation
    reassociation, while the upsample/concat HBM materializations disappear
    from both forward and backward.
    """
    params, stats = variables["params"], variables["batch_stats"]
    new_stats = {"backbone": {}, "head": {}}

    def bn_conv(scope: str, name: str, x: jax.Array, stride: int = 1) -> jax.Array:
        y, s = conv_bn_leaky(
            x, params[scope][name], stats[scope][name], stride=stride,
            train=train, momentum=bn_momentum, eps=bn_eps,
            compute_dtype=compute_dtype, axis_name=axis_name)
        new_stats[scope][name] = s
        return y

    neck_fn = None
    if split_neck:
        from yolov3_tensorflow_tpu.models.layers import neck_split_bn_leaky

        def neck_fn(lat_idx, first_idx, inter, route):
            lat_name, first_name = f"conv_{lat_idx}", f"conv_{first_idx}"
            out, s_lat, s_first = neck_split_bn_leaky(
                inter, route, params["head"][lat_name],
                stats["head"][lat_name], params["head"][first_name],
                stats["head"][first_name], train=train,
                momentum=bn_momentum, eps=bn_eps,
                compute_dtype=compute_dtype, axis_name=axis_name)
            new_stats["head"][lat_name] = s_lat
            new_stats["head"][first_name] = s_first
            return out

    x = images.astype(compute_dtype)
    routes = _backbone_forward(
        lambda i, x, s: bn_conv("backbone", f"conv_{i}", x, s), x)
    fmaps = _head_forward(
        lambda i, x: bn_conv("head", f"conv_{i}", x),
        lambda i, x: conv_bias(x, params["head"][f"conv_{i}"],
                               compute_dtype=compute_dtype),
        routes, neck_fn=neck_fn)
    return fmaps, new_stats


# ---------------------------------------------------------------------------
# Inference fast path: BN folding
# ---------------------------------------------------------------------------

def fold_batch_norm(variables: Dict[str, Params],
                    dtype: jnp.dtype = jnp.bfloat16) -> Params:
    """Fold BN statistics into conv kernels for inference.

    w' = w * gamma / sqrt(var + eps);  b' = beta - mean * gamma / sqrt(var+eps)
    Output convs keep their (w, b) untouched except for the dtype cast on w.
    Roughly halves per-layer HBM traffic and removes the normalize op chain.
    """
    eps = 1e-5
    params, stats = variables["params"], variables["batch_stats"]
    folded: Params = {}
    for scope in params:
        folded[scope] = {}
        for name, p in params[scope].items():
            if "gamma" in p:
                s = stats[scope][name]
                scale = p["gamma"] / jnp.sqrt(s["var"] + eps)
                folded[scope][name] = {
                    "w": (p["w"] * scale).astype(dtype),
                    "b": (p["beta"] - s["mean"] * scale).astype(jnp.float32),
                }
            else:
                folded[scope][name] = {
                    "w": p["w"].astype(dtype),
                    "b": p["b"].astype(jnp.float32),
                }
    return folded


def yolov3_forward_folded(folded: Params, images: jax.Array, *,
                          compute_dtype: jnp.dtype = jnp.bfloat16,
                          stem_s2d: bool = False, split_neck: bool = True,
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Inference forward with BN pre-folded (see `fold_batch_norm`).

    stem_s2d=True expects params rewritten by `space_to_depth_stem` and runs
    the first two convs in space-to-depth form (see that function's note) —
    numerically equivalent, much faster on the MXU.

    split_neck=True (default) applies the exact FPN-junction rewrite of
    layers.neck_split_folded (upsample/concat never materialize in HBM);
    False keeps the literal reference dataflow for A/B comparison.
    """

    def bn_conv(scope: str, name: str, x: jax.Array, stride: int = 1):
        return conv_folded(x, folded[scope][name], stride=stride,
                           compute_dtype=compute_dtype)

    neck_fn = None
    if split_neck:
        from yolov3_tensorflow_tpu.models.layers import neck_split_folded

        def neck_fn(lat_idx, first_idx, inter, route):
            return neck_split_folded(
                inter, route, folded["head"][f"conv_{lat_idx}"],
                folded["head"][f"conv_{first_idx}"],
                compute_dtype=compute_dtype)

    x = images.astype(compute_dtype)

    if stem_s2d:
        def backbone_conv(i, x, s):
            if i == 0:
                # [N,208,208,12] -> [N,208,208,128] (= s2d of conv_0 output)
                return conv_folded(x, folded["backbone"]["conv_0"], stride=1,
                                   compute_dtype=compute_dtype)
            if i == 1:
                # 2x2 kernel over s2d cells (m-1..m, n-1..n): top/left pad
                return conv_folded_asym(
                    x, folded["backbone"]["conv_1"],
                    padding=((1, 0), (1, 0)), compute_dtype=compute_dtype)
            return bn_conv("backbone", f"conv_{i}", x, s)

        x = space_to_depth_2x(x)
    else:
        def backbone_conv(i, x, s):
            return bn_conv("backbone", f"conv_{i}", x, s)

    routes = _backbone_forward(backbone_conv, x)
    return _head_forward(
        lambda i, x: bn_conv("head", f"conv_{i}", x),
        lambda i, x: conv_bias(x, folded["head"][f"conv_{i}"],
                               compute_dtype=compute_dtype),
        routes, neck_fn=neck_fn)


def space_to_depth_stem(folded: Params) -> Params:
    """Rewrite the folded stem convs into space-to-depth(2) equivalents.

    The first two darknet convs run at the full input resolution with 3/32
    channels — far below the MXU's 128-lane contraction width, so XLA
    executes them at a few percent of peak (profiled: they alone cost more
    than the entire final backbone stage). The standard TPU fix (used by the
    MLPerf ResNet submissions) is to reshape the image into 2x2 pixel cells
    and absorb the reshape into the conv weights:

      conv_0 (3x3 s1, 3->32 @ 416^2)  becomes 3x3 s1, 12->128 @ 208^2
        out channel block (dy*2+dx)*32+o holds conv_0's output for pixel
        phase (dy, dx):  w0'[a,b,(py*2+px)*3+c, (dy*2+dx)*32+o]
          = w0[u+1, v+1, c, o]  with u = 2(a-1)+py-dy, v = 2(b-1)+px-dx
          (zero when u or v is outside {-1,0,1})
      conv_1 (3x3 s2, 32->64 @ 416^2 -> 208^2)  becomes 2x2 s1, 128->64
        reading s2d cells (m-1..m, n-1..n) (top/left padding):
          w1'[a,b,(py*2+px)*32+c, o] = w1[2(a-1)+py+1, 2(b-1)+px+1, c, o]

    Exact algebraic identity (same multiply-adds, reassociated); the rest of
    the network is untouched and consumes conv_1's normal-layout output.
    """
    w0 = np.asarray(folded["backbone"]["conv_0"]["w"], np.float32)  # [3,3,3,32]
    b0 = np.asarray(folded["backbone"]["conv_0"]["b"], np.float32)
    w1 = np.asarray(folded["backbone"]["conv_1"]["w"], np.float32)  # [3,3,32,64]
    b1 = np.asarray(folded["backbone"]["conv_1"]["b"], np.float32)
    cin0, cout0 = w0.shape[2], w0.shape[3]
    cin1, cout1 = w1.shape[2], w1.shape[3]

    w0p = np.zeros((3, 3, 4 * cin0, 4 * cout0), np.float32)
    for a in range(3):
        for b in range(3):
            for py in range(2):
                for px in range(2):
                    for dy in range(2):
                        for dx in range(2):
                            u = 2 * (a - 1) + py - dy
                            v = 2 * (b - 1) + px - dx
                            if u < -1 or u > 1 or v < -1 or v > 1:
                                continue
                            w0p[a, b,
                                (py * 2 + px) * cin0:(py * 2 + px + 1) * cin0,
                                (dy * 2 + dx) * cout0:(dy * 2 + dx + 1) * cout0
                                ] = w0[u + 1, v + 1]
    b0p = np.tile(b0, 4)

    w1p = np.zeros((2, 2, 4 * cout0, cout1), np.float32)
    assert cin1 == cout0
    for a in range(2):
        for b in range(2):
            for py in range(2):
                for px in range(2):
                    u = 2 * (a - 1) + py
                    v = 2 * (b - 1) + px
                    if u < -1 or u > 1 or v < -1 or v > 1:
                        continue
                    w1p[a, b,
                        (py * 2 + px) * cin1:(py * 2 + px + 1) * cin1, :
                        ] = w1[u + 1, v + 1]

    dt0 = jnp.asarray(folded["backbone"]["conv_0"]["w"]).dtype
    out = {scope: dict(v) for scope, v in folded.items()}
    out["backbone"] = dict(folded["backbone"])
    out["backbone"]["conv_0"] = {"w": jnp.asarray(w0p, dt0),
                                 "b": jnp.asarray(b0p, jnp.float32)}
    out["backbone"]["conv_1"] = {"w": jnp.asarray(w1p, dt0),
                                 "b": jnp.asarray(b1, jnp.float32)}
    return out


# ---------------------------------------------------------------------------
# Convenience wrapper
# ---------------------------------------------------------------------------

class YoloV3:
    """Thin stateless wrapper bundling architecture hyperparameters.

    API parity with reference model.py class `yolov3` (ctor model.py:14-28):
    `forward`, `predict`, `compute_loss` — all pure functions of explicit
    variables.
    """

    def __init__(self, num_classes: int, anchors: np.ndarray,
                 use_label_smooth: bool = False, use_focal_loss: bool = False,
                 batch_norm_decay: float = 0.999, weight_decay: float = 5e-4,
                 compute_dtype: jnp.dtype = jnp.bfloat16):
        self.num_classes = int(num_classes)
        self.anchors = np.asarray(anchors, np.float32)
        self.use_label_smooth = use_label_smooth
        self.use_focal_loss = use_focal_loss
        self.batch_norm_decay = batch_norm_decay
        self.weight_decay = weight_decay
        self.compute_dtype = compute_dtype

    def init(self, key: jax.Array) -> Dict[str, Params]:
        return init_yolov3(key, self.num_classes)

    def forward(self, variables: Dict[str, Params], images: jax.Array,
                train: bool = False, axis_name: Optional[str] = None):
        return yolov3_forward(
            variables, images, train=train,
            compute_dtype=self.compute_dtype,
            bn_momentum=self.batch_norm_decay, axis_name=axis_name)

    def predict(self, feature_maps, img_size: Tuple[int, int]):
        from yolov3_tensorflow_tpu.models.decode import predict_boxes
        return predict_boxes(feature_maps, self.anchors, self.num_classes,
                             img_size)

    def compute_loss(self, feature_maps, y_true, img_size: Tuple[int, int]):
        from yolov3_tensorflow_tpu.ops.losses import compute_loss
        return compute_loss(
            feature_maps, y_true, self.anchors, self.num_classes, img_size,
            use_label_smooth=self.use_label_smooth,
            use_focal_loss=self.use_focal_loss)
