"""tf_efficientnet_b5_ap feature encoder in pure-functional JAX (NHWC).

The reference DSINE encoder (dn_splatter/scripts/dsine/submodules.py:19-39)
wraps geffnet's EfficientNet-B5 and taps intermediate activations; this is
an original JAX implementation of that architecture for inference:

  stem conv3x3/s2 (48) -> 7 MBConv stages
  [ds k3 s1 24 x3, ir k3 s2 40 x5, ir k5 s2 64 x5, ir k3 s2 128 x7,
   ir k5 s1 176 x7, ir k5 s2 304 x9, ir k3 s1 512 x3] -> conv_head 1x1 (2048)

with TF-"SAME" (asymmetric) padding, BatchNorm eps 1e-3, SiLU, and
squeeze-excitation reduced to int(0.25 * block_input_channels) — the
tf_*_ap weight family's exact inference graph, so a converted geffnet
checkpoint reproduces the reference features.

Params are a flat {torch_state_dict_key: array} dict produced by
priors/convert.py; conv kernels keep the torch OIHW layout (depthwise
(C,1,k,k)) and are re-laid-out inside the conv helper.
The forward returns the five feature maps DSINE consumes
(dn_splatter/scripts/dsine/dsine.py:131-137): block0 (24, /2),
block1 (40, /4), block2 (64, /8), block4 (176, /16), conv_head (2048, /32).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]

# (block_type, kernel, stride, expand_ratio, out_ch, repeats) per stage.
B5_STAGES: Tuple[Tuple[str, int, int, int, int, int], ...] = (
    ("ds", 3, 1, 1, 24, 3),
    ("ir", 3, 2, 6, 40, 5),
    ("ir", 5, 2, 6, 64, 5),
    ("ir", 3, 2, 6, 128, 7),
    ("ir", 5, 1, 6, 176, 7),
    ("ir", 5, 2, 6, 304, 9),
    ("ir", 3, 1, 6, 512, 3),
)
B5_STEM = 48
B5_HEAD = 2048
BN_EPS = 1e-3  # tf_ variants
SE_RATIO = 0.25


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF-SAME asymmetric padding for one spatial dim (static shapes)."""
    pad = max((math.ceil(size / s) - 1) * s + k - size, 0)
    return pad // 2, pad - pad // 2


def _conv(x: jax.Array, w: jax.Array, stride: int, groups: int = 1) -> jax.Array:
    """NHWC conv with TF-SAME padding; w is torch OIHW (I = in/groups)."""
    k = w.shape[2]
    ph = _same_pads(x.shape[1], k, stride)
    pw = _same_pads(x.shape[2], k, stride)
    return jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 3, 1, 0)), window_strides=(stride, stride),
        padding=(ph, pw), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def _bn(x: jax.Array, p: Params, name: str) -> jax.Array:
    mean = p[f"{name}.running_mean"]
    var = p[f"{name}.running_var"]
    gamma = p[f"{name}.weight"]
    beta = p[f"{name}.bias"]
    inv = gamma * jax.lax.rsqrt(var + BN_EPS)
    return x * inv + (beta - mean * inv)


def _silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def _se(x: jax.Array, p: Params, name: str) -> jax.Array:
    """Squeeze-excitation: global-mean -> reduce 1x1 -> SiLU -> expand 1x1
    -> sigmoid gate."""
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = _conv(s, p[f"{name}.conv_reduce.weight"], 1) + p[f"{name}.conv_reduce.bias"]
    s = _silu(s)
    s = _conv(s, p[f"{name}.conv_expand.weight"], 1) + p[f"{name}.conv_expand.bias"]
    return x * jax.nn.sigmoid(s)


def _ds_block(x: jax.Array, p: Params, name: str, stride: int) -> jax.Array:
    """DepthwiseSeparable block (stage 0): dw -> bn -> SiLU -> SE -> pw -> bn."""
    cin = x.shape[-1]
    shortcut = x
    x = _conv(x, p[f"{name}.conv_dw.weight"], stride, groups=cin)
    x = _silu(_bn(x, p, f"{name}.bn1"))
    x = _se(x, p, f"{name}.se")
    x = _conv(x, p[f"{name}.conv_pw.weight"], 1)
    x = _bn(x, p, f"{name}.bn2")
    if stride == 1 and shortcut.shape[-1] == x.shape[-1]:
        x = x + shortcut
    return x


def _ir_block(x: jax.Array, p: Params, name: str, stride: int) -> jax.Array:
    """InvertedResidual: pw-expand -> dw -> SE -> pw-linear (+residual)."""
    shortcut = x
    x = _conv(x, p[f"{name}.conv_pw.weight"], 1)
    x = _silu(_bn(x, p, f"{name}.bn1"))
    cexp = x.shape[-1]
    x = _conv(x, p[f"{name}.conv_dw.weight"], stride, groups=cexp)
    x = _silu(_bn(x, p, f"{name}.bn2"))
    x = _se(x, p, f"{name}.se")
    x = _conv(x, p[f"{name}.conv_pwl.weight"], 1)
    x = _bn(x, p, f"{name}.bn3")
    if stride == 1 and shortcut.shape[-1] == x.shape[-1]:
        x = x + shortcut
    return x


def b5_param_shapes(prefix: str = "encoder.original_model.") -> Dict[str, Tuple[int, ...]]:
    """Expected state-dict tensor shapes of the B5 feature extractor —
    used to validate converted checkpoints and to build random test
    weights without geffnet."""
    shapes: Dict[str, Tuple[int, ...]] = {}

    def bn(name, c):
        for suf in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"{name}.{suf}"] = (c,)

    shapes["conv_stem.weight"] = (B5_STEM, 3, 3, 3)
    bn("bn1", B5_STEM)
    cin = B5_STEM
    for si, (btype, k, s, e, cout, reps) in enumerate(B5_STAGES):
        del s
        for bi in range(reps):
            name = f"blocks.{si}.{bi}"
            red = max(1, int(cin * SE_RATIO))
            if btype == "ds":
                shapes[f"{name}.conv_dw.weight"] = (cin, 1, k, k)
                bn(f"{name}.bn1", cin)
                shapes[f"{name}.se.conv_reduce.weight"] = (red, cin, 1, 1)
                shapes[f"{name}.se.conv_reduce.bias"] = (red,)
                shapes[f"{name}.se.conv_expand.weight"] = (cin, red, 1, 1)
                shapes[f"{name}.se.conv_expand.bias"] = (cin,)
                shapes[f"{name}.conv_pw.weight"] = (cout, cin, 1, 1)
                bn(f"{name}.bn2", cout)
            else:
                cexp = cin * e
                shapes[f"{name}.conv_pw.weight"] = (cexp, cin, 1, 1)
                bn(f"{name}.bn1", cexp)
                shapes[f"{name}.conv_dw.weight"] = (cexp, 1, k, k)
                bn(f"{name}.bn2", cexp)
                shapes[f"{name}.se.conv_reduce.weight"] = (red, cexp, 1, 1)
                shapes[f"{name}.se.conv_reduce.bias"] = (red,)
                shapes[f"{name}.se.conv_expand.weight"] = (cexp, red, 1, 1)
                shapes[f"{name}.se.conv_expand.bias"] = (cexp,)
                shapes[f"{name}.conv_pwl.weight"] = (cout, cexp, 1, 1)
                bn(f"{name}.bn3", cout)
            cin = cout
    shapes["conv_head.weight"] = (B5_HEAD, cin, 1, 1)
    return {prefix + k: v for k, v in shapes.items()}


def encoder_features(params: Params, img_nchw: jax.Array,
                     prefix: str = "encoder.original_model.") -> List[jax.Array]:
    """Run the B5 feature extractor.

    Args:
        params: flat converted state dict.
        img_nchw: (B, 3, H, W) normalized image (torch layout for drop-in
            parity with the reference; converted to NHWC internally).

    Returns:
        [block0, block1, block2, block4, conv_head] feature maps in NCHW —
        the tap points DSINE's decoder consumes.
    """
    p = {k[len(prefix):]: v for k, v in params.items() if k.startswith(prefix)}
    x = jnp.transpose(img_nchw, (0, 2, 3, 1))
    x = _conv(x, p["conv_stem.weight"], 2)
    x = _silu(_bn(x, p, "bn1"))

    taps = {}
    for si, (btype, k, s, e, cout, reps) in enumerate(B5_STAGES):
        del k, e, cout
        for bi in range(reps):
            name = f"blocks.{si}.{bi}"
            stride = s if bi == 0 else 1
            if btype == "ds":
                x = _ds_block(x, p, name, stride)
            else:
                x = _ir_block(x, p, name, stride)
        taps[si] = x

    head = _conv(taps[6], p["conv_head.weight"], 1)
    outs = [taps[0], taps[1], taps[2], taps[4], head]
    return [jnp.transpose(o, (0, 3, 1, 2)) for o in outs]
