"""DPT-Hybrid (ViT-B/16 + BiT-R50 stem) monocular prior net in pure JAX.

The reference's DEFAULT mono-normal generator is Omnidata's
`DPTDepthModel(backbone="vitb_rn50_384", num_channels=3)`
(dn_splatter/scripts/normals_from_pretrain.py:177) — a DPT-Hybrid:

  BiT-ResNet50v2 stem (weight-standardized convs, GroupNorm-32,
  TF-SAME dynamic padding, depths 3/4/9, non-preact bottlenecks)
    -> stage1 (256, /4) and stage2 (512, /8) feed the neck directly
    -> stage3 (1024, /16) is patch-embedded (1x1 conv) into ViT-B/16
  12 ViT layers; hidden states after layers 8 and 11 join the neck
  DPT neck: readout-projected reassembly + 4 RefineNet fusion blocks
  head: conv 3x3 -> 2x bilinear (align_corners) -> conv 3x3 -> ReLU
        -> conv 1x1 (num_channels) -> ReLU

This is an original functional-JAX implementation (NHWC, flat
{torch_state_dict_key: array} params using the HF-transformers DPT key
naming); priors/convert.py maps the published omnidata / MiDaS
checkpoint names onto it. tests/test_dpt.py verifies every module and
the end-to-end graph against torch `transformers.DPTForDepthEstimation`
with random weights.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]

GN_EPS = 1e-5  # torch nn.GroupNorm default (BitGroupNormActivation)
WS_EPS = 1e-8  # WeightStandardizedConv2d eps
LN_EPS = 1e-12  # DPTConfig layer_norm_eps default


@dataclasses.dataclass(frozen=True)
class DPTHybridConfig:
    """vitb_rn50_384 defaults (the omnidata normal model)."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    bit_embedding: int = 64
    bit_depths: Tuple[int, ...] = (3, 4, 9)
    bit_hidden: Tuple[int, ...] = (256, 512, 1024)
    num_groups: int = 32
    neck_hidden: Tuple[int, ...] = (256, 512, 768, 768)
    reassemble_factors: Tuple[float, ...] = (1.0, 1.0, 1.0, 0.5)
    fusion_hidden: int = 256
    readout_layers: Tuple[int, ...] = (8, 11)  # post-layer indices
    out_channels: int = 1  # omnidata normals: 3
    pos_grid: int = 24  # position-embedding grid (384 / 16)


# --------------------------------------------------------------------------
# BiT backbone
# --------------------------------------------------------------------------


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    pad = max((math.ceil(size / s) - 1) * s + k - size, 0)
    return pad // 2, pad - pad // 2


def _conv(x: jax.Array, w: jax.Array, stride: int = 1,
          padding="same") -> jax.Array:
    """NHWC conv; w in torch OIHW. padding: 'same' (TF asymmetric) or
    explicit ((t,b),(l,r))."""
    k = w.shape[2]
    if padding == "same":
        padding = (_same_pads(x.shape[1], k, stride),
                   _same_pads(x.shape[2], k, stride))
    return jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 3, 1, 0)), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _wsconv(x: jax.Array, p: Params, name: str, stride: int = 1,
            padding="same") -> jax.Array:
    """Weight-standardized conv (per-output-filter zero mean / unit var,
    biased variance, eps 1e-8 — HF WeightStandardizedConv2d)."""
    w = p[f"{name}.weight"]
    m = jnp.mean(w, axis=(1, 2, 3), keepdims=True)
    v = jnp.var(w, axis=(1, 2, 3), keepdims=True)
    w = (w - m) * jax.lax.rsqrt(v + WS_EPS)
    out = _conv(x, w, stride, padding)
    if f"{name}.bias" in p:
        out = out + p[f"{name}.bias"]
    return out


def _gn_relu(x: jax.Array, p: Params, name: str, groups: int,
             relu: bool = True) -> jax.Array:
    """GroupNorm over NHWC channels (+ ReLU)."""
    b, h, w, c = x.shape
    g = x.reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + GN_EPS)
    out = g.reshape(b, h, w, c) * p[f"{name}.weight"] + p[f"{name}.bias"]
    return jax.nn.relu(out) if relu else out


def _maxpool_same(x: jax.Array, k: int = 3, s: int = 2) -> jax.Array:
    """Max pool with dynamic-SAME zero padding (HF BitMaxPool2d pads the
    INPUT with 0.0, not -inf; post-ReLU inputs make them equivalent)."""
    ph = _same_pads(x.shape[1], k, s)
    pw = _same_pads(x.shape[2], k, s)
    x = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _bit_bottleneck(x: jax.Array, p: Params, pre: str, stride: int,
                    has_downsample: bool, groups: int) -> jax.Array:
    shortcut = x
    if has_downsample:
        shortcut = _wsconv(x, p, f"{pre}.downsample.conv", stride)
        shortcut = _gn_relu(shortcut, p, f"{pre}.downsample.norm", groups,
                            relu=False)
    h = _wsconv(x, p, f"{pre}.conv1", 1)
    h = _gn_relu(h, p, f"{pre}.norm1", groups)
    h = _wsconv(h, p, f"{pre}.conv2", stride)
    h = _gn_relu(h, p, f"{pre}.norm2", groups)
    h = _wsconv(h, p, f"{pre}.conv3", 1)
    h = _gn_relu(h, p, f"{pre}.norm3", groups, relu=False)
    return jax.nn.relu(h + shortcut)


def bit_backbone(params: Params, cfg: DPTHybridConfig, x: jax.Array,
                 prefix: str = "dpt.embeddings.backbone.bit",
                 ) -> List[jax.Array]:
    """NHWC image -> [stage1 (/4), stage2 (/8), stage3 (/16)] features."""
    x = _wsconv(x, params, f"{prefix}.embedder.convolution", 2)
    x = _gn_relu(x, params, f"{prefix}.embedder.norm", cfg.num_groups)
    x = _maxpool_same(x)
    feats = []
    in_ch = cfg.bit_embedding
    for si, (depth, out_ch) in enumerate(zip(cfg.bit_depths, cfg.bit_hidden)):
        stride = 1 if si == 0 else 2
        for li in range(depth):
            pre = f"{prefix}.encoder.stages.{si}.layers.{li}"
            s = stride if li == 0 else 1
            has_ds = li == 0  # HF Bit puts a downsample on every first layer
            x = _bit_bottleneck(x, params, pre, s, has_ds, cfg.num_groups)
        in_ch = out_ch
        feats.append(x)
    return feats


# --------------------------------------------------------------------------
# ViT encoder
# --------------------------------------------------------------------------


def _layernorm(x, p, name, eps=LN_EPS):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p[f"{name}.weight"] \
        + p[f"{name}.bias"]


def _linear(x, p, name):
    return x @ p[f"{name}.weight"].T + p[f"{name}.bias"]


def _vit_layer(x: jax.Array, p: Params, pre: str, heads: int) -> jax.Array:
    b, t, c = x.shape
    hdim = c // heads
    h = _layernorm(x, p, f"{pre}.layernorm_before")
    q = _linear(h, p, f"{pre}.attention.attention.query")
    k = _linear(h, p, f"{pre}.attention.attention.key")
    v = _linear(h, p, f"{pre}.attention.attention.value")
    q = q.reshape(b, t, heads, hdim).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, heads, hdim).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, hdim).transpose(0, 2, 1, 3)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hdim)
    att = jax.nn.softmax(att, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, c)
    x = x + _linear(ctx, p, f"{pre}.attention.output.dense")
    h = _layernorm(x, p, f"{pre}.layernorm_after")
    h = _linear(h, p, f"{pre}.intermediate.dense")
    h = jax.nn.gelu(h, approximate=False)
    return x + _linear(h, p, f"{pre}.output.dense")


def _resize_pos_embed(pos: jax.Array, gh: int, gw: int) -> jax.Array:
    """(1, 1 + g*g, C) -> (1, 1 + gh*gw, C) bilinear (half-pixel, like
    torch interpolate align_corners=False)."""
    tok = pos[:, :1]
    grid = pos[0, 1:]
    g = int(round(grid.shape[0] ** 0.5))
    if (gh, gw) == (g, g):
        return pos
    grid = grid.reshape(g, g, -1)
    grid = jax.image.resize(grid, (gh, gw, grid.shape[-1]), method="linear")
    return jnp.concatenate([tok, grid.reshape(1, gh * gw, -1)], axis=1)


def vit_encoder(params: Params, cfg: DPTHybridConfig, feats16: jax.Array,
                ) -> List[jax.Array]:
    """stage3 features (B, h, w, 1024) -> token sequences after the
    readout layers (cls token first)."""
    b, h, w, _ = feats16.shape
    x = _conv(feats16, params["dpt.embeddings.projection.weight"], 1,
              padding=((0, 0), (0, 0)))
    x = x + params["dpt.embeddings.projection.bias"]
    tokens = x.reshape(b, h * w, cfg.hidden_size)
    cls = jnp.broadcast_to(params["dpt.embeddings.cls_token"],
                           (b, 1, cfg.hidden_size))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = _resize_pos_embed(params["dpt.embeddings.position_embeddings"],
                            h, w)
    tokens = tokens + pos
    outs = []
    for i in range(cfg.num_layers):
        tokens = _vit_layer(tokens, params, f"dpt.encoder.layer.{i}",
                            cfg.num_heads)
        if i in cfg.readout_layers:
            outs.append(tokens)
    return outs


# --------------------------------------------------------------------------
# Neck + head
# --------------------------------------------------------------------------


def _upsample2_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear upsample with align_corners=True (torch semantics:
    output corner pixels coincide with input corner pixels)."""

    def up_axis(a, axis):
        n = a.shape[axis]
        out = 2 * n
        # in-coordinates of output samples: i * (n-1) / (out-1)
        coords = jnp.arange(out) * (n - 1) / (out - 1)
        i0 = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, n - 1)
        i1 = jnp.clip(i0 + 1, 0, n - 1)
        t = (coords - i0).astype(a.dtype)
        sh = [1] * a.ndim
        sh[axis] = out
        t = t.reshape(sh)
        a0 = jnp.take(a, i0, axis=axis)
        a1 = jnp.take(a, i1, axis=axis)
        return a0 * (1 - t) + a1 * t

    return up_axis(up_axis(x, 1), 2)


def _reassemble(params: Params, cfg: DPTHybridConfig, tokens: jax.Array,
                idx: int, gh: int, gw: int) -> jax.Array:
    """Tokens -> feature map with the readout ("project") handling."""
    b = tokens.shape[0]
    cls, rest = tokens[:, 0], tokens[:, 1:]
    readout = jnp.broadcast_to(cls[:, None, :], rest.shape)
    h = jnp.concatenate([rest, readout], axis=-1)
    h = _linear(h, params, f"neck.reassemble_stage.readout_projects.{idx}.0")
    h = jax.nn.gelu(h, approximate=False)
    h = h.reshape(b, gh, gw, -1)
    h = _conv(h, params[f"neck.reassemble_stage.layers.{idx}.projection."
                        "weight"], 1, padding=((0, 0), (0, 0)))
    h = h + params[f"neck.reassemble_stage.layers.{idx}.projection.bias"]
    factor = cfg.reassemble_factors[idx]
    if factor == 0.5:
        h = _conv(h, params[f"neck.reassemble_stage.layers.{idx}.resize."
                            "weight"], 2, padding=((1, 1), (1, 1)))
        h = h + params[f"neck.reassemble_stage.layers.{idx}.resize.bias"]
    elif factor != 1.0:
        raise NotImplementedError(f"reassemble factor {factor}")
    return h


def _residual_unit(x: jax.Array, p: Params, pre: str) -> jax.Array:
    h = jax.nn.relu(x)
    h = _conv(h, p[f"{pre}.convolution1.weight"], 1, ((1, 1), (1, 1)))
    h = h + p[f"{pre}.convolution1.bias"]
    h = jax.nn.relu(h)
    h = _conv(h, p[f"{pre}.convolution2.weight"], 1, ((1, 1), (1, 1)))
    h = h + p[f"{pre}.convolution2.bias"]
    return h + x


def _fusion_layer(p: Params, pre: str, x: jax.Array,
                  residual: jax.Array | None) -> jax.Array:
    if residual is not None:
        if residual.shape[1:3] != x.shape[1:3]:
            residual = jax.image.resize(
                residual, x.shape[:1] + x.shape[1:3] + residual.shape[3:],
                method="linear",
            )
        x = x + _residual_unit(residual, p, f"{pre}.residual_layer1")
    x = _residual_unit(x, p, f"{pre}.residual_layer2")
    x = _upsample2_align_corners(x)
    x = _conv(x, p[f"{pre}.projection.weight"], 1, ((0, 0), (0, 0)))
    return x + p[f"{pre}.projection.bias"]


def dpt_forward(params: Params, cfg: DPTHybridConfig, image: jax.Array,
                ) -> jax.Array:
    """(B, H, W, 3) image (H, W divisible by 32) -> (B, 2H', 2W', C)
    prediction where H' = H/2 (the head upsamples the /2 fusion output).

    For 384x384 input the output is 384x384 (omnidata's operating
    point). Matches transformers.DPTForDepthEstimation numerics.
    """
    s1, s2, s3 = bit_backbone(params, cfg, image)
    gh, gw = s3.shape[1], s3.shape[2]
    t8, t11 = vit_encoder(params, cfg, s3)

    hidden = [s1, s2,
              _reassemble(params, cfg, t8, 2, gh, gw),
              _reassemble(params, cfg, t11, 3, gh, gw)]
    feats = []
    for i, h in enumerate(hidden):  # 3x3 bias-free convs to fusion width
        f = _conv(h, params[f"neck.convs.{i}.weight"], 1, ((1, 1), (1, 1)))
        feats.append(f)

    fused = None
    for i, h in enumerate(feats[::-1]):
        fused = _fusion_layer(params, f"neck.fusion_stage.layers.{i}",
                              h if fused is None else fused,
                              None if fused is None else h)
    h = _conv(fused, params["head.head.0.weight"], 1, ((1, 1), (1, 1)))
    h = h + params["head.head.0.bias"]
    h = _upsample2_align_corners(h)
    h = _conv(h, params["head.head.2.weight"], 1, ((1, 1), (1, 1)))
    h = h + params["head.head.2.bias"]
    h = jax.nn.relu(h)
    h = _conv(h, params["head.head.4.weight"], 1, ((0, 0), (0, 0)))
    h = h + params["head.head.4.bias"]
    return jax.nn.relu(h)


def run_normals(params: Params, image: jax.Array,
                cfg: DPTHybridConfig | None = None) -> jax.Array:
    """(H, W, 3) rgb in [0, 1] -> (H, W, 3) omnidata-convention normal
    map in [0, 1] (the reference clamps the raw model output,
    normals_from_pretrain.py:211)."""
    cfg = cfg or DPTHybridConfig(out_channels=3)
    out = dpt_forward(params, cfg, image[None])
    return jnp.clip(out[0], 0.0, 1.0)
