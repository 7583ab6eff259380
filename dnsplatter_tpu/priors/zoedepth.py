"""ZoeDepth-NYU (ZoeD_N) metric mono-depth network in pure JAX.

The reference's mono-depth generator is `torch.hub.load("isl-org/ZoeDepth",
"ZoeD_N")` (dn_splatter/scripts/depth_from_pretrain.py:155-156) — a
MiDaS v3.1 BEiT-L/16-384 relative-depth trunk with ZoeDepth's metric
bins head:

  BEiT-Large/16 @384: patch conv + cls token, 24 pre-norm layers with
    per-layer RELATIVE position bias (bilinearly resized for off-grid
    windows, MiDaS v3.1 style), layer scale (lambda_1/2), no absolute
    positions; hidden states after layers 6/12/18/24 feed the neck
  DPT neck: readout-projected reassembly at factors 4/2/1/0.5
    (transposed convs up, strided conv down) + 4 RefineNet fusions
  relative head: conv3x3 -> 2x up (align_corners) -> conv3x3 -> ReLU
    -> conv1x1 -> ReLU  => relative depth + 32-ch conditioning features
  metric head (single NYU configuration, bin_centers_type="softplus"):
    seed bin regressor (softplus bins) + seed projector, then per-scale
    projector + attractor layers (inverse attractor dx/(1+300 dx^2),
    mean over attractor points), and a conditional log-binomial softmax
    over 64 bins conditioned on [relative features, relative depth];
    depth = sum p_k * c_k.

Original functional-JAX implementation (NHWC, flat {torch key: array}
params in the HF-transformers ZoeDepth naming); priors/convert.py maps
the published ZoeD_N.pt (isl-org/MiDaS naming) onto it.
tests/test_zoedepth.py verifies backbone + end-to-end against torch
`transformers.ZoeDepthForDepthEstimation` with random weights, and the
checkpoint converter round trip.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.priors.dpt import (
    LN_EPS,
    _conv,
    _layernorm,
    _linear,
    _upsample2_align_corners,
)

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class ZoeDepthNYUConfig:
    """ZoeD_N defaults (BEiT-L/16-384 + single NYU bins head)."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    train_image_size: int = 384  # rel-pos tables are shaped for this
    out_layers: Tuple[int, ...] = (6, 12, 18, 24)  # 1-based, post-layer
    reassemble_factors: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)
    fusion_hidden: int = 256
    num_relative_features: int = 32
    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0
    min_temp: float = 0.0212
    max_temp: float = 50.0
    attractor_kind: str = "mean"


# --------------------------------------------------------------------------
# BEiT backbone
# --------------------------------------------------------------------------


def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww+1, wh*ww+1) table row index per (query, key) token pair —
    BeitRelativePositionBias.generate_relative_position_index (supports
    arbitrary windows, MiDaS v3.1)."""
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))  # (2, wh, ww)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, T, T)
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    area = wh * ww
    idx = np.zeros((area + 1, area + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, :] = num_rel - 3
    idx[:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


def _rel_pos_bias(table: jax.Array, train_window: Tuple[int, int],
                  window: Tuple[int, int]) -> jax.Array:
    """Per-layer relative position bias (1, heads, T+1, T+1), resizing
    the trained (2Wh-1)(2Ww-1) grid bilinearly for off-grid windows —
    including HF/timm's transposed (width, height) reshape quirk, kept
    for weight compatibility (modeling_beit.py BeitRelativePositionBias
    .forward)."""
    owh, oww = train_window
    nwh, nww = window
    oh, ow = 2 * owh - 1, 2 * oww - 1
    nh, nw = 2 * nwh - 1, 2 * nww - 1
    grid = table[: oh * ow]
    if (nh, nw) != (oh, ow):
        # quirk: reshaped as (width, height) then resized to (nh, nw)
        grid = grid.reshape(ow, oh, -1)
        grid = jax.image.resize(grid, (nh, nw, grid.shape[-1]),
                                method="linear")
        grid = grid.reshape(nh * nw, -1)
    new_table = jnp.concatenate([grid, table[oh * ow:]], axis=0)
    idx = _rel_pos_index(nwh, nww)
    bias = new_table[idx.reshape(-1)].reshape(idx.shape[0], idx.shape[1], -1)
    return jnp.transpose(bias, (2, 0, 1))[None]


def _beit_layer(x: jax.Array, p: Params, pre: str, heads: int,
                bias: jax.Array) -> jax.Array:
    b, t, c = x.shape
    hdim = c // heads
    h = _layernorm(x, p, f"{pre}.layernorm_before", eps=LN_EPS)
    q = _linear(h, p, f"{pre}.attention.attention.query")
    k = h @ p[f"{pre}.attention.attention.key.weight"].T  # no key bias
    v = _linear(h, p, f"{pre}.attention.attention.value")
    q = q.reshape(b, t, heads, hdim).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, heads, hdim).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, hdim).transpose(0, 2, 1, 3)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hdim)
    att = jax.nn.softmax(att + bias, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, c)
    ctx = _linear(ctx, p, f"{pre}.attention.output.dense")
    x = x + p[f"{pre}.lambda_1"] * ctx
    h = _layernorm(x, p, f"{pre}.layernorm_after", eps=LN_EPS)
    h = _linear(h, p, f"{pre}.intermediate.dense")
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(h, p, f"{pre}.output.dense")
    return x + p[f"{pre}.lambda_2"] * h


def beit_backbone(params: Params, cfg: ZoeDepthNYUConfig, image: jax.Array,
                  ) -> List[jax.Array]:
    """(B, H, W, 3) image -> token sequences (B, 1 + hw, C) after the
    out_layers (cls first), plus the patch grid (gh, gw)."""
    b, hh, ww, _ = image.shape
    ps = cfg.patch_size
    gh, gw = hh // ps, ww // ps
    x = _conv(image, params["backbone.embeddings.patch_embeddings."
                            "projection.weight"], ps, ((0, 0), (0, 0)))
    x = x + params["backbone.embeddings.patch_embeddings.projection.bias"]
    tokens = x.reshape(b, gh * gw, cfg.hidden_size)
    cls = jnp.broadcast_to(params["backbone.embeddings.cls_token"],
                           (b, 1, cfg.hidden_size))
    tokens = jnp.concatenate([cls, tokens], axis=1)

    tw = cfg.train_image_size // ps
    outs = []
    for i in range(cfg.num_layers):
        pre = f"backbone.encoder.layer.{i}"
        bias = _rel_pos_bias(
            params[f"{pre}.attention.attention.relative_position_bias."
                   "relative_position_bias_table"],
            (tw, tw), (gh, gw),
        )
        tokens = _beit_layer(tokens, params, pre, cfg.num_heads, bias)
        if (i + 1) in cfg.out_layers:
            outs.append(tokens)
    return outs, (gh, gw)


# --------------------------------------------------------------------------
# Neck (reassemble at 4/2/1/0.5 + RefineNet fusion)
# --------------------------------------------------------------------------


def _conv_transpose_block(x: jax.Array, w: jax.Array, b: jax.Array,
                          k: int) -> jax.Array:
    """ConvTranspose2d with kernel == stride == k, zero padding — exact
    block expansion: one einsum + reshape (torch weight (in, out, k, k))."""
    bsz, h, ww, _ = x.shape
    out = jnp.einsum("bhwi,iouv->bhuwvo", x, w)
    out = out.reshape(bsz, h * k, ww * k, w.shape[1])
    return out + b


def _reassemble(params: Params, cfg: ZoeDepthNYUConfig, tokens: jax.Array,
                idx: int, gh: int, gw: int) -> jax.Array:
    b = tokens.shape[0]
    cls, rest = tokens[:, 0], tokens[:, 1:]
    readout = jnp.broadcast_to(cls[:, None, :], rest.shape)
    h = jnp.concatenate([rest, readout], axis=-1)
    h = _linear(h, params, f"neck.reassemble_stage.readout_projects.{idx}.0")
    h = jax.nn.gelu(h, approximate=False)
    h = h.reshape(b, gh, gw, -1)
    h = _conv(h, params[f"neck.reassemble_stage.layers.{idx}.projection."
                        "weight"], 1, ((0, 0), (0, 0)))
    h = h + params[f"neck.reassemble_stage.layers.{idx}.projection.bias"]
    factor = cfg.reassemble_factors[idx]
    pre = f"neck.reassemble_stage.layers.{idx}.resize"
    if factor > 1.0:
        h = _conv_transpose_block(h, params[f"{pre}.weight"],
                                  params[f"{pre}.bias"], int(factor))
    elif factor == 0.5:
        h = _conv(h, params[f"{pre}.weight"], 2, ((1, 1), (1, 1)))
        h = h + params[f"{pre}.bias"]
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


def zoedepth_neck(params: Params, cfg: ZoeDepthNYUConfig,
                  hidden: List[jax.Array], gh: int, gw: int,
                  ) -> Tuple[List[jax.Array], jax.Array]:
    """Token stages -> (fusion outputs coarse-to-fine, bottleneck)."""
    feats = []
    for i, tokens in enumerate(hidden):
        h = _reassemble(params, cfg, tokens, i, gh, gw)
        f = _conv(h, params[f"neck.convs.{i}.weight"], 1, ((1, 1), (1, 1)))
        feats.append(f)

    fused_all = []
    fused = None
    for i, h in enumerate(feats[::-1]):
        fused = _fusion_layer(params, f"neck.fusion_stage.layers.{i}",
                              h if fused is None else fused,
                              None if fused is None else h)
        fused_all.append(fused)
    return fused_all, feats[-1]


# --------------------------------------------------------------------------
# Heads
# --------------------------------------------------------------------------


def _resize_ac(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with align_corners=True on (B, H, W, C)."""
    b, h, w, c = x.shape
    nh, nw = hw
    if (nh, nw) == (h, w):
        return x

    def coords(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)

    def along(a, axis, n_in, n_out):
        cc = coords(n_in, n_out)
        i0 = jnp.clip(jnp.floor(cc).astype(jnp.int32), 0, n_in - 1)
        i1 = jnp.clip(i0 + 1, 0, n_in - 1)
        t = (cc - i0).astype(a.dtype)
        sh = [1] * a.ndim
        sh[axis] = n_out
        t = t.reshape(sh)
        return jnp.take(a, i0, axis=axis) * (1 - t) + \
            jnp.take(a, i1, axis=axis) * t

    return along(along(x, 1, h, nh), 2, w, nw)


def relative_head(params: Params, fused_fine: jax.Array,
                  ) -> Tuple[jax.Array, jax.Array]:
    """Finest fusion output -> (relative depth (B, H, W), 32-ch features)."""
    h = _conv(fused_fine, params["relative_head.conv1.weight"], 1,
              ((1, 1), (1, 1))) + params["relative_head.conv1.bias"]
    h = _upsample2_align_corners(h)
    h = _conv(h, params["relative_head.conv2.weight"], 1,
              ((1, 1), (1, 1))) + params["relative_head.conv2.bias"]
    h = jax.nn.relu(h)
    feats = h
    h = _conv(h, params["relative_head.conv3.weight"], 1,
              ((0, 0), (0, 0))) + params["relative_head.conv3.bias"]
    h = jax.nn.relu(h)
    return h[..., 0], feats


def _mlp_conv(p: Params, pre: str, x: jax.Array, act=jax.nn.relu,
              leaf1: str = "conv1", leaf2: str = "conv2") -> jax.Array:
    h = _conv(x, p[f"{pre}.{leaf1}.weight"], 1, ((0, 0), (0, 0)))
    h = act(h + p[f"{pre}.{leaf1}.bias"])
    h = _conv(h, p[f"{pre}.{leaf2}.weight"], 1, ((0, 0), (0, 0)))
    return h + p[f"{pre}.{leaf2}.bias"]


def _inv_attractor(dx: jax.Array, alpha: float = 300.0,
                   gamma: int = 2) -> jax.Array:
    # modeling_zoedepth.py inv_attractor — called with its DEFAULTS
    # (alpha=300) by both attractor layers regardless of the config's
    # attractor_alpha; kept to match weights/behavior.
    return dx / (1.0 + alpha * dx ** gamma)


def _log_binomial(prob: jax.Array, temperature: jax.Array,
                  n_bins: int) -> jax.Array:
    """LogBinomialSoftmax over the LAST axis of NHWC probabilities
    ((B, H, W, 1) -> (B, H, W, n_bins))."""
    eps = 1e-4
    k_idx = jnp.arange(n_bins, dtype=jnp.float32)
    k_minus_1 = jnp.float32(n_bins - 1)

    def log_binom(n, k, e=1e-7):
        n = n + e
        k = k + e
        return n * jnp.log(n) - k * jnp.log(k) - (n - k) * jnp.log(n - k + e)

    p = jnp.clip(prob, eps, 1.0)
    omp = jnp.clip(1.0 - prob, eps, 1.0)
    y = (log_binom(k_minus_1, k_idx) + k_idx * jnp.log(p)
         + (k_minus_1 - k_idx) * jnp.log(omp))
    return jax.nn.softmax(y / temperature, axis=-1)


def metric_head(params: Params, cfg: ZoeDepthNYUConfig,
                outconv_activation: jax.Array, bottleneck: jax.Array,
                feature_blocks: List[jax.Array], relative_depth: jax.Array,
                ) -> jax.Array:
    """Single-configuration metric head, bin_centers_type='softplus'
    (ZoeD_N; modeling_zoedepth.py ZoeDepthMetricDepthEstimationHead)."""
    x = _conv(bottleneck, params["metric_head.conv2.weight"], 1,
              ((0, 0), (0, 0))) + params["metric_head.conv2.bias"]
    seed_bins = jax.nn.softplus(
        _mlp_conv(params, "metric_head.seed_bin_regressor", x)
    )
    prev_bin = seed_bins  # softplus path: unnormed centers
    prev_emb = _mlp_conv(params, "metric_head.seed_projector", x)

    bin_centers = prev_bin
    bin_emb = prev_emb
    for i, feature in enumerate(feature_blocks):
        bin_emb = _mlp_conv(params, f"metric_head.projectors.{i}", feature)
        h, w = bin_emb.shape[1:3]
        attr_in = bin_emb + _resize_ac(prev_emb, (h, w))
        attractors = jax.nn.softplus(
            _mlp_conv(params, f"metric_head.attractors.{i}", attr_in)
        )  # (B, h, w, n_attractors)
        centers = _resize_ac(prev_bin, (h, w))  # (B, h, w, n_bins)
        dx = attractors[..., :, None] - centers[..., None, :]
        delta = jnp.sum(_inv_attractor(dx), axis=-2)
        if cfg.attractor_kind == "mean":
            delta = delta / attractors.shape[-1]
        centers = centers + delta
        prev_bin = centers
        prev_emb = bin_emb
        bin_centers = centers

    last = outconv_activation
    rel = _resize_ac(relative_depth[..., None], last.shape[1:3])
    last = jnp.concatenate([last, rel], axis=-1)
    bin_emb = _resize_ac(bin_emb, last.shape[1:3])

    # conditional log-binomial: per-pixel MLP -> (p, t) linear norms
    pt = jnp.concatenate([last, bin_emb], axis=-1)
    pre = "metric_head.conditional_log_binomial.mlp"
    h = _conv(pt, params[f"{pre}.0.weight"], 1, ((0, 0), (0, 0)))
    h = jax.nn.gelu(h + params[f"{pre}.0.bias"], approximate=False)
    h = _conv(h, params[f"{pre}.2.weight"], 1, ((0, 0), (0, 0)))
    h = jax.nn.softplus(h + params[f"{pre}.2.bias"])
    p_eps = 1e-4
    p01 = h[..., 0:2] + p_eps
    prob = p01[..., 0:1] / (p01[..., 0:1] + p01[..., 1:2])
    t01 = h[..., 2:4] + p_eps
    temp = t01[..., 0:1] / (t01[..., 0:1] + t01[..., 1:2])
    temp = (cfg.max_temp - cfg.min_temp) * temp + cfg.min_temp

    probs = _log_binomial(prob, temp, cfg.n_bins)
    bin_centers = _resize_ac(bin_centers, probs.shape[1:3])
    return jnp.sum(probs * bin_centers, axis=-1)


def zoedepth_forward(params: Params, cfg: ZoeDepthNYUConfig,
                     image: jax.Array) -> jax.Array:
    """(B, H, W, 3) normalized image (H, W multiples of 32) ->
    (B, H, W) metric depth. Matches
    transformers.ZoeDepthForDepthEstimation numerics."""
    hidden, (gh, gw) = beit_backbone(params, cfg, image)
    fused, bottleneck = zoedepth_neck(params, cfg, hidden, gh, gw)
    rel_depth, rel_feats = relative_head(params, fused[-1])
    return metric_head(params, cfg, rel_feats, bottleneck, fused, rel_depth)


# --------------------------------------------------------------------------
# Inference wrapper (isl-org ZoeDepth .infer protocol)
# --------------------------------------------------------------------------

_IMAGENET_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
_IMAGENET_STD = np.array([0.5, 0.5, 0.5], np.float32)


def load_params(npz_path: str) -> Params:
    loaded = dict(np.load(npz_path))
    return {k: jnp.asarray(v) for k, v in loaded.items()}


def predict_depth(params: Params, rgb01: np.ndarray,
                  cfg: ZoeDepthNYUConfig | None = None,
                  flip_aug: bool = True) -> np.ndarray:
    """(H, W, 3) rgb in [0, 1] -> (H, W) metric depth in meters.

    Mirrors the reference's `zoe.infer(x)` protocol
    (depth_from_pretrain.py:156,185): resize to the trained 384x512
    resolution, normalize, forward (averaged with the horizontal flip),
    and resize back. (isl-org additionally reflect-pads ~3% of the
    image; the resize already destroys exact border parity, so the pad
    is folded into the documented 'borders are less reliable' caveat.)
    """
    cfg = cfg or ZoeDepthNYUConfig()
    h, w = rgb01.shape[:2]
    img = jnp.asarray(rgb01, jnp.float32)[None]
    net_hw = (384, 512)
    x = jax.image.resize(img, (1, *net_hw, 3), method="linear")
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    d = zoedepth_forward(params, cfg, x)
    if flip_aug:
        d_f = zoedepth_forward(params, cfg, x[:, :, ::-1])
        d = 0.5 * (d + d_f[:, :, ::-1])
    d = jax.image.resize(d[..., None], (1, h, w, 1), method="linear")
    return np.asarray(d[0, :, :, 0])
