"""DSINE surface-normal network in pure-functional JAX (inference).

Original port of the reference's torch implementation
(dn_splatter/scripts/dsine/dsine.py:1-300, submodules.py, rotations.py):

  EfficientNet-B5 encoder (priors/efficientnet.py)
  -> Decoder: 1x1 bottleneck conv + two UpSampleGN blocks
     (weight-standardized conv + GroupNorm(8) + LeakyReLU) + three
     prediction heads (initial normal / feature / hidden state)
  -> 5 iterations of neighborhood rotation refinement (NRN): a ConvGRU
     (ks=5) updates the hidden state; per-pixel heads predict 5x5
     neighbor probabilities, rotation axes (projected into the image
     plane through the camera rays) and angles; neighbor normals are
     rotated by the axis-angle matrices, ray-ReLU'd, probability-averaged
     and convex-upsampled (x8) with a softmax-weighted 3x3 kernel.

All ops are numerically matched to the torch graph (GroupNorm eps 1e-5,
unbiased weight-standardization std, F.normalize eps 1e-12, cosine eps
1e-8, replicate-pad unfolds, bilinear align_corners=False resize);
tests/test_dsine.py verifies each stage against the reference modules
with random weights. Weights come from priors/convert.py (the published
dsine.pt checkpoint converted to npz).

Params: flat {torch_state_dict_key: jnp.ndarray} dict, torch layouts.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.priors.efficientnet import encoder_features

Params = Dict[str, jax.Array]

PS = 5  # NRN patch size
NUM_ITER = 5
DOWN = 8  # downsample ratio of the coarse prediction


# ---------------------------------------------------------------------------
# torch-op equivalents
# ---------------------------------------------------------------------------


def _conv2d(x, w, b=None, stride=1, padding=0, groups=1):
    """NCHW conv, torch-style symmetric int padding, OIHW weights."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def _normalize(x, axis=1, eps=1e-12):
    """F.normalize: x / max(||x||_2, eps)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def _leaky_relu(x, slope=0.01):
    return jnp.where(x >= 0, x, slope * x)


def _group_norm(x, gamma, beta, groups=8, eps=1e-5):
    b, c, h, w = x.shape
    xg = x.reshape(b, groups, c // groups, h, w)
    mean = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(2, 3, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, c, h, w)
    return x * gamma[None, :, None, None] + beta[None, :, None, None]


def _ws_weight(w):
    """Conv2d_WS weight standardization (submodules.py:113-151): subtract
    per-output-channel mean, divide by UNBIASED std over (in, kh, kw) + 1e-5."""
    mean = jnp.mean(w, axis=(1, 2, 3), keepdims=True)
    wc = w - mean
    n = w.shape[1] * w.shape[2] * w.shape[3]
    var = jnp.sum(wc * wc, axis=(1, 2, 3), keepdims=True) / (n - 1)
    return wc / (jnp.sqrt(var) + 1e-5)


def _resize_bilinear(x, h, w):
    """F.interpolate(mode='bilinear', align_corners=False) on NCHW."""
    b, c = x.shape[:2]
    return jax.image.resize(x, (b, c, h, w), method="bilinear")


def _unfold_replicate(x, ps: int):
    """(B, C, H, W) -> (B, C, ps*ps, H, W) patches with replicate padding,
    patch index = ky * ps + kx (matches F.pad(replicate) + F.unfold)."""
    pad = (ps - 1) // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    h, w = x.shape[2], x.shape[3]
    rows = []
    for ky in range(ps):
        for kx in range(ps):
            rows.append(xp[:, :, ky:ky + h, kx:kx + w])
    return jnp.stack(rows, axis=2)


def _prediction_head(p: Params, name: str, x):
    """conv3x3+ReLU -> conv1x1+ReLU -> conv1x1 (submodules.py:231-238)."""
    x = _conv2d(x, p[f"{name}.0.weight"], p[f"{name}.0.bias"], padding=1)
    x = jax.nn.relu(x)
    x = _conv2d(x, p[f"{name}.2.weight"], p[f"{name}.2.bias"])
    x = jax.nn.relu(x)
    return _conv2d(x, p[f"{name}.4.weight"], p[f"{name}.4.bias"])


def _upsample_gn(p: Params, name: str, x, skip):
    """UpSampleGN (submodules.py:154-181): bilinear resize to skip size,
    concat, two [WS-conv3x3 -> GroupNorm(8) -> LeakyReLU] layers."""
    up = _resize_bilinear(x, skip.shape[2], skip.shape[3])
    f = jnp.concatenate([up, skip], axis=1)
    f = _conv2d(f, _ws_weight(p[f"{name}._net.0.weight"]),
                p[f"{name}._net.0.bias"], padding=1)
    f = _leaky_relu(_group_norm(f, p[f"{name}._net.1.weight"],
                                p[f"{name}._net.1.bias"]))
    f = _conv2d(f, _ws_weight(p[f"{name}._net.3.weight"]),
                p[f"{name}._net.3.bias"], padding=1)
    return _leaky_relu(_group_norm(f, p[f"{name}._net.4.weight"],
                                   p[f"{name}._net.4.bias"]))


def _conv_gru(p: Params, h, x):
    """ConvGRU ks=5 (submodules.py:42-57)."""
    hx = jnp.concatenate([h, x], axis=1)
    z = jax.nn.sigmoid(_conv2d(hx, p["gru.convz.weight"], p["gru.convz.bias"],
                               padding=2))
    r = jax.nn.sigmoid(_conv2d(hx, p["gru.convr.weight"], p["gru.convr.bias"],
                               padding=2))
    rhx = jnp.concatenate([r * h, x], axis=1)
    q = jnp.tanh(_conv2d(rhx, p["gru.convq.weight"], p["gru.convq.bias"],
                         padding=2))
    return (1 - z) * h + z * q


def _ray_relu(pred_norm, ray, eps=1e-2):
    """RayReLU (submodules.py:60-84): clamp the component of the normal
    along the viewing ray to >= eps of its cosine."""
    # torch cosine_similarity: dot / (max(||a||,1e-8) * max(||b||,1e-8))
    na = jnp.maximum(jnp.sqrt(jnp.sum(pred_norm ** 2, axis=1, keepdims=True)),
                     1e-8)
    nb = jnp.maximum(jnp.sqrt(jnp.sum(ray ** 2, axis=1, keepdims=True)), 1e-8)
    cos = jnp.sum(pred_norm * ray, axis=1, keepdims=True) / (na * nb)
    norm_along_view = ray * cos
    relu_along_view = ray * (jax.nn.relu(cos - eps) + eps)
    return _normalize(pred_norm + (relu_along_view - norm_along_view))


def _axis_angle_to_matrix(axis_angle):
    """PyTorch3D axis-angle -> quaternion -> rotation matrix
    (rotations.py:1-84), with the small-angle series branch."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    small = jnp.abs(angles) < 1e-6
    safe = jnp.where(small, 1.0, angles)
    sin_half_over = jnp.where(
        small, 0.5 - angles * angles / 48.0, jnp.sin(half) / safe
    )
    quat = jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over], -1)
    r, i, j, k = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    two_s = 2.0 / jnp.sum(quat * quat, axis=-1)
    o = jnp.stack([
        1 - two_s * (j * j + k * k), two_s * (i * j - k * r),
        two_s * (i * k + j * r),
        two_s * (i * j + k * r), 1 - two_s * (i * i + k * k),
        two_s * (j * k - i * r),
        two_s * (i * k - j * r), two_s * (j * k + i * r),
        1 - two_s * (i * i + j * j),
    ], axis=-1)
    return o.reshape(axis_angle.shape[:-1] + (3, 3))


def _convex_upsample(out, up_mask, k: int):
    """convex_upsampling (submodules.py:205-218): replicate-pad 3x3
    neighborhood, softmax over the 9 weights, pixel-shuffle by k."""
    b, c, h, w = out.shape
    mask = up_mask.reshape(b, 1, 9, k, k, h, w)
    mask = jax.nn.softmax(mask, axis=2)
    nb = _unfold_replicate(out, 3)  # (B, C, 9, H, W)
    up = jnp.sum(mask * nb[:, :, :, None, None], axis=2)  # (B, C, k, k, H, W)
    up = jnp.transpose(up, (0, 1, 4, 2, 5, 3))  # (B, C, H, k, W, k)
    return up.reshape(b, c, k * h, k * w)


# ---------------------------------------------------------------------------
# DSINE graph
# ---------------------------------------------------------------------------


def _pixel_coords(h: int, w: int):
    """(1, 3, H, W) homogeneous pixel centers (x+0.5, y+0.5, 1)."""
    x = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    y = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    return jnp.stack([
        jnp.broadcast_to(x, (h, w)), jnp.broadcast_to(y, (h, w)),
        jnp.ones((h, w), jnp.float32),
    ], axis=0)[None]


def _get_ray(intrins, h, w, orig_h, orig_w, return_uv=False):
    """dsine.py:127-147: rays through downsampled pixel centers with
    resolution-rescaled intrinsics."""
    fu = intrins[:, 0, 0][:, None, None] * (w / orig_w)
    cu = intrins[:, 0, 2][:, None, None] * (w / orig_w)
    fv = intrins[:, 1, 1][:, None, None] * (h / orig_h)
    cv = intrins[:, 1, 2][:, None, None] * (h / orig_h)
    pc = _pixel_coords(h, w)
    rx = (pc[:, 0] - cu) / fu
    ry = (pc[:, 1] - cv) / fv
    rz = jnp.broadcast_to(pc[:, 2], rx.shape)
    ray = jnp.stack([rx, ry, rz], axis=1)
    if return_uv:
        return ray[:, :2]
    return _normalize(ray)


def _decoder(p: Params, feats, uvs):
    """Decoder (dsine.py:20-69)."""
    x_block2, x_block3, x_block4 = feats[2], feats[3], feats[4]
    uv_32, uv_16, uv_8 = uvs
    b = x_block4.shape[0]

    def bc(uv, ref):
        return jnp.broadcast_to(uv, (b,) + uv.shape[1:])

    x_d0 = _conv2d(jnp.concatenate([x_block4, bc(uv_32, x_block4)], 1),
                   p["decoder.conv2.weight"], p["decoder.conv2.bias"])
    x_d1 = _upsample_gn(p, "decoder.up1",
                        x_d0, jnp.concatenate([x_block3, bc(uv_16, x_block3)], 1))
    x_feat = _upsample_gn(p, "decoder.up2",
                          x_d1, jnp.concatenate([x_block2, bc(uv_8, x_block2)], 1))
    x_feat = jnp.concatenate([x_feat, bc(uv_8, x_feat)], 1)

    normal = _normalize(_prediction_head(p, "decoder.normal_head", x_feat))
    f = _prediction_head(p, "decoder.feature_head", x_feat)
    h = _prediction_head(p, "decoder.hidden_head", x_feat)
    return normal, f, h


def _refine(p: Params, h, feat_map, pred_norm, intrins, orig_h, orig_w,
            uv_8, ray_8):
    """One NRN iteration (dsine.py:152-262)."""
    b, _, hh, ww = pred_norm.shape
    fu = intrins[:, 0, 0][:, None, None, None] * (ww / orig_w)
    cu = intrins[:, 0, 2][:, None, None, None] * (ww / orig_w)
    fv = intrins[:, 1, 1][:, None, None, None] * (hh / orig_h)
    cv = intrins[:, 1, 2][:, None, None, None] * (hh / orig_h)

    h_new = _conv_gru(p, h, feat_map)
    huv = jnp.concatenate([h_new, jnp.broadcast_to(uv_8, (b,) + uv_8.shape[1:])], 1)

    nghbr_prob = jax.nn.sigmoid(_prediction_head(p, "prob_head", huv))[:, None]
    nghbr_normals = _unfold_replicate(pred_norm, PS)  # (B, 3, 25, h, w)

    xys = _prediction_head(p, "xy_head", huv)
    xs, ys = xys[:, :PS * PS], xys[:, PS * PS:]
    nghbr_xys = _normalize(jnp.stack([xs, ys], axis=1), axis=1)  # (B,2,25,h,w)

    nghbr_angle = jax.nn.sigmoid(
        _prediction_head(p, "angle_head", huv)
    )[:, None] * np.pi  # (B,1,25,h,w)

    pc = _pixel_coords(hh, ww)
    nghbr_pixel = _unfold_replicate(pc, PS)  # (1, 3, 25, h, w)

    du_over_fu = nghbr_xys[:, 0] / fu  # (B, 25, h, w)
    dv_over_fv = nghbr_xys[:, 1] / fv
    term_u = (nghbr_pixel[:, 0] + nghbr_xys[:, 0] - cu) / fu
    term_v = (nghbr_pixel[:, 1] + nghbr_xys[:, 1] - cv) / fv

    nx, ny, nz = (nghbr_normals[:, 0], nghbr_normals[:, 1], nghbr_normals[:, 2])
    num = -(du_over_fu * nx + dv_over_fv * ny)
    denom = term_u * nx + term_v * ny + nz
    # dsine.py:204-208: clamp |denom| < 1e-8 to 1e-8*sign(denom); a zero
    # denominator yields inf/nan axes that the invalid mask below zeroes.
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8 * jnp.sign(denom), denom)
    delta_z = num / denom

    axes = jnp.stack([
        du_over_fu + delta_z * term_u,
        dv_over_fv + delta_z * term_v,
        delta_z,
    ], axis=1)  # (B, 3, 25, h, w)
    axes = _normalize(axes, axis=1)
    invalid = jnp.sum(
        (jnp.isnan(axes) | jnp.isinf(axes)).astype(jnp.float32), axis=1
    ) > 0.5
    axes = jnp.where(invalid[:, None], 0.0, axes)
    axes = jnp.nan_to_num(axes, nan=0.0, posinf=0.0, neginf=0.0)

    axes_angle = jnp.moveaxis(axes * nghbr_angle, 1, -1)  # (B,25,h,w,3)
    rot = _axis_angle_to_matrix(axes_angle)  # (B,25,h,w,3,3)
    n_in = jnp.moveaxis(nghbr_normals, 1, -1)[..., None]  # (B,25,h,w,3,1)
    n_rot = jnp.matmul(rot, n_in)[..., 0]  # (B,25,h,w,3)
    n_rot = jnp.moveaxis(n_rot, -1, 1)  # (B,3,25,h,w)
    n_rot = _normalize(n_rot, axis=1)

    # ray-ReLU each neighbor slice against the per-pixel ray
    n_rot = jax.vmap(
        lambda nr: _ray_relu(nr, ray_8), in_axes=2, out_axes=2
    )(n_rot)

    pred = _normalize(jnp.sum(nghbr_prob * n_rot, axis=2))
    up_mask = _prediction_head(p, "up_prob_head", huv)
    up_pred = _normalize(_convex_upsample(pred, up_mask, DOWN))
    return h_new, pred, up_pred


def dsine_forward(params: Params, img: jax.Array, intrins: jax.Array,
                  num_iter: int = NUM_ITER) -> List[jax.Array]:
    """Full DSINE forward (dsine.py:264-300).

    Args:
        img: (B, 3, H, W) ImageNet-normalized, H and W multiples of 32.
        intrins: (B, 3, 3) pixel intrinsics of the padded image
            (top-left (0,0) convention; +0.5 is added here like the
            reference's in-place mutation).

    Returns:
        list of (B, 3, H, W) normal maps, one per refinement stage
        (use [-1]).
    """
    feats = encoder_features(params, img)
    b, _, orig_h, orig_w = img.shape
    intrins = intrins.at[:, 0, 2].add(0.5).at[:, 1, 2].add(0.5)
    uv_32 = _get_ray(intrins, orig_h // 32, orig_w // 32, orig_h, orig_w, True)
    uv_16 = _get_ray(intrins, orig_h // 16, orig_w // 16, orig_h, orig_w, True)
    uv_8 = _get_ray(intrins, orig_h // 8, orig_w // 8, orig_h, orig_w, True)
    ray_8 = _get_ray(intrins, orig_h // 8, orig_w // 8, orig_h, orig_w)

    pred_norm, feat_map, h = _decoder(params, feats, (uv_32, uv_16, uv_8))
    pred_norm = _ray_relu(pred_norm, ray_8)
    feat_map = jnp.concatenate(
        [feat_map, jnp.broadcast_to(uv_8, (b,) + uv_8.shape[1:])], 1
    )

    up_mask = _prediction_head(
        params, "up_prob_head",
        jnp.concatenate([h, jnp.broadcast_to(uv_8, (b,) + uv_8.shape[1:])], 1),
    )
    preds = [_normalize(_convex_upsample(pred_norm, up_mask, DOWN))]
    for _ in range(num_iter):
        h, pred_norm, up = _refine(
            params, h, feat_map, jax.lax.stop_gradient(pred_norm), intrins,
            orig_h, orig_w, uv_8, ray_8,
        )
        preds.append(up)
    return preds


# ---------------------------------------------------------------------------
# predictor wrapper (dsine_predictor.py)
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def pad_input(h: int, w: int) -> Tuple[int, int, int, int]:
    """Zero-pad sizes so both dims are multiples of 32 (predictor:13-29)."""
    left = right = top = bottom = 0
    if w % 32:
        nw = 32 * (w // 32 + 1)
        left = (nw - w) // 2
        right = nw - w - left
    if h % 32:
        nh = 32 * (h // 32 + 1)
        top = (nh - h) // 2
        bottom = nh - h - top
    return left, right, top, bottom


def intrins_from_fov(fov_deg: float, h: int, w: int) -> np.ndarray:
    f = (max(w, h) / 2.0) / np.tan(np.deg2rad(fov_deg / 2.0))
    return np.array([[f, 0, w / 2.0 - 0.5], [0, f, h / 2.0 - 0.5], [0, 0, 1]],
                    np.float32)


def predict_normals(params: Params, rgb_u8: np.ndarray,
                    K: np.ndarray | None = None) -> np.ndarray:
    """uint8 (H, W, 3) -> (H, W, 3) unit camera-space normals (DSinePredictor
    semantics: pad to /32, ImageNet-normalize, run, crop)."""
    h, w = rgb_u8.shape[:2]
    img = rgb_u8.astype(np.float32) / 255.0
    left, right, top, bottom = pad_input(h, w)
    img = np.pad(img, ((top, bottom), (left, right), (0, 0)))
    img = (img - IMAGENET_MEAN) / IMAGENET_STD
    img = jnp.asarray(img.transpose(2, 0, 1)[None])
    K = intrins_from_fov(60.0, h, w) if K is None else K.astype(np.float32)
    K = K.copy()
    K[0, 2] += left
    K[1, 2] += top
    out = dsine_forward(params, img, jnp.asarray(K[None]))[-1]
    out = np.asarray(out)[0].transpose(1, 2, 0)
    return out[top:top + h, left:left + w]


def load_params(npz_path: str) -> Params:
    data = np.load(npz_path)
    return {k: jnp.asarray(data[k]) for k in data.files}
