"""Golden numeric tests for the loss library.

Each depth/normal loss is checked against an independent torch-CPU
re-implementation of the reference formulas (dn_splatter/losses.py and
regularization_strategy.py), evaluated on the same random inputs. This is
how the huber_l1 masked-mean parity bug from round 1 would have been
caught directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dnsplatter_tpu.models import losses as L
from dnsplatter_tpu.models.regularization import (
    RegularizationConfig,
    ags_regularization_loss,
    dn_regularization_loss,
)

RNG = np.random.default_rng(42)
H, W = 32, 40


def _depth_pair(sparse: bool = False):
    pred = RNG.uniform(0.5, 3.0, (H, W, 1)).astype(np.float32)
    gt = RNG.uniform(0.5, 3.0, (H, W, 1)).astype(np.float32)
    if sparse:
        hole = RNG.uniform(size=(H, W, 1)) < 0.4
        gt = np.where(hole, 0.0, gt).astype(np.float32)
    return pred, gt


def _rgb():
    return RNG.uniform(size=(H, W, 3)).astype(np.float32)


def test_l1_log_l1_mse_golden():
    pred, gt = _depth_pair()
    tp, tg = torch.tensor(pred), torch.tensor(gt)
    np.testing.assert_allclose(
        float(L.l1_loss(pred, gt)), float(torch.abs(tp - tg).mean()), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(L.log_l1_loss(pred, gt)),
        float(torch.log(1 + torch.abs(tp - tg)).mean()),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(L.mse_loss(pred, gt)),
        float(torch.nn.functional.mse_loss(tp, tg)),
        rtol=1e-6,
    )


def test_huber_l1_masked_golden():
    """Reference losses.py:241-246: l1 on pred[mask]/gt[mask] (mask=gt!=0),
    knee d = tresh*max(masked l1), mean over MASKED elements only."""
    pred, gt = _depth_pair(sparse=True)
    tp, tg = torch.tensor(pred), torch.tensor(gt)
    mask = tg != 0
    l1 = torch.abs(tp[mask] - tg[mask])
    d = 0.2 * torch.max(l1)
    loss = torch.where(l1 < d, (((tp - tg) ** 2)[mask] + d**2) / (2 * d), l1)
    golden = float(loss.mean())
    got = float(L.huber_l1_loss(pred, gt))
    np.testing.assert_allclose(got, golden, rtol=1e-5)
    # An unmasked mean (the round-1 bug) would differ materially.
    assert abs(got - float(torch.where(
        torch.abs(tp - tg) < d, ((tp - tg) ** 2 + d**2) / (2 * d),
        torch.abs(tp - tg)).mean())) > 1e-4


def test_tv_and_edge_aware_tv_golden():
    pred, _ = _depth_pair()
    rgb = _rgb()
    tp, trgb = torch.tensor(pred), torch.tensor(rgb)
    h_diff = tp[:, :-1, :] - tp[:, 1:, :]
    w_diff = tp[:-1, :, :] - tp[1:, :, :]
    tv_golden = float(torch.abs(h_diff).mean() + torch.abs(w_diff).mean())
    np.testing.assert_allclose(float(L.tv_loss(pred)), tv_golden, rtol=1e-6)

    gx = torch.abs(tp[:, :-1, :] - tp[:, 1:, :])
    gy = torch.abs(tp[:-1, :, :] - tp[1:, :, :])
    lx = torch.exp(-torch.mean(torch.abs(trgb[:, :-1] - trgb[:, 1:]), -1, True))
    ly = torch.exp(-torch.mean(torch.abs(trgb[:-1] - trgb[1:]), -1, True))
    eatv_golden = float((gx * lx).mean() + (gy * ly).mean())
    np.testing.assert_allclose(
        float(L.edge_aware_tv_loss(pred, rgb)), eatv_golden, rtol=1e-6
    )


def _edge_aware_log_l1_torch(pred, gt, rgb, mask):
    """Reference EdgeAwareLogL1 scalar branch (losses.py:197-224)."""
    tp, tg, trgb = torch.tensor(pred), torch.tensor(gt), torch.tensor(rgb)
    logl1 = torch.log(1 + torch.abs(tp - tg))
    lx = torch.exp(-torch.mean(torch.abs(trgb[:, :-1] - trgb[:, 1:]), -1, True))
    ly = torch.exp(-torch.mean(torch.abs(trgb[:-1] - trgb[1:]), -1, True))
    loss_x = lx * logl1[:, :-1, :]
    loss_y = ly * logl1[:-1, :, :]
    if mask is not None:
        tm = torch.tensor(mask)
        loss_x = loss_x[tm[:, :-1, :]]
        loss_y = loss_y[tm[:-1, :, :]]
    return float(loss_x.mean() + loss_y.mean())


def test_edge_aware_log_l1_golden():
    pred, gt = _depth_pair()
    rgb = _rgb()
    golden = _edge_aware_log_l1_torch(pred, gt, rgb, None)
    np.testing.assert_allclose(
        float(L.edge_aware_log_l1_loss(pred, gt, rgb)), golden, rtol=1e-5
    )
    mask = gt > 1.0
    golden_m = _edge_aware_log_l1_torch(pred, gt, rgb, mask)
    np.testing.assert_allclose(
        float(L.edge_aware_log_l1_loss(pred, gt, rgb, mask)), golden_m,
        rtol=1e-5,
    )


def test_pearson_golden():
    pred, gt = _depth_pair()
    tp, tg = torch.tensor(pred), torch.tensor(gt)
    src = tp - tp.mean()
    tgt = tg - tg.mean()
    src = src / (src.std() + 1e-6)
    tgt = tgt / (tgt.std() + 1e-6)
    golden = float(1 - (src * tgt).mean())
    # torch .std() uses the unbiased (n-1) estimator; jnp.std is biased.
    # On H*W=1280 elements the difference is ~0.04% — within tolerance.
    np.testing.assert_allclose(
        float(L.pearson_depth_loss(pred, gt)), golden, rtol=2e-3
    )


def test_local_pearson_matches_manual_patch_loop():
    """The vmapped dynamic-slice implementation equals a per-box python
    loop of the global pearson loss (SparseGS local loss, losses.py:461-485)."""
    pred = RNG.uniform(0.5, 3.0, (160, 192)).astype(np.float32)
    gt = (pred * 1.7 + 0.3 + RNG.normal(0, 0.05, pred.shape)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    got = float(L.local_pearson_depth_loss(pred, gt, key, box_p=64, p_corr=0.5))
    # regenerate the same boxes the implementation drew
    h, w = pred.shape
    n_corr = max(1, int(0.5 * (h // 64) * (w // 64)))
    kx, ky = jax.random.split(key)
    x0 = jax.random.randint(kx, (n_corr,), 0, h - 64)
    y0 = jax.random.randint(ky, (n_corr,), 0, w - 64)
    acc = 0.0
    for x, y in zip(np.asarray(x0), np.asarray(y0)):
        acc += float(
            L.pearson_depth_loss(pred[x:x + 64, y:y + 64], gt[x:x + 64, y:y + 64])
        )
    np.testing.assert_allclose(got, acc / n_corr, rtol=1e-5)


def test_adaptive_depth_gate_at_7000():
    """AGS AdaptiveDepth (losses.py:395-401): before step 7000 plain
    edge-aware log-l1; at/after 7000, gt zeroed where confidence==0 and
    mask becomes gt > 0.1."""
    pred, gt = _depth_pair()
    rgb = _rgb()
    conf = (RNG.uniform(size=gt.shape) > 0.3).astype(np.float32)
    mask = gt > 0.0

    before = float(L.adaptive_depth_loss(pred, gt, rgb, mask, conf, step=6999))
    np.testing.assert_allclose(
        before, _edge_aware_log_l1_torch(pred, gt, rgb, mask), rtol=1e-5
    )
    after = float(L.adaptive_depth_loss(pred, gt, rgb, mask, conf, step=7000))
    gt_gated = np.where(conf > 0, gt, 0.0).astype(np.float32)
    np.testing.assert_allclose(
        after,
        _edge_aware_log_l1_torch(pred, gt_gated, rgb, gt_gated > 0.1),
        rtol=1e-5,
    )
    assert abs(before - after) > 1e-5


def test_adaptive_normal_gate_at_15000():
    """AGS AdaptiveNormal (losses.py:414-424): L1 before 15000, then L1
    over pixels with angular error <= 0.1 rad (inputs here in [-1,1])."""
    gt = RNG.normal(size=(H, W, 3)).astype(np.float32)
    gt /= np.linalg.norm(gt, axis=-1, keepdims=True)
    noise = RNG.normal(0, 0.05, gt.shape).astype(np.float32)
    pred = gt + noise
    pred /= np.linalg.norm(pred, axis=-1, keepdims=True)

    before = float(L.adaptive_normal_loss(pred, gt, step=14999))
    np.testing.assert_allclose(
        before, float(np.abs(pred - gt).mean()), rtol=1e-5
    )
    after = float(L.adaptive_normal_loss(pred, gt, step=15000))
    ang = np.arccos(np.clip(np.sum(pred * gt, -1), -1, 1))
    keep = ang <= 0.1
    golden = float(np.abs(pred[keep] - gt[keep]).mean())
    np.testing.assert_allclose(after, golden, rtol=1e-4)


def test_dssim_l1_per_pixel_golden():
    """Per-pixel DSSIM+L1 vs the reference's AvgPool/ReflectionPad torch
    implementation (losses.py:111-152)."""
    pred = RNG.uniform(size=(H, W, 3)).astype(np.float32)
    gt = np.clip(pred + RNG.normal(0, 0.1, pred.shape), 0, 1).astype(np.float32)

    tp = torch.tensor(pred).permute(2, 0, 1).unsqueeze(0)
    tg = torch.tensor(gt).permute(2, 0, 1).unsqueeze(0)
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = refl(tp), refl(tg)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x**2) - mu_x**2
    sigma_y = pool(y**2) - mu_y**2
    sigma_xy = pool(x * y) - mu_x * mu_y
    c1, c2 = 0.01**2, 0.03**2
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    ssim_pp = torch.clamp((1 - ssim_n / ssim_d) / 2, 0, 1).mean(1, True)
    l1 = torch.abs(tp - tg).mean(1, True)
    golden = (0.85 * ssim_pp + 0.15 * l1)[0, 0].numpy()

    got = np.asarray(L.dssim_l1_per_pixel(pred, gt))[..., 0]
    # jax clamps variances at 0 (f32 cancellation guard); tolerance covers it
    np.testing.assert_allclose(got, golden, atol=2e-4)


def test_dn_regularization_one_plus_lambda_quirk():
    """regularization_strategy.py:184 does depth_loss += lambda*depth_loss,
    i.e. the effective weight is (1 + lambda)."""
    pred, gt = _depth_pair()
    rgb = _rgb()
    scales = np.log(RNG.uniform(0.01, 0.1, (64, 3))).astype(np.float32)
    cfg0 = RegularizationConfig(depth_lambda=0.0, use_normal_loss=False)
    cfg1 = RegularizationConfig(depth_lambda=0.5, use_normal_loss=False)
    kw = dict(pred_depth=jnp.asarray(pred), gt_depth=jnp.asarray(gt),
              pred_normal=None, gt_normal=None, scales=jnp.asarray(scales),
              gt_img=jnp.asarray(rgb))
    base = float(dn_regularization_loss(cfg0, **kw))
    scaled = float(dn_regularization_loss(cfg1, **kw))
    scale_term = float(L.scale_flatten_loss(jnp.asarray(scales)))
    d0 = base - scale_term
    d1 = scaled - scale_term
    np.testing.assert_allclose(d1, 1.5 * d0, rtol=1e-5)


def test_pearson_local_weight_uses_depth_lambda():
    """Local-pearson term must scale with cfg.depth_lambda, not a literal
    0.2 (regularization_strategy.py:167-177)."""
    pred = RNG.uniform(0.5, 3.0, (160, 192, 1)).astype(np.float32)
    gt = RNG.uniform(0.5, 3.0, (160, 192, 1)).astype(np.float32)
    rgb = RNG.uniform(size=(160, 192, 3)).astype(np.float32)
    scales = np.log(RNG.uniform(0.01, 0.1, (64, 3))).astype(np.float32)
    kw = dict(pred_depth=jnp.asarray(pred), gt_depth=jnp.asarray(gt),
              pred_normal=None, gt_normal=None, scales=jnp.asarray(scales),
              gt_img=jnp.asarray(rgb), key=jax.random.PRNGKey(3))
    cfg_a = RegularizationConfig(depth_loss_type="pearson", depth_lambda=0.0,
                                 use_normal_loss=False)
    cfg_b = RegularizationConfig(depth_loss_type="pearson", depth_lambda=1.0,
                                 use_normal_loss=False)
    scale_term = float(L.scale_flatten_loss(jnp.asarray(scales)))
    # depth term with lambda: (1+lambda) * (glob + lambda*loc)
    glob = float(L.pearson_depth_loss(pred, gt))
    loc = float(L.local_pearson_depth_loss(pred, gt, jax.random.PRNGKey(3)))
    a = float(dn_regularization_loss(cfg_a, **kw)) - scale_term
    b = float(dn_regularization_loss(cfg_b, **kw)) - scale_term
    np.testing.assert_allclose(a, glob, rtol=1e-5)
    np.testing.assert_allclose(b, 2.0 * (glob + loc), rtol=1e-5)


def test_ags_gates_at_7000_and_15000():
    """AGS staged schedule (regularization_strategy.py:202-327): depth
    confidence filter kicks in at step>=7000; normal loss off until
    step>7000; angular-confidence mask replaces edge mask at 15000."""
    pred, gt = _depth_pair()
    rgb = _rgb()
    conf = (RNG.uniform(size=gt.shape) > 0.3).astype(np.float32)
    surf = RNG.normal(size=(H, W, 3)).astype(np.float32)
    surf /= np.linalg.norm(surf, axis=-1, keepdims=True)
    gtn = surf + RNG.normal(0, 0.05, surf.shape).astype(np.float32)
    gtn /= np.linalg.norm(gtn, axis=-1, keepdims=True)
    predn = gtn + RNG.normal(0, 0.01, surf.shape).astype(np.float32)
    scales = np.log(RNG.uniform(0.01, 0.1, (64, 3))).astype(np.float32)

    cfg = RegularizationConfig(depth_lambda=0.2, normal_lambda=0.1)

    def run(step):
        return float(ags_regularization_loss(
            cfg, step=jnp.asarray(step), pred_depth=jnp.asarray(pred),
            gt_depth=jnp.asarray(gt), confidence=jnp.asarray(conf),
            surf_normal=jnp.asarray(surf), gt_normal=jnp.asarray(gtn),
            pred_normal=jnp.asarray(predn), scales=jnp.asarray(scales),
            gt_img=jnp.asarray(rgb)))

    v6999, v7000, v7001 = run(6999), run(7000), run(7001)
    v14999, v15000 = run(14999), run(15000)
    # depth filter changes the loss at exactly 7000
    assert abs(v7000 - v6999) > 1e-6
    # normal lambda gates on at step > 7000 (reference: step > 7000)
    assert abs(v7001 - v7000) > 1e-6
    # angular-confidence mask switch at 15000
    assert abs(v15000 - v14999) > 1e-7


def test_rgb_main_loss_uses_unclamped_gt():
    """The splatfacto main loss must see the raw gt image; the 10/255 clamp
    is only for the regularizers (ADVICE round 1)."""
    from dnsplatter_tpu.models.dn_model import ModelConfig, compute_loss
    from dnsplatter_tpu.models.gaussians import GaussianParams

    n = 16
    params = GaussianParams(
        means=jnp.zeros((n, 3)), scales=jnp.full((n, 3), -3.0),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        features_dc=jnp.zeros((n, 3)), features_rest=jnp.zeros((n, 15, 3)),
        opacities=jnp.zeros((n,)), normals=jnp.tile(jnp.array([0.0, 0, 1]), (n, 1)),
    )
    alive = jnp.ones((n,))
    img_dark = np.zeros((32, 32, 3), np.float32)  # all below 10/255
    pred_black = {
        "rgb": jnp.zeros((32, 32, 3)), "depth": jnp.ones((32, 32, 1)),
        "normal": jnp.full((32, 32, 3), 0.5),
        "surface_normal": jnp.full((32, 32, 3), 0.5),
        "accumulation": jnp.ones((32, 32, 1)),
        "background": jnp.zeros((3,)),
    }
    cfg = ModelConfig(use_depth_loss=False, use_normal_loss=False,
                      predict_normals=False)
    total, ld = compute_loss(
        pred_black, {"image": jnp.asarray(img_dark)}, params, alive,
        camera=None, cfg=cfg, step=jnp.asarray(100),
    )
    # pred == raw gt == black: L1 term must be 0, not |0 - 10/255|
    assert float(ld["rgb_loss"]) < 0.05, float(ld["rgb_loss"])
