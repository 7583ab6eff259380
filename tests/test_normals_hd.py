"""HD patch-merge normal pipeline tests."""

import numpy as np

from dnsplatter_tpu.scripts.normals_hd import (
    best_fit_rotation,
    merge_patch_normals,
    patch_grid,
    predict_normals_hd,
)


def _rot(rx, ry, rz):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    return (
        np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        @ np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        @ np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    )


def _gt_normal_map(h, w):
    """Smooth synthetic normal field (sphere-cap-like)."""
    ys, xs = np.meshgrid(np.linspace(-0.8, 0.8, h),
                         np.linspace(-0.8, 0.8, w), indexing="ij")
    z = np.sqrt(np.maximum(1.0 - xs**2 - ys**2, 0.1))
    n = np.stack([xs, ys, z], -1)
    return n / np.linalg.norm(n, axis=-1, keepdims=True)


def test_best_fit_rotation_recovers_rotation():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 3))
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    r_gt = _rot(0.2, -0.1, 0.3)
    b = a @ r_gt.T
    r = best_fit_rotation(a, b)
    np.testing.assert_allclose(r, r_gt, atol=1e-6)


def test_patch_grid_covers_image():
    corners = patch_grid(500, 700, 384, 256)
    cov = np.zeros((500, 700), bool)
    for y, x in corners:
        cov[y:y + 384, x:x + 384] = True
    assert cov.all()


def test_merge_aligns_per_patch_rotations():
    """Patches perturbed by DIFFERENT random rotations merge into a
    globally consistent map: after removing one global rotation, the
    merged normals match ground truth closely."""
    h = w = 300
    patch, step = 128, 85
    gt = _gt_normal_map(h, w)
    rng = np.random.default_rng(3)
    corners = patch_grid(h, w, patch, step)
    patches = []
    for (y, x) in corners:
        r = _rot(*rng.normal(0, 0.08, 3))  # per-patch orientation error
        patches.append(gt[y:y + patch, x:x + patch] @ r.T)
    merged = merge_patch_normals(patches, corners, h, w)
    # remove the residual global rotation, then compare
    r_glob = best_fit_rotation(merged.reshape(-1, 3), gt.reshape(-1, 3))
    aligned = merged @ r_glob.T
    ang = np.arccos(np.clip(np.sum(aligned * gt, -1), -1, 1))
    assert np.degrees(ang.mean()) < 2.0, np.degrees(ang.mean())
    # naive unaligned average would be much worse than this
    assert np.degrees(ang).max() < 12.0


def test_predict_normals_hd_end_to_end():
    gt = _gt_normal_map(320, 400)

    def predictor(rgb):
        y0, x0 = predictor.pos
        return gt[y0:y0 + rgb.shape[0], x0:x0 + rgb.shape[1]]

    # a predictor that looks up gt by patch position via closure trickery
    # is awkward; instead derive normals from the rgb encoding directly:
    def enc_predictor(rgb):
        return rgb * 2.0 - 1.0

    rgb = (gt + 1.0) * 0.5
    out = predict_normals_hd(rgb, enc_predictor, patch=128, step=96)
    ang = np.arccos(np.clip(np.sum(out * gt, -1), -1, 1))
    assert np.degrees(ang.mean()) < 1.0
