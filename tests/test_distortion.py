"""Camera distortion model tests (roundtrip + undistortion sampling)."""

import numpy as np

from dnsplatter_tpu.data.distortion import (
    colmap_distortion,
    distort_normalized,
    undistort_image,
    undistort_points,
)

FX, FY, CX, CY = 300.0, 310.0, 160.0, 120.0
W, H = 320, 240


def test_distort_undistort_roundtrip_perspective():
    params = np.array([-0.1, 0.02, 0.0, 0.0, 0.001, -0.0005])
    rng = np.random.default_rng(0)
    u = rng.uniform(20, W - 20, 500)
    v = rng.uniform(20, H - 20, 500)
    # distort pixel coords forward
    xn, yn = (u - CX) / FX, (v - CY) / FY
    xd, yd = distort_normalized(xn, yn, params)
    ud, vd = xd * FX + CX, yd * FY + CY
    # undistort must recover the original pinhole coords
    ur, vr = undistort_points(ud, vd, FX, FY, CX, CY, params)
    np.testing.assert_allclose(ur, u, atol=1e-4)
    np.testing.assert_allclose(vr, v, atol=1e-4)


def test_distort_undistort_roundtrip_fisheye():
    params = np.array([-0.05, 0.01, -0.002, 0.0005, 0.0, 0.0])
    rng = np.random.default_rng(1)
    u = rng.uniform(20, W - 20, 500)
    v = rng.uniform(20, H - 20, 500)
    xn, yn = (u - CX) / FX, (v - CY) / FY
    xd, yd = distort_normalized(xn, yn, params, "fisheye")
    ud, vd = xd * FX + CX, yd * FY + CY
    ur, vr = undistort_points(ud, vd, FX, FY, CX, CY, params, "fisheye")
    np.testing.assert_allclose(ur, u, atol=1e-3)
    np.testing.assert_allclose(vr, v, atol=1e-3)


def test_undistort_image_straightens_lines():
    """A world straight line photographed with radial distortion is curved;
    after undistort_image it must be straight (pinhole geometry)."""
    params = np.array([-0.25, 0.05, 0.0, 0.0, 0.0, 0.0])
    # Build the captured (distorted) image of a vertical stripe at u0:
    # for each captured pixel, its undistorted ray is known; the stripe is
    # drawn where the undistorted x-coordinate equals u0.
    us, vs = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    uu, _ = undistort_points(us, vs, FX, FY, CX, CY, params)
    img = (np.abs(uu - 200.0) < 2.0).astype(np.float32)[..., None]
    # stripe in the captured image is curved: column of max varies by row
    cols = img[..., 0].argmax(1)
    assert cols.std() > 0.5, "test setup: stripe should be curved"
    out = undistort_image(img, FX, FY, CX, CY, params)
    ys, xs = np.nonzero(out[..., 0] > 0.5)
    # straightened: all x near 200 (center 0.5 offset)
    assert np.abs(xs + 0.5 - 200.0).max() < 3.0, np.abs(xs - 200).max()


def test_undistort_noop_for_zero_params():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(H, W, 3)).astype(np.float32)
    out = undistort_image(img, FX, FY, CX, CY, np.zeros(6))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_colmap_distortion_mapping():
    d, t = colmap_distortion("OPENCV", [300, 300, 160, 120, -0.1, 0.02,
                                        0.001, -0.002])
    assert t == "perspective"
    np.testing.assert_allclose(d, [-0.1, 0.02, 0, 0, 0.001, -0.002])
    d, t = colmap_distortion("OPENCV_FISHEYE",
                             [300, 300, 160, 120, -0.05, 0.01, 0.002, -0.001])
    assert t == "fisheye"
    np.testing.assert_allclose(d, [-0.05, 0.01, 0.002, -0.001, 0, 0])
    d, t = colmap_distortion("PINHOLE", [300, 300, 160, 120])
    assert d is None and t == "perspective"
    d, t = colmap_distortion("SIMPLE_RADIAL", [300, 160, 120, -0.08])
    np.testing.assert_allclose(d, [-0.08, 0, 0, 0, 0, 0])


def test_dataset_undistorts_on_load(tmp_path):
    """A FrameSpec with distortion serves an undistorted image + pinhole
    camera (scannetpp iphone / raw-COLMAP path)."""
    from dnsplatter_tpu.data import io
    from dnsplatter_tpu.data.dataset import FrameSpec, SceneDataset

    params = np.array([-0.2, 0.03, 0.0, 0.0, 0.0, 0.0])
    us, vs = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    uu, _ = undistort_points(us, vs, FX, FY, CX, CY, params)
    img = np.repeat((np.abs(uu - 200.0) < 2.0)[..., None], 3, -1).astype(
        np.float32
    )
    pimg = tmp_path / "img.png"
    io.write_image(pimg, img)
    spec = FrameSpec(image_path=pimg, c2w=np.eye(4), fx=FX, fy=FY,
                     cx=CX, cy=CY, width=W, height=H,
                     distortion=params)
    ds = SceneDataset(frames=[spec])
    _, batch = ds.get(0)
    ys, xs = np.nonzero(batch["image"][..., 0] > 0.5)
    assert np.abs(xs + 0.5 - 200.0).max() < 3.0
