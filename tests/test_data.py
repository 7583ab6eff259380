"""Data layer: IO roundtrips, COLMAP reader, transforms.json parser."""

import json
import struct
from pathlib import Path

import numpy as np

from dnsplatter_tpu.data import io
from dnsplatter_tpu.data import colmap_utils as cu


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    p = tmp_path / "cloud.ply"
    io.write_ply(p, pts, colors=cols, normals=nrm)
    out = io.read_ply(p)
    np.testing.assert_allclose(out["points"], pts, rtol=1e-6)
    np.testing.assert_allclose(out["normals"], nrm, rtol=1e-6)
    assert np.abs(out["colors"] - cols).max() < 1.0 / 255.0 + 1e-6


def test_mesh_ply_roundtrip(tmp_path):
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    p = tmp_path / "mesh.ply"
    io.write_ply(p, pts, faces=faces)
    out = io.read_ply(p)
    np.testing.assert_allclose(out["points"], pts)


def test_depth_png_roundtrip(tmp_path):
    d = np.random.default_rng(1).uniform(0.5, 4.0, (24, 32, 1)).astype(np.float32)
    p = tmp_path / "d.png"
    io.write_depth_png(p, d, unit=1e-3)
    back = io.read_depth(p, scale_factor=1e-3)
    assert np.abs(back - d).max() < 2e-3  # 16-bit mm quantization


def test_normal_png_conventions(tmp_path):
    from PIL import Image

    n = np.zeros((8, 8, 3), np.float32)
    n[..., 2] = 1.0  # straight +z in [-1,1]
    enc = ((n + 1) / 2 * 255).astype(np.uint8)
    p = tmp_path / "n.png"
    Image.fromarray(enc).save(p)
    out = io.read_normal(p, format="omnidata")
    vec = 2 * out - 1
    # omnidata flip maps +z -> -z
    np.testing.assert_allclose(vec[..., 2], -1.0, atol=2e-2)


def _write_fake_colmap(sparse: Path):
    sparse.mkdir(parents=True)
    # cameras.bin: one PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<4d", 60.0, 60.0, 32.0, 24.0))
    # images.bin: two images, no keypoints
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in enumerate([b"a.png", b"b.png"]):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
            f.write(struct.pack("<3d", 0.1 * i, 0.0, 1.0))
            f.write(struct.pack("<i", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 0))
    # points3D.bin: three points
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<Q3d3Bd", i, i * 1.0, 0.5, 2.0,
                                100, 150, 200, 0.5))
            f.write(struct.pack("<Q", 0))


def test_colmap_reader(tmp_path):
    _write_fake_colmap(tmp_path / "sparse")
    cams, imgs, xyz, rgb = cu.read_model(tmp_path / "sparse")
    assert cams[1].model == "PINHOLE"
    assert cu.camera_intrinsics(cams[1]) == (60.0, 60.0, 32.0, 24.0)
    assert imgs[1].name == "a.png"
    assert xyz.shape == (3, 3)
    np.testing.assert_allclose(rgb[0], [100 / 255, 150 / 255, 200 / 255])
    # identity rotation -> c2w translation = -t, with GL flip on y/z cols
    c2w = cu.image_c2w_opengl(imgs[1])
    np.testing.assert_allclose(c2w[:3, 3], [0.0, 0.0, -1.0], atol=1e-9)


def test_transforms_json_parser(tmp_path):
    from dnsplatter_tpu.data.parsers.normal_nerfstudio import (
        NerfstudioParserConfig, parse,
    )

    rng = np.random.default_rng(0)
    (tmp_path / "images").mkdir()
    frames = []
    for i in range(6):
        img = rng.uniform(size=(24, 32, 3))
        io.write_image(tmp_path / "images" / f"frame_{i:04d}.png", img)
        c2w = np.eye(4)
        c2w[:3, 3] = [np.cos(i), np.sin(i), 0.5]
        frames.append(
            {
                "file_path": f"images/frame_{i:04d}.png",
                "transform_matrix": c2w.tolist(),
            }
        )
    meta = {
        "fl_x": 30.0, "fl_y": 30.0, "cx": 16.0, "cy": 12.0,
        "w": 32, "h": 24, "frames": frames,
        "ply_file_path": "sparse_pc.ply",
    }
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    io.write_ply(tmp_path / "sparse_pc.ply", pts,
                 colors=rng.uniform(size=(50, 3)).astype(np.float32))

    cfg = NerfstudioParserConfig(data=tmp_path, train_split_fraction=0.8)
    train = parse(cfg, "train")
    val = parse(cfg, "val")
    assert len(train) + len(val) == 6
    assert train.seed_points is not None and train.seed_points.shape == (50, 3)
    # poses auto-scaled into the unit box
    maxt = max(
        float(np.abs(np.asarray(f.c2w)[:3, 3]).max()) for f in train.frames
    )
    assert maxt <= 1.0 + 1e-5

    cam, batch = train.get(0)
    assert batch["image"].shape == (24, 32, 3)
    assert cam.width == 32 and cam.height == 24


def _write_fake_mushroom(root, n_frames=4, w=32, h=24):
    """Depth-only MuSHRoom layout: no ply, no normals — the parser must
    reconstruct both (mushroom_dataparser.py:474-697 autogeneration)."""
    import json as _json

    rng = np.random.default_rng(0)
    for capture in ("long_capture", "short_capture"):
        cdir = root / "iphone" / capture
        (cdir / "images").mkdir(parents=True)
        (cdir / "depth").mkdir(parents=True)
        frames = []
        n = n_frames if capture == "long_capture" else 2
        for i in range(n):
            img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
            io.write_image(cdir / "images" / f"{i:04d}.png", img)
            depth = rng.uniform(1.0, 2.0, (h, w)).astype(np.float32)
            io.write_depth_png(cdir / "depth" / f"{i:04d}.png", depth)
            c2w = np.eye(4)
            c2w[0, 3] = 0.1 * i
            frames.append({
                "file_path": f"images/{i:04d}.png",
                "depth_file_path": f"depth/{i:04d}.png",
                "transform_matrix": c2w.tolist(),
            })
        meta = {"fl_x": 40.0, "fl_y": 40.0, "cx": w / 2, "cy": h / 2,
                "w": w, "h": h, "frames": frames}
        (cdir / "transformations.json").write_text(_json.dumps(meta))
    (root / "iphone" / "long_capture" / "test.txt").write_text("0003\n")


def test_mushroom_seed_cloud_and_normal_autogeneration(tmp_path):
    """Depth-only layout -> parse() yields an exactly-num_init_points seed
    cloud with normals and per-frame normal maps, no manual steps."""
    from dnsplatter_tpu.data.parsers.mushroom import (
        MushroomParserConfig, parse,
    )

    _write_fake_mushroom(tmp_path)
    cfg = MushroomParserConfig(data=tmp_path, num_init_points=5000)
    ds = parse(cfg, "train")
    assert ds.seed_points is not None and len(ds.seed_points) == 5000
    assert ds.seed_colors is not None and len(ds.seed_colors) == 5000
    assert ds.seed_normals is not None
    nl = np.linalg.norm(ds.seed_normals, axis=-1)
    assert np.isfinite(ds.seed_points).all()
    assert (nl > 0.5).mean() > 0.7  # mostly unit normals (random depth is noisy)
    # per-frame normal maps generated from depth
    gen_dir = tmp_path / "iphone" / "long_capture" / "normals_from_depth"
    assert gen_dir.exists() and len(list(gen_dir.glob("*.png"))) > 0
    cam, batch = ds.get(0)
    assert "normal" in batch and batch["normal"].shape[-1] == 3
    # regenerated ply cached on disk
    assert (tmp_path / "iphone_pointcloud.ply").exists()
    # eval split still parses
    ds_eval = parse(cfg, "val")
    assert len(ds_eval) == 2  # short capture (eval_mode="with")


def test_poses_to_colmap_roundtrip(tmp_path):
    """transforms.json -> COLMAP sparse text model: our own colmap reader
    must recover the same camera poses (conversion consistency)."""
    import json as _json

    from dnsplatter_tpu.data import colmap_utils as cu
    from dnsplatter_tpu.scripts.poses_to_colmap_sfm import write_sparse_model

    rng = np.random.default_rng(0)
    frames = []
    c2ws = []
    for i in range(3):
        # random OpenGL c2w in nerfstudio world (pre-applied transform)
        from dnsplatter_tpu.ops.camera import look_at

        eye = rng.uniform(-2, 2, 3)
        c2w = np.asarray(look_at(eye, (0, 0, 0)))
        c2ws.append(c2w)
        frames.append({
            "file_path": f"images/{i:03d}.png",
            "transform_matrix": c2w.tolist(),
        })
    meta = {"camera_model": "OPENCV", "fl_x": 100.0, "fl_y": 100.0,
            "cx": 50.0, "cy": 40.0, "w": 100, "h": 80, "frames": frames}
    tp = tmp_path / "transforms.json"
    tp.write_text(_json.dumps(meta))
    sparse = write_sparse_model(
        tp, assume_colmap_world_coordinate_convention=False
    )
    cams, imgs, xyz, rgb = cu.read_model(sparse)
    assert len(cams) == 1 and len(imgs) == 3
    fx, fy, cx, cy = cu.camera_intrinsics(list(cams.values())[0])
    assert (fx, fy, cx, cy) == (100.0, 100.0, 50.0, 40.0)
    items = sorted(imgs.values(), key=lambda im: im.name)
    for im, c2w in zip(items, c2ws):
        rec = cu.image_c2w_opengl(im)
        np.testing.assert_allclose(rec, c2w, atol=1e-6)
