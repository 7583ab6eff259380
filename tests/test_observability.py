"""Writers (tfevents/jsonl) + live viewer tests."""

import json
import urllib.request

import numpy as np

from dnsplatter_tpu.utils.viewer import Viewer
from dnsplatter_tpu.utils.writers import (
    JsonlWriter,
    TensorboardWriter,
    crc32c,
    read_tfevents_scalars,
)


def test_crc32c_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes([0] * 32)) == 0x8A9136AA


def test_tfevents_roundtrip(tmp_path):
    w = TensorboardWriter(tmp_path)
    w.write_scalars(10, {"loss": 1.5, "psnr": 27.25})
    w.write_scalars(20, {"loss": 0.75})
    w.close()
    events = read_tfevents_scalars(w.path)
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 10
    np.testing.assert_allclose(events[1]["scalars"]["loss"], 1.5)
    np.testing.assert_allclose(events[1]["scalars"]["psnr"], 27.25)
    assert events[2]["step"] == 20


def test_jsonl_writer(tmp_path):
    w = JsonlWriter(tmp_path)
    w.write_scalars(5, {"loss": 2.0, "note": "x"})
    w.close()
    rows = [json.loads(l) for l in w.path.read_text().splitlines()]
    assert rows == [{"step": 5, "loss": 2.0, "note": "x"}]


def test_viewer_serves_renders_and_stats():
    v = Viewer(port=0)  # ephemeral port
    try:
        rng = np.random.default_rng(0)
        v.update(stats={"loss": 0.5, "step": 7},
                 images={"rgb": rng.uniform(size=(8, 8, 3)),
                         "depth": rng.uniform(size=(8, 8, 1))})
        base = f"http://127.0.0.1:{v.port}"
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "viewer" in page
        stats = json.loads(urllib.request.urlopen(
            f"{base}/stats.json").read())
        assert stats["loss"] == 0.5
        png = urllib.request.urlopen(f"{base}/rgb.png").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        png_d = urllib.request.urlopen(f"{base}/depth.png").read()
        assert png_d[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        v.close()


def test_trainer_writers_integration(tmp_path):
    """Trainer(out_dir, tensorboard=True, viewer=True) logs through the
    whole stack."""
    import jax

    from dnsplatter_tpu.data.synthetic import make_synthetic_scene
    from dnsplatter_tpu.models.dn_model import ModelConfig
    from dnsplatter_tpu.train.trainer import TrainConfig, Trainer

    scene = make_synthetic_scene(seed=0, n_gaussians=200, n_cameras=2,
                                 width=48, height=48,
                                 pair_capacity=1 << 12)
    pts, cols = scene.seed_points(jax.random.PRNGKey(1), noise=0.03)
    tr = Trainer(
        data=scene, seed_points=(pts, cols),
        model_cfg=ModelConfig(sh_degree=1, warmup_length=1000,
                              use_normal_loss=False, predict_normals=False),
        train_cfg=TrainConfig(pair_capacity=1 << 12, chunk=32, tile_block=4,
                              steps_per_eval_image=4, viewer=True,
                              viewer_port=0, tensorboard=True),
        out_dir=tmp_path,
    )
    tr.train(num_steps=4, log_every=2)
    assert (tmp_path / "metrics.jsonl").exists()
    rows = [json.loads(l)
            for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert any("loss" in r for r in rows)
    tb_files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert tb_files
    events = read_tfevents_scalars(tb_files[0])
    assert any("loss" in e["scalars"] for e in events)
    # viewer got a render from the eval hook
    base = f"http://127.0.0.1:{tr.viewer.port}"
    png = urllib.request.urlopen(f"{base}/rgb.png").read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # user-driven orbit camera: two distinct poses must yield distinct
    # images (the interactive core of the nerfstudio viewer,
    # dn_config.py:69-70)
    pose_a = urllib.request.urlopen(
        f"{base}/render.png?az=0&el=20&r=3&ch=rgb").read()
    pose_b = urllib.request.urlopen(
        f"{base}/render.png?az=120&el=-10&r=3&ch=rgb").read()
    assert pose_a[:8] == b"\x89PNG\r\n\x1a\n"
    assert pose_b[:8] == b"\x89PNG\r\n\x1a\n"
    assert pose_a != pose_b
    # depth channel of the cached pose serves without re-rendering
    pose_b_depth = urllib.request.urlopen(
        f"{base}/render.png?az=120&el=-10&r=3&ch=depth").read()
    assert pose_b_depth[:8] == b"\x89PNG\r\n\x1a\n"
    # live resolution setting: the half-res render is a smaller PNG of
    # the same pose (one compiled fn per quantized scale step)
    pose_b_small = urllib.request.urlopen(
        f"{base}/render.png?az=120&el=-10&r=3&ch=rgb&scale=0.5").read()
    assert pose_b_small[:8] == b"\x89PNG\r\n\x1a\n"
    import struct
    def png_w(b):
        return struct.unpack(">I", b[16:20])[0]
    assert png_w(pose_b_small) < png_w(pose_b)
    tr.viewer.close()


def test_writers_accept_numpy_scalars(tmp_path):
    """np.float32 / np.int64 metric values must neither crash the JSONL
    writer nor be silently dropped by the tfevents writer."""
    import json as _json

    import numpy as _np

    from dnsplatter_tpu.utils.writers import JsonlWriter, TensorboardWriter

    jw = JsonlWriter(tmp_path)
    jw.write_scalars(1, {"a": _np.float32(0.5), "b": _np.int64(3),
                         "c": 1.0, "note": "x"})
    jw.close()
    row = _json.loads(jw.path.read_text().splitlines()[-1])
    assert row["a"] == 0.5 and row["b"] == 3.0 and row["note"] == "x"

    tw = TensorboardWriter(tmp_path)
    tw.write_scalars(1, {"a": _np.float32(0.5), "b": _np.int64(3)})
    tw.close()
    data = next(tmp_path.glob("events.out.tfevents.*")).read_bytes()
    assert b"a" in data and b"b" in data
