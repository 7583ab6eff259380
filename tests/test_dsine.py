"""JAX DSINE port vs the reference torch modules (random weights).

The reference's encoder needs `geffnet` (absent here), so:
  * the DSINE-specific modules (Decoder, ConvGRU, RayReLU, UpSampleGN,
    heads, convex upsampling, unfold, rotations, NRN refine) are compared
    numerically against the reference torch code imported with a stubbed
    geffnet and synthesized package parents (no dn_splatter __init__);
  * the EfficientNet-B5 encoder is validated structurally (b5_param_shapes
    random weights -> expected tap shapes) and its TF-SAME conv padding
    against torch's explicit asymmetric pad.

Skipped wholesale if torch or the reference tree is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(os.path.join(REF, "dn_splatter/scripts/dsine")):
    pytest.skip("reference dsine tree unavailable", allow_module_level=True)


def _import_reference():
    """Import reference dsine modules without executing dn_splatter's
    __init__ (heavy deps) and with geffnet stubbed."""
    if "geffnet" not in sys.modules:
        fake = types.ModuleType("geffnet")

        class _Empty(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.global_pool = torch.nn.Identity()
                self.classifier = torch.nn.Identity()

        fake.create_model = lambda *a, **k: _Empty()
        sys.modules["geffnet"] = fake
    for name, sub in [("dn_splatter", "dn_splatter"),
                      ("dn_splatter.scripts", "dn_splatter/scripts"),
                      ("dn_splatter.scripts.dsine", "dn_splatter/scripts/dsine")]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = [os.path.join(REF, sub)]
            sys.modules[name] = m
    import importlib
    sub = importlib.import_module("dn_splatter.scripts.dsine.submodules")
    rot = importlib.import_module("dn_splatter.scripts.dsine.rotations")
    dsn = importlib.import_module("dn_splatter.scripts.dsine.dsine")
    return sub, rot, dsn


SUB, ROT, DSN = _import_reference()

from dnsplatter_tpu.priors import dsine as jd  # noqa: E402
from dnsplatter_tpu.priors import efficientnet as je  # noqa: E402
from dnsplatter_tpu.priors.convert import convert_state_dict  # noqa: E402


def _params(module, prefix=""):
    sd = module.state_dict()
    conv = convert_state_dict(sd)
    return {prefix + k: jnp.asarray(v) for k, v in conv.items()}


def _close(a, b, tol=2e-5, msg=""):
    a = np.asarray(a)
    b = b.detach().numpy() if isinstance(b, torch.Tensor) else np.asarray(b)
    assert a.shape == b.shape, (msg, a.shape, b.shape)
    scale = max(np.abs(b).max(), 1e-6)
    np.testing.assert_allclose(a / scale, b / scale, rtol=tol, atol=tol,
                               err_msg=msg)


@pytest.fixture(scope="module")
def gen():
    torch.manual_seed(0)
    return None


def test_upsample_gn(gen):
    m = SUB.UpSampleGN(skip_input=16 + 6, output_features=16,
                       align_corners=False).eval()
    x = torch.randn(2, 16, 5, 7)
    skip = torch.randn(2, 6, 10, 14)
    with torch.no_grad():
        ref = m(x, skip)
    out = jd._upsample_gn(_params(m, "u."), "u", jnp.asarray(x.numpy()),
                          jnp.asarray(skip.numpy()))
    _close(out, ref, msg="UpSampleGN")


def test_conv_gru(gen):
    m = SUB.ConvGRU(hidden_dim=8, input_dim=6, ks=5).eval()
    h = torch.randn(2, 8, 9, 11)
    x = torch.randn(2, 6, 9, 11)
    with torch.no_grad():
        ref = m(h, x)
    out = jd._conv_gru(_params(m, "gru."), jnp.asarray(h.numpy()),
                       jnp.asarray(x.numpy()))
    _close(out, ref, msg="ConvGRU")


def test_ray_relu(gen):
    m = SUB.RayReLU(eps=1e-2)
    n = torch.nn.functional.normalize(torch.randn(2, 3, 6, 8), dim=1)
    ray = torch.nn.functional.normalize(torch.randn(2, 3, 6, 8), dim=1)
    with torch.no_grad():
        ref = m(n, ray)
    out = jd._ray_relu(jnp.asarray(n.numpy()), jnp.asarray(ray.numpy()))
    _close(out, ref, msg="RayReLU")


def test_prediction_head(gen):
    m = SUB.get_prediction_head(10, 16, 7).eval()
    x = torch.randn(2, 10, 6, 9)
    with torch.no_grad():
        ref = m(x)
    out = jd._prediction_head(_params(m, "h."), "h", jnp.asarray(x.numpy()))
    _close(out, ref, msg="prediction_head")


def test_unfold_and_convex_upsample(gen):
    x = torch.randn(2, 3, 6, 7)
    ref_unf = SUB.get_unfold(x, ps=5, pad=2)
    out_unf = jd._unfold_replicate(jnp.asarray(x.numpy()), 5)
    _close(out_unf, ref_unf, msg="unfold")

    mask = torch.randn(2, 9 * 8 * 8, 6, 7)
    ref_up = SUB.convex_upsampling(x, mask, 8)
    out_up = jd._convex_upsample(jnp.asarray(x.numpy()),
                                 jnp.asarray(mask.numpy()), 8)
    _close(out_up, ref_up, msg="convex_upsampling")


def test_axis_angle(gen):
    aa = torch.randn(50, 3) * 2.0
    aa[:5] *= 1e-8  # small-angle branch
    ref = ROT.axis_angle_to_matrix(aa)
    out = jd._axis_angle_to_matrix(jnp.asarray(aa.numpy()))
    _close(out, ref, msg="axis_angle_to_matrix")


def test_tf_same_conv_padding(gen):
    """TF-SAME asymmetric padding vs torch explicit pad, stride 2."""
    x = torch.randn(1, 5, 11, 13)
    w = torch.randn(7, 5, 3, 3)
    (pt, pb), (pl, pr) = je._same_pads(11, 3, 2), je._same_pads(13, 3, 2)
    ref = torch.nn.functional.conv2d(
        torch.nn.functional.pad(x, (pl, pr, pt, pb)), w, stride=2)
    out = je._conv(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                   jnp.asarray(w.numpy()), 2)
    _close(jnp.transpose(out, (0, 3, 1, 2)), ref, msg="tf-same conv")


@pytest.fixture(scope="module")
def ref_dsine():
    torch.manual_seed(1)
    return DSN.DSINE().eval()


def _fake_features(b, h, w):
    """Random encoder tap activations at the B5 channel widths for an
    (h, w) input (h, w multiples of 32)."""
    torch.manual_seed(2)
    chans = {4: 24, 5: 40, 6: 64, 8: 176, 11: 2048}
    downs = {4: 2, 5: 4, 6: 8, 8: 16, 11: 32}
    feats = [torch.zeros(1)] * 12
    for i, c in chans.items():
        feats[i] = torch.randn(b, c, h // downs[i], w // downs[i])
    return feats


def test_decoder(ref_dsine):
    h, w = 64, 96
    feats = _fake_features(2, h, w)
    intr = torch.tensor([[[80.0, 0, 47.5], [0, 80.0, 31.5], [0, 0, 1]]])
    intr = intr.repeat(2, 1, 1)
    uv_32 = ref_dsine.get_ray(intr, h // 32, w // 32, h, w, return_uv=True)
    uv_16 = ref_dsine.get_ray(intr, h // 16, w // 16, h, w, return_uv=True)
    uv_8 = ref_dsine.get_ray(intr, h // 8, w // 8, h, w, return_uv=True)
    with torch.no_grad():
        ref_n, ref_f, ref_h = ref_dsine.decoder(feats, uvs=(uv_32, uv_16, uv_8))

    p = _params(ref_dsine)
    jf = [jnp.asarray(feats[i].numpy()) for i in (4, 5, 6, 8, 11)]
    juv = tuple(jnp.asarray(u.numpy()) for u in (uv_32, uv_16, uv_8))
    n, f, hh = jd._decoder(p, jf, juv)
    _close(n, ref_n, msg="decoder normal")
    _close(f, ref_f, msg="decoder feature")
    _close(hh, ref_h, msg="decoder hidden")


def test_full_forward_minus_encoder(ref_dsine, monkeypatch):
    """Whole DSINE graph (uv rays, decoder, ray-ReLU, 2 NRN iterations,
    convex upsampling) vs the reference forward with the encoder mocked
    to fixed random features on both sides."""
    h, w = 64, 96
    feats = _fake_features(1, h, w)
    intr = torch.tensor([[[75.0, 0, 47.5], [0, 75.0, 31.5], [0, 0, 1]]])

    class _FixedEnc(torch.nn.Module):
        def forward(self, img):
            return feats

    monkeypatch.setattr(ref_dsine, "encoder", _FixedEnc())
    monkeypatch.setattr(ref_dsine, "num_iter", 2)
    img = torch.randn(1, 3, h, w)
    with torch.no_grad():
        ref_list = ref_dsine(img, intrins=intr.clone())

    p = _params(ref_dsine)
    jfeats = [jnp.asarray(feats[i].numpy()) for i in (4, 5, 6, 8, 11)]
    monkeypatch.setattr(jd, "encoder_features", lambda params, im: jfeats)
    out_list = jd.dsine_forward(p, jnp.asarray(img.numpy()),
                                jnp.asarray(intr.numpy()), num_iter=2)
    assert len(out_list) == len(ref_list)
    for i, (o, r) in enumerate(zip(out_list, ref_list)):
        _close(o, r, tol=5e-5, msg=f"forward stage {i}")


def test_run_dsine_normals_end_to_end(ref_dsine, tmp_path):
    """Full tool path: random-weight npz -> predict_normals -> png, via
    scripts/normals_from_pretrain.run_dsine_normals."""
    from dnsplatter_tpu.data import io
    from dnsplatter_tpu.scripts.normals_from_pretrain import run_dsine_normals

    rng = np.random.default_rng(3)
    arrays = {}
    for k, s in je.b5_param_shapes().items():
        if k.endswith("running_var"):
            arrays[k] = rng.uniform(0.5, 1.5, s).astype(np.float32)
        else:
            arrays[k] = (rng.standard_normal(s) * 0.05).astype(np.float32)
    for k, v in convert_state_dict(ref_dsine.state_dict()).items():
        arrays[k] = v
    npz = tmp_path / "dsine.npz"
    np.savez_compressed(npz, **arrays)

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    io.write_image(img_dir / "f0.png",
                   rng.uniform(0, 1, (50, 70, 3)).astype(np.float32))
    out_dir = tmp_path / "normals_from_pretrain"
    n = run_dsine_normals(img_dir, out_dir, npz)
    assert n == 1
    out = io.read_image(out_dir / "f0.png")
    assert out.shape == (50, 70, 3)
    vec = out * 2.0 - 1.0
    norms = np.linalg.norm(vec, axis=-1)
    assert np.isfinite(out).all()
    # unit normals up to 8-bit quantization
    assert np.abs(norms - 1.0).max() < 0.02, norms


def test_encoder_shapes_random_weights():
    rng = np.random.default_rng(0)
    shapes = je.b5_param_shapes()
    params = {}
    for k, s in shapes.items():
        if k.endswith("running_var"):
            params[k] = jnp.asarray(rng.uniform(0.5, 1.5, s).astype(np.float32))
        else:
            params[k] = jnp.asarray(
                (rng.standard_normal(s) * 0.05).astype(np.float32))
    img = jnp.asarray(rng.standard_normal((1, 3, 64, 96)).astype(np.float32))
    feats = je.encoder_features(params, img)
    got = [tuple(f.shape) for f in feats]
    assert got == [(1, 24, 32, 48), (1, 40, 16, 24), (1, 64, 8, 12),
                   (1, 176, 4, 6), (1, 2048, 2, 3)], got
    for f in feats:
        assert np.isfinite(np.asarray(f)).all()
