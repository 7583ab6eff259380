"""JAX DPT-Hybrid vs torch transformers oracle (random weights).

The omnidata mono-normal prior is DPTDepthModel(backbone='vitb_rn50_384')
(reference normals_from_pretrain.py:177); transformers' hybrid
DPTForDepthEstimation implements the same graph, so a random-weight
forward comparison validates every module of the JAX port."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402

from dnsplatter_tpu.priors import dpt as J  # noqa: E402


def _small_pair(out_channels=1, seed=0):
    from transformers import DPTConfig, DPTForDepthEstimation

    torch.manual_seed(seed)
    cfg_t = DPTConfig(
        is_hybrid=True,
        backbone_config={
            "global_padding": "same", "layer_type": "bottleneck",
            "depths": [1, 1, 2],
            "out_features": ["stage1", "stage2", "stage3"],
            "embedding_dynamic_padding": True,
            "hidden_sizes": [8, 16, 32, 64], "embedding_size": 4,
            "num_groups": 2,
        },
        backbone_featmap_shape=[1, 32, 6, 6],
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, image_size=96, patch_size=16,
        backbone_out_indices=[0, 1, 0, 1],
        neck_hidden_sizes=[8, 16, 16, 16],
        reassemble_factors=[1, 1, 1, 0.5],
        fusion_hidden_size=12, neck_ignore_stages=[0, 1],
    )
    model = DPTForDepthEstimation(cfg_t).eval()
    # randomize: default init zeroes many tensors (layernorms stay 1/0)
    sd = model.state_dict()
    g = torch.Generator().manual_seed(seed + 1)
    for k, v in sd.items():
        if v.ndim >= 2 or k.endswith("cls_token") \
                or "position_embeddings" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
    model.load_state_dict(sd)
    params = {k: np.asarray(v.detach().numpy())
              for k, v in model.state_dict().items()}
    cfg_j = J.DPTHybridConfig(
        hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32,
        bit_embedding=4, bit_depths=(1, 1, 2), bit_hidden=(8, 16, 32),
        num_groups=2, neck_hidden=(8, 16, 16, 16),
        reassemble_factors=(1.0, 1.0, 1.0, 0.5), fusion_hidden=12,
        readout_layers=(0, 1), out_channels=out_channels, pos_grid=6,
    )
    return model, params, cfg_j


def test_bit_backbone_matches_torch():
    model, params, cfg_j = _small_pair()
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = model.dpt.embeddings.backbone(torch.from_numpy(img))
    feats = J.bit_backbone(params, cfg_j,
                           np.transpose(img, (0, 2, 3, 1)))
    for i, (r, f) in enumerate(zip(ref.feature_maps, feats)):
        np.testing.assert_allclose(
            np.transpose(np.asarray(f), (0, 3, 1, 2)), r.numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f"stage {i}")


def test_dpt_hybrid_end_to_end_matches_torch():
    model, params, cfg_j = _small_pair()
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img)).predicted_depth.numpy()
    out = np.asarray(J.dpt_forward(params, cfg_j,
                                   np.transpose(img, (0, 2, 3, 1))))
    np.testing.assert_allclose(out[..., 0], ref, rtol=1e-3, atol=1e-4)


def _hf_to_midas_key(k: str):
    """Inverse rename (HF -> isl-org/DPT `pretrained.*`/`scratch.*`
    naming) written from the MiDaS vit_hybrid module layout, used to
    synthesize an omnidata-shaped state dict for the converter test."""
    import re

    k = k.replace("dpt.embeddings.backbone.bit.embedder.convolution",
                  "pretrained.model.patch_embed.backbone.stem.conv")
    k = k.replace("dpt.embeddings.backbone.bit.embedder.norm",
                  "pretrained.model.patch_embed.backbone.stem.norm")
    if k.startswith("pretrained."):
        return k
    m = re.match(
        r"dpt\.embeddings\.backbone\.bit\.encoder\.stages\.(\d+)\.layers"
        r"\.(\d+)\.(.+)", k)
    if m:
        return (f"pretrained.model.patch_embed.backbone.stages.{m.group(1)}"
                f".blocks.{m.group(2)}.{m.group(3)}")
    if k == "dpt.embeddings.cls_token":
        return "pretrained.model.cls_token"
    if k == "dpt.embeddings.position_embeddings":
        return "pretrained.model.pos_embed"
    m = re.match(r"dpt\.embeddings\.projection\.(.+)", k)
    if m:
        return f"pretrained.model.patch_embed.proj.{m.group(1)}"
    m = re.match(r"dpt\.encoder\.layer\.(\d+)\.(.+)", k)
    if m:
        i, rest = m.group(1), m.group(2)
        table = {
            "layernorm_before.weight": "norm1.weight",
            "layernorm_before.bias": "norm1.bias",
            "layernorm_after.weight": "norm2.weight",
            "layernorm_after.bias": "norm2.bias",
            "attention.output.dense.weight": "attn.proj.weight",
            "attention.output.dense.bias": "attn.proj.bias",
            "intermediate.dense.weight": "mlp.fc1.weight",
            "intermediate.dense.bias": "mlp.fc1.bias",
            "output.dense.weight": "mlp.fc2.weight",
            "output.dense.bias": "mlp.fc2.bias",
        }
        assert rest in table, rest
        return f"pretrained.model.blocks.{i}.{table[rest]}"
    m = re.match(r"dpt\.layernorm\.(weight|bias)", k)
    if m:
        return f"pretrained.model.norm.{m.group(1)}"
    m = re.match(
        r"neck\.reassemble_stage\.readout_projects\.(\d)\.0\.(weight|bias)",
        k)
    if m:
        return (f"pretrained.act_postprocess{int(m.group(1)) + 1}"
                f".0.project.0.{m.group(2)}")
    m = re.match(
        r"neck\.reassemble_stage\.layers\.(\d)\.projection\.(weight|bias)", k)
    if m:
        return f"pretrained.act_postprocess{int(m.group(1)) + 1}.3.{m.group(2)}"
    m = re.match(
        r"neck\.reassemble_stage\.layers\.(\d)\.resize\.(weight|bias)", k)
    if m:
        return f"pretrained.act_postprocess{int(m.group(1)) + 1}.4.{m.group(2)}"
    m = re.match(r"neck\.convs\.(\d)\.weight", k)
    if m:
        return f"scratch.layer{int(m.group(1)) + 1}_rn.weight"
    m = re.match(r"neck\.fusion_stage\.layers\.(\d)\.(.+)", k)
    if m:
        rest = m.group(2)
        rest = rest.replace("projection", "out_conv")
        rest = rest.replace("residual_layer1", "resConfUnit1")
        rest = rest.replace("residual_layer2", "resConfUnit2")
        rest = rest.replace("convolution1", "conv1").replace(
            "convolution2", "conv2")
        return f"scratch.refinenet{4 - int(m.group(1))}.{rest}"
    m = re.match(r"head\.head\.(\d+)\.(weight|bias)", k)
    if m:
        return f"scratch.output_conv.{m.group(1)}.{m.group(2)}"
    return None


def test_midas_checkpoint_conversion_round_trip():
    """Rename the small HF state dict into the omnidata/MiDaS naming
    (fusing qkv, adding the lightning 'model.' prefix), run the
    converter, and check the JAX forward on the converted params still
    matches the torch oracle."""
    from dnsplatter_tpu.priors.convert import convert_dpt_state_dict

    model, params, cfg_j = _small_pair(seed=5)
    midas = {}
    qkv = {}
    for k, v in params.items():
        import re

        m = re.match(
            r"dpt\.encoder\.layer\.(\d+)\.attention\.attention"
            r"\.(query|key|value)\.(weight|bias)", k)
        if m:
            qkv.setdefault((m.group(1), m.group(3)), {})[m.group(2)] = v
            continue
        tgt = _hf_to_midas_key(k)
        if tgt is not None:
            midas["model." + tgt] = v
    for (i, leaf), parts in qkv.items():
        midas[f"model.pretrained.model.blocks.{i}.attn.qkv.{leaf}"] = \
            np.concatenate([parts["query"], parts["key"], parts["value"]],
                           axis=0)
    # converter strips the lightning prefix itself in
    # convert_dpt_checkpoint; mirror that here
    stripped = {k[6:]: v for k, v in midas.items()}
    converted = convert_dpt_state_dict(stripped)

    rng = np.random.default_rng(7)
    img = rng.uniform(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img)).predicted_depth.numpy()
    out = np.asarray(J.dpt_forward(converted, cfg_j,
                                   np.transpose(img, (0, 2, 3, 1))))
    np.testing.assert_allclose(out[..., 0], ref, rtol=1e-3, atol=1e-4)


def test_pos_embed_resize_matches_torch_interpolate():
    """Off-size inputs resize the position grid bilinearly (the HF
    hybrid graph hard-rejects them, so compare the resize primitive
    against torch.nn.functional.interpolate directly and check the
    off-size forward runs and is finite)."""
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(1, 1 + 36, 16)).astype(np.float32)
    ours = np.asarray(J._resize_pos_embed(pos, 8, 8))
    grid = torch.from_numpy(pos[0, 1:].reshape(6, 6, 16)).permute(2, 0, 1)
    ref = torch.nn.functional.interpolate(
        grid[None], size=(8, 8), mode="bilinear", align_corners=False
    )[0].permute(1, 2, 0).reshape(64, 16).numpy()
    np.testing.assert_allclose(ours[0, 1:], ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours[0, 0], pos[0, 0], rtol=0, atol=0)

    model, params, cfg_j = _small_pair(seed=3)
    img = rng.uniform(size=(1, 3, 128, 128)).astype(np.float32)
    out = np.asarray(J.dpt_forward(params, cfg_j,
                                   np.transpose(img, (0, 2, 3, 1))))
    assert out.shape == (1, 128, 128, 1)
    assert np.isfinite(out).all()
