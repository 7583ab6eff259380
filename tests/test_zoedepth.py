"""JAX ZoeDepth-NYU vs torch transformers oracle (random weights).

The reference's mono-depth net is `torch.hub.load("isl-org/ZoeDepth",
"ZoeD_N")` (depth_from_pretrain.py:155-156); transformers'
ZoeDepthForDepthEstimation implements the same graph (BEiT backbone +
DPT neck + metric bins head), so random-weight comparisons validate
every module of the JAX port."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402

from dnsplatter_tpu.priors import zoedepth as Z  # noqa: E402


def _small_pair(seed=0, image_size=96):
    from transformers import ZoeDepthConfig, ZoeDepthForDepthEstimation

    torch.manual_seed(seed)
    cfg_t = ZoeDepthConfig(
        backbone_config={
            "model_type": "beit", "hidden_size": 32,
            "num_hidden_layers": 4, "num_attention_heads": 2,
            "intermediate_size": 64, "image_size": image_size,
            "patch_size": 16, "use_relative_position_bias": True,
            "reshape_hidden_states": False,
            "out_features": ["stage1", "stage2", "stage3", "stage4"],
        },
        neck_hidden_sizes=[8, 16, 24, 24],
        fusion_hidden_size=24,
        bottleneck_features=24,
        num_relative_features=8,
        num_attractors=[4, 3, 2, 1],
        bin_embedding_dim=8,
        bin_configurations=[{"n_bins": 16, "min_depth": 1e-3,
                             "max_depth": 10.0}],
        bin_centers_type="softplus",
    )
    model = ZoeDepthForDepthEstimation(cfg_t).eval()
    # randomize: default init zeroes biases and the rel-pos tables
    sd = model.state_dict()
    g = torch.Generator().manual_seed(seed + 1)
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
        if k.endswith(("lambda_1", "lambda_2")):
            sd[k] = 1.0 + torch.randn(v.shape, generator=g) * 0.02
    model.load_state_dict(sd)
    params = {k: np.asarray(v.detach().numpy())
              for k, v in model.state_dict().items()
              if not k.endswith("relative_position_index")}
    cfg_j = Z.ZoeDepthNYUConfig(
        hidden_size=32, num_layers=4, num_heads=2, intermediate_size=64,
        train_image_size=image_size, out_layers=(1, 2, 3, 4),
        fusion_hidden=24, num_relative_features=8, n_bins=16,
    )
    return model, params, cfg_j


def test_beit_backbone_matches_torch():
    model, params, cfg_j = _small_pair()
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = model.backbone(torch.from_numpy(img)).feature_maps
    outs, (gh, gw) = Z.beit_backbone(params, cfg_j,
                                     np.transpose(img, (0, 2, 3, 1)))
    assert (gh, gw) == (6, 6)
    for i, (r, f) in enumerate(zip(ref, outs)):
        np.testing.assert_allclose(np.asarray(f), r.numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg=f"stage {i}")


def test_zoedepth_end_to_end_matches_torch():
    model, params, cfg_j = _small_pair()
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img)).predicted_depth.numpy()
    out = np.asarray(Z.zoedepth_forward(params, cfg_j,
                                        np.transpose(img, (0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_zoedepth_offgrid_resolution_matches_torch():
    """Non-square, off-train-grid input exercises the MiDaS v3.1
    relative-position-bias resize (including the transposed reshape
    quirk) — compare directly against torch at 128x160."""
    model, params, cfg_j = _small_pair(seed=2)
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(1, 3, 128, 160)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img)).predicted_depth.numpy()
    out = np.asarray(Z.zoedepth_forward(params, cfg_j,
                                        np.transpose(img, (0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def _hf_to_islorg_key(k: str):
    """Inverse rename (HF -> isl-org ZoeDepth `core.core.pretrained.*`
    / `core.core.scratch.*` / head naming) written from the isl-org
    module layout, used to synthesize a ZoeD_N.pt-shaped state dict for
    the converter test. Returns None for keys handled by the qkv fuse."""
    import re

    m = re.match(r"backbone\.embeddings\.cls_token", k)
    if m:
        return "core.core.pretrained.model.cls_token"
    m = re.match(r"backbone\.embeddings\.patch_embeddings\.projection\.(.+)",
                 k)
    if m:
        return f"core.core.pretrained.model.patch_embed.proj.{m.group(1)}"
    m = re.match(r"backbone\.encoder\.layer\.(\d+)\.(.+)", k)
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
            "lambda_1": "gamma_1",
            "lambda_2": "gamma_2",
            "attention.attention.relative_position_bias."
            "relative_position_bias_table":
                "attn.relative_position_bias_table",
            "attention.attention.query.bias": "attn.q_bias",
            "attention.attention.value.bias": "attn.v_bias",
        }
        if rest in table:
            return f"core.core.pretrained.model.blocks.{i}.{table[rest]}"
        return None  # q/k/v weights fuse into attn.qkv.weight
    m = re.match(
        r"neck\.reassemble_stage\.readout_projects\.(\d)\.0\.(weight|bias)",
        k)
    if m:
        return (f"core.core.pretrained.act_postprocess{int(m.group(1)) + 1}"
                f".0.project.0.{m.group(2)}")
    m = re.match(
        r"neck\.reassemble_stage\.layers\.(\d)\.projection\.(weight|bias)", k)
    if m:
        return (f"core.core.pretrained.act_postprocess{int(m.group(1)) + 1}"
                f".3.{m.group(2)}")
    m = re.match(
        r"neck\.reassemble_stage\.layers\.(\d)\.resize\.(weight|bias)", k)
    if m:
        return (f"core.core.pretrained.act_postprocess{int(m.group(1)) + 1}"
                f".4.{m.group(2)}")
    m = re.match(r"neck\.convs\.(\d)\.weight", k)
    if m:
        return f"core.core.scratch.layer{int(m.group(1)) + 1}_rn.weight"
    m = re.match(r"neck\.fusion_stage\.layers\.(\d)\.(.+)", k)
    if m:
        rest = m.group(2)
        rest = rest.replace("projection", "out_conv")
        rest = rest.replace("residual_layer1", "resConfUnit1")
        rest = rest.replace("residual_layer2", "resConfUnit2")
        rest = rest.replace("convolution1", "conv1").replace(
            "convolution2", "conv2")
        return f"core.core.scratch.refinenet{4 - int(m.group(1))}.{rest}"
    m = re.match(r"relative_head\.conv(\d)\.(weight|bias)", k)
    if m:
        return (f"core.core.scratch.output_conv."
                f"{(int(m.group(1)) - 1) * 2}.{m.group(2)}")
    m = re.match(r"metric_head\.conv2\.(weight|bias)", k)
    if m:
        return f"conv2.{m.group(1)}"
    m = re.match(
        r"metric_head\.(seed_bin_regressor|seed_projector)\.conv(\d)"
        r"\.(weight|bias)", k)
    if m:
        return (f"{m.group(1)}._net.{(int(m.group(2)) - 1) * 2}"
                f".{m.group(3)}")
    m = re.match(
        r"metric_head\.(projectors|attractors)\.(\d)\.conv(\d)"
        r"\.(weight|bias)", k)
    if m:
        return (f"{m.group(1)}.{m.group(2)}._net."
                f"{(int(m.group(3)) - 1) * 2}.{m.group(4)}")
    m = re.match(
        r"metric_head\.conditional_log_binomial\.mlp\.(\d)\.(weight|bias)",
        k)
    if m:
        return f"conditional_log_binomial.mlp.{m.group(1)}.{m.group(2)}"
    raise AssertionError(f"unmapped HF key: {k}")


def test_islorg_checkpoint_conversion_round_trip():
    """Rename the small HF state dict into the isl-org ZoeD_N naming
    (fusing qkv with timm's q_bias/v_bias split), run the converter,
    and check the JAX forward on the converted params matches torch."""
    from dnsplatter_tpu.priors.convert import convert_zoedepth_state_dict

    model, params, cfg_j = _small_pair(seed=5)
    islorg = {}
    qkv = {}
    import re

    for k, v in params.items():
        m = re.match(
            r"backbone\.encoder\.layer\.(\d+)\.attention\.attention"
            r"\.(query|key|value)\.weight", k)
        if m:
            qkv.setdefault(m.group(1), {})[m.group(2)] = v
            continue
        tgt = _hf_to_islorg_key(k)
        if tgt is not None:
            islorg[tgt] = v
    for i, parts in qkv.items():
        islorg[f"core.core.pretrained.model.blocks.{i}.attn.qkv.weight"] = \
            np.concatenate([parts["query"], parts["key"], parts["value"]],
                           axis=0)
    converted = convert_zoedepth_state_dict(islorg)

    rng = np.random.default_rng(7)
    img = rng.uniform(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img)).predicted_depth.numpy()
    out = np.asarray(Z.zoedepth_forward(converted, cfg_j,
                                        np.transpose(img, (0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)
