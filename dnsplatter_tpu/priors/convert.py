"""Convert published torch prior checkpoints to the JAX npz format.

Usage:
    python -m dnsplatter_tpu.priors.convert dsine.pt dsine.npz
    python -m dnsplatter_tpu.priors.convert --dpt \
        omnidata_dpt_normal_v2.ckpt omnidata.npz

The reference downloads `dsine.pt` (dn_splatter/scripts/dsine/
dsine_predictor.py:53-66, huggingface camenduru/DSINE) and loads it into
torch modules; this converts `state_dict["model"]` into the flat
{key: float32 array} npz consumed by priors/dsine.py — tensors keep
their torch layouts (conv OIHW, depthwise (C,1,k,k)), so conversion is
purely dtype + container. Works on any state_dict with the same module
names (e.g. re-trained DSINE variants).
"""

from __future__ import annotations

import sys

import numpy as np


def convert_state_dict(state_dict) -> dict:
    out = {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if arr.dtype == np.float64 or arr.dtype == np.float16:
            arr = arr.astype(np.float32)
        out[k] = arr
    return out


def convert_checkpoint(pt_path: str, npz_path: str) -> int:
    import torch  # offline tool only

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    arrays = convert_state_dict(state)
    np.savez_compressed(npz_path, **arrays)
    return len(arrays)


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "--dpt":
        if len(argv) != 3:
            print(__doc__)
            raise SystemExit(2)
        n = convert_dpt_checkpoint(argv[1], argv[2])
        print(f"wrote {argv[2]}: {n} tensors")
        return
    if len(argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    n = convert_checkpoint(argv[0], argv[1])
    print(f"wrote {argv[1]}: {n} tensors")


if __name__ == "__main__":
    main()


# --------------------------------------------------------------------------
# DPT-Hybrid (omnidata_dpt_normal_v2.ckpt / MiDaS dpt_hybrid) conversion
# --------------------------------------------------------------------------

def _midas_to_hf_key(k: str):
    """Map one isl-org/DPT (MiDaS/omnidata) state-dict key to the
    HF-transformers naming priors/dpt.py consumes. Returns None for
    buffers the JAX graph does not use; 'QKV' keys are handled by the
    caller (they split into three)."""
    import re

    # BiT backbone (timm resnetv2 inside patch_embed)
    m = re.match(r"pretrained\.model\.patch_embed\.backbone\.stem\.(conv|norm)\.(.+)", k)
    if m:
        part = "convolution" if m.group(1) == "conv" else "norm"
        return f"dpt.embeddings.backbone.bit.embedder.{part}.{m.group(2)}"
    m = re.match(
        r"pretrained\.model\.patch_embed\.backbone\.stages\.(\d+)\.blocks"
        r"\.(\d+)\.(.+)", k)
    if m:
        return (f"dpt.embeddings.backbone.bit.encoder.stages.{m.group(1)}"
                f".layers.{m.group(2)}.{m.group(3)}")
    # ViT embeddings
    if k == "pretrained.model.cls_token":
        return "dpt.embeddings.cls_token"
    if k == "pretrained.model.pos_embed":
        return "dpt.embeddings.position_embeddings"
    m = re.match(r"pretrained\.model\.patch_embed\.proj\.(.+)", k)
    if m:
        return f"dpt.embeddings.projection.{m.group(1)}"
    # ViT blocks
    m = re.match(r"pretrained\.model\.blocks\.(\d+)\.(.+)", k)
    if m:
        i, rest = m.group(1), m.group(2)
        pre = f"dpt.encoder.layer.{i}"
        table = {
            "norm1.weight": "layernorm_before.weight",
            "norm1.bias": "layernorm_before.bias",
            "norm2.weight": "layernorm_after.weight",
            "norm2.bias": "layernorm_after.bias",
            "attn.proj.weight": "attention.output.dense.weight",
            "attn.proj.bias": "attention.output.dense.bias",
            "mlp.fc1.weight": "intermediate.dense.weight",
            "mlp.fc1.bias": "intermediate.dense.bias",
            "mlp.fc2.weight": "output.dense.weight",
            "mlp.fc2.bias": "output.dense.bias",
        }
        if rest in table:
            return f"{pre}.{table[rest]}"
        if rest.startswith("attn.qkv."):
            return ("QKV", i, rest.split(".")[-1])
        return None
    if k in ("pretrained.model.norm.weight", "pretrained.model.norm.bias"):
        return "dpt.layernorm." + k.split(".")[-1]
    # hybrid reassembly (act_postprocess 3/4 -> neck stages 2/3)
    m = re.match(r"pretrained\.act_postprocess(\d)\.(\d+)(?:\.project\.0)?\.(weight|bias)", k)
    if m:
        stage = int(m.group(1)) - 1  # 3 -> 2, 4 -> 3
        sub = int(m.group(2))
        leaf = m.group(3)
        if stage < 2:
            return None  # stages 1/2 are identity in hybrid
        if sub == 0:
            return f"neck.reassemble_stage.readout_projects.{stage}.0.{leaf}"
        if sub == 3:
            return f"neck.reassemble_stage.layers.{stage}.projection.{leaf}"
        if sub == 4:
            return f"neck.reassemble_stage.layers.{stage}.resize.{leaf}"
        return None
    # scratch: rn convs, refinenets (reversed order), output head
    m = re.match(r"scratch\.layer(\d)_rn\.weight", k)
    if m:
        return f"neck.convs.{int(m.group(1)) - 1}.weight"
    m = re.match(r"scratch\.refinenet(\d)\.(.+)", k)
    if m:
        layer = 4 - int(m.group(1))  # refinenet4 runs first (deepest)
        rest = m.group(2)
        rest = rest.replace("out_conv", "projection")
        rest = rest.replace("resConfUnit1", "residual_layer1")
        rest = rest.replace("resConfUnit2", "residual_layer2")
        rest = rest.replace("conv1", "convolution1").replace(
            "conv2", "convolution2")
        return f"neck.fusion_stage.layers.{layer}.{rest}"
    m = re.match(r"scratch\.output_conv\.(\d+)\.(weight|bias)", k)
    if m:
        return f"head.head.{m.group(1)}.{m.group(2)}"
    return None


def convert_dpt_state_dict(state_dict) -> dict:
    """omnidata/MiDaS DPT-hybrid (or HF transformers DPT) state dict ->
    flat HF-named float32 arrays for priors/dpt.py. Fused qkv weights
    split into query/key/value thirds."""
    import numpy as np

    arrays = convert_state_dict(state_dict)
    if any(k.startswith(("dpt.", "neck.", "head.")) for k in arrays):
        return arrays  # already HF naming
    out = {}
    for k, v in arrays.items():
        tgt = _midas_to_hf_key(k)
        if tgt is None:
            continue
        if isinstance(tgt, tuple):  # fused qkv
            _, i, leaf = tgt
            q, kk, vv = np.split(v, 3, axis=0)
            pre = f"dpt.encoder.layer.{i}.attention.attention"
            out[f"{pre}.query.{leaf}"] = q
            out[f"{pre}.key.{leaf}"] = kk
            out[f"{pre}.value.{leaf}"] = vv
        else:
            out[tgt] = v
    return out


def convert_dpt_checkpoint(pt_path: str, npz_path: str) -> int:
    """CLI: python -m dnsplatter_tpu.priors.convert --dpt in.ckpt out.npz
    (omnidata_dpt_normal_v2.ckpt; strips the 'model.' lightning prefix
    like the reference loader, normals_from_pretrain.py:180-184)."""
    import torch  # offline tool only

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    state = {(k[6:] if k.startswith("model.") else k): v
             for k, v in state.items()}
    arrays = convert_dpt_state_dict(state)
    np.savez_compressed(npz_path, **arrays)
    return len(arrays)
