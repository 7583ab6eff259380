"""Convert the published DSINE torch checkpoint to the JAX npz format.

Usage:
    python -m dnsplatter_tpu.priors.convert dsine.pt dsine.npz

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
    if len(argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    n = convert_checkpoint(argv[0], argv[1])
    print(f"wrote {argv[1]}: {n} tensors")


if __name__ == "__main__":
    main()
