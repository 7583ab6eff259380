"""Command-line interface: train / eval / export / render.

The reference registers into nerfstudio's CLI (`ns-train dn-splatter
<dataparser> --data ...`, `ns-eval`, `gs-mesh <mode>`); this framework is
self-contained, so the same surface lives here:

    python -m dnsplatter_tpu.cli train dn-splatter normal-nerfstudio \
        --data <dir> --output-dir runs/exp --model.use-depth-loss true
    python -m dnsplatter_tpu.cli eval --checkpoint runs/exp/ckpt_030000.npz \
        --method dn-splatter --dataparser normal-nerfstudio --data <dir>
    python -m dnsplatter_tpu.cli export tsdf --checkpoint ... --data ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

from dnsplatter_tpu.configs import (
    METHOD_PRESETS,
    add_dataclass_args,
    build_dataclass,
    model_config_for_method,
)
from dnsplatter_tpu.models.dn_model import ModelConfig
from dnsplatter_tpu.train.optim import OptimConfig
from dnsplatter_tpu.train.trainer import TrainConfig, Trainer


def _parser_config_cls(name: str):
    """The dataparser's sibling *ParserConfig dataclass (or None)."""
    from dnsplatter_tpu.data.parsers import get_parser

    parse = get_parser(name)
    import inspect

    # deterministic config discovery: prefer the parse function's own
    # signature annotation; fall back to the *ParserConfig dataclass
    # DEFINED in that module (module filter: imported sibling configs
    # must not win on dict order)
    sig = inspect.signature(parse)
    first = next(iter(sig.parameters.values()), None)
    if first is not None and dataclasses.is_dataclass(first.annotation):
        return parse, first.annotation
    mod = sys.modules[parse.__module__]
    for obj in vars(mod).values():
        if (
            isinstance(obj, type)
            and dataclasses.is_dataclass(obj)
            and obj.__name__.endswith("ParserConfig")
            and obj.__module__ == parse.__module__
        ):
            return parse, obj
    return parse, None


def _add_parser_args(p, argv):
    """Two-stage parse: resolve the dataparser from argv, then expose its
    config fields as `--parser.x` flags (the reference exposes dataparser
    flags through nerfstudio's CLI the same way). Returns the config
    class (or None)."""
    pre, _ = p.parse_known_args(argv)
    try:
        _, cfg_cls = _parser_config_cls(pre.dataparser)
    except Exception:
        return None
    if cfg_cls is not None:
        add_dataclass_args(p, cfg_cls, "parser")
    return cfg_cls


def _load_dataset(name: str, data: Path, split: str, cfg=None):
    parse, cfg_cls = _parser_config_cls(name)
    if cfg is None:
        cfg = cfg_cls(data=data) if cfg_cls else None
    return parse(cfg, split)


def cmd_train(argv):
    from dnsplatter_tpu.baselines.runner import BASELINE_METHODS
    from dnsplatter_tpu.configs import load_method_plugins

    load_method_plugins()  # installed third-party methods join the choices
    p = argparse.ArgumentParser(prog="train")
    p.add_argument("method", choices=sorted(METHOD_PRESETS)
                   + sorted(BASELINE_METHODS))
    p.add_argument("dataparser")
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, default=Path("runs/default"))
    p.add_argument("--max-iterations", type=int, default=None)
    p.add_argument("--resume", type=Path, default=None,
                   help="checkpoint .npz to resume from (continues to "
                        "max-iterations total steps)")
    add_dataclass_args(p, ModelConfig, "model")
    add_dataclass_args(p, TrainConfig, "train")
    add_dataclass_args(p, OptimConfig, "optim")
    parser_cls = _add_parser_args(p, argv)
    args = p.parse_args(argv)

    if args.method in BASELINE_METHODS:
        # Baseline models (the reference's gnerfacto/gdepthfacto/
        # gneusfacto MethodSpecifications, eval_configs.py:29-160) train
        # through the ray-batch runner instead of the splatter Trainer.
        from dnsplatter_tpu.baselines.runner import train_baseline

        parser_cfg = (build_dataclass(parser_cls, args, "parser",
                                      parser_cls(data=args.data))
                      if parser_cls else None)
        data = _load_dataset(args.dataparser, args.data, "train",
                             cfg=parser_cfg)
        train_cfg = build_dataclass(TrainConfig, args, "train", TrainConfig())
        steps = (args.max_iterations if args.max_iterations is not None
                 else train_cfg.max_iterations)
        train_baseline(args.method, data, num_steps=steps,
                       out_dir=args.output_dir, seed=train_cfg.seed)
        return

    base_model = model_config_for_method(args.method)
    model_cfg = build_dataclass(ModelConfig, args, "model", base_model)
    train_cfg = build_dataclass(TrainConfig, args, "train", TrainConfig())
    optim_cfg = build_dataclass(OptimConfig, args, "optim", OptimConfig())
    if args.max_iterations is not None:
        train_cfg = dataclasses.replace(
            train_cfg, max_iterations=args.max_iterations
        )

    if train_cfg.distributed or train_cfg.dp > 1:
        # Multi-process bring-up must precede ANY backend initialization
        # (dataset loading and the trainer's pair-capacity audit run JAX
        # computations; jax.distributed.initialize rejects a live
        # backend). Idempotent — the Trainer re-uses this context.
        from dnsplatter_tpu.parallel import distributed as D

        D.init_distributed(require_multiprocess=train_cfg.distributed)

    parser_cfg = (build_dataclass(parser_cls, args, "parser",
                                  parser_cls(data=args.data))
                  if parser_cls else None)
    data = _load_dataset(args.dataparser, args.data, "train", cfg=parser_cfg)
    trainer = Trainer(
        data=data,
        seed_points=data.seed() if hasattr(data, "seed") else None,
        model_cfg=model_cfg,
        optim_cfg=optim_cfg,
        train_cfg=train_cfg,
        out_dir=args.output_dir,
    )
    if args.resume:
        trainer.load_checkpoint(args.resume)
        print(f"resumed {args.resume} at step {trainer.step}", flush=True)
        trainer.train(
            num_steps=max(0, train_cfg.max_iterations - trainer.step)
        )
    else:
        trainer.train()
    print(f"checkpoint: {trainer.save_checkpoint()}")


def cmd_eval(argv):
    p = argparse.ArgumentParser(prog="eval")
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--method", default="dn-splatter")
    p.add_argument("--dataparser", default="normal-nerfstudio")
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--output-dir", type=Path, default=None)
    p.add_argument("--save-renders", action="store_true")
    p.add_argument("--lpips-weights", type=Path, default=None)
    p.add_argument("--pair-capacity", type=int, default=1 << 21,
                   help="intersection-list capacity for eval renders")
    parser_cls = _add_parser_args(p, argv)
    args = p.parse_args(argv)

    from dnsplatter_tpu.eval.evaluator import evaluate
    from dnsplatter_tpu.train.trainer import load_checkpoint_arrays

    params, alive, step = load_checkpoint_arrays(args.checkpoint)
    parser_cfg = (build_dataclass(parser_cls, args, "parser",
                                  parser_cls(data=args.data))
                  if parser_cls else None)
    data = _load_dataset(args.dataparser, args.data, args.split,
                         cfg=parser_cfg)
    lpips_fn = None
    if args.lpips_weights:
        from dnsplatter_tpu.eval.metrics import lpips_from_npz

        lpips_fn = lpips_from_npz(args.lpips_weights)
    metrics = evaluate(
        params, alive, data,
        model_cfg=model_config_for_method(args.method),
        pair_capacity=args.pair_capacity,
        lpips_fn=lpips_fn,
        output_dir=args.output_dir,
        save_renders=args.save_renders,
    )
    print(json.dumps(metrics, indent=2))


def cmd_export(argv):
    p = argparse.ArgumentParser(prog="export")
    p.add_argument("mode", choices=["tsdf", "o3dtsdf", "dn", "gaussians",
                                    "sugar-coarse", "marching", "isofusion"])
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--method", default="dn-splatter")
    p.add_argument("--dataparser", default="normal-nerfstudio")
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, default=Path("exports"))
    p.add_argument("--voxel-size", type=float, default=0.01)
    p.add_argument("--resolution", type=int, default=256)
    # Poisson grid for dn/gaussians (reference: Open3D depth 9 ~ 512^3
    # adaptive, export_mesh.py:294-298). Above 192 the CG solver engages
    # (f32 dense grid; 384 on a room needs a TPU-class device).
    p.add_argument("--poisson-resolution", type=int, default=192)
    parser_cls = _add_parser_args(p, argv)
    args = p.parse_args(argv)

    from dnsplatter_tpu.mesh import exporters as E
    from dnsplatter_tpu.train.trainer import load_checkpoint_arrays

    params, alive, _ = load_checkpoint_arrays(args.checkpoint)
    parser_cfg = (build_dataclass(parser_cls, args, "parser",
                                  parser_cls(data=args.data))
                  if parser_cls else None)
    data = _load_dataset(args.dataparser, args.data, "train",
                         cfg=parser_cfg)
    model_cfg = model_config_for_method(args.method)

    if args.mode in ("tsdf", "o3dtsdf"):
        # o3dtsdf mirrors Open3DTSDFFusion's connected-component cleanup
        # (export_mesh.py:1026-1039); plain tsdf (vdbfusion role) does not
        cfg = E.TSDFExportConfig(voxel_size=args.voxel_size,
                                 cleanup_clusters=args.mode == "o3dtsdf")
        out = E.export_tsdf(params, alive, data, args.output_dir, model_cfg,
                            cfg)
    elif args.mode == "dn":
        out = E.export_dn(params, alive, data, args.output_dir, model_cfg,
                          poisson_resolution=args.poisson_resolution)
    elif args.mode == "gaussians":
        out = E.export_gaussians(params, alive, data, args.output_dir,
                                 poisson_resolution=args.poisson_resolution)
    elif args.mode == "sugar-coarse":
        out = E.export_sugar_coarse(params, alive, data, args.output_dir,
                                    model_cfg)
    elif args.mode == "isofusion":
        out = E.export_isofusion(params, alive, data, args.output_dir,
                                 model_cfg, voxel_size=args.voxel_size)
    else:
        out = E.export_marching(params, alive, data, args.output_dir,
                                resolution=args.resolution)
    print(f"exported: {out}")


def cmd_render(argv):
    """Dump rgb/depth/normal renders for a checkpoint (reference
    scripts/render_model.py role)."""
    from dnsplatter_tpu.scripts import render_model

    render_model.main(argv)


def gs_mesh_main():
    """Console script `gs-mesh <mode> --checkpoint ... --data ...` — the
    reference's mesh-export entry point (pyproject.toml:44-46,
    export_mesh.py:1050-1066) as a standalone command."""
    cmd_export(sys.argv[1:])


def main():
    cmds = {"train": cmd_train, "eval": cmd_eval, "export": cmd_export,
            "render": cmd_render}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(f"usage: python -m dnsplatter_tpu.cli {{{'|'.join(cmds)}}} ...")
        sys.exit(2)
    cmds[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    main()
