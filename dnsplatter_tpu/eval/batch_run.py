"""Batch experiment runner: dataset sweeps over scenes and flag configs.

Parity: dn_splatter/eval/batch_run.py — composes per-scene training
command lines from an experiment config and dispatches them to available
accelerators (the reference polls free GPUs with GPUtil and a thread pool,
batch_run.py:449-484). On TPU the device is typically exclusive per host,
so jobs default to sequential subprocesses; `--jobs N` runs N CPU-backed
jobs concurrently for smoke sweeps.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List, Optional

DATASET_SCENES: Dict[str, List[str]] = {
    # reference scene lists (batch_run.py:66-76, README tables)
    "mushroom": ["coffee_room", "honka", "kokko", "sauna", "activity",
                 "classroom"],
    "replica": ["office0", "office1", "office2", "office3", "office4",
                "room0", "room1", "room2"],
    "scannetpp": ["8b5caf3398", "b20a261fdf"],
}


@dataclasses.dataclass
class ExperimentConfig:
    """Flag bundle swept over scenes (batch_run.py:16-51)."""

    method: str = "dn-splatter"
    dataparser: str = "mushroom"
    use_depth_loss: bool = True
    depth_lambda: float = 0.2
    use_normal_loss: bool = True
    normal_lambda: float = 0.1
    normal_supervision: str = "mono"
    max_iterations: int = 30000
    extra_flags: Optional[List[str]] = None

    def command(self, data_root: Path, scene: str, out_root: Path) -> List[str]:
        cmd = [
            sys.executable, "-m", "dnsplatter_tpu.cli", "train",
            self.method, self.dataparser,
            "--data", str(data_root / scene),
            "--output-dir", str(out_root / scene),
            "--max-iterations", str(self.max_iterations),
            "--model.use-depth-loss", str(self.use_depth_loss),
            "--model.depth-lambda", str(self.depth_lambda),
            "--model.use-normal-loss", str(self.use_normal_loss),
            "--model.normal-lambda", str(self.normal_lambda),
            "--model.normal-supervision", self.normal_supervision,
        ]
        if self.extra_flags:
            cmd += self.extra_flags
        return cmd


def run_scene(cmd: List[str], log_path: Path) -> int:
    log_path.parent.mkdir(parents=True, exist_ok=True)
    with open(log_path, "w") as log:
        proc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT)
    return proc.returncode


def dispatch_jobs(cfg: ExperimentConfig, data_root: Path, out_root: Path,
                  scenes: List[str], jobs: int = 1) -> Dict[str, int]:
    results: Dict[str, int] = {}
    if jobs <= 1:
        for scene in scenes:
            print(f"[batch_run] {scene} ...", flush=True)
            results[scene] = run_scene(
                cfg.command(data_root, scene, out_root),
                out_root / scene / "train.log",
            )
    else:
        with ThreadPoolExecutor(max_workers=jobs) as ex:
            futs = {
                scene: ex.submit(
                    run_scene,
                    cfg.command(data_root, scene, out_root),
                    out_root / scene / "train.log",
                )
                for scene in scenes
            }
            for scene, fut in futs.items():
                results[scene] = fut.result()
    (out_root / "batch_results.json").write_text(json.dumps(results, indent=2))
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=sorted(DATASET_SCENES),
                   default="mushroom")
    p.add_argument("--data-root", type=Path, required=True)
    p.add_argument("--output-root", type=Path, default=Path("runs/batch"))
    p.add_argument("--scenes", nargs="*", default=None)
    p.add_argument("--method", default="dn-splatter")
    p.add_argument("--jobs", type=int, default=1)
    p.add_argument("--max-iterations", type=int, default=30000)
    args = p.parse_args(argv)

    cfg = ExperimentConfig(
        method=args.method, dataparser=args.dataset,
        max_iterations=args.max_iterations,
    )
    scenes = args.scenes or DATASET_SCENES[args.dataset]
    results = dispatch_jobs(cfg, args.data_root, args.output_root, scenes,
                            args.jobs)
    bad = {s: c for s, c in results.items() if c != 0}
    print(f"done: {len(results) - len(bad)} ok, {len(bad)} failed {bad}")


if __name__ == "__main__":
    main()
