"""Batch experiment runner: dataset sweeps over scenes and flag configs.

Parity: dn_splatter/eval/batch_run.py — composes per-scene training
command lines from an experiment config and dispatches them to available
accelerators (the reference polls free GPUs with GPUtil and a thread pool,
batch_run.py:449-484). `--device-slots N` is that polling's equivalent
here: a lockfile slot pool dispatches each job as an accelerator frees
up and pins it via CUDA_VISIBLE_DEVICES / DNSPLATTER_DEVICE_SLOT —
file-based so it also coordinates device-exclusive TPU hosts sharing a
filesystem. `--jobs N` alone runs N CPU-backed jobs for smoke sweeps;
the default stays sequential.
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


class DeviceSlots:
    """Accelerator-availability dispatch (reference parity: the
    reference polls free GPUs with GPUtil before launching each job,
    batch_run.py:449-484). Accelerator occupancy is modeled as atomic
    lockfiles under `root` — O_CREAT|O_EXCL acquire, unlink release —
    which works across processes AND hosts sharing a filesystem, for
    device-exclusive TPU hosts and multi-GPU boxes alike. The acquired
    slot index is exported to the job via CUDA_VISIBLE_DEVICES (GPU
    pinning) and DNSPLATTER_DEVICE_SLOT (informational elsewhere)."""

    def __init__(self, root: Path, n_slots: int, poll_s: float = 5.0):
        self.root = root
        self.n = n_slots
        self.poll_s = poll_s
        root.mkdir(parents=True, exist_ok=True)

    def _try_reclaim(self, i: int) -> bool:
        """Reclaim a slot whose recorded owner PID is gone (hard crash /
        SIGKILL leaves the lockfile behind forever otherwise). Same-host
        only: a lockfile with an unreadable or live PID stays. Returns
        True if the stale lock was removed."""
        import os

        path = self.root / f"slot{i}.lock"
        try:
            pid = int(path.read_text().strip() or "0")
        except (OSError, ValueError):
            return False
        if pid <= 0:
            return False
        try:
            os.kill(pid, 0)
            return False  # owner alive
        except ProcessLookupError:
            pass  # owner gone: stale
        except PermissionError:
            return False  # alive under another uid
        try:
            path.unlink()
            print(f"device-slots: reclaimed slot {i} from dead pid {pid}",
                  flush=True)
            return True
        except FileNotFoundError:
            return True  # someone else reclaimed it

    def acquire(self) -> int:
        import os
        import time as _time

        waited = 0.0
        while True:
            for i in range(self.n):
                try:
                    fd = os.open(self.root / f"slot{i}.lock",
                                 os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.write(fd, str(os.getpid()).encode())
                    os.close(fd)
                    return i
                except FileExistsError:
                    if self._try_reclaim(i):
                        continue  # retry loop picks it up next pass
            _time.sleep(self.poll_s)
            waited += self.poll_s
            if waited % 60.0 < self.poll_s:
                # diagnose instead of hanging silently: name the blockers
                holders = []
                for i in range(self.n):
                    try:
                        holders.append(
                            f"slot{i}=pid "
                            f"{(self.root / f'slot{i}.lock').read_text().strip()}"
                        )
                    except OSError:
                        holders.append(f"slot{i}=free?")
                print(f"device-slots: waiting {waited:.0f}s for a free "
                      f"slot under {self.root} ({', '.join(holders)}); "
                      f"delete stale *.lock files to force-release",
                      flush=True)

    def release(self, i: int) -> None:
        try:
            (self.root / f"slot{i}.lock").unlink()
        except FileNotFoundError:
            pass


def run_scene(cmd: List[str], log_path: Path,
              slots: Optional[DeviceSlots] = None) -> int:
    import os

    log_path.parent.mkdir(parents=True, exist_ok=True)
    slot = slots.acquire() if slots is not None else None
    env = None
    if slot is not None:
        env = dict(os.environ)
        env["CUDA_VISIBLE_DEVICES"] = str(slot)
        env["DNSPLATTER_DEVICE_SLOT"] = str(slot)
    try:
        with open(log_path, "w") as log:
            proc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                                  env=env)
        return proc.returncode
    finally:
        if slot is not None:
            slots.release(slot)


def dispatch_jobs(cfg: ExperimentConfig, data_root: Path, out_root: Path,
                  scenes: List[str], jobs: int = 1,
                  device_slots: int = 0) -> Dict[str, int]:
    results: Dict[str, int] = {}
    slots = (DeviceSlots(out_root / ".slots", device_slots)
             if device_slots > 0 else None)
    if slots is not None and jobs <= 1:
        jobs = device_slots  # availability dispatch implies concurrency
    if jobs <= 1:
        for scene in scenes:
            print(f"[batch_run] {scene} ...", flush=True)
            results[scene] = run_scene(
                cfg.command(data_root, scene, out_root),
                out_root / scene / "train.log",
                slots,
            )
    else:
        with ThreadPoolExecutor(max_workers=jobs) as ex:
            futs = {
                scene: ex.submit(
                    run_scene,
                    cfg.command(data_root, scene, out_root),
                    out_root / scene / "train.log",
                    slots,
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
    p.add_argument("--device-slots", type=int, default=0,
                   help="dispatch jobs to N accelerator slots as they free "
                        "up (lockfile pool; pins CUDA_VISIBLE_DEVICES per "
                        "job — the reference's GPUtil polling equivalent)")
    p.add_argument("--max-iterations", type=int, default=30000)
    args = p.parse_args(argv)

    cfg = ExperimentConfig(
        method=args.method, dataparser=args.dataset,
        max_iterations=args.max_iterations,
    )
    scenes = args.scenes or DATASET_SCENES[args.dataset]
    results = dispatch_jobs(cfg, args.data_root, args.output_root, scenes,
                            args.jobs, device_slots=args.device_slots)
    bad = {s: c for s, c in results.items() if c != 0}
    print(f"done: {len(results) - len(bad)} ok, {len(bad)} failed {bad}")


if __name__ == "__main__":
    main()
