"""Batch runner: command assembly + accelerator-slot dispatch.

Reference parity target: dn_splatter/eval/batch_run.py — flag-bundle
sweeps over scene lists with free-accelerator polling (GPUtil,
batch_run.py:449-484). The slot pool here is lockfile-based (works for
device-exclusive TPU hosts and multi-GPU boxes alike)."""

import json
import sys
import time
from pathlib import Path

from dnsplatter_tpu.eval.batch_run import (
    DATASET_SCENES,
    DeviceSlots,
    ExperimentConfig,
    dispatch_jobs,
)


def test_command_assembly(tmp_path):
    cfg = ExperimentConfig(dataparser="mushroom", depth_lambda=0.5,
                           extra_flags=["--train.backend", "xla"])
    cmd = cfg.command(tmp_path / "data", "coffee_room", tmp_path / "out")
    joined = " ".join(cmd)
    assert "coffee_room" in joined
    assert "--model.depth-lambda 0.5" in joined
    assert joined.endswith("--train.backend xla")
    assert len(DATASET_SCENES["mushroom"]) == 6


def test_device_slot_dispatch_bounds_concurrency(tmp_path, monkeypatch):
    """4 jobs over 2 slots: at no instant may more than 2 run, every job
    gets a distinct pinned slot while it runs, and all jobs finish."""
    out_root = tmp_path / "out"
    # Fake "scenes": each job records (start, end, slot) then sleeps.
    script = tmp_path / "job.py"
    script.write_text(
        "import json, os, sys, time\n"
        "t0 = time.time(); time.sleep(0.5)\n"
        "json.dump({'t0': t0, 't1': time.time(),\n"
        "           'slot': os.environ.get('DNSPLATTER_DEVICE_SLOT')},\n"
        "          open(sys.argv[1], 'w'))\n"
    )

    class FakeCfg:
        def command(self, data_root, scene, out_root):
            return [sys.executable, str(script),
                    str(out_root / scene / "span.json")]

    scenes = [f"s{i}" for i in range(4)]
    results = dispatch_jobs(FakeCfg(), tmp_path / "d", out_root, scenes,
                            jobs=4, device_slots=2)
    assert all(c == 0 for c in results.values())
    spans = [json.load(open(out_root / s / "span.json")) for s in scenes]
    # max concurrency over all span endpoints <= 2
    for s in spans:
        overlap = sum(
            1 for o in spans if o["t0"] < s["t1"] and o["t1"] > s["t0"]
        )
        assert overlap <= 2, spans
    assert all(s["slot"] in {"0", "1"} for s in spans)
    # the lock pool drained
    assert not list((out_root / ".slots").glob("*.lock"))


def test_slot_pool_blocks_until_release(tmp_path):
    slots = DeviceSlots(tmp_path, 1, poll_s=0.05)
    i = slots.acquire()
    assert i == 0
    t0 = time.time()
    got = {}

    import threading

    def taker():
        got["i"] = slots.acquire()

    th = threading.Thread(target=taker)
    th.start()
    time.sleep(0.2)
    assert "i" not in got  # still blocked
    slots.release(i)
    th.join(timeout=5)
    assert got.get("i") == 0
    assert time.time() - t0 >= 0.2
    slots.release(0)


def test_stale_lock_from_dead_pid_is_reclaimed(tmp_path):
    """A hard-crashed job (SIGKILL/OOM) leaves its lockfile behind; the
    pool must reclaim it by PID liveness instead of hanging forever
    (ADVICE r4)."""
    import subprocess

    # a real PID that is certainly dead: a finished child process
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    proc.wait()
    dead_pid = proc.pid
    (tmp_path / "slot0.lock").write_text(str(dead_pid))
    slots = DeviceSlots(tmp_path, 1, poll_s=0.05)
    t0 = time.time()
    i = slots.acquire()
    assert i == 0
    assert time.time() - t0 < 5.0  # reclaimed, not stuck polling
    # the new lock records OUR pid now
    import os
    assert (tmp_path / "slot0.lock").read_text().strip() == str(os.getpid())
    slots.release(0)


def test_live_lock_is_not_reclaimed(tmp_path):
    """A lockfile whose recorded PID is alive must NOT be stolen."""
    import os
    (tmp_path / "slot0.lock").write_text(str(os.getpid()))
    slots = DeviceSlots(tmp_path, 1, poll_s=0.05)
    assert slots._try_reclaim(0) is False
    assert (tmp_path / "slot0.lock").exists()
