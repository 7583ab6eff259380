"""Worker for the REAL multi-process distributed test (2 ranks on CPU).

Launched by tests/test_distributed_multiprocess.py as
`python tests/_dist_worker.py <coordinator> <num_procs> <rank> <out_json>`.

Each rank brings up jax.distributed over localhost (gloo CPU
collectives), owns 2 local CPU devices (so the global mesh is
dp=num_procs x gauss=2), serves ONLY its host-local frame
(parallel/distributed.py:host_local_indices), and runs one hybrid DP
train step. The parent compares the reported loss across ranks and
against the degenerate single-process run of the same step — the
DDP-equivalence property the reference gets from torch DDP
(dn_pipeline.py:122-128).
"""

from __future__ import annotations

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

_TESTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TESTS))
sys.path.insert(0, _TESTS)


def run(coordinator: str, num_procs: int, rank: int) -> dict:
    # Package import is backend-free by design (see
    # models/regularization.py) so init_distributed below still precedes
    # backend initialization.
    from dnsplatter_tpu.parallel import distributed as D
    from _dist_case import build_case, run_dp_step

    ctx = D.init_distributed(
        coordinator_address=coordinator, num_processes=num_procs,
        process_id=rank,
    )
    assert ctx.process_count == num_procs, ctx
    assert ctx.process_index == rank, ctx
    assert len(jax.devices()) == 2 * num_procs, jax.devices()
    assert len(jax.local_devices()) == 2

    case = build_case(dp=num_procs)
    # Host-local data: this rank loads only its own frame shard.
    local = D.host_local_indices(num_procs, ctx)
    assert local == [rank], local
    loss, means_sum, cam_sum = run_dp_step(case, frame_indices=local)
    return {
        "rank": rank,
        "process_count": ctx.process_count,
        "is_main": ctx.is_main,
        "loss": float(loss),
        "means_sum": float(means_sum),
        "cam_sum": float(cam_sum),
    }


def main() -> None:
    coordinator, num_procs, rank, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    try:
        result = run(coordinator, num_procs, rank)
    except Exception as e:  # surface the failure to the parent
        import traceback

        result = {"rank": rank, "error": f"{e!r}",
                  "traceback": traceback.format_exc()}
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
