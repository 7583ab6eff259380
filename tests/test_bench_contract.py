"""bench.py output contract: exactly one JSON line on stdout, and a
train-step measurement failure must surface as an explicit null +
"train_error_1m" — never as a readable 0.0 (VERDICT r4 weak #5)."""

import io
import json
import contextlib

import bench


def _run_main(monkeypatch, train_result):
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(bench, "parity_check", lambda: "pass(rel=0.0e+00)")
    monkeypatch.setattr(bench, "measure",
                        lambda backend, **kw: (10.0, backend))
    monkeypatch.setattr(bench, "measure_train_1m", lambda: train_result)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, f"bench must print exactly one line: {lines}"
    return json.loads(lines[0])

def test_train_failure_reports_null_and_error(monkeypatch):
    row = _run_main(monkeypatch, (None, None, "RuntimeError: boom"))
    assert row["train_ms_step_1m"] is None
    assert row["train_capacity_1m"] is None
    assert row["train_error_1m"] == "RuntimeError: boom"
    assert row["backend"] == "pallas"


def test_train_success_reports_ms_and_capacity(monkeypatch):
    row = _run_main(monkeypatch, (153.2, 1_253_376, None))
    assert row["train_ms_step_1m"] == 153.2
    assert row["train_capacity_1m"] == 1_253_376
    assert "train_error_1m" not in row
    assert row["vs_baseline"] == round(10.0 / bench.NOMINAL_GSPLAT_MPIX_S, 4)
