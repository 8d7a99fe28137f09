"""The bench.py regression gate must fire against driver-written BENCH files.

VERDICT r4 weak #1: the gate compared keys at the TOP level of the previous
BENCH_r*.json, but the driver nests every metric under ``"parsed"`` — so two
rounds of >15% drops shipped unflagged.  These tests plant a regression in
both file layouts and require the gate to catch it.
"""

import importlib.util
import json
import os
import sys

import pytest

_BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
)


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_module"] = mod
    spec.loader.exec_module(mod)
    return mod


def _result(**over):
    base = {k: 100.0 for k in (
        "value", "threefry_mlups", "config2_anharmonic_mlups",
        "field_runtime_pallas_mlups", "u1_gauge_kernel_mlups",
        "su2_gauge_kernel_mlups", "su3_gauge_kernel_mlups",
        "nd4d_kernel_mlups", "halo_pallas_pair_mlups",
        "config2_multiframe_k8_mlups",
    )}
    base.update(over)
    return base


def test_gate_fires_on_driver_nested_layout(bench, tmp_path):
    """Planted regression inside a driver-style {"parsed": {...}} file."""
    prev = tmp_path / "BENCH_r07.json"
    prev.write_text(json.dumps({
        "n": 7, "cmd": "python bench.py", "rc": 0, "tail": "...",
        "parsed": _result(field_runtime_pallas_mlups=1000.0),
    }))
    now = _result(field_runtime_pallas_mlups=700.0)  # 0.70x < 0.85 threshold
    regs = bench.check_regressions(now, prev_path=str(prev))
    assert regs == {
        "field_runtime_pallas_mlups":
            {"prev": 1000.0, "now": 700.0, "ratio": 0.7}
    }


def test_gate_fires_on_flat_layout(bench, tmp_path):
    """Locally-written bare metric dicts still work (fallback layout)."""
    prev = tmp_path / "BENCH_r01.json"
    prev.write_text(json.dumps(_result(value=50000.0)))
    regs = bench.check_regressions(_result(value=10000.0),
                                   prev_path=str(prev))
    assert "value" in regs and regs["value"]["ratio"] == 0.2


def test_gate_quiet_when_no_regression(bench, tmp_path):
    prev = tmp_path / "BENCH_r02.json"
    prev.write_text(json.dumps({"parsed": _result()}))
    assert bench.check_regressions(_result(value=95.0),
                                   prev_path=str(prev)) == {}


def test_every_regression_key_exists_in_emitted_record(bench):
    """VERDICT r4 weak #1 bonus bug: _REGRESSION_KEYS listed
    ``halo_pair_mlups`` but the record emits ``halo_pallas_pair_mlups`` —
    a silently dead entry.  Pin the key list to keys the worker emits
    (checked against the r4 driver record's parsed keys)."""
    with open(os.path.join(os.path.dirname(_BENCH), "BENCH_r04.json")) as f:
        emitted = set(json.load(f)["parsed"])
    missing = [k for k in bench._REGRESSION_KEYS if k not in emitted]
    assert not missing, f"regression keys never emitted by the worker: {missing}"


def test_gate_tolerates_unreadable_prev(bench, tmp_path):
    prev = tmp_path / "BENCH_r03.json"
    prev.write_text("{not json")
    assert bench.check_regressions(_result(), prev_path=str(prev)) == {}
