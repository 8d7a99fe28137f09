"""Runtime driver + CLI + metrics smoke tests (CPU, tiny configs)."""

import json

import numpy as np

from stochquant_tpu import cli, metrics, runtime
from stochquant_tpu.config import ChainConfig, FieldConfig


def test_run_chain_with_metrics_and_checkpoint(tmp_path):
    cfg = ChainConfig(
        action="harmonic", n_sites=16, dt=0.2, dtau=1e-3, n_chains=4,
        loops=10, frames=4, fps=2, seed=1,
    )
    mpath = tmp_path / "m.jsonl"
    ck = tmp_path / "ck.npz"
    with open(mpath, "w") as fh:
        sink = metrics.MetricsSink(stream=fh)
        res = runtime.run_chain(cfg, backend="xla", sink=sink, checkpoint_out=str(ck), burn_frames=1)
    recs = [json.loads(l) for l in open(mpath)]
    frames = [r for r in recs if r["type"] == "frame"]
    assert len(frames) == 2  # 4 frames / fps=2
    assert frames[-1]["percent"] == 100.0
    assert "log_abs_corr" in frames[-1] and len(frames[-1]["log_abs_corr"]) == 16
    assert recs[-1]["type"] == "summary" and recs[-1]["total_site_updates"] > 0
    assert ck.exists()

    # resume from checkpoint through the runtime
    cfg2 = ChainConfig(**{**cfg.__dict__, "frames": 2})
    res2 = runtime.run_chain(cfg2, backend="xla", checkpoint_in=str(ck),
                             sink=metrics.MetricsSink())
    assert int(np.asarray(res2.state.step)) > int(np.asarray(res.state.step)) - 1


def test_run_field_smoke():
    cfg = FieldConfig(
        action="phi4", shape=(8, 8), dtau=0.01, n_chains=2, loops=5,
        frames=2, seed=2,
    )
    res = runtime.run_field(cfg, sink=metrics.MetricsSink())
    assert res.summary["total_site_updates"] == 2 * 64 * 5 * 2


def test_cli_run_and_reference_import(tmp_path, capsys):
    m = tmp_path / "run.jsonl"
    ck = tmp_path / "out.npz"
    cli.main([
        "run", "--preset", "harmosc", "--frames", "2", "--loops", "5",
        "--chains", "2", "--dtau", "1e-3", "--backend", "xla",
        "--metrics", str(m), "--out", str(ck),
    ])
    assert ck.exists() and m.exists()

    # export a reference-format file then import it via the CLI
    from stochquant_tpu.io import checkpoint as ckpt
    from stochquant_tpu.config import PRESETS

    state, cfg = ckpt.load(ck)
    ref = tmp_path / "ref.txt"
    ckpt.export_reference(ref, state)
    out = tmp_path / "imported.npz"
    cli.main([
        "reference-import", "--file", str(ref), "--preset", "harmosc",
        "--out", str(out),
    ])
    assert out.exists()
    st2, _ = ckpt.load(out)
    assert st2.f.shape[1] == PRESETS["harmosc"].n_sites


def test_cli_complex_preset(tmp_path):
    m = tmp_path / "cl.jsonl"
    cli.main([
        "run", "--preset", "complex_gaussian", "--frames", "2", "--loops", "5",
        "--chains", "8", "--metrics", str(m),
    ])
    recs = [json.loads(l) for l in open(m)]
    frames = [r for r in recs if r["type"] == "frame"]
    assert frames and "re_z2" in frames[-1]


def test_preemption_stop_checkpoints_and_resume_is_bitwise(tmp_path):
    """stop tripping after 2 of 4 frames must checkpoint; --auto-resume-style
    continuation (resume_progress) must reproduce the uninterrupted run
    bitwise (full-state checkpoints incl. RNG step make this exact)."""
    from stochquant_tpu.actions import get
    from stochquant_tpu.integrators import langevin

    cfg = ChainConfig(
        action="harmonic", n_sites=16, dt=0.2, dtau=1e-3, n_chains=4,
        loops=10, frames=4, seed=3,
    )
    act = get(cfg.action)
    full, _ = langevin.run_frames(langevin.init_chain_state(cfg, act), act, cfg, 4)

    ck = tmp_path / "pre.npz"
    calls = {"n": 0}

    def stop():
        calls["n"] += 1
        return calls["n"] >= 2  # trip at the end of frame 2

    m = tmp_path / "m.jsonl"
    with open(m, "w") as fh:
        runtime.run_chain(
            cfg, backend="xla", sink=metrics.MetricsSink(stream=fh),
            checkpoint_out=str(ck), stop=stop,
        )
    recs = [json.loads(l) for l in open(m)]
    assert any(r["type"] == "preempted" and r["frames_done"] == 2 for r in recs)
    assert ck.exists()

    res = runtime.run_chain(
        cfg, backend="xla", sink=metrics.MetricsSink(),
        checkpoint_in=str(ck), resume_progress=True,
    )
    for got, want in zip(res.state, full):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_preemption_guard_catches_sigterm():
    import os
    import signal

    with runtime.PreemptionGuard() as g:
        assert not g()
        os.kill(os.getpid(), signal.SIGTERM)
        assert g()  # handler set the flag instead of killing the process
    # original disposition restored on exit
    assert signal.getsignal(signal.SIGTERM) != g._handler


def test_cli_auto_resume_requires_out():
    import pytest

    with pytest.raises(SystemExit):
        cli.main(["run", "--preset", "harmosc", "--auto-resume"])


def test_cli_auto_resume_continues(tmp_path):
    ck = tmp_path / "ar.npz"
    m1 = tmp_path / "a.jsonl"
    cli.main([
        "run", "--preset", "harmosc", "--frames", "2", "--loops", "5",
        "--chains", "2", "--dtau", "1e-3", "--backend", "xla",
        "--metrics", str(m1), "--out", str(ck), "--auto-resume",
    ])
    m2 = tmp_path / "b.jsonl"
    cli.main([
        "run", "--preset", "harmosc", "--frames", "4", "--loops", "5",
        "--chains", "2", "--dtau", "1e-3", "--backend", "xla",
        "--metrics", str(m2), "--out", str(ck), "--auto-resume",
    ])
    recs = [json.loads(l) for l in open(m2)]
    frames = [r for r in recs if r["type"] == "frame"]
    # first invocation did 2 of 4; the auto-resumed one only runs the rest
    assert len(frames) == 2 and frames[-1]["percent"] == 100.0


def test_cli_complex_chain_preset(tmp_path):
    m = tmp_path / "ccl.jsonl"
    cli.main([
        "run", "--preset", "complex_chain", "--frames", "2", "--loops", "4",
        "--chains", "4", "--metrics", str(m),
    ])
    recs = [json.loads(l) for l in open(m)]
    assert any(r["type"] == "summary" for r in recs)


def test_cli_gauge_measure_loops(tmp_path):
    import json

    from stochquant_tpu import cli

    mfile = tmp_path / "g.jsonl"
    cli.main([
        "run", "--preset", "u1_2d", "--frames", "2", "--loops", "4",
        "--chains", "4", "--measure-loops", "--metrics", str(mfile),
    ])
    recs = [json.loads(l) for l in mfile.read_text().splitlines()]
    frames = [r for r in recs if r["type"] == "frame"]
    assert frames and all("polyakov_re" in f for f in frames)
    tables = [r for r in recs if r["type"] == "wilson_loops"]
    assert len(tables) == 1
    w = tables[0]["w"]
    assert len(w) == 4 and len(w[0]) == 4  # rmax=4 on the 16x16 preset
