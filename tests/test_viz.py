"""Metrics-tail client (the module previously had zero coverage — r2 weak
item 7): incremental polling, partial-line tolerance, handle lifecycle."""

import json

from stochquant_tpu.viz import MetricsTail


def _frame(i, n=4):
    return json.dumps(
        {
            "type": "frame",
            "frame": i,
            "percent": 100.0 * (i + 1) / 10,
            "dtau": 0.01,
            "log_abs_corr": [float(i)] * n,
        }
    )


def test_metrics_tail_polls_incrementally(tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text(_frame(0) + "\n" + _frame(1) + "\n")
    with MetricsTail(str(p)) as tail:
        rec = tail.poll()
        assert rec["frame"] == 1  # newest complete frame wins
        assert tail.poll() is None  # nothing new

        # simulation appends; next poll sees it
        with open(p, "a") as fh:
            fh.write(_frame(2) + "\n")
        assert tail.poll()["frame"] == 2


def test_metrics_tail_tolerates_partial_lines(tmp_path):
    p = tmp_path / "m.jsonl"
    full = _frame(0) + "\n"
    partial = _frame(1)
    p.write_text(full + partial[: len(partial) // 2])
    with MetricsTail(str(p)) as tail:
        assert tail.poll()["frame"] == 0
        # writer completes the line: the rewound reader picks it up whole
        with open(p, "a") as fh:
            fh.write(partial[len(partial) // 2 :] + "\n")
        assert tail.poll()["frame"] == 1


def test_metrics_tail_skips_non_frame_records(tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text(
        json.dumps({"type": "summary", "avg_mlups": 1.0})
        + "\n"
        + _frame(3)
        + "\n"
    )
    with MetricsTail(str(p)) as tail:
        assert tail.poll()["frame"] == 3


def test_metrics_tail_close_releases_handle(tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text(_frame(0) + "\n")
    tail = MetricsTail(str(p))
    tail.poll()
    tail.close()
    assert tail._fh.closed
