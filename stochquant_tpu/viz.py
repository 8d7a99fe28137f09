"""Live visualization client — capability parity with the reference's
matplotlib animation (``taumain.py:51-89``), consuming the JSON-lines
metrics stream instead of a '|'-delimited stdout pipe.

The reference couples simulation and plotting in one process pair; here the
simulation writes metrics to a file (``cli.py run --metrics run.jsonl``) and
any number of plot clients tail it (``cli.py plot --follow run.jsonl``).
"""

from __future__ import annotations

import json


def live_plot(path: str, poll_s: float = 0.5):
    """Tail a metrics .jsonl file and animate log|C(t)| (the quantity whose
    slope gives the energy gap, streamed by tauhost.c:491)."""
    import matplotlib.pyplot as plt
    from matplotlib import animation

    fig, ax = plt.subplots()
    (ln,) = ax.plot([], [], "ro-", markersize=2)
    txt = ax.text(0.02, 0.95, "", transform=ax.transAxes)
    state = {"pos": 0, "y": None}

    fh = open(path)

    def poll():
        last = None
        while True:
            line = fh.readline()
            if not line:
                break
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                break  # partial line; retry next poll
            if rec.get("type") == "frame" and "log_abs_corr" in rec:
                last = rec
        return last

    def update(_):
        rec = poll()
        if rec is not None:
            y = rec["log_abs_corr"]
            ln.set_data(range(len(y)), y)
            ax.relim()
            ax.autoscale_view()
            txt.set_text(
                f"{rec['percent']:.1f}%  Δτ={rec['dtau']:.2e}  "
                f"{rec.get('mlups', 0):.0f} MLUPS"
            )
        return ln, txt

    ani = animation.FuncAnimation(fig, update, interval=int(poll_s * 1000))
    plt.xlabel("site")
    plt.ylabel("log |C(t)|")
    plt.show()
    return ani
