"""Langevin integrators: 1-D chains (with collective coordinate), D-dim
fields, and complex Langevin."""

from stochquant_tpu.integrators.langevin import (  # noqa: F401
    ChainState,
    connected_correlator,
    init_chain_state,
    make_frame_fn,
    reset_means,
    run_frames,
)
