"""Fused Pallas TPU kernels for the hot Langevin updates."""

from stochquant_tpu.kernels.chain_kernel import (  # noqa: F401
    chain_frame_pallas,
    run_frames_pallas,
)
