"""stochquant_tpu — a TPU-native stochastic-quantization (Parisi–Wu Langevin)
framework.

Built from scratch against the capabilities of the OpenCL reference
``SebTanz/StochQuant`` (see SURVEY.md): lattice Langevin simulation of
Euclidean path integrals — 1-D quantum mechanics (harmonic, anharmonic,
double-well with instanton background + collective coordinate) and D-dim
scalar φ⁴ field theory — with device-side observables, adaptive step-size
control, full-state checkpointing, batched-chain data parallelism and
shard_map lattice domain decomposition with halo exchange over ICI.

Compute path: JAX/XLA with fused Pallas TPU kernels for the hot update.
Runtime helpers (reference-format codec, exact-reference oracle) live in a
small C++ library under ``stochquant_tpu/cc``.
"""

from stochquant_tpu import rng  # noqa: F401
from stochquant_tpu.config import (  # noqa: F401
    BoundaryCondition,
    ChainConfig,
    FieldConfig,
    Formulation,
    PRESETS,
    Scheme,
    Sweep,
)

__version__ = "0.1.0"
