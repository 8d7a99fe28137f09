"""Test harness: force an 8-device virtual CPU mesh.

Multi-device tests (sharded-vs-unsharded bitwise equality, halo exchange)
run against these fake devices — no TPU pod needed (SURVEY.md §4).

The container's sitecustomize registers a TPU-tunnel PJRT plugin and
programmatically pins ``jax_platforms='axon,cpu'`` — with every XLA compile
round-tripping a remote compile service (~10-20s each).  Tests are CPU-only:
force the platform back to local CPU *before* backends initialise.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# fp64 available on CPU for exact-answer cross-checks; framework code pins
# its own dtypes explicitly (cfg.dtype), so this only affects test math.
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: makes reruns near-instant.  NOTE: a cache dir
# of its own — bench.py's TPU-tunnel runs share their process with a remote
# compile service that can deposit artifacts compiled for the *service's*
# CPU into the cache; loading those locally is at best a warning storm and
# at worst silently wrong results (observed in r3: a cross-machine AOT
# entry perturbed a bitwise test).  Keep the CPU test cache separate.
_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu",
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()} — XLA_FLAGS was "
    "read before conftest could set it"
)
