"""RNG tests: Threefry known-answer vectors, Gaussian moments, and the
layout-invariance property that underpins all distributed testing."""

import jax
import jax.numpy as jnp
import numpy as np

from stochquant_tpu import rng


def test_threefry_known_answer_vectors():
    # Random123 v1.09 kat_vectors for threefry2x32, 20 rounds.
    cases = [
        ((0x00000000, 0x00000000), (0x00000000, 0x00000000), (0x6B200159, 0x99BA4EFE)),
        ((0xFFFFFFFF, 0xFFFFFFFF), (0xFFFFFFFF, 0xFFFFFFFF), (0x1CB996FC, 0xBB002BE7)),
        ((0x13198A2E, 0x03707344), (0x243F6A88, 0x85A308D3), (0xC4923A9C, 0x483DF7A0)),
    ]
    for (k0, k1), (c0, c1), (e0, e1) in cases:
        r0, r1 = rng.threefry2x32(
            jnp.uint32(k0), jnp.uint32(k1), jnp.uint32(c0), jnp.uint32(c1)
        )
        assert int(r0) == e0 and int(r1) == e1, (
            f"threefry({k0:#x},{k1:#x};{c0:#x},{c1:#x}) = "
            f"({int(r0):#x},{int(r1):#x}) != ({e0:#x},{e1:#x})"
        )


def test_uniform_open_interval():
    u = rng.uniform_from_bits(jnp.arange(0, 2**32, 2**20, dtype=jnp.uint32))
    assert float(jnp.min(u)) > 0.0
    assert float(jnp.max(u)) < 1.0


def test_normal_moments():
    z = rng.normal_for_shape(seed=7, stream=rng.Stream.FIELD, step=3, shape=(64, 4096))
    z = np.asarray(z, np.float64)
    n = z.size
    mean = z.mean()
    var = z.var()
    skew = ((z - mean) ** 3).mean() / var**1.5
    kurt = ((z - mean) ** 4).mean() / var**2 - 3.0
    # standard errors: mean ~ 1/sqrt(n), var ~ sqrt(2/n), skew ~ sqrt(6/n), kurt ~ sqrt(24/n)
    assert abs(mean) < 5 / np.sqrt(n)
    assert abs(var - 1.0) < 5 * np.sqrt(2.0 / n)
    assert abs(skew) < 5 * np.sqrt(6.0 / n)
    assert abs(kurt) < 5 * np.sqrt(24.0 / n)


def test_streams_and_steps_independent():
    a = rng.normal_for_shape(seed=1, stream=rng.Stream.FIELD, step=0, shape=(8, 128))
    b = rng.normal_for_shape(seed=1, stream=rng.Stream.COLLECTIVE, step=0, shape=(8, 128))
    c = rng.normal_for_shape(seed=1, stream=rng.Stream.FIELD, step=1, shape=(8, 128))
    d = rng.normal_for_shape(seed=2, stream=rng.Stream.FIELD, step=0, shape=(8, 128))
    for other in (b, c, d):
        assert not np.allclose(np.asarray(a), np.asarray(other))
    corr = np.corrcoef(np.asarray(a).ravel(), np.asarray(c).ravel())[0, 1]
    assert abs(corr) < 0.1


def test_block_generation_matches_global():
    """A shard generating its block (with offsets) reproduces the exact slice
    of the globally generated field — bitwise."""
    full = rng.normal_for_shape(seed=11, stream=rng.Stream.FIELD, step=5, shape=(4, 16, 24))
    # shard: chains [2:4), lattice rows [8:16), cols [12:24)
    block = rng.normal_for_shape(
        seed=11,
        stream=rng.Stream.FIELD,
        step=5,
        shape=(2, 8, 12),
        global_lattice_shape=(16, 24),
        chain_offset=2,
        lattice_offsets=(8, 12),
    )
    np.testing.assert_array_equal(np.asarray(full)[2:4, 8:16, 12:24], np.asarray(block))


def test_global_site_index_strided_block():
    ids = rng.global_site_index((2, 3), (8, 10), offsets=(4, 7))
    expect = np.array([[4 * 10 + 7 + j for j in range(3)] for _ in range(1)])
    expect = np.stack([expect[0], expect[0] + 10])
    np.testing.assert_array_equal(np.asarray(ids), expect.astype(np.uint32))


def test_threefry13_reduced_round_variant():
    """rounds=13 (Random123's BigCrush-passing minimum): the generic-loop
    refactor must keep the 20-round output identical to the KAT-pinned
    default, and 13 rounds must be a genuinely different, still
    uniform-quality stream."""
    import numpy as np

    from stochquant_tpu import rng

    c0 = jnp.arange(1 << 14, dtype=jnp.uint32)
    c1 = jnp.zeros_like(c0)
    a20, b20 = rng.threefry2x32(jnp.uint32(7), jnp.uint32(9), c0, c1)
    a20d, _ = rng.threefry2x32(jnp.uint32(7), jnp.uint32(9), c0, c1, rounds=20)
    np.testing.assert_array_equal(np.asarray(a20), np.asarray(a20d))
    a13, b13 = rng.threefry2x32(jnp.uint32(7), jnp.uint32(9), c0, c1, rounds=13)
    assert (np.asarray(a13) != np.asarray(a20)).mean() > 0.99
    # marginal uniformity: mean of uniform_from_bits ~ 0.5, bit balance ~ 0.5
    u = np.asarray(rng.uniform_from_bits(a13), np.float64)
    assert abs(u.mean() - 0.5) < 4 / np.sqrt(u.size)
    bits = np.unpackbits(np.asarray(b13).view(np.uint8))
    assert abs(bits.mean() - 0.5) < 0.01
    assert rng.rounds_of("threefry13") == 13
    assert rng.rounds_of("threefry") == 20
    assert rng.counter_based("threefry13") and not rng.counter_based("hardware")


def test_threefry13_chain_kernel_matches_xla_and_blocking_invariant():
    """rng_impl='threefry13' drives both the XLA scan and the fused kernel
    with the same 13-round counters: same trajectories up to XLA's usual
    per-program-shape FMA contraction (1 ulp — the multiframe tests'
    contract; n_sites=64 pads to 128 lanes, a shape where the contraction
    choices differ even at 20 rounds), bitwise invariant under chain
    blocking (same program), and a different stream than 20 rounds."""
    import numpy as np

    from stochquant_tpu import actions
    from stochquant_tpu.config import ChainConfig
    from stochquant_tpu.integrators import langevin
    from stochquant_tpu.kernels import chain_kernel

    base = dict(action="double_well", n_sites=64, dt=0.05, dtau=1e-3,
                n_chains=8, loops=10, seed=3)
    cfg13 = ChainConfig(**base, rng_impl="threefry13")
    cfg20 = ChainConfig(**base)
    act = actions.get(cfg13.action)
    s0 = langevin.init_chain_state(cfg13, act)
    a, ma = langevin.run_frames(s0, act, cfg13, 2)
    b, mb = chain_kernel.run_frames_pallas(s0, act, cfg13, 2, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ma["stable"]), np.asarray(mb["stable"])
    )
    np.testing.assert_allclose(
        np.asarray(a.f), np.asarray(b.f), rtol=3e-6, atol=3e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.x_mean), np.asarray(b.x_mean), rtol=3e-6, atol=3e-6
    )
    c, _ = chain_kernel.run_frames_pallas(
        s0, act, cfg13, 2, interpret=True, block_chains=4
    )
    np.testing.assert_array_equal(np.asarray(b.f), np.asarray(c.f))
    s0_20 = langevin.init_chain_state(cfg20, act)
    d, _ = langevin.run_frames(s0_20, act, cfg20, 2)
    assert not np.array_equal(np.asarray(a.f), np.asarray(d.f))
