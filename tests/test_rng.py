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
