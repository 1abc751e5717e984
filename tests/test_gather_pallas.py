"""Narrow-phase Pallas gather/scatter kernels: correctness in interpret
mode (CPU) against native indexing, including the vmapped (batched) form
the collision apply path uses.  On-TPU agreement with the XLA one-hot path
is asserted separately by the profiler-driven tools (the kernels are
bit-for-bit on the gather and within accumulation-order noise on the
scatter; see ops/gather_pallas.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from smplifyx_tpu.ops.gather_pallas import gather_rows, scatter_add_rows


def make_inputs(V=1000, R=4096, B=None, seed=0):
    rng = np.random.default_rng(seed)
    shape_t = (V, 3) if B is None else (B, V, 3)
    shape_i = (R,) if B is None else (B, R)
    table = rng.normal(size=shape_t).astype(np.float32)
    ids = rng.integers(0, V, size=shape_i).astype(np.int32)
    g = rng.normal(size=shape_i + (3,)).astype(np.float32)
    return jnp.asarray(table), jnp.asarray(ids), jnp.asarray(g)


class TestGatherKernel:
    def test_matches_native_gather(self):
        table, ids, _ = make_inputs()
        out = gather_rows(table, ids, interpret=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(table)[np.asarray(ids)])

    def test_unaligned_sizes(self):
        # V not a multiple of L=64, R not a multiple of the tile
        table, ids, _ = make_inputs(V=777, R=1000)
        out = gather_rows(table, ids, interpret=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(table)[np.asarray(ids)])

    def test_vmapped(self):
        table, ids, _ = make_inputs(V=500, R=512, B=3)
        out = jax.vmap(lambda t, i: gather_rows(t, i, interpret=True))(
            table, ids)
        want = np.stack([np.asarray(table)[b][np.asarray(ids)[b]]
                         for b in range(3)])
        np.testing.assert_array_equal(np.asarray(out), want)


class TestScatterKernel:
    def test_matches_native_scatter_add(self):
        _, ids, g = make_inputs(V=1000, R=4096)
        out = scatter_add_rows(ids, g, 1000, interpret=True)
        want = np.zeros((1000, 3), np.float32)
        np.add.at(want, np.asarray(ids), np.asarray(g))
        np.testing.assert_allclose(np.asarray(out), want,
                                   rtol=1e-6, atol=1e-6)

    def test_unaligned_sizes(self):
        _, ids, g = make_inputs(V=777, R=1000)
        out = scatter_add_rows(ids, g, 777, interpret=True)
        want = np.zeros((777, 3), np.float32)
        np.add.at(want, np.asarray(ids), np.asarray(g))
        np.testing.assert_allclose(np.asarray(out), want,
                                   rtol=1e-6, atol=1e-6)

    def test_vmapped(self):
        _, ids, g = make_inputs(V=500, R=512, B=3)
        out = jax.vmap(
            lambda i, v: scatter_add_rows(i, v, 500, interpret=True))(ids, g)
        want = np.zeros((3, 500, 3), np.float32)
        for b in range(3):
            np.add.at(want[b], np.asarray(ids)[b], np.asarray(g)[b])
        np.testing.assert_allclose(np.asarray(out), want,
                                   rtol=1e-6, atol=1e-6)

    def test_width9_gather_and_scatter(self):
        """C=9 tables (the unique-triangle remap path) round-trip exactly."""
        rng = np.random.default_rng(2)
        T, R = 555, 2048
        table = jnp.asarray(rng.normal(size=(T, 9)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, T, size=R).astype(np.int32))
        out = gather_rows(table, ids, interpret=True)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(table)[np.asarray(ids)])
        g = jnp.asarray(rng.normal(size=(R, 9)).astype(np.float32))
        sc = scatter_add_rows(ids, g, T, interpret=True)
        want = np.zeros((T, 9), np.float32)
        np.add.at(want, np.asarray(ids), np.asarray(g))
        np.testing.assert_allclose(np.asarray(sc), want,
                                   rtol=1e-6, atol=1e-6)

    def test_duplicate_heavy_ids(self):
        # All rows hit a handful of targets: exercises accumulation across
        # grid steps and within a tile.
        rng = np.random.default_rng(1)
        R = 3000
        ids = jnp.asarray(rng.integers(0, 5, size=R).astype(np.int32))
        g = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
        out = scatter_add_rows(ids, g, 100, interpret=True)
        want = np.zeros((100, 3), np.float32)
        np.add.at(want, np.asarray(ids), np.asarray(g))
        np.testing.assert_allclose(np.asarray(out), want,
                                   rtol=1e-5, atol=1e-5)
