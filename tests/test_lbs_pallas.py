"""Fused LBS kernel: XLA-reference parity (interpret mode on CPU) + VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smplifyx_tpu.ops.lbs_pallas import lbs_apply, _lbs_reference


def make_inputs(B=2, V=300, J=55, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.dirichlet(np.ones(J) * 0.1, size=V).astype(np.float32)
    # affine transforms close to rigid
    A = rng.normal(0, 0.3, (B, J, 16)).astype(np.float32)
    A[..., [0, 5, 10, 15]] += 1.0
    v = rng.normal(0, 0.5, (B, V, 3)).astype(np.float32)
    return jnp.asarray(W), jnp.asarray(A), jnp.asarray(v)


class TestLBSKernel:
    def test_pallas_interpret_matches_reference(self):
        W, A, v = make_inputs()
        ref = _lbs_reference(W, A, v)
        out = lbs_apply(W, A, v, True, True)  # use_pallas, interpret
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_padding_path(self):
        # V not divisible by the 256 tile
        W, A, v = make_inputs(V=500)
        ref = _lbs_reference(W, A, v)
        out = lbs_apply(W, A, v, True, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_custom_vjp_matches_autodiff(self):
        W, A, v = make_inputs(B=1, V=64)

        def loss_custom(A, v):
            return jnp.sum(lbs_apply(W, A, v, False, False) ** 2)

        def loss_ref(A, v):
            return jnp.sum(_lbs_reference(W, A, v) ** 2)

        gA, gv = jax.grad(loss_custom, argnums=(0, 1))(A, v)
        gA_ref, gv_ref = jax.grad(loss_ref, argnums=(0, 1))(A, v)
        np.testing.assert_allclose(np.asarray(gA), np.asarray(gA_ref),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                                   atol=1e-4)

    def test_vjp_through_pallas_forward(self):
        W, A, v = make_inputs(B=1, V=128)

        def loss(A, v):
            return jnp.sum(lbs_apply(W, A, v, True, True) ** 2)

        gA, gv = jax.grad(loss, argnums=(0, 1))(A, v)
        assert np.isfinite(np.asarray(gA)).all()
        assert np.isfinite(np.asarray(gv)).all()
