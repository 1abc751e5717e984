import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smplifyx_tpu.fitting.optimizers import (
    create_minimizer, minimize_first_order, make_optax_optimizer,
)


class TestFactory:
    def test_lbfgs_variants(self):
        for name in ("lbfgs", "lbfgsls"):
            m = create_minimizer(name, max_iters=100)
            res = m(lambda x: jnp.sum((x - 2.0) ** 2), jnp.zeros(4))
            np.testing.assert_allclose(np.asarray(res.x), 2.0, atol=1e-4)

    @pytest.mark.parametrize("name,lr", [("adam", 0.1), ("sgd", 0.05),
                                         ("rmsprop", 0.05)])
    def test_first_order(self, name, lr):
        m = create_minimizer(name, lr=lr, max_iters=2000, ftol=0.0)
        res = m(lambda x: jnp.sum((x - 1.5) ** 2), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(res.x), 1.5, atol=0.05)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_optax_optimizer("adagrad_deluxe", 0.1)

    def test_mask_respected(self):
        m = create_minimizer("adam", lr=0.1, max_iters=1000, ftol=0.0)
        mask = jnp.asarray([1.0, 0.0, 1.0])
        res = m(lambda x: jnp.sum((x - 3.0) ** 2), jnp.zeros(3), mask)
        x = np.asarray(res.x)
        assert abs(x[1]) < 1e-8
        np.testing.assert_allclose(x[[0, 2]], 3.0, atol=0.05)

    def test_nan_gradient_in_frozen_coords_cannot_leak(self):
        """Same regression as test_lbfgs.py::TestMaskedNaNGradient, for the
        first-order path: the objective's gradient w.r.t. FROZEN coordinates
        may be NaN (norm() at a degenerate frozen point); masking must zero
        it with `where`, not multiplication (g * mask keeps NaN, poisons the
        optax update, and halts the loop at iteration 1 returning x0)."""
        def fun(x):
            return (x[0] - 3.0) ** 2 + jnp.linalg.norm(x[1:])

        for name, lr in (("adam", 0.1), ("sgd", 0.05), ("rmsprop", 0.05)):
            m = create_minimizer(name, lr=lr, max_iters=2000, ftol=0.0)
            res = m(fun, jnp.zeros(3, jnp.float32),  # norm grad at 0: 0/0
                    jnp.asarray([1.0, 0.0, 0.0]))
            x = np.asarray(res.x)
            assert np.isfinite(x).all(), (name, x)
            np.testing.assert_allclose(x[0], 3.0, atol=0.05, err_msg=name)
            np.testing.assert_array_equal(x[1:], 0.0, err_msg=name)

    def test_vmap(self):
        m = create_minimizer("adam", lr=0.2, max_iters=500, ftol=0.0)
        targets = jnp.asarray([[1.0, 2.0], [3.0, -1.0]])
        res = jax.vmap(
            lambda t: m(lambda x: jnp.sum((x - t) ** 2), jnp.zeros(2))
        )(targets)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(targets),
                                   atol=0.05)
