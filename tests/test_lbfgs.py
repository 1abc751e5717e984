"""Batched strong-Wolfe L-BFGS: correctness on standard test problems."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smplifyx_tpu.fitting.lbfgs import LBFGSConfig, minimize


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


class TestQuadratic:
    def test_exact_on_quadratic(self):
        rng = np.random.default_rng(0)
        D = 8
        A = rng.normal(size=(D, D))
        Q = jnp.asarray(A @ A.T + np.eye(D) * 2.0, jnp.float32)
        b = jnp.asarray(rng.normal(size=D), jnp.float32)

        fun = lambda x: 0.5 * x @ Q @ x - b @ x
        res = minimize(fun, jnp.zeros(D), cfg=LBFGSConfig(max_iters=100))
        x_star = np.linalg.solve(np.asarray(Q, np.float64), np.asarray(b, np.float64))
        np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-4)
        assert bool(res.converged)

    def test_convergence_flag_and_counts(self):
        fun = lambda x: jnp.sum((x - 3.0) ** 2)
        res = minimize(fun, jnp.zeros(4))
        assert bool(res.converged)
        assert int(res.n_iters) <= 5
        np.testing.assert_allclose(np.asarray(res.x), 3.0, atol=1e-5)


class TestRosenbrock:
    def test_2d(self):
        res = minimize(
            rosenbrock, jnp.asarray([-1.2, 1.0], jnp.float32),
            cfg=LBFGSConfig(max_iters=200, ftol=0.0, gtol=1e-6),
        )
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-3)

    def test_10d(self):
        x0 = jnp.full((10,), -0.5, jnp.float32)
        res = minimize(
            rosenbrock, x0, cfg=LBFGSConfig(max_iters=400, ftol=0.0, gtol=1e-5)
        )
        assert float(res.f) < 1e-6

    def test_matches_torch_lbfgs_quality(self):
        """Final loss should be as good as torch's LBFGS with strong Wolfe."""
        torch = pytest.importorskip("torch")
        x0 = np.full(6, -0.7, np.float32)

        xt = torch.tensor(x0, requires_grad=True)
        opt = torch.optim.LBFGS(
            [xt], lr=1.0, max_iter=200, line_search_fn="strong_wolfe"
        )

        def closure():
            opt.zero_grad()
            loss = (
                100 * (xt[1:] - xt[:-1] ** 2) ** 2 + (1 - xt[:-1]) ** 2
            ).sum()
            loss.backward()
            return loss

        for _ in range(5):
            opt.step(closure)
        torch_f = float(closure())

        res = minimize(
            rosenbrock, jnp.asarray(x0),
            cfg=LBFGSConfig(max_iters=400, ftol=0.0, gtol=1e-7),
        )
        ours_f = float(res.f)
        assert ours_f <= torch_f + 1e-4, (ours_f, torch_f)


class TestMasking:
    def test_frozen_coordinates_do_not_move(self):
        fun = lambda x: jnp.sum((x - 5.0) ** 2)
        x0 = jnp.zeros(6)
        mask = jnp.asarray([1.0, 1.0, 0.0, 0.0, 1.0, 0.0])
        res = minimize(fun, x0, mask=mask)
        x = np.asarray(res.x)
        np.testing.assert_allclose(x[[0, 1, 4]], 5.0, atol=1e-5)
        np.testing.assert_allclose(x[[2, 3, 5]], 0.0, atol=0)

    def test_masked_solution_optimal_in_subspace(self):
        rng = np.random.default_rng(1)
        D = 6
        A = rng.normal(size=(D, D))
        Q = np.asarray(A @ A.T + np.eye(D) * 2.0, np.float32)
        b = rng.normal(size=D).astype(np.float32)
        free = np.array([0, 2, 5])

        fun = lambda x: 0.5 * x @ jnp.asarray(Q) @ x - jnp.asarray(b) @ x
        mask = np.zeros(D, np.float32)
        mask[free] = 1.0
        res = minimize(fun, jnp.zeros(D), mask=jnp.asarray(mask),
                       cfg=LBFGSConfig(max_iters=100))
        # Solve the restricted problem exactly.
        Qf = Q[np.ix_(free, free)].astype(np.float64)
        bf = b[free].astype(np.float64)
        expect = np.zeros(D)
        expect[free] = np.linalg.solve(Qf, bf)
        np.testing.assert_allclose(np.asarray(res.x), expect, atol=1e-4)


class TestBatched:
    def test_vmap_independent_problems(self):
        """Each lane has its own target; all must converge independently."""
        B, D = 16, 5
        rng = np.random.default_rng(2)
        targets = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)

        def fit_one(x0, target):
            return minimize(lambda x: jnp.sum((x - target) ** 2) * 0.5, x0)

        res = jax.vmap(fit_one)(jnp.zeros((B, D)), targets)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(targets), atol=1e-4)
        assert bool(res.converged.all())

    def test_vmap_rosenbrock_mixed_starts(self):
        B = 8
        rng = np.random.default_rng(3)
        x0 = jnp.asarray(rng.uniform(-1.5, 1.5, size=(B, 4)), jnp.float32)
        cfg = LBFGSConfig(max_iters=300, ftol=0.0, gtol=1e-5)
        res = jax.vmap(lambda x: minimize(rosenbrock, x, cfg=cfg))(x0)
        # L-BFGS is a local optimizer: every lane must reach a stationary
        # point (4D Rosenbrock has a local min ~3.70 near (-1,1,1,1) besides
        # the global min 0 at ones).
        grad_norms = np.asarray(
            jax.vmap(lambda x: jnp.max(jnp.abs(jax.grad(rosenbrock)(x))))(res.x)
        )
        assert grad_norms.max() < 1e-3, grad_norms
        assert bool(res.converged.all())

    def test_jit_compiles_once_and_runs(self):
        cfg = LBFGSConfig(max_iters=50)
        fit = jax.jit(
            jax.vmap(lambda x, t: minimize(
                lambda z: jnp.sum((z - t) ** 2), x, cfg=cfg).x)
        )
        out = fit(jnp.zeros((4, 3)), jnp.ones((4, 3)) * 2)
        np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


class TestRobustness:
    def test_nan_objective_stops_cleanly(self):
        def fun(x):
            # Goes NaN for x[0] > 1
            return jnp.where(x[0] > 1.0, jnp.nan, jnp.sum(x**2) - 2 * x[0])

        res = minimize(fun, jnp.zeros(2), cfg=LBFGSConfig(max_iters=50))
        assert np.isfinite(float(res.f))

    def test_already_converged_start(self):
        fun = lambda x: jnp.sum(x ** 2)
        res = minimize(fun, jnp.zeros(3))
        assert int(res.n_iters) == 0
        assert bool(res.converged)


class TestAuxFn:
    """The per-iteration aux hook (collision broad-phase hoisting)."""

    def test_constant_aux_matches_plain_path(self):
        # An aux that does not change the objective must reproduce the
        # no-aux trajectory exactly (same iterates, same final state).
        def rosen(x):
            return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                           + (1.0 - x[:-1]) ** 2)

        x0 = jnp.asarray([-1.2, 1.0, 0.7], jnp.float32)
        cfg = LBFGSConfig(max_iters=80)
        plain = minimize(rosen, x0, cfg=cfg)
        aux = minimize(lambda x, a: rosen(x) + 0.0 * a["c"],
                       x0, cfg=cfg,
                       aux_fn=lambda x: {"c": jnp.sum(x) * 0.0})
        # The aux program compiles with one extra evaluation per iteration,
        # so fp fusion noise makes the chaotic trajectories diverge at the
        # 1e-5 level — compare the minimizer, not the path.
        np.testing.assert_allclose(np.asarray(aux.x), np.asarray(plain.x),
                                   rtol=1e-3)
        assert bool(aux.converged)

    def test_aux_refreshes_per_iteration(self):
        # Quadratic whose center comes from aux_fn(x) = stop_gradient(x)/2
        # plus a ridge: under a FROZEN aux0 = x0/2 the minimizer is
        # 0.8 * aux0 = 0.4 * x0 = 3.2; with per-iteration refresh each step
        # contracts the iterate by ~0.4, so reaching far below 3.2 proves
        # the aux is recomputed as the iterate moves.  (It stops once the
        # line search lands on an exact frozen-aux stationary point, not at
        # 0 — the optimizer cannot see future refreshes.)
        def fun(x, aux):
            return jnp.sum((x - aux) ** 2) + 0.25 * jnp.sum(x ** 2)

        x0 = jnp.ones(3, jnp.float32) * 8.0
        res = minimize(fun, x0, cfg=LBFGSConfig(max_iters=60),
                       aux_fn=lambda x: jax.lax.stop_gradient(x) / 2.0)
        assert float(jnp.max(jnp.abs(res.x))) < 1.0, np.asarray(res.x)

    def test_aux_under_vmap_and_jit(self):
        def fun(x, aux):
            return jnp.sum((x - aux) ** 2) + 0.25 * jnp.sum(x ** 2)

        run = jax.jit(jax.vmap(lambda x: minimize(
            fun, x, cfg=LBFGSConfig(max_iters=60),
            aux_fn=lambda z: jax.lax.stop_gradient(z) * 0.5).x))
        out = run(jnp.ones((4, 2)) * 4.0)
        assert float(jnp.max(jnp.abs(out))) < 0.5  # frozen aux stops at 1.6

    def test_aux_every_confirm_on_refresh(self):
        # Under coarse cadence a lane converges INSIDE a period to the
        # stationary point of the frozen aux (0.4 * x for this ridge
        # quadratic); the next refresh must detect the now-large gradient
        # and REOPEN the lane rather than finalizing.  With that
        # confirm-on-refresh rule every cadence reaches the true fixed
        # point x = 0 and seals there.
        def fun(x, aux):
            return jnp.sum((x - aux) ** 2) + 0.25 * jnp.sum(x ** 2)

        x0 = jnp.ones(3, jnp.float32) * 8.0
        af = lambda x: jax.lax.stop_gradient(x) / 2.0
        for k in (1, 4, 100):
            res = minimize(fun, x0,
                           cfg=LBFGSConfig(max_iters=60, aux_every=k),
                           aux_fn=af)
            assert float(jnp.max(jnp.abs(res.x))) < 1.0, (k, np.asarray(res.x))
            assert bool(res.converged), k

    def test_ftol_converged_lane_seals_on_refresh(self):
        """Regression (advisor r2): a lane that converges via ftol can
        essentially never satisfy gtol=1e-9 in f32, so a gtol-only
        confirm-on-refresh reopened it every period and the lane burned
        line-search evaluations at its own stationary point until
        max_iters.  A refresh that leaves f within ftol of the converged
        value must SEAL the lane."""
        def fun(x, aux):
            del aux
            return rosenbrock(x)

        x0 = jnp.asarray([-1.2, 1.0, 0.7], jnp.float32)
        res = minimize(
            fun, x0,
            cfg=LBFGSConfig(max_iters=300, aux_every=3),
            aux_fn=lambda x: jnp.zeros(()),
        )
        # Rosenbrock-3 converges via ftol in ~30 iterations; without the
        # f-stationarity seal this runs to the 300-iteration cap.
        assert int(res.n_iters) < 120, int(res.n_iters)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-3)


class TestMaskedNaNGradient:
    def test_nan_gradient_in_frozen_coords_cannot_leak(self):
        """Regression: the objective's gradient w.r.t. FROZEN coordinates
        may be NaN (norm() at a degenerate frozen point); masking must
        zero it with `where`, not multiplication (NaN * 0 = NaN poisoned
        the search direction and moved frozen coordinates to NaN — this
        corrupted the classic preset's body latent through the camera
        stage, which freezes everything but camera params)."""
        def fun(x):
            return (x[0] - 3.0) ** 2 + jnp.linalg.norm(x[1:])

        x0 = jnp.zeros(3, jnp.float32)   # norm grad at 0 is 0/0 = NaN
        res = minimize(fun, x0, mask=jnp.asarray([1.0, 0.0, 0.0]),
                       cfg=LBFGSConfig(max_iters=50))
        x = np.asarray(res.x)
        assert np.isfinite(x).all(), x
        np.testing.assert_allclose(x[0], 3.0, atol=1e-4)
        np.testing.assert_array_equal(x[1:], 0.0)


class TestLineSearchConsistency:
    def test_exhausted_bracketing_returns_evaluated_triple(self):
        """Regression: when max_ls runs out while the bracketing phase has a
        PENDING (unevaluated) extrapolation trial, the line search must
        return a (t, f, g) triple from one evaluated point — not the
        pending t paired with the previous point's f/g (which corrupted
        the L-BFGS curvature history and could silently accept an
        unevaluated step)."""
        from smplifyx_tpu.fitting.lbfgs import _strong_wolfe

        # Long, gently-decreasing valley: Armijo holds at every
        # extrapolation, curvature never does -> the automaton stays in
        # bracketing and exhausts max_ls with a pending trial.
        def fun(x):
            return -1e-3 * x[0] + 1e-6 * x[0] ** 2

        vg = jax.value_and_grad(fun)
        x = jnp.zeros(1, jnp.float32)
        d = jnp.ones(1, jnp.float32)
        f0, g0 = vg(x)
        cfg = LBFGSConfig(max_ls=3, ls_soft_accept=10_000, c2=1e-12)
        t, f, g, n = _strong_wolfe(
            vg, x, jnp.asarray(1.0, jnp.float32), d, f0, g0,
            jnp.vdot(g0, d), cfg)
        f_at_t, g_at_t = vg(x + t * d)
        np.testing.assert_allclose(float(f), float(f_at_t), rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(g_at_t))


class TestArmijoMode:
    """ls_mode='armijo': backtracking sufficient-decrease line search.

    Throughput mode for collision-enabled stages (each objective
    evaluation carries a full-mesh forward + narrow-phase VJP): fewer
    evals per iteration than strong Wolfe, history updates protected by
    the ys > 0 guard."""

    def test_rosenbrock_2d(self):
        res = minimize(
            rosenbrock, jnp.asarray([-1.2, 1.0], jnp.float32),
            cfg=LBFGSConfig(max_iters=400, ftol=0.0, gtol=1e-6,
                            ls_mode="armijo"),
        )
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-3)

    def test_quadratic_exact(self):
        rng = np.random.default_rng(1)
        D = 8
        A = rng.normal(size=(D, D))
        Q = jnp.asarray(A @ A.T + np.eye(D) * 2.0, jnp.float32)
        b = jnp.asarray(rng.normal(size=D), jnp.float32)
        fun = lambda x: 0.5 * x @ Q @ x - b @ x
        res = minimize(fun, jnp.zeros(D),
                       cfg=LBFGSConfig(max_iters=200, ls_mode="armijo"))
        x_star = np.linalg.solve(np.asarray(Q, np.float64),
                                 np.asarray(b, np.float64))
        np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-3)

    def test_comparable_quality_on_stiff_convex_energy(self):
        """On a stiff (condition ~1e4) CONVEX robust energy both searches
        make steady progress and land within a small factor of each other.
        (Eval-count efficiency is NOT asserted here: on smooth synthetic
        energies strong Wolfe already averages ~1.1 evals/iteration — the
        ~5 evals/iteration it burns on the production SMPLify energies is
        what the mode targets, measured in bench_collision.py.)"""
        rng = np.random.default_rng(2)
        D = 24
        tgt = jnp.asarray(rng.normal(0, 1.0, D), jnp.float32)
        scale = jnp.asarray(10.0 ** rng.uniform(-2, 2, D), jnp.float32)

        def fun(x):
            r = scale * (x - tgt)
            a = jnp.abs(r)
            huber = jnp.where(a < 1.0, 0.5 * r * r, a - 0.5)
            return jnp.sum(huber) + 1e-3 * jnp.sum(x ** 2)

        x0 = jnp.zeros(D, jnp.float32)
        rw = minimize(fun, x0, cfg=LBFGSConfig(max_iters=100, ls_mode="wolfe"))
        ra = minimize(fun, x0, cfg=LBFGSConfig(max_iters=100,
                                               ls_mode="armijo"))
        f_w, f_a = float(rw.f), float(ra.f)
        assert f_a <= f_w * 1.5 + 1e-6, (f_a, f_w)
        # and it genuinely optimizes: >= 99.9% of the initial energy gone
        assert f_a <= float(fun(x0)) * 1e-3

    def test_masked_nan_gradient_safe(self):
        """Frozen-coordinate NaN gradients must not leak through the
        armijo path either (mirror of TestMaskedNaNGradient)."""
        def fun(x):
            bad = jnp.sqrt(x[1])  # NaN grad at x[1] = 0
            return jnp.sum((x[0] - 3.0) ** 2) + 0.0 * bad

        mask = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
        res = minimize(fun, jnp.zeros(3), mask=mask,
                       cfg=LBFGSConfig(max_iters=50, ls_mode="armijo"))
        x = np.asarray(res.x)
        assert np.isfinite(x).all(), x
        np.testing.assert_allclose(x[0], 3.0, atol=1e-4)
        np.testing.assert_array_equal(x[1:], 0.0)

    def test_vmap_and_aux(self):
        """Armijo mode composes with vmap and the aux-refresh machinery."""
        def fun(x, aux):
            return jnp.sum((x - aux) ** 2)

        def aux_fn(x):
            return jnp.full_like(x, 2.0)

        x0 = jnp.zeros((4, 3), jnp.float32)
        cfg = LBFGSConfig(max_iters=30, aux_every=4, ls_mode="armijo")
        res = jax.vmap(
            lambda x: minimize(fun, x, cfg=cfg, aux_fn=aux_fn)
        )(x0)
        np.testing.assert_allclose(np.asarray(res.x), 2.0, atol=1e-5)
