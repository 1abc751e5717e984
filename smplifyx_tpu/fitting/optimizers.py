"""Optimizer factory: L-BFGS (native) plus first-order fallbacks via optax.

Parity with the reference's optim_factory (smplifyx/optimizers/
optim_factory.py:27-65: adam / lbfgs / lbfgsls / rmsprop / sgd).  'lbfgsls'
and 'lbfgs' both map to the native strong-Wolfe L-BFGS (fitting/lbfgs.py);
the first-order optimizers run a fixed-step masked loop with the same
ftol/gtol/NaN termination semantics, vmap-able exactly like `minimize`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from smplifyx_tpu.fitting.lbfgs import LBFGSConfig, LBFGSResult, minimize


def make_optax_optimizer(optim_type: str, lr: float, momentum: float = 0.9,
                         beta1: float = 0.9, beta2: float = 0.999,
                         epsilon: float = 1e-8, rmsprop_alpha: float = 0.99,
                         use_nesterov: bool = True):
    t = optim_type.lower()
    if t == "adam":
        return optax.adam(lr, b1=beta1, b2=beta2, eps=epsilon)
    if t == "rmsprop":
        return optax.rmsprop(lr, decay=rmsprop_alpha, eps=epsilon,
                             momentum=momentum)
    if t == "sgd":
        return optax.sgd(lr, momentum=momentum, nesterov=use_nesterov)
    raise ValueError(f"Optimizer {optim_type} not supported")


def minimize_first_order(
    fun: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    optimizer,
    mask: Optional[jax.Array] = None,
    max_iters: int = 300,
    ftol: float = 1e-9,
    gtol: float = 1e-9,
) -> LBFGSResult:
    """Masked first-order minimization with L-BFGS-compatible results."""
    if mask is None:
        mask = jnp.ones_like(x0)
    vg = jax.value_and_grad(fun)

    class S(NamedTuple):
        x: jax.Array
        opt_state: tuple
        f: jax.Array
        g: jax.Array
        it: jax.Array
        done: jax.Array
        converged: jax.Array

    # where, NOT g * mask: a frozen coordinate's objective gradient may be
    # NaN/Inf (degenerate frozen input) and NaN * 0 is NaN — the same leak
    # lbfgs.py::apply_mask guards against; a leaked NaN here poisons the
    # optax update, masks to NaN again, and halts the loop at iteration 1.
    def apply_mask(g):
        return jnp.where(mask > 0, g, 0.0)

    f0, g0 = vg(x0)
    g0 = apply_mask(g0)
    init = S(x=x0, opt_state=optimizer.init(x0), f=f0, g=g0,
             it=jnp.asarray(0, jnp.int32),
             done=~jnp.isfinite(f0), converged=jnp.asarray(False))

    def cond(s: S):
        return (~s.done) & (s.it < max_iters)

    def body(s: S) -> S:
        updates, opt_state = optimizer.update(s.g, s.opt_state, s.x)
        x_new = optax.apply_updates(
            s.x,
            apply_mask(updates) if isinstance(updates, jax.Array) else updates,
        )
        f_new, g_new = vg(x_new)
        g_new = apply_mask(g_new)
        non_finite = ~jnp.isfinite(f_new)
        rel = (s.f - f_new) / jnp.maximum(
            jnp.maximum(jnp.abs(s.f), jnp.abs(f_new)), 1.0
        )
        # First-order steps are non-monotone (momentum); a single uphill step
        # is not convergence — require |rel| small, and only when ftol > 0.
        small_f = (ftol > 0) & (jnp.abs(rel) <= ftol) & (s.it > 0)
        conv = small_f | (jnp.max(jnp.abs(g_new)) <= gtol)
        return S(
            x=jnp.where(non_finite, s.x, x_new),
            opt_state=opt_state,
            f=jnp.where(non_finite, s.f, f_new),
            g=jnp.where(non_finite, s.g, g_new),
            it=s.it + 1,
            done=non_finite | conv,
            converged=conv & ~non_finite,
        )

    final = jax.lax.while_loop(cond, body, init)
    return LBFGSResult(x=final.x, f=final.f, g=final.g, n_iters=final.it,
                       n_evals=final.it + 1, converged=final.converged)


def create_minimizer(
    optim_type: str = "lbfgsls",
    lbfgs_cfg: Optional[LBFGSConfig] = None,
    lr: float = 1.0,
    max_iters: int = 300,
    ftol: float = 1e-9,
    gtol: float = 1e-9,
    **kwargs,
):
    """Factory -> minimize(fun, x0, mask) with uniform LBFGSResult output."""
    t = optim_type.lower()
    if t in ("lbfgs", "lbfgsls"):
        cfg = lbfgs_cfg or LBFGSConfig(
            max_iters=max_iters, ftol=ftol, gtol=gtol, lr=lr
        )
        return lambda fun, x0, mask=None: minimize(fun, x0, mask=mask, cfg=cfg)
    opt = make_optax_optimizer(t, lr, **kwargs)
    return lambda fun, x0, mask=None: minimize_first_order(
        fun, x0, opt, mask=mask, max_iters=max_iters, ftol=ftol, gtol=gtol
    )
