"""L-BFGS with strong-Wolfe line search, written for jit + vmap on TPU.

The counterpart of the reference's PyTorch optimizer (component #13 in
SURVEY.md: smplifyx/optimizers/lbfgs_ls.py — two-loop recursion :341-358,
cubic interpolation :11-36, bracket+zoom Wolfe search :39-167) and of the
outer FittingMonitor loop's termination rules (smplifyx/fitting.py:174-193:
NaN/Inf abort, relative-ftol break, max-|grad| gtol break).

Re-designed rather than translated:
  * a single-sample `minimize` over a flat parameter vector whose whole
    optimization — direction, line search, convergence — is one
    `lax.while_loop`, so `vmap(minimize)` yields a *batched* optimizer where
    every frame carries its own history/step-length/termination state and the
    compiled loop runs until the last frame converges (no host round-trips,
    which is what makes ≥50 fits/s/chip possible vs the reference's
    Python-looped closure at ~0.05 fits/s);
  * frozen parameters are expressed by a 0/1 mask on the gradient: the
    search direction provably stays inside the masked subspace (history
    vectors are built from masked gradients), replacing torch's
    requires_grad-filtered parameter lists (fit_single_frame.py:554-563);
  * the history ring uses shift semantics with a static size, so the
    two-loop recursion unrolls into fixed-shape vector ops.

Bounded line search: each bracket/zoom step costs exactly one
value_and_grad; `max_ls` caps it (reference default 25).  On exit the best
point seen is returned, which also covers abandoned searches.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

_BRACKET = 0
_ZOOM = 1
_DONE = 2


@struct.dataclass
class LBFGSConfig:
    max_iters: int = struct.field(pytree_node=False, default=150)
    history: int = struct.field(pytree_node=False, default=16)
    max_ls: int = struct.field(pytree_node=False, default=25)
    # After this many line-search evals, any Armijo-satisfying point is
    # accepted even if the curvature condition isn't met yet (history
    # updates stay guarded by s.y > 0, so L-BFGS stays well-defined).  On
    # the stiff SMPLify energies the full strong-Wolfe zoom averages ~5
    # evals/iteration; a small soft-accept budget bounds that tail at a
    # small cost in final-gradient tightness.  Default off (= max_ls).
    ls_soft_accept: int = struct.field(pytree_node=False, default=10_000)
    # Warm-start each line search from the previously accepted step length
    # (classic stiff-problem heuristic; t0=1 overshoots repeatedly when the
    # energy is badly scaled along new directions).  Default off: unit
    # initial steps preserve superlinear local convergence, and tiny warm
    # steps can trip the relative-ftol stop prematurely.
    warm_start_step: bool = struct.field(pytree_node=False, default=False)
    # Trust-region-style cap on ||d||_inf: prevents line-search probes at
    # absurd parameter magnitudes (exp-prior overflow territory) that waste
    # ~5 evals bracketing back.  0 disables.  NOTE: measured to HURT the
    # SMPLify energies (camera translation legitimately moves meters); kept
    # for problems with uniformly-scaled parameters.
    max_dir_inf: float = struct.field(pytree_node=False, default=0.0)
    # Cap on total objective evaluations (0 = unlimited).  Batched fits wait
    # for the slowest lane; straggler lanes routinely burn ~3x the median
    # eval count for marginal loss improvement, so a budget close to the
    # p90 eval count cuts wall-clock with loss changes only on stragglers.
    max_evals: int = struct.field(pytree_node=False, default=0)
    # Refresh cadence for minimize()'s aux_fn: rebuild aux every this many
    # L-BFGS iterations (1 = every iteration).  Only read when aux_fn is
    # given.  Larger values amortize an expensive aux (the collision broad
    # phase's sort + compaction) over more iterations at the cost of staler
    # candidate pairs; the apply-side AABB recheck bounds the error to
    # MISSED new contacts, never phantom ones.
    aux_every: int = struct.field(pytree_node=False, default=1)
    # Line-search algorithm: "wolfe" (bracket+zoom strong Wolfe, the
    # reference's lbfgs_ls semantics) or "armijo" (backtracking with
    # quadratic interpolation, sufficient-decrease only).  Armijo averages
    # ~1-2 objective evaluations per iteration vs ~5 for strong Wolfe on
    # the stiff SMPLify energies; curvature-condition violations are
    # absorbed by the ys > 0 guard on history updates.  Throughput knob
    # for collision-enabled stages, where each evaluation carries a
    # full-mesh forward + narrow-phase VJP.
    ls_mode: str = struct.field(pytree_node=False, default="wolfe")
    lr: float = 1.0
    ftol: float = 1e-9   # relative f change (reference utils.rel_change)
    gtol: float = 1e-9   # max-abs gradient
    tol_change: float = 1e-9
    c1: float = 1e-4
    c2: float = 0.9


class LBFGSResult(NamedTuple):
    x: jax.Array          # [D] final parameters
    f: jax.Array          # final objective
    g: jax.Array          # final (masked) gradient
    n_iters: jax.Array    # L-BFGS iterations taken
    n_evals: jax.Array    # objective evaluations
    converged: jax.Array  # bool: exited before max_iters


def _cubic_minimizer(x1, f1, g1, x2, f2, g2, lo, hi):
    """Minimizer of the cubic through (x1,f1,g1),(x2,f2,g2), clipped to
    [lo, hi]; falls back to bisection when the cubic has no real minimum."""
    dx = x1 - x2
    dx = jnp.where(jnp.abs(dx) < 1e-20, 1e-20, dx)
    d1 = g1 + g2 - 3 * (f1 - f2) / dx
    d2_sq = d1 * d1 - g1 * g2
    safe = d2_sq >= 0
    d2 = jnp.sqrt(jnp.where(safe, d2_sq, 0.0)) * jnp.sign(x2 - x1)
    denom = g2 - g1 + 2 * d2
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    t = x2 - (x2 - x1) * ((g2 + d2 - d1) / denom)
    t = jnp.where(safe & jnp.isfinite(t), t, 0.5 * (lo + hi))
    return jnp.clip(t, lo, hi)


class _LSState(NamedTuple):
    phase: jax.Array
    it: jax.Array         # number of phi evaluations so far
    t: jax.Array          # last EVALUATED trial step (f_t/g_t/gtd_t match)
    f_t: jax.Array
    g_t: jax.Array
    gtd_t: jax.Array
    t_nx: jax.Array       # next bracketing trial (pending, NOT evaluated)
    # previous bracketing point
    t_prev: jax.Array
    f_prev: jax.Array
    g_prev: jax.Array
    gtd_prev: jax.Array
    # zoom bracket
    t_lo: jax.Array
    f_lo: jax.Array
    g_lo: jax.Array
    gtd_lo: jax.Array
    t_hi: jax.Array
    f_hi: jax.Array
    gtd_hi: jax.Array
    # best point seen (fallback on budget exhaustion)
    best_t: jax.Array
    best_f: jax.Array
    best_g: jax.Array
    # zoom "insufficient progress" latch (stateful bisection safeguard)
    insuf: jax.Array


def _strong_wolfe(value_grad_fn, x, t_init, d, f0, g0, gtd0, cfg: LBFGSConfig):
    """Find t satisfying strong Wolfe conditions along d from x.

    Returns (t, f_t, g_t, n_evals).  One objective evaluation per loop
    iteration; on budget exhaustion or a degenerate bracket returns the best
    point seen (which may be t=0, i.e. no movement).
    """
    dtype = x.dtype

    def phi(t):
        f, g = value_grad_fn(x + t * d)
        return f, g, jnp.vdot(g, d)

    def armijo_ref(tt):
        return f0 + cfg.c1 * tt * gtd0

    wolfe_curv = -cfg.c2 * gtd0

    def classify_bracket(s: _LSState) -> _LSState:
        """Current point (s.t, evaluated) drives the bracketing automaton."""
        # A non-finite trial value counts as "too far": bracket and shrink.
        cond_hi = (
            (s.f_t > armijo_ref(s.t))
            | ((s.it > 1) & (s.f_t >= s.f_prev))
            | ~jnp.isfinite(s.f_t)
        )
        soft = s.it >= cfg.ls_soft_accept
        cond_done = (~cond_hi) & ((jnp.abs(s.gtd_t) <= wolfe_curv) | soft)
        cond_swap = (~cond_hi) & (~cond_done) & (s.gtd_t >= 0)
        to_zoom = cond_hi | cond_swap
        stay = ~(to_zoom | cond_done)

        # Extrapolation target for the "stay bracketing" case.
        lo_b = s.t + 0.01 * (s.t - s.t_prev)
        hi_b = 10.0 * s.t
        t_next = _cubic_minimizer(
            s.t_prev, s.f_prev, s.gtd_prev, s.t, s.f_t, s.gtd_t, lo_b, hi_b
        )

        # Bracket endpoints on transition (cond_hi: [prev, t]; swap: [t, prev]).
        t_lo = jnp.where(cond_hi, s.t_prev, s.t)
        f_lo = jnp.where(cond_hi, s.f_prev, s.f_t)
        g_lo = jnp.where(cond_hi, s.g_prev, s.g_t)
        gtd_lo = jnp.where(cond_hi, s.gtd_prev, s.gtd_t)
        t_hi = jnp.where(cond_hi, s.t, s.t_prev)
        f_hi = jnp.where(cond_hi, s.f_t, s.f_prev)
        gtd_hi = jnp.where(cond_hi, s.gtd_t, s.gtd_prev)

        phase = jnp.where(
            cond_done, _DONE, jnp.where(to_zoom, _ZOOM, _BRACKET)
        ).astype(jnp.int32)

        # The pending trial lives in t_nx, NOT in s.t: s.t must always pair
        # with f_t/g_t (the accept check and the L-BFGS state update read
        # them as a triple — overwriting t with an unevaluated step here
        # returned a mismatched (t_next, f_old, g_old) when max_ls ran out
        # mid-bracketing, corrupting the curvature history).
        return s._replace(
            phase=phase,
            t_prev=jnp.where(stay, s.t, s.t_prev),
            f_prev=jnp.where(stay, s.f_t, s.f_prev),
            g_prev=jnp.where(stay, s.g_t, s.g_prev),
            gtd_prev=jnp.where(stay, s.gtd_t, s.gtd_prev),
            t_nx=jnp.where(stay, t_next, s.t_nx),
            t_lo=jnp.where(to_zoom, t_lo, s.t_lo),
            f_lo=jnp.where(to_zoom, f_lo, s.f_lo),
            g_lo=jnp.where(to_zoom, g_lo, s.g_lo),
            gtd_lo=jnp.where(to_zoom, gtd_lo, s.gtd_lo),
            t_hi=jnp.where(to_zoom, t_hi, s.t_hi),
            f_hi=jnp.where(to_zoom, f_hi, s.f_hi),
            gtd_hi=jnp.where(to_zoom, gtd_hi, s.gtd_hi),
        )

    def classify_zoom(s: _LSState) -> _LSState:
        """Current point (s.t, evaluated, inside bracket) updates the bracket."""
        cond_hi = (
            (s.f_t > armijo_ref(s.t)) | (s.f_t >= s.f_lo) | ~jnp.isfinite(s.f_t)
        )
        soft = s.it >= cfg.ls_soft_accept
        cond_done = (~cond_hi) & ((jnp.abs(s.gtd_t) <= wolfe_curv) | soft)
        flip = (~cond_hi) & (~cond_done) & (s.gtd_t * (s.t_hi - s.t_lo) >= 0)

        t_hi = jnp.where(cond_hi, s.t, jnp.where(flip, s.t_lo, s.t_hi))
        f_hi = jnp.where(cond_hi, s.f_t, jnp.where(flip, s.f_lo, s.f_hi))
        gtd_hi = jnp.where(cond_hi, s.gtd_t, jnp.where(flip, s.gtd_lo, s.gtd_hi))

        take_lo = ~cond_hi
        t_lo = jnp.where(take_lo, s.t, s.t_lo)
        f_lo = jnp.where(take_lo, s.f_t, s.f_lo)
        g_lo = jnp.where(take_lo, s.g_t, s.g_lo)
        gtd_lo = jnp.where(take_lo, s.gtd_t, s.gtd_lo)

        tiny = jnp.abs(t_hi - t_lo) < 1e-9 * jnp.maximum(jnp.abs(t_hi), 1.0)
        phase = jnp.where(cond_done | tiny, _DONE, _ZOOM).astype(jnp.int32)
        return s._replace(
            phase=phase, t_lo=t_lo, f_lo=f_lo, g_lo=g_lo, gtd_lo=gtd_lo,
            t_hi=t_hi, f_hi=f_hi, gtd_hi=gtd_hi,
        )

    def zoom_trial(s: _LSState) -> tuple[jax.Array, jax.Array]:
        """Pick the next zoom trial point; returns (t_try, insuf_latch).

        Stateful safeguard: a cubic step hugging a bracket endpoint is
        allowed once (it is often the right move when one endpoint's value
        is enormous); only on a *repeat* is it clamped `eps` inside the
        bracket.  A plain always-bisect rule stalls on stiff energies.
        """
        lo_b = jnp.minimum(s.t_lo, s.t_hi)
        hi_b = jnp.maximum(s.t_lo, s.t_hi)
        eps = 0.1 * (hi_b - lo_b)
        t_try = _cubic_minimizer(
            s.t_lo, s.f_lo, s.gtd_lo, s.t_hi, s.f_hi, s.gtd_hi, lo_b, hi_b
        )
        too_close = jnp.minimum(hi_b - t_try, t_try - lo_b) < eps
        at_bound = (t_try >= hi_b) | (t_try <= lo_b)
        clamp = too_close & (s.insuf | at_bound)
        clamped = jnp.where(
            jnp.abs(t_try - hi_b) < jnp.abs(t_try - lo_b),
            hi_b - eps, lo_b + eps,
        )
        t_out = jnp.where(clamp, clamped, t_try)
        insuf_next = too_close & ~clamp
        return t_out, insuf_next

    # ---- initial evaluation at t_init
    f_t, g_t, gtd_t = phi(t_init)
    zero = jnp.asarray(0.0, dtype)
    s0 = _LSState(
        phase=jnp.asarray(_BRACKET, jnp.int32), it=jnp.asarray(1, jnp.int32),
        t=t_init, f_t=f_t, g_t=g_t, gtd_t=gtd_t, t_nx=t_init,
        t_prev=zero, f_prev=f0, g_prev=g0, gtd_prev=gtd0,
        t_lo=zero, f_lo=f0, g_lo=g0, gtd_lo=gtd0,
        t_hi=t_init, f_hi=f_t, gtd_hi=gtd_t,
        best_t=jnp.where(f_t < f0, t_init, zero),
        best_f=jnp.where(f_t < f0, f_t, f0),  # NaN-safe (NaN < x is False)
        best_g=jnp.where(f_t < f0, g_t, g0),
        insuf=jnp.asarray(False),
    )
    s0 = classify_bracket(s0)

    def cond(s: _LSState):
        return (s.phase != _DONE) & (s.it < cfg.max_ls)

    def body(s: _LSState) -> _LSState:
        in_zoom = s.phase == _ZOOM
        t_zoom, insuf_next = zoom_trial(s)
        t_try = jnp.where(in_zoom, t_zoom, s.t_nx)
        s = s._replace(insuf=jnp.where(in_zoom, insuf_next, s.insuf))
        f_t, g_t, gtd_t = phi(t_try)
        better = f_t < s.best_f
        s = s._replace(
            t=t_try, f_t=f_t, g_t=g_t, gtd_t=gtd_t, it=s.it + 1,
            best_t=jnp.where(better, t_try, s.best_t),
            best_f=jnp.where(better, f_t, s.best_f),
            best_g=jnp.where(better, g_t, s.best_g),
        )
        return jax.lax.cond(in_zoom, classify_zoom, classify_bracket, s)

    final = jax.lax.while_loop(cond, body, s0)

    # Accept the final point if it decreases sufficiently (strict Wolfe or a
    # soft Armijo accept); otherwise fall back to the best point seen.
    accept = jnp.isfinite(final.f_t) & (final.f_t <= armijo_ref(final.t))
    t_out = jnp.where(accept, final.t, final.best_t)
    f_out = jnp.where(accept, final.f_t, final.best_f)
    g_out = jnp.where(accept, final.g_t, final.best_g)
    return t_out, f_out, g_out, final.it


def _armijo_backtrack(value_fn, value_grad_fn, x, t_init, d, f0, g0, gtd0,
                      cfg: LBFGSConfig):
    """Backtracking line search: first trial satisfying the Armijo
    sufficient-decrease condition f(t) <= f0 + c1*t*gtd0 wins.

    Each backtrack interpolates the quadratic through (0, f0, gtd0) and
    (t, f_t), clipped to [0.1t, 0.5t] (standard safeguards).  No curvature
    condition is enforced — minimize()'s ys > 0 guard simply skips history
    updates for non-curvature-compatible steps.

    Trials are VALUE-ONLY: Armijo needs no gradient, and on collision
    stages the VJP (narrow-phase scatter + full-mesh LBS backward) is ~2.5x
    the forward — under vmap every lane pays the per-iteration batch-max
    trial count, so dropping the per-trial backward nearly halves the
    collision-stage eval bill.  ONE value_and_grad runs at the chosen step
    (accepted trial, best decreasing point, or t=0 on total failure), which
    also supplies the gradient the L-BFGS update needs.
    """
    dtype = x.dtype

    def phi_val(t):
        return value_fn(x + t * d)

    def armijo_ok(t, f):
        return jnp.isfinite(f) & (f <= f0 + cfg.c1 * t * gtd0)

    f1 = phi_val(t_init)
    s0 = (t_init, f1, jnp.asarray(1, jnp.int32), armijo_ok(t_init, f1),
          # best decreasing point seen (fallback): t=0 start
          jnp.zeros_like(t_init), f0)

    def cond(s):
        _, _, it, ok, _, _ = s
        return (~ok) & (it < cfg.max_ls)

    def body(s):
        t, f_t, it, _, bt, bf = s
        better = jnp.isfinite(f_t) & (f_t < bf)
        bt = jnp.where(better, t, bt)
        bf = jnp.where(better, f_t, bf)
        # Quadratic-interpolated backtrack; bisection fallback on a
        # non-finite trial (overflow territory — pull in hard).
        denom = 2.0 * (f_t - f0 - gtd0 * t)
        t_q = jnp.where(jnp.abs(denom) > 1e-20,
                        -gtd0 * t * t / denom, 0.5 * t)
        t_new = jnp.clip(t_q, 0.1 * t, 0.5 * t)
        t_new = jnp.where(jnp.isfinite(f_t) & jnp.isfinite(t_new)
                          & (t_new > 0), t_new, 0.1 * t)
        t_new = t_new.astype(dtype)
        f_n = phi_val(t_new)
        return (t_new, f_n, it + 1, armijo_ok(t_new, f_n), bt, bf)

    t, f_t, evals, ok, bt, bf = jax.lax.while_loop(cond, body, s0)
    # Merge the LAST evaluated trial into the best-seen fallback (the loop
    # body only folds in the previous trial, so a max_ls exit would
    # otherwise drop it).
    better = jnp.isfinite(f_t) & (f_t < bf)
    bt = jnp.where(better, t, bt)
    bf = jnp.where(better, f_t, bf)
    # Fallback chain: Armijo accept -> best decreasing point -> t=0 (exact
    # no-step; minimize() then wipes the history and retries steepest).
    t_out = jnp.where(ok, t, bt)
    # t == 0 must evaluate EXACTLY at x (x + 0 * d is NaN when d carries
    # non-finite entries from a poisoned gradient — same guard as the
    # caller's step computation).
    f_out, g_out = value_grad_fn(x + jnp.where(t_out != 0.0, t_out * d, 0.0))
    return t_out, f_out, g_out, evals + 1


def _two_loop(g, S_hist, Y_hist, rho, n_hist, history):
    """Two-loop recursion: approximate -H^{-1} g from the last n_hist pairs.

    S_hist/Y_hist are [m, D] with the newest pair at index m-1 (shift
    storage); entries with index < m - n_hist are invalid and masked out.
    """
    m = history
    valid = jnp.arange(m) >= (m - n_hist)

    q = g
    alphas = [None] * m
    for i in range(m - 1, -1, -1):
        alpha = rho[i] * jnp.vdot(S_hist[i], q)
        alpha = jnp.where(valid[i], alpha, 0.0)
        q = q - alpha * Y_hist[i]
        alphas[i] = alpha

    # Initial Hessian scaling from the newest pair.
    y_new = Y_hist[m - 1]
    s_new = S_hist[m - 1]
    yy = jnp.vdot(y_new, y_new)
    sy = jnp.vdot(s_new, y_new)
    gamma = jnp.where((n_hist > 0) & (yy > 0), sy / jnp.maximum(yy, 1e-20), 1.0)
    r = gamma * q

    for i in range(m):
        beta = rho[i] * jnp.vdot(Y_hist[i], r)
        beta = jnp.where(valid[i], beta, 0.0)
        r = r + S_hist[i] * (alphas[i] - beta)
    return -r


class _MinState(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    S_hist: jax.Array
    Y_hist: jax.Array
    rho: jax.Array
    n_hist: jax.Array
    it: jax.Array
    n_evals: jax.Array
    done: jax.Array
    converged: jax.Array
    t_prev: jax.Array
    # Aux-mode only: convergence confirmed under a FRESH aux (see the
    # outer refresh loop in minimize); always False on the plain path.
    sealed: jax.Array


def minimize(
    fun: Callable[..., jax.Array],
    x0: jax.Array,
    mask: Optional[jax.Array] = None,
    cfg: LBFGSConfig = LBFGSConfig(),
    aux_fn: Optional[Callable[[jax.Array], object]] = None,
    aux_refresh_fn: Optional[Callable[[jax.Array, object], object]] = None,
) -> LBFGSResult:
    """Minimize fun over the masked subspace of x0 with L-BFGS + strong Wolfe.

    fun: [D] -> scalar, differentiable.  mask: [D] 0/1 floats; zero entries
    are frozen (their gradient is zeroed, which keeps every search direction
    inside the free subspace).  vmap over (x0, mask) — and over fun's batch
    data via closure — gives the batched optimizer.

    aux_fn: optional `x -> aux` (any pytree, not differentiated).  When
    given, `fun` must take `(x, aux)`; aux is recomputed every
    `cfg.aux_every` L-BFGS iterations (at the then-current iterate) and
    every evaluation in between reuses it.  This is the hook for expensive
    non-differentiated preprocessing whose result changes slowly along the
    trajectory — e.g. the collision broad phase (ops/collision.py
    `.build`/`.apply`): the sort + compaction dominate the penalty's cost,
    and a strong-Wolfe search averages ~5 evaluations per iteration, so
    hoisting it out of the line search is a ~5x cut on that term.  (The
    reference reruns its BVH in every closure evaluation,
    smplifyx/fitting.py:439-455; this is a deliberate, measured divergence —
    stale pairs are AABB-rechecked inside apply.)

    aux_refresh_fn: optional `(x, aux_prev) -> aux` used for every refresh
    AFTER the initial `aux_fn(x0)`.  Lets the aux carry state that is
    cheaper to update than to rebuild — e.g. the collision broad phase's
    Morton permutation (`collision_fn.build_refresh` reuses the previous
    sort and re-runs only the funnel).  The initial aux still comes from
    `aux_fn`, and the refreshed aux must have the same pytree structure
    (it rides the outer while_loop carry).
    """
    D = x0.shape[0]
    dtype = x0.dtype
    m = cfg.history
    if mask is None:
        mask = jnp.ones_like(x0)

    def apply_mask(g):
        # where, NOT g * mask: a frozen coordinate's gradient is zero BY
        # DEFINITION, but the objective's gradient there may be NaN/Inf
        # (e.g. a normalize() at a degenerate frozen input) and NaN * 0 is
        # NaN — which would poison the search direction and move frozen
        # coordinates to NaN (this corrupted the classic preset's body
        # latent through the camera stage).
        return jnp.where(mask > 0, g, 0.0)

    if aux_fn is None:
        vg = jax.value_and_grad(fun)

        def masked_vg_aux(x, aux):
            del aux
            f, g = vg(x)
            return f, apply_mask(g)

        def val_aux(x, aux):
            del aux
            return fun(x)

    else:
        vg = jax.value_and_grad(fun)  # d/dx only; aux is positional data

        def masked_vg_aux(x, aux):
            f, g = vg(x, aux)
            return f, apply_mask(g)

        def val_aux(x, aux):
            return fun(x, aux)

    def make_eval(aux):
        return lambda x: masked_vg_aux(x, aux)

    def make_val(aux):
        # Value-only objective for armijo trials (no VJP graph).
        return lambda x: val_aux(x, aux)

    aux0 = aux_fn(x0) if aux_fn is not None else None
    f0, g0 = masked_vg_aux(x0, aux0)

    init = _MinState(
        x=x0, f=f0, g=g0,
        S_hist=jnp.zeros((m, D), dtype), Y_hist=jnp.zeros((m, D), dtype),
        rho=jnp.zeros((m,), dtype),
        n_hist=jnp.asarray(0, jnp.int32), it=jnp.asarray(0, jnp.int32),
        n_evals=jnp.asarray(1, jnp.int32),
        done=(jnp.max(jnp.abs(g0)) <= cfg.gtol) | ~jnp.isfinite(f0),
        converged=(jnp.max(jnp.abs(g0)) <= cfg.gtol) & jnp.isfinite(f0),
        t_prev=jnp.asarray(cfg.lr, dtype),
        sealed=jnp.asarray(False),
    )

    def cond(s: _MinState):
        under_budget = (cfg.max_evals <= 0) | (s.n_evals < cfg.max_evals)
        return (~s.done) & (s.it < cfg.max_iters) & under_budget

    def body(s: _MinState, eval_fn, val_fn) -> _MinState:
        first = s.n_hist == 0
        d = _two_loop(s.g, s.S_hist, s.Y_hist, s.rho, s.n_hist, m)
        d = jnp.where(first, -s.g, d)
        if cfg.max_dir_inf > 0:
            d_inf = jnp.max(jnp.abs(d))
            d = d * jnp.minimum(1.0, cfg.max_dir_inf / jnp.maximum(d_inf, 1e-20))
        gtd = jnp.vdot(s.g, d)

        # Reset to steepest descent if the direction is not a descent one.
        bad_dir = gtd > -cfg.tol_change
        d = jnp.where(bad_dir, -s.g, d)
        gtd = jnp.where(bad_dir, -jnp.vdot(s.g, s.g), gtd)

        g_abs_sum = jnp.sum(jnp.abs(s.g))
        if cfg.warm_start_step:
            # Start near the previously accepted step; growing 2x per
            # iteration lets it recover to the Newton step t=1 quickly.
            later_t = jnp.clip(2.0 * s.t_prev, 1e-5, cfg.lr)
        else:
            later_t = jnp.asarray(cfg.lr, dtype)
        t0 = jnp.where(
            first,
            jnp.minimum(1.0, 1.0 / jnp.maximum(g_abs_sum, 1e-20)) * cfg.lr,
            later_t,
        )

        if cfg.ls_mode == "armijo":
            t, f_new, g_new, ls_evals = _armijo_backtrack(
                val_fn, eval_fn, s.x, t0, d, s.f, s.g, gtd, cfg
            )
        else:
            t, f_new, g_new, ls_evals = _strong_wolfe(
                eval_fn, s.x, t0, d, s.f, s.g, gtd, cfg
            )

        # t == 0 (failed line search) must reproduce s.x EXACTLY: with a
        # non-finite direction (NaN gradient entries reaching d), the
        # algebraic form s.x + 0 * d is NaN — and f_new from the search's
        # best-point fallback is s.f (finite), so the non-finite f guard
        # below would NOT catch the poisoned iterate.
        step = jnp.where(t != 0.0, t * d, 0.0)
        x_new = s.x + step
        s_vec = step
        y_vec = g_new - s.g
        ys = jnp.vdot(y_vec, s_vec)
        push = ys > 1e-10

        # A zero-progress line search with a stale curvature history is not
        # convergence — wipe the history and retry from steepest descent;
        # only a failure from a fresh history means we are truly stuck.
        ls_failed = t == 0.0
        retry = ls_failed & (s.n_hist > 0)
        push = push & ~ls_failed

        S_hist = jnp.where(
            push, jnp.concatenate([s.S_hist[1:], s_vec[None]], axis=0), s.S_hist
        )
        Y_hist = jnp.where(
            push, jnp.concatenate([s.Y_hist[1:], y_vec[None]], axis=0), s.Y_hist
        )
        rho = jnp.where(
            push,
            jnp.concatenate([s.rho[1:], (1.0 / jnp.maximum(ys, 1e-20))[None]]),
            s.rho,
        )
        n_hist = jnp.where(
            retry, 0, jnp.where(push, jnp.minimum(s.n_hist + 1, m), s.n_hist)
        )

        # Termination (reference FittingMonitor semantics).
        non_finite = ~jnp.isfinite(f_new)
        rel = (s.f - f_new) / jnp.maximum(
            jnp.maximum(jnp.abs(s.f), jnp.abs(f_new)), 1.0
        )
        # (With aux_fn, s.f was re-evaluated under the fresh aux above, so
        # the line search's descent guarantee keeps rel >= 0 here too.)
        small_f = rel <= cfg.ftol
        small_g = jnp.max(jnp.abs(g_new)) <= cfg.gtol
        small_step = jnp.max(jnp.abs(s_vec)) <= cfg.tol_change
        conv = (small_f | small_g | small_step) & ~retry

        # On a non-finite eval keep the previous iterate.
        x_out = jnp.where(non_finite, s.x, x_new)
        f_out = jnp.where(non_finite, s.f, f_new)
        g_out = jnp.where(non_finite, s.g, g_new)

        return _MinState(
            x=x_out, f=f_out, g=g_out,
            S_hist=S_hist, Y_hist=Y_hist, rho=rho, n_hist=n_hist,
            it=s.it + 1, n_evals=s.n_evals + ls_evals,
            done=non_finite | conv,
            converged=conv & ~non_finite,
            t_prev=jnp.where(t > 0, t, s.t_prev),
            sealed=s.sealed,
        )

    if aux_fn is None:
        plain_eval = make_eval(None)
        plain_val = make_val(None)
        final = jax.lax.while_loop(
            cond, lambda s: body(s, plain_eval, plain_val), init)
    else:
        # Nested loops, NOT a lax.cond on (it % aux_every): under vmap a
        # batched cond predicate lowers to select — BOTH branches would
        # execute for every lane, so the refresh would never be skipped.
        # The outer loop body rebuilds aux unconditionally (once per
        # period, vectorized across lanes); the inner bounded while runs
        # up to aux_every L-BFGS iterations against the frozen aux.
        #
        # Convergence inside a period is only PROVISIONAL: the lane
        # minimized the stale-aux objective.  The next refresh either
        # confirms it (fresh gradient still within gtol -> the outer loop
        # exits) or reopens the lane.  Without this, a lane could stop on
        # a stationary point of an outdated collision pair list.
        K = max(1, cfg.aux_every)

        def outer_cond(carry):
            s, _ = carry
            under_budget = (cfg.max_evals <= 0) | (s.n_evals < cfg.max_evals)
            return (~s.sealed) & (s.it < cfg.max_iters) & under_budget

        def outer_body(carry):
            s, aux_prev = carry
            # f/g MUST be re-evaluated under the fresh aux: a stale Armijo
            # reference makes every line-search trial look like an ascent
            # (t -> 0, spurious convergence).  Costs one evaluation per
            # refresh period.
            if aux_refresh_fn is not None:
                aux = aux_refresh_fn(s.x, aux_prev)
            else:
                aux = aux_fn(s.x)
            eval_fn = make_eval(aux)
            val_fn = make_val(aux)
            f_cur, g_cur = eval_fn(s.x)
            g_small = jnp.max(jnp.abs(g_cur)) <= cfg.gtol
            # Seal on f-stationarity too: a lane that converged via ftol /
            # tol_change inside the period essentially never reaches gtol
            # (1e-9) in f32, so a gtol-only confirm reopens it every refresh
            # and the stationary-point line search burns up to max_ls evals
            # per period — collision stages would always run to max_iters.
            # If the FRESH aux leaves the objective within ftol of the
            # converged stale-aux value, the refresh changed nothing the
            # optimizer can act on.
            f_rel = jnp.abs(f_cur - s.f) / jnp.maximum(
                jnp.maximum(jnp.abs(f_cur), jnp.abs(s.f)), 1.0
            )
            f_stationary = f_rel <= cfg.ftol
            confirm = s.done & (g_small | f_stationary | ~jnp.isfinite(f_cur))
            s = s._replace(f=f_cur, g=g_cur, n_evals=s.n_evals + 1,
                           sealed=confirm, done=confirm,
                           converged=s.converged & confirm)
            period_end = s.it + K

            def inner_cond(t: _MinState):
                return cond(t) & (t.it < period_end)

            s = jax.lax.while_loop(
                inner_cond, lambda t: body(t, eval_fn, val_fn), s)
            return (s, aux)

        final, _ = jax.lax.while_loop(outer_cond, outer_body, (init, aux0))
    return LBFGSResult(
        x=final.x, f=final.f, g=final.g,
        n_iters=final.it, n_evals=final.n_evals, converged=final.converged,
    )
