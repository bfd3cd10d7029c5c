"""Generic Gauss-Newton / Levenberg-Marquardt engine on manifolds.

TPU-native replacement for the reference's templated `NLLSSolver<D,T>`
(include/ygz/Algorithm/NLSSolver.h:26-150 + NLSSolver_impl.hpp:16-212,
the SVO/vikit solver): Gauss-Newton with rollback-on-chi2-increase and
Levenberg-Marquardt with the mu/nu trust-region schedule — re-expressed
as `lax.while_loop`s over a state pytree so the whole optimization is
one fused XLA computation (no host round-trips per iteration).

The model is supplied as a single function
    compute(x) -> (H [D, D], b [D], chi2 scalar)
already accumulated over (masked) residuals; `retract(x, dx)` applies
the manifold update (for SE(3): left-multiplicative exp(dx) * x,
matching SparseImageAlign.cpp:233-238 — note the solver negates b so
callers accumulate b = -J^T r like the reference's Jres).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, TypeVar

import jax
import jax.numpy as jnp

X = TypeVar("X")


class SolveStats(NamedTuple):
    chi2: jnp.ndarray       # final chi2
    iters: jnp.ndarray      # iterations actually taken
    converged: jnp.ndarray  # update norm fell below eps
    H: jnp.ndarray | None = None  # Hessian at the final state (GN only)


def _solve_spd(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve H dx = b for small dense SPD H via Cholesky; falls back to
    a tiny-damped system when H is near-singular (masked features can
    zero rows)."""
    D = H.shape[-1]
    Hd = H + 1e-8 * jnp.eye(D, dtype=H.dtype)
    L = jnp.linalg.cholesky(Hd)
    # cho_solve via triangular solves.
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    ok = jnp.all(jnp.isfinite(dx))
    return jnp.where(ok, dx, jnp.zeros_like(dx))


def gauss_newton(
    compute: Callable,
    retract: Callable,
    x0,
    n_iter: int = 10,
    eps: float = 1e-10,
) -> tuple[object, SolveStats]:
    """Gauss-Newton with rollback, semantics of optimizeGaussNewton
    (NLSSolver_impl.hpp:16-89): at each iteration solve H dx = b; if
    the new chi2 increases, roll back to the previous state and stop;
    stop when max|dx| < eps.

    compute(x) must return (H, b, chi2) with b = -J^T W r.
    """

    class Carry(NamedTuple):
        x: object
        H: jnp.ndarray
        b: jnp.ndarray
        chi2: jnp.ndarray
        it: jnp.ndarray
        stop: jnp.ndarray
        converged: jnp.ndarray

    H0, b0, chi20 = compute(x0)

    def cond(c: Carry):
        return (~c.stop) & (c.it < n_iter)

    def body(c: Carry):
        # The carried (H, b, chi2) were evaluated at c.x, so each
        # iteration calls compute() exactly ONCE (at the trial point) —
        # the naive solve-then-reevaluate structure costs two residual
        # passes per iteration, and compute() dominates the loop.
        dx = _solve_spd(c.H, c.b)
        x_new = retract(c.x, dx)
        H_new, b_new, chi2_new = compute(x_new)
        worse = chi2_new > c.chi2
        converged = jnp.max(jnp.abs(dx)) < eps
        x_next = jax.tree.map(
            lambda a, bnew: jnp.where(worse, a, bnew), c.x, x_new
        )
        return Carry(
            x=x_next,
            H=jnp.where(worse, c.H, H_new),
            b=jnp.where(worse, c.b, b_new),
            chi2=jnp.where(worse, c.chi2, chi2_new),
            it=c.it + 1,
            stop=worse | converged,
            converged=c.converged | converged,
        )

    # Flags derive from chi20 so their sharding "varying-ness" matches
    # the loop body under shard_map (a literal False is unvarying and
    # trips the while_loop carry-type check on a mesh).
    false_like = chi20 < 0.0  # chi2 >= 0 always
    init = Carry(
        x=x0,
        H=H0,
        b=b0,
        chi2=chi20,
        it=jnp.asarray(0, jnp.int32),
        stop=false_like,
        converged=false_like,
    )
    out = jax.lax.while_loop(cond, body, init)
    # The carried (H, chi2) were evaluated at out.x, so callers that
    # want the final Hessian/chi2 need no extra compute() pass.
    return out.x, SolveStats(out.chi2, out.it, out.converged, out.H)


def levenberg_marquardt(
    compute: Callable,
    retract: Callable,
    x0,
    n_iter: int = 15,
    n_trials_max: int = 5,
    eps: float = 1e-10,
    mu_init: float = 0.01,
) -> tuple[object, SolveStats]:
    """Levenberg-Marquardt with the mu/nu schedule of
    optimizeLevenbergMarquardt (NLSSolver_impl.hpp:92-212): accepted
    steps scale mu by max(1/3, 1-(2*rho-1)^3) and reset nu=2; rejected
    trials set mu *= nu, nu *= 2, up to n_trials_max per iteration.
    """

    class Carry(NamedTuple):
        x: object
        chi2: jnp.ndarray
        mu: jnp.ndarray
        nu: jnp.ndarray
        it: jnp.ndarray
        stop: jnp.ndarray
        converged: jnp.ndarray

    _, _, chi20 = compute(x0)

    def cond(c: Carry):
        return (~c.stop) & (c.it < n_iter)

    def body(c: Carry):
        H, b, _ = compute(c.x)
        D = b.shape[0]

        class Trial(NamedTuple):
            x: object
            chi2: jnp.ndarray
            mu: jnp.ndarray
            nu: jnp.ndarray
            accepted: jnp.ndarray
            trials: jnp.ndarray
            dx_norm: jnp.ndarray

        def trial_cond(t: Trial):
            return (~t.accepted) & (t.trials < n_trials_max)

        def trial_body(t: Trial):
            Hd = H + t.mu * jnp.eye(D, dtype=H.dtype)
            dx = _solve_spd(Hd, b)
            x_new = retract(c.x, dx)
            _, _, chi2_new = compute(x_new)
            # Gain ratio: actual reduction / predicted reduction.
            pred = 0.5 * jnp.dot(dx, t.mu * dx + b)
            rho = (c.chi2 - chi2_new) / jnp.maximum(pred, 1e-12)
            accept = (rho > 0) & jnp.isfinite(chi2_new)
            factor = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            mu_acc = t.mu * factor
            mu_rej = t.mu * t.nu
            x_next = jax.tree.map(
                lambda a, bnew: jnp.where(accept, bnew, a), t.x, x_new
            )
            return Trial(
                x=x_next,
                chi2=jnp.where(accept, chi2_new, t.chi2),
                mu=jnp.where(accept, mu_acc, mu_rej),
                nu=jnp.where(accept, jnp.asarray(2.0, t.nu.dtype), t.nu * 2.0),
                accepted=accept,
                trials=t.trials + 1,
                dx_norm=jnp.max(jnp.abs(dx)),
            )

        t0 = Trial(
            x=c.x,
            chi2=c.chi2,
            mu=c.mu,
            nu=c.nu,
            accepted=jnp.asarray(False),
            trials=jnp.asarray(0, jnp.int32),
            dx_norm=jnp.asarray(jnp.inf, c.chi2.dtype),
        )
        t = jax.lax.while_loop(trial_cond, trial_body, t0)
        converged = t.accepted & (t.dx_norm < eps)
        return Carry(
            x=t.x,
            chi2=t.chi2,
            mu=t.mu,
            nu=t.nu,
            it=c.it + 1,
            stop=(~t.accepted) | converged,
            converged=c.converged | converged,
        )

    false_like = chi20 < 0.0  # varying-ness follows the data (shard_map)
    init = Carry(
        x=x0,
        chi2=chi20,
        mu=jnp.asarray(mu_init, chi20.dtype) + 0.0 * chi20,
        nu=jnp.asarray(2.0, chi20.dtype) + 0.0 * chi20,
        it=jnp.asarray(0, jnp.int32),
        stop=false_like,
        converged=false_like,
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.x, SolveStats(out.chi2, out.it, out.converged)
