"""Warmup adaptation for HMC/NUTS: step size and mass matrix.

The reference ships no sampler (SURVEY.md §1: the log-likelihood gradient
API is the hook external samplers use); fully Bayesian hyperparameter
inference is a required first-class subsystem of this framework
(BASELINE.json:5,9,11).  This module provides the two adaptation
ingredients, designed to be ``jit``/``vmap``/``shard_map``-safe:

* **Dual averaging** (Nesterov primal-dual) of the log step size toward a
  target acceptance statistic.
* **Welford** running mean/variance of the positions, pooled across all
  chains (and, under ``shard_map``, across devices via ``pmean`` — see
  ``parallel/sharded.py``), regularized toward the identity.
* A **windowed warmup schedule**: a step-size-only init buffer, doubling
  "slow" windows in which the mass matrix is estimated (applied at each
  window end, with the step size re-initialized), and a step-size-only
  term buffer.  The schedule is computed in plain numpy at trace time and
  enters the scan as static per-step flag arrays, so the adaptive logic
  is branch-free inside ``jit``.

All state containers are frozen pytree dataclasses; every update is a pure
function ``state -> state``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Dual averaging (step size)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DualAveragingState:
    """Primal-dual averaging state for log step size."""

    log_step: jax.Array
    log_avg_step: jax.Array
    avg_error: jax.Array  # running weighted average of (target - accept)
    count: jax.Array  # adaptation steps taken in the current window
    mu: jax.Array  # shrinkage target (log of 10x initial step)


def da_init(step_size) -> DualAveragingState:
    log_step = jnp.log(jnp.asarray(step_size))
    zero = jnp.zeros_like(log_step)
    return DualAveragingState(
        log_step=log_step,
        log_avg_step=log_step,
        avg_error=zero,
        count=jnp.zeros((), jnp.int32),
        mu=jnp.log(10.0) + log_step,
    )


def da_update(
    state: DualAveragingState,
    accept_prob: jax.Array,
    target_accept: float = 0.8,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> DualAveragingState:
    t = state.count + 1
    tf = t.astype(state.log_step.dtype)
    eta_h = 1.0 / (tf + t0)
    avg_error = (1.0 - eta_h) * state.avg_error + eta_h * (
        target_accept - accept_prob
    )
    log_step = state.mu - jnp.sqrt(tf) / gamma * avg_error
    eta = tf ** (-kappa)
    log_avg_step = eta * log_step + (1.0 - eta) * state.log_avg_step
    return DualAveragingState(
        log_step=log_step,
        log_avg_step=log_avg_step,
        avg_error=avg_error,
        count=t,
        mu=state.mu,
    )


def da_restart(state: DualAveragingState, step_size) -> DualAveragingState:
    """Re-initialize after a mass-matrix update (new window)."""
    return da_init(step_size)


# ---------------------------------------------------------------------------
# Welford (mass matrix)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WelfordState:
    """Running mean/M2 over position draws; ``mean``/``m2`` shape (D,)."""

    mean: jax.Array
    m2: jax.Array
    count: jax.Array


def welford_init(dim: int, dtype=jnp.float32) -> WelfordState:
    return WelfordState(
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
        count=jnp.zeros((), dtype),
    )


def welford_update_batch(state: WelfordState, x: jax.Array) -> WelfordState:
    """Fold a batch of draws x with shape (C, D) into the running moments.

    Chan et al. parallel update: exact pooled mean/M2 for the batch, then
    merge with the running state; one call per warmup step folds all local
    chains at once.
    """
    c = jnp.asarray(x.shape[0], state.count.dtype)
    bmean = jnp.mean(x, axis=0)
    bm2 = jnp.sum(jnp.square(x - bmean), axis=0)
    return welford_merge(
        state, WelfordState(mean=bmean, m2=bm2, count=c)
    )


def welford_merge(a: WelfordState, b: WelfordState) -> WelfordState:
    """Merge two independent Welford accumulators (exact)."""
    n = a.count + b.count
    safe_n = jnp.maximum(n, 1.0)
    delta = b.mean - a.mean
    mean = a.mean + delta * (b.count / safe_n)
    m2 = a.m2 + b.m2 + jnp.square(delta) * (a.count * b.count / safe_n)
    return WelfordState(mean=mean, m2=m2, count=n)


def welford_variance(state: WelfordState, regularize: bool = True) -> jax.Array:
    """(Regularized) sample variance — the diagonal inverse mass matrix.

    Shrinks toward 1e-3 with weight 5/(n+5), keeping early-window
    estimates well-conditioned.
    """
    n = state.count
    var = state.m2 / jnp.maximum(n - 1.0, 1.0)
    if regularize:
        w = n / (n + 5.0)
        var = w * var + (1.0 - w) * 1e-3
    return var


# ---------------------------------------------------------------------------
# Warmup window schedule
# ---------------------------------------------------------------------------


def build_warmup_schedule(
    num_warmup: int,
    init_buffer: int = 75,
    term_buffer: int = 50,
    first_window: int = 25,
):
    """Per-step flags for the windowed warmup, as static numpy bool arrays.

    Returns a dict with, for each warmup step i:
      in_slow[i]     — positions at step i feed the Welford estimator
      window_end[i]  — after step i, refresh inv-mass from Welford,
                       reset Welford, and restart dual averaging
      last[i]        — i is the final warmup step (finalize step size)

    For short warmups (< init+term+first), everything collapses to
    step-size-only adaptation (no mass-matrix windows), like Stan.
    """
    in_slow = np.zeros(num_warmup, dtype=bool)
    window_end = np.zeros(num_warmup, dtype=bool)
    last = np.zeros(num_warmup, dtype=bool)
    if num_warmup > 0:
        last[num_warmup - 1] = True
    if num_warmup >= init_buffer + term_buffer + first_window:
        slow_lo = init_buffer
        slow_hi = num_warmup - term_buffer
        in_slow[slow_lo:slow_hi] = True
        # doubling windows: sizes first_window, 2*first_window, ... with the
        # final window absorbing the remainder up to slow_hi.
        size = first_window
        pos = slow_lo
        while pos < slow_hi:
            end = pos + size
            if end + 2 * size > slow_hi:
                end = slow_hi
            window_end[min(end, slow_hi) - 1] = True
            pos = end
            size *= 2
    return {
        "in_slow": jnp.asarray(in_slow),
        "window_end": jnp.asarray(window_end),
        "last": jnp.asarray(last),
    }
