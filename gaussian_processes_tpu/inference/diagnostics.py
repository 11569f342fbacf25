"""MCMC convergence diagnostics: split-R-hat and effective sample size.

The reference ships no sampler, hence no diagnostics; the Tier-3
statistical gates (SURVEY.md §5: "R-hat/ESS gates, Monte-Carlo-error
tolerance") and the honest throughput metric (effective samples/s, not
raw draws/s) both need these.  Host-side numpy post-processing — not a
hot path — implementing the standard split-chain potential scale
reduction and the FFT-autocorrelation ESS with Geyer's initial monotone
sequence truncation.

Input convention everywhere: ``draws`` with shape (S, C, D) — samples,
chains, dimensions — as produced by ``sample_nuts``.
"""

from __future__ import annotations

import numpy as np


def _split_chains(draws: np.ndarray) -> np.ndarray:
    """(S, C, D) -> (S//2, 2C, D): each chain halved."""
    S = draws.shape[0] - (draws.shape[0] % 2)
    half = S // 2
    a = draws[:half]
    b = draws[half:S]
    return np.concatenate([a, b], axis=1)


def split_rhat(draws: np.ndarray) -> np.ndarray:
    """Split potential scale reduction factor per dimension, shape (D,).

    Values near 1 indicate mixed chains; > 1.01 is cause for concern.
    """
    x = _split_chains(np.asarray(draws, float))
    m, c, d = x.shape
    chain_mean = x.mean(axis=0)  # (2C, D)
    chain_var = x.var(axis=0, ddof=1)  # (2C, D)
    W = chain_var.mean(axis=0)
    B = m * chain_mean.var(axis=0, ddof=1)
    var_plus = (m - 1) / m * W + B / m
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.sqrt(var_plus / W)


def _autocov_fft(x: np.ndarray) -> np.ndarray:
    """Autocovariance of a 1-D series via FFT, biased (divided by n)."""
    n = x.shape[0]
    x = x - x.mean()
    nfft = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, nfft)
    acov = np.fft.irfft(f * np.conjugate(f), nfft)[:n].real
    return acov / n


def ess(draws: np.ndarray) -> np.ndarray:
    """Bulk effective sample size per dimension, shape (D,).

    Combines chains a la Stan: mean autocovariance across (split) chains,
    between-chain correction through var_plus, paired-sum (Geyer) series
    truncated at the first non-positive pair and enforced monotone.
    """
    x = _split_chains(np.asarray(draws, float))
    m, c, d = x.shape
    out = np.empty(d)
    for k in range(d):
        acovs = np.stack([_autocov_fft(x[:, j, k]) for j in range(c)])
        mean_acov = acovs.mean(axis=0)  # (m,)
        chain_var = acovs[:, 0] * m / (m - 1.0)
        W = chain_var.mean()
        B_over_m = x.mean(axis=0)[:, k].var(ddof=1) if c > 1 else 0.0
        var_plus = W * (m - 1.0) / m + B_over_m
        if var_plus <= 0 or not np.isfinite(var_plus):
            out[k] = np.nan
            continue
        rho = 1.0 - (W - mean_acov) / var_plus  # (m,)
        # Geyer paired sums: P_t = rho_{2t} + rho_{2t+1}, truncated at the
        # first non-positive pair; tau = -1 + 2 * sum of monotone pairs
        n_pairs = (m - 1) // 2
        pairs = []
        for t in range(n_pairs):
            p = rho[2 * t] + rho[2 * t + 1]
            if p <= 0:
                break
            pairs.append(p)
        # enforce monotone non-increasing
        for i in range(1, len(pairs)):
            pairs[i] = min(pairs[i], pairs[i - 1])
        tau = -1.0 + 2.0 * float(np.sum(pairs))
        tau = max(tau, 1.0 / np.log10(m + 10))  # guard absurd anti-correlation
        out[k] = m * c / tau
    return out


def summarize(draws: np.ndarray, wall_s: float | None = None) -> dict:
    """Standard diagnostic summary for a (S, C, D) draw array."""
    draws = np.asarray(draws, float)
    r = split_rhat(draws)
    e = ess(draws)
    flat = draws.reshape(-1, draws.shape[-1])
    out = {
        "mean": flat.mean(0).tolist(),
        "sd": flat.std(0).tolist(),
        "split_rhat": r.tolist(),
        "ess": e.tolist(),
        "min_ess": float(np.nanmin(e)),
        "max_rhat": float(np.nanmax(r)),
    }
    if wall_s is not None:
        out["ess_per_s"] = float(np.nanmin(e) / wall_s)
    return out
