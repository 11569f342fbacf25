"""Diagnostics unit tests: R-hat and ESS against analytic expectations."""

import numpy as np

from gaussian_processes_tpu.inference.diagnostics import ess, split_rhat, summarize


def _iid_draws(S=2000, C=4, D=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((S, C, D))


def _ar1_draws(phi, S=4000, C=4, seed=1):
    rng = np.random.default_rng(seed)
    x = np.zeros((S, C, 1))
    innov = rng.standard_normal((S, C, 1)) * np.sqrt(1 - phi ** 2)
    for t in range(1, S):
        x[t] = phi * x[t - 1] + innov[t]
    return x


def test_rhat_near_one_for_mixed_chains():
    r = split_rhat(_iid_draws())
    assert np.all(r < 1.01)


def test_rhat_flags_unmixed_chains():
    draws = _iid_draws()
    draws[:, 0, :] += 5.0  # one chain stuck elsewhere
    r = split_rhat(draws)
    assert np.all(r > 1.5)


def test_ess_iid_close_to_sample_count():
    draws = _iid_draws(S=2000, C=4)
    e = ess(draws)
    total = 2000 * 4
    assert np.all(e > 0.6 * total) and np.all(e < 1.6 * total)


def test_ess_ar1_matches_theory():
    phi = 0.9
    draws = _ar1_draws(phi)
    e = float(ess(draws)[0])
    total = draws.shape[0] * draws.shape[1]
    expected = total * (1 - phi) / (1 + phi)  # tau = (1+phi)/(1-phi)
    assert 0.5 * expected < e < 2.0 * expected


def test_summarize_keys():
    s = summarize(_iid_draws(), wall_s=2.0)
    assert set(s) >= {"mean", "sd", "split_rhat", "ess", "min_ess", "max_rhat",
                      "ess_per_s"}
    assert s["ess_per_s"] > 0
