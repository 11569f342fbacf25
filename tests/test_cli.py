"""CLI / config plumbing tests (SURVEY.md §6.6): every task path in
``run_config`` on tiny workloads, plus argument handling."""

import dataclasses
import json

import numpy as np
import pytest

from gaussian_processes_tpu import cli
from gaussian_processes_tpu.utils import CONFIGS, make_data, make_kernel
from gaussian_processes_tpu.utils.config import DataConfig, MLEConfig, NUTSConfig


def _tiny(name, **kw):
    cfg = CONFIGS[name]
    return dataclasses.replace(cfg, **kw)


def test_run_config_fit(tmp_path):
    cfg = _tiny(
        "config1_fit_se500",
        data=DataConfig(n=64, n_test=32),
        metrics_path=str(tmp_path / "m.jsonl"),
    )
    s = cli.run_config(cfg)
    assert np.isfinite(s["log_marginal"])
    assert s["pred_rmse_vs_truth"] < 0.2
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert {r["event"] for r in lines} >= {"start", "summary"}


@pytest.mark.slow
def test_run_config_mle():
    cfg = _tiny(
        "config2_mle_periodic",
        data=DataConfig(n=48),
        mle=MLEConfig(num_steps=20, n_restarts=2),
    )
    s = cli.run_config(cfg)
    assert np.isfinite(s["log_marginal"])
    assert len(s["theta"]) == 4  # h, w, p, noise


def test_run_config_nuts_tiny():
    cfg = _tiny(
        "config3_nuts_64",
        data=DataConfig(n=24),
        nuts=NUTSConfig(n_chains=2, num_warmup=20, num_samples=10, max_depth=5),
    )
    s = cli.run_config(cfg)
    assert s["n_chains"] == 2 and s["n_samples"] == 10
    assert 0 <= s["divergence_frac"] <= 1
    assert "diagnostics" in s


def test_make_kernel_families():
    import gaussian_processes_tpu as gpt
    from gaussian_processes_tpu.utils.config import KernelConfig

    assert isinstance(make_kernel(KernelConfig("se")), gpt.GaussianKernel)
    assert isinstance(make_kernel(KernelConfig("periodic")), gpt.PeriodicKernel)
    assert isinstance(make_kernel(KernelConfig("matern32")), gpt.Matern32Kernel)
    assert isinstance(make_kernel(KernelConfig("matern52")), gpt.Matern52Kernel)
    assert isinstance(make_kernel(KernelConfig("rq")), gpt.RationalQuadraticKernel)
    with pytest.raises(ValueError, match="unknown kernel"):
        make_kernel(KernelConfig("nope"))


def test_cli_main_list_and_unknown(capsys):
    assert cli.main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "config3_nuts_64" in out
    assert cli.main(["not_a_config"]) == 2


def test_run_config_chees_tiny():
    cfg = _tiny(
        "config3_chees_64",
        data=DataConfig(n=24),
        nuts=NUTSConfig(n_chains=2, num_warmup=20, num_samples=10),
    )
    s = cli.run_config(cfg)
    assert s["n_chains"] == 2 and s["n_samples"] == 10
    assert np.isfinite(s["step_size"])


def test_run_config_fit_large_tiny():
    cfg = _tiny("config4_large_n", data=DataConfig(n=96))
    s = cli.run_config(cfg)
    assert np.isfinite(s["log_marginal"])
    assert "block_size" in s


@pytest.mark.slow
def test_run_config_bayes_grid_tiny():
    cfg = _tiny(
        "grid1m_bayes_whittle",
        data=DataConfig(n=512, freq=3.0, layout="grid"),
        nuts=NUTSConfig(n_chains=2, num_warmup=20, num_samples=10,
                        prior_std=1.0, chunk_size=5),
    )
    s = cli.run_config(cfg)
    assert s["n_chains"] == 2 and s["n_samples"] == 10
    assert np.all(np.isfinite(np.asarray(s["posterior_mean"])))


def test_make_data_grid_layout_closes_circle():
    cfg = DataConfig(n=128, layout="grid", x_lo=-1.0, x_hi=1.0)
    x, y, xo = make_data(cfg)
    d = np.diff(x)
    np.testing.assert_allclose(d, d[0], rtol=1e-12)
    # endpoint-exclusive: x[-1] + dx == x_hi (the circle closes exactly)
    np.testing.assert_allclose(x[-1] + d[0], 1.0, atol=1e-12)
