"""Inference layer: type-II MLE and fully Bayesian NUTS/HMC.

The reference ships derivatives, not optimizers/samplers (SURVEY.md §4.4);
BASELINE.json configs #2/#3/#5 make both first-class subsystems here.
"""

from gaussian_processes_tpu.inference.adaptation import (
    DualAveragingState,
    WelfordState,
    build_warmup_schedule,
)
from gaussian_processes_tpu.inference.nuts import (
    ChainState,
    collect,
    warmup,
    NUTSResult,
    SamplerState,
    init_chain,
    init_sampler_state,
    nuts_transition,
    sample_nuts,
    sample_step,
    warmup_step,
)
from gaussian_processes_tpu.inference.gp_model import (
    init_positions,
    make_log_likelihood,
    make_log_posterior,
    make_log_posterior_iterative,
    make_log_posterior_whittle,
    make_log_posterior_whittle_kron,
    n_hypers,
    pack,
    unpack,
)
from gaussian_processes_tpu.inference.mle import MLEResult, fit_mle, fit_mle_restarts
from gaussian_processes_tpu.inference.diagnostics import ess, split_rhat, summarize
from gaussian_processes_tpu.inference.chees import CheesResult, CheesState, sample_chees

__all__ = [
    "DualAveragingState",
    "WelfordState",
    "build_warmup_schedule",
    "ChainState",
    "collect",
    "warmup",
    "NUTSResult",
    "SamplerState",
    "init_chain",
    "init_sampler_state",
    "nuts_transition",
    "sample_nuts",
    "sample_step",
    "warmup_step",
    "init_positions",
    "make_log_likelihood",
    "make_log_posterior",
    "make_log_posterior_iterative",
    "make_log_posterior_whittle",
    "make_log_posterior_whittle_kron",
    "n_hypers",
    "pack",
    "unpack",
    "MLEResult",
    "fit_mle",
    "fit_mle_restarts",
    "ess",
    "CheesResult",
    "CheesState",
    "sample_chees",
    "split_rhat",
    "summarize",
]
