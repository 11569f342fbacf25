from gaussian_processes_tpu.models.base import Kernel, pairwise_diff
from gaussian_processes_tpu.models.gaussian import GaussianKernel
from gaussian_processes_tpu.models.periodic import PeriodicKernel
from gaussian_processes_tpu.models.matern import Matern32Kernel, Matern52Kernel
from gaussian_processes_tpu.models.rq import RationalQuadraticKernel
from gaussian_processes_tpu.models.composite import ProductKernel, SumKernel
from gaussian_processes_tpu.models.ard import ARDGaussianKernel
from gaussian_processes_tpu.models.iterative_gp import (
    IterativePosterior,
    fit_iterative,
    fit_mle_iterative,
    log_marginal_value_and_grad_iterative,
    predict_diag_iterative,
    predict_mean_iterative,
)
from gaussian_processes_tpu.models.gp import (
    GPPosterior,
    build_kxx,
    fit,
    predict,
    predict_diag,
    sample_posterior,
    log_predictive_density,
    log_marginal_likelihood,
    log_marginal_value_and_grad,
    log_marginal_hessian,
    log_marginal_all,
    likelihood_value_grad_hessian,
)
from gaussian_processes_tpu.models.sgpr import (
    SGPRPosterior,
    elbo_sgpr,
    fit_sgpr,
    fit_sgpr_mle,
    inducing_grid,
    inducing_subset,
    kmeans_inducing,
    make_log_posterior_sgpr,
    predict_sgpr,
    predict_sgpr_cov,
    sample_sgpr_posterior,
    select_inducing,
)
from gaussian_processes_tpu.models.gp_object import GP

__all__ = [
    "Kernel",
    "pairwise_diff",
    "GaussianKernel",
    "PeriodicKernel",
    "Matern32Kernel",
    "Matern52Kernel",
    "RationalQuadraticKernel",
    "SumKernel",
    "ProductKernel",
    "ARDGaussianKernel",
    "IterativePosterior",
    "fit_iterative",
    "fit_mle_iterative",
    "log_marginal_value_and_grad_iterative",
    "predict_diag_iterative",
    "predict_mean_iterative",
    "GPPosterior",
    "build_kxx",
    "fit",
    "predict",
    "predict_diag",
    "sample_posterior",
    "log_predictive_density",
    "log_marginal_likelihood",
    "log_marginal_value_and_grad",
    "log_marginal_hessian",
    "log_marginal_all",
    "likelihood_value_grad_hessian",
    "SGPRPosterior",
    "elbo_sgpr",
    "fit_sgpr",
    "fit_sgpr_mle",
    "inducing_grid",
    "inducing_subset",
    "kmeans_inducing",
    "make_log_posterior_sgpr",
    "predict_sgpr",
    "predict_sgpr_cov",
    "sample_sgpr_posterior",
    "select_inducing",
    "GP",
]
