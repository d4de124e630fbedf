"""Benchmark/example model families (BASELINE.json configs 1-5).

Reference parity: Brancher ships its models as examples/notebooks
(SURVEY.md §2 "Examples": AR time series, Bayesian logistic regression,
VAE, ...).  Here each family is a reusable constructor shared by tests,
bench.py and the graft entry points.
"""

from .conjugate import conjugate_normal_model
from .logistic_regression import logistic_regression_model, make_logreg_data
from .autoregressive import ar_model, make_ar_data
from .state_space import lgssm_model, lgssm_state_space, kalman_filter, make_lgssm_data
from .vae import vae_model, VAEConfig
