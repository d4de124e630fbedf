"""Inference engines: SVI, point estimation, HMC/NUTS, SMC, WVGD.

Reference parity: Brancher's ``inference.py`` exposes
``perform_inference`` plus inference-method classes (SURVEY.md §2
"Inference driver", §3.4).  The TPU rebuild keeps that surface and adds
the net-new samplers required by BASELINE.json (NUTS/HMC, SMC) as
first-class engines.
"""

from .svi import (
    perform_inference,
    ReverseKL,
    MaximumLikelihood,
    MAP,
    SteinVariationalGradientDescent,
    WassersteinVariationalGradientDescent,
)
from .gradient_estimators import (
    PathwiseDerivativeEstimator,
    BlackBoxEstimator,
    Taylor1Estimator,
)
from .hmc import HMC, hmc_sample
from .nuts import NUTS, nuts_sample
from .mcmc import sample, MCMCResult
from .chees import ChEESHMC, chees_hmc
from .smc import smc_sample, SMCResult
from .streaming_smc import (
    StreamingSMC,
    StreamingResult,
    streaming_particle_filter,
)
from .tempered_smc import smc_posterior_sample, tempered_smc, TemperedSMCResult
from .diagnostics import (
    effective_sample_size,
    folded_rhat,
    max_rhat,
    potential_scale_reduction,
    rank_normalized_rhat,
)
from .pmmh import PMMHResult, pmmh_sample
from .particle_gibbs import PGResult, particle_gibbs_sample
