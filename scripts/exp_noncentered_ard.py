"""Centered vs NON-CENTERED ARD logreg (VERDICT r3 #9 / weak #4).

The bench unsaturated companion (centered w ~ N(0, tau)) sampled with
~468 divergences at target_accept=0.9 — funnel geometry.  This measures,
at CPU prototype scale, whether the NonCenteredNormalVariable
reparameterization (w = tau * w_raw, w_raw ~ N(0,1)) kills the
divergences, and what it does to the min-ESS/cap ratio (the headline
must stay UNSATURATED: min_ess < 0.9 * cap, VERDICT r3 #2).

ESS is measured on the same physical quantities in both runs: (w, tau).
For the non-centered run w is a deterministic node (ess_vars).

Run: python scripts/exp_noncentered_ard.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import brancher_tpu.functions as BF
from brancher_tpu import (
    BernoulliVariable, LogNormalVariable, NonCenteredNormalVariable,
    NormalVariable, ProbabilisticModel,
)
from brancher_tpu.models.logistic_regression import make_logreg_data
from brancher_tpu.inference import sample, NUTS

UNSAT_N, DIM, TAU_SD = 100, 32, 0.75
CHAINS, WARMUP, DRAWS = 32, 500, 1000
CAP = CHAINS * DRAWS

x, y, _ = make_logreg_data(num_points=UNSAT_N, dim=DIM, seed=0)
xj = jnp.asarray(x)
yj = jnp.asarray(np.asarray(y, np.float32))


def run(tag, model, ess_names, target_accept):
    res = sample(
        model, kernel=NUTS(max_depth=8), num_samples=DRAWS,
        num_warmup=WARMUP, num_chains=CHAINS, key=jax.random.PRNGKey(0),
        chain_method="vectorized", target_accept=target_accept,
        ess_vars=ess_names,
    )
    ess = np.concatenate(
        [np.ravel(np.asarray(res.diagnostics["ess"][n])) for n in ess_names]
    )
    print(
        f"{tag:26s} ta={target_accept}  min_ess={ess.min():8.0f}  "
        f"ratio={ess.min()/CAP:.3f}  median={np.median(ess):8.0f}  "
        f"accept={float(res.diagnostics['mean_accept_prob']):.3f}  "
        f"div={int(res.diagnostics['num_divergences'])}",
        flush=True,
    )


def centered():
    tau = LogNormalVariable(jnp.zeros(DIM), TAU_SD * jnp.ones(DIM), "tau")
    w = NormalVariable(jnp.zeros(DIM), tau, "w")
    yv = BernoulliVariable(logits=BF.matmul(xj, w), name="y")
    yv.observe(yj)
    return ProbabilisticModel([yv])


def noncentered():
    tau = LogNormalVariable(jnp.zeros(DIM), TAU_SD * jnp.ones(DIM), "tau")
    w = NonCenteredNormalVariable(0.0, tau, name="w", shape=(DIM,))
    yv = BernoulliVariable(logits=BF.matmul(xj, w), name="y")
    yv.observe(yj)
    return ProbabilisticModel([yv])


for ta in (0.9,):
    run("centered", centered(), ["w", "tau"], ta)
    run("non-centered", noncentered(), ["w", "tau"], ta)
