"""Divergence surfacing from the chain-batched engines (VERDICT r4 #2).

Until round 5 the driver hardwired ``stats["diverging"] = zeros`` for
ChEES and batched HMC — ``num_divergences`` was always 0 no matter how
sick the geometry, a diagnostics parity hole vs NUTS.  Both engines now
check the energy error at EVERY leapfrog step of the (non-fused)
integrator against the same ``max_delta_energy`` threshold NUTS uses.

Calibration note (measured on the CPU mesh, funnel below, 16 chains x
500 draws): NUTS 511 / HMC 168 / ChEES 67 divergent draws.  The per-draw
counts differ STRUCTURALLY across engines — NUTS integrates ~139
leapfrog steps per draw on this target vs ChEES's ~76 and HMC's 16, and
a draw is flagged if ANY step diverged — so the assertions below pin
"nonzero, same order of magnitude", not equality.
"""
import jax
import jax.numpy as jnp
import pytest

import brancher_tpu.functions as BF
from brancher_tpu import NormalVariable, ProbabilisticModel
from brancher_tpu.inference import HMC, NUTS, ChEESHMC, sample

pytestmark = pytest.mark.slow


def _funnel():
    # Neal's funnel, centered parameterization: the neck has curvature
    # ~exp(-v) and every fixed step size diverges somewhere
    v = NormalVariable(0.0, 3.0, "v")
    x = NormalVariable(jnp.zeros(9), BF.exp(v / 2.0), "x")
    return ProbabilisticModel([v, x])


KW = dict(num_samples=500, num_warmup=500, num_chains=16,
          key=jax.random.PRNGKey(0))


def test_funnel_divergences_surface_from_all_engines():
    model = _funnel()
    div = {}
    for name, kern in [("nuts", NUTS()), ("chees", ChEESHMC()),
                       ("hmc", HMC())]:
        r = sample(model, kernel=kern, **KW)
        div[name] = int(r.diagnostics["num_divergences"])
        # the per-draw flag has the right shape and a nonzero count
        assert r.stats["diverging"].shape == r.stats["accept_prob"].shape
        assert div[name] > 0, f"{name} reported zero divergences on the funnel"
    # same order of magnitude as NUTS (see module docstring for why the
    # counts are not equal): within 20x both ways
    assert div["nuts"] / 20 <= div["chees"] <= div["nuts"] * 20
    assert div["nuts"] / 20 <= div["hmc"] <= div["nuts"] * 20


def test_well_conditioned_target_reports_zero():
    # no false positives: a unit Gaussian never trips the 1000-nat gate
    z = NormalVariable(jnp.zeros(4), jnp.ones(4), "z")
    model = ProbabilisticModel([z])
    for kern in (ChEESHMC(), HMC()):
        r = sample(model, kernel=kern, num_samples=300, num_warmup=300,
                   num_chains=8, key=jax.random.PRNGKey(1))
        assert int(r.diagnostics["num_divergences"]) == 0
