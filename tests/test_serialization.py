"""Model serialization round-trip (VERDICT r1 missing #6)."""
import pytest

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from brancher_tpu import NormalVariable, LogNormalVariable, ProbabilisticModel
import brancher_tpu.functions as BF
from brancher_tpu.serialization import (
    load_model, model_spec, save_model, save_spec, spec_matches,
)


def _build():
    mu = NormalVariable(0.0, 2.0, "mu")
    sigma = LogNormalVariable(0.0, 0.5, "sigma")
    x = NormalVariable(BF.exp(mu * 0.1) + mu, sigma, "x")
    x.observe(jnp.asarray(np.random.RandomState(0).randn(20), jnp.float32) + 2)
    return ProbabilisticModel([x])


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path, key):
    model = _build()
    lp_before = np.asarray(
        model.calculate_log_probability({"mu": jnp.asarray([0.5]),
                                         "sigma": jnp.asarray([1.0])})
    )
    p = os.path.join(tmp_path, "model.pkl")
    save_model(model, p)
    loaded = load_model(p)
    assert [v.name for v in loaded.variables] == [v.name for v in model.variables]
    lp_after = np.asarray(
        loaded.calculate_log_probability({"mu": jnp.asarray([0.5]),
                                          "sigma": jnp.asarray([1.0])})
    )
    np.testing.assert_allclose(lp_after, lp_before, rtol=1e-6)
    # inference still runs on the loaded model
    from brancher_tpu.inference import sample

    res = sample(loaded, num_samples=100, num_warmup=100, num_chains=2, key=key)
    assert np.isfinite(float(jnp.mean(res.samples["mu"])))


def test_spec_roundtrip(tmp_path):
    import json

    model = _build()
    p = os.path.join(tmp_path, "spec.json")
    save_spec(model, p)
    spec = json.load(open(p))
    assert spec_matches(model, spec)
    names = {v["name"]: v for v in spec["variables"]}
    assert names["x"]["observed"] and names["x"]["distribution"] == "Normal"
    assert names["sigma"]["distribution"] == "LogNormal"
    # a structurally different model must NOT match
    other = ProbabilisticModel([NormalVariable(0.0, 1.0, "mu")])
    assert not spec_matches(other, spec)


# -- spec-driven reconstruction (ROADMAP r2 #12) -------------------------

def test_build_model_round_trip(key):
    from brancher_tpu.serialization import build_model, model_spec, spec_matches

    mu = NormalVariable(0.0, 2.0, "mu")
    sigma = LogNormalVariable(0.0, 0.5, "sigma")
    x = NormalVariable(mu, sigma, "x", plate_shape=(20,))
    x.observe(np.random.RandomState(0).randn(20).astype(np.float32))
    model = ProbabilisticModel([x])

    spec = model_spec(model, include_links=True)
    spec = json.loads(json.dumps(spec))  # genuine JSON round-trip
    rebuilt = build_model(spec)

    # structural equality against the DEFAULT spec (what spec_matches uses)
    assert spec_matches(rebuilt, model_spec(model))
    # and numerical equality of the compiled densities
    comp_a, comp_b = model.compiled(), rebuilt.compiled()
    z = {"mu": jnp.asarray(0.3), "sigma": jnp.asarray(-0.2)}
    la = float(comp_a.log_density_z(comp_a.initial_params, z, None))
    lb = float(comp_b.log_density_z(comp_b.initial_params, z, None))
    assert abs(la - lb) < 1e-5, (la, lb)


def test_build_model_stateful_distribution(key):
    from brancher_tpu.serialization import build_model, model_spec, spec_matches
    from brancher_tpu.stochastic_processes import HMMVariable

    locs = NormalVariable(jnp.zeros(2), 5.0 * jnp.ones(2), "locs")
    series = HMMVariable(30, init_logits=jnp.zeros(2),
                         trans_logits=jnp.log(jnp.asarray([[0.9, 0.1],
                                                           [0.2, 0.8]])),
                         locs=locs, scales=jnp.asarray([0.7, 0.7]), name="y")
    series.observe(np.random.RandomState(1).randn(30).astype(np.float32))
    model = ProbabilisticModel([series])

    spec = json.loads(json.dumps(model_spec(model, include_links=True)))
    rebuilt = build_model(spec)
    assert spec_matches(rebuilt, model_spec(model))
    comp_a, comp_b = model.compiled(), rebuilt.compiled()
    z = {"locs": jnp.asarray([0.5, -0.5])}
    la = float(comp_a.log_density_z(comp_a.initial_params, z, None))
    lb = float(comp_b.log_density_z(comp_b.initial_params, z, None))
    assert abs(la - lb) < 1e-4, (la, lb)


def test_build_model_opaque_link_raises():
    import brancher_tpu.functions as BF
    from brancher_tpu.serialization import build_model, model_spec

    mu = NormalVariable(0.0, 1.0, "mu")
    x = NormalVariable(BF.exp(mu) + 1.0, 1.0, "x")
    model = ProbabilisticModel([x])
    spec = model_spec(model, include_links=True)
    assert spec["variables"][-1]["links"]["loc"]["kind"] == "opaque"
    try:
        build_model(spec)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "opaque" in str(e) and "save_model" in str(e)
