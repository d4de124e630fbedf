"""Model serialization round-trip (VERDICT r1 missing #6)."""
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
