"""Aux subsystems: visualization, checkpoint/resume, metrics
(SURVEY.md §5)."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brancher_tpu import NormalVariable, ProbabilisticModel


def test_plot_functions(key):
    import matplotlib

    matplotlib.use("Agg")
    from brancher_tpu.visualizations import (
        ensemble_histogram,
        plot_density,
        plot_posterior,
    )

    mu = NormalVariable(0.0, 1.0, "mu")
    x = NormalVariable(mu, 1.0, "x")
    model = ProbabilisticModel([x])
    df = model.get_sample(200, key=key)
    assert plot_posterior(df) is not None
    assert plot_density(df, variables=["mu"]) is not None
    assert ensemble_histogram([df, df], "mu", labels=["a", "b"]) is not None


def test_checkpoint_roundtrip(key):
    from brancher_tpu.checkpoint import restore_checkpoint, save_checkpoint

    state = {
        "params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
        "step": jnp.asarray(7),
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_checkpoint(path, state)
        restored = restore_checkpoint(path, template=state)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert int(restored["step"]) == 7


@pytest.mark.slow
def test_dense_mass_resume_roundtrip(key):
    """mass='dense' resume (VERDICT r4 #8): the checkpoint carries the
    whitening affine map (dense_mu/dense_L) + the inner whitened-space
    mass, and a resumed run continues sampling the same posterior with
    zero warmup — through an orbax save/restore to prove it is a real
    checkpoint, not just an in-memory handoff."""
    from brancher_tpu.checkpoint import restore_checkpoint, save_checkpoint
    from brancher_tpu.inference import ChEESHMC, sample

    # rho=0.9 correlated 2-D Gaussian: the regime dense mass exists for
    rho, sd = 0.9, jnp.asarray([1.0, 2.0])
    z1 = NormalVariable(0.0, float(sd[0]), "z1")
    z2 = NormalVariable(rho * (sd[1] / sd[0]) * z1,
                        float(sd[1] * np.sqrt(1 - rho**2)), "z2")
    model = ProbabilisticModel([z1, z2])
    kw = dict(kernel=ChEESHMC(), num_chains=16, key=key, mass="dense")

    r1 = sample(model, num_samples=300, num_warmup=400, **kw)
    rs = r1.diagnostics["resume_state"]
    assert {"dense_mu", "dense_L", "dense_inner_inv_mass",
            "trajectory_length"} <= set(rs)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_checkpoint(path, rs)
        rs = restore_checkpoint(path, template=rs)

    r2 = sample(model, num_samples=400, resume_state=rs, **kw)
    draws = np.asarray(r2.samples["z2"]).reshape(-1)
    assert np.isfinite(draws).all()
    assert abs(draws.mean()) < 0.25
    assert abs(draws.std() - float(sd[1])) < 0.4
    # resumed runs skip warmup entirely
    assert float(r2.diagnostics["mean_accept_prob"]) > 0.5
    # ChEES's ADAPTED trajectory length must survive the resume (round-5
    # review: it used to silently reset to the constructor default 1.0,
    # collapsing the resumed sampler to ~1-step trajectories)
    np.testing.assert_allclose(
        float(r2.diagnostics["trajectory_length"]),
        float(rs["trajectory_length"]), rtol=1e-6,
    )
    # and the resumed checkpoint still carries the dense payload
    assert "dense_mu" in r2.diagnostics["resume_state"]


def test_dense_resume_requires_dense_payload(key):
    import pytest

    from brancher_tpu.inference import ChEESHMC, sample
    from brancher_tpu.models.conjugate import conjugate_normal_model

    model, _ = conjugate_normal_model(num_obs=5)
    r = sample(model, kernel=ChEESHMC(), num_samples=50, num_warmup=50,
               num_chains=4, key=key)  # diag run: no dense keys
    with pytest.raises(ValueError, match="dense_mu"):
        sample(model, kernel=ChEESHMC(), num_samples=10, num_chains=4,
               key=key, mass="dense",
               resume_state=r.diagnostics["resume_state"])
    # opposite direction (round-5 review): a dense checkpoint fed to a
    # default diag run must raise the clear error, not an opaque
    # broadcast failure from a [d,d] covariance-as-diagonal mass
    rd = sample(model, kernel=ChEESHMC(), num_samples=60, num_warmup=100,
                num_chains=4, key=key, mass="dense")
    with pytest.raises(ValueError, match="mass='dense'"):
        sample(model, kernel=ChEESHMC(), num_samples=10, num_chains=4,
               key=key, resume_state=rd.diagnostics["resume_state"])


@pytest.mark.slow
def test_given_key_stable_closures_for_large_given(key):
    """sample(given_key=) (VERDICT r4 weak #3): conditioning arrays
    above the 16 MB content-hash bail used to force a fresh potential
    closure — and therefore a full engine retrace — on EVERY conditioned
    sample() call.  A user token keys the closure caches without hashing
    or transferring the data; the second call must add nothing to the
    runner cache."""
    from brancher_tpu.inference import HMC, sample
    from brancher_tpu.inference import mcmc as mcmc_mod

    n = 5_000_000  # 20 MB f32: past the 1<<24-byte content-hash bail
    mu = NormalVariable(0.0, 1.0, "mu")
    x = NormalVariable(mu, 1.0, "x", plate_shape=(n,))
    model = ProbabilisticModel([x])
    comp = model.compiled()
    data = {"x": np.zeros(n, np.float32)}
    kw = dict(kernel=HMC(num_integration_steps=4), num_samples=5,
              num_warmup=5, num_chains=2, key=key,
              diagnostics_backend="none")

    # content hashing really does refuse this size
    assert mcmc_mod._content_key(data) is None

    sample(model, given=data, given_key="dataset-v1", **kw)
    runner_keys = set(mcmc_mod._RUNNER_CACHE)
    pot_keys = set(comp._potential_cache_by_given)
    sample(model, given=data, given_key="dataset-v1", **kw)
    assert set(mcmc_mod._RUNNER_CACHE) == runner_keys  # no engine retrace
    assert set(comp._potential_cache_by_given) == pot_keys
    # a different token is a different closure (stale-data hazard is on
    # the caller, but DIFFERENT tokens must never collide)
    sample(model, given=data, given_key="dataset-v2", **kw)
    assert set(comp._potential_cache_by_given) != pot_keys


def test_metrics_logger(tmp_path):
    from brancher_tpu.metrics import MetricsLogger

    p = str(tmp_path / "metrics.jsonl")
    ml = MetricsLogger(p)
    ml.log(0, loss=1.5, accept=0.8)
    ml.log(1, loss=1.2)
    ml.close()
    lines = open(p).read().strip().splitlines()
    assert len(lines) == 2
    import json

    rec = json.loads(lines[0])
    assert rec["loss"] == 1.5 and rec["step"] == 0


def test_mcmc_summary(key):
    from brancher_tpu.inference import sample, HMC
    from brancher_tpu.metrics import summarize_mcmc
    from brancher_tpu.models.conjugate import conjugate_normal_model

    model, _ = conjugate_normal_model(num_obs=5)
    res = sample(model, kernel=HMC(num_integration_steps=5), num_samples=50,
                 num_warmup=50, num_chains=2, key=key)
    summary = summarize_mcmc(res)
    assert "mu" in summary and "ess" in summary["mu"]


def test_dashboard_export(tmp_path, key):
    """Self-contained HTML dashboard (ROADMAP r2 #11): structure checks —
    panels per flattened coordinate, stats table as the table view,
    tooltips/crosshair wiring, dark-mode tokens, text never in series
    colors (palette is the skill-validated reference instance)."""
    import re

    from brancher_tpu import NormalVariable, ProbabilisticModel
    from brancher_tpu.dashboard import export_dashboard_html
    from brancher_tpu.inference import NUTS, sample

    mu = NormalVariable(0.0, 2.0, "mu")
    x = NormalVariable(mu, 1.0, "x", plate_shape=(3,))
    x.observe(np.asarray([0.5, 1.0, 1.5], np.float32))
    res = sample(ProbabilisticModel([x]), kernel=NUTS(max_depth=6),
                 num_samples=200, num_warmup=200, num_chains=4, key=key)
    p = export_dashboard_html(res, str(tmp_path / "d.html"), title="t")
    s = open(p).read()
    assert s.count('class="panel"') == 1  # mu (x observed)
    assert "<svg" in s and 'class="cross"' in s and "data-tt" in s
    assert "prefers-color-scheme: dark" in s
    assert "Summary table" in s and "R-hat" in s
    assert not re.findall(r'<text[^>]*fill="var\(--s\d', s)

    # raw-dict input, multi-coordinate, panel cap + truncation note
    d = {"w": np.random.RandomState(0).randn(4, 100, 7)}
    p2 = export_dashboard_html(d, str(tmp_path / "d2.html"), max_panels=5)
    s2 = open(p2).read()
    assert s2.count('class="panel"') == 5
    assert "truncated at max_panels" in s2


def test_api_docs_compiled_model_not_drifted():
    """docs/API.md's compiled-model section is GENERATED from the live
    CompiledModel docstrings (scripts/gen_api_docs.py, ROADMAP r3 #9);
    this guard fails whenever the public surface changes without
    regenerating the docs."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_api_docs", os.path.join(root, "scripts", "gen_api_docs.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(root, "docs", "API.md")) as f:
        text = f.read()
    assert mod.BEGIN in text and mod.END in text
    assert mod.render(text) == text, (
        "docs/API.md compiled-model section is stale; run "
        "python scripts/gen_api_docs.py"
    )
