"""Aux subsystems: visualization, checkpoint/resume, metrics
(SURVEY.md §5)."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

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
