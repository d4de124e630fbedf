"""Experiment: cold-compile + run time of candidate bench headline engines
on the real TPU.  Usage: python scripts/exp_compile_time.py <engine> [args]

engines:
  nuts <max_depth> <chains> <warmup> <draws>
  chees <chains> <warmup> <draws>
  hmc <chains> <warmup> <draws>

Uses a FRESH compilation-cache dir so the measurement is cold.
"""
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", tempfile.mkdtemp())

import jax
import jax.numpy as jnp
import numpy as np


def main():
    eng = sys.argv[1]
    t_imp = time.time()
    from brancher_tpu.models.logistic_regression import (
        logistic_regression_model, make_logreg_data,
    )
    from brancher_tpu.inference import sample, NUTS, HMC, ChEESHMC
    from brancher_tpu.ops.pallas_logreg import (
        logreg_value_and_grad_pallas, logreg_value_and_grad_reference,
    )

    n_points, dim = 1000, 32
    x, y, _ = make_logreg_data(num_points=n_points, dim=dim, seed=0)
    model = logistic_regression_model(x, y)
    xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
    if jax.default_backend() == "tpu":
        fused = lambda w: logreg_value_and_grad_pallas(w, xj, yj, 1.0)
    else:
        fused = lambda w: logreg_value_and_grad_reference(w, xj, yj, 1.0)

    print(f"backend={jax.devices()[0]}", file=sys.stderr, flush=True)

    if eng == "nuts":
        md, chains, warmup, draws = map(int, sys.argv[2:6])
        kernel = NUTS(max_depth=md)
    elif eng == "chees":
        chains, warmup, draws = map(int, sys.argv[2:5])
        kernel = ChEESHMC()
    elif eng == "hmc":
        chains, warmup, draws = map(int, sys.argv[2:5])
        kernel = HMC(num_integration_steps=32, jitter_steps=True)
    else:
        raise SystemExit(f"unknown engine {eng}")

    kwargs = dict(kernel=kernel, num_samples=draws, num_warmup=warmup,
                  num_chains=chains, key=jax.random.PRNGKey(0),
                  chain_method="vectorized", value_and_grad_fn=fused)
    t0 = time.time()
    res = sample(model, **kwargs)
    jax.block_until_ready(res.samples["w"])
    t1 = time.time()
    res = sample(model, **kwargs)
    jax.block_until_ready(res.samples["w"])
    t2 = time.time()
    ess = np.asarray(res.diagnostics["ess"]["w"])
    print(
        f"RESULT engine={eng} argv={sys.argv[2:]} "
        f"first={t1-t0:.1f}s cached={t2-t1:.1f}s "
        f"sampler={float(res.diagnostics['sampler_seconds']):.2f}s "
        f"minESS={float(np.min(ess)):.0f} cap={chains*draws} "
        f"ess/s={float(np.min(ess))/float(res.diagnostics['sampler_seconds']):.0f} "
        f"div={int(res.diagnostics['num_divergences'])} "
        f"acc={float(res.diagnostics['mean_accept_prob']):.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
