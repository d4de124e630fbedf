"""Chain/particle scaling-efficiency report (BASELINE.json north star:
"samples/s efficiency reported at 1 chip, 1 host, and N>=2 hosts").

Only one physical TPU chip exists in this environment, so this harness
measures WEAK SCALING on an n-device mesh (virtual CPU devices by
default: JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=8).
It exercises the REAL sharded code paths (shard_map + psum consensus /
ppermute resampling); on a pod slice the same script reports the real
ICI numbers — run it there unchanged with JAX_PLATFORMS unset.

Weak scaling: chains-per-device (or particles-per-device) held constant;
efficiency(n) = throughput(n) / (n * throughput(1)).

Usage: python scripts/scaling_report.py [max_devices]
"""
import os
import sys
import time

REAL = "--real" in sys.argv  # pass --real on a pod slice
if not REAL:
    os.environ["JAX_PLATFORMS"] = "cpu"
args = [a for a in sys.argv[1:] if not a.startswith("--")]
max_dev = int(args[0]) if args else 8
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={max_dev}"
    ).strip()

import jax

if not REAL:
    # the axon plugin ignores the env var; pin via config (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from brancher_tpu.inference import NUTS, sample


def main():
    from brancher_tpu.models.logistic_regression import (
        logistic_regression_model, make_logreg_data,
    )
    from brancher_tpu.models.state_space import (
        LGSSMParams, lgssm_state_space, make_lgssm_data,
    )
    from brancher_tpu.inference.smc import smc_sample
    from brancher_tpu.parallel.mesh import make_mesh

    devs_all = jax.devices()
    counts = [n for n in (1, 2, 4, 8) if n <= min(max_dev, len(devs_all))]
    print(f"backend={devs_all[0].platform}, devices={len(devs_all)}")

    x, y, _ = make_logreg_data(num_points=500, dim=16, seed=0)
    model = logistic_regression_model(x, y)
    chains_per_dev, draws = 64, 200

    print("\n== MCMC weak scaling: vectorized NUTS, chains sharded ==")
    base = None
    for n in counts:
        mesh = make_mesh({"chain": n}, devs_all[:n])
        kw = dict(kernel=NUTS(max_depth=6), num_samples=draws,
                  num_warmup=200, num_chains=chains_per_dev * n,
                  key=jax.random.PRNGKey(0), chain_method="vectorized",
                  mesh=mesh)
        sample(model, **kw)  # compile
        r = sample(model, **kw)
        dt = float(r.diagnostics["sampler_seconds"])
        thr = chains_per_dev * n * draws / dt
        eff = 1.0 if base is None else thr / (n * base)
        base = base or thr
        print(f"  n={n}: {thr:,.0f} draws/s  efficiency={eff:.2f}")

    print("\n== SMC weak scaling: ppermute particle filter ==")
    _, ys = make_lgssm_data(length=50)
    per_dev = 512
    base = None
    for n in counts:
        mesh = make_mesh({"particle": n}, devs_all[:n])
        t0 = time.time()
        res = smc_sample(lgssm_state_space(LGSSMParams()), jnp.asarray(ys),
                         num_particles=per_dev * n, key=jax.random.PRNGKey(1),
                         mesh=mesh)
        jax.block_until_ready(res.log_marginal)
        t0 = time.time()
        res = smc_sample(lgssm_state_space(LGSSMParams()), jnp.asarray(ys),
                         num_particles=per_dev * n, key=jax.random.PRNGKey(1),
                         mesh=mesh)
        jax.block_until_ready(res.log_marginal)
        dt = time.time() - t0
        thr = per_dev * n * 50 / dt
        eff = 1.0 if base is None else thr / (n * base)
        base = base or thr
        print(f"  n={n}: {thr:,.0f} particle-steps/s  efficiency={eff:.2f}")


if __name__ == "__main__":
    main()
