"""Ring-pipelined vs lockstep NUTS on the bench headline config
(ROADMAP r3 #4 follow-through).

The non-centered ARD logreg headline has a measured lockstep waste
factor of ~1.35x (C=64 CPU prototype; larger at C=1024 since the
per-draw max over chains grows with C).  The round-4 lookahead-ring
write path removed the scatter-copy penalty that made the r2 pipelined
engine a net loss — this measures whether pipelined now WINS at bench
scale on the real chip, deciding whether bench.py's ard child flips to
pipelined=True.

Run: python scripts/exp_ard_pipelined.py [chains] [draws]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

UNSAT_N, DIM, TAU_SD, TARGET_ACCEPT = 100, 32, 0.75, 0.95
CHAINS, WARMUP, DRAWS = 1024, 500, 1000
if len(sys.argv) > 1:
    CHAINS = int(sys.argv[1])
if len(sys.argv) > 2:
    DRAWS = int(sys.argv[2])


def main():
    import brancher_tpu.functions as BF
    from brancher_tpu import (
        BernoulliVariable, LogNormalVariable, NonCenteredNormalVariable,
        ProbabilisticModel,
    )
    from brancher_tpu.models.logistic_regression import make_logreg_data
    from brancher_tpu.inference import sample, NUTS

    print("backend:", jax.devices()[0], flush=True)
    x, y, _ = make_logreg_data(num_points=UNSAT_N, dim=DIM, seed=0)
    xj = jnp.asarray(x)
    yj = jnp.asarray(np.asarray(y, np.float32))
    sd2 = TAU_SD ** 2

    def fused(zc):
        v, wr = zc[:, :DIM], zc[:, DIM:]
        tau_ = jnp.exp(v)
        w_ = wr * tau_
        logits = w_ @ xj.T
        ll = jnp.sum(yj[None, :] * logits - jax.nn.softplus(logits), -1)
        val = (ll - 0.5 * jnp.sum(v * v, -1) / sd2
               - 0.5 * jnp.sum(wr * wr, -1))
        resid = yj[None, :] - jax.nn.sigmoid(logits)
        s = resid @ xj
        gw = s * tau_ - wr
        gv = s * wr * tau_ - v / sd2
        return val, jnp.concatenate([gv, gw], -1)

    def model():
        tau = LogNormalVariable(jnp.zeros(DIM), TAU_SD * jnp.ones(DIM), "tau")
        w = NonCenteredNormalVariable(0.0, tau, name="w", shape=(DIM,))
        yv = BernoulliVariable(logits=BF.matmul(xj, w), name="y")
        yv.observe(yj)
        return ProbabilisticModel([yv])

    for tag, kernel in (
        ("lockstep", NUTS(max_depth=8)),
        ("pipelined", NUTS(max_depth=8, pipelined=True, lookahead=16)),
    ):
        kwargs = dict(
            kernel=kernel, num_samples=DRAWS, num_warmup=WARMUP,
            num_chains=CHAINS, key=jax.random.PRNGKey(0),
            chain_method="vectorized", target_accept=TARGET_ACCEPT,
            value_and_grad_fn=fused, ess_vars=["w", "tau"],
        )
        m = model()
        t0 = time.time()
        res = sample(m, **kwargs)
        t_first = time.time() - t0
        t_s = float("inf")
        for _ in range(3):
            res = sample(m, **kwargs)
            t_s = min(t_s, float(res.diagnostics["sampler_seconds"]))
        ess = np.concatenate([
            np.ravel(np.asarray(res.diagnostics["ess"][n]))
            for n in ("w", "tau")
        ])
        cap = CHAINS * DRAWS
        print(
            f"{tag:10s}: first {t_first:6.1f}s  sampler {t_s:6.2f}s  "
            f"min_ess {ess.min():9.0f} ({100*ess.min()/cap:.0f}% cap)  "
            f"-> {ess.min()/t_s:9.0f} ess/sec  "
            f"div {int(res.diagnostics['num_divergences'])}  "
            f"accept {float(res.diagnostics['mean_accept_prob']):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
