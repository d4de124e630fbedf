"""Headline tuning sweep (VERDICT r4 #3 / ROADMAP r4 #13): raise the
non-centered ARD logreg ess/sec while KEEPING the unsaturation property
(min_ess/cap in (0.25, 0.9)).

Levers (round-4 breakdown: warmup ≈ 1/3 of the 2.7 s wall; trajectory
caps untuned): warmup share, draws per chain (amortizes warmup and
grows the ESS numerator while the cap grows with it), target_accept
(step size vs divergences), max_depth (loop bound).

Each config runs in its OWN child process launched CONCURRENTLY (the
remote compile service runs concurrent large jobs with ~1.4x contention
— far below the serial sum; every config is a different traced program
= a separate cold compile).  Timing = best of 3 device-atomic runs with
a HOST-FETCH sync (block_until_ready can return early on this backend —
scripts/exp_timing_groundtruth.py).

Run: python scripts/exp_headline_tune.py            # parent, all configs
     python scripts/exp_headline_tune.py --child W D TA MD
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UNSAT_N, DIM, TAU_SD = 100, 32, 0.75
CHAINS = 1024

CONFIGS = [
    # (tag, warmup, draws, target_accept, max_depth)
    # round-1 sweep (2026-08-21): r4-baseline 109k ess/sec (29% cap,
    # div 24) | less-warmup(300) 32k — adaptation collapses, div 106 |
    # more-draws(2000) 181k (43% cap, div 41) | both 74k | ta90@W300
    # 176k but div 638.  Warmup stays 500; draws are the lever.
    ("more-draws", 500, 2000, 0.95, 8),
    ("draws3k", 500, 3000, 0.95, 8),
    ("d2k-ta92", 500, 2000, 0.92, 8),
]


def child(warmup, draws, ta, md):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    import brancher_tpu.functions as BF
    from brancher_tpu import (
        BernoulliVariable, LogNormalVariable, NonCenteredNormalVariable,
        ProbabilisticModel,
    )
    from brancher_tpu.models.logistic_regression import make_logreg_data
    from brancher_tpu.inference import sample, NUTS

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

    tau = LogNormalVariable(jnp.zeros(DIM), TAU_SD * jnp.ones(DIM), "tau")
    w = NonCenteredNormalVariable(0.0, tau, name="w", shape=(DIM,))
    yv = BernoulliVariable(logits=BF.matmul(xj, w), name="y")
    yv.observe(yj)
    model = ProbabilisticModel([yv])

    # same verification gate as bench.py's child_ard (round-5 review:
    # this script's numbers pick the headline config, so the duplicated
    # hand-fused math must carry the same autodiff safety check)
    import jax.flatten_util

    comp = model.compiled()
    _, unravel = jax.flatten_util.ravel_pytree(comp.z_example())
    auto = jax.vmap(jax.value_and_grad(
        lambda zf: comp.log_density_z(comp.initial_params, unravel(zf))))
    zp = 0.5 * jax.random.normal(jax.random.PRNGKey(9), (3, 2 * DIM))
    va, ga = auto(zp)
    vf, gf = fused(zp)
    assert float(jnp.std(vf - va)) < 1e-2, "fused potential value mismatch"
    assert bool(jnp.all(jnp.abs(gf - ga) <= 2e-3 * (1.0 + jnp.abs(ga)))), \
        "fused potential grad mismatch"

    kwargs = dict(
        kernel=NUTS(max_depth=md), num_samples=draws, num_warmup=warmup,
        num_chains=CHAINS, key=jax.random.PRNGKey(0),
        chain_method="vectorized", target_accept=ta,
        value_and_grad_fn=fused, ess_vars=["w", "tau"],
    )
    t0 = time.time()
    res = sample(model, **kwargs)
    t_first = time.time() - t0
    t_s = float("inf")
    for _ in range(3):
        res = sample(model, **kwargs)
        t_s = min(t_s, float(res.diagnostics["sampler_seconds"]))
    ess = np.concatenate([
        np.ravel(np.asarray(res.diagnostics["ess"][n])) for n in ("w", "tau")
    ])
    print(json.dumps({
        "min_ess": float(ess.min()), "cap": float(CHAINS * draws),
        "sampler": t_s, "first": t_first,
        "div": int(res.diagnostics["num_divergences"]),
        "accept": float(res.diagnostics["mean_accept_prob"]),
        "rhat_max": float(max(
            np.max(np.asarray(res.diagnostics["r_hat"][n]))
            for n in ("w", "tau")
        )),
    }), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), float(sys.argv[4]),
              int(sys.argv[5]))
        return
    procs = {}
    outs = {}
    for tag, wu, dr, ta, md in CONFIGS:
        f = open(f"/tmp/tune_{tag}.out", "wb")
        procs[tag] = (subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(wu), str(dr), str(ta), str(md)],
            stdout=f, stderr=subprocess.DEVNULL), f)
        print(f"launched {tag}", flush=True)
    deadline = time.time() + 1500
    while time.time() < deadline and len(outs) < len(CONFIGS):
        for tag, (p, f) in procs.items():
            if tag in outs or p.poll() is None:
                continue
            try:
                lines = open(f"/tmp/tune_{tag}.out").read().strip().splitlines()
                outs[tag] = json.loads(lines[-1])
            except Exception as e:
                outs[tag] = {"error": str(e)}
        time.sleep(5)
    for tag, _w, dr, _t, _m in CONFIGS:
        r = outs.get(tag)
        if not r or "error" in r:
            print(f"{tag:12s}: FAILED {r}", flush=True)
            continue
        eps = r["min_ess"] / r["sampler"]
        print(
            f"{tag:12s}: ess/sec {eps:9.0f}  min_ess {r['min_ess']:9.0f} "
            f"({100*r['min_ess']/r['cap']:.0f}% cap)  sampler {r['sampler']:5.2f}s "
            f"first {r['first']:5.0f}s  div {r['div']}  accept {r['accept']:.3f} "
            f"rhat {r['rhat_max']:.3f}",
            flush=True,
        )
    for tag, (p, f) in procs.items():
        if p.poll() is None:
            p.kill()


if __name__ == "__main__":
    main()
