"""Headline benchmark: NUTS effective-samples/sec on Bayesian logistic
regression (BASELINE.json metric: "effective samples/sec/chip (NUTS)").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Structure (round 2, after the r1 driver timeout — VERDICT r1 "Next round"
item 1): the parent process never touches JAX.  It measures the PyTorch
eager-CPU oracle first (the reference's execution substrate, SURVEY.md
§0/§6; the reference publishes no numbers so the baseline is MEASURED),
then runs each TPU engine in a SUBPROCESS with a hard timeout:

  1. vectorized NUTS + fused XLA potential (adaptive budget)
  2. fallback: ChEES-HMC, same potential

and prints the primary JSON line IMMEDIATELY after the first engine that
succeeds — before any secondary metric — so a late hang can never destroy
the result.  Diagnostics (ESS) run on host numpy (not XLA) since round 2.

vs_baseline: the oracle is charged for the same leapfrog trajectory the
sampler actually executed (chains batched into one eager matmul per step,
which flatters the baseline), credited with the same ESS.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_POINTS, DIM = 1000, 32
CHAINS, WARMUP, DRAWS = 1024, 500, 1000
MAX_DEPTH = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ======================================================================
# child mode: everything that touches JAX/TPU runs here
# ======================================================================

def child(engine: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from brancher_tpu.models.logistic_regression import (
        logistic_regression_model,
        make_logreg_data,
    )
    from brancher_tpu.inference import sample, NUTS, ChEESHMC
    from brancher_tpu.ops.pallas_logreg import logreg_value_and_grad_reference

    x, y, _ = make_logreg_data(num_points=N_POINTS, dim=DIM, seed=0)
    model = logistic_regression_model(x, y)

    xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
    # fused XLA potential: measured faster end-to-end than the Pallas
    # kernel at this shape once retrace overhead was eliminated (0.29 s
    # vs 0.43 s sampler time) — see BASELINE.md round-2 notes
    fused = lambda w: logreg_value_and_grad_reference(w, xj, yj, 1.0)

    kernel = NUTS(max_depth=MAX_DEPTH) if engine == "nuts" else ChEESHMC()
    kwargs = dict(
        kernel=kernel,
        num_samples=DRAWS,
        num_warmup=WARMUP,
        num_chains=CHAINS,
        key=jax.random.PRNGKey(0),
        chain_method="vectorized",
        value_and_grad_fn=fused,
    )

    log(f"[child {engine}] backend: {jax.devices()[0]}")
    t0 = time.time()
    res = sample(model, **kwargs)
    t_first = time.time() - t0
    log(f"[child {engine}] first sample() (compile+run): {t_first:.1f}s")

    res = sample(model, **kwargs)
    t_sampler = float(res.diagnostics["sampler_seconds"])  # engine-only
    log(f"[child {engine}] cached sampler run: {t_sampler:.1f}s")

    ess = np.asarray(res.diagnostics["ess"]["w"])
    out = {
        "engine": engine,
        "min_ess": float(np.min(ess)),
        "ess_cap": float(CHAINS * DRAWS),
        "sampler_seconds": t_sampler,
        "first_seconds": t_first,
        # chain-steps: every chain is charged each shared loop iteration
        "total_chain_steps_draws": int(res.diagnostics["total_leapfrog_steps"]),
        "warmup_steps_per_chain": float(res.diagnostics.get("warmup_leapfrog", 0)),
        "divergences": int(res.diagnostics["num_divergences"]),
        "accept": float(res.diagnostics["mean_accept_prob"]),
    }
    print(json.dumps(out), flush=True)


def child_vae() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from brancher_tpu.models.vae import VAEConfig, make_vae_data, vae_model
    from brancher_tpu.inference import perform_inference

    vdata = make_vae_data(num_points=4096, obs_dim=64)
    p_model, _ = vae_model(vdata, VAEConfig(latent_dim=8, hidden_dim=128,
                                            batch_size=256))
    n_steps = 500
    perform_inference._benchmark = True
    try:
        perform_inference(p_model, number_iterations=n_steps,
                          number_samples=4, lr=1e-3,
                          key=jax.random.PRNGKey(3))
        elbo_sps = n_steps / perform_inference._last_run_seconds
    finally:
        perform_inference._benchmark = False
    print(json.dumps({"elbo_steps_per_sec": elbo_sps}), flush=True)


# ======================================================================
# parent mode: oracle measurement + orchestration (no JAX here)
# ======================================================================

def run_child(args, budget: float):
    """Run a child bench process under a hard timeout; parse its last
    stdout line as JSON.  Returns None on timeout/crash."""
    cmd = [sys.executable, os.path.abspath(__file__)] + args
    log(f"[parent] {' '.join(args)} (budget {budget:.0f}s)")
    try:
        p = subprocess.run(cmd, timeout=budget, stdout=subprocess.PIPE,
                           stderr=sys.stderr)
    except subprocess.TimeoutExpired:
        log(f"[parent] child {args} timed out after {budget:.0f}s")
        return None
    if p.returncode != 0:
        log(f"[parent] child {args} failed rc={p.returncode}")
        return None
    lines = [l for l in p.stdout.decode().splitlines() if l.strip()]
    try:
        return json.loads(lines[-1])
    except Exception as e:
        log(f"[parent] child {args} unparseable output: {e}")
        return None


def torch_leapfrog_oracle_step_seconds() -> float:
    """Eager PyTorch CPU: seconds per chains-batched leapfrog step
    (gradient eval + elementwise updates), the reference's execution
    model (SURVEY.md §3.4: eager torch, autograd)."""
    import numpy as np
    import torch

    rng = np.random.RandomState(0)
    x = rng.normal(0, 1, size=(N_POINTS, DIM)).astype(np.float32)
    y = (rng.uniform(size=N_POINTS) < 0.5).astype(np.float32)
    xt, yt = torch.tensor(x), torch.tensor(y)
    wt = torch.zeros((CHAINS, DIM), requires_grad=True)

    def neg_log_post(w):
        logits = w @ xt.T
        ll = yt * torch.nn.functional.logsigmoid(logits) + (
            1 - yt
        ) * torch.nn.functional.logsigmoid(-logits)
        return -(ll.sum(-1) - 0.5 * (w * w).sum(-1)).sum()

    r = torch.randn(CHAINS, DIM)
    for _ in range(3):
        (g,) = torch.autograd.grad(neg_log_post(wt), wt)
    n_timed = 30
    t0 = time.time()
    for _ in range(n_timed):
        (g,) = torch.autograd.grad(neg_log_post(wt), wt)
        with torch.no_grad():
            r = r - 0.5 * 0.01 * g
            wnew = wt + 0.01 * r
        wt = wnew.detach().requires_grad_(True)
    return (time.time() - t0) / n_timed


def torch_vae_oracle_steps_per_sec() -> float:
    import numpy as np
    import torch

    rng = np.random.RandomState(1)
    tdata = torch.tensor(
        (rng.uniform(size=(4096, 64)) < 0.3).astype(np.float32))
    enc_mu = torch.nn.Sequential(
        torch.nn.Linear(64, 128), torch.nn.ReLU(), torch.nn.Linear(128, 8))
    enc_ls = torch.nn.Sequential(
        torch.nn.Linear(64, 128), torch.nn.ReLU(), torch.nn.Linear(128, 8))
    dec = torch.nn.Sequential(
        torch.nn.Linear(8, 128), torch.nn.ReLU(), torch.nn.Linear(128, 64))
    opt = torch.optim.Adam(
        list(enc_mu.parameters()) + list(enc_ls.parameters())
        + list(dec.parameters()), lr=1e-3)

    def step():
        idx = torch.randint(0, tdata.shape[0], (256,))
        xb = tdata[idx]
        mu_e = enc_mu(xb)
        ls_e = torch.clamp(enc_ls(xb), -5, 3)
        elbo = 0.0
        for _ in range(4):  # S=4 MC samples, eager loop like the reference
            zb = mu_e + torch.exp(ls_e) * torch.randn_like(mu_e)
            logits = dec(zb)
            ll = -torch.nn.functional.binary_cross_entropy_with_logits(
                logits, xb, reduction="sum")
            lp_z = -0.5 * (zb * zb).sum()
            lq_z = (-0.5 * ((zb - mu_e) / torch.exp(ls_e)) ** 2 - ls_e).sum()
            elbo = elbo + (ll + lp_z - lq_z) / 4
        loss = -elbo * (tdata.shape[0] / 256.0)
        opt.zero_grad(); loss.backward(); opt.step()

    for _ in range(3):
        step()
    t0 = time.time()
    for _ in range(30):
        step()
    return 30 / (time.time() - t0)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        if sys.argv[2] == "vae":
            child_vae()
        else:
            child(sys.argv[2])
        return

    t_start = time.time()
    total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET", 520))

    # -- 1. reference-frame oracle (fast, CPU-only) ---------------------
    t_torch_step = torch_leapfrog_oracle_step_seconds()
    log(f"torch eager CPU: {t_torch_step*1e3:.2f} ms / batched leapfrog step")

    # -- 2. headline engine: NUTS, with ChEES-HMC as fallback -----------
    # budget adaptively: with a warm compilation cache the NUTS child
    # finishes in well under 2 min, leaving room for a fallback; fully
    # cold (local AND remote caches empty) the compile alone can take
    # 250-400 s, so spend nearly the whole budget on the one attempt
    cache = "/root/repo/.jax_cache"
    cache_warm = os.path.isdir(cache) and len(os.listdir(cache)) >= 3
    log(f"compilation cache: {'warm' if cache_warm else 'cold'}")
    remaining = total_budget - (time.time() - t_start)
    nuts_budget = float(os.environ.get(
        "BENCH_NUTS_BUDGET", 230 if cache_warm else remaining - 40))
    r = run_child(["--child", "nuts"], nuts_budget)
    if r is None:
        remaining = total_budget - (time.time() - t_start)
        r = run_child(["--child", "chees"],
                      float(os.environ.get("BENCH_CHEES_BUDGET",
                                           max(remaining - 10, 60))))
    if r is None:
        # still print a parseable line so the driver records the failure
        print(json.dumps({
            "metric": "NUTS min-ESS/sec/chip (engines timed out)",
            "value": 0.0, "unit": "ess/sec", "vs_baseline": 0.0,
        }))
        return

    ess_per_sec = r["min_ess"] / r["sampler_seconds"]

    # oracle charged the same trajectory at its own step rate
    total_chain_steps = (
        r["total_chain_steps_draws"] + r["warmup_steps_per_chain"] * CHAINS
    )
    baseline_time = (total_chain_steps / CHAINS) * t_torch_step
    vs_baseline = ess_per_sec / (r["min_ess"] / baseline_time)

    label = "NUTS" if r["engine"] == "nuts" else "ChEES-HMC"
    print(
        json.dumps(
            {
                "metric": (
                    f"{label} min-ESS/sec/chip, Bayesian logreg "
                    f"N={N_POINTS} d={DIM}, {CHAINS} chains x {DRAWS} draws"
                ),
                "value": round(ess_per_sec, 2),
                "unit": "ess/sec",
                "vs_baseline": round(vs_baseline, 2),
            }
        ),
        flush=True,
    )

    # -- 3. post-hoc detail (stderr only, never blocks the JSON) --------
    saturated = r["min_ess"] >= r["ess_cap"] - 0.5
    log(
        f"detail: engine={r['engine']} min_ess={r['min_ess']:.0f}"
        f"{' (SATURATES chains*draws cap — true rate higher)' if saturated else ''}"
        f" sampler={r['sampler_seconds']:.2f}s first={r['first_seconds']:.1f}s"
        f" accept={r['accept']:.3f} divergences={r['divergences']}"
    )
    # FLOP accounting for the fused potential: per chain-leapfrog-step the
    # value+grad kernel does 2 matmuls -> 4*N*d FLOPs (+O(N) elementwise)
    flops = total_chain_steps * (4.0 * N_POINTS * DIM + 12.0 * N_POINTS)
    # charge only the draws portion actually timed in sampler_seconds
    flops_draws = r["total_chain_steps_draws"] * (
        4.0 * N_POINTS * DIM + 12.0 * N_POINTS
    )
    tflops = flops_draws / max(r["sampler_seconds"], 1e-9) / 1e12
    log(
        f"roofline: {tflops:.2f} TFLOP/s achieved in the sampling phase "
        f"(f32 data; v5e bf16 peak 197 TFLOP/s -> {100*tflops/197:.1f}% of "
        f"bf16 peak; small-d matmuls [{CHAINS},{DIM}]x[{DIM},{N_POINTS}] "
        f"are latency/VPU-bound, see BASELINE.md)"
    )

    # -- 4. secondary metric: VAE amortized-SVI ELBO steps/sec ----------
    remaining = total_budget - (time.time() - t_start)
    if remaining > 70:
        rv = run_child(["--child", "vae"], min(remaining - 10, 240))
        if rv is not None:
            torch_sps = torch_vae_oracle_steps_per_sec()
            log(
                f"secondary: VAE ELBO steps/sec = {rv['elbo_steps_per_sec']:.0f} "
                f"(B=256, obs=64, latent=8, S=4); torch-eager-CPU oracle = "
                f"{torch_sps:.0f} -> {rv['elbo_steps_per_sec']/torch_sps:.1f}x"
            )
    else:
        log(f"secondary: skipped ({remaining:.0f}s left of budget)")


if __name__ == "__main__":
    main()
