"""Headline benchmark: NUTS effective-samples/sec on Bayesian logistic
regression (BASELINE.json metric: "effective samples/sec/chip (NUTS)").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Structure (round 3): the parent process never touches JAX.  It measures
the PyTorch eager-CPU oracle first (the reference's execution substrate,
SURVEY.md §0/§6; the reference publishes no numbers so the baseline is
MEASURED), then launches ALL TPU measurement children CONCURRENTLY:

  1. "nuts"  — vectorized NUTS + fused XLA potential (the headline)
  2. "vae"   — amortized-SVI ELBO steps/sec (VERDICT r2 #1)
  3. "unsat" — hierarchical ARD logreg whose min-ESS sits genuinely
               below the chains*draws cap (VERDICT r2 #2)
  4. "chees" — a small-program headline fallback: launched immediately
               if the nuts child crashes, or as late insurance at
               deadline-170s if nuts is still compiling (the compile
               cache is a small laggy LRU, so nuts is a per-run coin
               flip between ~30 s and 300-700 s; nuts stays preferred
               until deadline-45s)

Children spend ~95% of their wall time waiting on the remote compile
service with the chip idle; concurrent large compiles contend by a
measured ~1.4x factor but still complete in ~max(compile) x 1.4 rather
than sum-of-compiles (~20 min cold).  The primary
JSON line prints IMMEDIATELY when the first headline engine lands —
before any secondary metric — so a late hang can never destroy the
result; an enriched copy (same headline numbers plus elbo_steps_per_sec
/ unsat_* keys) prints at the very end.  Diagnostics (ESS) run on host
numpy (not XLA) since round 2.  Every timed measurement is the best of
3 executions of one device-atomic XLA program, so concurrent children
cannot inflate each other's numbers via queueing delay.

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

# Unsaturated companion config (VERDICT r2 #2): hierarchical ARD logreg
# (w_j ~ N(0, tau_j), tau_j lognormal) with WEAK data — genuinely
# autocorrelated NUTS draws (min-ESS ≈ 0.5 × chains*draws measured on
# CPU prototypes, scripts/exp_unsat_config.py), so the metric can
# register sampler-efficiency progress that the saturated headline is
# blind to.  Plain logreg at the headline shape is simply too easy:
# every tested variant (collinear designs to rho=0.9999, scale spreads,
# N=1000 hierarchies) still decorrelated fully within depth-8 trees.
UNSAT_N, UNSAT_TAU_SD, UNSAT_TARGET_ACCEPT = 100, 0.75, 0.9


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

    # best of 3 cached runs: each is ONE device-atomic program launch,
    # so the min filters any queueing delay from concurrent children
    t_sampler = float("inf")
    for _ in range(3):
        res = sample(model, **kwargs)
        t_sampler = min(t_sampler, float(res.diagnostics["sampler_seconds"]))
    log(f"[child {engine}] cached sampler run (best of 3): {t_sampler:.2f}s")

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


def child_unsat() -> None:
    """Unsaturated companion measurement: hierarchical ARD logreg at the
    same 1024x1000 chain/draw shape.  min-ESS genuinely < the
    chains*draws cap here, so round-over-round sampler-efficiency
    progress is measurable (VERDICT r2 #2)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    import brancher_tpu.functions as BF
    from brancher_tpu import (
        BernoulliVariable, LogNormalVariable, NormalVariable,
        ProbabilisticModel,
    )
    from brancher_tpu.models.logistic_regression import make_logreg_data
    from brancher_tpu.inference import sample, NUTS

    x, y, _ = make_logreg_data(num_points=UNSAT_N, dim=DIM, seed=0)
    tau = LogNormalVariable(jnp.zeros(DIM), UNSAT_TAU_SD * jnp.ones(DIM), "tau")
    w = NormalVariable(jnp.zeros(DIM), tau, "w")
    yv = BernoulliVariable(logits=BF.matmul(jnp.asarray(x), w), name="y")
    yv.observe(jnp.asarray(y))
    model = ProbabilisticModel([yv])

    # hand-fused analytic value+grad of the ARD z-density, numerically
    # VERIFIED against the autodiff walk below before being trusted.
    # Shrinks the compiled NUTS program (the autodiff-walk variant
    # cold-compiled in 754 s on 2026-08-20; this one is headline-class)
    # and speeds every leapfrog.  z layout (ravel_pytree sorted keys):
    # [:DIM] = tau's unconstrained v = log tau, [DIM:] = w.
    import jax.flatten_util

    xj = jnp.asarray(x)
    yj = jnp.asarray(np.asarray(y, np.float32))
    sd2 = UNSAT_TAU_SD ** 2

    def fused(zc):
        v, w_ = zc[:, :DIM], zc[:, DIM:]
        logits = w_ @ xj.T
        ll = jnp.sum(yj[None, :] * logits - jax.nn.softplus(logits), -1)
        e2 = jnp.exp(-2.0 * v)
        val = (ll - 0.5 * jnp.sum(v * v, -1) / sd2 - jnp.sum(v, -1)
               - 0.5 * jnp.sum(w_ * w_ * e2, -1))
        resid = yj[None, :] - jax.nn.sigmoid(logits)
        gw = resid @ xj - w_ * e2
        gv = -v / sd2 - 1.0 + w_ * w_ * e2
        return val, jnp.concatenate([gv, gw], -1)

    comp = model.compiled()
    params = comp.initial_params
    _, unravel = jax.flatten_util.ravel_pytree(comp.z_example())
    auto = jax.vmap(jax.value_and_grad(
        lambda zf: comp.log_density_z(params, unravel(zf))))
    zp = 0.5 * jax.random.normal(jax.random.PRNGKey(9), (3, 2 * DIM))
    va, ga = auto(zp)
    vf, gf = fused(zp)
    const_ok = float(jnp.std(vf - va)) < 1e-2
    grad_ok = bool(jnp.all(jnp.abs(gf - ga) <= 2e-3 * (1.0 + jnp.abs(ga))))
    vg_fn = fused if (const_ok and grad_ok) else None
    log(f"[child unsat] fused ARD potential "
        f"{'verified' if vg_fn else 'MISMATCH - using autodiff'} "
        f"(const_ok={const_ok} grad_ok={grad_ok})")

    kwargs = dict(
        kernel=NUTS(max_depth=MAX_DEPTH), num_samples=DRAWS,
        num_warmup=WARMUP, num_chains=CHAINS, key=jax.random.PRNGKey(0),
        chain_method="vectorized", target_accept=UNSAT_TARGET_ACCEPT,
        value_and_grad_fn=vg_fn,
    )
    log(f"[child unsat] backend: {jax.devices()[0]}")
    t0 = time.time()
    res = sample(model, **kwargs)
    t_first = time.time() - t0
    log(f"[child unsat] first sample() (compile+run): {t_first:.1f}s")
    t_sampler = float("inf")
    for _ in range(3):
        res = sample(model, **kwargs)
        t_sampler = min(t_sampler, float(res.diagnostics["sampler_seconds"]))
    ess = np.concatenate([
        np.ravel(np.asarray(res.diagnostics["ess"][n])) for n in ("w", "tau")
    ])
    out = {
        "engine": "nuts_unsat",
        "min_ess": float(np.min(ess)),
        "ess_cap": float(CHAINS * DRAWS),
        "sampler_seconds": t_sampler,
        "first_seconds": t_first,
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

    # hidden=64 / S=1 (round 3): compile time on this backend scales
    # with the MLP body (h=128/S=4 cold-compiled 477 s — never fits the
    # driver budget; h=64/S=1 is ~3x smaller); the CPU oracle below
    # measures the IDENTICAL configuration, so vs_baseline is apples to
    # apples.
    vdata = make_vae_data(num_points=4096, obs_dim=64)
    p_model, _ = vae_model(vdata, VAEConfig(latent_dim=8, hidden_dim=64,
                                            batch_size=256))
    n_steps = 500
    perform_inference._benchmark = True
    try:
        perform_inference(p_model, number_iterations=n_steps,
                          number_samples=1, lr=1e-3,
                          key=jax.random.PRNGKey(3))
        elbo_sps = n_steps / perform_inference._last_run_seconds
    finally:
        perform_inference._benchmark = False
    print(json.dumps({"elbo_steps_per_sec": elbo_sps}), flush=True)


# ======================================================================
# parent mode: oracle measurement + orchestration (no JAX here)
# ======================================================================

class Child:
    """A bench child process polled asynchronously.

    The axon backend multiplexes concurrent processes on the one chip
    — while a child compiles, the chip sits idle.  The remote compile
    service runs concurrent SMALL jobs without slowdown (1.6/1.8 s
    concurrent vs 1.5 s solo) and concurrent LARGE jobs with ~1.4x
    contention (nuts needed ~500 s alongside two siblings vs 337 s
    solo), so concurrency still beats the serial sum by far: measured
    full-cold compiles on 2026-08-20 were nuts 337 s, vae 477 s
    (h128/S4; the bench now uses the ~3x-smaller h64/S1), unsat 754 s
    autodiff (now hand-fused to headline-class).  The service does NOT
    cache across processes, contrary to the round-2 lore — re-measured
    twice.  Each child's TIMED measurement is a single XLA program
    launch (device-atomic) taken as the best of 3 runs, so cross-child
    queueing delay cannot inflate it.
    """

    def __init__(self, name: str, args):
        import tempfile

        self.name = name
        self.args = args
        self.outfile = tempfile.NamedTemporaryFile(
            mode="w+b", suffix=f"_{name}.out", delete=False
        )
        cmd = [sys.executable, os.path.abspath(__file__)] + args
        self.t0 = time.time()
        self.proc = subprocess.Popen(cmd, stdout=self.outfile, stderr=sys.stderr)
        self.result = None
        self.done = False
        log(f"[parent] launched {name}")

    def poll(self):
        """None while running; on exit, the parsed last JSON line (or
        None if the child failed) — cached."""
        if self.done:
            return self.result
        if self.proc.poll() is None:
            return None
        self.done = True
        dt = time.time() - self.t0
        try:
            with open(self.outfile.name, "rb") as f:
                lines = [l for l in f.read().decode().splitlines() if l.strip()]
            self.result = json.loads(lines[-1]) if lines else None
        except Exception as e:
            log(f"[parent] {self.name} unparseable output: {e}")
            self.result = None
        if self.proc.returncode != 0:
            log(f"[parent] {self.name} failed rc={self.proc.returncode} "
                f"after {dt:.0f}s")
            self.result = None
        elif self.result is not None:
            log(f"[parent] {self.name} finished in {dt:.0f}s")
        return self.result

    def kill(self):
        if self.proc.poll() is None:
            self.proc.kill()  # exact PID we own
            log(f"[parent] killed {self.name} after "
                f"{time.time()-self.t0:.0f}s")


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


def torch_ard_oracle_step_seconds() -> float:
    """Eager PyTorch CPU: seconds per chains-batched leapfrog step on the
    UNSAT config's hierarchical ARD logreg potential (w, log-tau)."""
    import numpy as np
    import torch

    rng = np.random.RandomState(0)
    x = rng.normal(0, 1, size=(UNSAT_N, DIM)).astype(np.float32)
    y = (rng.uniform(size=UNSAT_N) < 0.5).astype(np.float32)
    xt, yt = torch.tensor(x), torch.tensor(y)
    theta = torch.zeros((CHAINS, 2 * DIM), requires_grad=True)

    def neg_log_post(th):
        w, v = th[:, :DIM], th[:, DIM:]  # v = log tau
        logits = w @ xt.T
        ll = yt * torch.nn.functional.logsigmoid(logits) + (
            1 - yt
        ) * torch.nn.functional.logsigmoid(-logits)
        lp_w = -0.5 * ((w * torch.exp(-v)) ** 2).sum(-1) - v.sum(-1)
        lp_v = -0.5 * ((v / UNSAT_TAU_SD) ** 2).sum(-1)
        return -(ll.sum(-1) + lp_w + lp_v).sum()

    r = torch.randn(CHAINS, 2 * DIM)
    for _ in range(3):
        (g,) = torch.autograd.grad(neg_log_post(theta), theta)
    n_timed = 30
    t0 = time.time()
    for _ in range(n_timed):
        (g,) = torch.autograd.grad(neg_log_post(theta), theta)
        with torch.no_grad():
            r = r - 0.5 * 0.01 * g
            tnew = theta + 0.01 * r
        theta = tnew.detach().requires_grad_(True)
    return (time.time() - t0) / n_timed


def torch_vae_oracle_steps_per_sec() -> float:
    import numpy as np
    import torch

    rng = np.random.RandomState(1)
    tdata = torch.tensor(
        (rng.uniform(size=(4096, 64)) < 0.3).astype(np.float32))
    enc_mu = torch.nn.Sequential(
        torch.nn.Linear(64, 64), torch.nn.ReLU(), torch.nn.Linear(64, 8))
    enc_ls = torch.nn.Sequential(
        torch.nn.Linear(64, 64), torch.nn.ReLU(), torch.nn.Linear(64, 8))
    dec = torch.nn.Sequential(
        torch.nn.Linear(8, 64), torch.nn.ReLU(), torch.nn.Linear(64, 64))
    opt = torch.optim.Adam(
        list(enc_mu.parameters()) + list(enc_ls.parameters())
        + list(dec.parameters()), lr=1e-3)

    def step():
        idx = torch.randint(0, tdata.shape[0], (256,))
        xb = tdata[idx]
        mu_e = enc_mu(xb)
        ls_e = torch.clamp(enc_ls(xb), -5, 3)
        elbo = 0.0
        for _ in range(1):  # S=1 MC sample (matches the TPU child)
            zb = mu_e + torch.exp(ls_e) * torch.randn_like(mu_e)
            logits = dec(zb)
            ll = -torch.nn.functional.binary_cross_entropy_with_logits(
                logits, xb, reduction="sum")
            lp_z = -0.5 * (zb * zb).sum()
            lq_z = (-0.5 * ((zb - mu_e) / torch.exp(ls_e)) ** 2 - ls_e).sum()
            elbo = elbo + (ll + lp_z - lq_z)
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
        elif sys.argv[2] == "unsat":
            child_unsat()
        else:
            child(sys.argv[2])
        return

    t_start = time.time()
    total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET", 560))
    deadline = t_start + total_budget

    # -- 1. reference-frame oracle (fast, CPU-only) ---------------------
    t_torch_step = torch_leapfrog_oracle_step_seconds()
    log(f"torch eager CPU: {t_torch_step*1e3:.2f} ms / batched leapfrog step")

    # -- 2. ALL children launch concurrently (see Child docstring): the
    # wall-clock cost is ~max(compile times) x a measured ~1.4x
    # contention factor (the service partially serializes concurrent
    # large jobs), still far below their sum.  ChEES (an ~85 s-class program)
    # launches ONLY if nuts crashes — a time-based racer was measured to
    # hurt: it lands too late to help on slow days while its compile
    # steals service capacity from nuts at the worst moment.
    children = {
        "nuts": Child("nuts", ["--child", "nuts"]),
        "vae": Child("vae", ["--child", "vae"]),
        "unsat": Child("unsat", ["--child", "unsat"]),
    }
    chees = None
    r = None
    headline_engine = None
    while time.time() < deadline - 20:
        nr = children["nuts"].poll()
        if nr is not None:
            r, headline_engine = nr, "nuts"
            break
        if children["nuts"].done and chees is None:
            log("[parent] nuts crashed; launching chees fallback")
            chees = Child("chees", ["--child", "chees"])
        if chees is None and time.time() > deadline - 170:
            # headline INSURANCE: the compile cache is a small laggy LRU
            # (measured: the same nuts program hit in 32 s at 11:16 and
            # missed >540 s at 11:29 on 2026-08-20) — if nuts missed,
            # the ~85 s-class ChEES program still rescues a landed,
            # honestly-labeled headline
            log("[parent] nuts still compiling; launching chees racer")
            chees = Child("chees", ["--child", "chees"])
        if chees is not None:
            cr = chees.poll()
            if cr is not None and (
                children["nuts"].done or time.time() > deadline - 45
            ):
                r, headline_engine = cr, "chees"
                break
            if chees.done and cr is None and children["nuts"].done:
                break  # both headline engines crashed
        time.sleep(2.0)
    if chees is not None:
        chees.kill()
    if r is None:
        children["nuts"].kill()
        # print a parseable failure line NOW; keep collecting secondaries
        print(json.dumps({
            "metric": "NUTS min-ESS/sec/chip (engines timed out)",
            "value": 0.0, "unit": "ess/sec", "vs_baseline": 0.0,
        }), flush=True)
        primary = None
        rv = ru = None
        while time.time() < deadline - 10:
            rv = children["vae"].poll()
            ru = children["unsat"].poll()
            if children["vae"].done and children["unsat"].done:
                break
            time.sleep(2.0)
        children["vae"].kill()
        children["unsat"].kill()
        if rv is not None:
            log(f"secondary (headline missed): VAE ELBO steps/sec = "
                f"{rv['elbo_steps_per_sec']:.0f}")
        if ru is not None:
            log(f"unsaturated (headline missed): min_ess={ru['min_ess']:.0f} "
                f"of cap {ru['ess_cap']:.0f}, sampler={ru['sampler_seconds']:.2f}s")
        return

    ess_per_sec = r["min_ess"] / r["sampler_seconds"]

    # oracle charged the same trajectory at its own step rate
    total_chain_steps = (
        r["total_chain_steps_draws"] + r["warmup_steps_per_chain"] * CHAINS
    )
    baseline_time = (total_chain_steps / CHAINS) * t_torch_step
    vs_baseline = ess_per_sec / (r["min_ess"] / baseline_time)

    label = "NUTS" if r["engine"] == "nuts" else "ChEES-HMC"
    primary = {
        "metric": (
            f"{label} min-ESS/sec/chip, Bayesian logreg "
            f"N={N_POINTS} d={DIM}, {CHAINS} chains x {DRAWS} draws"
        ),
        "value": round(ess_per_sec, 2),
        "unit": "ess/sec",
        "vs_baseline": round(vs_baseline, 2),
    }
    # hang-safety: the primary line prints IMMEDIATELY; an enriched copy
    # (same schema + secondary-metric keys) prints at the very end, so a
    # parser taking either the first or the last JSON line gets the same
    # headline numbers
    print(json.dumps(primary), flush=True)

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

    # -- 4. secondary metrics: poll the concurrently-launched children --
    rv = ru = None
    while time.time() < deadline - 12:
        rv = children["vae"].poll()
        ru = children["unsat"].poll()
        if children["vae"].done and children["unsat"].done:
            break
        time.sleep(2.0)
    children["vae"].kill()
    children["unsat"].kill()
    rv = rv or children["vae"].poll()
    ru = ru or children["unsat"].poll()

    if rv is not None:
        torch_sps = torch_vae_oracle_steps_per_sec()
        log(
            f"secondary: VAE ELBO steps/sec = {rv['elbo_steps_per_sec']:.0f} "
            f"(B=256, obs=64, latent=8, hidden=64, S=1); torch oracle = "
            f"{torch_sps:.0f} -> {rv['elbo_steps_per_sec']/torch_sps:.1f}x"
        )
        primary["elbo_steps_per_sec"] = round(rv["elbo_steps_per_sec"], 1)
        primary["elbo_vs_baseline"] = round(rv["elbo_steps_per_sec"] / torch_sps, 2)
    else:
        log("secondary: VAE child did not finish within budget")

    # -- 5. unsaturated companion (VERDICT r2 #2): ARD logreg -----------
    if ru is not None:
        unsat_eps = ru["min_ess"] / ru["sampler_seconds"]
        t_torch_unsat = torch_ard_oracle_step_seconds()
        base_t = (ru["total_chain_steps_draws"] / CHAINS +
                  ru["warmup_steps_per_chain"]) * t_torch_unsat
        unsat_vs = unsat_eps / (ru["min_ess"] / max(base_t, 1e-9))
        log(
            f"unsaturated: ARD logreg N={UNSAT_N} d={DIM} (w,tau; funnel-like), "
            f"min_ess={ru['min_ess']:.0f} of cap {ru['ess_cap']:.0f} "
            f"({100*ru['min_ess']/ru['ess_cap']:.0f}% — UNSATURATED) "
            f"sampler={ru['sampler_seconds']:.2f}s -> {unsat_eps:.0f} ess/sec "
            f"({unsat_vs:.0f}x torch-eager oracle); accept={ru['accept']:.2f} "
            f"divergences={ru['divergences']}"
        )
        primary["unsat_min_ess"] = round(ru["min_ess"], 1)
        primary["unsat_ess_cap"] = ru["ess_cap"]
        primary["unsat_ess_per_sec"] = round(unsat_eps, 1)
    else:
        log("unsaturated companion: did not finish within budget")

    # -- 6. enriched final JSON (same headline, extra keys) -------------
    if len(primary) > 4:
        print(json.dumps(primary), flush=True)


if __name__ == "__main__":
    main()
