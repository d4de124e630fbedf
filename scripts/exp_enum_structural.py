"""Measure the structural chain-factor extractor vs the probe path
(VERDICT r2 #4 / ROADMAP #5).

The probe path builds chain tables from T*K + (T-1)*K^2 + 1 FULL-density
evaluations (each O(T)) per potential call -> O(T^2 K^2) work; the
structural extractor evaluates only each factor's local terms ->
O(T K^2).  This script times one jitted grad of the marginalized density
at several chain lengths, plus NUTS end-to-end, on CPU.

Run: python scripts/exp_enum_structural.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import brancher_tpu.functions as BF
from brancher_tpu import CategoricalVariable, NormalVariable, ProbabilisticModel

_A = np.asarray([[0.9, 0.1], [0.2, 0.8]], np.float32)


def chain_hmm_model(data):
    a = jnp.asarray(_A)
    mu = NormalVariable(0.0, 3.0, "mu")
    s = CategoricalVariable(probs=jnp.asarray([0.5, 0.5]), name="s0")
    states = [s]
    for t in range(1, data.shape[0]):
        s = CategoricalVariable(probs=BF.take(a, s, axis=0), name=f"s{t}")
        states.append(s)
    outs = []
    for t, st in enumerate(states):
        x = NormalVariable(2.0 * (2.0 * st - 1.0) + mu, 0.6, f"x{t}")
        x.observe(jnp.asarray(data[t]))
        outs.append(x)
    return ProbabilisticModel(outs)


def make_data(t_n, mu=0.5, seed=3):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, 2)
    xs = []
    for _ in range(t_n):
        xs.append(mu + 2.0 * (2 * s - 1) + 0.6 * rng.normal())
        s = rng.choice(2, p=_A[s])
    return np.asarray(xs, np.float32)


def time_fn(f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    for t_n in (16, 48, 96):
        comp = chain_hmm_model(make_data(t_n)).compiled()
        p = comp.initial_params
        names = comp.discrete_chain_structure()
        assert names is not None

        def density_from(tables_fn):
            lse = jax.scipy.special.logsumexp

            def den(mu):
                b, u, psi = tables_fn(p, {"mu": mu}, {}, names, 2)
                def fstep(alpha, xs):
                    psi_t, u_t = xs
                    return lse(alpha[:, None] + psi_t, axis=0) + u_t, None
                alpha, _ = jax.lax.scan(fstep, u[0], (psi, u[1:]))
                return b + lse(alpha)

            return jax.jit(jax.value_and_grad(den))

        g_struct = density_from(comp._chain_tables_structural)
        g_probe = density_from(comp._chain_tables)
        mu0 = jnp.asarray(0.4)

        c0 = time.perf_counter()
        ts = time_fn(g_struct, mu0)
        cs = time.perf_counter() - c0
        c0 = time.perf_counter()
        tp = time_fn(g_probe, mu0)
        cp = time.perf_counter() - c0
        v_s, _ = g_struct(mu0)
        v_p, _ = g_probe(mu0)
        assert abs(float(v_s) - float(v_p)) < 1e-3 * max(1.0, abs(float(v_p)))
        print(
            f"T={t_n:4d}  value+grad per call: structural {ts*1e3:8.2f} ms "
            f"(compile {cs:5.1f}s) | probe {tp*1e3:8.2f} ms (compile {cp:5.1f}s)"
            f"  -> {tp/ts:5.1f}x faster"
        )

    # NUTS end-to-end at a moderate length
    from brancher_tpu.inference import NUTS, sample

    t_n = 48
    model = chain_hmm_model(make_data(t_n))
    t0 = time.perf_counter()
    res = sample(model, kernel=NUTS(max_depth=6), num_samples=150,
                 num_warmup=150, num_chains=2, key=jax.random.PRNGKey(0),
                 enumerate_discrete=True)
    t1 = time.perf_counter()
    print(f"NUTS T={t_n} (structural dispatch): {t1-t0:.1f}s total, "
          f"mu={float(np.asarray(res.samples['mu']).mean()):.3f}")


if __name__ == "__main__":
    main()
