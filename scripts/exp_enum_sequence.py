"""Sequence-node enumeration trace-time experiment (VERDICT r3 #3).

Measures compile+trace time of the enumerated marginal density for a DSL
HMM expressed as ONE plated MarkovProcess node, across T.  The unrolled
T-scalar-node idiom traces O(T) (its base density walk alone is a Python
loop over T graph nodes), so the sequence node is the scalable DSL form:
table extraction costs O(K^2) vectorized evaluations + one forward
`lax.scan`, independent of T.

Measured 2026-08-20 (CPU backend, fake 8-device mesh conftest config):

    T=   100: compile+trace+eval 4.9 s
    T= 1,000: 3.6 s
    T=10,000: 3.8 s        <- unrolled idiom would be ~100x T=100
    T=100,000: 5.9 s       (growth is XLA compile of the larger scan
                            body constants, not tracing)

Run: python scripts/exp_enum_sequence.py [--tpu]
"""
import argparse
import os
import time

p = argparse.ArgumentParser()
p.add_argument("--tpu", action="store_true", help="run on the real chip")
args = p.parse_args()

if not args.tpu:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )
import jax  # noqa: E402

if not args.tpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from brancher_tpu import NormalVariable, ProbabilisticModel  # noqa: E402
from brancher_tpu.distributions import Categorical  # noqa: E402
from brancher_tpu.stochastic_processes import MarkovProcess  # noqa: E402
import brancher_tpu.functions as BF  # noqa: E402


def build(t_len, k=3):
    trans_logits = jnp.asarray(
        np.random.RandomState(0).normal(0, 1.5, (k, k)).astype(np.float32)
    )
    s = MarkovProcess(
        t_len, Categorical(), lambda prev: {"logits": trans_logits[prev]},
        init_dist=Categorical(),
        init_links={"logits": jnp.zeros((k,), jnp.float32)}, name="s",
    )
    locs = NormalVariable(jnp.zeros(k), 2.0 * jnp.ones(k), "locs")
    y = NormalVariable(BF.take(locs, s), 0.7, "y")
    y.observe(np.random.RandomState(1).normal(0, 2, t_len).astype(np.float32))
    return ProbabilisticModel([y])


for t_len in (100, 1_000, 10_000, 100_000):
    t0 = time.time()
    comp = build(t_len).compiled()
    params = comp.initial_params
    fn = comp.enum_log_density_fn(params, None)
    z = {"locs": jnp.zeros(3)}
    f = jax.jit(lambda zz: fn(params, zz, None))
    v = f(z)
    jax.block_until_ready(v)
    t1 = time.time()
    # steady-state eval
    for _ in range(3):
        jax.block_until_ready(f(z))
    t2 = time.time()
    print(
        f"T={t_len:7,d}: compile+trace {t1 - t0:6.2f} s   "
        f"eval {(t2 - t1) / 3 * 1e3:7.2f} ms   marginal {float(v):.1f}"
    )
