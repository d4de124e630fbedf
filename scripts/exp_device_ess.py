"""Measure device-side ESS vs host FFT path at bench scale (ROADMAP r2 perf #3).

Measured 2026-08-18 on the axon TPU v5 lite chip, x=[1024,1000,32]:
  device ESS first call (compile+run): 0.85 s   cached: ~0 s
  device split R-hat first call:       4.8 s
  host path: 7.4 s transfer + 25.2 s numpy FFT ESS = ~32 s
  max relative disagreement vs host:   7e-7
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t0=time.time()
print("backend:", jax.devices()[0], flush=True)
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (1024, 1000, 32))
x = jax.block_until_ready(x)
print(f"alloc {time.time()-t0:.1f}s", flush=True)

from brancher_tpu.inference.diagnostics import (
    effective_sample_size, effective_sample_size_device,
    potential_scale_reduction_device)
t0=time.time()
d = jax.block_until_ready(effective_sample_size_device(x))
print(f"device ESS first (compile+run): {time.time()-t0:.2f}s", flush=True)
t0=time.time()
d = jax.block_until_ready(effective_sample_size_device(x))
print(f"device ESS cached: {time.time()-t0:.3f}s", flush=True)
t0=time.time()
r = jax.block_until_ready(potential_scale_reduction_device(x))
print(f"device rhat first: {time.time()-t0:.2f}s", flush=True)
t0=time.time()
xn = np.asarray(x)
print(f"host transfer of [1024,1000,32]: {time.time()-t0:.2f}s", flush=True)
t0=time.time()
h = effective_sample_size(xn)
print(f"host FFT ESS: {time.time()-t0:.2f}s", flush=True)
print("agreement:", np.max(np.abs((np.asarray(d)-h)/h)))
