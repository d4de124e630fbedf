"""AR(2) time series: scan-compiled log-prob + NUTS over parameters.

Run: python examples/03_autoregressive_timeseries.py
"""
import numpy as np

from brancher_tpu.inference import NUTS, sample
from brancher_tpu.models.autoregressive import ar_model, make_ar_data

true_coeffs, true_noise = (0.5, 0.2), 0.3
data = make_ar_data(length=1000, coeffs=true_coeffs, noise=true_noise)

model = ar_model(data, order=2)
res = sample(model, kernel=NUTS(max_depth=8), num_samples=500, num_warmup=500,
             num_chains=8)
c = np.asarray(res.samples["coeffs"].mean(axis=(0, 1)))
s = float(res.samples["noise_scale"].mean())
print(f"coeffs: {c.round(3)} (true {true_coeffs})")
print(f"noise scale: {s:.3f} (true {true_noise})")
print(f"divergences: {int(res.diagnostics['num_divergences'])}")
