"""Why does the VAE SVI program cold-compile slowly on this backend?
Time first-call (compile+run) of perform_inference at varying pieces:
scan length, MLP width, with/without data loader, S samples.

RESULTS: appended after runs.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
import numpy as np

from brancher_tpu.models.vae import VAEConfig, make_vae_data, vae_model
from brancher_tpu.inference import perform_inference


def t_first(n_steps, hidden, batch, n_samples):
    vdata = make_vae_data(num_points=4096, obs_dim=64)
    p_model, _ = vae_model(vdata, VAEConfig(latent_dim=8, hidden_dim=hidden,
                                            batch_size=batch))
    t0 = time.time()
    perform_inference(p_model, number_iterations=n_steps,
                      number_samples=n_samples, lr=1e-3,
                      key=jax.random.PRNGKey(3))
    return time.time() - t0


for label, args in (
    ("bench config (500 steps, h128, B256, S4)", (500, 128, 256, 4)),
    ("50 steps", (50, 128, 256, 4)),
    ("S=1", (500, 128, 256, 1)),
    ("h=32", (500, 32, 256, 4)),
):
    dt = t_first(*args)
    print(f"{label}: first-call {dt:.1f}s", flush=True)
