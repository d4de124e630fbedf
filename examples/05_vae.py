"""Variational autoencoder with amortized neural guide.

Run: python examples/05_vae.py
"""
import numpy as np

from brancher_tpu.inference import perform_inference
from brancher_tpu.models.vae import VAEConfig, make_vae_data, vae_model

data = make_vae_data(num_points=4096, obs_dim=64, true_latent=4)
p_model, q_model = vae_model(data, VAEConfig(latent_dim=8, hidden_dim=128,
                                             batch_size=256))
res = perform_inference(p_model, number_iterations=2000, number_samples=4,
                        lr=1e-3)
print(f"-ELBO: {res.loss_curve[0]:.0f} -> {res.loss_curve[-1]:.0f}")

# reconstruct: posterior sample through the joint
post = p_model.get_posterior_sample_dict(1)
print("reconstruction logits shape:", np.asarray(post["x"]).shape)
