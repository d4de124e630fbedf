"""Particle VI (WVGD capability) tests."""
import jax
import jax.numpy as jnp
import numpy as np

from brancher_tpu import NormalVariable, ProbabilisticModel
from brancher_tpu.inference import perform_inference
from brancher_tpu.inference.svi import WassersteinVariationalGradientDescent
from brancher_tpu.inference.particle_inference_tools import VoronoiSet


def test_wvgd_matches_conjugate(key):
    from brancher_tpu.models.conjugate import conjugate_normal_model

    model, truth = conjugate_normal_model(num_obs=20)
    res = perform_inference(
        model,
        number_iterations=400,
        inference_method=WassersteinVariationalGradientDescent(number_particles=64),
        lr=0.05,
        key=key,
    )
    particles = np.asarray(res.extras["particles"]["mu"])
    assert abs(particles.mean() - truth["post_mean"]) < 0.1
    assert abs(particles.var() - truth["post_var"]) < 0.04


def test_voronoi_set():
    centers = jnp.asarray([[0.0, 0.0], [10.0, 10.0]])
    vs = VoronoiSet(centers)
    pts = jnp.asarray([[0.1, 0.2], [9.0, 9.5], [1.0, 0.0]])
    idx = np.asarray(vs.assign(pts))
    np.testing.assert_array_equal(idx, [0, 1, 0])
    counts = np.asarray(vs.cell_counts(pts))
    np.testing.assert_array_equal(counts, [2, 1])
