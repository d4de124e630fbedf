"""Flow / transformation tests (reference's transformations.py parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brancher_tpu import NormalVariable, ProbabilisticModel
from brancher_tpu.transformations import (
    PlanarFlow,
    Shift,
    Sigmoid,
    TransformedVariable,
    TriangularLinear,
)
from brancher_tpu.inference import perform_inference


def test_triangular_linear_density(key):
    """Gaussian through L z: density must match N(0, L L^T)."""
    qz = TransformedVariable("z", dim=2, flows=[TriangularLinear()])
    model = ProbabilisticModel([qz])
    comp = model.compiled()
    params = dict(comp.initial_params)
    params["z__flow0_log_diag"] = jnp.asarray([0.5, -0.3])
    params["z__flow0_tril"] = jnp.asarray([[0.0, 0.0], [0.7, 0.0]])

    store = comp._as_store(params)
    vals, lp = comp._walk_sample(store, key, {})
    z = np.asarray(vals["z"])
    L = np.tril(np.asarray(params["z__flow0_tril"]), -1) + np.diag(
        np.exp(np.asarray(params["z__flow0_log_diag"]))
    )
    cov = L @ L.T
    expect = (
        -0.5 * z @ np.linalg.inv(cov) @ z
        - 0.5 * np.log(np.linalg.det(cov))
        - np.log(2 * np.pi)
    )
    np.testing.assert_allclose(float(lp), expect, rtol=1e-4)
    # invertible stack: log_prob of an arbitrary point agrees too
    lp2 = float(comp.log_prob_one(params, {"z": vals["z"]}))
    np.testing.assert_allclose(lp2, expect, rtol=1e-4)


def test_planar_flow_logdet_vs_autodiff(key):
    fl = PlanarFlow()
    params = fl.param_inits(3)
    params = {k: v + 0.3 for k, v in params.items()}
    z = jax.random.normal(key, (3,))
    f = lambda zz: fl.forward_and_log_det(zz, params)[0]
    jac = jax.jacfwd(f)(z)
    _, logdet = fl.forward_and_log_det(z, params)
    np.testing.assert_allclose(
        float(logdet), np.log(abs(np.linalg.det(np.asarray(jac)))), rtol=1e-4
    )


def test_sigmoid_flow_roundtrip(key):
    fl = Sigmoid()
    z = jax.random.normal(key, (4,))
    x, logdet = fl.forward_and_log_det(z, {})
    z2 = fl.inverse(x, {})
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), rtol=1e-4)
    assert np.all((np.asarray(x) > 0) & (np.asarray(x) < 1))


def test_flow_guide_improves_on_conjugate(key):
    """A flow-transformed variational family trains through SVI."""
    from brancher_tpu.models.conjugate import conjugate_normal_model

    model, truth = conjugate_normal_model(num_obs=15)
    qmu = TransformedVariable("mu", dim=1, flows=[TriangularLinear(), Shift()])
    q = ProbabilisticModel([qmu])
    model.set_posterior_model(q)
    res = perform_inference(model, number_iterations=1500, number_samples=16,
                            lr=0.02, key=key)
    post = model.get_posterior_sample_dict(2000, key=jax.random.PRNGKey(5))
    m = float(jnp.mean(post["mu"]))
    v = float(jnp.var(post["mu"]))
    assert abs(m - truth["post_mean"]) < 0.1, (m, truth["post_mean"])
    assert abs(v - truth["post_var"]) < 0.05, (v, truth["post_var"])
