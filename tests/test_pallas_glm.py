"""Generalized fused GLM potentials: kernel parity (interpret mode) and
the numeric recognizer's exactness guarantees (VERDICT r1 next-round #3)."""
import pytest

pytestmark = pytest.mark.slow  # VERDICT r3 weak #8: fast gate runs -m 'not slow'
import jax
import jax.numpy as jnp
import numpy as np

from brancher_tpu.ops.pallas_glm import (

    bernoulli_vg_pallas,
    bernoulli_vg_reference,
    normal_vg_pallas,
    normal_vg_reference,
    recognize_fused_potential,
)


def _rand(key, *shape):
    return jax.random.normal(key, shape)


def test_bernoulli_kernel_matches_reference(key):
    n, d, c = 300, 5, 16  # n not a multiple of the row block: tests masking
    ks = jax.random.split(key, 4)
    x = _rand(ks[0], n, d)
    y = (jax.random.uniform(ks[1], (n,)) < 0.5).astype(jnp.float32)
    b = 0.3 * _rand(ks[2], n)
    z = _rand(ks[3], c, d)
    m = jnp.linspace(-1, 1, d)
    iv = jnp.linspace(0.5, 2.0, d)
    v_r, g_r = bernoulli_vg_reference(z, x, y, b, m, iv, ll_scale=1.7)
    v_p, g_p = bernoulli_vg_pallas(z, x, y, b, m, iv, ll_scale=1.7,
                                   block_rows=256, interpret=True)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_r), rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), rtol=2e-4, atol=1e-3)


def test_normal_kernel_matches_reference(key):
    n, d, c = 513, 4, 8
    ks = jax.random.split(key, 5)
    x = _rand(ks[0], n, d)
    y = _rand(ks[1], n)
    b = 0.1 * _rand(ks[2], n)
    z = 0.5 * _rand(ks[3], c, d)
    u = jnp.asarray([0.0, 0.0, 0.0, 1.0])  # last coord is log-noise
    m = jnp.zeros(d)
    iv = jnp.ones(d)
    v_r, g_r = normal_vg_reference(z, x, y, b, u, -0.5, m, iv)
    v_p, g_p = normal_vg_pallas(z, x, y, b, u, -0.5, m, iv,
                                block_rows=256, interpret=True)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_r), rtol=3e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), rtol=3e-4, atol=2e-3)


def test_bernoulli_bf16_kernel_matches_bf16_reference(key):
    """bf16 N-tiled kernel (VERDICT r4 missing #1) vs the bf16 XLA
    reference: same bf16-multiply/f32-accumulate math, so agreement is
    at f32-accumulation-order level, far tighter than bf16 rounding."""
    from brancher_tpu.ops.pallas_glm import bernoulli_vg_reference_bf16

    n, d, c = 300, 8, 16  # n not a block multiple: exercises masking
    ks = jax.random.split(key, 4)
    x = _rand(ks[0], n, d) / np.sqrt(d)
    y = (jax.random.uniform(ks[1], (n,)) < 0.5).astype(jnp.float32)
    b = 0.3 * _rand(ks[2], n)
    z = _rand(ks[3], c, d)
    m = jnp.linspace(-1, 1, d)
    iv = jnp.linspace(0.5, 2.0, d)
    v_r, g_r = bernoulli_vg_reference_bf16(
        z, x.astype(jnp.bfloat16), y, b, m, iv, ll_scale=1.7)
    v_p, g_p = bernoulli_vg_pallas(z, x, y, b, m, iv, ll_scale=1.7,
                                   block_rows=256, interpret=True,
                                   dtype="bf16")
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_r), rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), rtol=2e-4, atol=1e-3)
    # and the bf16 kernel is bf16-close to the f32 ground truth
    v32, g32 = bernoulli_vg_reference(z, x, y, b, m, iv, ll_scale=1.7)
    assert float(jnp.max(jnp.abs(v_p - v32) / (jnp.abs(v32) + 1.0))) < 2e-2
    assert float(jnp.max(jnp.abs(g_p - g32) / (jnp.max(jnp.abs(g32)) + 1.0))) < 2e-2


def test_normal_bf16_kernel_matches_bf16_reference(key):
    from brancher_tpu.ops.pallas_glm import normal_vg_reference_bf16

    n, d, c = 513, 8, 8
    ks = jax.random.split(key, 5)
    x = _rand(ks[0], n, d) / np.sqrt(d)
    y = _rand(ks[1], n)
    b = 0.1 * _rand(ks[2], n)
    z = 0.5 * _rand(ks[3], c, d)
    u = jnp.zeros(d).at[-1].set(1.0)
    m = jnp.zeros(d)
    iv = jnp.ones(d)
    v_r, g_r = normal_vg_reference_bf16(
        z, x.astype(jnp.bfloat16), y, b, u, -0.5, m, iv)
    v_p, g_p = normal_vg_pallas(z, x, y, b, u, -0.5, m, iv,
                                block_rows=256, interpret=True,
                                dtype="bf16")
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_r), rtol=3e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), rtol=3e-4, atol=2e-3)


def test_recognizer_logreg_matches_autodiff(key):
    """Recognizer must produce a potential equal (up to a constant) to the
    model's autodiff log-density — including gradient — for logreg."""
    from brancher_tpu.models.logistic_regression import (
        logistic_regression_model, make_logreg_data,
    )

    x, y, _ = make_logreg_data(num_points=120, dim=6, seed=0)
    model = logistic_regression_model(x, y)
    comp = model.compiled()
    fused = recognize_fused_potential(comp, comp.initial_params)
    assert fused is not None

    import jax.flatten_util

    z0, unravel = jax.flatten_util.ravel_pytree(comp.z_example())

    def pot(zf):
        return comp.log_density_z(comp.initial_params, unravel(zf), None)

    zs = jax.random.normal(key, (4, z0.shape[0]))
    v_ref, g_ref = jax.vmap(jax.value_and_grad(pot))(zs)
    v_f, g_f = fused(zs)
    dv = np.asarray(v_f - v_ref)
    np.testing.assert_allclose(dv, dv[0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_recognizer_ar_matches_autodiff(key):
    """AR(2): normal_learned family with the lagged series as design."""
    from brancher_tpu.models.autoregressive import ar_model, make_ar_data

    data = make_ar_data(length=200, coeffs=(0.5, 0.2), noise=0.4, seed=1)
    model = ar_model(data, order=2)
    comp = model.compiled()
    fused = recognize_fused_potential(comp, comp.initial_params)
    assert fused is not None

    import jax.flatten_util

    z0, unravel = jax.flatten_util.ravel_pytree(comp.z_example())

    def pot(zf):
        return comp.log_density_z(comp.initial_params, unravel(zf), None)

    zs = 0.7 * jax.random.normal(key, (4, z0.shape[0]))
    v_ref, g_ref = jax.vmap(jax.value_and_grad(pot))(zs)
    v_f, g_f = fused(zs)
    dv = np.asarray(v_f - v_ref)
    np.testing.assert_allclose(dv, dv[0], atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


def test_recognizer_rejects_nonlinear_model():
    """A model with a non-affine link must be rejected, not mis-fused."""
    import brancher_tpu.functions as BF
    from brancher_tpu import BernoulliVariable, NormalVariable, ProbabilisticModel

    rng = np.random.RandomState(0)
    x = rng.normal(size=(50, 3)).astype(np.float32)
    w = NormalVariable(jnp.zeros(3), jnp.ones(3), "w")
    logits = BF.matmul(jnp.asarray(x), BF.exp(w))  # nonlinear in w
    yv = BernoulliVariable(logits=logits, name="y")
    yv.observe(jnp.asarray((rng.uniform(size=50) < 0.5).astype(np.int32)))
    comp = ProbabilisticModel([yv]).compiled()
    assert recognize_fused_potential(comp, comp.initial_params) is None


def test_recognizer_rejects_nongaussian_prior():
    from brancher_tpu import BernoulliVariable, StudentTVariable, ProbabilisticModel
    import brancher_tpu.functions as BF

    rng = np.random.RandomState(0)
    x = rng.normal(size=(40, 2)).astype(np.float32)
    w = StudentTVariable(3.0, jnp.zeros(2), jnp.ones(2), "w")
    yv = BernoulliVariable(logits=BF.matmul(jnp.asarray(x), w), name="y")
    yv.observe(jnp.asarray((rng.uniform(size=40) < 0.5).astype(np.int32)))
    comp = ProbabilisticModel([yv]).compiled()
    assert recognize_fused_potential(comp, comp.initial_params) is None


def test_sample_auto_fuses_ar(key):
    """End-to-end: NUTS on AR(1) goes through the recognized fused
    potential by default and still recovers the true parameters."""
    from brancher_tpu.inference import NUTS, sample
    from brancher_tpu.models.autoregressive import ar_model, make_ar_data

    data = make_ar_data(length=400, coeffs=(0.7,), noise=0.3, seed=0)
    model = ar_model(data, order=1)
    res = sample(model, kernel=NUTS(max_depth=8), num_samples=400,
                 num_warmup=400, num_chains=8, key=key)
    comp = model.compiled()
    assert getattr(comp, "_fused_family_cache", None) is not None
    assert comp._fused_family_cache.family == "normal_learned"
    c_mean = float(jnp.mean(res.samples["coeffs"]))
    n_mean = float(jnp.mean(res.samples["noise_scale"]))
    assert abs(c_mean - 0.7) < 0.1
    assert abs(n_mean - 0.3) < 0.05
    assert float(res.diagnostics["num_divergences"]) == 0


def test_fused_leapfrog_matches_reference(key):
    """Pallas multi-step leapfrog (interpret) == XLA loop of the fused
    potential, bit-for-bit up to fp reassociation."""
    from brancher_tpu.models.logistic_regression import (
        logistic_regression_model, make_logreg_data,
    )
    from brancher_tpu.ops.pallas_glm import recognize_fused_family
    from brancher_tpu.ops.pallas_leapfrog import reference_leapfrog

    x, y, _ = make_logreg_data(num_points=100, dim=6, seed=0)
    comp = logistic_regression_model(x, y).compiled()
    fam = recognize_fused_family(comp, comp.initial_params)
    assert fam is not None

    lf_ref = reference_leapfrog(fam.value_and_grad(use_pallas=False))
    lf_pl = fam.leapfrog(use_pallas=True, interpret=True)

    ks = jax.random.split(key, 2)
    z = 0.3 * jax.random.normal(ks[0], (16, 6))
    r = jax.random.normal(ks[1], (16, 6))
    _, g0 = fam.value_and_grad(use_pallas=False)(z)
    inv_mass = jnp.linspace(0.5, 1.5, 6)
    for n_steps in (1, 7):
        z1r, r1r, v1r, g1r = lf_ref(z, r, g0, 0.05, inv_mass, n_steps)
        z1p, r1p, v1p, g1p = lf_pl(z, r, g0, 0.05, inv_mass, n_steps)
        np.testing.assert_allclose(np.asarray(z1p), np.asarray(z1r), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r1p), np.asarray(r1r), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(v1p), np.asarray(v1r), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(g1p), np.asarray(g1r), rtol=1e-4, atol=1e-4)


def test_hmc_with_fused_leapfrog_posterior(key):
    """Chain-batched HMC driven by the fused leapfrog recovers the
    conjugate posterior (reference XLA loop path on CPU)."""
    from brancher_tpu.inference import HMC, sample
    from brancher_tpu.models.conjugate import conjugate_normal_model

    model, truth = conjugate_normal_model(num_obs=20)
    res = sample(model, kernel=HMC(num_integration_steps=16),
                 num_samples=600, num_warmup=400, num_chains=32, key=key,
                 fused_leapfrog=True)
    comp = model.compiled()
    assert getattr(comp, "_fused_family_cache", None) is not None
    assert abs(float(jnp.mean(res.samples["mu"])) - truth["post_mean"]) < 0.05
    assert abs(float(jnp.var(res.samples["mu"])) - truth["post_var"]) < 0.03


# -- categorical / softmax family (ROADMAP r2 #9) -------------------------

def _bayes_softmax_model(n=150, d=4, k=3, seed=0):
    import brancher_tpu.functions as BF
    from brancher_tpu import NormalVariable, ProbabilisticModel

    rng = np.random.RandomState(seed)
    x = rng.normal(0, 1, size=(n, d)).astype(np.float32)
    w_true = rng.normal(0, 1.5, size=(d, k)).astype(np.float32)
    y = np.argmax(x @ w_true + rng.gumbel(size=(n, k)), axis=-1).astype(np.int32)

    w = NormalVariable(jnp.zeros((d, k)), jnp.ones((d, k)), "w")
    b = NormalVariable(jnp.zeros(k), 2.0 * jnp.ones(k), "b")
    from brancher_tpu import CategoricalVariable

    yv = CategoricalVariable(logits=BF.matmul(x, w) + b, name="y")
    yv.observe(y)
    return ProbabilisticModel([yv]), x, y


def test_recognizer_categorical_structure(key):
    from brancher_tpu.ops.pallas_glm import (
        CategoricalFusedFamily, recognize_fused_family,
    )

    model, x, y = _bayes_softmax_model()
    comp = model.compiled()
    fam = recognize_fused_family(comp, comp.initial_params)
    assert isinstance(fam, CategoricalFusedFamily), type(fam)
    n, d, k = x.shape[0], x.shape[1], 3
    # effective design = the d features + a ones column (the bias)
    assert fam.x.shape[0] == n and fam.x.shape[1] <= d + 1, fam.x.shape
    assert fam.y_onehot.shape == (n, k)
    # one (feature, class) cell per latent coordinate: D = d*k + k
    assert fam.cols.shape == (d * k + k,)

    # exact agreement with the autodiff density (values up to a constant
    # + gradients) at fresh random points
    import jax.flatten_util

    z_template = comp.z_example()
    z0, unravel = jax.flatten_util.ravel_pytree(z_template)

    def pot(zf):
        return comp.log_density_z(comp.initial_params, unravel(zf), None)

    zs = jax.random.normal(key, (5, z0.shape[0]))
    v_ref, g_ref = jax.vmap(jax.value_and_grad(pot))(zs)
    v_f, g_f = fam.value_and_grad()(zs)
    dv = np.asarray(v_f - v_ref)
    np.testing.assert_allclose(dv - dv[0], 0.0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


def test_categorical_fused_nuts_matches_autodiff_path(key):
    """The categorical family is opt-in (autodiff measured faster when
    the DSL exposes the matmul — see CategoricalFusedFamily docstring),
    so pass it explicitly via value_and_grad_fn."""
    from brancher_tpu.inference import NUTS, sample
    from brancher_tpu.ops.pallas_glm import recognize_fused_family

    model, x, y = _bayes_softmax_model(n=100, d=3, k=3, seed=1)
    comp = model.compiled()
    fam = recognize_fused_family(comp, comp.initial_params)
    kw = dict(kernel=NUTS(max_depth=6), num_samples=300, num_warmup=300,
              num_chains=4, key=key)
    res_fused = sample(model, value_and_grad_fn=fam.value_and_grad(), **kw)
    res_plain = sample(model, fused_potential="off", **kw)
    m_f = np.asarray(res_fused.samples["w"]).mean((0, 1))
    m_p = np.asarray(res_plain.samples["w"]).mean((0, 1))
    np.testing.assert_allclose(m_f, m_p, atol=0.25)
    assert float(res_fused.diagnostics["num_divergences"]) == 0


def test_bf16_references_match_f32(key):
    """bf16-multiply/f32-accumulate references (the MXU-native potential
    mode, BASELINE.md roofline) agree with the f32 formulas to bf16
    rounding on values AND gradients."""
    from brancher_tpu.ops.pallas_glm import (
        bernoulli_vg_reference_bf16, normal_vg_reference_bf16,
    )

    n, d, c = 700, 16, 32
    ks = jax.random.split(key, 5)
    x = _rand(ks[0], n, d) / np.sqrt(d)
    y = (jax.random.uniform(ks[1], (n,)) < 0.5).astype(jnp.float32)
    b = 0.1 * _rand(ks[2], n)
    z = 0.5 * _rand(ks[3], c, d)
    m, iv = jnp.zeros(d), jnp.ones(d)
    x16 = x.astype(jnp.bfloat16)

    v32, g32 = bernoulli_vg_reference(z, x, y, b, m, iv)
    vb, gb = bernoulli_vg_reference_bf16(z, x16, y, b, m, iv)
    assert float(jnp.max(jnp.abs(vb - v32) / (jnp.abs(v32) + 1.0))) < 2e-2
    assert float(jnp.max(jnp.abs(gb - g32) / (jnp.max(jnp.abs(g32)) + 1.0))) < 2e-2

    u = jnp.zeros(d).at[-1].set(1.0)
    yc = _rand(ks[4], n)
    v32, g32 = normal_vg_reference(z, x, yc, b, u, -0.5, m, iv)
    vb, gb = normal_vg_reference_bf16(z, x16, yc, b, u, -0.5, m, iv)
    assert float(jnp.max(jnp.abs(vb - v32) / (jnp.abs(v32) + 1.0))) < 2e-2
    assert float(jnp.max(jnp.abs(gb - g32) / (jnp.max(jnp.abs(g32)) + 1.0))) < 2e-2


def test_sample_fused_potential_bf16_matches_f32_posterior(key):
    """sample(fused_potential='bf16') runs the bf16 fused path end to end
    and lands on the same logreg posterior as the f32 default."""
    from brancher_tpu import ProbabilisticModel
    from brancher_tpu.inference import sample, NUTS
    from brancher_tpu.models.logistic_regression import (
        logistic_regression_model, make_logreg_data,
    )

    x, y, _ = make_logreg_data(num_points=150, dim=4, seed=0)
    kw = dict(kernel=NUTS(), num_samples=300, num_warmup=300, num_chains=4)
    m1 = logistic_regression_model(x, y)
    res32 = sample(m1, key=key, **kw)
    m2 = logistic_regression_model(x, y)
    comp2 = m2.compiled()
    res16 = sample(m2, key=key, fused_potential="bf16", **kw)
    # the bf16 closure was actually built and used
    assert hasattr(comp2, "_fused_vg_built_bf16")
    for name in res32.samples:
        mu32 = np.asarray(res32.samples[name]).mean(axis=(0, 1))
        mu16 = np.asarray(res16.samples[name]).mean(axis=(0, 1))
        sd32 = np.asarray(res32.samples[name]).std()
        np.testing.assert_allclose(mu16, mu32, atol=0.35 * sd32 + 0.02)
