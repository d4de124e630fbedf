"""DAG -> pure-JAX closure compiler.

No direct reference counterpart: Brancher interprets its graph with
recursive Python traversal on every ``get_sample`` /
``calculate_log_probability`` call (SURVEY.md §3.2–3.3 "hot loop").  The
TPU rebuild's central architectural change (BASELINE.json: "graph tracer →
JAX closure compiler") is this module: the DAG is walked ONCE at trace
time, producing pure functions that XLA compiles and fuses:

  * ``sample(params, key, n, given)``     — ancestral sampling, vmapped
  * ``log_prob(params, values)``          — log-joint per sample, vmapped
  * ``log_density_z(params, z, given)``   — log-joint + Jacobian in
                                            unconstrained space (the kernel
                                            under HMC/NUTS/SVI autoguides)
  * ``constrain/unconstrain``             — support bijections per latent

All per-sample functions are scalar-sample; the sample/chain/particle axis
is always added with ``jax.vmap`` and sharded with ``NamedSharding`` by the
engines, never hand-broadcast (SURVEY.md §7 build plan step 1).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import transform_for
from .utilities import sum_all
from .variables import (
    DeterministicVariable,
    ParamStore,
    PartialLink,
    ProbabilisticModel,
    RandomVariable,
    Variable,
    full_deps as _full_deps,
)

Array = jax.Array


def _toposort(roots: Sequence[Variable]) -> List[Variable]:
    order: List[Variable] = []
    state: Dict[int, int] = {}

    def visit(v: Variable):
        s = state.get(id(v))
        if s == 1:
            return
        if s == 0:
            raise ValueError(f"cycle detected through variable {v.name!r}")
        state[id(v)] = 0
        for p in _full_deps(v):
            visit(p)
        state[id(v)] = 1
        order.append(v)

    for r in roots:
        visit(r)
    return order


def _min_fill_order(names: List[str], scopes: List[Tuple[str, ...]]) -> List[str]:
    """Min-fill elimination ordering over the factor interaction graph
    (greedy: eliminate the variable whose neighbors need fewest new
    edges).  Optimal on trees/chains; near-optimal induced width on the
    small interaction graphs discrete models produce."""
    import itertools

    adj: Dict[str, set] = {n: set() for n in names}
    for sc in scopes:
        for a, b in itertools.combinations(sc, 2):
            adj[a].add(b)
            adj[b].add(a)
    remaining = set(names)
    order: List[str] = []
    while remaining:
        best, best_fill = None, None
        for n in names:
            if n not in remaining:
                continue
            nb = adj[n] & remaining
            fill = sum(
                1
                for a, b in itertools.combinations(sorted(nb), 2)
                if b not in adj[a]
            )
            if best_fill is None or fill < best_fill:
                best, best_fill = n, fill
        nb = adj[best] & remaining
        for a, b in itertools.combinations(nb, 2):
            adj[a].add(b)
            adj[b].add(a)
        remaining.discard(best)
        order.append(best)
    return order


def _broadcast_table(names: Tuple[str, ...], table: Array, union: List[str]) -> Array:
    """Reshape a log-table so its axes align with ``union``'s order
    (size-1 axes for variables outside its scope)."""
    pos = [union.index(n) for n in names]
    perm = sorted(range(len(names)), key=lambda i: pos[i])
    t = jnp.transpose(table, perm)
    sorted_pos = sorted(pos)
    shape = []
    j = 0
    for i in range(len(union)):
        if j < len(sorted_pos) and sorted_pos[j] == i:
            shape.append(t.shape[j])
            j += 1
        else:
            shape.append(1)
    return t.reshape(shape)


def _eliminate_tables(tables: List[Tuple[Tuple[str, ...], Array]], order: List[str]) -> Array:
    """Sum-product variable elimination in the log domain: returns
    log sum over all joint assignments of exp(sum of table entries)."""
    lse = jax.scipy.special.logsumexp
    tabs = list(tables)
    const = jnp.zeros(())
    for d in order:
        group = [t for t in tabs if d in t[0]]
        tabs = [t for t in tabs if d not in t[0]]
        if not group:
            continue
        union: List[str] = []
        for names, _ in group:
            for n in names:
                if n not in union:
                    union.append(n)
        big = None
        for names, table in group:
            bt = _broadcast_table(names, table, union)
            big = bt if big is None else big + bt
        summed = lse(big, axis=union.index(d))
        rest = tuple(n for n in union if n != d)
        if rest:
            tabs.append((rest, summed))
        else:
            const = const + summed
    return const


class CompiledModel:
    """Frozen lowering of a ProbabilisticModel into pure JAX closures."""

    def __init__(self, model: ProbabilisticModel):
        self.model = model
        self.order: List[Variable] = _toposort(model.output_variables)
        self.names: List[str] = [v.name for v in self.order]

        self.latent_names: List[str] = [
            v.name
            for v in self.order
            if isinstance(v, RandomVariable) and not v.is_observed
        ]
        self.continuous_latent_names: List[str] = [
            v.name
            for v in self.order
            if isinstance(v, RandomVariable)
            and not v.is_observed
            and not v.distribution.is_discrete
        ]
        self.discrete_latent_names: List[str] = [
            n for n in self.latent_names if n not in self.continuous_latent_names
        ]
        self.observed_names: List[str] = [
            v.name for v in self.order if isinstance(v, RandomVariable) and v.is_observed
        ]

        # ---- shape-probe pass: initializes lazy params, records shapes ----
        store = ParamStore({}, rng=jax.random.PRNGKey(0), frozen=False)
        probe_vals, _ = self._walk_sample(store, jax.random.PRNGKey(0), {})
        self.initial_params: Dict[str, Any] = store.params
        self.shapes: Dict[str, Tuple[int, ...]] = {
            k: jnp.shape(v) for k, v in probe_vals.items()
        }
        self.dtypes: Dict[str, Any] = {k: jnp.asarray(v).dtype for k, v in probe_vals.items()}

        # unconstrained template for continuous latents
        self.z_shapes: Dict[str, Tuple[int, ...]] = {}
        for v in self.order:
            if v.name in self.continuous_latent_names:
                tr = transform_for(v.distribution, self._probe_params(v, probe_vals, store))
                self.z_shapes[v.name] = tuple(
                    tr.unconstrained_shape(self.shapes[v.name])
                )

        # jitted entry points (recompile per given-structure; cached by jax)
        self._sample_vmapped = jax.jit(
            self._sample_batch, static_argnames=("n", "mapped_names")
        )
        self._log_prob_vmapped = jax.jit(self._log_prob_batch)

    # ------------------------------------------------------------------
    def _probe_params(self, v: RandomVariable, values, store) -> Dict[str, Array]:
        try:
            return v.eval_params(values, store)
        except Exception:
            return {}

    @staticmethod
    def _as_store(params) -> ParamStore:
        if isinstance(params, ParamStore):
            return params
        return ParamStore(params, frozen=True)

    # ------------------------------------------------------------------
    # The unified single-sample graph walks.  Python loops here unroll at
    # trace time into a flat XLA graph (the DAG is frozen; SURVEY.md §3.2).
    # ------------------------------------------------------------------
    def _expand_plate(self, v: RandomVariable, params: Dict[str, Array]) -> Dict[str, Array]:
        if not v.plate_shape:
            return params
        dist = v.distribution
        plate = tuple(v.plate_shape)
        if dist.event_ndim == 0:
            shape = jnp.broadcast_shapes(*(jnp.shape(p) for p in params.values())) if params else ()
            target = plate + tuple(shape)
            return {k: jnp.broadcast_to(p, target) for k, p in params.items()}
        # event-valued distributions (MVN, Dirichlet, Concrete, ...): each
        # parameter keeps its own event suffix; batch prefixes broadcast
        # to a common shape, then everything tiles across the plate
        evr = dict(getattr(dist, "param_event_ndims", {}) or {})
        batch_shapes = []
        for k, p in params.items():
            r = evr.get(k, dist.event_ndim)
            sp = jnp.shape(p)
            batch_shapes.append(sp[: len(sp) - r] if r else sp)
        common = jnp.broadcast_shapes(*batch_shapes) if batch_shapes else ()
        out = {}
        for k, p in params.items():
            r = evr.get(k, dist.event_ndim)
            sp = jnp.shape(p)
            ev = sp[len(sp) - r:] if r else ()
            out[k] = jnp.broadcast_to(p, plate + tuple(common) + tuple(ev))
        return out

    def _rv_log_prob(self, v: RandomVariable, value, dist_params) -> Array:
        mask = getattr(v, "log_prob_mask", None)
        if mask is not None:
            # element-wise masked likelihood (missing-data support:
            # stochastic_processes.observe_timeseries)
            lp = jnp.sum(v.distribution.log_prob(value, **dist_params) * mask)
        else:
            lp = sum_all(v.distribution.log_prob(value, **dist_params))
        if v.log_prob_scale != 1.0:
            lp = v.log_prob_scale * lp
        return lp

    def _observed_value(self, v: Variable, values: Dict[str, Array], store: ParamStore):
        obs = v._observed
        if isinstance(obs, PartialLink):
            return obs.fn(values, store)
        return obs

    def _walk_sample(
        self, store: ParamStore, key: Array, given: Dict[str, Array]
    ) -> Tuple[Dict[str, Array], Array]:
        """Ancestral sampling walk; returns (values, log_joint-of-sampled)."""
        values: Dict[str, Array] = {}
        logp = jnp.zeros(())
        for i, v in enumerate(self.order):
            if v.name in given:
                values[v.name] = given[v.name]
                if isinstance(v, RandomVariable):
                    p = self._expand_plate(v, v.eval_params(values, store))
                    logp = logp + self._rv_log_prob(v, values[v.name], p)
                continue
            if isinstance(v, DeterministicVariable):
                values[v.name] = v.compute(values, store)
                continue
            assert isinstance(v, RandomVariable)
            p = self._expand_plate(v, v.eval_params(values, store))
            k = jax.random.fold_in(key, i)
            if hasattr(v.distribution, "sample_and_log_prob"):
                # fused path (flow-transformed variables: density is
                # accumulated along the sampling direction)
                value, lp = v.distribution.sample_and_log_prob(k, **p)
                lp = v.log_prob_scale * lp if v.log_prob_scale != 1.0 else lp
            else:
                value = v.distribution.sample(k, **p)
                lp = self._rv_log_prob(v, value, p)
            values[v.name] = value
            logp = logp + lp
        return values, logp

    def _walk_log_prob(self, store: ParamStore, values_in: Dict[str, Array]) -> Array:
        """Log-joint of provided latent (+ optionally observed) values."""
        values: Dict[str, Array] = {}
        logp = jnp.zeros(())
        for v in self.order:
            if isinstance(v, DeterministicVariable):
                values[v.name] = (
                    values_in[v.name] if v.name in values_in else v.compute(values, store)
                )
                continue
            assert isinstance(v, RandomVariable)
            p = self._expand_plate(v, v.eval_params(values, store))
            if v.name in values_in:
                value = values_in[v.name]
            elif v.is_observed:
                value = self._observed_value(v, values, store)
            else:
                raise ValueError(
                    f"latent variable {v.name!r} missing from sample dict"
                )
            values[v.name] = value
            logp = logp + self._rv_log_prob(v, value, p)
        return logp

    def _walk_z(
        self, store: ParamStore, z: Dict[str, Array], given: Dict[str, Array]
    ) -> Tuple[Dict[str, Array], Array]:
        """Unconstrained-space walk: z -> values, log p(x) + log|J|.

        This is THE kernel under NUTS/HMC/SVI (BASELINE.json: "vectorized
        log-joint").  Transform parameters (e.g. Uniform bounds) may depend
        on parent values; topological order guarantees availability.
        """
        values: Dict[str, Array] = {}
        logp = jnp.zeros(())
        for v in self.order:
            if isinstance(v, DeterministicVariable):
                values[v.name] = v.compute(values, store)
                continue
            assert isinstance(v, RandomVariable)
            p = self._expand_plate(v, v.eval_params(values, store))
            if v.name in given:
                value = given[v.name]
                values[v.name] = value
                logp = logp + self._rv_log_prob(v, value, p)
                continue
            if v.is_observed:
                value = self._observed_value(v, values, store)
                values[v.name] = value
                logp = logp + self._rv_log_prob(v, value, p)
                continue
            if v.distribution.is_discrete:
                raise ValueError(
                    f"discrete latent {v.name!r} must be provided via `given` "
                    "for unconstrained-space log density"
                )
            tr = transform_for(v.distribution, p)
            x = tr.forward(z[v.name])
            ld = sum_all(tr.forward_log_det(z[v.name]))
            values[v.name] = x
            logp = logp + self._rv_log_prob(v, x, p) + ld
        return values, logp

    def _walk_mean(self, store: ParamStore, given: Dict[str, Array]) -> Dict[str, Array]:
        """Deterministic walk substituting each RV by its mean (delta /
        first-order-Taylor evaluation; used by Taylor1Estimator)."""
        values: Dict[str, Array] = {}
        for v in self.order:
            if v.name in given:
                values[v.name] = given[v.name]
                continue
            if isinstance(v, DeterministicVariable):
                values[v.name] = v.compute(values, store)
                continue
            assert isinstance(v, RandomVariable)
            p = self._expand_plate(v, v.eval_params(values, store))
            values[v.name] = v.distribution.mean(**p)
        return values

    # ------------------------------------------------------------------
    # Public per-sample API
    # ------------------------------------------------------------------
    def mean_one(self, params, key: Array = None, given: Optional[Dict[str, Array]] = None):
        return self._walk_mean(self._as_store(params), given or {})

    def sample_one(self, params, key: Array, given: Optional[Dict[str, Array]] = None):
        """One ancestral draw: {name: value} for every variable, with
        ``given`` entries clamped (pure function of params/key)."""
        values, _ = self._walk_sample(self._as_store(params), key, given or {})
        return values

    def log_prob_one(self, params, values: Dict[str, Array]) -> Array:
        """Joint log-density of ONE full assignment in constrained space
        (deterministic nodes recomputed when absent from ``values``)."""
        return self._walk_log_prob(self._as_store(params), values)

    def log_likelihood_one(self, params, values: Dict[str, Array]) -> Array:
        """Sum of OBSERVED variables' log-probs only (vs the full joint)."""
        store = self._as_store(params)
        walk_values: Dict[str, Array] = {}
        lp = jnp.zeros(())
        for v in self.order:
            if isinstance(v, DeterministicVariable):
                walk_values[v.name] = (
                    values[v.name] if v.name in values else v.compute(walk_values, store)
                )
                continue
            assert isinstance(v, RandomVariable)
            p = self._expand_plate(v, v.eval_params(walk_values, store))
            if v.is_observed and v.name not in values:
                value = self._observed_value(v, walk_values, store)
                walk_values[v.name] = value
                lp = lp + self._rv_log_prob(v, value, p)
            elif v.name in values:
                walk_values[v.name] = values[v.name]
                if v.is_observed:
                    lp = lp + self._rv_log_prob(v, values[v.name], p)
            else:
                raise ValueError(f"latent {v.name!r} missing from values")
        return lp

    def pointwise_log_likelihood(
        self, params, values: Dict[str, Array],
        given: Optional[Dict[str, Array]] = None,
    ) -> Dict[str, Array]:
        """Element-wise log-likelihood of each OBSERVED variable at the
        (constrained) latent ``values`` — the per-datapoint matrix that
        WAIC / PSIS-LOO need (model_comparison.py).  log_prob_scale and
        missing-data masks multiply element-wise (masked points report
        0; exclude them downstream)."""
        store = self._as_store(params)
        given = given or {}
        walk_values: Dict[str, Array] = dict(given)
        out: Dict[str, Array] = {}
        for v in self.order:
            if v.name in given:
                continue
            if isinstance(v, DeterministicVariable):
                walk_values[v.name] = v.compute(walk_values, store)
                continue
            assert isinstance(v, RandomVariable)
            p = self._expand_plate(v, v.eval_params(walk_values, store))
            if v.is_observed and v.name not in values:
                value = self._observed_value(v, walk_values, store)
                walk_values[v.name] = value
                lp = v.distribution.log_prob(value, **p)
                mask = getattr(v, "log_prob_mask", None)
                if mask is not None:
                    lp = lp * mask
                if v.log_prob_scale != 1.0:
                    lp = v.log_prob_scale * lp
                out[v.name] = lp
            elif v.name in values:
                walk_values[v.name] = values[v.name]
            else:
                raise ValueError(f"latent {v.name!r} missing from values")
        return out

    def log_density_z(self, params, z: Dict[str, Array], given: Optional[Dict[str, Array]] = None) -> Array:
        """Joint log-density at UNCONSTRAINED latents ``z`` including the
        support-transform Jacobians — the target MCMC/SVI differentiate."""
        _, logp = self._walk_z(self._as_store(params), z, given or {})
        return logp

    def log_density_z_parts(
        self, params, z: Dict[str, Array], given: Optional[Dict[str, Array]] = None
    ) -> Tuple[Array, Array]:
        """(log prior incl. Jacobian, log likelihood) in unconstrained space.

        The split powers tempered SMC: target_beta = prior * lik^beta.
        """
        store = self._as_store(params)
        given = given or {}
        values: Dict[str, Array] = {}
        lp_prior = jnp.zeros(())
        lp_lik = jnp.zeros(())
        for v in self.order:
            if isinstance(v, DeterministicVariable):
                values[v.name] = v.compute(values, store)
                continue
            assert isinstance(v, RandomVariable)
            p = self._expand_plate(v, v.eval_params(values, store))
            if v.name in given:
                values[v.name] = given[v.name]
                lp_prior = lp_prior + self._rv_log_prob(v, given[v.name], p)
                continue
            if v.is_observed:
                value = self._observed_value(v, values, store)
                values[v.name] = value
                lp_lik = lp_lik + self._rv_log_prob(v, value, p)
                continue
            if v.distribution.is_discrete:
                raise ValueError(
                    f"discrete latent {v.name!r} must be provided via `given`"
                )
            from .transforms import transform_for

            tr = transform_for(v.distribution, p)
            x = tr.forward(z[v.name])
            ld = sum_all(tr.forward_log_det(z[v.name]))
            values[v.name] = x
            lp_prior = lp_prior + self._rv_log_prob(v, x, p) + ld
        return lp_prior, lp_lik

    def eval_observed_params(
        self, params, z: Dict[str, Array], given: Optional[Dict[str, Array]] = None
    ) -> Dict[str, Dict[str, Array]]:
        """Distribution parameters of each OBSERVED RV evaluated at latent z
        (unconstrained).  Powers the fused-potential pattern recognizer
        (ops/pallas_glm.py), which probes these as functions of z."""
        store = self._as_store(params)
        given = given or {}
        values: Dict[str, Array] = {}
        out: Dict[str, Dict[str, Array]] = {}
        for v in self.order:
            if isinstance(v, DeterministicVariable):
                values[v.name] = v.compute(values, store)
                continue
            assert isinstance(v, RandomVariable)
            p = self._expand_plate(v, v.eval_params(values, store))
            if v.name in given:
                values[v.name] = given[v.name]
                continue
            if v.is_observed:
                values[v.name] = self._observed_value(v, values, store)
                out[v.name] = p
                continue
            if v.distribution.is_discrete:
                raise ValueError(f"discrete latent {v.name!r} must be given")
            tr = transform_for(v.distribution, p)
            values[v.name] = tr.forward(z[v.name])
        return out

    # ------------------------------------------------------------------
    # Discrete-latent enumeration (VERDICT r1 #6 / ROADMAP r1 #6)
    # ------------------------------------------------------------------
    def discrete_enum_info(self, params, given=None):
        """[(name, shape, cardinality)] for every enumerable discrete
        latent (Bernoulli K=2; Categorical K = trailing class-axis size)."""
        from .distributions import Bernoulli, Categorical

        given = given or {}
        store = self._as_store(params)
        values, _ = self._walk_sample(store, jax.random.PRNGKey(0), given)
        info = []
        for v in self.order:
            if v.name not in self.discrete_latent_names or v.name in given:
                continue
            p = self._expand_plate(v, v.eval_params(values, store))
            if isinstance(v.distribution, Bernoulli):
                k = 2
            elif isinstance(v.distribution, Categorical):
                lg = p.get("logits", p.get("probs"))
                k = int(jnp.shape(lg)[-1])
            else:
                raise ValueError(
                    f"discrete latent {v.name!r} ({type(v.distribution).__name__}) "
                    "is not enumerable (Bernoulli/Categorical only)"
                )
            info.append((v.name, tuple(self.shapes[v.name]), k))
        return info

    def enumerated_log_density(
        self, params, z: Dict[str, Array], given: Optional[Dict[str, Array]] = None,
        return_responsibilities: bool = False,
    ):
        """log p(z, data) with ALL discrete latents summed out.

        Exploits element-wise factorization: writing
        ``logp(z, d) = C(z) + sum_(i,e) f_ie(d[i][e], z)`` over discrete
        latents i and their elements e (verified numerically by
        ``check_enum_factorization`` — call it once before trusting this
        in a new model), the marginal is
        ``C + sum_(i,e) logsumexp_k (lp_ie(k) - base)`` from one vmapped
        batch of full-density evaluations (sum of cardinalities, not
        their product).  With ``return_responsibilities`` also returns
        ``{name: [*, K] posterior probs}`` per element.
        """
        given = dict(given or {})
        info = self.discrete_enum_info(params, given)
        ref = {n: jnp.zeros(s, jnp.int32) for n, s, _ in info}

        def lp_with(assign):
            return self.log_density_z(params, z, {**given, **ref, **assign})

        base = lp_with({})
        total = base
        resp = {}
        for name, shape, k in info:
            n_elem = int(np.prod(shape)) if shape else 1
            flat_ref = ref[name].ravel()

            def one(e, kv, _name=name, _shape=shape, _flat=flat_ref):
                d = _flat.at[e].set(kv).reshape(_shape)
                return lp_with({_name: d})

            ee = jnp.repeat(jnp.arange(n_elem), k)
            kk = jnp.tile(jnp.arange(k), n_elem)
            lps = jax.vmap(one)(ee, kk).reshape(n_elem, k)  # [E, K]
            rel = lps - base
            total = total + jnp.sum(jax.scipy.special.logsumexp(rel, axis=1))
            if return_responsibilities:
                resp[name] = jax.nn.softmax(rel, axis=1).reshape(shape + (k,))
        if return_responsibilities:
            return total, resp
        return total

    def check_enum_factorization(self, params, given=None, atol=1e-3) -> bool:
        """Numerically verify the element-wise additivity the enumeration
        relies on: logp at a random joint assignment must equal the sum of
        single-element deviations from the all-zeros reference.  False for
        models with discrete-discrete interactions.

        Two round-3 upgrades (VERDICT r2 weak #6): the verdict is CACHED
        per conditioning-key set when params is initial_params (sample()
        must not re-probe per call), and a structural pre-filter skips
        the numeric probe entirely when the DAG shows a cross-latent
        interaction (any term touching >=2 discrete latents)."""
        given = dict(given or {})
        gk = frozenset(given.keys())
        cacheable = params is self.initial_params
        cache = getattr(self, "_enum_verdict_cache", None)
        if cache is None:
            cache = {}
            self._enum_verdict_cache = cache
        if cacheable and gk in cache:
            return cache[gk]
        verdict = self._check_enum_factorization_impl(params, given, atol)
        if cacheable:
            cache[gk] = verdict
        return verdict

    def _check_enum_factorization_impl(self, params, given, atol) -> bool:
        info = self.discrete_enum_info(params, given)
        if not info:
            return True
        struct = self._discrete_structure(frozenset(given.keys()))
        if any(len(deps) > 1 for _v, deps in struct["terms"]):
            return False  # structural cross-latent interaction
        rng = np.random.RandomState(0)
        z = {kname: jnp.asarray(rng.normal(0, 0.7, s).astype(np.float32))
             for kname, s in self.z_shapes.items()}
        ref = {n: jnp.zeros(s, jnp.int32) for n, s, _ in info}

        def lp_with(assign):
            return self.log_density_z(params, z, {**given, **ref, **assign})

        base = float(lp_with({}))
        # all-max probe first: saturating cross-element terms (e.g. a
        # product over a plate) deviate from additivity only at dense
        # assignments, which a single random draw can miss
        probes = [
            {n: jnp.full(s, k - 1, jnp.int32) for n, s, k in info}
        ] + [
            {n: jnp.asarray(rng.randint(0, k, s if s else ()), jnp.int32)
             for n, s, k in info}
            for _ in range(2)
        ]
        for d_star in probes:
            joint = float(lp_with(d_star))
            total = 0.0
            for name, shape, k in info:
                n_elem = int(np.prod(shape)) if shape else 1
                flat_star = d_star[name].ravel()
                flat_ref = ref[name].ravel()
                for e in range(n_elem):
                    d = flat_ref.at[e].set(flat_star[e]).reshape(shape)
                    total += float(lp_with({name: d})) - base
            if abs((joint - base) - total) > atol * max(1.0, abs(joint)):
                return False
        return True

    # ------------------------------------------------------------------
    # Structural discrete-factor extraction (VERDICT r2 #4 / ROADMAP #5).
    #
    # A static graph walk decomposes log p(z, d, data) into one LOCAL
    # term per RandomVariable and reads each term's discrete support off
    # the DAG: dependence flows from an enumerable discrete latent
    # through deterministic nodes (and through Interval-transformed
    # continuous latents, whose VALUES follow their bound parameters)
    # and is cut at every other random variable, whose value is fixed by
    # z / data / the conditioning set.  Structural deps are a SUPERSET
    # of true deps, so any decomposition derived from them is exact by
    # construction — no numeric probing needed.  Cost: evaluating a
    # term's factor table costs K^|deps| evaluations of that term's
    # local sub-walk (O(1) nodes), not full-density walks (O(T)).
    # ------------------------------------------------------------------
    def _discrete_structure(self, given_keys=frozenset()):
        """Cached static analysis per conditioning-key set.  Returns a
        dict with:

        * ``value_deps[name]`` — frozenset of enumerable discrete latents
          the node's VALUE depends on;
        * ``terms`` — ``[(RandomVariable, frozenset deps)]``, one
          log-prob term per RV in topological order (deps = discrete
          latents the term's value changes with);
        * ``recompute[name]`` — topologically ordered nodes to
          re-evaluate when that RV's term is computed under a
          non-reference assignment of its deps.
        """
        given_keys = frozenset(given_keys)
        cache = getattr(self, "_disc_struct_cache", None)
        if cache is None:
            cache = {}
            self._disc_struct_cache = cache
        hit = cache.get(given_keys)
        if hit is not None:
            return hit

        from .distributions import INTERVAL

        disc = {n for n in self.discrete_latent_names if n not in given_keys}
        empty: frozenset = frozenset()
        value_deps: Dict[str, frozenset] = {}
        terms: List[Tuple[RandomVariable, frozenset]] = []
        for v in self.order:
            param_deps = empty
            for pvar in v.parents:
                param_deps = param_deps | value_deps.get(pvar.name, empty)
            obs = getattr(v, "_observed", None)
            obs_deps = empty
            if isinstance(obs, PartialLink):
                for pvar in obs.vars:
                    obs_deps = obs_deps | value_deps.get(pvar.name, empty)
            if isinstance(v, DeterministicVariable):
                value_deps[v.name] = param_deps
                continue
            assert isinstance(v, RandomVariable)
            if v.name in given_keys:
                vdeps = empty
            elif v.is_observed:
                vdeps = obs_deps
            elif v.name in disc:
                vdeps = frozenset({v.name})
            elif (not v.distribution.is_discrete
                  and v.distribution.support == INTERVAL):
                # the unconstraining bijection's bounds follow the
                # params, so tr.forward(z) inherits their discrete deps
                vdeps = param_deps
            else:
                vdeps = empty
            value_deps[v.name] = vdeps
            terms.append((v, param_deps | obs_deps | vdeps))

        recompute: Dict[str, List[Variable]] = {}
        for v, deps in terms:
            if not deps:
                recompute[v.name] = []
                continue
            needed: List[Variable] = []
            seen: set = set()

            def visit(w, _deps=deps, _needed=needed, _seen=seen):
                if id(w) in _seen:
                    return
                _seen.add(id(w))
                if not (value_deps.get(w.name, empty) & _deps):
                    return  # value fixed at the reference walk
                if w.name not in disc:
                    # assigned latents take their value directly; every
                    # other dependent node re-walks its own parents
                    for p2 in _full_deps(w):
                        visit(p2, _deps, _needed, _seen)
                _needed.append(w)

            for p2 in _full_deps(v):
                visit(p2)
            recompute[v.name] = needed

        out = {"value_deps": value_deps, "terms": terms,
               "recompute": recompute}
        cache[given_keys] = out
        return out

    def _enum_cards(self, params, given=None) -> Dict[str, int]:
        """{name: cardinality} of enumerable SCALAR discrete latents
        (raises if any has a non-scalar shape).  Cached per key set when
        params is initial_params."""
        gk = frozenset((given or {}).keys())
        cacheable = params is self.initial_params
        cache = getattr(self, "_enum_cards_cache", None)
        if cache is None:
            cache = {}
            self._enum_cards_cache = cache
        if cacheable and gk in cache:
            return cache[gk]
        info = self.discrete_enum_info(params, given)
        for n, shape, _k in info:
            if tuple(shape) != ():
                raise ValueError(
                    f"structural enumeration needs scalar discrete "
                    f"latents; {n!r} has shape {shape}"
                )
        cards = {n: k for n, _s, k in info}
        if cacheable:
            cache[gk] = cards
        return cards

    def _term_table(self, v, deps, struct, store, base_vals, z, cards):
        """Log-factor table of RV ``v``'s local term over its discrete
        deps (axes ordered by the latents' topological index).  Each
        entry re-walks only ``recompute[v]`` (the nodes between the
        assigned latents and v) — O(1) work, not a full density walk."""
        disc_idx = {n: i for i, n in enumerate(self.discrete_latent_names)}
        names = tuple(sorted(deps, key=lambda n: disc_idx[n]))
        needed = struct["recompute"][v.name]
        vdeps = struct["value_deps"][v.name]

        def term(avec):
            assign = {n: avec[i] for i, n in enumerate(names)}
            vals = dict(base_vals)
            for w in needed:
                if w.name in assign:
                    vals[w.name] = assign[w.name]
                elif isinstance(w, DeterministicVariable):
                    vals[w.name] = w.compute(vals, store)
                elif isinstance(w, RandomVariable) and w.is_observed:
                    vals[w.name] = self._observed_value(w, vals, store)
                else:
                    # Interval-transformed continuous latent: its value
                    # follows the (assignment-dependent) bounds
                    pw = self._expand_plate(w, w.eval_params(vals, store))
                    tr = transform_for(w.distribution, pw)
                    vals[w.name] = tr.forward(z[w.name])
            p = self._expand_plate(v, v.eval_params(vals, store))
            extra = jnp.zeros(())
            if v.name in assign:
                value = assign[v.name]
            elif vdeps & set(names):
                if v.is_observed:
                    value = self._observed_value(v, vals, store)
                else:
                    tr = transform_for(v.distribution, p)
                    value = tr.forward(z[v.name])
                    extra = sum_all(tr.forward_log_det(z[v.name]))
            else:
                value = base_vals[v.name]
            return self._rv_log_prob(v, value, p) + extra

        ks = [cards[n] for n in names]
        grids = jnp.meshgrid(
            *[jnp.arange(k, dtype=jnp.int32) for k in ks], indexing="ij"
        )
        avecs = jnp.stack([g.ravel() for g in grids], axis=1)
        table = jax.vmap(term)(avecs).reshape(ks)
        return names, table

    def _structural_factors(self, params, z, given):
        """(constant, [(names, log-table)]) such that
        log_density_z(z, {**given, **assignment}) =
        constant + sum of table entries at the assignment."""
        given = dict(given or {})
        cards = self._enum_cards(params, given)
        struct = self._discrete_structure(frozenset(given.keys()))
        store = self._as_store(params)
        ref = {n: jnp.zeros((), jnp.int32) for n in cards}
        base_vals, base_lp = self._walk_z(store, z, {**given, **ref})
        const = base_lp
        tables = []
        for v, deps in struct["terms"]:
            if not deps:
                continue
            names, table = self._term_table(
                v, deps, struct, store, base_vals, z, cards
            )
            const = const - table[(0,) * len(names)]
            tables.append((names, table))
        return const, tables

    def factor_enumerated_log_density(
        self, params, z: Dict[str, Array],
        given: Optional[Dict[str, Array]] = None,
    ):
        """log p(z, data) with ALL scalar discrete latents summed out by
        variable elimination (min-fill order) over structurally extracted
        local factors.  Exact for ANY interaction pattern — chains,
        trees, multi-parent colliders, higher-order terms — with cost
        exponential only in the induced width (ROADMAP #6; VERDICT r2
        missing #4: models that fail the chain factorization enumerate
        here)."""
        given = dict(given or {})
        cards = self._enum_cards(params, given)
        if not cards:
            return self.log_density_z(params, z, given)
        const, tables = self._structural_factors(params, z, given)
        order = _min_fill_order(list(cards), [t[0] for t in tables])
        return const + _eliminate_tables(tables, order)

    def _enum_groups(self, given_keys=frozenset()):
        """Connected components of the discrete interaction graph (two
        latents join when some log-prob term touches both), each in
        ``discrete_latent_names`` order.  Cached per key set."""
        gk = frozenset(given_keys)
        cache = getattr(self, "_enum_groups_cache", None)
        if cache is None:
            cache = {}
            self._enum_groups_cache = cache
        hit = cache.get(gk)
        if hit is not None:
            return hit
        disc = [n for n in self.discrete_latent_names if n not in gk]
        parent = {n: n for n in disc}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        struct = self._discrete_structure(gk)
        for _v, deps in struct["terms"]:
            deps = [d for d in deps if d in parent]
            for b in deps[1:]:
                parent[find(deps[0])] = find(b)
        comps: Dict[str, List[str]] = {}
        for n in disc:
            comps.setdefault(find(n), []).append(n)
        groups = tuple(tuple(g) for g in comps.values())
        cache[gk] = groups
        return groups

    @staticmethod
    def _combo_grid(ks) -> Array:
        """[prod(ks), len(ks)] int32 cartesian product (row 0 all-zero)."""
        if not ks:
            return jnp.zeros((1, 0), jnp.int32)
        grids = jnp.meshgrid(
            *[jnp.arange(k, dtype=jnp.int32) for k in ks], indexing="ij"
        )
        return jnp.stack([g.ravel() for g in grids], axis=1)

    @staticmethod
    def _group_layout(grp, shapes, cards):
        """(scalars, plated, s0) split of a group's latents; raises on
        shapes group enumeration cannot handle (several DISTINCT
        non-scalar shapes) and on oversized joint state spaces."""
        scalars = tuple(n for n in grp if tuple(shapes[n]) == ())
        plated = tuple(n for n in grp if tuple(shapes[n]) != ())
        s0 = tuple(shapes[plated[0]]) if plated else ()
        if any(tuple(shapes[n]) != s0 for n in plated[1:]):
            raise ValueError(
                f"interacting discrete latents {grp} have several "
                f"distinct non-scalar shapes; group enumeration handles "
                "scalars plus ONE shared plate shape"
            )
        a = int(np.prod([cards[n] for n in scalars])) if scalars else 1
        m = int(np.prod([cards[n] for n in plated])) if plated else 1
        if a * m > 256:
            raise ValueError(
                f"discrete group {grp} has {a * m} joint states per "
                "element (cap 256); break the interaction or "
                "marginalize by hand"
            )
        return scalars, plated, s0

    def _group_tables_structural(self, grp, scalars, plated, s0, struct,
                                 store, base_vals, z, cards):
        """(rel_scal [A], rel_elem [A, M, E]) relative log-tables of the
        group's terms from STRUCTURALLY extracted local evaluations
        (VERDICT r3 missing #4): scalar-only terms go through
        ``_term_table`` (local recompute walks), plated terms through
        ``_term_vec_fn`` with ALL plate elements set to one combo — a
        single [E]-vector evaluation replaces E separate probes, so the
        cost is A*M local-term evaluations instead of E*A*M FULL-density
        walks.  Raises ValueError when a term's log-prob shape cannot be
        aligned to the plate (caller falls back to the probe path)."""
        e_n = int(np.prod(s0)) if s0 else 1
        a_n = int(np.prod([cards[n] for n in scalars])) if scalars else 1
        m_n = int(np.prod([cards[n] for n in plated])) if plated else 1
        combos_a = self._combo_grid([cards[n] for n in scalars])
        combos_m = self._combo_grid([cards[n] for n in plated])
        grp_set = set(grp)
        rel_scal = jnp.zeros((a_n,))
        rel_elem = jnp.zeros((a_n, m_n, e_n))
        for v2, deps in struct["terms"]:
            d = deps & grp_set
            if not d:
                continue
            if d <= set(scalars):
                names, table = self._term_table(
                    v2, deps, struct, store, base_vals, z, cards
                )
                idx = tuple(
                    combos_a[:, scalars.index(n)] for n in names
                )
                vals_a = table[idx]  # [A]
                rel_scal = rel_scal + (vals_a - table[(0,) * len(names)])
            else:
                fn = self._term_vec_fn(v2, struct, store, base_vals, z, s0)

                def eval_am(av, mv, _fn=fn, _sc=scalars, _pl=plated,
                            _s0=s0):
                    assign = {n: av[j] for j, n in enumerate(_sc)}
                    assign.update({
                        n: jnp.full(_s0, mv[i], jnp.int32)
                        for i, n in enumerate(_pl)
                    })
                    return _fn(assign)

                aa = jnp.repeat(combos_a, m_n, axis=0)  # [A*M, S]
                mm = jnp.tile(combos_m, (a_n, 1))  # [A*M, P]
                vecs = jax.vmap(eval_am)(aa, mm).reshape(a_n, m_n, e_n)
                rel_elem = rel_elem + (vecs - vecs[0, 0][None, None, :])
        return rel_scal, rel_elem

    def group_enumerated_log_density(
        self, params, z: Dict[str, Array],
        given: Optional[Dict[str, Array]] = None,
        return_responsibilities: bool = False,
    ):
        """log p(z, data) with PLATED interacting discrete latents summed
        out per element (ROADMAP r3 #7), now from STRUCTURAL per-element
        factor tables (VERDICT r3 missing #4) with probe-based
        full-density evaluation only as fallback.

        Latents partition into interaction groups (``_enum_groups``); a
        group may mix SCALAR latents with plated ones sharing ONE plate
        shape (mixed plate shapes previously refused).  Writing
        ``logp(z, a, d) = C(z) + T(a, z) + sum_e f_e(a, d_e, z)`` over
        the group's scalar joint assignment a and plate elements e
        (verified numerically by ``check_group_factorization``), the
        marginal is ``C + lse_a [ T(a) + sum_e lse_m f_e(a, m) ]``.
        With ``return_responsibilities`` also returns per-latent
        posterior marginals ``{name: [*, K]}`` (scalar latents: [K])."""
        given = dict(given or {})
        info = self.discrete_enum_info(params, given)
        shapes = {n: s for n, s, _k in info}
        cards = {n: k for n, _s, k in info}
        groups = self._enum_groups(frozenset(given.keys()))
        struct = self._discrete_structure(frozenset(given.keys()))
        store = self._as_store(params)
        ref = {n: jnp.zeros(s, jnp.int32) for n, s, _ in info}
        lse = jax.scipy.special.logsumexp
        base_vals, base_lp = self._walk_z(store, z, {**given, **ref})

        total = base_lp
        resp: Dict[str, Array] = {}
        for grp in groups:
            scalars, plated, s0 = self._group_layout(grp, shapes, cards)
            try:
                rel_scal, rel_elem = self._group_tables_structural(
                    grp, scalars, plated, s0, struct, store, base_vals,
                    z, cards
                )
            except ValueError:
                if scalars:
                    raise  # probe fallback covers shared-shape groups only
                rel_elem = self._group_rel_probe(
                    grp, s0, cards, ref, params, z, given, base_lp
                )[None]  # [1, M, E] — A=1 layout
                rel_scal = jnp.zeros((1,))
            per_elem = lse(rel_elem, axis=1)  # [A, E]
            w_log = rel_scal + jnp.sum(per_elem, axis=-1)  # [A]
            total = total + lse(w_log)
            if return_responsibilities:
                p_a = jax.nn.softmax(w_log)  # [A]
                p_me = jax.nn.softmax(rel_elem, axis=1)  # [A, M, E]
                combos_a = self._combo_grid([cards[n] for n in scalars])
                combos_m = self._combo_grid([cards[n] for n in plated])
                for i, n in enumerate(plated):
                    onehot = jax.nn.one_hot(combos_m[:, i], cards[n])
                    marg = jnp.einsum("a,ame,mk->ek", p_a, p_me, onehot)
                    resp[n] = marg.reshape(s0 + (cards[n],))
                for j, n in enumerate(scalars):
                    onehot = jax.nn.one_hot(combos_a[:, j], cards[n])
                    resp[n] = p_a @ onehot  # [K]
        if return_responsibilities:
            return total, resp
        return total

    def _group_rel_probe(self, grp, s0, cards, ref, params, z, given,
                         base):
        """Probe-based per-element relative table [M, E]: one vmapped
        batch of E*prod(K) FULL-density evaluations (the pre-r4 path;
        kept as fallback for terms whose log-prob shape the structural
        extractor cannot align to the plate)."""
        def lp_with(assign):
            return self.log_density_z(params, z, {**given, **ref, **assign})

        ks = [cards[n] for n in grp]
        m = int(np.prod(ks))
        n_elem = int(np.prod(s0)) if s0 else 1
        combos = self._combo_grid(ks)

        def one(e, combo, _grp=grp):
            assign = {
                n: ref[n].ravel().at[e].set(combo[i]).reshape(s0)
                for i, n in enumerate(_grp)
            }
            return lp_with(assign)

        ee = jnp.repeat(jnp.arange(n_elem), m)
        cc = jnp.tile(combos, (n_elem, 1))
        lps = jax.vmap(one)(ee, cc).reshape(n_elem, m)  # [E, M]
        return (lps - base).T  # [M, E]

    def check_group_factorization(self, params, given=None, atol=1e-3) -> bool:
        """True when every discrete interaction group's joint term is
        additive across plate ELEMENTS (the decomposition
        ``group_enumerated_log_density`` relies on).  Structural
        pre-filters reject mixed plate shapes and oversized groups; the
        numeric probe then checks that logp at a random joint assignment
        equals the sum of per-group-per-element deviations (a term
        coupling DIFFERENT elements — e.g. through a matmul — fails
        here).  Verdict cached per conditioning-key set."""
        given = dict(given or {})
        gk = frozenset(given.keys())
        cacheable = params is self.initial_params
        cache = getattr(self, "_group_verdict_cache", None)
        if cache is None:
            cache = {}
            self._group_verdict_cache = cache
        if cacheable and gk in cache:
            return cache[gk]
        verdict = self._check_group_factorization_impl(params, given, atol)
        if cacheable:
            cache[gk] = verdict
        return verdict

    def _check_group_factorization_impl(self, params, given, atol) -> bool:
        info = self.discrete_enum_info(params, given)
        if not info:
            return True
        shapes = {n: s for n, s, _k in info}
        cards = {n: k for n, _s, k in info}
        groups = self._enum_groups(frozenset(given.keys()))
        layouts = {}
        try:
            for grp in groups:
                layouts[grp] = self._group_layout(grp, shapes, cards)
        except ValueError:
            return False
        rng = np.random.RandomState(0)
        ref = {n: jnp.zeros(s, jnp.int32) for n, s, _ in info}
        # probe at SEVERAL independent z draws (ADVICE r3 #4: a coupling
        # whose additivity defect happens to cancel at one z would be
        # mis-dispatched — mirror check_chain_factorization's
        # fresh-z-per-trial structure), each with several assignments led
        # by the all-max one: saturating cross-element terms (e.g. a
        # product over the plate) deviate from additivity ONLY at dense
        # assignments, which a single random draw can easily miss
        for _zdraw in range(2):
            z = {kname: jnp.asarray(rng.normal(0, 0.7, s).astype(np.float32))
                 for kname, s in self.z_shapes.items()}

            def lp_with(assign, _z=z):
                return self.log_density_z(
                    params, _z, {**given, **ref, **assign}
                )

            base = float(lp_with({}))
            probes = [
                {n: jnp.full(s, k - 1, jnp.int32) for n, s, k in info}
            ] + [
                {n: jnp.asarray(rng.randint(0, k, s if s else ()), jnp.int32)
                 for n, s, k in info}
                for _ in range(2)
            ]
            for d_star in probes:
                # additivity is across PLATE ELEMENTS at a FIXED joint
                # scalar assignment (mixed groups: the scalar part is
                # enumerated jointly, so no additivity is assumed over
                # it): lp(a*, m*) - lp(a*, ref_m) must equal the sum of
                # single-element deviations from lp(a*, ref_m)
                joint = float(lp_with(d_star))
                scalar_part = {
                    n: d_star[n]
                    for grp in groups for n in layouts[grp][0]
                }
                base_a = float(lp_with(scalar_part))
                total = 0.0
                for grp in groups:
                    _scalars, plated, s0 = layouts[grp]
                    n_elem = int(np.prod(s0)) if s0 else 1
                    for e in range(n_elem):
                        assign = dict(scalar_part)
                        assign.update({
                            n: ref[n].ravel().at[e].set(
                                d_star[n].ravel()[e]
                            ).reshape(s0)
                            for n in plated
                        })
                        total += float(lp_with(assign)) - base_a
                if abs((joint - base_a) - total) > atol * max(1.0, abs(joint)):
                    return False
        return True

    def enum_log_density_fn(self, params, given=None):
        """Dispatch to the fastest EXACT enumerated density for this
        model's discrete structure (the single entry point mcmc.sample
        and SVI use; the chosen callable is cached per conditioning-key
        set when params is initial_params — VERDICT r2 weak #6 / ADVICE
        r2 #1: repeated sample() calls must not re-probe).

        Order: MarkovSeries sequence nodes (forward algorithm, trace
        O(1) in T — VERDICT r3 #3) → element-wise logsumexp (independent
        latents, incl. vector plates) → forward algorithm on structural
        chain factors → general variable elimination (any scalar-latent
        interaction graph) → numerically verified chain (legacy
        fallback) → per-element group enumeration (plated latents with
        element-wise cross-plate interactions, ROADMAP r3 #7)."""
        given = dict(given or {})
        gk = frozenset(given.keys())
        cacheable = params is self.initial_params
        cache = getattr(self, "_enum_fn_cache", None)
        if cache is None:
            cache = {}
            self._enum_fn_cache = cache
        if cacheable and gk in cache:
            return cache[gk]
        if self._sequence_chain_info(params, given) is not None:
            if not self.check_sequence_factorization(params, given):
                raise ValueError(
                    "MarkovSeries discrete chain does not factorize: "
                    "emission terms must be element-wise across the "
                    "chain's time axis (cross-timestep coupling, e.g. a "
                    "matmul over the series, is not enumerable)"
                )
            fn = self.sequence_enumerated_log_density
        elif self.check_enum_factorization(params, given):
            fn = self.enumerated_log_density
        elif (self.discrete_chain_info(params, given) is not None
              and self.discrete_chain_structure(gk) is not None):
            self._warn_unrolled_enum(gk, chain=True)
            fn = self.chain_enumerated_log_density
        else:
            info = self.discrete_enum_info(params, given)
            if info and all(tuple(s) == () for _n, s, _k in info):
                self._warn_unrolled_enum(gk, chain=False)
                fn = self.factor_enumerated_log_density
            elif self.check_chain_factorization(params, given):
                self._warn_unrolled_enum(gk, chain=True)
                fn = self.chain_enumerated_log_density
            elif self.check_group_factorization(params, given):
                fn = self.group_enumerated_log_density
            else:
                raise ValueError(
                    "discrete latents do not factorize element-wise: "
                    "enumeration supports element-wise independent "
                    "latents, Markov chains, general SCALAR interaction "
                    "graphs (variable elimination), and plated latents "
                    "whose interactions are element-wise across one "
                    "shared plate (group enumeration); cross-element "
                    "coupling (e.g. through a matmul) is not enumerable"
                )
        if cacheable:
            cache[gk] = fn
        return fn

    _UNROLLED_ENUM_WARN_AT = 64

    def _warn_unrolled_enum(self, gk, chain: bool) -> None:
        """One actionable performance warning when an O(T)-trace
        enumeration (per-node tables for T unrolled scalar latents) is
        about to build a large program (VERDICT r4 missing #4).  An
        unrolled T-node DSL chain is inherently O(T) at trace time —
        every node is a distinct graph object with its own links — so
        past the threshold we loudly steer chain-shaped models to the
        ``MarkovSeries`` sequence node, whose forward-algorithm table
        extraction traces O(1) in T (compiler sequence path;
        scripts/exp_enum_sequence.py)."""
        n = len([x for x in self.discrete_latent_names if x not in gk])
        if n <= self._UNROLLED_ENUM_WARN_AT:
            return
        import warnings

        fix = (
            "rewrite the chain with stochastic_processes.MarkovSeries "
            "(or GaussianHMM/EmissionHMM), whose sequence-node "
            "enumeration traces and compiles O(1) in T"
            if chain else
            "if the structure is a repeated (chain-like) pattern, "
            "rewrite it with stochastic_processes.MarkovSeries for "
            "O(1)-in-T compilation"
        )
        warnings.warn(
            f"enumerating {n} unrolled discrete latents builds O(T) "
            f"per-node tables at trace time — compile time grows with "
            f"the chain length; {fix}",
            stacklevel=4,
        )

    # ------------------------------------------------------------------
    # Chain-structured enumeration (ROADMAP r2 #7): interacting discrete
    # latents on a Markov chain (DSL HMMs) are summed out with the
    # forward algorithm instead of the element-wise logsumexp above.
    # ------------------------------------------------------------------
    def discrete_chain_info(self, params, given=None):
        """(names, K) for the chain path: all discrete latents must be
        SCALAR with one shared cardinality, in topological order (each
        one's parameters may depend on the previous state — an HMM).
        Returns None when the model does not fit that shape."""
        info = self.discrete_enum_info(params, given)
        if len(info) < 2:
            return None
        names, ks = [], []
        for name, shape, k in info:
            if tuple(shape) != ():
                return None
            names.append(name)
            ks.append(k)
        if len(set(ks)) != 1:
            return None
        return names, ks[0]

    def discrete_chain_structure(self, given_keys=frozenset()):
        """The discrete-latent name list when the STRUCTURAL factors form
        a pairwise Markov chain (every term touches at most two discrete
        latents, adjacent in topological order); None otherwise.  Exact —
        replaces the 4-point numeric probe as the dispatch criterion
        (ADVICE r2 #2)."""
        gk = frozenset(given_keys)
        disc = [n for n in self.discrete_latent_names if n not in gk]
        if len(disc) < 2:
            return None
        struct = self._discrete_structure(gk)
        idx = {n: i for i, n in enumerate(disc)}
        for _v, deps in struct["terms"]:
            if len(deps) > 2:
                return None
            if len(deps) == 2:
                a, b = sorted(idx[n] for n in deps)
                if b - a != 1:
                    return None
        return disc

    def _chain_tables_structural(self, params, z, given, names, k):
        """(C, U[T,K], Psi[T-1,K,K]) assembled from structurally
        extracted LOCAL factors: O(T·K²) local-term evaluations instead
        of the probe path's T·K + (T−1)·K² FULL-density walks (each
        itself O(T)) — the ROADMAP #5 graph-walk factor extractor.  The
        decomposition is exact by construction."""
        given = dict(given or {})
        cards = {n: k for n in names}
        struct = self._discrete_structure(frozenset(given.keys()))
        idx = {n: i for i, n in enumerate(names)}
        store = self._as_store(params)
        ref = {n: jnp.zeros((), jnp.int32) for n in names}
        base_vals, base_lp = self._walk_z(store, z, {**given, **ref})
        t_n = len(names)
        u_rows: List[list] = [[] for _ in range(t_n)]
        psi_rows: List[list] = [[] for _ in range(max(t_n - 1, 0))]
        const = base_lp
        for v, deps in struct["terms"]:
            if not deps:
                continue
            dn, table = self._term_table(
                v, deps, struct, store, base_vals, z, cards
            )
            const = const - table[(0,) * len(dn)]
            if len(dn) == 1:
                u_rows[idx[dn[0]]].append(table)
            else:
                a, b = dn
                if idx[a] > idx[b]:  # axes follow global topo order
                    table = table.T
                    a, b = b, a
                psi_rows[idx[a]].append(table)
        zero_u = jnp.zeros((k,))
        zero_p = jnp.zeros((k, k))
        u = jnp.stack([sum(r) if r else zero_u for r in u_rows])
        psi = (
            jnp.stack([sum(r) if r else zero_p for r in psi_rows])
            if t_n > 1
            else jnp.zeros((0, k, k))
        )
        return const, u, psi

    def _chain_lp_vec(self, params, z, given, names):
        """lp(d) over a joint assignment vector d:int32[T] of the chain."""

        def lp(d):
            g = dict(given)
            for i, n in enumerate(names):
                g[n] = d[i]
            return self.log_density_z(params, z, g)

        return lp

    def _chain_tables(self, params, z, given, names, k):
        """(base, U[T,K], Psi[T-1,K,K]): reference density, unary
        deviations and pairwise interactions, each from one vmapped batch
        of full-density evaluations (T*K + (T-1)*K^2 + 1 total).

        With the chain factorization logp(d) = C + sum_t phi_t(d_{t-1},
        d_t), second differences over adjacent pairs isolate the
        interaction exactly: Psi[t] = lp(j,k) - lp(j) - lp(k) + base."""
        t_n = len(names)
        lp = self._chain_lp_vec(params, z, given, names)
        zeros = jnp.zeros((t_n,), jnp.int32)
        base = lp(zeros)
        tt = jnp.repeat(jnp.arange(t_n), k)
        kk = jnp.tile(jnp.arange(k), t_n)
        u = jax.vmap(lambda t, c: lp(zeros.at[t].set(c)))(tt, kk)
        u = u.reshape(t_n, k) - base
        t2 = jnp.repeat(jnp.arange(t_n - 1), k * k)
        jj = jnp.tile(jnp.repeat(jnp.arange(k), k), t_n - 1)
        k2 = jnp.tile(jnp.arange(k), (t_n - 1) * k)
        pair = jax.vmap(
            lambda t, j, c: lp(zeros.at[t].set(j).at[t + 1].set(c))
        )(t2, jj, k2).reshape(t_n - 1, k, k) - base
        psi = pair - u[:-1, :, None] - u[1:, None, :]
        return base, u, psi

    def chain_enumerated_log_density(
        self, params, z: Dict[str, Array], given: Optional[Dict[str, Array]] = None,
        return_marginals: bool = False,
    ):
        """log p(z, data) with a CHAIN of interacting discrete latents
        summed out by the forward algorithm (sum-product over the pairwise
        decomposition from ``_chain_tables``; validity is checked by
        ``check_chain_factorization`` — higher-order interactions are not
        representable and must fail that check).

        With ``return_marginals`` also returns ``{name: [K] posterior
        probs}`` per state from a forward-backward smoothing pass.

        Tables come from the structural graph-walk extractor
        (``_chain_tables_structural``, O(T·K²) local evaluations) when
        the factors form a structural chain; the numeric probe path
        (``_chain_tables``, O(T²·K²)) remains as fallback for models
        whose structural deps overstate the true interaction order."""
        given = dict(given or {})
        ci = self.discrete_chain_info(params, given)
        if ci is None:
            raise ValueError(
                "chain enumeration needs >=2 scalar discrete latents with "
                "one shared cardinality"
            )
        names, k = ci
        if self.discrete_chain_structure(frozenset(given.keys())) is not None:
            base, u, psi = self._chain_tables_structural(
                params, z, given, names, k
            )
        else:
            base, u, psi = self._chain_tables(params, z, given, names, k)
        lse = jax.scipy.special.logsumexp

        def fstep(alpha, xs):
            psi_t, u_t = xs
            alpha = lse(alpha[:, None] + psi_t, axis=0) + u_t
            return alpha, alpha

        alpha0 = u[0]
        alpha_last, alphas = jax.lax.scan(fstep, alpha0, (psi, u[1:]))
        total = base + lse(alpha_last)
        if not return_marginals:
            return total

        def bstep(beta, xs):
            psi_t, u_t = xs
            beta = lse(psi_t + (u_t + beta)[None, :], axis=1)
            return beta, beta

        _, betas_rev = jax.lax.scan(
            bstep, jnp.zeros((k,)), (psi[::-1], u[1:][::-1])
        )
        betas = jnp.concatenate([betas_rev[::-1], jnp.zeros((1, k))], axis=0)
        log_alphas = jnp.concatenate([alpha0[None], alphas], axis=0)
        marg = jax.nn.softmax(log_alphas + betas, axis=1)
        return total, {n: marg[i] for i, n in enumerate(names)}

    def check_chain_factorization(
        self, params, given=None, atol=1e-3, trials=8
    ) -> bool:
        """True when the discrete latents' interactions form a pairwise
        Markov chain.  Decided STRUCTURALLY from the DAG when possible
        (exact; ADVICE r2 #2 — the numeric probe cannot miss an
        interaction the graph exposes).  The numeric second-difference
        probe remains as a fallback for models whose structural deps
        overstate the true interaction order, now with a fresh random z
        AND fresh assignments per trial."""
        given = dict(given or {})
        ci = self.discrete_chain_info(params, given)
        if ci is None:
            return False
        if self.discrete_chain_structure(frozenset(given.keys())) is not None:
            return True
        names, k = ci
        t_n = len(names)
        rng = np.random.RandomState(0)
        for _zdraw in range(2):
            z = {
                n: jnp.asarray(rng.normal(0, 0.7, s).astype(np.float32))
                for n, s in self.z_shapes.items()
            }
            base, u, psi = self._chain_tables(params, z, given, names, k)
            base_f, u_f, psi_f = float(base), np.asarray(u), np.asarray(psi)
            lp_probe = self._chain_lp_vec(params, z, given, names)
            for _ in range(max(trials // 2, 1)):
                d = rng.randint(0, k, t_n)
                pred = base_f + u_f[np.arange(t_n), d].sum() + psi_f[
                    np.arange(t_n - 1), d[:-1], d[1:]
                ].sum()
                actual = float(lp_probe(jnp.asarray(d, jnp.int32)))
                if abs(actual - pred) > atol * max(1.0, abs(actual)):
                    return False
        return True

    # ------------------------------------------------------------------
    # Sequence-node enumeration (VERDICT r3 missing #3 / ROADMAP #6).
    #
    # The scalable DSL idiom for long discrete chains is ONE plated
    # MarkovProcess node (stochastic_processes.MarkovSeries with a
    # discrete transition family), not T scalar nodes: an unrolled
    # T-node DSL graph inherently traces O(T) (the base density walk
    # alone is a Python loop over T nodes), so no table-building trick
    # can make ITS compile time T-independent.  For the sequence node,
    # table extraction is O(K^2) vectorized evaluations + one forward
    # `lax.scan` — trace time independent of T, T=10^4+ compiles O(1)
    # (scripts/exp_enum_sequence.py measures it; the marginal matches
    # the unrolled chain path exactly at small T in
    # tests/test_discrete_latents.py).
    # ------------------------------------------------------------------
    def _sequence_chain_info(self, params, given=None):
        """[(name, T, K)] when every un-conditioned discrete latent is a
        MarkovSeries chain with an enumerable (Bernoulli/Categorical)
        transition family; None otherwise.  Cached per key set when
        params is initial_params."""
        from .distributions import Bernoulli, Categorical
        from .stochastic_processes import MarkovSeries

        given = given or {}
        gk = frozenset(given.keys())
        cacheable = params is self.initial_params
        cache = getattr(self, "_seq_info_cache", None)
        if cache is None:
            cache = {}
            self._seq_info_cache = cache
        if cacheable and gk in cache:
            return cache[gk]

        names = [n for n in self.discrete_latent_names if n not in given]
        out = []
        store = self._as_store(params)
        base_vals, _ = None, None
        for n in names:
            v = next(w for w in self.order if w.name == n)
            dist = v.distribution
            if not isinstance(dist, MarkovSeries):
                out = None
                break
            if getattr(v, "log_prob_mask", None) is not None:
                out = None
                break
            td = dist.transition_dist
            if isinstance(td, Bernoulli):
                k = 2
            elif isinstance(td, Categorical):
                if base_vals is None:
                    base_vals, _ = self._walk_sample(
                        store, jax.random.PRNGKey(0), dict(given)
                    )
                p = self._expand_plate(v, v.eval_params(base_vals, store))
                _ip, tp = dist._split_params(p)
                probe = dist.transition_fn(jnp.zeros((), jnp.int32), **tp)
                lg = probe.get("logits", probe.get("probs"))
                k = int(jnp.shape(lg)[-1])
            else:
                out = None
                break
            out.append((n, dist.length, k))
        result = out if out else None
        if cacheable:
            cache[gk] = result
        return result

    def _sequence_chain_tables(self, v, p, t_len, k):
        """(init_lp [K], psi [T-1, K, K]) log-tables of a MarkovSeries
        chain's own prior, each from ONE vectorized evaluation (O(K^2)
        trace cost, independent of T; time-varying transition links
        vectorize over the time axis exactly as MarkovSeries.log_prob
        does).  log_prob_scale is folded in."""
        dist = v.distribution
        init_p, trans_p = dist._split_params(p)
        scale = v.log_prob_scale
        ks = jnp.arange(k, dtype=jnp.int32)
        init_lp = jax.vmap(
            lambda kv: sum_all(dist.init_dist.log_prob(kv, **init_p))
        )(ks)  # [K]
        prev_t = jnp.ones((t_len - 1,), jnp.int32)

        def psi_jk(j, kv, _tp=trans_p, _d=dist, _prev=prev_t):
            pj = _d.transition_fn(_prev * j, **_tp)
            lp = _d.transition_dist.log_prob(_prev * kv, **pj)
            return jnp.broadcast_to(lp, (t_len - 1,))

        jj = jnp.repeat(ks, k)
        kk = jnp.tile(ks, k)
        psi = jax.vmap(psi_jk)(jj, kk)  # [K*K, T-1]
        psi = jnp.moveaxis(psi.reshape(k, k, t_len - 1), 2, 0)  # [T-1,K,K]
        if scale != 1.0:
            init_lp = scale * init_lp
            psi = scale * psi
        return init_lp, psi

    def _elementwise_term_vec(self, v2, chain_name, struct, store,
                              base_vals, z, t_len):
        """Per-element log-prob VECTOR [T] of RV ``v2``'s term as a
        function of the chain value: the per-t columns of the forward
        algorithm's U table (specialization of ``_term_vec_fn`` to one
        chain latent and a flat time axis)."""
        fn = self._term_vec_fn(v2, struct, store, base_vals, z, (t_len,))
        return lambda d_full: fn({chain_name: d_full})

    def _term_vec_fn(self, v2, struct, store, base_vals, z, plate_shape):
        """Per-element log-prob vector of RV ``v2``'s term as a function
        of a {latent_name: full value} assignment dict, mirroring
        ``_term_table.term`` but WITHOUT the plate sum: returns the
        raveled ``[prod(plate_shape)]`` element vector.  Trailing event
        axes beyond the plate are summed; a term whose log-prob shape
        cannot be aligned to the plate raises ValueError (callers fall
        back to probe-based evaluation)."""
        needed = struct["recompute"][v2.name]
        vdeps = struct["value_deps"][v2.name]
        n_elem = int(np.prod(plate_shape)) if plate_shape else 1

        def term_vec(assign):
            vals = dict(base_vals)
            vals.update(assign)
            for w in needed:
                if w.name in assign:
                    continue
                if isinstance(w, DeterministicVariable):
                    vals[w.name] = w.compute(vals, store)
                elif isinstance(w, RandomVariable) and w.is_observed:
                    vals[w.name] = self._observed_value(w, vals, store)
                else:
                    pw = self._expand_plate(w, w.eval_params(vals, store))
                    tr = transform_for(w.distribution, pw)
                    vals[w.name] = tr.forward(z[w.name])
            p = self._expand_plate(v2, v2.eval_params(vals, store))
            jac = None
            if v2.name in assign:
                value = assign[v2.name]
            elif vdeps & set(assign):
                if v2.is_observed:
                    value = self._observed_value(v2, vals, store)
                else:
                    # assignment-dependent support transform: the
                    # z-space density needs the log-Jacobian at THIS
                    # assignment's bounds, exactly as the scalar
                    # _term_table adds it (a round-4 review caught this
                    # path silently dropping it: 0.1-nat marginal error
                    # on interval latents with discrete-dependent
                    # bounds)
                    tr = transform_for(v2.distribution, p)
                    value = tr.forward(z[v2.name])
                    jac = tr.forward_log_det(z[v2.name])
            else:
                value = base_vals[v2.name]
            lp = v2.distribution.log_prob(value, **p)
            mask = getattr(v2, "log_prob_mask", None)
            if mask is not None:
                lp = lp * mask
            if v2.log_prob_scale != 1.0:
                lp = v2.log_prob_scale * lp

            ps = tuple(plate_shape)

            def align(x):
                shp = tuple(jnp.shape(x))
                if shp == ps:
                    return x.reshape(n_elem)
                if shp[: len(ps)] == ps:
                    ax = tuple(range(len(ps), len(shp)))
                    return jnp.sum(x, axis=ax).reshape(n_elem)
                raise ValueError(
                    f"term {v2.name!r} has per-element shape {shp}, not "
                    f"alignable to plate {ps}"
                )

            out = align(lp)
            if jac is not None:
                # unscaled, matching _term_table's `extra` semantics
                out = out + align(jac)
            return out

        return term_vec

    def sequence_enumerated_log_density(
        self, params, z: Dict[str, Array],
        given: Optional[Dict[str, Array]] = None,
        return_marginals: bool = False,
    ):
        """log p(z, data) with MarkovSeries discrete chains summed out by
        the forward algorithm — tables built with O(K^2) VECTORIZED
        evaluations (not O(T) per-step walks), so trace/compile time is
        independent of T.  Emission terms must be element-wise across the
        chain's time axis (verified by ``check_sequence_factorization``).
        With ``return_marginals`` also returns ``{name: [T, K]}``
        forward-backward posterior marginals."""
        given = dict(given or {})
        info = self._sequence_chain_info(params, given)
        if not info:
            raise ValueError(
                "sequence enumeration needs every discrete latent to be "
                "a MarkovSeries chain with a Bernoulli/Categorical "
                "transition family"
            )
        struct = self._discrete_structure(frozenset(given.keys()))
        name_set = {n for n, _t, _k in info}
        for _v, deps in struct["terms"]:
            if len(deps & name_set) > 1:
                raise ValueError(
                    f"term {_v.name!r} couples chains {sorted(deps)}; "
                    "sequence enumeration handles independent chains"
                )
        store = self._as_store(params)
        ref = {n: jnp.zeros((t,), jnp.int32) for n, t, _k in info}
        base_vals, base_lp = self._walk_z(store, z, {**given, **ref})
        lse = jax.scipy.special.logsumexp

        total = base_lp
        marginals: Dict[str, Array] = {}
        for chain_name, t_len, k in info:
            v = next(w for w in self.order if w.name == chain_name)
            dist = v.distribution
            p = self._expand_plate(v, v.eval_params(base_vals, store))
            init_lp, psi = self._sequence_chain_tables(v, p, t_len, k)
            ks = jnp.arange(k, dtype=jnp.int32)
            # remove the reference chain term folded into base_lp
            total = total - self._rv_log_prob(v, ref[chain_name], p)

            # emission tables: U[t, k] from one vmap-over-K per term
            u = jnp.zeros((t_len, k))
            for v2, deps in struct["terms"]:
                if chain_name not in deps or v2.name == chain_name:
                    continue
                term_vec = self._elementwise_term_vec(
                    v2, chain_name, struct, store, base_vals, z, t_len
                )
                vecs = jax.vmap(
                    lambda kv, _f=term_vec, _t=t_len: _f(
                        jnp.full((_t,), kv, jnp.int32)
                    )
                )(ks)  # [K, T]
                u = u + vecs.T
                total = total - jnp.sum(vecs[0])  # base contribution

            def fstep(alpha, xs):
                psi_t, u_t = xs
                alpha = lse(alpha[:, None] + psi_t, axis=0) + u_t
                return alpha, alpha

            alpha0 = init_lp + u[0]
            alpha_last, alphas = jax.lax.scan(fstep, alpha0, (psi, u[1:]))
            total = total + lse(alpha_last)
            if return_marginals:
                def bstep_collect(beta, xs):
                    psi_t, u_t = xs
                    nb = lse(psi_t + (u_t + beta)[None, :], axis=1)
                    return nb, nb

                _, betas_rev = jax.lax.scan(
                    bstep_collect, jnp.zeros((k,)),
                    (psi[::-1], u[1:][::-1]),
                )
                betas = jnp.concatenate(
                    [betas_rev[::-1], jnp.zeros((1, k))], axis=0
                )
                log_alphas = jnp.concatenate([alpha0[None], alphas], axis=0)
                marginals[chain_name] = jax.nn.softmax(
                    log_alphas + betas, axis=1
                )
        if return_marginals:
            return total, marginals
        return total

    def check_sequence_factorization(self, params, given=None,
                                     atol=1e-3) -> bool:
        """Verify the sequence decomposition numerically: the direct
        density at random full chain assignments must equal the
        table-decomposed value (catches non-element-wise emissions,
        e.g. a matmul coupling timesteps, and chain-valued transition
        parameters).  Verdict cached per conditioning-key set."""
        given = dict(given or {})
        gk = frozenset(given.keys())
        cacheable = params is self.initial_params
        cache = getattr(self, "_seq_verdict_cache", None)
        if cache is None:
            cache = {}
            self._seq_verdict_cache = cache
        if cacheable and gk in cache:
            return cache[gk]
        verdict = self._check_sequence_factorization_impl(params, given, atol)
        if cacheable:
            cache[gk] = verdict
        return verdict

    def _check_sequence_factorization_impl(self, params, given, atol) -> bool:
        info = self._sequence_chain_info(params, given)
        if not info:
            return False
        rng = np.random.RandomState(0)
        for _trial in range(2):
            z = {n: jnp.asarray(rng.normal(0, 0.7, s).astype(np.float32))
                 for n, s in self.z_shapes.items()}
            d_star = {
                n: jnp.asarray(rng.randint(0, k, (t,)), jnp.int32)
                for n, t, k in info
            }
            try:
                direct = float(
                    self.log_density_z(params, z, {**given, **d_star})
                )
                decomposed = float(self._sequence_decomposed_at(
                    params, z, given, d_star
                ))
            except Exception:
                return False
            if abs(direct - decomposed) > atol * max(1.0, abs(direct)):
                return False
        return True

    def _sequence_decomposed_at(self, params, z, given, d_star):
        """The table-decomposed density evaluated AT a full assignment
        (probe for the factorization check): const + init + transition +
        emission table lookups."""
        given = dict(given or {})
        info = self._sequence_chain_info(params, given)
        struct = self._discrete_structure(frozenset(given.keys()))
        store = self._as_store(params)
        ref = {n: jnp.zeros((t,), jnp.int32) for n, t, _k in info}
        base_vals, base_lp = self._walk_z(store, z, {**given, **ref})
        total = base_lp
        for chain_name, t_len, k in info:
            v = next(w for w in self.order if w.name == chain_name)
            p = self._expand_plate(v, v.eval_params(base_vals, store))
            d = d_star[chain_name]
            total = total - self._rv_log_prob(v, ref[chain_name], p)
            # the SAME tables the enumeration uses, looked up at d: the
            # probe therefore validates table construction too
            init_lp, psi = self._sequence_chain_tables(v, p, t_len, k)
            total = total + init_lp[d[0]] + jnp.sum(
                psi[jnp.arange(t_len - 1), d[:-1], d[1:]]
            )
            for v2, deps in struct["terms"]:
                if chain_name not in deps or v2.name == chain_name:
                    continue
                term_vec = self._elementwise_term_vec(
                    v2, chain_name, struct, store, base_vals, z, t_len
                )
                # per-element: U[t, d_t] via gathering one evaluation per
                # state (small K; probe-time only)
                ks = jnp.arange(k, dtype=jnp.int32)
                vecs = jax.vmap(
                    lambda kv, _f=term_vec, _t=t_len: _f(
                        jnp.full((_t,), kv, jnp.int32)
                    )
                )(ks)  # [K, T]
                total = total - jnp.sum(vecs[0])
                total = total + jnp.sum(
                    jnp.take_along_axis(vecs.T, d[:, None], axis=1)
                )
        return total

    def constrain(self, params, z: Dict[str, Array], given: Optional[Dict[str, Array]] = None) -> Dict[str, Array]:
        """Map unconstrained latents ``z`` to constrained values for every
        variable (deterministic and observed nodes included)."""
        values, _ = self._walk_z(self._as_store(params), z, given or {})
        return values

    def unconstrain(self, params, values: Dict[str, Array]) -> Dict[str, Array]:
        """Map constrained latent values into unconstrained space."""
        store = self._as_store(params)
        walk_values: Dict[str, Array] = {}
        z: Dict[str, Array] = {}
        for v in self.order:
            if isinstance(v, DeterministicVariable):
                walk_values[v.name] = v.compute(walk_values, store)
                continue
            assert isinstance(v, RandomVariable)
            if v.is_observed and v.name not in values:
                walk_values[v.name] = self._observed_value(v, walk_values, store)
                continue
            if v.name not in values:
                continue
            walk_values[v.name] = values[v.name]
            if v.name in self.continuous_latent_names:
                p = self._expand_plate(v, v.eval_params(walk_values, store))
                tr = transform_for(v.distribution, p)
                z[v.name] = tr.inverse(values[v.name])
        return z

    @property
    def data_loader_names(self) -> List[str]:
        """Names of data-loader RVs (Empirical / RandomIndices): these are
        resampled per SVI step to drive minibatching (SURVEY.md §3.4)."""
        from .distributions import Empirical, RandomIndices

        return [
            v.name
            for v in self.order
            if isinstance(v, RandomVariable)
            and isinstance(v.distribution, (Empirical, RandomIndices))
        ]

    def sample_subgraph_one(self, params, key: Array, names: Sequence[str]) -> Dict[str, Array]:
        """Sample only `names` and their ancestors (cheap data-loader draw)."""
        store = self._as_store(params)
        wanted = set(names)
        needed: set = set()
        # ancestors via reverse topo sweep
        for v in reversed(self.order):
            if v.name in wanted or v.name in needed:
                needed.add(v.name)
                for p in _full_deps(v):
                    needed.add(p.name)
        values: Dict[str, Array] = {}
        for i, v in enumerate(self.order):
            if v.name not in needed:
                continue
            if isinstance(v, DeterministicVariable):
                values[v.name] = v.compute(values, store)
                continue
            assert isinstance(v, RandomVariable)
            p = self._expand_plate(v, v.eval_params(values, store))
            values[v.name] = v.distribution.sample(jax.random.fold_in(key, i), **p)
        return {n: values[n] for n in needed if n in values}

    def z_example(self, dtype=jnp.float32) -> Dict[str, Array]:
        """Zero pytree with the unconstrained-latent shapes (init/tracing
        template for MCMC state and guides)."""
        return {k: jnp.zeros(s, dtype) for k, s in self.z_shapes.items()}

    # ------------------------------------------------------------------
    # Batched (vmapped + jitted) API
    # ------------------------------------------------------------------
    def _sample_batch(self, params, key, n: int, mapped_names: Tuple[str, ...], given_mapped, given_bcast):
        keys = jax.random.split(key, n)

        def one(k, gm):
            g = {**given_bcast, **dict(zip(mapped_names, gm))}
            return self.sample_one(params, k, g)

        gm_arrays = tuple(given_mapped)
        return jax.vmap(one, in_axes=(0, 0))(keys, gm_arrays)

    def sample(self, params, key: Array, n: int, given: Optional[Dict[str, Array]] = None):
        """n vmapped ancestral draws (jitted, cached per given-structure);
        ``given`` entries shaped [n, ...] map over the batch, others
        broadcast."""
        given = dict(given or {})
        mapped_names: List[str] = []
        mapped_vals: List[Array] = []
        bcast: Dict[str, Array] = {}
        for k, val in given.items():
            val = jnp.asarray(val)
            base = self.shapes.get(k)
            if base is not None and val.shape == (n,) + tuple(base):
                mapped_names.append(k)
                mapped_vals.append(val)
            else:
                bcast[k] = val
        return self._sample_vmapped(
            params, key, n=n, mapped_names=tuple(mapped_names),
            given_mapped=tuple(mapped_vals), given_bcast=bcast,
        )

    def _log_prob_batch(self, params, values: Dict[str, Array]) -> Array:
        return jax.vmap(lambda v: self.log_prob_one(params, v))(values)

    def log_prob(self, params, values: Dict[str, Array]) -> Array:
        """Vmapped joint log-density over a leading batch axis of
        ``values`` (jitted; unknown names are ignored)."""
        values = {k: jnp.asarray(v) for k, v in values.items() if k in set(self.names)}
        return self._log_prob_vmapped(params, values)


def compile_model(model: ProbabilisticModel, **kwargs) -> CompiledModel:
    return CompiledModel(model)
