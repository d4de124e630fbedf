"""Symbolic graph core: variables, lazy links, probabilistic models.

Reference parity: Brancher's ``variables.py`` — ``Variable``,
``RandomVariable``, ``DeterministicVariable``, ``PartialLink``, ``var2link``
and ``ProbabilisticModel`` with operator-overloaded DAG construction,
ancestral sampling and log-prob accumulation (SURVEY.md §2 "Graph core",
§3.1–3.3).  The user-facing ergonomics are preserved: any parameter
position accepts numbers, arrays, variables or expressions, and parent
discovery is automatic.

TPU-first redesign: the reference re-interprets the DAG with recursive
Python traversal on every call (SURVEY.md §3.2 "hot loop").  Here the DAG
is *data only*; ``brancher_tpu.compiler`` lowers it ONCE into pure JAX
closures (sample / log_joint), which are then jit/vmap/shard-composed by
the inference engines.  Python-level recursion happens once at trace time,
never per sample.
"""
from __future__ import annotations

import itertools
from typing import Any, Callable, Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp

from .distributions import Distribution
from .utilities import to_array

Array = jax.Array

_var_counter = itertools.count()


class ParamStore:
    """Dict of learnable leaves; growable during the shape-probe pass.

    During compilation a single non-jitted probe pass runs with an
    unfrozen store so lazily-initialized parameters (flax modules, learnable
    deterministic variables) can register themselves with concrete shapes.
    Inside jitted closures the store is a frozen plain dict lookup.
    """

    def __init__(self, params: Optional[Dict[str, Any]] = None, rng: Optional[Array] = None, frozen: bool = True):
        self.params: Dict[str, Any] = dict(params or {})
        self._rng = rng
        self.frozen = frozen

    def _next_rng(self) -> Array:
        if self._rng is None:
            self._rng = jax.random.PRNGKey(0)
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def get(self, name: str, init_fn: Optional[Callable] = None, *args):
        if name in self.params:
            return self.params[name]
        if self.frozen or init_fn is None:
            raise KeyError(f"unknown parameter {name!r}")
        value = init_fn(self._next_rng(), *args)
        self.params[name] = value
        return value


class PartialLink:
    """A lazy expression over variables: (vars, fn(values, params) -> Array).

    Reference parity: Brancher's ``PartialLink`` lazy expression node
    (SURVEY.md §3.1).  ``vars`` is an ordered tuple of the Variables the
    expression reads; ``fn`` evaluates it given their values.  Operator
    overloading composes links without executing anything.
    """

    __array_priority__ = 100  # beat numpy's operators

    def __init__(self, variables: Sequence["Variable"], fn: Callable[[Dict[str, Array], ParamStore], Array]):
        # preserve order, drop dups
        seen: Set[int] = set()
        ordered: List[Variable] = []
        for v in variables:
            if id(v) not in seen:
                seen.add(id(v))
                ordered.append(v)
        self.vars: Tuple[Variable, ...] = tuple(ordered)
        self.fn = fn

    # -- composition helpers ------------------------------------------------
    @staticmethod
    def _binary(op, a, b) -> "PartialLink":
        la, lb = var2link(a), var2link(b)
        return PartialLink(
            tuple(la.vars) + tuple(lb.vars),
            lambda values, params: op(la.fn(values, params), lb.fn(values, params)),
        )

    def _unary(self, op) -> "PartialLink":
        return PartialLink(self.vars, lambda values, params: op(self.fn(values, params)))

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, other):
        return self._binary(jnp.add, self, other)

    def __radd__(self, other):
        return self._binary(jnp.add, other, self)

    def __sub__(self, other):
        return self._binary(jnp.subtract, self, other)

    def __rsub__(self, other):
        return self._binary(jnp.subtract, other, self)

    def __mul__(self, other):
        return self._binary(jnp.multiply, self, other)

    def __rmul__(self, other):
        return self._binary(jnp.multiply, other, self)

    def __truediv__(self, other):
        return self._binary(jnp.divide, self, other)

    def __rtruediv__(self, other):
        return self._binary(jnp.divide, other, self)

    def __pow__(self, other):
        return self._binary(jnp.power, self, other)

    def __rpow__(self, other):
        return self._binary(jnp.power, other, self)

    def __matmul__(self, other):
        return self._binary(jnp.matmul, self, other)

    def __rmatmul__(self, other):
        return self._binary(lambda a, b: jnp.matmul(a, b), other, self)

    def __neg__(self):
        return self._unary(jnp.negative)

    def __abs__(self):
        return self._unary(jnp.abs)

    def __getitem__(self, item):
        return self._unary(lambda x: x[item])

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return self._unary(lambda x: jnp.reshape(x, shape))

    def sum(self, axis=None):
        return self._unary(lambda x: jnp.sum(x, axis=axis))

    @property
    def T(self):
        return self._unary(lambda x: jnp.swapaxes(x, -1, -2))


_LINK_OPS = [
    "__add__", "__radd__", "__sub__", "__rsub__", "__mul__", "__rmul__",
    "__truediv__", "__rtruediv__", "__pow__", "__rpow__", "__matmul__",
    "__rmatmul__", "__neg__", "__abs__", "__getitem__",
]


def var2link(x: Any) -> PartialLink:
    """Coerce scalars / arrays / Variables / links into a PartialLink.

    Reference parity: ``var2link`` coercion (SURVEY.md §3.1).
    """
    if isinstance(x, PartialLink):
        return x
    if isinstance(x, Variable):
        name = x.name
        return PartialLink((x,), lambda values, params, _n=name: values[_n])
    if isinstance(x, (list, tuple)) and any(isinstance(e, (Variable, PartialLink)) for e in x):
        links = [var2link(e) for e in x]
        all_vars = [v for l in links for v in l.vars]
        return PartialLink(
            all_vars,
            lambda values, params: jnp.stack([l.fn(values, params) for l in links]),
        )
    const = to_array(x)
    return PartialLink((), lambda values, params: const)


class Variable:
    """Abstract symbolic node.  Operator overloading yields PartialLinks."""

    def __init__(self, name: Optional[str] = None):
        self._uid = next(_var_counter)
        self.name = name if name is not None else f"var_{self._uid}"
        self._observed: Optional[Array] = None
        self.version = 0  # bumped on observe/unobserve for cache invalidation

    # -- observation state --------------------------------------------------
    def observe(self, data) -> None:
        """Condition this variable on data (fixes its value in log-joints).

        Reference parity: per-variable ``observe`` (SURVEY.md §2 "Graph
        core": observation state).  ``data`` may also be another Variable or
        expression (the reference's EmpiricalVariable minibatch pattern:
        observing y with a data-loader variable) — the observed value is
        then evaluated in-graph.
        """
        if isinstance(data, (Variable, PartialLink)):
            self._observed = var2link(data)
        else:
            self._observed = to_array(data)
        self.version += 1

    def unobserve(self) -> None:
        self._observed = None
        self.version += 1

    @property
    def is_observed(self) -> bool:
        return self._observed is not None

    @property
    def observed_value(self) -> Optional[Array]:
        return self._observed

    @property
    def parents(self) -> Tuple["Variable", ...]:
        return ()

    def __repr__(self):
        kind = type(self).__name__
        obs = ", observed" if self.is_observed else ""
        return f"<{kind} {self.name!r}{obs}>"

    def __hash__(self):
        return self._uid

    def __eq__(self, other):
        return self is other


# operator overloading: route through var2link so `x + y`, `2 * x`, `x[0]`
# all build PartialLinks exactly like the reference (SURVEY.md §3.1).
def _make_var_op(opname):
    def op(self, *args):
        return getattr(var2link(self), opname)(*args)

    op.__name__ = opname
    return op


for _opname in _LINK_OPS:
    setattr(Variable, _opname, _make_var_op(_opname))
Variable.reshape = lambda self, *s: var2link(self).reshape(*s)
Variable.sum = lambda self, axis=None: var2link(self).sum(axis=axis)
Variable.T = property(lambda self: var2link(self).T)


class RandomVariable(Variable):
    """A stochastic node: distribution + parameter links.

    Args:
      distribution: a ``Distribution`` kernel pair.
      name: unique variable name (the key in sample dicts).
      links: dict parameter-name -> anything coercible by ``var2link``.
      plate_shape: extra iid leading dims drawn beyond parameter broadcast.
      log_prob_scale: multiplier on this variable's log-prob contribution —
        used for minibatch N/B likelihood rescaling (SURVEY.md §7.6).
      has_bias: unused placeholder for API parity.
    """

    def __init__(
        self,
        distribution: Distribution,
        name: Optional[str] = None,
        links: Optional[Dict[str, Any]] = None,
        plate_shape: Tuple[int, ...] = (),
        log_prob_scale: float = 1.0,
    ):
        super().__init__(name)
        self.distribution = distribution
        self.links: Dict[str, PartialLink] = {
            k: var2link(v) for k, v in (links or {}).items() if v is not None
        }
        self.plate_shape = tuple(plate_shape)
        self.log_prob_scale = log_prob_scale

    @property
    def parents(self) -> Tuple[Variable, ...]:
        seen: Set[int] = set()
        out: List[Variable] = []
        for link in self.links.values():
            for v in link.vars:
                if id(v) not in seen:
                    seen.add(id(v))
                    out.append(v)
        return tuple(out)

    @property
    def is_discrete(self) -> bool:
        return self.distribution.is_discrete

    def eval_params(self, values: Dict[str, Array], params: ParamStore) -> Dict[str, Array]:
        return {k: link.fn(values, params) for k, link in self.links.items()}


class DeterministicVariable(Variable):
    """A deterministic node: a constant, learnable leaf, or expression.

    Reference parity: Brancher's ``DeterministicVariable`` including
    ``learnable=True`` leaves that the optimizer trains (SURVEY.md §2
    "Optimizer wrapper").  Expression-valued deterministic nodes carry a
    PartialLink.
    """

    def __init__(self, value: Any = None, name: Optional[str] = None, learnable: bool = False):
        super().__init__(name)
        self.learnable = learnable
        if isinstance(value, (Variable, PartialLink)):
            if learnable:
                raise ValueError("expression-valued deterministic variables cannot be learnable")
            self.link: Optional[PartialLink] = var2link(value)
            self.value: Optional[Array] = None
        else:
            self.link = None
            self.value = to_array(value) if value is not None else None
            if self.value is None:
                raise ValueError("leaf DeterministicVariable needs a value")

    @property
    def parents(self) -> Tuple[Variable, ...]:
        return self.link.vars if self.link is not None else ()

    def compute(self, values: Dict[str, Array], params: ParamStore) -> Array:
        if self.link is not None:
            return self.link.fn(values, params)
        if self.learnable:
            return params.get(self.name, lambda rng: self.value)
        return self.value


def full_deps(v: Variable) -> Tuple[Variable, ...]:
    """Parents plus observation-link variables (data-loader pattern).

    Observing ``y`` with an expression over other variables (e.g. an
    EmpiricalVariable minibatch) makes those variables real dependencies:
    they must appear in the model, in topological order, and in the
    compile-cache version key.
    """
    deps = list(v.parents)
    obs = getattr(v, "_observed", None)
    if isinstance(obs, PartialLink):
        deps.extend(obs.vars)
    return tuple(deps)


def _ancestral_closure(roots: Sequence[Variable]) -> List[Variable]:
    """Topologically ordered ancestral closure (parents before children).

    Deterministic: DFS following dependency lists (parents + observation
    links, matching the compiler's traversal) in declaration order, output
    in post-order.  This order is frozen into compiled closures.
    """
    order: List[Variable] = []
    state: Dict[int, int] = {}  # 0 = visiting, 1 = done

    def visit(v: Variable):
        s = state.get(id(v))
        if s == 1:
            return
        if s == 0:
            raise ValueError(f"cycle detected through variable {v.name!r}")
        state[id(v)] = 0
        for p in full_deps(v):
            visit(p)
        state[id(v)] = 1
        order.append(v)

    for r in roots:
        visit(r)
    return order


class ProbabilisticModel:
    """Container for a DAG of variables; entry point for all inference.

    Reference parity: ``ProbabilisticModel`` with ``get_sample``,
    ``calculate_log_probability``, ``observe``, ``set_posterior_model``,
    ``get_posterior_sample`` (SURVEY.md §2 "Graph core", §3.2–3.4).

    TPU-first: the heavy lifting delegates to ``brancher_tpu.compiler``,
    which caches compiled pure closures keyed on the model's observation
    version.
    """

    def __init__(self, variables: Sequence[Variable]):
        if isinstance(variables, Variable):
            variables = [variables]
        self.output_variables: List[Variable] = list(variables)
        self.variables: List[Variable] = _ancestral_closure(self.output_variables)
        names = [v.name for v in self.variables]
        dup = {n for n in names if names.count(n) > 1}
        if dup:
            raise ValueError(f"duplicate variable names in model: {sorted(dup)}")
        self.posterior_model: Optional[ProbabilisticModel] = None
        self.diagnostics: Dict[str, Any] = {}
        self._compiled_cache: Dict[Tuple, Any] = {}

    # -- structure queries --------------------------------------------------
    @property
    def random_variables(self) -> List[RandomVariable]:
        return [v for v in self.variables if isinstance(v, RandomVariable)]

    @property
    def latent_variables(self) -> List[RandomVariable]:
        return [v for v in self.random_variables if not v.is_observed]

    @property
    def observed_variables(self) -> List[RandomVariable]:
        return [v for v in self.random_variables if v.is_observed]

    def get_variable(self, name: str) -> Variable:
        for v in self.variables:
            if v.name == name:
                return v
        raise KeyError(name)

    def _refresh_structure(self) -> None:
        """Recompute the ancestral closure (observation links may have
        introduced new dependencies, e.g. a data-loader variable)."""
        self.variables = _ancestral_closure(self.output_variables)

    def _version_key(self) -> Tuple:
        return tuple((v.name, v.version) for v in self.variables)

    # -- compilation (cached) ----------------------------------------------
    def compiled(self, **kwargs):
        from .compiler import compile_model  # local import avoids cycle

        self._refresh_structure()
        key = (self._version_key(), tuple(sorted(kwargs.items())))
        if key not in self._compiled_cache:
            self._compiled_cache.clear()  # only latest version is useful
            self._compiled_cache[key] = compile_model(self, **kwargs)
        return self._compiled_cache[key]

    # -- observation convenience -------------------------------------------
    def observe(self, data: Dict[Any, Any]) -> None:
        """Observe several variables at once: {variable-or-name: data}."""
        for k, v in data.items():
            var = k if isinstance(k, Variable) else self.get_variable(k)
            var.observe(v)
        self._refresh_structure()

    def unobserve_all(self) -> None:
        for v in self.variables:
            if v.is_observed:
                v.unobserve()

    # -- sampling / log prob -------------------------------------------------
    def get_sample_dict(
        self,
        number_samples: int,
        key: Optional[Array] = None,
        input_values: Optional[Dict[str, Array]] = None,
        params: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Array]:
        comp = self.compiled()
        if key is None:
            from .config import config

            key = jax.random.PRNGKey(config.seed)
        return comp.sample(
            params if params is not None else comp.initial_params,
            key,
            number_samples,
            given=input_values,
        )

    def get_sample(self, number_samples: int, key: Optional[Array] = None, input_values=None, params=None):
        """Sample and return a tidy pandas DataFrame (reference API)."""
        from .pandas_interface import sample_dict_to_dataframe

        raw = self.get_sample_dict(number_samples, key=key, input_values=input_values, params=params)
        return sample_dict_to_dataframe(raw)

    def calculate_log_probability(
        self,
        samples,
        params: Optional[Dict[str, Any]] = None,
        for_gradient: bool = False,
    ) -> Array:
        """Log-joint per sample: f32[n].  Accepts sample dicts or DataFrames."""
        from .pandas_interface import coerce_to_sample_dict

        comp = self.compiled()
        sample_dict = coerce_to_sample_dict(samples)
        return comp.log_prob(
            params if params is not None else comp.initial_params, sample_dict
        )

    # -- posterior attachment ------------------------------------------------
    def set_posterior_model(self, model: "ProbabilisticModel") -> None:
        """Attach a variational model; correspondence is by variable NAME."""
        self.posterior_model = model

    def get_posterior_sample(self, number_samples: int, key: Optional[Array] = None, params=None):
        from .pandas_interface import sample_dict_to_dataframe

        raw = self.get_posterior_sample_dict(number_samples, key=key, params=params)
        return sample_dict_to_dataframe(raw)

    def get_posterior_sample_dict(
        self, number_samples: int, key: Optional[Array] = None, params=None
    ) -> Dict[str, Array]:
        if self.posterior_model is None:
            raise ValueError("no posterior model set; call set_posterior_model first")
        if key is None:
            from .config import config

            key = jax.random.PRNGKey(config.seed)
        kq, kp = jax.random.split(key)
        qcomp = self.posterior_model.compiled()
        qparams = params.get("q") if isinstance(params, dict) and "q" in (params or {}) else None
        q_samples = self.posterior_model.get_sample_dict(number_samples, key=kq, params=qparams)
        # push q's latents through p by name
        p_names = {v.name for v in self.variables}
        given = {k: v for k, v in q_samples.items() if k in p_names}
        pparams = params.get("p") if isinstance(params, dict) and "p" in (params or {}) else None
        joint = self.get_sample_dict(number_samples, key=kp, input_values=given, params=pparams)
        return joint

    def __repr__(self):
        return (
            f"<ProbabilisticModel vars={[v.name for v in self.variables]} "
            f"latents={[v.name for v in self.latent_variables]} "
            f"observed={[v.name for v in self.observed_variables]}>"
        )
