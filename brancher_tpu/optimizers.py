"""Optimizer wrapper.

Reference parity: Brancher's ``optimizers.py`` — ``ProbabilisticOptimizer``
gathers learnable parameters from ``DeterministicVariable(learnable=True)``
nodes and embedded nn modules, wrapping any torch.optim class
(SURVEY.md §2 "Optimizer wrapper").

TPU-first: parameters are pytree leaves managed by the compiler's
ParamStore; this class wraps any optax transformation with the same
reference-flavored surface.  ``perform_inference`` uses optax directly;
this wrapper exists for users who drive custom loops.
"""
from __future__ import annotations

from typing import Any, Dict

import jax

Array = jax.Array


class ProbabilisticOptimizer:
    """Gathers a model's learnable params and steps them with optax.

    Example::

        opt = ProbabilisticOptimizer(model, "adam", lr=1e-2)
        loss, _ = opt.step(lambda params: my_loss(params))
    """

    def __init__(self, model, optimizer: Any = "adam", lr: float = 0.01):
        from .inference.svi import _resolve_optimizer

        self.model = model
        comp = model.compiled()
        self.params: Dict[str, Any] = dict(comp.initial_params)
        self.tx = _resolve_optimizer(optimizer, lr)
        self.opt_state = self.tx.init(self.params)

    def step(self, loss_fn):
        """One gradient step on loss_fn(params) -> scalar."""
        import optax

        loss, grads = jax.value_and_grad(loss_fn)(self.params)
        updates, self.opt_state = self.tx.update(grads, self.opt_state, self.params)
        self.params = optax.apply_updates(self.params, updates)
        return loss, self.params

    def parameter_names(self):
        return list(self.params.keys())
