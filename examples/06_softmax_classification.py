"""Softmax digit classification with minibatch ML training (the
reference's MNIST-classifier example family, SURVEY.md §2 "Examples"):
a learnable-weight CategoricalVariable trained by MaximumLikelihood
through the RandomIndices/EmpiricalVariable data-loader pattern.

Run: python examples/06_softmax_classification.py
"""
import numpy as np

import brancher_tpu.functions as BF
from brancher_tpu import (
    CategoricalVariable,
    DeterministicVariable,
    EmpiricalVariable,
    ProbabilisticModel,
    RandomIndices,
)
from brancher_tpu.inference import MaximumLikelihood, perform_inference

from sklearn.datasets import load_digits

digits = load_digits()
x_all = (digits.data / 16.0).astype(np.float32)
y_all = digits.target.astype(np.int32)
n, d, k = x_all.shape[0], x_all.shape[1], 10

idx = RandomIndices(n, 256, "idx")
xb = EmpiricalVariable(x_all, name="xb", indices=idx)
yb = EmpiricalVariable(y_all, name="yb", indices=idx)

w = DeterministicVariable(np.zeros((d, k), np.float32), "w", learnable=True)
b = DeterministicVariable(np.zeros(k, np.float32), "b", learnable=True)
y = CategoricalVariable(logits=BF.matmul(xb, w) + b, name="y",
                        log_prob_scale=float(n) / 256.0)
y.observe(yb)
model = ProbabilisticModel([y])

res = perform_inference(
    model, number_iterations=800, number_samples=1, lr=0.05,
    inference_method=MaximumLikelihood(),
)
print(f"NLL: {res.loss_curve[0]:.0f} -> {res.loss_curve[-1]:.0f}")

# accuracy with the trained weights
w_hat = np.asarray(res.params["p"]["w"])
b_hat = np.asarray(res.params["p"]["b"])
pred = (x_all @ w_hat + b_hat).argmax(-1)
print("train accuracy:", (pred == y_all).mean().round(4))
