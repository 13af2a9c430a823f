"""Driver-side one-time training of the log-linear relation classifier.

The reference trains ~25 Theano model variants (rnnReModels.py); the
engine's distributed concern is *inference* (M21 gradients/optimizers are
out of scope per SURVEY.md §2.6).  This module trains the sparse
log-linear expert — MultiNN with no hidden layer: logits = Σ W[feature
ids] + b, softmax (rnnReModels.py:772-833) — with plain seeded SGD on
NLL, matching the reference's training protocol shape (epochs over
shuffled minibatches, best-valid-F1 selection, rnnRE.py:907-1000).

The produced weights are broadcast to executors by model.infer; the
golden generator (tests) applies the *same* weights through the same
numpy path, which is what makes the triple P/R gate exact.
"""

from __future__ import annotations

import numpy as np

from deepie_spark.model.zoo import softmax, sparse_loglinear_logits


def train_loglinear(
    bin_rows: np.ndarray,
    labels: np.ndarray,
    n_classes: int,
    n_features: int,
    epochs: int = 20,
    lr: float = 0.5,
    batch: int = 50,
    seed: int = 8989,
    l2: float = 1e-4,
) -> dict[str, np.ndarray]:
    """bin_rows: (n, 1+maxlen) [count, ids…, -1]; labels: (n,) ids."""
    rng = np.random.RandomState(seed)
    W = 0.01 * rng.randn(n_features, n_classes)
    b = np.zeros(n_classes)
    n = len(labels)
    for _ in range(epochs):
        perm = rng.permutation(n)
        for s in range(0, n, batch):
            idx = perm[s : s + batch]
            rows = bin_rows[idx]
            y = labels[idx]
            logits = sparse_loglinear_logits(rows, W, b)
            p = softmax(logits, axis=1)
            p[np.arange(len(y)), y] -= 1.0
            p /= len(y)
            b -= lr * p.sum(axis=0)
            for r, g in zip(rows, p):
                k = int(r[0])
                if k > 0:
                    ids = r[1 : k + 1]
                    W[ids] -= lr * (g + l2 * W[ids])
    return {"W": W, "b": b}


def predict_loglinear(
    bin_rows: np.ndarray, weights: dict[str, np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """→ (pred ids, probability matrix); M18 + M20."""
    p = softmax(
        sparse_loglinear_logits(bin_rows, weights["W"], weights["b"]), axis=1
    )
    return p.argmax(axis=1), p


def score_py(pred: np.ndarray, gold: np.ndarray) -> tuple[float, float, float]:
    """Pure-python twin of operators.scorer (rnnRE.py:564-581) for
    driver-side epoch evaluation."""
    num_pred = int((pred != 0).sum())
    num_key = int((gold != 0).sum())
    correct = int(((pred != 0) & (pred == gold)).sum())
    p = 100.0 * correct / num_pred if num_pred else 0.0
    r = 100.0 * correct / num_key if num_key else 0.0
    f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
    return p, r, f1
