"""Loss and metrics (reference `/root/reference/utils.py:129-149`),
extended with masking so padded rows contribute nothing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from sklearn import metrics as _skmetrics


def masked_loss(preds: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray,
                sigmoid_loss: bool) -> jnp.ndarray:
    """Reference `utils.py:129-140` with padding masks.

    sigmoid path: BCE-with-logits, per-example weight 1/B, sum reduction
    == mean over valid rows of the per-row class-sum of BCE terms.
    softmax path: weighted cross-entropy with one-hot (probabilistic)
    targets, weight 1/B.
    """
    n_valid = jnp.maximum(jnp.sum(mask), 1.0)
    w = mask / n_valid
    if sigmoid_loss:
        # log(1+exp(-|x|)) formulation for stability, matching torch BCEWithLogits
        logits = preds
        per_elt = (jnp.maximum(logits, 0) - logits * labels
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return jnp.sum(per_elt * w[:, None])
    logp = jax.nn.log_softmax(preds, axis=1)
    ce = -jnp.sum(labels * logp, axis=1)
    return jnp.sum(ce * w)


def calc_f1(y_true: np.ndarray, y_pred: np.ndarray, is_sigmoid: bool):
    """micro/macro F1 (reference `utils.py:142-149`): sigmoid thresholds at
    0.5; softmax argmaxes both sides."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if not is_sigmoid:
        y_true = np.argmax(y_true, axis=1)
        y_pred = np.argmax(y_pred, axis=1)
    else:
        y_pred = (y_pred > 0.5).astype(y_true.dtype)
    return (_skmetrics.f1_score(y_true, y_pred, average="micro"),
            _skmetrics.f1_score(y_true, y_pred, average="macro"))


def predict_proba(logits: jnp.ndarray, sigmoid_loss: bool) -> jnp.ndarray:
    """`main.py:193`: sigmoid for multilabel, softmax otherwise."""
    if sigmoid_loss:
        return jax.nn.sigmoid(logits)
    return jax.nn.softmax(logits, axis=1)
