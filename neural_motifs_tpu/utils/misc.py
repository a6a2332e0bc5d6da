"""Small numpy/jnp utilities (equivalents of reference lib/pytorch_misc.py
helpers that survive into the TPU design)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def intersect_2d(x1: np.ndarray, x2: np.ndarray) -> np.ndarray:
    """[N1, N2] bool: row i of x1 equals row j of x2 elementwise
    (pytorch_misc.py:233-247)."""
    if x1.shape[1] != x2.shape[1]:
        raise ValueError("Input arrays must have same #columns")
    return (x1[:, None] == x2[None]).all(-1)


def argsort_desc(scores: np.ndarray) -> np.ndarray:
    """Indices (unraveled) that sort a tensor descending
    (pytorch_misc.py:323-330)."""
    return np.column_stack(np.unravel_index(np.argsort(-scores.ravel()), scores.shape))


def to_onehot(labels, num_classes: int, fill: float = 1000.0):
    """One-hot logits at +fill for the label, -fill elsewhere
    (pytorch_misc.py:110-125): used so softmax(onehot) is a delta."""
    labels = jnp.asarray(labels)
    eye = jnp.eye(num_classes, dtype=jnp.float32)
    return jnp.where(eye[labels] > 0, fill, -fill)


def pad_to(arr: np.ndarray, n: int, value=0) -> np.ndarray:
    """Pad/truncate leading axis to n."""
    arr = np.asarray(arr)
    out = np.full((n,) + arr.shape[1:], value, dtype=arr.dtype)
    m = min(n, arr.shape[0])
    out[:m] = arr[:m]
    return out
