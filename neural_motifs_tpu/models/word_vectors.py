"""GloVe word-vector loading for class-name embeddings.

Equivalent of reference lib/word_vectors.py:17-113: loads glove.6B.<dim>d
vectors, looks up each class name with a longest-suffix-word fallback, and
caches. Without the GloVe files (no-network environments) it falls back to
deterministic pseudo-random vectors keyed by the word, so training still
runs — real experiments should provide NM_TPU_GLOVE.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from neural_motifs_tpu.config import GLOVE_PATH


def _hash_vector(word: str, dim: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(word.encode()).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randn(dim).astype(np.float32)


def load_word_vectors(root: str, wv_type: str, dim: int):
    """Parse glove txt -> (dict word->row, array). Returns None if absent."""
    txt = os.path.join(root, f"{wv_type}.{dim}d.txt")
    npy = txt + ".npy"
    vocab_fn = txt + ".vocab"
    if os.path.exists(npy) and os.path.exists(vocab_fn):
        vecs = np.load(npy)
        with open(vocab_fn) as f:
            words = f.read().split("\n")
        return {w: i for i, w in enumerate(words)}, vecs
    if not os.path.exists(txt):
        return None
    words, rows = [], []
    with open(txt, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            words.append(parts[0])
            rows.append(np.array(parts[1:], np.float32))
    vecs = np.stack(rows)
    np.save(npy, vecs)
    with open(vocab_fn, "w") as f:
        f.write("\n".join(words))
    return {w: i for i, w in enumerate(words)}, vecs


def obj_edge_vectors(names, wv_dim: int = 200, wv_type: str = "glove.6B",
                     root: str = GLOVE_PATH) -> np.ndarray:
    """[len(names), wv_dim] embedding init. Multi-word names fall back to
    the last in-vocab token (word_vectors.py:17-54)."""
    loaded = load_word_vectors(root, wv_type, wv_dim)
    out = np.zeros((len(names), wv_dim), np.float32)
    for i, name in enumerate(names):
        if loaded is not None:
            vocab, vecs = loaded
            if name in vocab:
                out[i] = vecs[vocab[name]]
                continue
            found = False
            for tok in reversed(name.split(" ")):
                if tok in vocab:
                    out[i] = vecs[vocab[tok]]
                    found = True
                    break
            if found:
                continue
        out[i] = _hash_vector(name, wv_dim)
    return out
