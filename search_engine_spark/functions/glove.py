"""GloVe-style embedding support (optional score component).

The reference loads a 25-d GloVe file at module import and crashes without
it (reference search_engine.py:13-23); the embedding feeds per-doc mean
vectors (indexer.py:54-61) and a 0.05-weighted cosine in the final score
(ranker.py:78,85-88). Here embeddings are an optional, configured component
(EngineConfig.glove_path); vector math is float64 with the exact oracle
accumulation order so rank-identity holds.

No external data: tests use :func:`fixture_glove`, a deterministic
hash-seeded pseudo-embedding written in the same text format the reference
consumes (``term v1 .. v25`` per line).
"""

from __future__ import annotations

import hashlib

import numpy as np


def load_glove(path: str) -> dict[str, np.ndarray]:
    """Parse a GloVe text file → {term: float64 vector} (search_engine.py:13-23)."""
    out: dict[str, np.ndarray] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) < 2:
                continue
            out[parts[0]] = np.asarray([float(x) for x in parts[1:]], np.float64)
    return out


def save_glove(path: str, vectors: dict[str, np.ndarray]) -> str:
    with open(path, "w", encoding="utf-8") as f:
        for term, vec in vectors.items():
            f.write(term + " " + " ".join(repr(float(x)) for x in vec) + "\n")
    return path


def fixture_glove(terms, dim: int = 25) -> dict[str, np.ndarray]:
    """Deterministic pseudo-embedding: per-term vector seeded by md5(term).

    Stable across processes/runs (independent of PYTHONHASHSEED and of the
    order/content of ``terms``).
    """
    out = {}
    for term in terms:
        seed = int.from_bytes(hashlib.md5(term.encode("utf-8")).digest()[:4], "big")
        rng = np.random.RandomState(seed)
        out[term] = rng.uniform(-1.0, 1.0, dim)
    return out


def doc_vector(terms, glove: dict[str, np.ndarray], dim: int) -> np.ndarray:
    """Per-doc mean vector: Σ vec(term) over *distinct* terms in insertion
    order, divided by the distinct-term count — hit or miss (indexer.py:54-61:
    denominator is len(term_doc_dictionary), not the number of glove hits)."""
    v = np.zeros(dim)
    n = 0
    for t in terms:
        n += 1
        g = glove.get(t)
        if g is not None:
            v = v + g
    return v / n if n else v


def query_vector(tokens, glove: dict[str, np.ndarray], dim: int) -> np.ndarray:
    """Query vector: Σ vec(token) over positions / |q| (searcher.py:29-33,65)."""
    v = np.zeros(dim)
    for t in tokens:
        g = glove.get(t)
        if g is not None:
            v = v + g
    return v / len(tokens) if tokens else v
