"""KenLM-style character n-gram perplexity scorer as an actor-pool
``map_batches`` stage.

Reference analogue: the running-moment accumulators A2/A3
(``simple_engine.go:277-293``) — a per-row numeric score from
incremental state — generalized to an n-gram language model. Public
technique: interpolated/add-k smoothed char trigram LM (the CCNet /
Gopher-style "perplexity filter" uses KenLM the same way).

Model: hashed trigram + bigram count tables (size D, uint64 polynomial
hash — process-independent). Score = average -log2 P(c_i | c_{i-2}
c_{i-1}) with add-k smoothing, i.e. bits/char; natural text scores low,
gibberish high. Built deterministically from a seed corpus once per
actor (or passed in pre-built via ``ray.put``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_P = np.uint64(1000003)


def _hash_grams(b: np.ndarray, n: int, dim: int) -> np.ndarray:
    """Bucket ids of all n-grams of a uint8 byte array (vectorized)."""
    if len(b) < n:
        return np.empty(0, dtype=np.int64)
    m = len(b) - n + 1
    h = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            h = h * _P + b[j : m + j].astype(np.uint64)
    return (h % np.uint64(dim)).astype(np.int64)


def train_char_lm(texts, dim: int = 1 << 18, order: int = 3) -> dict:
    """Count tables for the trigram LM from an iterable of texts."""
    tri = np.zeros(dim, dtype=np.float64)
    bi = np.zeros(dim, dtype=np.float64)
    for t in texts:
        if not t:
            continue
        b = np.frombuffer(f"  {t.lower()} ".encode("utf-8", "ignore"), dtype=np.uint8)
        np.add.at(tri, _hash_grams(b, order, dim), 1.0)
        np.add.at(bi, _hash_grams(b, order - 1, dim), 1.0)
    return {"tri": tri, "bi": bi, "dim": dim, "order": order, "k": 0.1, "vocab": 64.0}


def merge_char_lm(models: list[dict]) -> dict:
    out = dict(models[0])
    out["tri"] = sum(m["tri"] for m in models)
    out["bi"] = sum(m["bi"] for m in models)
    return out


def score_texts_batch(model: dict, texts) -> np.ndarray:
    """Bits/char for a whole batch in one pass: all texts concatenate
    into one byte array, tri/bi-gram hashes roll over the concatenation
    (windows crossing text boundaries dropped by a vectorized gather),
    and per-text means come from one ``add.reduceat`` — the per-text
    :func:`score_text` loop spent ~50 µs/row in numpy call overhead.
    Per-position probabilities are identical to ``score_text``; the
    per-text mean differs only in float summation order (≤ ~1 ulp)."""
    m = len(texts)
    scores = np.full(m, np.inf, dtype=np.float64)
    bs, keep = [], []
    for i, t in enumerate(texts):
        if t:
            bs.append(f"  {str(t).lower()} ".encode("utf-8", "ignore"))
            keep.append(i)
    if not bs:
        return scores
    dim, order, k, V = model["dim"], model["order"], model["k"], model["vocab"]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    arr = np.frombuffer(b"".join(bs), dtype=np.uint8)

    def roll(n: int) -> np.ndarray:
        nw = len(arr) - n + 1
        h = np.zeros(nw, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(n):
                h = h * _P + arr[j : nw + j].astype(np.uint64)
        return (h % np.uint64(dim)).astype(np.int64)

    h3_all, h2_all = roll(order), roll(order - 1)
    counts = lens - order + 1          # trigram windows per text (>= 2)
    starts = np.zeros(len(bs), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    offs = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    idx = (np.arange(int(offs[-1]), dtype=np.int64)
           - np.repeat(offs[:-1], counts)
           + np.repeat(starts, counts))
    # explicit float64 upcast after the gather: the tables may be held
    # in (exactly-representable) float32 for cache footprint, and a
    # float32 + python-float would otherwise stay float32
    p = ((model["tri"][h3_all[idx]].astype(np.float64) + k)
         / (model["bi"][h2_all[idx]].astype(np.float64) + k * V))
    logs = -np.log2(p)
    sums = np.add.reduceat(logs, offs[:-1])
    scores[np.asarray(keep, dtype=np.int64)] = sums / counts
    return scores


def score_text(model: dict, text: str) -> float:
    """Bits/char of one text under the model (add-k smoothing)."""
    if not text:
        return float("inf")
    dim, order, k, V = model["dim"], model["order"], model["k"], model["vocab"]
    b = np.frombuffer(f"  {text.lower()} ".encode("utf-8", "ignore"), dtype=np.uint8)
    h3 = _hash_grams(b, order, dim)
    h2 = _hash_grams(b, order - 1, dim)[: len(h3)]
    if len(h3) == 0:
        return float("inf")
    p = ((model["tri"][h3].astype(np.float64) + k)
         / (model["bi"][h2].astype(np.float64) + k * V))
    return float(-np.log2(p).mean())


class PerplexityScorer:
    """Actor-pool stage: adds ``ppl`` (bits/char) and optionally
    ``rule_high_perplexity``. The count tables ship once per actor via
    the ObjectRef; per-batch work is numpy table lookups."""

    def __init__(self, model_ref, text_col: str = "caption_trimmed",
                 max_ppl: float | None = None):
        if "ObjectRef" in type(model_ref).__name__:
            import ray
            model = ray.get(model_ref)
        else:
            model = model_ref
        # count tables as float32: counts are small integers (< 2^24),
        # exactly representable, so gather-then-upcast is BIT-IDENTICAL
        # to float64 tables while halving the randomly-gathered cache
        # footprint (the scorer's only non-sequential memory access)
        self.model = dict(model)
        self.model["tri"] = np.asarray(model["tri"], dtype=np.float32)
        self.model["bi"] = np.asarray(model["bi"], dtype=np.float32)
        self.text_col = text_col
        self.max_ppl = max_ppl

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        scores = score_texts_batch(self.model, texts)
        # inf (empty text) -> large sentinel; such rows are already
        # dropped by null_blank, keep the column finite for Arrow/SQL.
        scores = np.where(np.isfinite(scores), scores, 999.0)
        out = batch.append_column("ppl", pa.array(scores, type=pa.float64()))
        if self.max_ppl is not None:
            out = out.append_column(
                "rule_high_perplexity", pa.array(scores > self.max_ppl)
            )
        return out
