"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
(``ray.put``), each batch does one numpy matmul and emits only its local
top-k per query (k × #blocks candidate rows total), and a final tiny
per-query reduction picks the global top-k. No full similarity matrix
is ever materialized.

Scale path: ``_HyperplaneLSH``-bucketed search (IVF-style): probe only
the buckets whose key is within Hamming ≤ probe_hamming of the query's
key. Approximate — recall vs brute force is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _as_matrix(col) -> np.ndarray:
    m = np.stack(col.to_pylist()).astype(np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    ds: "rd.Dataset", queries: np.ndarray, query_ids: list, k: int,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> "rd.Dataset":
    """Global cosine top-k per query: (query_id, vec_id, score, rank).

    Deterministic tie-break: higher score first, then smaller vec_id.
    """
    Q = queries.astype(np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qref = ray.put((np.asarray(query_ids), Q))

    class LocalTopK:
        def __init__(self):
            self.qids, self.Q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _as_matrix(batch[vec_col])
            ids = np.asarray(batch[id_col].to_pylist())
            sims = m @ self.Q.T                      # (B, Q)
            out_q, out_v, out_s = [], [], []
            kk = min(k, len(ids))
            for qi in range(sims.shape[1]):
                s = sims[:, qi]
                top = np.argpartition(-s, kk - 1)[:kk]
                out_q.extend([self.qids[qi]] * kk)
                out_v.extend(ids[top])
                out_s.extend(s[top])
            return pa.table({
                "query_id": pa.array(out_q),
                "vec_id": pa.array(out_v),
                "score": pa.array(np.asarray(out_s, dtype=np.float64)),
            })

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    local = ds.select_columns([id_col, vec_col]).map_batches(
        LocalTopK, batch_format="pyarrow", batch_size=4096, concurrency=(2, 8),
    )
    return local.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def lsh_topk(
    ds: "rd.Dataset", queries: np.ndarray, query_ids: list, k: int,
    dim: int, vec_col: str = "embedding", id_col: str = "vec_id",
    nbits: int = 10, probe_hamming: int = 1, seed: int = 42,
) -> "rd.Dataset":
    """Approximate top-k: search only vectors whose hyperplane-LSH key
    is within Hamming ≤ probe_hamming of the query's key (multi-probe).
    Same output schema as brute_force_topk."""
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((dim, nbits))
    Q = queries.astype(np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qkeys = _keys(Q, H)
    # probe set per query: own key + all keys at hamming 1..probe_hamming
    probes: dict[int, list[int]] = {}
    for qi, qk in enumerate(qkeys):
        ks = {int(qk)}
        if probe_hamming >= 1:
            ks |= {int(qk) ^ (1 << b) for b in range(nbits)}
        for kk_ in ks:
            probes.setdefault(kk_, []).append(qi)
    pref = ray.put((np.asarray(query_ids), Q, H, probes))

    class BucketTopK:
        def __init__(self):
            self.qids, self.Q, self.H, self.probes = ray.get(pref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _as_matrix(batch[vec_col])
            keys = _keys(m, self.H)
            ids = np.asarray(batch[id_col].to_pylist())
            out_q, out_v, out_s = [], [], []
            for key in np.unique(keys):
                qis = self.probes.get(int(key))
                if not qis:
                    continue
                sel = keys == key
                sub, sub_ids = m[sel], ids[sel]
                sims = sub @ self.Q[qis].T
                kk = min(k, len(sub_ids))
                for ci, qi in enumerate(qis):
                    s = sims[:, ci]
                    top = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
                    out_q.extend([self.qids[qi]] * len(top))
                    out_v.extend(sub_ids[top])
                    out_s.extend(s[top])
            return pa.table({
                "query_id": pa.array(out_q),
                "vec_id": pa.array(out_v),
                "score": pa.array(np.asarray(out_s, dtype=np.float64)),
            })

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    local = ds.select_columns([id_col, vec_col]).map_batches(
        BucketTopK, batch_format="pyarrow", batch_size=4096, concurrency=(2, 8),
    )
    return local.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def _keys(m: np.ndarray, H: np.ndarray) -> np.ndarray:
    bits = (m @ H) > 0
    key = np.zeros(len(m), dtype=np.int64)
    for b in range(bits.shape[1]):
        key |= bits[:, b].astype(np.int64) << b
    return key


def load_query_vectors(
    sf_dir: str, n_queries: int = 10, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, list]:
    """First n_queries embeddings (by id) as the deterministic query set."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=[id_col, vec_col])
    df = t.to_pandas().sort_values(id_col).head(n_queries)
    return np.stack(df[vec_col].to_numpy()), df[id_col].tolist()
