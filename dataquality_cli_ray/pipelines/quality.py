"""Flagship pipeline: language-ID + quality-filter + PII/toxicity-scrub
over image+caption tables (BASELINE.json north rule).

Stage graph (all lazy, streaming, backpressured):

    read_parquet (pruned)                       source tasks
      → HeuristicRules                          stateless map_batches (Arrow kernels)
      → DecodeImageStage                        map_batches, small batches (binary rows)
      → LangIdScorer                            ACTOR POOL (model shipped once via ray.put)
      → PerplexityScorer                        ACTOR POOL
      → PiiScrubber                             stateless map_batches (RE2 kernels)
      → mark_dup_losers                         broadcast loser-set lookup (no row shuffle)
      → finalize_decision                       stateless map_batches

The ONLY wide operation is the phash-dedup aggregation, and it never
moves image bytes: a separate column-pruned scan of (phash, image_id)
is pre-combined per batch (one row per phash per batch — this bounds a
hot phash's group to ≤ #blocks, the combiner playing the role of salted
two-phase groupby), then ``groupby(phash)`` over the tiny combined rows
(reference analogue: dedup is a *(doc claim)* at ``CLAUDE.md:27``; the
groupby-keep-first shape is SURVEY.md §2.7/A10).

Scale notes (100 TB):
- The loser set broadcast holds only ids of rows that LOSE a dup group
  (≈ dup fraction × N). When that outgrows driver memory, switch
  ``mark_dup_losers`` to the bucketed-join variant in
  ``pipelines.dedup.semi_join_filter`` (same decision, hash-bucketed).
- Image bytes never enter a shuffle; caption stages are Arrow
  zero-copy; models ship once per actor.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..fixtures.images import seed_corpus
from ..stages.image_stages import DecodeImageStage
from ..stages.langid import LangIdScorer, train_langid_model
from ..stages.perplexity import PerplexityScorer, train_char_lm
from ..stages.rules import HeuristicRules, QualityConfig, finalize_decision
from ..stages.scrub import PiiScrubber

OUTPUT_COLS = [
    "image_id", "keep", "drop_reason", "caption_scrubbed",
    "lang_pred", "lang_score", "ppl", "pii_hits", "phash",
]


def _parquet_rows(path: str) -> int:
    """Total rows from parquet footers (metadata only, no data read)."""
    import os

    import pyarrow.parquet as pq

    total = 0
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.read_metadata(os.path.join(root, f)).num_rows
    else:
        total = pq.read_metadata(path).num_rows
    return total


def _ray_cpus() -> int:
    """CPUs of the current Ray cluster (NOT os.cpu_count(), which
    ignores ray.init(num_cpus=...))."""
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        import os
        return os.cpu_count() or 8


def build_models(seed: int = 42) -> tuple[dict, dict]:
    """Deterministic langid + perplexity models from the seeded corpus
    (the 'model artifacts' an actor would otherwise load from disk)."""
    texts, labels = seed_corpus(seed=seed)
    langid = train_langid_model(texts, labels)
    ppl = train_char_lm(texts)
    return langid, ppl


class _DupCombiner:
    """Per-batch pre-aggregation for dedup: one (phash, winner, cnt) row
    per distinct phash per batch — the combiner that defuses hot keys."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = batch.group_by("phash").aggregate(
            [("image_id", "min"), ("phash", "count")]
        )
        return g.rename_columns(["phash", "winner", "cnt"])


def phash_dup_losers(proj_ds: "rd.Dataset", mode: str = "driver") -> dict[int, str]:
    """phash → winning image_id for every phash with count > 1.

    proj_ds must contain exactly (phash, image_id) — the caller does a
    column-pruned read so bytes never flow through this aggregation.

    modes (the per-batch combiner runs in both — one row per phash per
    batch, bounding a hot key's contribution to ≤ #blocks):
    - "driver": stream the combined rows to the driver and merge dicts.
      O(#distinct phash) driver memory — the fast path while the key
      space fits one machine (it does for the sandbox benches).
    - "shuffle": ``groupby(phash)`` over the combined rows (coalesced
      first: Ray's sort-shuffle cost grows with input block count).
      The 100 TB path — only (phash, winner, cnt) rows ever shuffle.
    """
    combined = proj_ds.map_batches(
        _DupCombiner(), batch_format="pyarrow", batch_size=65536,
        zero_copy_batch=True,
    )
    if mode == "shuffle":
        agg = combined.repartition(64).groupby("phash").aggregate(
            Min("winner", alias_name="winner"),
            Sum("cnt", alias_name="cnt"),
        )
        dup = agg.filter(expr="cnt > 1")
        out: dict[int, str] = {}
        for b in dup.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for ph, w in zip(b["phash"].to_pylist(), b["winner"].to_pylist()):
                out[ph] = w
        return out
    import numpy as np
    import pandas as pd

    # driver merge, fully vectorized on the int64 key. A naive groupby
    # over the STRING winner column is pathological (~1 object-min per
    # distinct key); instead: (1) int64 count-sum to find the few
    # duplicated keys, (2) resolve winners only for those rows.
    ph_l, w_l, c_l = [], [], []
    for b in combined.iter_batches(batch_size=262144, batch_format="pyarrow"):
        ph_l.append(b["phash"].to_numpy(zero_copy_only=False))
        w_l.append(b["winner"])
        c_l.append(b["cnt"].to_numpy(zero_copy_only=False))
    if not ph_l:
        return {}
    ph = np.concatenate(ph_l)
    cnt = np.concatenate(c_l)
    totals = pd.Series(cnt).groupby(pd.Series(ph), sort=False).sum()
    dup_keys = totals.index.to_numpy()[totals.to_numpy() > 1]
    if len(dup_keys) == 0:
        return {}
    dup_sorted = np.sort(dup_keys)
    idx = np.clip(np.searchsorted(dup_sorted, ph), 0, len(dup_sorted) - 1)
    mask = dup_sorted[idx] == ph
    import pyarrow as _pa
    winners_all = _pa.concat_arrays(
        [w.combine_chunks() if isinstance(w, _pa.ChunkedArray) else w
         for w in w_l])
    sub_w = np.asarray(winners_all.filter(_pa.array(mask)).to_pylist(),
                       dtype=object)
    sub_ph = ph[mask]
    g = pd.Series(sub_w).groupby(pd.Series(sub_ph), sort=False).min()
    return dict(zip(g.index.to_numpy(), g.to_numpy()))


class _MarkDupStage:
    """Broadcast-lookup stage: rule_phash_dup = (phash in dup set) and
    (image_id != winner). The dup map ships to each worker once as an
    ObjectRef."""

    def __init__(self, dup_ref):
        if "ObjectRef" in type(dup_ref).__name__:
            self.dup = ray.get(dup_ref)
        else:
            self.dup = dup_ref
        import numpy as np
        self.keys = np.fromiter(self.dup.keys(), dtype=np.int64, count=len(self.dup))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        ph = batch["phash"].to_numpy(zero_copy_only=False)
        cand = np.isin(ph, self.keys)
        mask = np.zeros(len(batch), dtype=bool)
        if cand.any():
            ids = batch["image_id"].to_pylist()
            for i in np.nonzero(cand)[0]:
                mask[i] = ids[i] != self.dup[int(ph[i])]
        return batch.append_column("rule_phash_dup", pa.array(mask))


class QualityFusedStage:
    """The whole per-row pipeline as ONE actor-pool stage.

    All sub-stages are CPU-bound per-batch transforms with shared-
    nothing state, so fusing them into a single actor eliminates two
    extra pool spin-ups and two inter-stage block handoffs — on a
    32-CPU node that was the dominant cost (the kernels themselves are
    ~0.25 ms/row). Models are fetched from the object store ONCE per
    actor in ``__init__`` (the actor-pool pattern the north rule names);
    the wide dedup decision arrives as a broadcast loser map.
    """

    def __init__(self, cfg: QualityConfig, langid_ref, ppl_ref,
                 dup_ref=None, decode: bool = True, keep_bytes: bool = False):
        self.rules = HeuristicRules(cfg)
        self.decode = DecodeImageStage() if decode else None
        self.langid = LangIdScorer(langid_ref, min_score=cfg.langid_min_score)
        self.ppl = PerplexityScorer(ppl_ref, max_ppl=cfg.max_perplexity)
        self.scrub = PiiScrubber()
        self.markdup = _MarkDupStage(dup_ref) if dup_ref is not None else None
        self.keep_bytes = keep_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.rules(batch)
        if self.decode is not None:
            out = self.decode(out)
        # drop the image payload as soon as decode is done: labels flow
        # on without round-tripping megabytes per row through the object
        # store (keep_bytes=True for pass-through sinks)
        if not self.keep_bytes and "bytes" in out.column_names:
            out = out.drop_columns(["bytes"])
        out = self.langid(out)
        out = self.ppl(out)
        out = self.scrub(out)
        if self.markdup is not None:
            out = self.markdup(out)
        return finalize_decision(out)


def quality_pipeline(
    ds: "rd.Dataset",
    dup_map: dict[int, str] | None,
    cfg: QualityConfig | None = None,
    langid_model: dict | None = None,
    ppl_model: dict | None = None,
    decode: bool = True,
    select_output: bool = True,
    model_concurrency: int | tuple | None = None,
    batch_size: int | None = None,
    keep_bytes: bool = False,
) -> "rd.Dataset":
    """Assemble the flagship pipeline over an input Dataset (one fused
    actor-pool stage; see QualityFusedStage)."""
    cfg = cfg or QualityConfig()
    if langid_model is None or ppl_model is None:
        lm, pm = build_models()
        langid_model = langid_model or lm
        ppl_model = ppl_model or pm
    if model_concurrency is None:
        # fixed pool sized from the RAY cluster, not os.cpu_count() —
        # they differ under ray.init(num_cpus=N), and a fixed pool
        # larger than the cluster deadlocks. Fixed beats (1, N)
        # autoscaling here: the autoscaler settles near ~1/3 width on
        # short jobs, leaving most CPUs idle.
        # ~3/4 of the cluster for the model stage, the rest for the
        # read/split/consume stages — a pool that takes every CPU
        # starves its own input and idles
        model_concurrency = max(2, int(_ray_cpus() * 0.75))

    kwargs = {
        "cfg": cfg,
        "langid_ref": ray.put(langid_model),
        "ppl_ref": ray.put(ppl_model),
        "decode": decode,
        "keep_bytes": keep_bytes,
    }
    if dup_map is not None:
        kwargs["dup_ref"] = ray.put(dup_map)
    out = ds.map_batches(
        QualityFusedStage,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=model_concurrency, zero_copy_batch=True,
    )
    if select_output:
        out = out.select_columns(OUTPUT_COLS)
    return out


def images_quality_pipeline(
    input_path: str,
    cfg: QualityConfig | None = None,
    decode: bool = True,
    dup_map: dict[int, str] | None = None,
    **kw,
) -> "rd.Dataset":
    """End-to-end over a parquet images table: the dedup aggregation
    reads ONLY (phash, image_id) via a pruned scan; the main pass reads
    the full rows. Two scans of a columnar source beat shuffling bytes.

    override_num_blocks: with the default 128 MiB target block size a
    medium input yields a handful of blocks, and blocks — not batches —
    are the unit of task parallelism, so the actor pool would idle.
    ~4 blocks per CPU keeps every actor fed (and on a real cluster,
    every node), while a ~4k-row ceiling per block bounds per-actor
    transient memory (decode buffers + the hashed-ngram count matrix) —
    oversized blocks OOM-killed the raylet at millions of rows."""
    cfg = cfg or QualityConfig()
    nrows = _parquet_rows(input_path)
    # ~16k rows/block (A/B-tuned): large enough to amortize per-task
    # round-trips, small enough that per-actor transients stay bounded
    # now that the langid scorer sub-chunks its count matrix
    nblocks = int(min(max(4 * _ray_cpus(), nrows // 16384 + 1), 4096))
    if dup_map is None:
        proj = rd.read_parquet(input_path, columns=[cfg.dedup_key, cfg.id_col])
        dup_map = phash_dup_losers(proj)
    ds = rd.read_parquet(input_path, override_num_blocks=nblocks)
    return quality_pipeline(ds, dup_map, cfg, decode=decode, **kw)


def pipeline_metrics(executed_ds: "rd.Dataset") -> dict:
    """Per-stage throughput metrics from Ray Data's own stats (north
    rule: 'per-stage throughput metrics'). Call AFTER consuming the
    dataset; returns {operator: {wall_s, cpu_s, rows_out}}."""
    import re

    stats = executed_ds.stats()
    out: dict[str, dict] = {}
    for block in stats.split("Operator ")[1:]:
        header = block.split("\n", 1)[0]
        name = header.split(":", 1)[0].strip()
        m_wall = re.search(r"Remote wall time: .*?, ([0-9.]+)(ms|s|us) total", block)
        m_rows = re.search(r"Output num rows per block: .*?, ([0-9]+) total", block)
        mult = {"s": 1.0, "ms": 1e-3, "us": 1e-6}
        out[name] = {
            "wall_s": float(m_wall.group(1)) * mult[m_wall.group(2)] if m_wall else None,
            "rows_out": int(m_rows.group(1)) if m_rows else None,
        }
    return out


def lineage_summary(out_ds: "rd.Dataset") -> pa.Table:
    """Per-rule drop counts + keep count (the A9-style rollup): tiny
    groupby over the label column only."""
    agg = (
        out_ds.select_columns(["drop_reason"])
        .groupby("drop_reason")
        .count()
    )
    t = pa.Table.from_pandas(agg.to_pandas())
    return t.rename_columns(["drop_reason", "n"])
