"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in ``dataquality_cli_ray``) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline smoke: quality-filter + scrub + dedup over the
    sf0.001 documents table (text mode of the image+caption pipeline)."""
    import ray.data as rd

    from dataquality_cli_ray.pipelines.quality import quality_pipeline
    from dataquality_cli_ray.pipelines.textqa import train_langid_on_dataset
    from dataquality_cli_ray.stages.perplexity import train_char_lm
    from dataquality_cli_ray.stages.rules import QualityConfig

    sf_dir = "/root/testdata/sf0.001"
    cfg = QualityConfig(caption_col="text", check_fmt=False,
                        dedup_key="text_hash", id_col="doc_id")
    full = rd.read_parquet(f"{sf_dir}/documents.parquet")
    # models trained on the corpus itself (distributed partial counts)
    langid_model = train_langid_on_dataset(full, "text", "lang")
    sample = [r["text"] for r in full.take(200)]
    ppl_model = train_char_lm(sample)
    ds = full.select_columns(["doc_id", "text"])
    out = quality_pipeline(ds, dup_map=None, cfg=cfg,
                           langid_model=langid_model, ppl_model=ppl_model,
                           decode=False, select_output=False)
    return out.select_columns(
        ["doc_id", "keep", "drop_reason", "caption_scrubbed",
         "lang_pred", "lang_score", "ppl", "pii_hits"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from dataquality_cli_ray.entrypoints import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from dataquality_cli_ray.entrypoints import build_oracles

    return build_oracles()
