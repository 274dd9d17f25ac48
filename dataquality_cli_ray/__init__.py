"""dataquality_cli_ray — a Ray-Data-native data-quality / quality-filter engine.

A from-scratch reimplementation of the capabilities of
``peekknuf/DataQuality-CLI`` (see ``SURVEY.md``), re-expressed as
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- ``pipelines.profiler``  — the reference's ``describe`` semantics
  (per-column count/null/mean/std/min/max/quantiles/unique/top-freq,
  cf. reference ``internal/engine/simple_engine.go:25-40``) as
  map_batches partials merged exactly.
- ``pipelines.quality``   — the flagship language-ID + quality-filter +
  PII/toxicity-scrub pipeline over image+caption tables
  (``BASELINE.json`` north rule).
- ``pipelines.dedup``     — exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding-cosine duplicate detection.
- ``pipelines.similarity``— brute-force and LSH-bucketed ANN over an
  embedding column.
- ``pipelines.textqa``    — language-ID, quality scoring, token counts,
  document fingerprinting over text tables.

No module in this package calls ``ray.init``/``ray.shutdown`` — the
driver (or ``bench.py`` / the pytest session fixture) owns the session.
"""

__version__ = "0.1.0"
