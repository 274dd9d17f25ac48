"""PII / toxicity scrubbing — compiled-regex rewrite of the caption
column, vectorized with ``pc.replace_substring_regex`` (RE2, the same
regex engine DuckDB uses, so the SQL oracle reproduces the output
byte-for-byte).

Reference analogue: the trim normalizer M1
(``adaptive_streaming_engine.go:205``) is the reference's only
value-rewriting op; this stage generalizes it to an ordered list of
compiled patterns. Pattern ORDER is part of the spec (SSN before PHONE,
URL before EMAIL) and is mirrored exactly in ``oracle_sql`` /
the pytest golden oracle.

All patterns are RE2-safe: no lookaround, no backreferences; the
toxicity list uses inline ``(?i)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Fake profanity denylist (deterministic fixture vocabulary).
TOXICITY_WORDS = ("frak", "gorram", "smeg", "dreck", "felgercarb")

# (name, pattern, replacement) — applied IN ORDER.
SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("toxicity", r"(?i)\b(" + "|".join(TOXICITY_WORDS) + r")\b", "<TOX>"),
)


def scrub_sql_expr(col: str) -> str:
    """The DuckDB expression computing the identical scrub — nested
    regexp_replace in the same pattern order (global flag)."""
    expr = col
    for _, pat, repl in SCRUB_PATTERNS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


class PiiScrubber:
    """Actor-pool (or stateless) stage: adds ``caption_scrubbed`` +
    ``pii_hits`` (total replacements, for lineage counters). Patterns
    are conceptually 'compiled once per actor'; with Arrow the compiled
    form lives in the RE2 cache keyed by pattern string."""

    def __init__(self, text_col: str = "caption_trimmed",
                 out_col: str = "caption_scrubbed"):
        self.text_col = text_col
        self.out_col = out_col
        self.patterns = SCRUB_PATTERNS
        # one alternation of every pattern: a single RE2 pass gates the
        # 2-passes-per-pattern scrub loop to the rows that actually
        # contain PII (~10 % on the fixture) — same outputs, ~3x less
        # regex work per batch
        self.any_pattern = "|".join(f"(?:{p})" for _, p, _ in SCRUB_PATTERNS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        col = pc.fill_null(batch[self.text_col], "")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        any_hit = pc.match_substring_regex(col, self.any_pattern)
        anynp = np.asarray(any_hit, dtype=bool)
        n = len(col)
        if not anynp.any():
            out = batch.append_column(self.out_col, col)
            return out.append_column(
                "pii_hits", pa.array(np.zeros(n, dtype=np.int64)))
        sub = col.filter(any_hit)
        hits_sub = None
        for _, pat, repl in self.patterns:
            c = pc.count_substring_regex(sub, pat)
            hits_sub = c if hits_sub is None else pc.add(hits_sub, c)
            sub = pc.replace_substring_regex(sub, pat, repl)
        # scatter the scrubbed subset back: null indices for untouched
        # rows -> take yields null -> coalesce falls through to the
        # original string (no per-row Python, no garbage copies)
        inv = np.cumsum(anynp, dtype=np.int64) - 1
        idx = pa.array(inv, mask=~anynp)
        scrubbed = pc.coalesce(sub.take(idx), col)
        hits = np.zeros(n, dtype=np.int64)
        hits[anynp] = np.asarray(hits_sub.cast(pa.int64()))
        out = batch.append_column(self.out_col, scrubbed)
        return out.append_column("pii_hits", pa.array(hits))


def scrub_python(text: str) -> tuple[str, int]:
    """Single-string twin of PiiScrubber (golden-oracle use in tests)."""
    import re

    hits = 0
    for _, pat, repl in SCRUB_PATTERNS:
        hits += len(re.findall(pat, text))
        text = re.sub(pat, repl, text)
    return text, hits
