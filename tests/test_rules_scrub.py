"""Heuristic rules + PII/toxicity scrub semantics."""

import duckdb
import pyarrow as pa

from dataquality_cli_ray.stages.rules import (
    HeuristicRules,
    QualityConfig,
    finalize_decision,
    rule_hit_counts,
)
from dataquality_cli_ray.stages.scrub import (
    PiiScrubber,
    SCRUB_PATTERNS,
    scrub_python,
    scrub_sql_expr,
)


def _run_rules(captions, fmts=None, cfg=None):
    cfg = cfg or QualityConfig()
    cols = {"caption": captions}
    if fmts is not None:
        cols["fmt"] = fmts
    out = HeuristicRules(cfg)(pa.table(cols))
    return finalize_decision(out)


def test_null_blank_rule():
    out = _run_rules([None, "", "   ", "\t\n", "ok caption here"])
    reasons = out["drop_reason"].to_pylist()
    assert reasons[:4] == ["null_blank"] * 4
    assert reasons[4] is None and out["keep"][4].as_py()


def test_length_bounds():
    cfg = QualityConfig(min_len=3, max_len=10)
    out = _run_rules(["ab", "abc", "a" * 11, "  abc  "], cfg=cfg)
    assert out["drop_reason"].to_pylist() == [
        "length_bounds", None, "length_bounds", None]


def test_char_class():
    out = _run_rules([
        "!!!! ???? ####",          # low alpha
        "123 456 789 012",         # digit heavy
        "normal words here",
    ])
    r = out["drop_reason"].to_pylist()
    assert r[0] == "char_class" and r[1] == "char_class" and r[2] is None


def test_fmt_whitelist():
    out = _run_rules(["fine caption", "fine caption", "fine caption"],
                     fmts=["jpeg", "bmp", None])
    assert out["drop_reason"].to_pylist() == [None, "fmt_whitelist",
                                              "fmt_whitelist"]


def test_first_violation_wins():
    # blank caption AND bad fmt → null_blank (earlier in RULE_ORDER)
    out = _run_rules([""], fmts=["bmp"])
    assert out["drop_reason"].to_pylist() == ["null_blank"]


def test_rule_hit_counts():
    out = HeuristicRules(QualityConfig())(
        pa.table({"caption": ["", "ok words", "1234 5678 999"]}))
    hits = rule_hit_counts(out)
    assert hits["null_blank"] == 1 and hits["char_class"] == 1


def test_scrub_patterns():
    cases = [
        ("mail me at jane.doe@example.com ok", "<EMAIL>"),
        ("visit https://x.example/a?b=1 now", "<URL>"),
        ("ssn 078-05-1120 hidden", "<SSN>"),
        ("host 10.0.0.1 up", "<IP>"),
        ("call 415-555-0132 now", "<PHONE>"),
        ("what a FRAK day", "<TOX>"),
    ]
    scr = PiiScrubber(text_col="t")
    out = scr(pa.table({"t": [c for c, _ in cases]}))
    for i, (_, token) in enumerate(cases):
        assert token in out["caption_scrubbed"][i].as_py(), cases[i]
        assert out["pii_hits"][i].as_py() >= 1


def test_scrub_order_ssn_before_phone():
    # an SSN must become <SSN>, not be half-eaten by the phone pattern
    s, _ = scrub_python("ssn 078-05-1120 end")
    assert "<SSN>" in s and "<PHONE>" not in s


def test_scrub_arrow_matches_python():
    texts = [
        "a@b.co and 192.168.0.1 and frak",
        "nothing to scrub here",
        "  padded  415-555-0132  ",
        "https://e.com x@y.org 111-22-3333 gorram",
    ]
    scr = PiiScrubber(text_col="t")
    out = scr(pa.table({"t": texts}))
    for i, t in enumerate(texts):
        py, hits = scrub_python(t)
        assert out["caption_scrubbed"][i].as_py() == py
        assert out["pii_hits"][i].as_py() == hits


def test_scrub_matches_duckdb():
    """Arrow RE2 scrub == DuckDB RE2 scrub, byte for byte."""
    texts = ["a@b.co 10.0.0.1 frak smeg", "tel 415-555-0132 https://u.v/w"]
    scr = PiiScrubber(text_col="t")
    ours = [s.as_py() for s in scr(pa.table({"t": texts}))["caption_scrubbed"]]
    con = duckdb.connect()
    for t, mine in zip(texts, ours):
        got = con.execute(
            f"SELECT {scrub_sql_expr('t')} FROM (SELECT $${t}$$ AS t)"
        ).fetchone()[0]
        assert got == mine


def test_pattern_count():
    assert len(SCRUB_PATTERNS) == 6


def test_token_count_bpe_matches_scalar_twin():
    """The batched RE2 token counter equals the per-string Python
    regex twin (tokens_python) on edge inputs."""
    import pyarrow as pa

    from dataquality_cli_ray.functions.text import (
        token_count_bpe, tokens_python)

    texts = ["hello, world!", "", "  ", "a-b_c 12.5x", "日本語 words",
             "don't stop", "x" * 500]
    got = token_count_bpe(pa.array(texts)).to_pylist()
    want = [len(tokens_python(t)) for t in texts]
    assert got == want
