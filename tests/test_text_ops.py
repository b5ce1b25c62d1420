"""Direct unit tests for text-pipeline expressions whose corpus
exercise is trivial (the driver documents plant no PII), so the
oracle-differential gate alone would not prove the patterns work.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_pii_patterns_on_synthetic_text(spark):
    from logsdb_spark.plans.extensions import _EMAIL_RE, _IPV4_RE

    text = (
        "Contact ops@example.com or j.doe+x@sub.example.org; "
        "server 192.168.0.1 proxied via 10.0.0.255. No match: user@local, 1.2.3"
    )
    df = spark.createDataFrame([Row(text=text)])
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _IPV4_RE, "<IP>"
    )
    r = df.select(
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0))).alias("e"),
        F.size(F.regexp_extract_all("text", F.lit(_IPV4_RE), F.lit(0))).alias("i"),
        redacted.alias("red"),
    ).collect()[0]
    assert r.e == 2
    assert r.i == 2
    assert r.red == (
        "Contact <EMAIL> or <EMAIL>; "
        "server <IP> proxied via <IP>. No match: user@local, 1.2.3"
    )


def test_pii_patterns_agree_with_duckdb_on_synthetic_text(spark):
    """The real differential: same synthetic text through both engines'
    regex implementations (Java regex vs RE2) must redact identically."""
    import duckdb

    from logsdb_spark.plans.extensions import _EMAIL_RE, _IPV4_RE

    text = (
        "a@b.co, weird.-name@x.org 999.999.999.999 "
        "0.0.0.0 trailing a@b.comma"
    )
    df = spark.createDataFrame([Row(text=text)])
    spark_red = df.select(
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _IPV4_RE, "<IP>"
        ).alias("red")
    ).collect()[0].red
    duck_red = duckdb.sql(
        f"""SELECT regexp_replace(regexp_replace('{text}', '{_EMAIL_RE}',
        '<EMAIL>', 'g'), '{_IPV4_RE}', '<IP>', 'g')"""
    ).fetchone()[0]
    assert spark_red == duck_red


def test_doc_chunk_windows_empty_text_yields_no_chunks(spark):
    """Empty documents chunk to nothing (and must not crash Spark's
    sequence(), which throws on a 1-to-0 ascending range — unlike
    DuckDB's generate_series, which just returns no rows)."""
    import logsdb_spark.plans.extensions as ext
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, ""), (2, "abc")], "doc_id long, text string"
    )
    out = (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text"), F.lit(150))).alias(
                "start"
            ),
        )
        .collect()
    )
    assert [r.doc_id for r in out] == [2]


def test_bigram_lm_matches_python_and_tracks_perplexity(spark):
    """quality_bigram_lm's integer surrogate must equal a pure-Python
    recompute of the same add-one-smoothed bigram model EXACTLY, and
    the real log2-perplexity computed from those counts must move
    opposite to the surrogate (higher avg probability <-> lower
    perplexity) on the fixture corpus."""
    import math
    from collections import Counter

    from conftest import SF_DIR
    from logsdb_spark.plans.extensions import quality_bigram_lm

    got = {
        r.doc_id: (r.n_bigrams, r.sum_p_e9, r.avg_p_e9)
        for r in quality_bigram_lm(spark, SF_DIR).collect()
    }

    from logsdb_spark.catalog import load_table

    texts = {
        r.doc_id: " ".join(str(r.text).lower().strip().split())
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    toks = {d: t.split(" ") for d, t in texts.items()}
    ug = Counter(w for t in toks.values() for w in t)
    bg = Counter(
        (t[i], t[i + 1]) for t in toks.values() for i in range(len(t) - 1)
    )
    vocab = len(ug)

    ppl = {}
    for d, t in toks.items():
        if len(t) < 2:
            assert got[d] == (0, 0, None), d
            continue
        pis = [
            (1_000_000_000 * (bg[(t[i], t[i + 1])] + 1)) // (ug[t[i]] + vocab)
            for i in range(len(t) - 1)
        ]
        want = (len(pis), sum(pis), sum(pis) // len(pis))
        assert got[d] == want, (d, got[d], want)
        logp = [
            math.log2((bg[(t[i], t[i + 1])] + 1) / (ug[t[i]] + vocab))
            for i in range(len(t) - 1)
        ]
        ppl[d] = 2 ** (-sum(logp) / len(logp))

    # real perplexity must anti-correlate with the gated surrogate:
    # compare the mean perplexity of the top vs bottom surrogate half
    ranked = sorted(ppl, key=lambda d: got[d][2])
    lo, hi = ranked[: len(ranked) // 3], ranked[-len(ranked) // 3:]
    assert sum(ppl[d] for d in hi) / len(hi) < sum(ppl[d] for d in lo) / len(lo)


def test_mixture_temperature_flattens_toward_uniform(spark):
    """Temperature scaling at alpha=0.3 must FLATTEN the language
    mixture: shares sum to 1, every tail language is upsampled
    (share > p), every head language is downsampled (share < p),
    and the ranking by share matches the ranking by raw mass (the
    tempering is monotone)."""
    from conftest import SF_DIR

    from logsdb_spark.plans.extensions import mixture_temperature_weights

    rows = mixture_temperature_weights(spark, SF_DIR).collect()
    assert len(rows) >= 2
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    uniform = 1.0 / len(rows)
    for r in rows:
        assert r.weight == pytest.approx(r.p ** 0.3, rel=1e-12)
        if r.p < uniform:
            assert r.share > r.p, r
        elif r.p > uniform:
            assert r.share < r.p, r
    by_p = sorted(rows, key=lambda r: r.p)
    by_share = sorted(rows, key=lambda r: r.share)
    assert [r.lang for r in by_p] == [r.lang for r in by_share]
