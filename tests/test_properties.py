"""Property-based tests (SURVEY §5 — the reference has none; hypothesis
generates the adversarial inputs a hand-written corpus misses).

Spark jobs are expensive per-example, so every property runs on LISTS:
hypothesis generates a batch, one Spark job evaluates all of it.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from logsdb_spark.functions.scalars import longint
from logsdb_spark.sources.apache_access import parse_apache_lines
from logsdb_spark.sources.authfail import parse_authfail_lines

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _reference_longint(n: int) -> str:
    """Verbatim re-implementation of reference core.py:51-57."""
    ns = str(n)
    nl = len(ns)
    triples = [ns[i : i + 3] for i in range(nl % 3, nl, 3)]
    if nl % 3:
        triples = [ns[: nl % 3]] + triples
    return " ".join(triples)


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50))
@settings(**SETTINGS)
def test_longint_matches_reference(spark, values):
    df = spark.createDataFrame([Row(n=v) for v in values])
    got = {r.n: r.s for r in df.select("n", longint("n").alias("s")).collect()}
    for v in values:
        assert got[v] == _reference_longint(v)


# Apache tail strings ride inside a JSON-ish literal list (reference
# parses it with ast.literal_eval, we parse with from_json): quotes,
# backslashes and control chars don't survive EITHER parser — exclude
# them, as Apache's own escaping would. Pipes would split the line.
_tail_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), blacklist_characters='"\\|'
    ),
    min_size=0,
    max_size=30,
)

_apache_fields = st.tuples(
    st.integers(0, 2**31 - 1),  # port
    st.integers(0, 2**40),      # bytesin
    st.integers(0, 2**40),      # bytesout
    st.integers(0, 2**40),      # microsecs
    st.integers(100, 599),      # status
    _tail_text,                 # authuser
    _tail_text,                 # reqline
    _tail_text,                 # user_agent
)


@given(st.lists(_apache_fields, min_size=1, max_size=25))
@settings(**SETTINGS)
def test_apache_parse_roundtrip(spark, field_rows):
    """Build log lines exactly as Apache would (including the latin-1
    mangling of utf-8 header bytes — reference reencode,
    apache_access.py:146-147), parse, and demand every field back."""
    ts = datetime(2026, 8, 12, 10, 0, 0, tzinfo=timezone.utc)

    def mangle(s: str) -> str:
        return s.encode("utf-8").decode("iso-8859-1")

    lines, want = [], []
    for i, (port, bin_, bout, micro, status, authuser, reqline, ua) in enumerate(
        field_rows
    ):
        t = ts + timedelta(seconds=i)
        tail = ", ".join(
            f'"{mangle(s)}"'
            for s in (authuser, reqline, "GET", "/x", "HTTP/1.1", "-", ua)
        )
        lines.append(
            f"{t:%Y-%m-%d %H:%M:%S +0000}|host.example|{port}|198.51.100.7|"
            f"{bin_}|{bout}|{micro}|{status}|[{tail}]"
        )
        want.append((port, bin_, bout, micro, status, authuser, reqline, ua))

    parsed = parse_apache_lines(spark.createDataFrame([Row(value=ln) for ln in lines]))
    assert parsed.filter("_corrupt").count() == 0
    got = [
        (r.port, r.bytesin, r.bytesout, r.microsecs, r.status, r.authuser,
         r.reqline, r.user_agent)
        for r in parsed.orderBy("timestamp").collect()
    ]
    assert got == want


_username = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=16,
)
_ip = st.tuples(*[st.integers(1, 254)] * 4).map(lambda t: ".".join(map(str, t)))


@given(
    st.lists(
        st.tuples(_username, _ip, st.booleans(), st.booleans()),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_authfail_parse_roundtrip(spark, rows):
    """Both reference regex shapes (authfail.py:48-62), with and without
    the 'invalid user' marker, must yield (username, src_addr) back."""
    lines, want = [], []
    for i, (user, ip, invalid_user, second_shape) in enumerate(rows):
        ts = f"2026-08-12T14:03:{i % 60:02d}+00:00"
        if second_shape:
            lines.append(f"{ts} host sshd[7]: Invalid user {user} from {ip} port 4242")
        else:
            marker = "invalid user " if invalid_user else ""
            lines.append(
                f"{ts} host sshd[7]: Failed password for {marker}{user} "
                f"from {ip} port 4242 ssh2"
            )
        want.append((user, ip))

    parsed = parse_authfail_lines(
        spark.createDataFrame([Row(value=ln) for ln in lines])
    )
    assert parsed.filter("_corrupt").count() == 0
    got = [(r.username, r.src_addr) for r in parsed.collect()]
    assert sorted(got) == sorted(want)


_ts_strategy = st.integers(min_value=0, max_value=100_000)
_asof_events = st.tuples(
    # left: (key, ts) pairs; right: (key, ts, payload) triples — tiny key
    # space on purpose, to force same-key collisions and ties
    st.lists(
        st.tuples(st.integers(0, 3), _ts_strategy), min_size=1, max_size=30
    ),
    st.lists(
        st.tuples(st.integers(0, 3), _ts_strategy, st.integers(-1000, 1000)),
        min_size=0,
        max_size=30,
    ),
)


@given(_asof_events)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, data):
    """operators/temporal.asof_join vs pandas.merge_asof (an
    independent reference implementation): backward inclusive match on
    the latest right row per key. Right-side (key, ts) duplicates are
    collapsed to the max payload first — both implementations then
    have a unique answer, so the property is exact."""
    import pandas as pd

    from logsdb_spark.operators.temporal import asof_join

    left_rows, right_rows = data
    left_pdf = pd.DataFrame(
        [(i, k, pd.Timestamp(t, unit="s")) for i, (k, t) in enumerate(left_rows)],
        columns=["lid", "k", "lts"],
    )
    right_pdf = (
        pd.DataFrame(
            [(k, pd.Timestamp(t, unit="s"), p) for k, t, p in right_rows],
            columns=["k", "rts", "pay"],
        )
        .groupby(["k", "rts"], as_index=False)["pay"]
        .max()
        .astype({"k": "int64", "rts": "datetime64[ns]", "pay": "int64"})
    )

    left = spark.createDataFrame(left_pdf)
    right = (
        spark.createDataFrame(right_pdf)
        if len(right_pdf)
        else spark.createDataFrame([], "k long, rts timestamp, pay long")
    )
    got = {
        r["lid"]: r["pay"]
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts", payload=["pay"]
        ).collect()
    }

    want_pdf = pd.merge_asof(
        left_pdf.sort_values(["lts", "lid"]),
        right_pdf.sort_values("rts"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    want = {
        int(r.lid): (None if pd.isna(r.pay) else int(r.pay))
        for r in want_pdf.itertuples()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation must agree with a plain
    union-find on arbitrary random graphs (chains, cycles, forests)."""
    from logsdb_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {node: find(node) for node in parent}

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {r.doc_id: r.cluster for r in connected_components(pairs).collect()}
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 10**6)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    )
)
@settings(**SETTINGS)
def test_global_row_number_matches_sorted_enumerate(spark, rows):
    """Range-partitioned ranking must equal plain sorted enumeration for
    arbitrary (key, unique-tiebreaker) data, including heavy ties on
    the leading key and single-row inputs."""
    from pyspark.sql import functions as F

    from logsdb_spark.operators.ordering import global_row_number

    df = spark.createDataFrame(rows, "k long, tb long")
    got = {
        r.tb: r.rn
        for r in global_row_number(
            df, [F.asc("k"), F.asc("tb")], rn_alias="rn", num_partitions=4
        ).collect()
    }
    want = {
        tb: i + 1
        for i, (k, tb) in enumerate(sorted(rows, key=lambda t: (t[0], t[1])))
    }
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user/type bucket
            st.integers(min_value=0, max_value=10**6),  # ts offset seconds
            st.integers(min_value=1, max_value=10**6),  # value in 1e-4 units
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_ohlc_aggregate_matches_window_reference(spark, rows):
    """daily_ohlc_bars' aggregate form (min_by/max_by on a composite
    string key) must equal the obvious-but-shuffle-heavy reference
    plan: row_number over (ts, event_id) picking first/last per group.
    Duplicate timestamps are generated on purpose — the event_id
    tie-break is what the property pins."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    data = [
        Row(
            event_id=i,
            ts=datetime(2024, 1, 1, tzinfo=timezone.utc)
            + timedelta(seconds=off % 7200),  # force ts collisions
            event_type=f"t{b}",
            value=v / 10000.0,
        )
        for i, (b, off, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data)
    key = F.format_string(
        "%020d|%012d", F.unix_micros(F.col("ts")), F.col("event_id")
    )
    got = {
        (str(r.day), r.event_type): (r.open, r.high, r.low, r.close, r.n)
        for r in df.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    w = Window.partitionBy(F.to_date("ts"), "event_type").orderBy(
        "ts", "event_id"
    )
    ref = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("rlast", F.row_number().over(
            Window.partitionBy(F.to_date("ts"), "event_type").orderBy(
                F.desc("ts"), F.desc("event_id")
            )
        ))
    )
    want = {}
    for r in (
        ref.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.min_by("value", "rn").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.min_by("value", "rlast").alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    ):
        want[(str(r.day), r.event_type)] = (r.open, r.high, r.low, r.close, r.n)
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # source bucket
            st.integers(min_value=1, max_value=40),  # token count
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_mixture_budget_fill_matches_python_reference(spark, rows):
    """The token-budget fill (hash-ordered cumulative sum capped at a
    per-source budget) must match a straightforward Python fold —
    pinning the window frame, the ordering key, and the integer budget
    arithmetic the registered mixture query relies on."""
    import hashlib

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def phash(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)

    pct = {0: 90, 1: 50, 2: 20}
    data = [
        Row(doc_id=i, source=f"s{b}", n_tokens=t)
        for i, (b, t) in enumerate(rows)
    ]

    # Python reference: per-source budget, fill in (hash, doc_id) order
    want = set()
    by_src: dict = {}
    for r in data:
        by_src.setdefault(r.source, []).append(r)
    for src, docs in by_src.items():
        avail = sum(d.n_tokens for d in docs)
        budget = avail * pct[int(src[1])] // 100
        cum = 0
        for d in sorted(docs, key=lambda d: (phash(d.doc_id), d.doc_id)):
            cum += d.n_tokens
            if cum <= budget:
                want.add(d.doc_id)

    from logsdb_spark.functions.text import portable_hash64

    df = spark.createDataFrame(data)
    t = df.withColumn(
        "h", portable_hash64(F.col("doc_id").cast("string"))
    )
    b = t.groupBy("source").agg(
        F.expr(
            "sum(n_tokens) * (CASE WHEN source = 's0' THEN 90"
            " WHEN source = 's1' THEN 50 ELSE 20 END) div 100"
        ).alias("budget")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        r.doc_id
        for r in t.join(F.broadcast(b), "source")
        .withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= F.col("budget"))
        .collect()
    }
    assert got == want


_doc_words = st.sampled_from([f"w{i}" for i in range(12)])
_doc_text = st.lists(_doc_words, min_size=1, max_size=30).map(" ".join)


@pytest.mark.slow
@given(st.lists(_doc_text, min_size=2, max_size=10))
@settings(**SETTINGS)
def test_containment_prefix_blocking_is_lossless(spark, texts):
    """The prefix-filter candidate generation must be EXACTLY lossless
    (the pigeonhole recall claim): containment_near_dups over random
    small-vocabulary corpora — the worst case for df-based prefixes —
    must equal the brute-force all-pairs containment built from the
    SAME shingle pipeline. Small vocab + short docs maximize shared
    shingles and duplicate sets, stressing the blocking, ties in the
    df ranking, and the <-n-token one-gram edge case."""
    from logsdb_spark.operators.dedup import containment_near_dups, shingle_sets
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        (r.id_a, r.id_b, r.c_ab, r.c_ba)
        for r in containment_near_dups(docs, threshold=0.8).collect()
    }
    sh = shingle_sets(docs, n=3).select(
        "doc_id",
        F.array_distinct(
            F.transform("shingles", lambda g: F.xxhash64(g))
        ).alias("shingles"),
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    brute = (
        sa.join(sb, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (inter / F.size("sh_a")).alias("rc_ab"),
            (inter / F.size("sh_b")).alias("rc_ba"),
        )
        .filter(F.greatest("rc_ab", "rc_ba") >= 0.8)
    )
    want = {
        (r.id_a, r.id_b, round(r.rc_ab, 4), round(r.rc_ba, 4))
        for r in brute.collect()
    }
    assert got == want


_contact_batches = st.lists(
    st.lists(
        st.sampled_from([f"u{i}@example.com" for i in range(8)]),
        min_size=1, max_size=4,
    ),
    min_size=1, max_size=4,
)


@given(batches=_contact_batches, rng=st.randoms())
@settings(**SETTINGS)
def test_txn_merge_converges_under_interference(spark, tmp_path_factory, batches, rng):
    """For ANY batch sequence, with a randomly injected stale commit
    before each merge (simulating a racing writer losing the version),
    the final committed dim is exactly the distinct union of all
    batches and versions advance one per successful merge — the
    optimistic protocol converges regardless of interference order."""
    import pytest

    from logsdb_spark.operators import txn

    path = str(tmp_path_factory.mktemp("txn") / "contacts")
    expected: set[str] = set()
    for i, emails in enumerate(batches):
        batch = spark.createDataFrame(
            [(e.split("@")[0].upper(), e) for e in emails],
            "realname string, email_address string",
        )
        if rng.random() < 0.5 and i > 0:
            # racing writer: blind commit against a stale version
            with pytest.raises(txn.ConcurrentWriteError):
                txn.commit_snapshot(batch, path, txn.current_version(path) - 1)
        v = txn.merge_contacts(spark, path, batch)
        assert v == i
        expected |= set(emails)
    rows = txn.read_snapshot(spark, path).collect()
    assert {r.email_address for r in rows} == expected
    assert len(rows) == len(expected), "duplicate contacts after merges"


_snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
    max_size=8,
)


@given(old=_snapshot, new=_snapshot)
@settings(**SETTINGS)
def test_snapshot_diff_matches_python_reference(spark, old, new):
    """snapshot_diff vs a direct Python diff on random snapshots with
    NULL payloads — exercising the presence-marker/null-safe-compare
    path: a null-propagating fingerprint (md5 of the raw value) must
    not turn a present-both-sides row into added/removed, and two NULL
    fingerprints must read unchanged."""
    from pyspark.sql import functions as F

    from logsdb_spark.operators.scale import snapshot_diff

    def frame(d):
        rows = [(k, v) for k, v in d.items()] or [(None, None)]
        df = spark.createDataFrame(rows, "k long, payload string")
        return df.filter(F.col("k").isNotNull())

    got = {
        (r.k, r.status)
        for r in snapshot_diff(frame(old), frame(new), "k",
                               F.md5(F.col("payload"))).collect()
    }
    want = set()
    for k in old.keys() | new.keys():
        if k not in old:
            want.add((k, "added"))
        elif k not in new:
            want.add((k, "removed"))
        elif old[k] != new[k]:
            want.add((k, "changed"))
        else:
            want.add((k, "unchanged"))
    assert got == want


_range_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),          # key
        st.integers(min_value=0, max_value=2000),       # left sec offset
    ),
    min_size=1, max_size=12,
)
_right_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=2000),
    ),
    min_size=0, max_size=12,
)


@given(lrows=_range_rows, rrows=_right_rows,
       range_s=st.sampled_from([1, 7, 600]))
@settings(**SETTINGS)
def test_range_count_join_matches_python_reference(spark, lrows, rrows, range_s):
    """Bucketed range-count join vs the direct O(n*m) Python count on
    random timestamps — stressing the 2-bucket explode logic at every
    alignment (offsets straddling, exactly on, and just off bucket
    borders; range widths 1 s and the 600 s default)."""
    from pyspark.sql import functions as F

    from logsdb_spark.operators.temporal import range_count_join

    base = 1_700_000_000
    left = spark.createDataFrame(
        [(i, k, base + s) for i, (k, s) in enumerate(lrows)],
        "eid long, k long, sec long",
    ).select("eid", "k", F.timestamp_seconds("sec").alias("ts"))
    right = spark.createDataFrame(
        [(k, base + s) for k, s in rrows] or [(None, None)],
        "k long, sec long",
    ).filter(F.col("k").isNotNull()).select(
        "k", F.timestamp_seconds("sec").alias("ts")
    )
    got = {
        (r.eid, r.n)
        for r in range_count_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            range_seconds=range_s, left_id="eid", count_alias="n",
        ).collect()
    }
    want = {
        (i, sum(1 for rk, rs in rrows if rk == k and s - range_s <= rs <= s))
        for i, (k, s) in enumerate(lrows)
    }
    assert got == want


_session_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user
        st.integers(min_value=0, max_value=7200),   # sec offset (ties likely)
    ),
    min_size=1, max_size=15,
)


@given(rows=_session_events)
@settings(**SETTINGS)
def test_sessionize_matches_python_reference(spark, rows):
    """sessionize (lag → boundary flag → running-sum id → agg) vs a
    direct Python pass over the same (ts, event_id)-ordered stream —
    random offsets make equal timestamps likely, exercising the
    event_id tiebreak, and the 0/30-min gap borders."""
    import datetime as dt

    from pyspark.sql import functions as F

    from logsdb_spark.operators.windows import sessionize

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, u, base + dt.timedelta(seconds=s), 1.0) for i, (u, s) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, gap_minutes=30).collect()
    }
    # python reference: per user, order by (ts, event_id), cut on gap > 30min
    want = set()
    per_user: dict[int, list] = {}
    for i, (u, s) in enumerate(rows):
        per_user.setdefault(u, []).append((base + dt.timedelta(seconds=s), i))
    for u, evs in per_user.items():
        evs.sort()
        sess: list[list] = []
        for ts, i in evs:
            if sess and (ts - sess[-1][-1][0]).total_seconds() <= 30 * 60:
                sess[-1].append((ts, i))
            else:
                sess.append([(ts, i)])
        for s_ in sess:
            want.add((u, s_[0][0], s_[-1][0], len(s_)))
    assert got == want


@given(
    blobs=st.lists(st.binary(min_size=0, max_size=256), min_size=1, max_size=50),
    dims=st.lists(
        st.tuples(st.integers(1, 80), st.integers(1, 60)),
        min_size=1, max_size=10,
    ),
    wavs=st.lists(
        st.tuples(st.integers(1, 2), st.sampled_from([8000, 16000, 44100]),
                  st.binary(min_size=0, max_size=64)),
        min_size=1, max_size=10,
    ),
)
@settings(**SETTINGS)
def test_media_header_parse_total_and_roundtrips(blobs, dims, wavs):
    """parse_media_header is TOTAL (arbitrary bytes — including bytes
    that start with a real magic number then truncate — never raise;
    they classify as 'unknown' or parse as far as the structure
    allows) and exactly inverts the real builders for every generated
    PNG geometry and WAV format combination. Pure Python: no Spark
    job needed — the Arrow-kernel equivalence is pinned separately in
    tests/test_multimodal.py."""
    from logsdb_spark.operators.multimodal import (
        build_png,
        build_wav,
        parse_media_header,
    )

    for b in blobs:
        out = parse_media_header(b)  # must not raise
        assert out["fmt"] in ("unknown", "png", "jpeg", "gif", "wav")
        # adversarial: magic-prefixed truncations must not raise either
        for magic in (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"RIFF",
                      b"GIF89a"):
            parse_media_header(magic + b)

    for w, h in dims:
        got = parse_media_header(build_png(w, h, b"xy"))
        assert (got["fmt"], got["width"], got["height"]) == ("png", w, h)

    for n_ch, rate, pcm in wavs:
        got = parse_media_header(build_wav(n_ch, rate, 16, pcm))
        bpf = n_ch * 2
        frames = (len(pcm) + bpf - 1) // bpf
        assert (got["fmt"], got["n_channels"], got["sample_rate_hz"],
                got["bit_depth"], got["n_frames"]) == (
            "wav", n_ch, rate, 16, frames)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon",
                             "zeta", "rare1", "rare2", "rare3"]),
            min_size=1, max_size=12,
        ).map(" ".join),
        min_size=3, max_size=25,
    ),
)
@settings(**SETTINGS)
def test_boilerplate_strip_matches_python_reference(spark, texts):
    """text_boilerplate_strip's hot-set + strip semantics vs a direct
    Python reference: tokens in > 80% of docs are removed, order
    preserved, counts exact — on hypothesis-generated corpora whose
    token document-frequencies straddle the threshold."""
    from pyspark.sql import Row

    from logsdb_spark.functions.text import normalize_text  # noqa: F401
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    n = len(texts)
    df_count: dict[str, int] = {}
    for t in texts:
        for tok in set(t.split()):
            df_count[tok] = df_count.get(tok, 0) + 1
    hot = {tok for tok, c in df_count.items() if c > 0.8 * n}
    want = {}
    for i, t in enumerate(texts):
        toks = t.split()
        kept = [x for x in toks if x not in hot]
        want[i] = (" ".join(kept), len(toks) - len(kept))

    # same pipeline as the registered query, parameterized on the frame
    n_row = docs.agg(F.count(F.lit(1)).alias("_n"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    hot_df = (
        toks.groupBy("tok")
        .agg(F.countDistinct("doc_id").alias("_df"))
        .join(F.broadcast(n_row))
        .filter(F.col("_df") > 0.8 * F.col("_n"))
        .agg(F.array_sort(F.collect_set("tok")).alias("_hot"))
    )
    got_rows = (
        docs.join(F.broadcast(hot_df))
        .select(
            "doc_id",
            F.array_join(
                F.filter(
                    F.split(F.col("text"), " "),
                    lambda t: (t != "") & ~F.array_contains(F.col("_hot"), t),
                ),
                " ",
            ).alias("clean_text"),
        )
        .collect()
    )
    for r in got_rows:
        assert r.clean_text == want[r.doc_id][0], (r.doc_id, r.clean_text)


# ---------------------------------------------------------------------------
# Media decoder fall-back-not-crash fuzz: the documented contract is
# "dict or None, never raise" for arbitrary bytes — the property a
# 100 TB blob scan depends on, where one malformed file must not kill
# a task. Pure-Python kernels, so no Spark job needed per example.
# ---------------------------------------------------------------------------


@given(st.binary(max_size=512))
@settings(max_examples=200, deadline=None)
def test_media_decoders_never_raise_on_junk(payload):
    from logsdb_spark.operators.multimodal import (
        decode_gif_pixels,
        decode_jpeg_pixels,
        decode_png_pixels,
        decode_wav_samples,
        parse_media_header,
    )

    for fn in (parse_media_header, decode_png_pixels, decode_gif_pixels,
               decode_wav_samples, decode_jpeg_pixels):
        out = fn(payload)
        assert out is None or isinstance(out, dict)


@given(st.integers(min_value=0, max_value=4096), st.binary(max_size=64),
       st.booleans())
@settings(max_examples=100, deadline=None)
def test_media_decoders_never_raise_on_truncated_real(cut, content, interlaced):
    """Truncations and bit-flips of REAL containers (the harder fuzz
    surface: valid magic + plausible structure, then a cliff)."""
    from logsdb_spark.operators.multimodal import (
        build_gif,
        build_jpeg,
        build_png,
        build_wav,
        decode_gif_pixels,
        decode_jpeg_pixels,
        decode_png_pixels,
        decode_wav_samples,
    )

    from logsdb_spark.operators.multimodal import build_jpeg_color

    blobs = [
        build_png(9, 7, content),
        build_gif(9, 7, content, interlaced=interlaced),
        build_wav(1, 8000, 16, content),
        build_jpeg(9, 7, content),
        build_jpeg_color(9, 7, content),
    ]
    for blob, fn in zip(
        blobs, (decode_png_pixels, decode_gif_pixels, decode_wav_samples,
                decode_jpeg_pixels, decode_jpeg_pixels)
    ):
        t = blob[: min(cut, len(blob))]
        out = fn(t)
        assert out is None or isinstance(out, dict)
        if len(t) > 20:
            flipped = bytearray(t)
            flipped[len(t) // 2] ^= 0xFF
            out2 = fn(bytes(flipped))
            assert out2 is None or isinstance(out2, dict)
