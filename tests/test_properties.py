"""Property-based invariants (hypothesis) for the dedup/text core.

The oracle gate checks exact values on one corpus; these check the
algebraic contracts on arbitrary inputs — the reference's invariant
layer (SURVEY.md §5.6) generalized.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_data_engineering_spark.operators import dedup as D

TEXTS = st.lists(
    st.text(alphabet="abcdef ", min_size=0, max_size=40), min_size=1, max_size=12
)

_settings = settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


@given(texts=TEXTS)
@_settings
def test_exact_dedup_partitions_the_corpus(spark, texts):
    """Dedup groups partition the ids: every doc in exactly one group,
    keeper is the min id of its group, copy counts sum to N."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    groups = D.exact_dedup(df).collect()
    assert sum(g.n_copies for g in groups) == len(texts)
    # identical normal forms land in the same group; keeper = min id
    import re

    def norm(t):
        return re.sub(r"\s+", " ", t).strip().lower()

    by_fp = {}
    for i, t in enumerate(texts):
        by_fp.setdefault(norm(t), []).append(i)
    want = {(min(ids), len(ids)) for ids in by_fp.values()}
    got = {(g.keeper_doc_id, g.n_copies) for g in groups}
    assert got == want


@given(texts=TEXTS)
@_settings
def test_dedup_keep_first_idempotent(spark, texts):
    """dedup(dedup(x)) == dedup(x) — the cleaning-pass contract."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    once = D.dedup_keep_first(df)
    twice = D.dedup_keep_first(once)
    assert sorted(once.collect()) == sorted(twice.collect())


@given(texts=st.lists(st.text(alphabet="ab cd", min_size=6, max_size=30), min_size=2, max_size=8))
@_settings
def test_jaccard_bounds_and_self_similarity(spark, texts):
    """0 < jaccard ≤ 1 for emitted pairs; a doc paired with its exact
    copy scores 1.0."""
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(100 + i, t) for i, t in enumerate(texts)]  # plant exact copies
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.d1, r.d2): r.jaccard for r in D.jaccard_pairs(df, n=2).collect()}
    for (d1, d2), j in pairs.items():
        assert 0.0 < j <= 1.0
    for i, t in enumerate(texts):
        if len(t.split()) >= 2:  # has at least one 2-gram
            assert pairs.get((i, 100 + i)) == pytest.approx(1.0)


@given(
    vals=st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    )
)
@_settings
def test_quantized_cosine_is_bounded(spark, vals):
    """Quantized cosine stays in [-1-ε, 1+ε]; zero-norm vectors are
    excluded instead of erroring under ANSI mode (hypothesis found the
    DIVIDE_BY_ZERO crash this guards against)."""
    import math

    import numpy as np

    from real_time_data_engineering_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(0, vals), (1, list(reversed(vals)))], "vec_id long, embedding array<float>"
    )
    out = S.embedding_neardup_pairs(df, threshold=-2.0).collect()

    # mirror the operator's quantization to know which vectors survive
    def qnorm(v):
        q = [math.floor(np.float32(x) * 1e6) for x in v]
        return sum(x * x for x in q)

    both_nonzero = qnorm(vals) > 0 and qnorm(list(reversed(vals))) > 0
    if both_nonzero:
        assert len(out) == 1
        assert -1.0 - 1e-9 <= out[0].cosine <= 1.0 + 1e-9
    else:
        assert out == []


_EV = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (key, minute)
    min_size=1,
    max_size=15,
)


@given(lefts=_EV, rights=_EV)
@_settings
def test_asof_join_matches_python_model(spark, lefts, rights):
    """Union-window as-of == brute-force python model on arbitrary
    (key, time) multisets: most recent right at t<=left_t per key,
    largest seq wins ties, unmatched → None."""
    import datetime as dt

    from real_time_data_engineering_spark.operators.asof import asof_join

    def ts(m):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(i, f"k{k}", ts(m)) for i, (k, m) in enumerate(lefts)], "id long, k string, t timestamp"
    )
    right = spark.createDataFrame(
        [(f"k{k}", ts(m), i) for i, (k, m) in enumerate(rights)], "rk string, rt timestamp, seq long"
    )
    got = {
        r.id: r.seq
        for r in asof_join(left, right, "t", "rt", by=[("k", "rk")], right_cols=["seq"], tie_col="seq").collect()
    }
    for i, (k, m) in enumerate(lefts):
        cand = [(rm, j) for j, (rk, rm) in enumerate(rights) if rk == k and rm <= m]
        want = max(cand)[1] if cand else None
        assert got[i] == want, (i, k, m, cand)


@given(lefts=_EV, rights=_EV, span=st.integers(1, 30), bucket=st.integers(60, 900))
@_settings
def test_interval_point_join_matches_python_model(spark, lefts, rights, span, bucket):
    """Bucketed interval join == brute-force [lo, hi) containment for
    arbitrary interval spans and (mis)aligned bucket widths."""
    import datetime as dt

    from real_time_data_engineering_spark.operators.asof import interval_point_join

    def ts(m):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)

    iv = spark.createDataFrame(
        [(i, ts(m), ts(m + span)) for i, (_, m) in enumerate(lefts)],
        "iid long, lo timestamp, hi timestamp",
    )
    pt = spark.createDataFrame(
        [(j, ts(m)) for j, (_, m) in enumerate(rights)], "pid long, pt timestamp"
    )
    got = {(r.iid, r.pid) for r in interval_point_join(iv, pt, "lo", "hi", "pt", bucket).collect()}
    want = {
        (i, j)
        for i, (_, m) in enumerate(lefts)
        for j, (_, pm) in enumerate(rights)
        if m <= pm < m + span
    }
    assert got == want


@given(texts=TEXTS)
@_settings
def test_repetition_stats_matches_python_model(spark, texts):
    """d12 contract on arbitrary inputs: counts equal a brute-force
    Counter model over the same whitespace tokenization."""
    import re
    from collections import Counter

    from real_time_data_engineering_spark.operators.quality import repetition_stats

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}

    for i, t in enumerate(texts):
        toks = re.split(r"\s+", t.strip().lower())
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            assert i not in got
            continue
        c = Counter(grams)
        r = got[i]
        assert r.n_grams == len(grams)
        assert r.distinct_grams == len(c)
        assert r.max_gram_count == max(c.values())
        assert r.dup_gram_frac == sum(v for v in c.values() if v > 1) / len(grams)


_CDC_OPS = st.lists(
    st.tuples(
        st.integers(0, 3),              # key
        st.integers(0, 99),             # value
        st.sampled_from(["c", "u", "d"]),
    ),
    min_size=1,
    max_size=20,
)


@given(ops=_CDC_OPS)
@_settings
def test_cdc_materialize_matches_python_replay(spark, ops):
    """q26 contract: the windowed latest-op materialization equals an
    in-order dict replay of the same change stream."""
    import json as _json

    from pyspark.sql import types as T

    from real_time_data_engineering_spark.sources import cdc

    schema = T.StructType(
        [
            T.StructField("before", T.StringType()),
            T.StructField(
                "after",
                T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]),
            ),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    rows = [
        (_json.dumps({"before": None, "after": {"id": k, "v": v}, "op": op, "ts_ms": ts}),)
        for ts, (k, v, op) in enumerate(ops)
    ]
    df = spark.createDataFrame(rows, "payload string")
    out = cdc.materialize_latest(cdc.parse_envelope(df, "payload", schema), ("id",), ("ts_ms",))
    got = {r.id: r.v for r in out.collect()}

    state: dict[int, int] = {}
    for k, v, op in ops:  # ts_ms follows list order, so replay in order
        if op == "d":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == state


def test_range_frame_shrinks_over_calendar_gaps(spark):
    """q28's RANGE frame must be keyed on the date axis: after a 10-day
    gap the trailing window contains ONLY the current day, where a ROWS
    BETWEEN 6 PRECEDING frame would wrongly reach across the gap."""
    import datetime as dt
    import unittest.mock as mock

    from real_time_data_engineering_spark.registry import get
    import real_time_data_engineering_spark.registry.analytics as RA

    rows = [
        (dt.date(2024, 1, 1), 100.0),
        (dt.date(2024, 1, 2), 100.0),
        (dt.date(2024, 1, 3), 100.0),
        (dt.date(2024, 1, 20), 70.0),  # 10+ day gap
        (dt.date(2024, 1, 22), 30.0),
    ]
    orders = spark.createDataFrame(
        [(d, v) for d, v in rows], "o_orderdate date, o_totalprice double"
    )
    with mock.patch.object(RA, "load_table", lambda *_a, **_k: orders):
        out = {r.order_date: (r.days_in_window, r.trailing_7d_revenue)
               for r in get("q28_trailing_window").spark(spark, "ignored").collect()}
    assert out[dt.date(2024, 1, 3)] == (3, 300.0)
    assert out[dt.date(2024, 1, 20)] == (1, 70.0), "gap must reset the window"
    assert out[dt.date(2024, 1, 22)] == (2, 100.0), "in-range prior day joins the window"


@given(
    a=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=12),
    b=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=12),
)
@_settings
def test_exact_ks_matches_python_model(spark, a, b):
    """exact_ks_counts == the textbook two-sample KS computed in pure
    Python over the same samples (value lists -> counts)."""
    from real_time_data_engineering_spark.operators.quality import exact_ks_counts
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    df_a = spark.createDataFrame(list(ca.items()), "v long, cnt long")
    df_b = spark.createDataFrame(list(cb.items()), "v long, cnt long")
    row = exact_ks_counts(df_a, df_b).collect()[0]

    n_a, n_b = len(a), len(b)
    grid = sorted(set(a) | set(b))
    d_num = max(
        abs(
            sum(1 for x in a if x <= v) * n_b
            - sum(1 for x in b if x <= v) * n_a
        )
        for v in grid
    )
    assert (row.n_a, row.n_b, row.d_num) == (n_a, n_b, d_num)
    assert row.ks_d == d_num / (n_a * n_b)
    # identical samples → D = 0; disjoint supports → D = n_a*n_b
    if sorted(a) == sorted(b):
        assert row.d_num == 0


@given(
    weights=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=20),
)
@_settings
def test_weighted_reservoir_priority_matches_python_model(spark, weights):
    """The A-Res integer priority key reproduces the same ordering a
    pure-Python implementation of -ln(u)/w (same md5 coin, same
    quantization, same truncating division) produces."""
    import hashlib
    import math

    from pyspark.sql import functions as FF

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, weight_tokens long"
    )
    u16 = FF.conv(
        FF.substring(FF.md5(FF.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    neg_lnu = FF.round(
        -FF.log((u16 + FF.lit(1)).cast("double") / FF.lit(65536.0)), 9
    ).cast("decimal(18,9)")
    keyed = df.select(
        "doc_id",
        (neg_lnu * FF.lit(1_000_000_000)).cast("long").alias("nl_fp"),
        "weight_tokens",
    ).selectExpr("doc_id", "(nl_fp * 1000000) div weight_tokens AS priority_fp")
    got = {r.doc_id: r.priority_fp for r in keyed.collect()}

    for i, w in enumerate(weights):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
        nl = round(-math.log((h + 1) / 65536.0), 9)
        nl_fp = int((nl * 10**9).__round__())  # decimal-exact: nl has 9 dp
        assert got[i] == (nl_fp * 1_000_000) // w


from hypothesis import given, settings
from hypothesis import strategies as st

# one strategy PER TYPE: a parquet column is single-typed, and since
# the r6 cross-type fix a mixed-tag value set refuses to bloom at all
# (returns None), so the false-negative property quantifies over
# single-typed lists — the only shape _stats_for can ever produce.
_bloomable_lists = st.one_of(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=300),
    st.lists(st.text(max_size=40), min_size=1, max_size=300),
    st.lists(st.booleans(), min_size=1, max_size=300),
)


@given(
    values=_bloomable_lists,
    probe_idx=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_bloom_never_false_negative(values, probe_idx):
    """The one property a bloom filter must NEVER violate: every value
    that went in tests as present — a false negative would make
    `files_for` prune a file that contains the predicate value, i.e. a
    silent wrong answer. False positives only cost an unpruned file."""
    from real_time_data_engineering_spark.operators.manifest import (
        _bloom_build,
        _bloom_maybe_contains,
    )

    # values passed RAW, not set()-deduped: Python's set collapses
    # False/0 and True/1 across types (hash equality), which would drop
    # a bool's distinct "b:" encoding before it reaches the filter —
    # hypothesis found exactly [0, False]. _bloom_build must therefore
    # be duplicate-safe by itself (it is: re-setting bits is idempotent)
    # and _stats_for only ever sets over a single-typed parquet column.
    bloom = _bloom_build(values, m_bits=8192)
    assert bloom is not None
    for v in values:
        assert _bloom_maybe_contains(bloom, v), f"false negative on {v!r}"
    # a probe of an arbitrary value never errors and returns a bool
    assert _bloom_maybe_contains(bloom, probe_idx) in (True, False)
    # a probe whose TYPE TAG differs from the column's can never prove
    # absence (cross-type equality may match via implicit cast)
    cross = "7" if not isinstance(values[0], str) else 7
    assert _bloom_maybe_contains(bloom, cross) is True


@given(st.one_of(st.floats(allow_nan=False), st.binary(max_size=8)))
@settings(max_examples=50, deadline=None)
def test_bloom_unbloomable_types_opt_out_both_sides(v):
    """Floats/bytes (and anything else non-{bool,int,str}) must abort
    the BUILD (column opts out) and pass the MEMBERSHIP probe (never
    prune) — the two sides of the same safety contract."""
    from real_time_data_engineering_spark.operators.manifest import (
        _bloom_build,
        _bloom_encode,
        _bloom_maybe_contains,
    )

    assert _bloom_encode(v) is None
    assert _bloom_build([1, v], m_bits=1024) is None
    some = _bloom_build([1, 2, 3], m_bits=1024)
    assert _bloom_maybe_contains(some, v) is True


def test_epoch_shuffle_is_a_fresh_permutation_per_epoch(spark):
    """d39's data-loader order: per (epoch, shard) the positions are a
    dense 1..n permutation, the two epochs order docs differently for
    nearly every doc (md5 mixing), and the whole table is reproducible
    run to run (resumability without RNG state)."""
    from real_time_data_engineering_spark.registry import all_specs
    from conftest import SF_DIR_T2

    spec = all_specs()["d39_epoch_shuffle"]
    out = spec.spark(spark, SF_DIR_T2).toPandas()
    for (_e, _s), grp in out.groupby(["epoch", "shard"]):
        assert sorted(grp["position"]) == list(range(1, len(grp) + 1))
    p0 = out[out.epoch == 0].set_index("doc_id")["position"]
    p1 = out[out.epoch == 1].set_index("doc_id")["position"]
    moved = (p0 != p1.reindex(p0.index)).mean()
    assert moved > 0.9, f"epochs nearly identical: {moved:.3f} moved"
    again = spec.spark(spark, SF_DIR_T2).toPandas()
    assert out.sort_values(["epoch", "shard", "position"]).reset_index(drop=True).equals(
        again.sort_values(["epoch", "shard", "position"]).reset_index(drop=True)
    )
