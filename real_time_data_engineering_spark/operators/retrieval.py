"""Lexical retrieval + hybrid fusion operators — the search side of a
RAG / training-data pipeline (reference parity: the reference ships no
retrieval engine; this extends the LLM-pipeline surface beside the
embedding ANN stack in `operators/similarity`).

* `bm25_scores` — Okapi BM25 (Robertson & Zaragoza 2009), k1/b
  saturation, shared by the literal-query census (d40) and the
  document-as-query hybrid (s10). Parity discipline is d28's: the one
  transcendental (idf's ln) runs on an identical-by-construction
  double and is quantized to DECIMAL at the source; the tf saturation
  factor is one identical IEEE chain quantized to DECIMAL; scores sum
  and RANK as exact decimals (order-independent across any partition
  count).
* `rrf_fuse` — reciprocal-rank fusion (Cormack, Clarke & Buettcher
  2009): score = Σ_lists 1/(K + rank). Engine-exact form: the
  reciprocal is INTEGER floor(1e9/(K + rank)) — Spark's `div` and
  DuckDB's `//` agree for non-negative operands (the d33 fixed-point
  rule) — so fusion is a plain integer sum with no float anywhere.

Scale shape: BM25's only corpus-sized work is one (doc, term)
tokenize + the df/tf aggregations, both keyed on terms restricted to
the broadcast query vocabulary; N and avgdl arrive as driver scalars
(the sanctioned O(1) d24 pattern — a 1-row join would plan a
BroadcastNestedLoopJoin, which the repo-wide plan gate bans). RRF
joins two already-top-K rank lists — metadata-sized by construction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Standard RRF dampening constant (Cormack et al. use 60).
RRF_K = 60
#: Integer reciprocal scale: floor(1e9 / (K + rank)).
RRF_SCALE = 1_000_000_000


def tokens_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term) over lowercased ``[a-z]+`` runs — the shared
    tokenization of the text-analysis family (d26/d38/d40)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("term"),
    )


def corpus_stats(
    docs: DataFrame, tok: DataFrame, text_col: str = "text"
) -> tuple[float, float, DataFrame]:
    """(n_docs, avgdl, dl) — the two O(1) BM25 scalars plus the per-doc
    token-length relation (checkpointed: consumed by both the scalar
    fetch and the scoring join).

    dl is the SIZE of the token array — a narrow, shuffle-free
    projection of ``docs`` (`_lex_parts`' stats pass uses the same
    identity) — so the explode+groupBy exchange and the separate
    ``docs.count()`` corpus scan both disappear: one checkpoint job +
    one agg job total. The exact contract is unchanged: n_docs counts
    ALL docs, avgdl divides by docs with ≥1 token, and the returned
    ``dl`` relation carries only docs with ≥1 token (what the old
    groupBy over exploded tokens produced). ``tok`` stays in the
    signature for the callers' tokenize chain (consumed by
    `bm25_scores`); it is not re-scanned here — so ``text_col`` MUST
    name the same column ``tok`` was built from (both callers use the
    defaults), or dl and tf would tokenize different columns.

    The NULL-text guard is ``greatest(size, 0)``, not ``coalesce``:
    under legacy (non-ANSI) sizeOfNull, size(NULL) is -1 — which
    coalesce would pass through, corrupting sum(dl) — while greatest
    clamps it AND covers the ANSI NULL case (greatest skips NULLs), so
    the identity holds under either config."""
    dl_all = docs.select(
        "doc_id",
        F.greatest(
            F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")),
            F.lit(0),
        )
        .cast("long")
        .alias("dl"),
    ).localCheckpoint(eager=True)
    row = dl_all.agg(
        F.count("*").alias("n_all"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("s"),
        F.count_if(F.col("dl") > 0).alias("c"),
    ).first()
    n_docs = float(row["n_all"])
    avgdl = float(row["s"]) / float(row["c"])
    return n_docs, avgdl, dl_all.filter(F.col("dl") > 0)


def bm25_scores(
    tok: DataFrame,
    qterms: DataFrame,
    n_docs: float,
    avgdl: float,
    dl: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    exclude_self: bool = False,
) -> DataFrame:
    """Per (query_id, doc_id): exact-decimal BM25 score + matched-term
    count. ``qterms`` is (query_id, term) — a literal query table (d40)
    or the distinct terms of query documents (s10; pass
    ``exclude_self=True`` there so a document never retrieves itself).
    Constants must make the IEEE chain identical on both engines:
    k1=1.2/b=0.75 fold to the exact doubles 2.2 and 0.25 that the SQL
    oracles spell literally.

    ``qterms`` must be duplicate-free (query_id, term) pairs — both
    callers construct it so (s10 applies `.distinct()`, d40's literal
    census is distinct by inspection).

    One corpus tokenize pass: per-doc term frequencies are aggregated
    ONCE keyed (term, doc_id), restricted to the broadcast query
    vocabulary, and checkpointed; the per-query tf join AND the df
    census both derive from that bounded relation. (Previously tf and
    df each re-tokenized the corpus — two scans + two corpus-keyed
    exchanges — and the tf shuffle carried every (query, occurrence)
    copy; tf is per-(term, doc) — a term's frequency in a doc does not
    depend on which query asks — so the query_id join belongs AFTER
    the aggregation, and df(term) is just the (term, doc) row count.)"""
    tfd = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    tf = tfd.join(F.broadcast(qterms), "term")
    if exclude_self:
        tf = tf.filter(F.col("doc_id") != F.col("query_id"))
    dfq = tfd.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    return _bm25_from_parts(tf, dfq, dl, n_docs, avgdl, k1, b)


def _bm25_from_parts(
    tf: DataFrame,
    dfq: DataFrame,
    dl: DataFrame,
    n_docs: float,
    avgdl: float,
    k1: float,
    b: float,
) -> DataFrame:
    """The BM25 scoring core over pre-aggregated parts — shared by the
    tokenize-per-call path (`bm25_scores`) and the persisted-index path
    (`lexical_index_bm25`), so both produce bit-identical exact-decimal
    scores by construction. ``tf``: (query_id, term, doc_id, tf);
    ``dfq``: (term, df); ``dl``: (doc_id, dl)."""
    idf = dfq.select(
        "term",
        F.round(
            F.log(
                (F.lit(n_docs) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("idf_q"),
    )
    tf_sat = F.round(
        (F.col("tf").cast("double") * F.lit(k1 + 1.0))
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.lit(avgdl)))
        ),
        9,
    ).cast("decimal(18,9)")
    parts = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(idf), "term")
        .select("query_id", "doc_id", (F.col("idf_q") * tf_sat).alias("p"))
    )
    return parts.groupBy("query_id", "doc_id").agg(
        F.sum("p").alias("score_x"), F.count("*").alias("n_terms_matched")
    )


def rrf_fuse(rank_lists: list[DataFrame], k: int = RRF_K) -> DataFrame:
    """Reciprocal-rank fusion of top-K rank lists, each
    (query_id, doc_id, rank): rrf_score = Σ floor(1e9/(k + rank)),
    docs absent from a list contribute 0 for it. Pure integer
    arithmetic — exact, order-independent, engine-identical (floor
    division over positive operands)."""
    # div semantics: Spark's `/` on longs is a double — use the integer
    # `div` operator so the reciprocal stays exact (and floors like
    # DuckDB's `//` for these positive operands)
    scored = [
        df.select(
            "query_id",
            "doc_id",
            F.expr(f"CAST({RRF_SCALE} AS BIGINT) div (CAST({k} AS BIGINT) + rank)").alias(
                "_part"
            ),
        )
        for df in rank_lists
    ]
    allparts = reduce(DataFrame.unionByName, scored)
    return allparts.groupBy("query_id", "doc_id").agg(
        F.sum("_part").alias("rrf_score"), F.count("*").alias("n_lists")
    )


def bm25_literal_queries(
    spark: SparkSession, query_terms: tuple[tuple[int, str], ...]
) -> DataFrame:
    """A literal (query_id, term) table (d40's fixed query census)."""
    return spark.createDataFrame(list(query_terms), "query_id bigint, term string")


# ---------------------------------------------------------------------------
# Persistent lexical index: the durable form of the BM25 pipeline (a
# Lucene-style inverted index as lakehouse tables). `bm25_scores`
# re-tokenizes the corpus per query batch — right for ad-hoc use, wrong
# at 100 TB, where tokenization is a write-time cost paid once and
# query work must be bounded by the query vocabulary. Three
# ManifestTables under one root:
#
# * ``postings`` — (term, doc_id, tf), THE corpus-sized relation,
#   cluster_by=["term"] so per-file min/max stats prune query-term
#   probes to a handful of files (`read_any_of`, one scan/job).
# * ``doclen``  — (doc_id, dl), joined only against candidate docs.
# * ``_stats``  — append-only (n_docs, sum_dl, n_dl) DELTA rows; N,
#   avgdl's numerator and denominator are associative sums over it
#   (the `_centroid_deltas` pattern), so concurrent shard appends can
#   never lose an update. n_docs counts ALL docs, n_dl only docs with
#   tokens — `corpus_stats`' exact split, so token-less docs don't
#   break the bit-identical contract.
#
# Appends are per-shard `append_with_retry` commits (optimistic CAS):
# tokenize ONLY the new shard, land its postings/doclen/stats. Because
# df, dl, N and sum_dl are all associative over DISJOINT doc shards,
# base+append scores are BIT-IDENTICAL to an all-at-once build
# (equivalence-tested). Appending the same doc_id twice would
# double-count it — run the d1-class exact dedup upstream, the same
# new-rows-only contract as `append_to_ivfpq_index`.
# ---------------------------------------------------------------------------
_POSTINGS = "postings"
_DOCLEN = "doclen"
_LEX_STATS = "_stats"


def _lex_parts(docs: DataFrame, text_col: str):
    """(postings, doclen, stats_delta) for one corpus shard.

    The stats delta carries THREE associative sums, matching
    `corpus_stats`' exact definitions so the index path stays
    bit-identical to the per-call path even when some docs tokenize to
    NOTHING (empty/NULL text, no ``[a-z]+`` runs): ``n_docs`` counts
    ALL shard docs (idf's N — `corpus_stats` uses docs.count()), while
    ``n_dl`` counts only docs with ≥1 token (avgdl's denominator —
    `corpus_stats` divides by the doclen row count)."""
    tok = tokens_df(docs, text_col)
    postings = tok.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))
    doclen = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    # all three scalars from ONE narrow shuffle-free pass (global-agg
    # partials): a separate docs.count() would re-materialize the
    # caller's repartition, and an agg over `doclen` would re-run the
    # tokenize+groupBy chain — both measured as a 2.6x write-time
    # regression before this form. size() counts the same [a-z]+ runs
    # tokens_df explodes; NULL text clamps to 0 tokens via greatest —
    # config-independent (legacy sizeOfNull returns -1, ANSI returns
    # NULL; greatest clamps the former and skips the latter).
    stats = (
        docs.select(
            F.greatest(
                F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")),
                F.lit(0),
            ).alias("dl0")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum("dl0"), F.lit(0)).cast("long").alias("sum_dl"),
            F.count_if(F.col("dl0") > 0).cast("long").alias("n_dl"),
        )
        .coalesce(1)
    )
    return postings, doclen, stats


def write_lexical_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    n_files: int | None = None,
    skip_if_current: bool = False,
    id_col: str = "doc_id",
) -> None:
    """Tokenize once, persist the inverted index (overwrite).

    ``skip_if_current=True``: the `operators.freshness` idempotency
    protocol — the build is deterministic in (corpus, params), so a
    stamped index whose parameters and corpus fingerprint match is
    value-identical to the rebuild it skips; readers pay one narrow
    agg scan instead of re-tokenizing the corpus. The stamp drops
    first on a real build and on every append."""
    import os

    from .freshness import BuildStamp
    from .manifest import ManifestTable

    stamp = BuildStamp(
        docs.sparkSession,
        path,
        {"text_col": text_col, "n_files": n_files, "kind": "lexical"},
        docs,
        (id_col, text_col),
    )
    if skip_if_current and stamp.is_current():
        return
    stamp.invalidate()
    postings, doclen, stats = _lex_parts(docs, text_col)
    ManifestTable(os.path.join(path, _POSTINGS)).write(
        postings, mode="overwrite", cluster_by=["term"], n_files=n_files
    )
    ManifestTable(os.path.join(path, _DOCLEN)).write(doclen, mode="overwrite")
    ManifestTable(os.path.join(path, _LEX_STATS)).write(stats.coalesce(1), mode="overwrite")
    if skip_if_current:
        stamp.write()  # last: artifacts are all committed above


def append_to_lexical_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    max_attempts: int = 5,
    n_files: int | None = None,
) -> None:
    """Add a NEW-docs shard: tokenize the shard only, CAS-append its
    postings, doc lengths and stats delta. All three relations are
    associative over disjoint doc shards, so scoring after any append
    sequence equals the all-at-once build bit for bit."""
    import os

    from .freshness import invalidate_stamp
    from .manifest import ManifestTable

    # the appended index serves MORE than any stamped corpus — drop the
    # idempotency stamp before mutating (the freshness protocol)
    invalidate_stamp(path)
    postings, doclen, stats = _lex_parts(docs, text_col)
    ManifestTable(os.path.join(path, _POSTINGS)).append_with_retry(
        postings, max_attempts=max_attempts, cluster_by=["term"], n_files=n_files
    )
    ManifestTable(os.path.join(path, _DOCLEN)).append_with_retry(
        doclen, max_attempts=max_attempts
    )
    ManifestTable(os.path.join(path, _LEX_STATS)).append_with_retry(
        stats.coalesce(1), max_attempts=max_attempts
    )


def forget_from_lexical_index(
    spark: SparkSession,
    path: str,
    doc_ids: list,
    max_attempts: int = 5,
    physical: bool = False,
    strict: bool = True,
    n_files: int | None = None,
) -> None:
    """Erase documents from the persisted index — the GDPR
    right-to-be-forgotten reaching DERIVED state, not just the source
    table. Postings and doc lengths are per-doc rows, deleted by an
    ``in``-list merge-on-read predicate; the scalar stats get one
    NEGATIVE delta row (−n_docs, −Σdl, −n_dl read from the stored
    doclen rows), so the summed deltas equal the surviving corpus's
    stats exactly.

    Because df, dl, N and sum_dl are all linear in the document set,
    BM25 served after a forget is BIT-IDENTICAL to an index rebuilt
    from the surviving corpus (equivalence-tested) — erasure costs
    O(deleted rows), never a corpus re-tokenization.

    Cost honesty at scale: postings files are clustered by TERM (for
    query pruning), so their doc-id min/max stats are wide and an
    id-set delete scans most postings files — but merge-on-read means
    that scan emits only an O(deleted rows) deletion-vector sidecar
    and rewrites NOTHING; erasure requests batch, the one scan
    amortizes, and the rewrite is deferred to the next maintenance
    `compact()` — the Delta-DV / Iceberg positional-delete trade for
    frequent small deletes.

    Contract (mirrors the append contract's "new docs only"): every id
    must have been ingested exactly once. Ids never ingested — or
    forgotten TWICE — would corrupt the N decrement, and the index
    stores no membership row for zero-token docs, so full presence is
    uncheckable here. ``strict=True`` (the default) therefore enforces
    the checkable half AT THE DECREMENT SITE: every id must have a
    doclen row, else the call raises instead of silently corrupting N
    (double-forgets and never-ingested ids both trip it). A caller that
    legitimately forgets zero-token docs — it must hold the membership
    invariant some other way, e.g. the curation plan's cluster
    registry — passes ``strict=False``. ``physical=True`` additionally
    compacts (applies the deletion vectors), expires old snapshots and
    vacuums, so no remaining parquet file under the index contains a
    forgotten row — the physical guarantee erasure actually requires;
    ``n_files`` re-pins the build's postings file layout through the
    rewrite (pass the same value the index was written with) so
    term-stats pruning survives erasure maintenance.
    """
    import os

    from .freshness import invalidate_stamp
    from .manifest import ManifestTable

    ids = sorted(set(doc_ids))
    if not ids:
        return
    doclen_t = ManifestTable(os.path.join(path, _DOCLEN))
    gone = (
        doclen_t.read(spark)
        .filter(F.col("doc_id").isin(ids))
        .agg(
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
            F.count("*").cast("long").alias("n_dl"),
        )
        .first()
    )
    if strict and int(gone["n_dl"]) != len(ids):
        raise ValueError(
            f"forget_from_lexical_index: {len(ids) - int(gone['n_dl'])} of "
            f"{len(ids)} ids have no doclen row — never ingested, already "
            "forgotten, or zero-token docs. Decrementing n_docs for them "
            "would corrupt BM25's N. Pass strict=False ONLY if the caller "
            "holds the membership invariant itself (e.g. the curation "
            "plan's cluster registry) and the gap is all zero-token docs."
        )
    # the forgotten index serves LESS than any stamped corpus — drop
    # the idempotency stamp before mutating (the freshness protocol)
    invalidate_stamp(path)
    neg = spark.createDataFrame(
        [(-len(ids), -int(gone["sum_dl"]), -int(gone["n_dl"]))],
        "n_docs long, sum_dl long, n_dl long",
    )
    post_t = ManifestTable(os.path.join(path, _POSTINGS))
    post_t.delete_where(spark, [("doc_id", "in", ids)], merge_on_read=True)
    doclen_t.delete_where(spark, [("doc_id", "in", ids)], merge_on_read=True)
    stats_t = ManifestTable(os.path.join(path, _LEX_STATS))
    stats_t.append_with_retry(neg.coalesce(1), max_attempts=max_attempts)
    if physical:
        # keep the term clustering AND the build's file-count layout
        # through the rewrite so query probes stay stats-pruned after
        # erasure maintenance (a byte-targeted compact would collapse a
        # small postings table to one file and un-prune every probe)
        for t, cl, nf in (
            (post_t, ["term"], n_files),
            (doclen_t, None, None),
            (stats_t, None, None),
        ):
            t.compact(spark, cluster_by=cl, n_files=nf)
            t.expire(keep_last=1)
            t.vacuum(older_than_s=0.0)


def lexical_index_bm25(
    spark: SparkSession,
    path: str,
    qterms: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    exclude_self: bool = False,
) -> DataFrame:
    """BM25 scores served from a persisted index — NO corpus
    tokenization at query time. The postings probe is one
    `read_any_of` scan opening only the files whose stats admit a
    query term; df comes from the probed postings (one row per
    (term, doc) by construction); N/avgdl are the summed `_stats`
    deltas fetched as sanctioned O(1) driver scalars (d24 pattern).
    Scores are bit-identical to `bm25_scores` over the same corpus
    (shared `_bm25_from_parts` core, equivalence-tested)."""
    import os

    from .manifest import ManifestTable

    row = (
        ManifestTable(os.path.join(path, _LEX_STATS))
        .read(spark)
        .agg(
            F.sum("n_docs").alias("n"),
            F.sum("sum_dl").alias("s"),
            F.sum("n_dl").alias("d"),
        )
        .first()
    )
    # exactly corpus_stats' definitions: N = ALL docs (idf), avgdl =
    # token sum over docs WITH tokens (the doclen row count)
    n_docs = float(row["n"])
    avgdl = float(row["s"]) / float(row["d"])
    # the query vocabulary is bounded by contract (a literal census or
    # a handful of query documents) — driver-side is the probe plan
    terms = sorted(r.term for r in qterms.select("term").distinct().collect())
    probed = ManifestTable(os.path.join(path, _POSTINGS)).read_any_of(
        spark, "term", terms
    )
    tf = probed.join(F.broadcast(qterms), "term")
    if exclude_self:
        tf = tf.filter(F.col("doc_id") != F.col("query_id"))
    tf = tf.select("query_id", "term", "doc_id", "tf")
    dfq = probed.groupBy("term").agg(F.count("*").alias("df"))
    dl = ManifestTable(os.path.join(path, _DOCLEN)).read(spark)
    return _bm25_from_parts(tf, dfq, dl, n_docs, avgdl, k1, b)


# ---------------------------------------------------------------------------
# Index-served phrase decontamination (two-phase candidate → verify).
#
# The benchmark-contamination question at 100 TB — "which training docs
# contain this eval phrase VERBATIM?" — must not re-tokenize the
# corpus per benchmark refresh. Classic two-phase answer over the
# persisted lexical index:
#
#   1. CANDIDATES from the postings table: a doc can contain the
#      phrase only if it contains every phrase term, so one stats-
#      pruned `read_any_of` probe over the phrases' (bounded) term
#      vocabulary + a conjunctive count yields a guaranteed superset.
#   2. VERIFY exact adjacency on candidates only: space-joined token
#      containment of ' phrase ' in ' tok1 tok2 ... ' — the tokenizer
#      is the index's own (`tokens_df`), so phase 1's superset claim is
#      airtight and the final set EQUALS ground truth (what the value
#      oracle recomputes corpus-wide).
#
# Candidate quality is part of the output (n_candidates vs
# n_contaminated): a one-term phrase degenerates to that term's df —
# visible, not hidden.
# ---------------------------------------------------------------------------


def index_phrase_candidates(spark: SparkSession, path: str, phrases) -> DataFrame:
    """(phrase_id, doc_id) candidate pairs: docs whose postings contain
    EVERY distinct term of the phrase. ``phrases`` is a bounded literal
    list of (phrase_id, phrase) — the benchmark census contract, so the
    term vocabulary is a sanctioned driver-side constant (d24 pattern).
    A phrase with a term the corpus never saw yields no candidates (the
    conjunction is unsatisfiable) — correct, not an error."""
    import os

    from .manifest import ManifestTable

    pt = sorted({(pid, t) for pid, ph in phrases for t in ph.split()})
    terms = sorted({t for _, t in pt})
    post = (
        ManifestTable(os.path.join(path, _POSTINGS))
        .read_any_of(spark, "term", terms)
        .select("term", "doc_id")
    )
    pterms = spark.createDataFrame(pt, "phrase_id bigint, term string")
    nterms = spark.createDataFrame(
        sorted((pid, sum(1 for p, _ in pt if p == pid)) for pid in {p for p, _ in pt}),
        "phrase_id bigint, n_terms bigint",
    )
    return (
        post.join(F.broadcast(pterms), "term")
        # postings are distinct (term, doc) pairs by construction, so a
        # plain count is the distinct matched-term count
        .groupBy("phrase_id", "doc_id")
        .agg(F.count("*").alias("_hit"))
        .join(F.broadcast(nterms), "phrase_id")
        .filter(F.col("_hit") == F.col("n_terms"))
        .select("phrase_id", "doc_id")
    )


def phrase_containment_expr(text_col: str, phrase_col) -> "Column":
    """TRUE iff the space-joined lowercase [a-z]+ token stream of
    ``text_col`` contains ``phrase_col`` as a token-aligned substring —
    the exact-adjacency verify both the index-served (d44) and the
    stateless decontamination paths share, so the two are equal by
    construction."""
    return F.concat(
        F.lit(" "),
        F.array_join(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"), " "
        ),
        F.lit(" "),
    ).contains(F.concat(F.lit(" "), phrase_col, F.lit(" ")))


def _phrase_hits_parts(
    spark: SparkSession, path: str, docs: DataFrame, phrases, text_col: str = "text"
):
    """(hits, candidates, phrases-df) — hits are the (phrase_id, doc_id)
    VERIFIED contamination pairs: index-probe
    candidates (stats-pruned conjunctive postings scan) filtered by the
    exact containment verify on candidates only. The verify join
    broadcasts the candidate side (bounded by the phrase-census
    contract), so corpus text is only ever *scanned* — never shuffled —
    and the normalization expression runs on join survivors only."""
    cand = index_phrase_candidates(spark, path, phrases).localCheckpoint(eager=True)
    phr = spark.createDataFrame(sorted(phrases), "phrase_id bigint, phrase string")
    return (
        docs.select("doc_id", text_col)
        .join(F.broadcast(cand), "doc_id")
        .join(F.broadcast(phr), "phrase_id")
        .filter(phrase_containment_expr(text_col, F.col("phrase")))
        .select("phrase_id", "doc_id")
    ), cand, phr


def phrase_hits(
    spark: SparkSession, path: str, docs: DataFrame, phrases, text_col: str = "text"
) -> DataFrame:
    """(phrase_id, doc_id) verified contamination hits — the per-doc
    decontamination primitive the incremental ingest plan gates on."""
    hits, _cand, _phr = _phrase_hits_parts(spark, path, docs, phrases, text_col)
    return hits


def phrase_decontaminate(
    spark: SparkSession, path: str, docs: DataFrame, phrases, text_col: str = "text"
) -> DataFrame:
    """Per phrase: candidate count, verified contamination count, and
    an order-canonical md5 over the contaminated doc-id set (the d44
    census shape over `phrase_hits`)."""
    hits, cand, phr = _phrase_hits_parts(spark, path, docs, phrases, text_col)
    cagg = cand.groupBy("phrase_id").agg(F.count("*").cast("long").alias("n_candidates"))
    xagg = hits.groupBy("phrase_id").agg(
        F.count("*").cast("long").alias("n_contaminated"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
            )
        ).alias("docs_fp"),
    )
    return (
        phr.join(cagg, "phrase_id", "left")
        .join(xagg, "phrase_id", "left")
        .select(
            "phrase_id",
            "phrase",
            F.coalesce("n_candidates", F.lit(0).cast("long")).alias("n_candidates"),
            F.coalesce("n_contaminated", F.lit(0).cast("long")).alias("n_contaminated"),
            F.coalesce("docs_fp", F.md5(F.lit(""))).alias("docs_fp"),
        )
    )


def mmr_select(
    cand: DataFrame,
    sims: DataFrame,
    k: int = 5,
    lam: float = 0.5,
) -> DataFrame:
    """Maximal-marginal-relevance selection (Carbonell & Goldstein
    1998) — the result-diversification re-rank every production
    retrieval stack runs on its fused shortlist. Greedy: seed with the
    most relevant candidate per query, then repeatedly take
    argmax( λ·rel − (1−λ)·max_{s∈selected} sim(c, s) ), ``k`` picks.

    Inputs: ``cand`` (query_id, doc_id, rel) — ``rel`` already
    normalized to O(1) (the caller divides the integer RRF score by a
    POWER OF TWO so the division is exact in binary); ``sims``
    (query_id, a, b, cos) — SYMMETRIC pairwise similarities among each
    query's candidates (both (a,b) and (b,a) present).

    Determinism: every number in the chain is either an exact integer
    or a fixed-order IEEE expression (one divide, one sqrt per cosine,
    a MAX — order-independent — and one λ-blend), ties break on doc_id
    — so the greedy unrolls into plain SQL and the whole selection is
    value-oracle-checkable (registry s16).

    Scale shape: the shortlist is |queries|·shortlist rows and the sim
    relation |queries|·shortlist² — metadata-sized by construction (the
    expensive retrieval+pair-cosine work happens upstream on verified
    chains). The greedy itself runs as ONE cogrouped Arrow pass (both
    relations shuffled once by query_id, then a per-query loop over ≤
    shortlist² floats in the kernel): the r9 form unrolled the k−1
    rounds as driver-paced self-joins with an eager checkpoint each —
    ~5 jobs / ~20 stages for what is per-query O(k·shortlist) float64
    work (guide §1.2 step 1 — the distributed algorithm had 4 needless
    barriers; §4.2 — batch the tiny sequential tail into one kernel).
    Arithmetic is unchanged op-for-op (λ·rel, MAX over available pair
    cosines, λ·rel − (1−λ)·maxsim, ties on doc_id — all IEEE float64
    in both forms), so results are bit-identical; the registry s16
    value-oracle and the golden tests pin that.
    Returns (query_id, doc_id, pick_order, mmr)."""
    lam_f = float(lam)
    k_n = int(k)

    def greedy(key, cpdf, spdf):
        import pandas as _pd

        q = key[0]
        rel = {
            int(d): float(r)
            for d, r in zip(cpdf["doc_id"].tolist(), cpdf["rel"].tolist())
        }
        sim = {
            (int(a), int(b)): float(c)
            for a, b, c in zip(
                spdf["a"].tolist(), spdf["b"].tolist(), spdf["cos"].tolist()
            )
        }
        if not rel:
            return _pd.DataFrame(
                {
                    "query_id": _pd.Series([], dtype="int64"),
                    "doc_id": _pd.Series([], dtype="int64"),
                    "pick_order": _pd.Series([], dtype="int64"),
                    "mmr": _pd.Series([], dtype="float64"),
                }
            )
        # seed: max rel, ties on doc_id ASC (the r9 seed window's order)
        seed = min(rel, key=lambda d: (-rel[d], d))
        out_doc = [seed]
        out_mmr = [lam_f * rel[seed]]
        selected = [seed]
        remaining = set(rel) - {seed}
        for _t in range(2, k_n + 1):
            best = None
            best_mmr = None
            for d in sorted(remaining):
                pair = [sim[(d, s)] for s in selected if (d, s) in sim]
                if not pair:
                    # no sim row to any selected doc — the inner join in
                    # the unrolled form dropped such candidates; keep
                    # that exact behaviour
                    continue
                mmr_v = lam_f * rel[d] - (1.0 - lam_f) * max(pair)
                if best is None or mmr_v > best_mmr:
                    best, best_mmr = d, mmr_v
            if best is None:
                break
            out_doc.append(best)
            out_mmr.append(best_mmr)
            selected.append(best)
            remaining.discard(best)
        return _pd.DataFrame(
            {
                "query_id": [q] * len(out_doc),
                "doc_id": out_doc,
                "pick_order": list(range(1, len(out_doc) + 1)),
                "mmr": out_mmr,
            }
        )

    return (
        cand.groupBy("query_id")
        .cogroup(sims.groupBy("query_id"))
        .applyInPandas(
            greedy, "query_id bigint, doc_id bigint, pick_order bigint, mmr double"
        )
    )
