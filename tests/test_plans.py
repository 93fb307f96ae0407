"""Physical-plan regression audit: the plan SHAPES that matter at
100 TB, asserted at fixture scale. Catches silent regressions like a
broadcast hint getting dropped (join flips to a payload shuffle) or a
join condition bug degenerating into a cartesian product.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (
    QUERIES,
)

# Queries whose plans legitimately contain BroadcastNestedLoopJoin
# nodes — broadcast probe-set cross/inequality joins where the corpus
# side must stream against every (tiny) probe row — mapped to the
# EXACT expected node count. Pinning the count (instead of exempting
# the whole query) keeps BNLJ detection live for the query's OTHER
# joins: a lost equi-join key in, say, triangle_count's wedge joins
# or bloom_semi_join's residual semi-join would add a node and fail
# here (ADVICE r4).
BNLJ_ALLOWED = {
    # 1-row global-totals aggregate broadcast into the F-stat projection
    "anova_oneway": 1,
    # 1-row (k, N) totals aggregate broadcast into the weight projection
    "importance_weights": 1,
    # 1-row global month-count aggregate broadcast into the cv projection
    "xyz_demand_classes": 1,
    # 256-row register-index grid broadcast against the event types
    "hll_sketch": 1,
    # the same register grid, once per estimated sketch (merged +
    # direct)
    "hll_union": 2,
    # 1-row corpus-end aggregate broadcast (the kaplan_meier shape)
    "logrank_test": 1,
    # calendar-bounded month-ladder pair join (inequality condition)
    # + the 1-row tie-correction aggregate broadcast
    "mann_kendall_trend": 2,
    # |flags|-row moment-aggregate inequality self-join (pair frame)
    "cohens_d": 1,
    # 1-row count broadcast into the median-rank filter + 1-row
    # median broadcast into the sign projection
    "runs_test": 2,
    # 1-row corpus-end aggregate broadcast (same shape as kaplan_meier)
    "nelson_aalen": 1,
    "similarity_topk": 1,
    "knn_join": 1,
    "similarity_ivf": 2,
    "dedup_embedding_cosine": 1,
    "range_join_bands": 1,
    # 1-row scalar-subquery aggregate broadcast into the filter side
    "idle_high_balance": 1,
    # 1-row global-revenue-total aggregate broadcast into the share filter
    "part_revenue_share": 1,
    # 1-row distinct-counts aggregate broadcast against the 1-row stats agg
    "dq_profile": 3,
    # 1-row total + 1-row freqItems sketch output broadcast into the check
    "frequent_items_bounds": 2,
    # 1-row corpus-totals aggregate broadcast into the share projection
    "mixture_epochs": 1,
    # 1-row doc-count aggregate broadcast into the decile bucketing
    "vocab_growth": 1,
    # 3-row lag list broadcast against the slim daily-revenue series
    "autocorr_revenue": 1,
    # 1-row vocabulary-size aggregate broadcast into the smoothed
    # conditional-probability projection
    "bigram_lm_score": 1,
    # 1-row doc-count aggregate broadcast into the idf projection
    # (once — the weights frame is persisted and shared by the norms
    # aggregate and the inverted index)
    "tfidf_pairs": 1,
    # 1-row (n_days, total) aggregate broadcast into the scaled
    # deviation projection
    "cusum_changepoint": 1,
    # 1-row corpus-end max-timestamp aggregate broadcast into the
    # censoring flag projection
    "kaplan_meier": 1,
    # 1-row corpus-end max-order-date aggregate broadcast into the
    # recency projection
    "rfm_segments": 1,
    # 1-row corpus-statistics aggregate (N, df, avgdl) broadcast into
    # the per-doc scoring projection
    "bm25_topk": 1,
    # tiny-dim inequality self-join (edit-distance pair space)
    "fuzzy_name_match": 1,
    # two 1-row probe-vector broadcasts (multi-query retrieval fusion)
    "rrf_fusion": 2,
    # 1-row corpus-end max-week aggregate broadcast into the
    # right-censoring churn filter
    "growth_accounting": 1,
    # 1-row min-count aggregate broadcast into the per-source rates
    "temperature_mixture": 2,
    # 1-row bloom-bitmap aggregate broadcast into the map-side probe
    "bloom_semi_join": 1,
    # 1-row total-token-count aggregate broadcast into the
    # per-occurrence inverse-frequency projection (the CMS itself
    # joins through keyed equi-joins, not BNLJ)
    "rarity_filter": 1,
    # 1-row global-triangle-total broadcast onto every corner row
    "triangle_count": 1,
    # same 1-row total broadcast; the count staying at 1 ALSO pins
    # that both wedge joins keep their equi-keys (u; then b,c) — a
    # lost key would surface as a second BNLJ node here
    "triangle_count_oriented": 1,
    # tiny |sources| x |distinct lengths| dense CDF grid: broadcast
    # length-histogram aggregate crossed with the 20-row source list;
    # the grid subtree appears on BOTH sides of the argmax self-join
    # (max-per-source, then the rows attaining it), so the one
    # logical cross join shows up as two physical BNLJ nodes
    "ks_drift": 2,
    # 1-row node-count aggregate broadcast into the uniform r0 ranks
    # (visible since the PR loop became one lazy plan; the five
    # per-iteration contribution joins are all keyed equi-joins)
    "pagerank": 1,
    # 1-row max-shipdate aggregate broadcast into the per-line decay
    # weight projection
    "trending_items": 1,
    # 1-row degrees-of-freedom aggregate broadcast onto the tiny
    # contingency-cell frame
    "chi_square_assoc": 1,
    # broadcast anchor-batch cross join against the corpus (the
    # knn_join shape); the pos/neg split is conditional aggregation,
    # not a second pass — the count staying at 1 pins that
    "hard_negatives": 1,
}


def _formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def _bnlj_count(plan: str) -> int:
    """Number of BroadcastNestedLoopJoin nodes: each node has exactly
    one '(n) BroadcastNestedLoopJoin' detail header in formatted
    explain (the tree line references the same (n))."""
    import re

    return len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_and_controlled_bnlj(spark, sf_dir, name):
    plan = _formatted_plan(spark, QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    expected = BNLJ_ALLOWED.get(name, 0)
    got = _bnlj_count(plan)
    assert got == expected, (
        f"{name}: {got} nested-loop joins, expected {expected} — a "
        f"broadcast hint or equi-join condition was probably lost "
        f"(or a new intentional 1-row broadcast needs its count pinned)"
    )


def test_scan_prunes_columns(spark, sf_dir):
    """Projection pushdown must reach the parquet scan: a 5-column
    select over 16-column lineitem reads exactly those columns."""
    plan = _formatted_plan(spark, QUERIES["filter_project"](spark, sf_dir))
    scan = next(
        block
        for block in plan.split("\n\n")
        if "Scan parquet" in block and "ReadSchema" in block
    )
    read_schema = next(
        line for line in scan.splitlines() if "ReadSchema" in line
    )
    for col in ("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"):
        assert col in read_schema
    assert "l_comment" not in read_schema and "l_shipmode" not in read_schema


def test_filter_pushes_down(spark, sf_dir):
    plan = _formatted_plan(spark, QUERIES["filter_project"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "LessThan" in plan


def test_q6_pushes_all_three_predicates(spark, sf_dir):
    """TPC-H Q6 is the canonical pushdown probe: the date range,
    discount band, and quantity cap must ALL reach the parquet scan
    so row groups outside the window are skipped at the source."""
    plan = _formatted_plan(spark, QUERIES["tpch_q6_forecast_revenue"](spark, sf_dir))
    scan = next(
        block
        for block in plan.split("\n\n")
        if "Scan parquet" in block and "PushedFilters" in block
    )
    pushed = next(line for line in scan.splitlines() if "PushedFilters" in line)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} predicate not pushed: {pushed}"


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Two tables bucketed+sorted on the join key must join with no
    Exchange and no extra Sort — the co-location contract that makes
    repeated fact-fact joins affordable at scale."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.writers import (
        write_bucketed,
    )

    orders = read_fixture(spark, sf_dir, "orders")
    lineitem = read_fixture(spark, sf_dir, "lineitem")
    write_bucketed(orders, "bkt_orders", ["o_orderkey"], 4, ["o_orderkey"])
    write_bucketed(lineitem, "bkt_lineitem", ["l_orderkey"], 4, ["l_orderkey"])
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force sort-merge: at fixture scale the dim side fits broadcast,
    # and a BroadcastHashJoin never shuffles its stream side anyway —
    # the co-location contract would pass vacuously
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("bkt_lineitem")
            .join(
                spark.table("bkt_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _formatted_plan(spark, joined)
        # formatted explain prints the tree root-first, so "everything
        # before the first HashAggregate" is just the header — count
        # Exchange nodes over the whole plan instead: exactly ONE may
        # remain (the post-join groupBy on o_orderpriority); the join
        # itself must read co-located buckets with no Exchange on
        # either side (an unbucketed plan has three).
        import re

        n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_exchange == 1, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        # row parity with a plain (shuffling) join
        expect = {
            (r.o_orderpriority, r.n)
            for r in lineitem.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {(r.o_orderpriority, r.n) for r in joined.collect()}
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_decontam_broadcasts_eval_side(spark, sf_dir):
    """The benchmark shingle set must broadcast (BroadcastHashJoin):
    at 100 TB the corpus side may never shuffle for this join."""
    plan = _formatted_plan(spark, QUERIES["decontam_overlap"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_star_cc_round_has_single_shuffle_per_star_op(spark):
    """One star round = groupBy min (one Exchange) + broadcast-able
    join back; the adjacency payload is (long, long) only."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.dedup import (
        _star_round,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 9)], "a long, b long"
    )
    plan = _formatted_plan(spark, _star_round(edges, large=True))
    assert "CartesianProduct" not in plan


def test_corpus_prep_never_shuffles_payload(spark, sf_dir):
    """The llm_prep module's core scale promise: no Exchange in the
    funnel plan carries the text payload column — only digests,
    shingle hashes, doc ids, and aggregation buffers move."""
    import re

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.llm_prep import (
        q_llm_corpus_prep,
    )

    plan = _formatted_plan(spark, q_llm_corpus_prep(spark, sf_dir))
    exchanges = re.findall(
        r"\(\d+\) Exchange[^\n]*\nInput \[[^\]]*\]: \[([^\]]*)\]", plan
    )
    assert exchanges, "expected Exchange nodes in the funnel plan"
    for cols in exchanges:
        assert "text#" not in cols, f"payload column shuffled: [{cols}]"


def test_incremental_near_history_band_index_probe_is_shuffle_free(spark, sf_dir):
    """The 100 TB contract stated in dedup.py's incremental-near
    docstring, converted into a regression-guarded fact: when the
    historical band index is MATERIALIZED as a table bucketed+sorted
    on (band_id, k1, k2) — the at-scale deployment shape — the
    per-batch probe join must not re-shuffle the history side.
    Exactly ONE Exchange may appear in the candidate-join plan (the
    small batch side repartitioning to the index's bucket layout);
    the bucketed history scan feeds the join directly."""
    import re

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators import (
        dedup as D,
    )
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.writers import (
        write_bucketed,
    )

    banded = (
        D._shingled(spark, sf_dir)
        .select("doc_id", F.explode(F.expr(D._md5_bands_expr())).alias("bk"))
        .select("doc_id", "bk.band_id", "bk.k1", "bk.k2")
    )
    is_batch = F.col("doc_id") % D.BATCH_MOD == D.BATCH_MOD - 1
    keys = ["band_id", "k1", "k2"]
    write_bucketed(banded.filter(~is_batch), "band_index_hist", keys, 4, keys)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the sort-merge path: at real scale the batch outgrows
    # broadcast, and a broadcast plan would vacuously pass this test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hist = spark.table("band_index_hist").alias("h")
        batch = banded.filter(is_batch).alias("b")
        # the join itself is the plan under test; the downstream
        # distinct's own Exchange (on the id pair) is not
        joined = batch.join(hist, keys).select(
            F.col("b.doc_id").alias("doc_id"),
            F.col("h.doc_id").alias("matched_doc_id"),
        )
        plan = _formatted_plan(spark, joined)
        assert "SortMergeJoin" in plan
        assert re.search(r"Bucketed: true", plan), "history scan not bucketed"
        n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_exchange == 1, (
            f"expected exactly 1 Exchange (batch side only), got "
            f"{n_exchange}:\n{plan}"
        )
        candidates = joined.distinct()
        # value parity with the in-session (unbucketed) derivation
        b2, h2 = batch.alias("b2"), banded.filter(~is_batch).alias("h2")
        expect = {
            (r.doc_id, r.matched_doc_id)
            for r in b2.join(h2, keys)
            .select(
                F.col("b2.doc_id").alias("doc_id"),
                F.col("h2.doc_id").alias("matched_doc_id"),
            )
            .distinct()
            .collect()
        }
        got = {(r.doc_id, r.matched_doc_id) for r in candidates.collect()}
        assert got == expect and got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS band_index_hist")


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact",
        "dedup_normalized",
        "dedup_ngram_jaccard",
        "dedup_containment",
        "dedup_minhash_lsh",
        "leakfree_split",
        "source_cap",
        "dedup_incremental_near",
        "passage_dedup",
        "dedup_simhash_pairs",
        # shuffles 20-token passages by design (CCNet layout) but must
        # never move the full document text through an Exchange
        "passage_dedup_global",
    ],
)
def test_dedup_family_never_shuffles_payload(spark, sf_dir, name):
    """The dedup/quota family's core scale promise, same pin as
    llm_prep's: no Exchange in any plan carries the text payload —
    only digests, shingle hashes, band keys, ids, and aggregation
    buffers move. At 100 TB a payload shuffle is the difference
    between moving kilobytes per row and moving the corpus."""
    import re

    plan = _formatted_plan(spark, QUERIES[name](spark, sf_dir))
    exchanges = re.findall(
        r"\(\d+\) Exchange[^\n]*\nInput \[[^\]]*\]: \[([^\]]*)\]", plan
    )
    assert exchanges, f"{name}: expected Exchange nodes in the plan"
    for cols in exchanges:
        # match the raw source column `text#NN` only — derived outputs
        # like `cleaned_text#NN` (a rewrite's RESULT, necessarily in
        # its final sort exchange) are not the corpus payload
        assert not re.search(r"(?<![A-Za-z0-9_])text#", cols), (
            f"{name}: payload column shuffled: [{cols}]"
        )


@pytest.mark.parametrize(
    "name",
    [
        "text_stats",
        "quality_score",
        "token_count",
        "token_diversity",
        "lang_id",
        "fingerprint",
        "fingerprint_rolling",
        "gopher_rules",
        "span_dedup_trim",
    ],
)
def test_per_doc_text_metrics_are_map_side(spark, sf_dir, name):
    """text.py's module-level scale promise, pinned: per-document
    metrics are pure map-side expression work — the ONLY Exchange
    allowed in their plans is the final rangepartitioning that sorts
    the (already narrow) metric output for deterministic oracle
    comparison. A hashpartitioning Exchange appearing here means an
    aggregation/join snuck into what must stay an O(rows/splits)
    embarrassingly-parallel scan at 100 TB."""
    import re

    plan = _formatted_plan(spark, QUERIES[name](spark, sf_dir))
    hash_ex = re.findall(
        r"\(\d+\) Exchange[^\n]*\n(?:[^\n]*\n)*?Arguments: (hashpartitioning[^,]*)",
        plan,
    )
    assert not hash_ex, f"{name}: unexpected shuffle(s) {hash_ex}"


# Raw wide-payload source columns (multi-KB strings / float arrays /
# binary blobs) that must never ride through a single-partition
# Exchange: a global window or ordered collect funnels EVERY row of
# its input through one task, so slim ids and aggregation buffers are
# fine but corpus payloads are a guaranteed OOM at 100x scale
# (ADVICE r7: vocab_growth shipped `text` through its global rank).
_PAYLOAD_COLS = ("text#", "embedding#", "data#", "content#")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_payload_through_single_partition_exchange(spark, sf_dir, name):
    """Registry-wide pin: no Exchange SinglePartition node carries a
    raw payload column. Global windows/sorts must rank slim key
    frames and join the payload back (or aggregate first)."""
    import re

    plan = _formatted_plan(spark, QUERIES[name](spark, sf_dir))
    for block in plan.split("\n\n"):
        first = block.lstrip().splitlines()[0] if block.strip() else ""
        if not re.match(r"\(\d+\) Exchange", first):
            continue
        if "SinglePartition" not in block:
            continue
        input_line = next(
            (ln for ln in block.splitlines() if ln.startswith("Input")), ""
        )
        for payload in _PAYLOAD_COLS:
            assert payload not in input_line, (
                f"{name}: payload column {payload!r} funnels through a "
                f"SinglePartition exchange: {input_line}"
            )


@pytest.mark.parametrize("name", ["pps_sample", "exact_stratified_split"])
def test_sampler_scans_never_read_text(spark, sf_dir, name):
    """The round-6 samplers' scale promise: both are decisions ABOUT
    documents that never need the documents — selection is pure
    (source, doc_id, weight) arithmetic, so column pruning must strip
    the text payload at the parquet scan. A text# column appearing in
    ReadSchema (or any Exchange) means a refactor started shipping
    the corpus through the sampler's window shuffle."""
    import re

    plan = _formatted_plan(spark, QUERIES[name](spark, sf_dir))
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "text" not in line, f"{name}: scan reads text: {line}"
    for cols in re.findall(
        r"\(\d+\) Exchange[^\n]*\nInput \[[^\]]*\]: \[([^\]]*)\]", plan
    ):
        assert "text#" not in cols, f"{name}: payload column shuffled: [{cols}]"


def test_skew_profile_scan_reads_only_key_columns(spark, sf_dir):
    """skew_profile stacks three join keys out of 16-column lineitem;
    pruning must reach the scan — the diagnosis of a 100 TB join must
    not itself read the fact table's payload."""
    plan = _formatted_plan(spark, QUERIES["skew_profile"](spark, sf_dir))
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        assert col in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


STATS_PRUNE = {
    # events carries a wide props payload column; none of the stats
    # queries need it — pruning must strip it at the scan
    "mad_outliers": ("props",),
    "concurrent_peak": ("props",),
    "ewma_value": ("props",),
    "interarrival_burstiness": ("props", "value"),
    # documents' text payload: the checksum/corr queries never touch
    # documents, but collocation/distinctive DO need text — so pin
    # the events/orders family only
}


@pytest.mark.parametrize("name", sorted(STATS_PRUNE))
def test_stats_queries_prune_unused_payloads(spark, sf_dir, name):
    """operators/stats.py scale promise: the observability queries
    are decisions ABOUT events that never need the wide props payload
    (and burstiness not even the value) — column pruning must strip
    them at the parquet scan, or a 100 TB profile run pays full-row
    I/O for a three-column computation."""
    plan = _formatted_plan(spark, QUERIES[name](spark, sf_dir))
    for line in plan.splitlines():
        if "ReadSchema" in line:
            for col in STATS_PRUNE[name]:
                assert f"{col}:" not in line, (
                    f"{name}: scan reads pruned column {col}: {line}"
                )


def test_partition_checksums_shuffles_only_aggregates(spark, sf_dir):
    """The checksum fold must combine map-side: the one
    hashpartitioning Exchange carries per-partition (month, count,
    partial decimal sum) rows — never per-row digests. A partial
    HashAggregate below the Exchange is the codegen'd map-side
    combine; its absence means every row's hash travels the wire."""
    import re

    plan = _formatted_plan(
        spark, QUERIES["partition_checksums"](spark, sf_dir)
    )
    hash_ex = re.findall(r"hashpartitioning", plan)
    assert len(hash_ex) == 1, f"expected one hash shuffle, saw {len(hash_ex)}"
    # formatted explain lists HashAggregate keys/functions; the
    # partial-mode aggregate appears as two HashAggregate nodes
    n_agg = len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M))
    assert n_agg >= 2, "map-side partial aggregation missing"


# The lineitem fixture has 11 physical columns; a query that uses a
# handful must never scan them all. Pin the pruned width for the
# round-8 fact-heavy queries: (query, max columns the lineitem scan
# may read). At 100 TB, reading 11 columns for a 3-column aggregate
# is the difference between a morning and an afternoon.
LINEITEM_PRUNE_PINS = [
    ("pareto_abc", 3),
    ("market_concentration", 3),
    ("spearman_corr", 4),
    ("trimmed_stats", 2),
    ("revenue_proration", 2),
    ("ship_delay_profile", 2),
]


@pytest.mark.parametrize("name,max_cols", LINEITEM_PRUNE_PINS)
def test_lineitem_scan_prunes_columns(spark, sf_dir, name, max_cols):
    plan = _formatted_plan(spark, QUERIES[name](spark, sf_dir))
    scans = [
        line
        for block in plan.split("\n\n")
        if "Scan parquet" in block and "lineitem" in block
        for line in block.splitlines()
        if "ReadSchema" in line
    ]
    assert scans, f"{name}: no lineitem scan found in plan"
    for line in scans:
        # ReadSchema: struct<a:double,b:int,...>
        inner = line.split("struct<", 1)[1].rsplit(">", 1)[0]
        ncols = len([c for c in inner.split(",") if ":" in c])
        assert ncols <= max_cols, (
            f"{name}: lineitem scan reads {ncols} columns (cap "
            f"{max_cols}): {line.strip()}"
        )


def test_spearman_has_no_rank_windows(spark, sf_dir):
    """VERDICT r8 regression pin: spearman_corr's ranks must come
    from the contingency-ladder join-back, never from rank() windows
    partitioned by the 3-value return flag (parallelism 3 at any
    cluster size). The only windows allowed are cumulative sums over
    the slim distinct-value ladders."""
    plan = _formatted_plan(spark, QUERIES["spearman_corr"](spark, sf_dir))
    assert "rank(" not in plan
    # the ladder windows aggregate ct, never a payload measure
    for block in plan.split("\n\n"):
        lines = block.lstrip().splitlines()
        if not lines or "Window" not in lines[0]:
            continue
        assert "sum(ct" in block, lines[0]


def test_kendall_tau_never_pairs_rows(spark, sf_dir):
    """kendall_tau computes pair counts from the densified grid —
    the plan must contain no join of the row-level lineitem relation
    with itself (only grid-sized joins) and no row-level window: the
    lineitem scan feeds aggregates exclusively."""
    plan = _formatted_plan(spark, QUERIES["kendall_tau"](spark, sf_dir))
    # every window in the plan cumulates grid counts, not row payloads
    for block in plan.split("\n\n"):
        lines = block.lstrip().splitlines()
        if not lines or "Window" not in lines[0]:
            continue
        assert "sum(n#" in block or "sum(c_" in block, lines[0]
    # no cartesian/BNLJ anywhere (the densify join is an equi join)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """The point of q_bucketed_join: both sides are bucketed+sorted by
    the join key, so the sort-merge join consumes the bucket layout
    with NO Exchange on either join input (the storage-co-located
    join that removes both full-table shuffles from a recurring
    big-big join). The aggregate after the join may still exchange —
    only the join inputs are pinned."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.analytics import (
        bucketed_join_frame,
        bucketed_pair,
    )

    import re

    ot, lt = bucketed_pair(spark, sf_dir, "plantest")
    try:
        plan = _formatted_plan(spark, bucketed_join_frame(spark, ot, lt))
        assert "SortMergeJoin" in plan
        # exactly ONE Exchange in the whole plan — the post-join
        # partial->final aggregate; neither join input shuffles
        exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
        assert len(exchanges) == 1, plan.split("\n\n")[0]
        assert plan.count("Bucketed: true") == 2  # both scans bucketed
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {lt}")


def test_scd2_apply_windows_share_one_exchange(spark):
    """scd2_apply's two windows (lag run-collapse, lead interval
    close) share ONE Exchange+Sort over the point union — the same
    single-shuffle property pinned for scd2. The only other
    exchanges in the plan are the tombstone anti-join's two sides
    (keys + valid_to), which is the inherent cost of detecting
    prior deletes. A regression that re-sorts or re-shuffles between
    the windows doubles the rebuild's cost at every streaming epoch."""
    import re

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.merge import (
        scd2_apply,
    )

    hist = spark.createDataFrame(
        [(1, "a", 10, 20, False), (1, "b", 20, None, True)],
        "k int, v string, valid_from int, valid_to int, is_current boolean",
    )
    ch = spark.createDataFrame(
        [(1, "c", 30, 0)], "k int, v string, ts int, seq int"
    )
    plan = _formatted_plan(
        spark, scd2_apply(hist, ch, ["k"], ["v"], "ts", tiebreak="seq")
    )
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) == 3, plan.split("\n\n")[0]  # window + anti-join x2
    windows = re.findall(r"^\(\d+\) Window", plan, re.M)
    assert len(windows) == 2
    # both windows partition on the keys and there is exactly ONE
    # keys-only exchange feeding them (the other two carry the
    # anti-join's composite key)
    assert len(re.findall(r"hashpartitioning\(k#\d+, \d+\)", plan)) == 1
