"""Physical-plan shape assertions (SURVEY §4): the optimizations we
rely on at 100 TB must be visible in .explain — pushdown reaching the
parquet scan, broadcast joins for the dims, shuffle-free depreciation,
exactly one exchange in the salted extraction pipeline."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import pdf_parser_spark.queries_data as qd
import pdf_parser_spark.queries_ref as qr
from pdf_parser_spark.extract import extract_documents, salted

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_and_pruning(spark):
    p = plan_of(qd.q_lineitem_agg(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in p
    # column pruning: the scan must not read unused columns
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_broadcast_joins_for_dims(spark):
    p = plan_of(qd.q_nation_revenue_topk(spark, SF))
    # formatted mode lists each node in the tree AND a detail section
    assert p.count(") BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_ladder_is_broadcast_range_join(spark):
    p = plan_of(qr.q_ladder_range_join(spark, SF))
    assert "BroadcastNestedLoopJoin" in p
    assert "Exchange hashpartitioning" not in p  # fact side never shuffles


def test_depreciation_schedule_is_shuffle_free(spark):
    from pdf_parser_spark import depreciation as dep

    inp = qr._depr_inputs(spark, SF, 101, 0)
    sched = dep.depreciation_schedule(dep.with_engine_inputs(inp), years=10)
    p = plan_of(sched)
    assert "Exchange" not in p  # explode(sequence) + literal lookups only
    assert ") Generate" in p  # the year-grid explode


def test_extraction_single_exchange(spark):
    pages = spark.createDataFrame(
        [("u1", None, b"%PDF-x", None, "en")],
        "url string, warc_ts timestamp_ntz, html binary, text string, lang string",
    )
    df = extract_documents(salted(pages, 4))
    p = plan_of(df)
    assert p.count(") Exchange") == 1  # exactly the salting repartition
    assert "ArrowEvalPython" in p or "MapInPandas" in p


def test_record_extraction_is_native(spark):
    """The white-text record path must stay JVM-side: no Python eval
    nodes, no shuffle."""
    p = plan_of(qr.q_whitetext_record(spark, SF))
    assert "Python" not in p
    assert "Exchange" not in p


def test_window_plan(spark):
    p = plan_of(qd.q_window_cumsum(spark, SF))
    assert "Window" in p
    assert "PushedFilters" in p


def test_ivf_assign_no_global_window(spark):
    """Round-2 fix: centroid selection must not funnel the corpus
    through a single task (no Window/global Sort; the only exchanges
    are the map-side-combined centroid agg and its tiny broadcast)."""
    from pdf_parser_spark import simsearch

    df = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 17).cast("double") for i in range(4)]).alias(
            "embedding"
        ),
    )
    p = plan_of(simsearch.ivf_assign(df, n_centroids=8))
    assert ") Window" not in p
    # min_by's SortAggregate sorts are partition-LOCAL (global=false);
    # a global sort (the round-1 scale-killer) would show "], true, 0"
    for line in p.splitlines():
        if line.startswith("Arguments: [") and line.rstrip().endswith(", 0"):
            assert "], false, 0" in line, f"global sort in ivf_assign plan: {line}"
    assert "partial_min_by" in p  # map-side combine before the shuffle


def test_corpus_select_plan_shape(spark):
    """The corpus-selection pipeline is ONE dedup shuffle + the fuzzy
    cluster-keeper equi-joins + projections: append-mode operator
    chaining must leave no OTHER join in the plan, and the iterative
    connected-components work must stay behind its checkpoint (the
    round-over-round star-contraction joins never pile into this
    plan). Gates stay native (no Python in the final plan)."""
    import pdf_parser_spark.queries_data as qd2

    p = plan_of(qd2.q_corpus_select(spark, SF))
    # exactly two equi-joins: canon⋈keepers and doc⋈cluster-labels
    n_joins = sum(
        line.count("Join")
        for line in p.splitlines()
        if line.startswith("(") and "Join" in line
    )
    assert n_joins == 2, f"expected 2 joins, plan has {n_joins}"
    assert "partial_min_by" in p  # the dedup agg map-side combine
    assert "Scan ExistingRDD" in p  # CC result enters via checkpoint


def _agg_exchanges(p: str) -> int:
    """Count Exchange nodes in the formatted-plan tree section (INCLUDING
    the _docs() input-spread repartition — callers budget for it)."""
    # tree lines look like '+- Exchange (9)'; detail lines '(9) Exchange'
    tree = [l for l in p.splitlines() if "+- Exchange (" in l or l.startswith("Exchange (")]
    return len(tree)


def test_boilerplate_lines_distinct_agg_shape(spark):
    """Line-level dedup: because the input is already hash-partitioned
    by doc_id, the (line, doc_id) distinct phase is PARTITION-LOCAL —
    only the final merge shuffles on line. Input spread + ONE aggregate
    exchange, map-side partials, no Python."""
    p = plan_of(qd.q_boilerplate_lines(spark, SF))
    assert _agg_exchanges(p) == 2  # input spread + final line shuffle
    assert "partial_count" in p  # map-side combine before the shuffle
    assert "Python" not in p  # explode/trim/filter stay native


def test_domain_stats_distinct_agg_shape_no_udf(spark):
    p = plan_of(qd.q_domain_stats(spark, SF))
    assert _agg_exchanges(p) == 3  # input spread + the distinct-agg pair
    assert "Python" not in p  # host/suffix parsing stays native


def test_cc_round_clamped_exchanges_only(spark):
    """One star-contraction round must shuffle exactly 3 times, every
    exchange an explicit REPARTITION_BY_NUM on the clamp count — if
    someone "simplifies" the repartition(n, key) nodes away, the
    groupBy/join/distinct fall back to EnsureRequirements exchanges at
    the session's shuffle.partitions (the empty-task sea this guards
    against, and a session-conf dependency the operator must not have)."""
    from pdf_parser_spark import textops

    # production-faithful input: the loop always runs over a
    # localCheckpoint (unknown stats → no auto-broadcast shortcuts)
    e = spark.range(100).select(
        (F.col("id") % 37).alias("u"), (F.col("id") % 11).alias("v")
    ).localCheckpoint(eager=True)
    p = plan_of(textops._cc_round(e, 8))
    detail = [l for l in p.splitlines() if l.startswith("Arguments: hashpartitioning")]
    assert len(detail) >= 3, f"expected the 3 clamp exchanges:\n{p}"
    for line in detail:
        assert "REPARTITION_BY_NUM" in line, f"non-explicit exchange: {line}"
        assert ", 8)," in line, f"clamp count not applied: {line}"
    assert "ENSURE_REQUIREMENTS" not in p
    assert "SinglePartition" not in p


def test_connected_components_checkpointed_no_conf_mutation(spark):
    """The iterative lineage must be truncated (result reads from the
    checkpoint RDD, not a round-over-round join tower) and the session
    shuffle conf must come back untouched."""
    from pdf_parser_spark import textops

    before = spark.conf.get("spark.sql.shuffle.partitions")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (9, 9)], "id_a long, id_b long"
    )
    cc = textops.connected_components(pairs)
    p = plan_of(cc)
    assert "Scan ExistingRDD" in p  # CC result enters via checkpoint
    assert ") Join" not in p  # no star-contraction join survives
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    got = {(r.node_id, r.cluster_id) for r in cc.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}


def test_top_k_per_key_two_stage_window(spark):
    """Skew-safe quota: two row_number windows (salted partial + exact),
    and never a single-partition exchange (the naive global form)."""
    from pdf_parser_spark import textops

    df = spark.range(500).select(
        (F.col("id") % 3).cast("string").alias("domain"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).cast("double").alias("score"),
    )
    out = textops.top_k_per_key(
        df, ["domain"], [F.desc("score"), F.asc("doc_id")], 5, "doc_id"
    )
    p = plan_of(out)
    n_windows = sum(1 for l in p.splitlines() if l.rstrip().endswith(") Window"))
    assert n_windows == 2, f"expected 2 window stages:\n{p}"
    assert "SinglePartition" not in p
    # stage-1 partitions by (key, salt); stage-2 by key alone
    assert any("hashpartitioning(domain" in l and "_salt" in l for l in p.splitlines())
