"""Physical-plan shape asserts for the round-11 additions — the scale
claims in docs/SCALING.md, checked mechanically: top-K selections use
TakeOrderedAndProject (never a global sort), the SSIM pair join is a
hash join (never a nested loop), and the gram-overlap join shuffles on
the pair key rather than cross-joining gram relations."""

from db_migrator_spark.plans.inspect import plan_string

SF = "/root/testdata/sf0.001"


def test_rake_topk_never_full_sorts(spark):
    from db_migrator_spark.operators.text_metrics import (
        text_rake_keywords,
    )

    plan = plan_string(text_rake_keywords(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_gini_stump_argmin_is_take_ordered(spark):
    from db_migrator_spark.operators.stats4 import q_gini_stump

    plan = plan_string(q_gini_stump(spark, SF))
    assert "TakeOrderedAndProject" in plan
    # the rank pass must not smuggle in a partitionless window
    assert "No Partition Defined" not in plan


def test_kn_topk_never_full_sorts(spark):
    from db_migrator_spark.operators.text_lm import (
        text_kneser_ney_counts,
    )

    assert "TakeOrderedAndProject" in plan_string(
        text_kneser_ney_counts(spark, SF)
    )


def test_ssim_pair_join_is_hash_not_nlj(spark):
    from db_migrator_spark.operators.multimodal import (
        multimodal_image_ssim,
    )

    plan = plan_string(multimodal_image_ssim(spark, SF))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_bleu_overlap_never_cartesian(spark):
    from db_migrator_spark.operators.evals4 import eval_bleu_corpus

    plan = plan_string(eval_bleu_corpus(spark, SF))
    assert "CartesianProduct" not in plan


def test_hits_half_step_aggregates_map_side(spark):
    """Each HITS half-iteration's receiving-side SUM must carry a
    partial_sum (map-side combine) so hub skew is absorbed before the
    shuffle — the pagerank contract applied to graph5. The returned
    query's plan starts from checkpointed RDDs (the entity-grain
    rule), so the assert targets the half-step relation itself."""
    import pyspark.sql.functions as F

    from db_migrator_spark.operators.graph5 import (
        HITS_UNIT,
        _purchase_edges,
    )

    edges = _purchase_edges(spark, SF)
    hubs = (
        edges.select("c")
        .distinct()
        .select("c", F.lit(HITS_UNIT).cast("bigint").alias("h"))
    )
    araw = (
        edges.join(hubs, "c")
        .groupBy("s")
        .agg(F.sum("h").cast("bigint").alias("a"))
    )
    assert "partial_sum" in plan_string(araw)
