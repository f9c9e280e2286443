"""Physical-plan shape tests: the properties that matter at 100 TB.

Every operator passing correctness is necessary; these tests pin the
plans we designed — pushdown reaching the scan, dimension joins going
broadcast, bounded shuffle counts — so a regression shows up as a test
failure, not a 10x slowdown at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from radient_spark import plans
from radient_spark.catalog import load_tables
from radient_spark.queries import QUERIES


def test_q01_filter_pushdown_and_pruning(spark, sf_dir):
    df = QUERIES["q01_pricing_summary"][0](spark, sf_dir)
    assert plans.has_pushed_filter(df, "l_shipdate")
    assert plans.reads_only_columns(
        df,
        {
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        },
    )


def test_q03_broadcasts_customer(spark, sf_dir):
    df = QUERIES["q03_shipping_priority"][0](spark, sf_dir)
    assert plans.uses_broadcast_join(df)
    assert plans.has_pushed_filter(df, "c_mktsegment")


def test_q05_star_join_single_agg_shuffle(spark, sf_dir):
    df = QUERIES["q05_regional_revenue"][0](spark, sf_dir)
    assert plans.uses_broadcast_join(df)
    # all dims broadcast -> the ONLY shuffle is the final 25-row
    # aggregate exchange — anything more means a dim fell out of broadcast
    assert plans.shuffle_count(df) == 1, plans.formatted_plan(df)


def test_asof_join_single_shuffle(spark, sf_dir):
    df = QUERIES["q_asof_purchase_click"][0](spark, sf_dir)
    # union + window = one shuffle on the key plus the clicks pre-agg;
    # no range-join explosion
    assert plans.shuffle_count(df) == 2, plans.formatted_plan(df)


def test_knn_join_corpus_not_shuffled(spark, sf_dir):
    # candidate generation happens in mapInPandas before any exchange;
    # the only shuffle is the per-query window over ~k*partitions rows
    df = QUERIES["q_vec_nearest_neighbor"][0](spark, sf_dir)
    assert plans.shuffle_count(df) <= 2, plans.formatted_plan(df)


def test_minhash_no_shuffle(spark, sf_dir):
    df = QUERIES["q_minhash_signatures"][0](spark, sf_dir)
    assert plans.shuffle_count(df) == 0, plans.formatted_plan(df)


def test_filtered_search_pushes_metadata_predicate(spark, sf_dir):
    """The Milvus-parity filtered search must push the lang filter into
    the documents scan and broadcast the filtered dim — the filter runs
    before any vector math."""
    df = QUERIES["q_corpus_filtered_search"][0](spark, sf_dir)
    assert plans.has_pushed_filter(df, "lang")
    assert plans.uses_broadcast_join(df)


def test_scan_prunes_columns_on_projection(spark, sf_dir):
    li = load_tables(spark, sf_dir)["lineitem"]
    df = li.select("l_orderkey", "l_quantity")
    assert plans.reads_only_columns(df, {"l_orderkey", "l_quantity"})
