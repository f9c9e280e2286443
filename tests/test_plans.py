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


def test_q06_full_pushdown_no_data_shuffle(spark, sf_dir):
    """Q6 is the canonical pushdown probe: all three predicates and the
    4-column projection must reach the parquet scan; the only exchange
    is the one-row final-aggregate gather."""
    df = QUERIES["q06_forecast_revenue"][0](spark, sf_dir)
    assert plans.has_pushed_filter(df, "l_shipdate")
    assert plans.has_pushed_filter(df, "l_discount")
    assert plans.reads_only_columns(
        df, {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
    )
    assert plans.shuffle_count(df) <= 1, plans.formatted_plan(df)


def test_q19_disjunction_pushed_to_lineitem_scan(spark, sf_dir):
    """The OR-of-ANDs must not block pushdown: Catalyst extracts the
    per-table disjunction (l_quantity ranges) into the lineitem scan and
    keeps part on the broadcast side."""
    df = QUERIES["q19_disjunctive_revenue"][0](spark, sf_dir)
    assert plans.has_pushed_filter(df, "l_quantity")
    assert plans.uses_broadcast_join(df)
    assert plans.shuffle_count(df) <= 1, plans.formatted_plan(df)


def test_q09_dims_broadcast(spark, sf_dir):
    """part/supplier/nation ride broadcast; only the orders join and the
    (nation, year) aggregate may shuffle."""
    df = QUERIES["q09_product_profit"][0](spark, sf_dir)
    assert plans.uses_broadcast_join(df)
    assert plans.shuffle_count(df) <= 4, plans.formatted_plan(df)


def test_q21_self_joins_bounded_shuffles(spark, sf_dir):
    """Semi + anti lineitem self-joins share l_orderkey as the join key;
    supplier stays broadcast. Bounds the exchange count so a plan
    regression (e.g. a dim falling out of broadcast) fails loudly."""
    df = QUERIES["q21_waiting_supplier"][0](spark, sf_dir)
    assert plans.uses_broadcast_join(df)
    assert plans.shuffle_count(df) <= 6, plans.formatted_plan(df)


def test_q20_part_filter_broadcast_into_scan(spark, sf_dir):
    """Both aggregation levels ride the same filtered lineitem scan; the
    gear-part filter is broadcast, never shuffled with the fact rows."""
    df = QUERIES["q20_dominant_supplier"][0](spark, sf_dir)
    assert plans.uses_broadcast_join(df)
    assert plans.has_pushed_filter(df, "p_name")


def test_scan_prunes_columns_on_projection(spark, sf_dir):
    li = load_tables(spark, sf_dir)["lineitem"]
    df = li.select("l_orderkey", "l_quantity")
    assert plans.reads_only_columns(df, {"l_orderkey", "l_quantity"})


def test_similarity_self_join_single_shuffle_no_broadcast(spark, sf_dir):
    # block GEMM: ONE shuffle (the bucket-pair grouping) feeds the
    # grouped-pandas stage; no corpus broadcast, no driver collect
    df = QUERIES["q_vec_similar_pairs"][0](spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "FlatMapGroupsInPandas" in plan
    assert "BroadcastExchange" not in plan, plan
    assert plans.shuffle_count(df) == 1, plan


def test_knn_join_blocked_no_broadcast(spark, sf_dir):
    # bipartite block GEMM: neither side broadcasts; shuffles = the
    # bucket-pair grouping + the final per-query window
    df = QUERIES["q_vec_knn_blocked"][0](spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "FlatMapGroupsInPandas" in plan
    assert "BroadcastExchange" not in plan, plan
    assert plans.shuffle_count(df) == 2, plan


def test_hash_split_is_map_only(spark, sf_dir):
    from radient_spark.operators.dataset import hash_split

    docs = load_tables(spark, sf_dir)["documents"]
    df = hash_split(docs, "doc_id").select("doc_id", "split")
    assert plans.shuffle_count(df) == 0, plans.formatted_plan(df)


def test_sequential_pack_single_shuffle(spark, sf_dir):
    from radient_spark.operators.dataset import sequential_pack

    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "source", "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_toks"),
    )
    df = sequential_pack(
        toks, token_col="n_toks", order_col="doc_id",
        partition_cols=["source"], budget=512,
    )
    assert plans.shuffle_count(df) == 1, plans.formatted_plan(df)


def test_ann_search_df_query_side_stays_executor(spark, sf_dir):
    # DataFrame-native descent: the query table feeds a MapInPandas
    # (executor-side descent), never a driver collect
    from radient_spark.ann import AnnIndex

    emb = load_tables(spark, sf_dir)["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    index = AnnIndex.build(emb, n_trees=2, max_leaf_size=100, seed=42)
    qdf = emb.limit(3).select(F.col("id").alias("qid"), F.col("vector").alias("qvec"))
    plan = plans.formatted_plan(index.search_df(qdf, k=5))
    assert "MapInPandas" in plan


def test_semdedup_shuffles_on_cluster_key_only(spark, sf_dir):
    # the whole point of SemDeDup: the pair join is an equi-join on the
    # cluster key — each side shuffles once (or broadcasts), never a
    # cartesian of the corpus
    from radient_spark.operators.cluster import kmeans_fit, semdedup_pairs

    emb = load_tables(spark, sf_dir)["embeddings"]
    cents = kmeans_fit(emb, "embedding", "vec_id", k=4, iters=1)
    df = semdedup_pairs(emb, "embedding", "vec_id", cents, threshold=0.4)
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    # one exchange on the cluster key feeding the per-cluster GEMM group
    assert plans.shuffle_count(df) == 1, plan
    assert "FlatMapGroupsInPandas" in plan, plan


def test_temperature_sample_broadcasts_thresholds(spark, sf_dir):
    # the per-stratum threshold table is k rows — it must broadcast so
    # the corpus scan stays shuffle-free
    from radient_spark.operators.dataset import temperature_sample

    docs = load_tables(spark, sf_dir)["documents"]
    df = temperature_sample(docs, "lang", "doc_id")
    assert plans.uses_broadcast_join(df), plans.formatted_plan(df)


def test_sq8_topk_corpus_never_shuffles(spark, sf_dir):
    # encode + score are per-row folds; the global top-k must compile to
    # TakeOrderedAndProject with zero exchanges of the corpus
    df = QUERIES["q_sq8_topk"][0](spark, sf_dir)
    assert plans.shuffle_count(df) == 0, plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in plans.formatted_plan(df)


def test_perplexity_vocab_join_broadcasts(spark, sf_dir):
    # the surprisal vocab is the small side by the CCNet contract — the
    # corpus token stream must stay on its scan side of a broadcast join
    df = QUERIES["q_perplexity_buckets"][0](spark, sf_dir)
    assert plans.uses_broadcast_join(df), plans.formatted_plan(df)


def test_dsir_lambda_table_broadcasts(spark, sf_dir):
    # the per-bucket log-likelihood-ratio table is `buckets` rows; the
    # raw-corpus feature stream joins it broadcast, never shuffled by bucket
    df = QUERIES["q_dsir_logweights"][0](spark, sf_dir)
    assert plans.uses_broadcast_join(df), plans.formatted_plan(df)


def test_repeated_ngram_shuffles_hashes_not_text(spark, sf_dir):
    # gram text must be projected away before any exchange: the shuffles
    # carry (id, pos, gh) only
    df = QUERIES["q_repeated_ngram_report"][0](spark, sf_dir)
    plan = plans.formatted_plan(df)
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "gram" not in m.group(1) or "gh" in m.group(1), m.group(0)


def test_text_pipelines_tokenize_once(spark, sf_dir):
    # the Generate barrier (functions/stage.py) must keep the tokenize
    # lineage evaluated once per row: if CollapseProject inlines it again,
    # split() reappears across the signature folds
    for q in ["q_minhash_signatures", "q_simhash_fingerprints"]:
        df = QUERIES[q][0](spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("split(") <= 2, (q, plan.count("split("))


def test_classifier_serving_zero_shuffle_no_python(spark, sf_dir):
    """Model serving is a literal-weight Catalyst expression: zero
    exchanges, zero Python workers — the whole plan is scan+project."""
    from radient_spark.catalog import load_tables as _lt
    from radient_spark.operators.classify import linear_classifier_score

    docs = _lt(spark, sf_dir)["documents"].select("doc_id", "text")
    df = linear_classifier_score(docs, [0.5] * 64)
    assert plans.shuffle_count(df) == 0, plans.formatted_plan(df)
    p = plans.formatted_plan(df)
    assert "InPandas" not in p and "BatchEvalPython" not in p


def test_merge_upsert_single_shuffle(spark, sf_dir):
    """Union + per-key window = exactly one hash exchange on the key."""
    from radient_spark.operators.merge import merge_upsert

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    df = merge_upsert(docs, delta, ["doc_id"])
    assert plans.shuffle_count(df) == 1, plans.formatted_plan(df)


def test_zorder_code_is_pure_projection(spark, sf_dir):
    """The Morton code adds no exchange and no Python to the scan."""
    from radient_spark.operators.layout import z_value

    orders = load_tables(spark, sf_dir)["orders"]
    df = orders.select(
        z_value([F.pmod(F.col("o_custkey"), F.lit(1024)),
                 F.pmod(F.col("o_orderkey"), F.lit(1024))], bits=10).alias("z")
    )
    assert plans.shuffle_count(df) == 0, plans.formatted_plan(df)
    assert "InPandas" not in plans.formatted_plan(df)


def test_budget_cut_no_global_sort(spark, sf_dir):
    """distributed_cumsum must not plan a single-reducer global Sort:
    every Exchange is hash/range-partitioned over >1 partition — no
    SinglePartition exchange feeding a Sort+Window."""
    df = QUERIES["q_token_budget_cut"][0](spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "SinglePartition" not in p, p


def test_paragraph_dedup_two_shuffles(spark, sf_dir):
    """Chunk-key window + per-doc regroup: exactly two exchanges."""
    df = QUERIES["q_paragraph_dedup_report"][0](spark, sf_dir)
    assert plans.shuffle_count(df) == 2, plans.formatted_plan(df)


def test_stratified_sample_broadcasts_rates_no_data_shuffle(spark, sf_dir):
    """The rate table broadcasts; the corpus itself never exchanges —
    the only shuffle is the tiny per-stratum count aggregate."""
    from radient_spark.operators.dataset import stratified_sample

    docs = load_tables(spark, sf_dir)["documents"]
    df = stratified_sample(docs, "source", "doc_id", 15)
    assert plans.uses_broadcast_join(df)
    assert plans.shuffle_count(df) <= 1, plans.formatted_plan(df)


def test_epoch_interleave_uses_top_k_not_global_sort(spark, sf_dir):
    """The audited prefix must be a TakeOrderedAndProject, not a full
    Sort + Limit — at corpus scale the global sort would be the plan
    killer."""
    df = QUERIES["q_epoch_interleave"][0](spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_gopher_rules_single_join_on_doc_id(spark, sf_dir):
    """Catalyst metrics + one bigram aggregate joined back: the bigram
    branch contributes the only exchanges (gram groupBy + doc rollup +
    the doc_id join); the metrics branch is map-only."""
    from radient_spark.operators.quality import gopher_rules

    docs = load_tables(spark, sf_dir)["documents"]
    df = gopher_rules(docs)
    assert plans.shuffle_count(df) <= 4, plans.formatted_plan(df)
    plan = plans.formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_session_funnel_windows_share_session_shuffle(spark, sf_dir):
    """Sessionize window (user_id) + three chained session windows +
    session rollup: the chained windows must reuse the (user_id,
    session_id)-compatible partitioning, so exchanges stay bounded."""
    df = QUERIES["q_session_funnel"][0](spark, sf_dir)
    assert plans.shuffle_count(df) <= 3, plans.formatted_plan(df)


def test_bloom_gate_probe_is_map_only(spark, sf_dir):
    """After the bitmap collect, the gate itself must be a zero-shuffle
    projection over the batch — the whole point of the Bloom pre-filter."""
    from radient_spark.operators.dedup import bloom_build, bloom_gate

    docs = load_tables(spark, sf_dir)["documents"]
    bitmap = bloom_build(docs.select("text"), "text", 2048, 3)
    gated = bloom_gate(docs.select("doc_id", "text"), bitmap, "text", 2048, 3)
    assert plans.shuffle_count(gated) == 0


def test_hll_shuffles_only_register_rows(spark, sf_dir):
    """One register-key exchange; the scan reads only the sketched column."""
    from radient_spark.operators.sketch import hll_cardinality

    ev = load_tables(spark, sf_dir)["events"]
    est = hll_cardinality(ev, "user_id", p=12)
    # register groupBy + the SinglePartition fold of <= 2^p rows; the
    # data-sized scan feeds only the first
    assert plans.shuffle_count(est) <= 2
    assert plans.reads_only_columns(est, {"user_id"})


def test_oov_single_token_explode(spark, sf_dir):
    """The corpus must be tokenized/exploded once for the report scan —
    the vocab side re-reads, but Generate must not nest per reference."""
    df = QUERIES["q_oov_report"][0](spark, sf_dir)
    plan = plans.formatted_plan(df)
    # the probe side and the vocab side each explode once; 3+ Generates
    # would mean CollapseProject re-inlined the token split
    assert plan.count("Generate explode") <= 2


def test_rolling_anomalies_single_user_shuffle(spark, sf_dir):
    df = QUERIES["q_rolling_anomalies"][0](spark, sf_dir)
    # one exchange for the user window, one for the event_type aggregate
    assert plans.shuffle_count(df) <= 2


def test_exact_group_quantiles_prunes_untargeted_cells(spark, sf_dir):
    """The window input must be filtered by the broadcast target-cell
    join BEFORE row_number — no global per-group sort anywhere."""
    from radient_spark.operators.dataset import exact_group_quantiles

    ev = load_tables(spark, sf_dir)["events"]
    out = exact_group_quantiles(ev, "event_type", "value", [0.5, 0.99])
    plan = plans.formatted_plan(out)
    # both joins against the driver-built target table must broadcast
    assert plan.count("BroadcastHashJoin") >= 2


def test_lsh_pairs_no_distinct_after_band_join(spark, sf_dir):
    """The first-collision rule replaced the distinct: no aggregate-
    based dedup may reappear downstream of the band self-join."""
    from radient_spark.operators.dedup import lsh_candidate_pairs

    docs = load_tables(spark, sf_dir)["documents"]
    pairs = lsh_candidate_pairs(docs, num_hashes=16, bands=4)
    # a distinct would compile to HashAggregate over [id_a, id_b]; the
    # whole pair plan must contain NO aggregate at all
    assert plans.formatted_plan(pairs).count("HashAggregate") == 0


def test_simhash_pairs_no_distinct_after_band_join(spark, sf_dir):
    from radient_spark.operators.dedup import simhash_near_pairs, with_simhash
    from pyspark.sql import functions as F

    docs = load_tables(spark, sf_dir)["documents"]
    sigs = with_simhash(
        docs.filter(F.length(F.trim("text")) > 0), "text", 32, "simhash32"
    ).select("doc_id", "simhash32")
    pairs = simhash_near_pairs(sigs, "doc_id", "simhash32", 32, 4, 3)
    assert plans.formatted_plan(pairs).count("HashAggregate") == 0


def test_hist_sketch_single_bucket_shuffle(spark, sf_dir):
    """Histogram build: one map-side-combined groupBy on bucket keys;
    the scan reads only the sketched column (+ the group column)."""
    from radient_spark.operators.sketch import hist_build

    ev = load_tables(spark, sf_dir)["events"]
    sk = hist_build(
        ev.select("event_type", F.round(F.col("value") * 100).cast("long").alias("c")),
        F.col("c"),
        by="event_type",
    )
    assert plans.shuffle_count(sk) == 1, plans.formatted_plan(sk)
    assert plans.reads_only_columns(sk, {"event_type", "value"})


def test_scd2_windows_share_one_key_shuffle(spark, sf_dir):
    """lag + version-cumsum + run groupBy + lead are all partitioned on
    the dimension key: ONE exchange end to end."""
    from radient_spark.operators.merge import scd2_history

    orders = load_tables(spark, sf_dir)["orders"]
    df = scd2_history(
        orders, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    assert plans.shuffle_count(df) == 1, plans.formatted_plan(df)


def test_bpe_pair_counts_vocab_only_shuffles(spark, sf_dir):
    """The corpus-sized shuffle is the word groupBy; pair counting adds
    one vocab-sized exchange — nothing else."""
    from pyspark.sql import functions as F2

    from radient_spark.functions import text as X
    from radient_spark.operators.bpe import pair_counts, words_to_symbols

    # earlier tests may leave persisted lineages over the same parquet
    # scan; a cache hit swaps FileScan for InMemoryTableScan and breaks
    # the plan-shape assertions below
    spark.catalog.clearCache()
    docs = load_tables(spark, sf_dir)["documents"]
    words = (
        docs.select(F2.explode(X.tokens(F2.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F2.count(F2.lit(1)).alias("freq"))
    )
    pc = pair_counts(words_to_symbols(words).select("sym", "freq"))
    assert plans.shuffle_count(pc) == 2, plans.formatted_plan(pc)
    assert plans.reads_only_columns(pc, {"text"})


def test_benford_prunes_to_one_column(spark, sf_dir):
    spark.catalog.clearCache()
    df = QUERIES["q_benford_prices"][0](spark, sf_dir)
    assert plans.reads_only_columns(df, {"l_extendedprice"})
    assert plans.has_pushed_filter(df, "l_extendedprice")


def test_snapshot_fingerprints_prune_payload_columns(spark, sf_dir):
    spark.catalog.clearCache()
    df = QUERIES["q_snapshot_fingerprints"][0](spark, sf_dir)
    assert plans.reads_only_columns(
        df,
        {
            "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
            "o_orderdate", "c_custkey", "c_nationkey", "c_mktsegment",
            "n_nationkey", "n_name", "n_regionkey",
        },
    )


def test_sparse_dot_broadcasts_query_postings(spark, sf_dir):
    spark.catalog.clearCache()
    df = QUERIES["q_sparse_dot_topk"][0](spark, sf_dir)
    assert plans.uses_broadcast_join(df)


def test_temporal_dedup_single_window_shuffle(spark, sf_dir):
    spark.catalog.clearCache()
    df = QUERIES["q_temporal_dedup_report"][0](spark, sf_dir)
    # one (user, type) window exchange + the final per-type aggregate
    assert plans.shuffle_count(df) <= 2, plans.formatted_plan(df)


def test_pr_curve_single_scan_of_scored_table(spark, sf_dir):
    spark.catalog.clearCache()
    df = QUERIES["q_classifier_pr_curve"][0](spark, sf_dir)
    p = plans.formatted_plan(df)
    # the 15-row grid must arrive via broadcast, never shuffle the corpus 15x
    assert plans.uses_broadcast_join(df), p


def test_zipf_top100_is_take_ordered_not_global_window(spark, sf_dir):
    """Round-6 (VERDICT weak #1): the top-100 vocabulary prefix must be
    a TakeOrderedAndProject over the token aggregate, never a global
    row_number window over ALL distinct tokens (a 10^8-token vocabulary
    would single-reducer sort). The remaining window ranks <=100 rows."""
    spark.catalog.clearCache()
    df = QUERIES["q_zipf_exponent"][0](spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in p, p


def test_histogram_quantiles_stay_jvm_side_no_collect_probe(spark, sf_dir):
    """The round-8 histogram order-statistic path must be one declarative
    plan: no Python workers, no approxQuantile boundary probe (which
    would show as a separate collect job — invisible here, so pin the
    plan shape instead: scan -> histogram agg -> window -> final agg,
    at most 3 exchanges), medians picked entirely JVM-side."""
    from radient_spark import plans
    from radient_spark.queries import QUERIES

    for q in ["q_value_percentiles", "q_mad_outliers", "q_winsorized_means"]:
        df = QUERIES[q][0](spark, sf_dir)
        p = plans.formatted_plan(df)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, q
    df = QUERIES["q_value_percentiles"][0](spark, sf_dir)
    assert plans.shuffle_count(df) <= 3, plans.formatted_plan(df)


def test_widen_narrow_scan_is_guarded(spark, sf_dir):
    """_widen_narrow_scan must repartition a 1-split scan to core count
    and be a NO-OP when the input already has >= cores partitions — the
    at-scale plan keeps row-local pipelines shuffle-free."""
    from radient_spark.catalog import load_tables
    from radient_spark.queries import _widen_narrow_scan

    p = spark.sparkContext.defaultParallelism
    docs = load_tables(spark, sf_dir)["documents"]
    assert docs.rdd.getNumPartitions() < p
    widened = _widen_narrow_scan(docs)
    assert widened.rdd.getNumPartitions() == p
    wide_already = docs.repartition(p + 3)
    assert _widen_narrow_scan(wide_already) is wide_already


def test_widen_narrow_scan_byte_gate(spark, sf_dir):
    """Round-9 ADVICE fix: split count alone must not trigger the widen —
    a large input in few partitions (cores >> splits on a well-compacted
    table) stays un-widened because the optimizer size estimate exceeds
    the byte gate, so no full-table exchange can appear at scale."""
    from radient_spark.queries import _WIDEN_MAX_BYTES, _widen_narrow_scan

    big = spark.range(50_000_000, numPartitions=1)  # stats ~400 MB > gate
    assert big.rdd.getNumPartitions() == 1
    size = int(big._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert size > _WIDEN_MAX_BYTES
    assert _widen_narrow_scan(big) is big


def test_widen_narrow_scan_fails_closed_without_stats(spark, monkeypatch):
    """Round-10 ADVICE: if the optimizer size estimate is unavailable
    (Spark Connect / private-API drift), the widen must NOT fire — a
    blind repartition would re-inject the full-table raw-text exchange
    the byte gate exists to prevent."""
    from radient_spark import queries

    def boom(df):
        raise RuntimeError("stats API unavailable")

    monkeypatch.setattr(queries, "_plan_size_bytes", boom)
    narrow = spark.range(10, numPartitions=1)
    assert queries._widen_narrow_scan(narrow) is narrow


def test_l_diversity_broadcasts_customer_dim(spark, sf_dir):
    """The published-view join in the l-diversity audit must broadcast
    the customer QI columns, never shuffle the orders fact table."""
    df = QUERIES["q_l_diversity_audit"][0](spark, sf_dir)
    assert plans.uses_broadcast_join(df)


def test_tokenizer_fertility_prunes_to_two_columns(spark, sf_dir):
    """The fertility audit is one scan reading only (lang, text) with a
    single aggregate shuffle — the 100 TB shape for a corpus-wide ratio.
    (The second exchange is the langs-sized final sort, not data-scale.)"""
    df = QUERIES["q_tokenizer_fertility"][0](spark, sf_dir)
    assert plans.reads_only_columns(df, {"lang", "text"})
    assert plans.shuffle_count(df) <= 2


def test_sql_vector_topk_stays_jvm_side(spark, sf_dir):
    """Round-10: the SQL-registered cosine functions must INLINE into
    Catalyst (SQL scalar functions, not Python UDFs) — the plan has no
    Python eval, broadcasts the 10 query rows, and ends in the window
    top-k, identical in shape to the DataFrame surface."""
    df = QUERIES["q_sql_api_vector_topk"][0](spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
    assert "InPandas" not in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
