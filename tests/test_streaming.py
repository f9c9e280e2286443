"""Streaming semantics tests: stream over a static directory must agree
with the batch computation over the same data (SURVEY.md §5.2 item 4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from radient_spark import streaming
from radient_spark.catalog import load_tables


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    """Events table written as several parquet files (micro-batch units)."""
    d = tmp_path_factory.mktemp("events_stream")
    ev = load_tables(spark, sf_dir)["events"]
    ev.repartition(4).write.mode("overwrite").parquet(str(d / "in"))
    return d


def _run_to_memory(spark, stream_df, name, checkpoint):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_window_matches_batch(spark, event_dir):
    stream = streaming.read_event_stream(spark, str(event_dir / "in"))
    agg = streaming.hourly_event_counts(stream, watermark="0 seconds")
    got = _run_to_memory(spark, agg, "hourly_stream", str(event_dir / "ck1"))

    batch = spark.read.parquet(str(event_dir / "in"))
    expected = (
        batch.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    g = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    e = {(r["window_start"], r["event_type"]): r["n_events"] for r in expected.collect()}
    assert g == e and len(g) > 0


def test_session_window_state(spark, event_dir):
    stream = streaming.read_event_stream(spark, str(event_dir / "in"))
    sessions = streaming.user_sessions(stream, gap="30 minutes", watermark="0 seconds")
    got = _run_to_memory(spark, sessions, "sessions_stream", str(event_dir / "ck2"))
    rows = got.collect()
    assert len(rows) > 0
    # session windows never overlap per user and respect the gap
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"], r["n_events"])
        )
    import datetime

    gap = datetime.timedelta(minutes=30)
    for user, sess in by_user.items():
        sess.sort()
        for (s1, e1, _), (s2, e2, _) in zip(sess, sess[1:]):
            assert s2 >= e1, (user, s1, e1, s2, e2)
        assert all(e >= s for s, e, _ in sess)
    # total session count matches the batch sessionization (q_user_sessions)
    batch = spark.read.parquet(str(event_dir / "in"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = batch.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    n_batch = flagged.agg(F.sum("new_session")).collect()[0][0]
    assert sum(len(s) for s in by_user.values()) == n_batch


def test_streaming_dedup(spark, event_dir, tmp_path):
    # duplicate every event, stream-dedup must restore the original count
    src = spark.read.parquet(str(event_dir / "in"))
    dup_dir = str(tmp_path / "dup")
    src.union(src).repartition(3).write.parquet(dup_dir)
    stream = streaming.read_event_stream(spark, dup_dir)
    deduped = streaming.dedup_stream(stream, keys=["event_id"], watermark="2 hours")
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck3")
    q = streaming.write_stream_to_parquet(deduped, out_dir, ck)
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == src.count()


def test_stream_stream_join_matches_batch(spark, event_dir, tmp_path):
    stream = streaming.read_event_stream(spark, str(event_dir / "in"))
    joined = streaming.purchase_click_stream_join(
        stream, watermark="0 seconds", join_horizon="1 hour"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.table("ss_join").collect()
    }
    ev = spark.read.parquet(str(event_dir / "in"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stateful_running_totals(spark, event_dir, tmp_path):
    """applyInPandasWithState: state accumulates across micro-batches;
    after the final batch + timeout the totals must equal the batch agg."""
    stream = streaming.read_event_stream(
        spark, str(event_dir / "in"), max_files_per_trigger=1
    )
    # short timeout so the state flushes once input is exhausted
    totals = streaming.running_user_totals(
        stream, watermark="0 seconds", inactivity_timeout_ms=1
    )
    q = (
        totals.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_state"))
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    batch = spark.read.parquet(str(event_dir / "in"))
    expected = {
        r["user_id"]: (r["n"], r["total"])
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    got = {}
    # generous wall deadline: the processing-time trigger + state
    # timeout need real elapsed seconds, and a fully loaded host (the
    # suite alongside a bench sweep, round-11 observed) can stretch
    # 30 s of work past 90
    deadline = time.time() + 240
    while time.time() < deadline and len(got) < len(expected):
        time.sleep(2)
        for r in spark.table("user_totals").collect():
            got[r["user_id"]] = (r["n_events"], r["total_value"])
    q.stop()
    assert len(got) == len(expected), (len(got), len(expected))
    for u, (n, total) in expected.items():
        assert got[u][0] == n
        assert abs(got[u][1] - total) < 1e-6


def test_foreach_batch_bridge(spark, event_dir, tmp_path):
    calls = []
    stream = streaming.read_event_stream(spark, str(event_dir / "in"))

    def batch_fn(df, epoch_id):
        calls.append((epoch_id, df.count()))

    q = streaming.foreach_batch_sink(stream, str(tmp_path / "ck4"), batch_fn)
    q.awaitTermination(120)
    assert sum(c for _, c in calls) == spark.read.parquet(str(event_dir / "in")).count()


def test_dataset_ops_stream_equals_batch(spark, sf_dir, tmp_path):
    # hash_split and scrub_pii are stateless Catalyst expressions, so
    # they must produce IDENTICAL rows on a stream as on the batch read
    # of the same files — the property that lets the corpus pipeline run
    # incrementally over a landing prefix.
    from radient_spark.operators.dataset import hash_split, scrub_pii

    docs = load_tables(spark, sf_dir)["documents"]
    d = str(tmp_path / "docs_in")
    docs.select("doc_id", "text").repartition(3).write.mode("overwrite").parquet(d)

    def transform(df):
        return hash_split(df, "doc_id").select(
            "doc_id", "split", F.length(scrub_pii(F.col("text"))).alias("n")
        )

    batch = {tuple(r) for r in transform(spark.read.parquet(d)).collect()}

    schema = spark.read.parquet(d).schema
    stream_df = transform(
        spark.readStream.schema(schema).parquet(d)
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("ds_ops_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {tuple(r) for r in spark.table("ds_ops_stream").collect()}
    assert streamed == batch and len(batch) > 0


def test_curation_ops_stream_equals_batch(spark, sf_dir, tmp_path):
    # cluster assignment is a stateless expression against literal
    # centroids, so it streams in append mode directly; decontaminate
    # ends in a per-doc global aggregation, so on a stream it rides the
    # foreachBatch bridge (the documented pattern for ops whose last
    # step is a non-windowed aggregate). Both must produce IDENTICAL
    # rows to the batch run over the same files — the always-on
    # landing-zone curation shape.
    from radient_spark.operators.cluster import assign_clusters, kmeans_fit
    from radient_spark.operators.dataset import decontaminate

    docs = load_tables(spark, sf_dir)["documents"]
    emb = load_tables(spark, sf_dir)["embeddings"]
    ev = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    cents = kmeans_fit(emb, "embedding", "vec_id", k=4, iters=1)

    ddir = str(tmp_path / "docs_in")
    edir = str(tmp_path / "emb_in")
    docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", "text"
    ).repartition(3).write.mode("overwrite").parquet(ddir)
    emb.select("vec_id", "embedding").repartition(3).write.mode(
        "overwrite"
    ).parquet(edir)

    def curate_docs(df):
        return decontaminate(df, ev, "text", "doc_id", n=4).select(
            "doc_id", "n_hit_grams"
        )

    def curate_emb(df):
        return assign_clusters(df, "embedding", cents).select(
            "vec_id", "cluster_id"
        )

    batch_docs = {tuple(r) for r in curate_docs(spark.read.parquet(ddir)).collect()}
    batch_emb = {tuple(r) for r in curate_emb(spark.read.parquet(edir)).collect()}

    # stateless assignment: plain append-mode stream
    schema = spark.read.parquet(edir).schema
    q = (
        curate_emb(spark.readStream.schema(schema).parquet(edir))
        .writeStream.format("memory")
        .queryName("assign_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_assign"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # aggregation-terminated op: foreachBatch bridge runs the batch
    # operator per micro-batch (each doc's grams land in one batch, so
    # per-doc counts are exact)
    streamed_docs: set = set()

    def batch_fn(df, _epoch):
        streamed_docs.update(tuple(r) for r in curate_docs(df).collect())

    dschema = spark.read.parquet(ddir).schema
    from radient_spark import streaming as S

    q2 = S.foreach_batch_sink(
        spark.readStream.schema(dschema).parquet(ddir),
        str(tmp_path / "ck_decontam"),
        batch_fn,
    )
    q2.awaitTermination(120)

    streamed_emb = {tuple(r) for r in spark.table("assign_stream").collect()}
    assert streamed_docs == batch_docs and len(batch_docs) > 0
    assert streamed_emb == batch_emb and len(batch_emb) > 0


def test_incremental_ingest_sink_dedups_across_batches(spark, tmp_path):
    # batch 1 ingests A, B (plus an in-batch duplicate of A); batch 2
    # arrives later with B (cross-batch dup) and C — the corpus must end
    # up exactly {A, B, C}
    in_dir, corpus, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "corpus"),
        str(tmp_path / "ck_ingest"),
    )
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(1, "doc A"), (2, "doc B"), (3, "doc A")], schema
    )
    b1.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(b1.schema).parquet(in_dir)
    q = streaming.incremental_ingest_sink(stream, corpus, ck)
    q.awaitTermination(120)
    got1 = sorted(r["text"] for r in spark.read.parquet(corpus).collect())
    assert got1 == ["doc A", "doc B"]

    spark.createDataFrame([(4, "doc B"), (5, "doc C")], schema).write.mode(
        "append"
    ).parquet(in_dir)
    stream2 = spark.readStream.schema(b1.schema).parquet(in_dir)
    q2 = streaming.incremental_ingest_sink(stream2, corpus, ck)
    q2.awaitTermination(120)
    got2 = sorted(r["text"] for r in spark.read.parquet(corpus).collect())
    assert got2 == ["doc A", "doc B", "doc C"]


def test_ivf_ingest_sink_grows_saved_index(spark, tmp_path):
    import numpy as np

    from radient_spark.ann import IvfIndex

    rng = np.random.RandomState(3)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(40)]
    schema = "id long, vector array<float>"
    seed_df = spark.createDataFrame(vecs[:20], schema)
    index_path = str(tmp_path / "ivf_stream")
    IvfIndex.build(seed_df, n_cells=4, seed=7).save(index_path)

    in_dir, ck = str(tmp_path / "vin"), str(tmp_path / "ck_ivf")
    spark.createDataFrame(vecs[20:30], schema).write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(seed_df.schema).parquet(in_dir)
    q = streaming.ivf_ingest_sink(stream, index_path, ck)
    q.awaitTermination(120)
    assert IvfIndex.load(spark, index_path).index_df.count() == 30

    # second micro-batch appends only its own rows (checkpoint skips b1)
    spark.createDataFrame(vecs[30:], schema).write.mode("append").parquet(in_dir)
    stream2 = spark.readStream.schema(seed_df.schema).parquet(in_dir)
    q2 = streaming.ivf_ingest_sink(stream2, index_path, ck)
    q2.awaitTermination(120)
    loaded = IvfIndex.load(spark, index_path)
    assert loaded.index_df.count() == 40
    assert loaded.index_df.select("id").distinct().count() == 40
    # full-probe search over the grown index finds streamed-in rows
    qid, qvec = vecs[35]
    got = {r["id"] for r in loaded.search([(qid, qvec)], k=1, n_probes=4).collect()}
    assert got == {qid}


def test_sketch_maintenance_sink_converges_to_batch_sketch(spark, tmp_path):
    """Streaming register maintenance across two micro-batch rounds must
    produce EXACTLY the registers of a one-shot batch sketch over the
    union — the HLL merge-by-max contract, end to end through the sink."""
    from pyspark.sql import functions as F
    from radient_spark.operators.sketch import hll_estimate, hll_registers

    in_dir, sk_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "sketch"),
        str(tmp_path / "ck_sketch"),
    )
    schema = "k string"
    b1 = spark.createDataFrame([(f"u{i}",) for i in range(500)], schema)
    b1.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(b1.schema).parquet(in_dir)
    q = streaming.sketch_maintenance_sink(stream, sk_dir, ck, "k", p=10)
    q.awaitTermination(120)

    spark.createDataFrame(
        [(f"u{i}",) for i in range(300, 900)], schema
    ).write.mode("append").parquet(in_dir)
    stream2 = spark.readStream.schema(b1.schema).parquet(in_dir)
    q2 = streaming.sketch_maintenance_sink(stream2, sk_dir, ck, "k", p=10)
    q2.awaitTermination(120)

    union = spark.createDataFrame([(f"u{i}",) for i in range(900)], schema)
    want = {
        (r["idx"], r["rho_max"])
        for r in hll_registers(union, F.col("k"), 10).collect()
    }
    got = {
        (r["idx"], r["rho_max"])
        for r in spark.read.parquet(sk_dir).collect()
    }
    assert got == want
    est = hll_estimate(spark.read.parquet(sk_dir), p=10).collect()[0]
    assert abs(est["estimate"] - 900) / 900 < 0.15


def test_bloom_ingest_sink_dedups_and_maintains_bitmap(spark, tmp_path):
    """Two rounds through the bloom-gated ingest: the corpus must end up
    exactly the distinct union (no false negatives ever lose data), and
    the persisted bitmap must equal a fresh bloom over the final corpus
    (the idempotent-merge contract)."""
    from radient_spark.operators.dedup import bloom_build

    in_dir, corpus, bloom, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "corpus"),
        str(tmp_path / "bloom"),
        str(tmp_path / "ck_bloom"),
    )
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(1, "doc A"), (2, "doc B"), (3, "doc A")], schema
    )
    b1.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(b1.schema).parquet(in_dir)
    q = streaming.bloom_ingest_sink(stream, corpus, bloom, ck, m_bits=4096, k=3)
    q.awaitTermination(120)
    assert sorted(
        r["text"] for r in spark.read.parquet(corpus).collect()
    ) == ["doc A", "doc B"]

    spark.createDataFrame([(4, "doc B"), (5, "doc C")], schema).write.mode(
        "append"
    ).parquet(in_dir)
    stream2 = spark.readStream.schema(b1.schema).parquet(in_dir)
    q2 = streaming.bloom_ingest_sink(stream2, corpus, bloom, ck, m_bits=4096, k=3)
    q2.awaitTermination(120)
    got = sorted(r["text"] for r in spark.read.parquet(corpus).collect())
    assert got == ["doc A", "doc B", "doc C"]

    want_bits = {
        (r["word"], r["bits"])
        for r in bloom_build(
            spark.read.parquet(corpus).select("text"), "text", 4096, 3
        ).collect()
    }
    got_bits = {
        (r["word"], r["bits"])
        for r in spark.read.parquet(bloom).collect()
    }
    assert got_bits == want_bits


def test_cms_maintenance_sink_equals_batch_sketch(spark, tmp_path):
    """Two micro-batch rounds of CMS maintenance must equal a one-shot
    batch sketch over the concatenated stream (cell-wise sum merge)."""
    from radient_spark.operators.sketch import cms_build

    in_dir, sk_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "cms"),
        str(tmp_path / "ck_cms"),
    )
    schema = "tok string"
    b1 = spark.createDataFrame([("a",)] * 30 + [("b",)] * 10, schema)
    b1.write.mode("overwrite").parquet(in_dir)
    q = streaming.cms_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir), sk_dir, ck,
        "tok", depth=3, width=32,
    )
    q.awaitTermination(120)
    spark.createDataFrame([("a",)] * 5 + [("c",)] * 20, schema).write.mode(
        "append"
    ).parquet(in_dir)
    q2 = streaming.cms_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir), sk_dir, ck,
        "tok", depth=3, width=32,
    )
    q2.awaitTermination(120)
    whole = spark.createDataFrame(
        [("a",)] * 35 + [("b",)] * 10 + [("c",)] * 20, schema
    )
    want = {
        (r["row"], r["slot"], r["c"])
        for r in cms_build(whole, "tok", 3, 32).collect()
    }
    got = {
        (r["row"], r["slot"], r["c"])
        for r in spark.read.parquet(sk_dir).collect()
    }
    assert got == want


def test_hist_maintenance_sink_equals_batch_sketch(spark, tmp_path):
    """Streaming histogram maintenance across two micro-batch rounds ==
    the one-shot batch sketch of the union (cnt-sum merge law), and the
    merged table answers quantiles directly."""
    from pyspark.sql import functions as F
    from radient_spark.operators.sketch import hist_build, hist_quantiles

    in_dir, sk_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "hist"),
        str(tmp_path / "ck_hist"),
    )
    schema = "v long"
    b1 = spark.createDataFrame([(i % 997 + 1,) for i in range(600)], schema)
    b1.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(b1.schema).parquet(in_dir)
    q = streaming.hist_maintenance_sink(stream, sk_dir, ck, "v")
    q.awaitTermination(120)

    spark.createDataFrame(
        [(i % 499 + 3000,) for i in range(400)], schema
    ).write.mode("append").parquet(in_dir)
    stream2 = spark.readStream.schema(b1.schema).parquet(in_dir)
    q2 = streaming.hist_maintenance_sink(stream2, sk_dir, ck, "v")
    q2.awaitTermination(120)

    union = spark.createDataFrame(
        [(i % 997 + 1,) for i in range(600)]
        + [(i % 499 + 3000,) for i in range(400)],
        schema,
    )
    want = {
        (r["hkey"], r["cnt"])
        for r in hist_build(union, F.col("v")).collect()
    }
    got = {
        (r["hkey"], r["cnt"]) for r in spark.read.parquet(sk_dir).collect()
    }
    assert got == want
    est = {
        r["quantile"]: r
        for r in hist_quantiles(
            spark.read.parquet(sk_dir), [("p50", 1, 2)]
        ).collect()
    }
    assert est["p50"]["n"] == 1000


def test_agg_maintenance_sink_equals_batch_aggregate(spark, tmp_path):
    """Two micro-batch rounds of per-key (cnt, total) maintenance ==
    the one-shot grouped aggregate of the union — incremental
    materialized-view maintenance without re-reading history."""
    from pyspark.sql import functions as F

    in_dir, st_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "state"),
        str(tmp_path / "ck_agg"),
    )
    schema = "k string, v long"
    b1 = spark.createDataFrame(
        [(f"g{i % 7}", i) for i in range(300)], schema
    )
    b1.write.mode("overwrite").parquet(in_dir)
    q = streaming.agg_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir),
        st_dir, ck, "k", "v",
    )
    q.awaitTermination(120)

    spark.createDataFrame(
        [(f"g{i % 11}", i * 3) for i in range(200)], schema
    ).write.mode("append").parquet(in_dir)
    q2 = streaming.agg_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir),
        st_dir, ck, "k", "v",
    )
    q2.awaitTermination(120)

    union = spark.createDataFrame(
        [(f"g{i % 7}", i) for i in range(300)]
        + [(f"g{i % 11}", i * 3) for i in range(200)],
        schema,
    )
    want = {
        (r["k"], r["cnt"], r["total"])
        for r in union.groupBy(F.col("k"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("total"))
        .collect()
    }
    got = {
        (r["k"], r["cnt"], r["total"])
        for r in spark.read.parquet(st_dir).collect()
    }
    assert got == want


def test_cc_maintenance_sink_merges_components_across_batches(spark, tmp_path):
    """Components discovered in separate micro-batches merge when a
    later edge bridges them: final labels == one-shot star CC of the
    cumulative edge union."""
    from radient_spark.operators.graph import connected_components_star

    in_dir, lb_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "labels"),
        str(tmp_path / "ck_cc"),
    )
    schema = "id_a long, id_b long"
    b1 = spark.createDataFrame([(1, 2), (3, 4), (10, 11)], schema)
    b1.write.mode("overwrite").parquet(in_dir)
    q = streaming.cc_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir), lb_dir, ck
    )
    q.awaitTermination(120)

    # batch 2 bridges {1,2} and {3,4}; adds a new component {20,21}
    spark.createDataFrame([(2, 3), (20, 21)], schema).write.mode(
        "append"
    ).parquet(in_dir)
    q2 = streaming.cc_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir), lb_dir, ck
    )
    q2.awaitTermination(120)

    got = {
        (r.id, r.group_id) for r in spark.read.parquet(lb_dir).collect()
    }
    union = spark.createDataFrame(
        [(1, 2), (3, 4), (10, 11), (2, 3), (20, 21)], schema
    )
    want = {
        (r.id, r.group_id) for r in connected_components_star(union).collect()
    }
    assert got == want
    assert (2, 1) in got and (4, 1) in got and (21, 20) in got


def test_stateful_sessionizer_flushes_completed_sessions(spark, tmp_path):
    """The applyInPandasWithState sessionizer emits every session that
    a later event has CLOSED (gap proven inside the state), matching
    batch sessionization for all but each user's trailing open
    session."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: two closed sessions + one trailing open one
    for mins, et in [(0, "view"), (5, "purchase"), (60, "view"),
                     (65, "click"), (140, "view")]:
        rows.append((1, base + dt.timedelta(minutes=mins), et))
    # user 2: one closed, one open
    for mins, et in [(0, "click"), (90, "purchase")]:
        rows.append((2, base + dt.timedelta(minutes=mins), et))
    in_dir, out_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck_sess"),
    )
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    df.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema(df.schema).parquet(in_dir)
    q = (
        streaming.stateful_sessions(stream, gap_minutes=30)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointPath", ck)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.n_purchases)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (1, base, base + dt.timedelta(minutes=5), 2, 1),
        (1, base + dt.timedelta(minutes=60),
         base + dt.timedelta(minutes=65), 2, 0),
        (2, base, base, 1, 0),
    }
    assert got == want


def test_hourly_count_sink_ewma_equals_batch(spark, tmp_path):
    """Two micro-batch rounds of hourly-count maintenance, read through
    ewma_spikes, must equal the batch monitor over the concatenated
    events — the streaming feed of q_ewma_spikes."""
    import datetime as dt

    from pyspark.sql import functions as F

    from radient_spark.operators.timeseries import ewma_spikes

    in_dir, st_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "hours"),
        str(tmp_path / "ck_hours"),
    )
    schema = "event_type string, ts timestamp"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def rows(kind, hours_counts):
        out = []
        for h, n in hours_counts:
            out += [(kind, t0 + dt.timedelta(hours=h, minutes=i % 60))
                    for i in range(n)]
        return out

    b1 = spark.createDataFrame(
        rows("click", [(0, 3), (1, 4), (2, 2)]) + rows("error", [(0, 1)]),
        schema,
    )
    b1.write.mode("overwrite").parquet(in_dir)
    q = streaming.hourly_count_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir), st_dir, ck
    )
    q.awaitTermination(120)
    b2 = spark.createDataFrame(
        rows("click", [(2, 5), (3, 40)]) + rows("error", [(1, 2)]), schema
    )
    b2.write.mode("append").parquet(in_dir)
    q2 = streaming.hourly_count_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir), st_dir, ck
    )
    q2.awaitTermination(120)

    whole = b1.unionByName(b2)
    batch_hourly = whole.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    want = {tuple(r) for r in ewma_spikes(batch_hourly).collect()}
    got = {
        tuple(r)
        for r in ewma_spikes(spark.read.parquet(st_dir)).collect()
    }
    assert got == want
    # the hour-3 click burst (40 after ~3/hr) must flag as a spike
    flags = {
        (r["event_type"], r["hour_ts"].hour): r["is_spike"]
        for r in ewma_spikes(spark.read.parquet(st_dir)).collect()
    }
    assert flags[("click", 3)] is True
    assert flags[("click", 1)] is False


def test_scd2_maintenance_sink_equals_batch_history(spark, tmp_path):
    """Two micro-batch rounds of streaming SCD2 maintenance == the
    one-shot scd2_history over the concatenated observations."""
    from radient_spark.operators.merge import scd2_history

    in_dir, hist_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "hist"),
        str(tmp_path / "ck_scd2"),
    )
    schema = "k long, attr string, ts long, seq long"
    b1 = spark.createDataFrame(
        [(1, "A", 10, 1), (1, "B", 20, 2), (2, "X", 10, 1)], schema
    )
    b1.write.mode("overwrite").parquet(in_dir)
    q = streaming.scd2_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir),
        hist_dir, ck, "k", "attr", "ts", "seq",
    )
    q.awaitTermination(120)
    b2 = spark.createDataFrame(
        [(1, "B", 30, 3), (1, "C", 40, 4), (3, "Z", 5, 1)], schema
    )
    b2.write.mode("append").parquet(in_dir)
    q2 = streaming.scd2_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir),
        hist_dir, ck, "k", "attr", "ts", "seq",
    )
    q2.awaitTermination(120)
    want = sorted(
        tuple(r)
        for r in scd2_history(
            b1.unionByName(b2), "k", "attr", "ts", "seq"
        ).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(hist_dir).collect())
    assert got == want


def test_join_view_sink_equals_batch_join(spark, tmp_path):
    """Streamed dA ⋈ B appends must equal (all batches) ⋈ B."""
    in_dir, view_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "view"),
        str(tmp_path / "ck_view"),
    )
    schema = "k long, a string"
    dim = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (3, "b3")], "k long, b string"
    )
    b1 = spark.createDataFrame([(1, "a1"), (2, "a2")], schema)
    b1.write.mode("overwrite").parquet(in_dir)
    q = streaming.join_view_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir),
        dim, view_dir, ck, ["k"],
    )
    q.awaitTermination(120)
    b2 = spark.createDataFrame([(3, "a3"), (9, "a9")], schema)
    b2.write.mode("append").parquet(in_dir)
    q2 = streaming.join_view_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir),
        dim, view_dir, ck, ["k"],
    )
    q2.awaitTermination(120)
    want = sorted(
        tuple(r) for r in b1.unionByName(b2).join(dim, ["k"]).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(view_dir).collect())
    assert got == want


def test_sample_maintenance_sink_equals_batch_sample(spark, tmp_path):
    """Two micro-batch rounds of streaming k-sample maintenance must
    equal uniform_sample_exact_k over the concatenated input, and the
    state must hold exactly k rows."""
    from radient_spark.operators.dataset import uniform_sample_exact_k

    in_dir, st_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "sample"),
        str(tmp_path / "ck_sample"),
    )
    schema = "rid long, payload string"
    b1 = spark.createDataFrame([(i, f"p{i}") for i in range(200)], schema)
    b1.write.mode("overwrite").parquet(in_dir)
    q = streaming.sample_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir),
        st_dir, ck, "rid", k=25, seed=9,
    )
    q.awaitTermination(120)
    b2 = spark.createDataFrame(
        [(i, f"p{i}") for i in range(200, 450)], schema
    )
    b2.write.mode("append").parquet(in_dir)
    q2 = streaming.sample_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir),
        st_dir, ck, "rid", k=25, seed=9,
    )
    q2.awaitTermination(120)
    got = sorted(r["rid"] for r in spark.read.parquet(st_dir).collect())
    assert len(got) == 25
    want = sorted(
        r["rid"]
        for r in uniform_sample_exact_k(
            b1.unionByName(b2), "rid", k=25, seed=9
        ).collect()
    )
    assert got == want


def test_late_data_audit_sink_counts_late_rows(spark, tmp_path):
    """Rows older than (prior max ts - 1 hour) must be counted late in
    the batch where they arrive; on-time rows must not."""
    import datetime as dt

    in_dir, audit_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "audit"),
        str(tmp_path / "ck_late"),
    )
    schema = "event_id long, ts timestamp"
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    b1 = spark.createDataFrame(
        [(1, t0), (2, t0 + dt.timedelta(minutes=30))], schema
    )
    b1.write.mode("overwrite").parquet(in_dir)
    q = streaming.late_data_audit_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir), audit_dir, ck
    )
    q.awaitTermination(120)
    b2 = spark.createDataFrame(
        [
            (3, t0 - dt.timedelta(hours=2)),   # late vs 12:30 - 1h
            (4, t0 + dt.timedelta(minutes=45)),  # on time
        ],
        schema,
    )
    b2.write.mode("append").parquet(in_dir)
    q2 = streaming.late_data_audit_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir), audit_dir, ck
    )
    q2.awaitTermination(120)
    log = sorted(
        (r["epoch"], r["n_rows"], r["n_late"])
        for r in spark.read.parquet(f"{audit_dir}/log").collect()
    )
    assert [x[1:] for x in log] == [(2, 0), (2, 1)]


def test_fingerprint_maintenance_sink_equals_batch(spark, tmp_path):
    """Two micro-batch rounds of fingerprint folding must equal
    table_fingerprint over the concatenated rows — the additive-fold
    contract that makes streamed reconciliation exact."""
    from pyspark.sql import functions as F

    from radient_spark.operators.reconcile import table_fingerprint

    in_dir, st_dir, ck = (
        str(tmp_path / "fp_in"),
        str(tmp_path / "fp_state"),
        str(tmp_path / "fp_ck"),
    )
    schema = "id bigint, name string"
    b1 = spark.createDataFrame([(i, f"n{i}") for i in range(40)], schema)
    b1.write.mode("overwrite").parquet(in_dir)
    q = streaming.fingerprint_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir),
        st_dir, ck, cols=["id", "name"],
    )
    q.awaitTermination(120)
    b2 = spark.createDataFrame([(i, f"n{i}") for i in range(40, 65)], schema)
    b2.write.mode("append").parquet(in_dir)
    q2 = streaming.fingerprint_maintenance_sink(
        spark.readStream.schema(b1.schema).parquet(in_dir),
        st_dir, ck, cols=["id", "name"],
    )
    q2.awaitTermination(120)

    got = spark.read.parquet(st_dir).collect()[0]
    exp = table_fingerprint(
        b1.unionByName(b2), [F.col("id"), F.col("name")]
    ).collect()[0]
    assert (got["n_rows"], got["checksum"]) == (exp["n_rows"], exp["checksum"])


def test_commit_state_crash_safety_and_epoch_idempotence(spark, tmp_path):
    """Round-6 (ADVICE): the staging+rename commit must survive every
    crash window — old state intact during the staging write, committed
    staging rolled forward if the swap was interrupted, and an epoch
    marker that makes a replayed already-committed batch detectable."""
    import os
    import shutil

    from radient_spark.streaming import (
        _commit_state,
        _epoch_committed,
        _state_exists,
    )

    sd = str(tmp_path / "state")
    _commit_state(
        spark.createDataFrame([(1, 10)], "k int, v int").coalesce(1),
        sd, "tagA", 0,
    )
    assert _state_exists(spark, sd)
    assert _epoch_committed(spark, sd, "tagA", 0)
    assert not _epoch_committed(spark, sd, "tagA", 1)
    # a NEW checkpoint's epoch 0 must not collide with the old tag
    assert not _epoch_committed(spark, sd, "tagB", 0)

    # a second commit swaps state and carries only the new marker
    _commit_state(
        spark.createDataFrame([(2, 20)], "k int, v int").coalesce(1),
        sd, "tagA", 1,
    )
    assert _epoch_committed(spark, sd, "tagA", 1)
    assert not _epoch_committed(spark, sd, "tagA", 0)
    assert spark.read.parquet(sd).collect()[0]["k"] == 2

    # simulate a crash BETWEEN the two renames: state_dir absent, the
    # fully-committed staging dir (with _SUCCESS) still on disk
    staging = sd + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.rename(sd, staging)
    assert not os.path.exists(sd)
    assert _state_exists(spark, sd)  # recovery rolls staging forward
    assert spark.read.parquet(sd).collect()[0]["k"] == 2
    assert _epoch_committed(spark, sd, "tagA", 1)

    # a PARTIAL staging dir (no _SUCCESS) must NOT be rolled forward
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    with open(f"{staging}/part-00000.parquet", "w") as f:
        f.write("garbage")
    assert _state_exists(spark, sd)  # real state still wins
    assert spark.read.parquet(sd).collect()[0]["k"] == 2


def test_cdc_maintenance_sink_equals_batch_apply(spark, tmp_path):
    """Round-6: the streamed CDC snapshot (per-batch cdc_apply fold via
    _commit_state) must equal cdc_apply over the concatenated log —
    upserts replace, deletes tombstone, a higher-seq upsert resurrects,
    and n_versions counts every log row ever seen for the key."""
    from radient_spark.operators.merge import cdc_apply

    in_dir, snap, ck = (
        str(tmp_path / "cdc_in"),
        str(tmp_path / "cdc_snap"),
        str(tmp_path / "ck_cdc"),
    )
    schema = "k long, seq long, op string, val string"
    b1 = [(1, 1, "upsert", "a1"), (2, 1, "upsert", "b1"), (3, 1, "upsert", "c1")]
    b2 = [(1, 2, "upsert", "a2"), (2, 2, "delete", None), (4, 1, "upsert", "d1")]
    b3 = [(2, 3, "upsert", "b3"), (3, 2, "delete", None)]

    spark.createDataFrame(b1, schema).write.mode("overwrite").parquet(in_dir)
    for batch in (None, b2, b3):
        if batch is not None:
            spark.createDataFrame(batch, schema).write.mode("append").parquet(
                in_dir
            )
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = streaming.cdc_maintenance_sink(
            stream, snap, ck, key_cols=["k"], seq_cols=["seq"]
        )
        q.awaitTermination(120)

    got = {
        (r["k"], r["seq"], r["val"], r["n_versions"])
        for r in spark.read.parquet(snap).collect()
    }
    full_log = spark.createDataFrame(b1 + b2 + b3, schema)
    want = {
        (r["k"], r["seq"], r["val"], r["n_versions"])
        for r in cdc_apply(
            full_log, key_cols=["k"], seq_cols=["seq"]
        ).collect()
    }
    assert got == want, (got, want)
    # semantic spot checks: 2 resurrected at seq 3, 3 tombstoned
    assert (2, 3, "b3", 3) in got
    assert not [t for t in got if t[0] == 3]


def test_cdc_maintenance_sink_tombstone_blocks_older_upsert(spark, tmp_path):
    """Round-8 regression for the round-6 state-loss bug: a tombstone
    must remember the key's seq high-water mark ACROSS batches, so a
    later batch delivering an OLDER upsert does NOT resurrect the key —
    and a delete→higher-seq-resurrect cycle keeps the cumulative
    n_versions instead of restarting at 1."""
    from radient_spark.operators.merge import cdc_apply

    in_dir, snap, ck = (
        str(tmp_path / "cdc_in"),
        str(tmp_path / "cdc_snap"),
        str(tmp_path / "ck_cdc"),
    )
    schema = "k long, seq long, op string, val string"
    b1 = [(1, 5, "delete", None), (2, 1, "upsert", "b1")]
    b2 = [(1, 3, "upsert", "a-stale"), (2, 2, "delete", None)]  # must NOT resurrect 1
    b3 = [(1, 6, "upsert", "a-new"), (2, 3, "upsert", "b-new")]

    spark.createDataFrame(b1, schema).write.mode("overwrite").parquet(in_dir)
    for batch in (None, b2, b3):
        if batch is not None:
            spark.createDataFrame(batch, schema).write.mode("append").parquet(
                in_dir
            )
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = streaming.cdc_maintenance_sink(
            stream, snap, ck, key_cols=["k"], seq_cols=["seq"]
        )
        q.awaitTermination(120)
        if batch is b2:
            # mid-stream check: the stale upsert was absorbed (version
            # counted) but the tombstone held
            mid = {r["k"] for r in spark.read.parquet(snap).collect()}
            assert 1 not in mid, mid

    got = {
        (r["k"], r["seq"], r["val"], r["n_versions"])
        for r in spark.read.parquet(snap).collect()
    }
    want = {
        (r["k"], r["seq"], r["val"], r["n_versions"])
        for r in cdc_apply(
            spark.createDataFrame(b1 + b2 + b3, schema),
            key_cols=["k"],
            seq_cols=["seq"],
        ).collect()
    }
    assert got == want, (got, want)
    assert (1, 6, "a-new", 3) in got  # delete@5 + stale@3 + new@6 all counted


def test_psi_drift_sink_equals_batch_query(spark, tmp_path):
    """The streaming PSI gate must be bit-identical to the batch
    q_psi_drift over the same rows: freeze the reference from the
    feed's base half, stream the current half in TWO micro-batch
    rounds through psi_drift_sink, and read_psi's scores must equal
    the batch query's (same smoothing, same rounded-ln recipe)."""
    from pyspark.sql import functions as F

    from radient_spark.catalog import load_tables
    from radient_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    ev = load_tables(spark, sf)["events"]
    cut = F.lit("2024-01-16").cast("timestamp")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    reference = (
        ev.filter(F.col("ts") < cut)
        .select(
            F.col("event_type").alias("g"),
            (cents - (cents % 5000)).alias("bin"),
        )
        .groupBy("g", "bin")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    curr = ev.filter(F.col("ts") >= cut).select("event_type", "value")
    rows = curr.collect()
    mid = len(rows) // 2
    in_dir, st_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "psi_state"),
        str(tmp_path / "ck_psi"),
    )
    schema = "event_type string, value double"
    spark.createDataFrame(rows[:mid], schema).write.mode("overwrite").parquet(
        in_dir
    )
    q = streaming.psi_drift_sink(
        spark.readStream.schema(curr.schema).parquet(in_dir), st_dir, ck
    )
    q.awaitTermination(120)
    spark.createDataFrame(rows[mid:], schema).write.mode("append").parquet(
        in_dir
    )
    q2 = streaming.psi_drift_sink(
        spark.readStream.schema(curr.schema).parquet(in_dir), st_dir, ck
    )
    q2.awaitTermination(120)
    got = [
        tuple(r)
        for r in streaming.read_psi(spark, st_dir, reference).collect()
    ]
    want = [
        tuple(r) for r in QUERIES["q_psi_drift"][0](spark, sf).collect()
    ]
    assert got == want


def test_lsh_dedup_sink_equals_batch_flags(spark, tmp_path):
    """The continuous-ingestion near-dup gate must be exactly the batch
    operator replayed: three micro-batch rounds (ids monotone with
    arrival, per the append-only contract) through lsh_dedup_sink, and
    the accumulated flags — AND the final bucket-ownership state — must
    equal lsh_first_arrival_flags / the ownership fold over the union.
    Min-fold commutativity is what makes the boundaries invisible."""
    from radient_spark.operators.dedup import (
        lsh_buckets,
        lsh_first_arrival_flags,
        with_minhash,
    )

    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "colorless green ideas sleep furiously under a pale winter moon",
        "data pipelines shuffle bytes across the cluster every single night",
        "a completely different sentence about sailing ships and ocean tides",
    ]
    rows = []
    for i in range(60):
        if i % 5 == 4:
            # exact duplicate of an earlier doc -> all bands collide
            rows.append((i, rows[i - 4][1]))
        elif i % 5 == 3:
            # near-duplicate: one token changed on a long shared text
            rows.append((i, base[i % 4] + f" extra token{i % 2}"))
        else:
            rows.append((i, base[i % 4] + f" unique tail {i} " + "pad " * (i % 7)))
    schema = "doc_id bigint, text string"
    in_dir = str(tmp_path / "lsh_in")
    dd = str(tmp_path / "lsh_dedup")
    ck = str(tmp_path / "lsh_ck")
    kw = dict(num_hashes=16, shingle_k=3, bands=4)

    for lo, hi in [(0, 20), (20, 45), (45, 60)]:
        spark.createDataFrame(rows[lo:hi], schema).write.mode("append").parquet(in_dir)
        q = streaming.lsh_dedup_sink(
            spark.readStream.schema(schema).parquet(in_dir), dd, ck, **kw
        )
        q.awaitTermination(120)

    all_docs = spark.createDataFrame(rows, schema)
    exp_flags = sorted(
        tuple(r) for r in lsh_first_arrival_flags(all_docs, **kw).collect()
    )
    got_flags = sorted(
        tuple(r) for r in streaming.read_lsh_flags(spark, dd).collect()
    )
    assert got_flags == exp_flags
    assert len(exp_flags) >= 12  # the exact-dup rows are always caught

    sigs = with_minhash(
        all_docs.filter(F.length(F.trim("text")) > 0).select("doc_id", "text"),
        text_col="text", num_hashes=16, shingle_k=3, out_col="__sig",
    ).select("doc_id", "__sig")
    exp_state = sorted(
        tuple(r)
        for r in lsh_buckets(sigs, sig_col="__sig", bands=4, num_hashes=16)
        .groupBy("band_idx", "band_key")
        .agg(F.min("doc_id").alias("owner"))
        .collect()
    )
    got_state = sorted(
        tuple(r)
        for r in streaming.read_first_arrival_state(spark, dd)
        .select("band_idx", "band_key", "owner")
        .collect()
    )
    assert got_state == exp_state


def test_srp_dedup_sink_equals_batch_flags(spark, tmp_path):
    """Embedding twin of the LSH gate: three micro-batch rounds of
    vectors through srp_dedup_sink must reproduce
    srp_first_arrival_flags over the union — same min-fold argument,
    angle blocking instead of token blocking."""
    import math

    from radient_spark.operators.dedup import srp_first_arrival_flags

    def vec(i):
        if i % 4 == 3:
            return vec(i - 3)  # exact duplicate -> all bands collide
        # distinct directions spread around the circle, embedded in 8-d
        a = 2.0 * math.pi * (i * 37 % 97) / 97.0
        v = [math.cos(a), math.sin(a)] + [((i * j) % 5 - 2) / 10.0 for j in range(6)]
        return [float(x) for x in v]

    rows = [(i, vec(i)) for i in range(48)]
    schema = "vec_id bigint, embedding array<float>"
    in_dir = str(tmp_path / "srp_in")
    dd = str(tmp_path / "srp_dedup")
    ck = str(tmp_path / "srp_ck")
    kw = dict(dim=8, n_bits=16, bands=4, seed=7)

    for lo, hi in [(0, 16), (16, 36), (36, 48)]:
        spark.createDataFrame(rows[lo:hi], schema).write.mode("append").parquet(in_dir)
        q = streaming.srp_dedup_sink(
            spark.readStream.schema(schema).parquet(in_dir), dd, ck, **kw
        )
        q.awaitTermination(120)

    all_rows = spark.createDataFrame(rows, schema)
    exp = sorted(
        tuple(r) for r in srp_first_arrival_flags(all_rows, **kw).collect()
    )
    got = sorted(
        tuple(r)
        for r in streaming.read_lsh_flags(spark, dd, id_col="vec_id").collect()
    )
    assert got == exp
    assert len(exp) >= 12  # the exact-duplicate rows are always caught


def test_first_arrival_sink_replay_is_noop(spark, tmp_path):
    """Crash contract of the near-dup gates: a batch replayed AFTER its
    state commit (crash before the streaming checkpoint landed) must
    change nothing — no re-folded state, no duplicate flag rows beyond
    the documented same-epoch re-append, which read_lsh_flags dedupes."""
    from radient_spark import streaming as S

    rows = [(i, f"common shared text tail {'x' if i % 2 else 'y'}") for i in range(12)]
    schema = "doc_id bigint, text string"
    in_dir, dd, ck = (
        str(tmp_path / "in"), str(tmp_path / "dd"), str(tmp_path / "ck")
    )
    spark.createDataFrame(rows, schema).write.mode("append").parquet(in_dir)
    q = S.lsh_dedup_sink(
        spark.readStream.schema(schema).parquet(in_dir), dd, ck,
        num_hashes=8, shingle_k=2, bands=4,
    )
    q.awaitTermination(120)
    state_before = sorted(
        tuple(r) for r in S.read_first_arrival_state(spark, dd)
        .select("band_idx", "band_key", "owner").collect()
    )
    flags_before = sorted(
        tuple(r) for r in S.read_lsh_flags(spark, dd).collect()
    )
    # replay epoch 0 by re-running the SAME checkpointed query over the
    # unchanged input: every batch re-delivered must hit the epoch
    # marker and no-op
    q2 = S.lsh_dedup_sink(
        spark.readStream.schema(schema).parquet(in_dir), dd, ck,
        num_hashes=8, shingle_k=2, bands=4,
    )
    q2.awaitTermination(120)
    # harsher replay: a NEW checkpoint over the same input re-delivers
    # everything as epoch 0 under a DIFFERENT tag, so the epoch marker
    # does NOT short-circuit and the fold itself must be idempotent
    # (min-fold re-folds to the same state; flags re-append identical
    # rows, which the reader dedupes)
    q3 = S.lsh_dedup_sink(
        spark.readStream.schema(schema).parquet(in_dir), dd,
        str(tmp_path / "ck2"),
        num_hashes=8, shingle_k=2, bands=4,
    )
    q3.awaitTermination(120)
    state_after = sorted(
        tuple(r) for r in S.read_first_arrival_state(spark, dd)
        .select("band_idx", "band_key", "owner").collect()
    )
    flags_after = sorted(
        tuple(r) for r in S.read_lsh_flags(spark, dd).collect()
    )
    assert state_after == state_before
    assert flags_after == flags_before


def test_first_arrival_state_log_is_o_batch(spark, tmp_path):
    """Longevity contract (round 11, VERDICT r10 task 4): each micro-batch
    WRITES only its own keys into a per-epoch delta — never a rewrite of
    the full accumulated ownership table — and the delta log compacts
    into base/ every `compact_every` batches. With disjoint 6-batch
    input, per-batch state growth must track batch keys while total
    distinct keys keep rising; the folded reader still equals the batch
    operator's fold over the union."""
    import os

    from radient_spark.operators.dedup import lsh_buckets, with_minhash
    from radient_spark.streaming import (
        _list_state_parts,
        read_first_arrival_state,
    )

    schema = "doc_id bigint, text string"
    in_dir, dd, ck = (
        str(tmp_path / "in"), str(tmp_path / "dd"), str(tmp_path / "ck")
    )
    kw = dict(num_hashes=8, shingle_k=2, bands=4)
    rows = []
    per_epoch_rows = {}
    for e in range(6):
        batch = [
            (e * 100 + i, f"entirely distinct body {e} {i} " + "w " * (i % 5))
            for i in range(8)
        ]
        rows += batch
        per_epoch_rows[e] = batch
        spark.createDataFrame(batch, schema).write.mode("append").parquet(in_dir)
        q = streaming.lsh_dedup_sink(
            spark.readStream.schema(schema).parquet(in_dir), dd, ck,
            compact_every=4, **kw
        )
        q.awaitTermination(120)

    state_dir = f"{dd}/state"
    parts = _list_state_parts(spark, state_dir)
    deltas = [p for p in parts if "/delta-" in p]
    bases = [p for p in parts if p.endswith("/base")]
    # 6 batches at compact_every=4: compaction fired once (after the
    # 4th delta landed), leaving base + the last 2 deltas
    assert len(bases) == 1, parts
    assert len(deltas) == 2, parts

    # each surviving delta holds ONLY its batch's keys (O(batch) write),
    # a strict subset of the full key universe
    def batch_keys(batch):
        df = spark.createDataFrame(batch, schema)
        sigs = with_minhash(
            df.select("doc_id", "text"), text_col="text",
            num_hashes=8, shingle_k=2, out_col="__sig",
        ).select("doc_id", "__sig")
        return (
            lsh_buckets(sigs, sig_col="__sig", bands=4, num_hashes=8)
            .select("band_idx", "band_key").distinct().count()
        )

    total_keys = read_first_arrival_state(spark, dd).count()
    for d in sorted(deltas):
        epoch = int(os.path.basename(d).rsplit("-", 1)[1])
        n = spark.read.parquet(d).count()
        assert n == batch_keys(per_epoch_rows[epoch]), (d, n)
        assert n < total_keys / 2  # delta << accumulated state

    # folded state still equals the batch operator's fold over the union
    all_docs = spark.createDataFrame(rows, schema)
    sigs = with_minhash(
        all_docs.select("doc_id", "text"), text_col="text",
        num_hashes=8, shingle_k=2, out_col="__sig",
    ).select("doc_id", "__sig")
    exp = sorted(
        tuple(r)
        for r in lsh_buckets(sigs, sig_col="__sig", bands=4, num_hashes=8)
        .groupBy("band_idx", "band_key")
        .agg(F.min("doc_id").alias("owner"))
        .collect()
    )
    got = sorted(
        tuple(r)
        for r in read_first_arrival_state(spark, dd)
        .select("band_idx", "band_key", "owner")
        .collect()
    )
    assert got == exp


def test_first_arrival_partial_delta_is_invisible(spark, tmp_path):
    """Crash window: a batch that died mid-delta-write leaves a delta
    dir containing only the committer's _temporary scratch (no
    _SUCCESS). Readers and later batches must skip it — including it
    would fail schema inference forever — and the replayed epoch
    overwrites it cleanly."""
    import os

    from radient_spark.streaming import (
        _list_state_parts,
        read_first_arrival_state,
    )

    schema = "doc_id bigint, text string"
    in_dir, dd, ck = (
        str(tmp_path / "in"), str(tmp_path / "dd"), str(tmp_path / "ck")
    )
    rows = [(i, f"shared text body {'a' if i % 2 else 'b'} tail") for i in range(10)]
    spark.createDataFrame(rows, schema).write.mode("append").parquet(in_dir)
    q = streaming.lsh_dedup_sink(
        spark.readStream.schema(schema).parquet(in_dir), dd, ck,
        num_hashes=8, shingle_k=2, bands=4,
    )
    q.awaitTermination(120)
    state_dir = f"{dd}/state"
    before = sorted(
        tuple(r) for r in read_first_arrival_state(spark, dd).collect()
    )

    # fabricate the crash artifact: partial delta, only _temporary inside
    partial = f"{state_dir}/delta-deadbeef-99"
    os.makedirs(f"{partial}/_temporary/0")
    assert partial not in _list_state_parts(spark, state_dir)
    after = sorted(
        tuple(r) for r in read_first_arrival_state(spark, dd).collect()
    )
    assert after == before

    # a later batch still processes and folds correctly past the debris
    more = [(100 + i, f"shared text body {'a' if i % 2 else 'b'} tail") for i in range(4)]
    spark.createDataFrame(more, schema).write.mode("append").parquet(in_dir)
    q2 = streaming.lsh_dedup_sink(
        spark.readStream.schema(schema).parquet(in_dir), dd, ck,
        num_hashes=8, shingle_k=2, bands=4,
    )
    q2.awaitTermination(120)
    final = read_first_arrival_state(spark, dd)
    # new docs share every bucket with old ones -> owners unchanged
    assert sorted(tuple(r) for r in final.collect()) == before


def test_first_arrival_legacy_flat_state_migrates(spark, tmp_path):
    """Upgrade path (round-11 ADVICE, medium): state written by the
    pre-claim-log FLAT layout (part-*.parquet directly under state_dir)
    must be folded into base/ on first contact — silently ignoring it
    would restart the gate with empty ownership and re-admit duplicates
    of its entire history."""
    import os

    from radient_spark.streaming import (
        _list_state_parts,
        read_first_arrival_state,
    )

    schema = "doc_id bigint, text string"
    in_dir, dd, ck = (
        str(tmp_path / "in"), str(tmp_path / "dd"), str(tmp_path / "ck")
    )
    state_dir = f"{dd}/state"
    # fabricate the legacy layout: the folded ownership table written as
    # plain parquet at the state root (what the pre-r11 sink left behind)
    legacy = [(0, "12345_9", 1), (1, "777_3", 1), (2, "9_9", 4)]
    spark.createDataFrame(
        legacy, "band_idx int, band_key string, owner bigint"
    ).coalesce(1).write.parquet(state_dir)
    flat_before = [
        f for f in os.listdir(state_dir) if f.endswith(".parquet")
    ]
    assert flat_before

    # reading folds the legacy claims (migration happens on first list)
    got = sorted(
        tuple(r)
        for r in read_first_arrival_state(spark, dd)
        .select("band_idx", "band_key", "owner")
        .collect()
    )
    assert got == sorted(legacy)
    # flat files are gone; base/ carries the history, bucket-partitioned
    assert not any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    )
    parts = _list_state_parts(spark, state_dir)
    assert parts == [f"{state_dir}/base"]
    assert any(
        f.startswith("bucket=") for f in os.listdir(f"{state_dir}/base")
    )

    # and a NEW sink over the migrated state still honors prior owners:
    # stream a doc whose buckets collide with nothing -> no flags, but
    # the legacy claims must survive the batch untouched
    rows = [(50, "totally new body x y z")]
    spark.createDataFrame(rows, schema).write.mode("append").parquet(in_dir)
    q = streaming.lsh_dedup_sink(
        spark.readStream.schema(schema).parquet(in_dir), dd, ck,
        num_hashes=8, shingle_k=2, bands=4,
    )
    q.awaitTermination(120)
    after = {
        (r["band_idx"], r["band_key"]): r["owner"]
        for r in read_first_arrival_state(spark, dd).collect()
    }
    for bi, bk, owner in legacy:
        assert after[(bi, bk)] == owner


def test_first_arrival_sink_requires_success_markers(spark, tmp_path):
    """Round-11 ADVICE: delta visibility is gated on the job-commit
    _SUCCESS marker, so a cluster with marksuccessfuljobs=false would
    silently degrade cross-batch dedup to per-batch. The sink must
    refuse to construct."""
    schema = "doc_id bigint, text string"
    in_dir = str(tmp_path / "in")
    spark.createDataFrame([(1, "a b c")], schema).write.parquet(in_dir)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    hconf.setBoolean(key, False)
    try:
        with pytest.raises(RuntimeError, match="_SUCCESS"):
            streaming.lsh_dedup_sink(
                spark.readStream.schema(schema).parquet(in_dir),
                str(tmp_path / "dd"), str(tmp_path / "ck"),
                num_hashes=8, shingle_k=2, bands=4,
            )
    finally:
        hconf.setBoolean(key, True)


def test_epoch_markers_foreign_tag_trimmed(spark, tmp_path):
    """Round-11 ADVICE: markers from a RETIRED checkpoint (foreign tag)
    have epoch ids incomparable to the active tag's horizon and would
    accumulate forever under a numeric-only trim. Compaction deletes
    them outright; the active tag keeps its replayable horizon."""
    import os

    from radient_spark.streaming import (
        _N_STATE_BUCKETS,
        _compact_first_arrival,
        _epoch_tag,
        _stamp_epoch,
    )

    schema = "doc_id bigint, text string"
    in_dir, dd = str(tmp_path / "in"), str(tmp_path / "dd")
    ck = str(tmp_path / "ck")
    state_dir = f"{dd}/state"
    rows = [(i, f"body {i} alpha beta") for i in range(6)]
    spark.createDataFrame(rows, schema).write.parquet(in_dir)
    q = streaming.lsh_dedup_sink(
        spark.readStream.schema(schema).parquet(in_dir), dd, ck,
        num_hashes=8, shingle_k=2, bands=4,
    )
    q.awaitTermination(120)

    tag = _epoch_tag(ck)
    # retired checkpoint's markers, with HIGH epoch ids (> active horizon)
    _stamp_epoch(spark, state_dir, "deadbeef", 500)
    _stamp_epoch(spark, state_dir, "deadbeef", 501)
    # active tag, inside the replayable horizon
    _stamp_epoch(spark, state_dir, tag, 1)
    _compact_first_arrival(spark, state_dir, tag, 2, 0, _N_STATE_BUCKETS)
    names = set(os.listdir(state_dir))
    assert f"_EPOCH-{tag}-1" in names
    assert not any(n.startswith("_EPOCH-deadbeef-") for n in names)


def test_first_arrival_probe_prunes_base_partitions(spark, tmp_path, monkeypatch):
    """100 TB co-location contract (VERDICT r11 #4): after compaction
    the base/ is hive-partitioned by bucket, and the per-batch
    prior-owner probe reads it with a PARTITION filter (pruning to the
    batch's buckets) and joins with the batch side broadcast — no
    shuffle Exchange on the state side."""
    from radient_spark.streaming import (
        _bucket_expr,
        _list_state_parts,
        _probe_prior_claims,
        _read_claims,
    )

    schema = "doc_id bigint, text string"
    in_dir, dd, ck = (
        str(tmp_path / "in"), str(tmp_path / "dd"), str(tmp_path / "ck")
    )
    state_dir = f"{dd}/state"
    rows = [(i, f"doc body {i} {'x ' * (i % 7)}") for i in range(32)]
    spark.createDataFrame(rows, schema).write.parquet(in_dir)
    # compact_every=1: base/ exists (bucketed) after the single batch
    q = streaming.lsh_dedup_sink(
        spark.readStream.schema(schema).parquet(in_dir), dd, ck,
        num_hashes=8, shingle_k=2, bands=4, compact_every=1,
    )
    q.awaitTermination(120)
    parts = _list_state_parts(spark, state_dir)
    assert parts == [f"{state_dir}/base"]

    # the probe shape batch_fn builds: bucket-filtered state read +
    # broadcast-able left-semi probe by batch keys
    batch_owner = spark.createDataFrame(
        [(0, "1_2", 99)], "band_idx int, band_key string, owner bigint"
    )
    bucket_vals = [
        r[0]
        for r in batch_owner.select(
            _bucket_expr(64).alias("b")
        ).distinct().collect()
    ]
    prev = _read_claims(spark, parts, bucket_values=bucket_vals)
    plan = prev._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters: [", 1)[1].split("]")[0]

    # pruning is size-gated (the bucket-ids collect only pays above
    # _PRUNE_MIN_BASE_BYTES); force it on for this small test base
    monkeypatch.setattr(streaming, "_PRUNE_MIN_BASE_BYTES", 0)
    probe = _probe_prior_claims(spark, parts, batch_owner, 64)
    probe.collect()  # AQE finalizes the plan only at execution
    executed = probe._jdf.queryExecution().executedPlan().toString()
    # state side never shuffles: broadcast semi join, no shuffle Exchange
    assert "BroadcastHashJoin" in executed
    assert "LeftSemi" in executed
    assert "Exchange hashpartitioning" not in executed
