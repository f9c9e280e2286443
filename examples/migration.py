"""Migration guide: fzliu/radient -> radient_spark, side by side.

Every flow from the reference's README/examples, re-expressed. Runnable
end-to-end on the driver testdata (deterministic vectorizers; the
model-backed ones are import-gated drop-ins with the same column
contract).

Run: python examples/migration.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from radient_spark.catalog import load_tables
from radient_spark.factory import make_operator
from radient_spark.functions import vector as V
from radient_spark.operators.topk import topk
from radient_spark.orchestrate import Workflow
from radient_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_session("migration_example")
    docs = load_tables(spark, SF_DIR)["documents"]

    # ------------------------------------------------------------------
    # reference (README.md:15-20):
    #   vz = text_vectorizer()
    #   vz.vectorize("Hello, world!")
    # radient_spark: a vectorizer is a DataFrame transform; one string is
    # a one-row DataFrame. Same factory surface.
    vectorize = make_operator("vectorizer", "hashing", dim=64, normalize=True)
    hello = spark.createDataFrame([("Hello, world!",)], "text string")
    vec = vectorize(hello).select("vector").first()["vector"]
    print(f"vectorize('Hello, world!') -> dim={len(vec)} unit vector")

    # ------------------------------------------------------------------
    # reference (README.md:80-96): Workflow().add(source).add(vectorizer)
    #   .add(sink); wf()
    # radient_spark: the same DAG, but each node extends one lazy plan.
    wf = (
        Workflow()
        .add(lambda **kw: kw["df"], "source")
        .add(make_operator("dedup", "exact", cols=["text"]), "dedup")
        .add(vectorize, "vectorize")
    )
    corpus_vecs = wf.run(df=docs.select("doc_id", "text"))
    print(f"workflow: {corpus_vecs.count()} deduped docs vectorized")

    # ------------------------------------------------------------------
    # reference (examples/multimodal_rag.md:73-95): embed a prompt, then
    # sink.transact(..., operation='search', filter='modality == ...')
    # radient_spark: search is a query on the same engine — top-k plus
    # any relational predicate, no external vector store.
    prompt = vectorize(
        spark.createDataFrame([("customer order data",)], "text string")
    ).first()["vector"]
    hits = topk(
        corpus_vecs, vec_col="vector", query=list(prompt), k=3,
        metric="cosine", tiebreak="doc_id",
    ).select("doc_id", "score")
    print("search top-3:", [(r["doc_id"], r["score"]) for r in hits.collect()])
    # Code still pointed at an EXTERNAL Milvus/Atlas deployment ports
    # verbatim through the kwargs-compatible shims instead:
    #   sinks.milvus_search(vectors, collection, limit=3,
    #                       filter="modality == 'text'",
    #                       output_fields=["doc_id"])
    #   sinks.mongodb_search(vectors, collection, database,
    #                        num_candidates=150, limit=3)

    # ------------------------------------------------------------------
    # reference (examples/drug_discovery.md:42-48): molecule fingerprints
    # + Jaccard cdist + argsort[:10]
    # radient_spark: fingerprint_vectorizer + jaccard_bool + orderBy/limit
    from radient_spark.operators.vectorize import fingerprint_vectorizer

    parts = load_tables(spark, SF_DIR)["part"]
    fps = fingerprint_vectorizer(parts, input_col="p_name", out_col="fp", dim=128)
    q = fps.first()
    similar = (
        fps.withColumn("jac", V.jaccard_bool(F.col("fp"), F.array(*[F.lit(bool(b)) for b in q["fp"]])))
        .orderBy(F.col("jac").desc(), F.col("p_partkey").asc())
        .limit(5)
    )
    print(f"molecules similar to {q['p_name']!r}:",
          [(r["p_name"], round(r["jac"], 3)) for r in similar.collect()])

    # ------------------------------------------------------------------
    # reference (GANN local index, sinks/local/gann.py): insert -> index
    # -> search
    # radient_spark: AnnIndex.build / save / search — distributed.
    from radient_spark.ann import AnnIndex

    emb = load_tables(spark, SF_DIR)["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    index = AnnIndex.build(emb, n_trees=2, max_leaf_size=100, seed=42)
    first = emb.first()
    ann_hits = index.search([(0, list(first["vector"]))], k=3).collect()
    print("ANN search:", [(r["id"], r["score"]) for r in ann_hits])

    # ... and when the queries are themselves a table (no driver list):
    qdf = emb.limit(2).select(F.col("id").alias("qid"), F.col("vector").alias("qvec"))
    print("ANN search_df:", index.search_df(qdf, k=2).count(), "hits")

    # Past ~10^7-10^8 rows the forest's broadcast metadata outgrows its
    # budget (SCALING.md "forest metadata ceiling") — build() checks the
    # crossover itself and WARNS when the estimate is over budget;
    # AnnIndex.build(emb, auto=True) routes the over-budget build to
    # IvfIndex (~sqrt(n) centroids) automatically, and
    # broadcast_budget_bytes= tunes the ceiling. The scale path is
    # the lattice IVF (round-10 surface): integer micro-lattice
    # centroids (exact SQL-replayable build), ~sqrt(n)-sized centroid
    # broadcast instead of the n/leaf-sized forest.
    from radient_spark.ann import IvfIndex

    lat = IvfIndex.build_lattice(emb, n_cells=8, seed=42)
    lat_hits = lat.search(
        [(0, list(first["vector"]))], k=3, n_probes=3
    ).collect()
    print("lattice IVF search:", [(r["id"], r["score"]) for r in lat_hits])

    # Continuous ingestion twin (round-10 surface): the SAME first-
    # arrival ownership algebra as operators/dedup runs as an always-on
    # stream — streaming.lsh_dedup_sink / srp_dedup_sink append O(batch)
    # claim deltas and compact periodically; flags accumulate per epoch.
    # (See tests/test_streaming.py::test_lsh_dedup_sink_equals_batch_flags
    # for the stream ≡ batch bit-equality contract.)

    # ------------------------------------------------------------------
    # reference (vectorizers/audio/imagebind.py + image/imagebind.py):
    # waveform -> 2 s clips -> (128, 204) log-mels; image -> 224 CLIP
    # tensor. The preprocessing is model-free and runs for real here;
    # the gated trunks consume these rows when imagebind is installed.
    import math as _math

    from radient_spark.operators.preprocess import audio_to_melspec_clips

    tone = [
        _math.sin(2 * _math.pi * 440 * t / 16_000) for t in range(3 * 16_000)
    ]
    audio = spark.createDataFrame(
        [(1, tone, 16_000)], "id long, waveform array<float>, sample_rate int"
    )
    mel_rows = audio_to_melspec_clips(audio).collect()
    print(f"audio preprocess: {len(mel_rows)} mel clips of "
          f"{mel_rows[0]['n_mel']}x{mel_rows[0]['n_frames']}")

    # ------------------------------------------------------------------
    # reference (text/sklearn.py:26-29, declared sparse surface):
    # radient_spark: MLlib SparseVectors + long-form view.
    from radient_spark.operators.sparse import sparse_terms_long, sparse_tfidf

    tf_vecs, vocab = sparse_tfidf(docs.select("doc_id", "text").limit(200))
    n_terms = sparse_terms_long(tf_vecs, vocab, vec_col="tfidf").count()
    print(f"sparse tfidf: |vocab|={len(vocab)}, {n_terms} nonzero terms")

    # ------------------------------------------------------------------
    # beyond the reference: the training-pipeline trio (split / pack /
    # scrub) every 100 TB corpus job needs.
    from radient_spark.operators.dataset import (
        hash_split,
        scrub_pii,
        sequential_pack,
    )

    split_counts = (
        hash_split(docs, "doc_id").groupBy("split").count().collect()
    )
    print("hash_split:", {r["split"]: r["count"] for r in split_counts})
    packed = sequential_pack(
        docs.select("source", "doc_id", F.length("text").alias("n")),
        token_col="n", order_col="doc_id", partition_cols=["source"],
        budget=4096,
    )
    print("sequential_pack:", packed.select("chunk_id").distinct().count(), "chunks")
    scrubbed = docs.select(scrub_pii(F.col("text")).alias("t")).count()
    print("scrub_pii over", scrubbed, "docs")

    # ------------------------------------------------------------------
    # beyond the reference: model-based data selection — CCNet perplexity
    # buckets and DSIR importance weights.
    from radient_spark.operators.dataset import (
        dsir_logweights,
        perplexity_buckets,
        unigram_surprisal_vocab,
    )

    vocab_lm = unigram_surprisal_vocab(docs)
    ppl = perplexity_buckets(docs, vocab_lm)
    print(
        "perplexity buckets:",
        {r["ppl_bucket"]: r["count"] for r in ppl.groupBy("ppl_bucket").count().collect()},
    )
    dsir = dsir_logweights(docs, F.col("lang") == "en")
    print("dsir top decile:", dsir.filter("decile = 1").count(), "docs")

    # ------------------------------------------------------------------
    # beyond the reference: repeated-substring (suffix-array-style) dedup
    # coverage per document.
    from radient_spark.operators.dedup import repeated_ngram_coverage

    cov = repeated_ngram_coverage(docs, "text", "doc_id", n=5)
    dup_docs = cov.filter("coverage > 0").count()
    print(f"repeated-substring: {dup_docs} docs contain duplicated 5-gram spans")

    # ------------------------------------------------------------------
    # beyond the reference: quantized embedding search — SQ8 (4x smaller,
    # integer ADC) and PQ (16x smaller, codebook lookup + exact rerank).
    from radient_spark.operators.quantize import (
        pq_fit,
        pq_topk,
        sq8_minmax,
        sq8_topk,
    )
    from radient_spark.queries import QUERY_VEC

    emb = load_tables(spark, SF_DIR)["embeddings"]
    stats = sq8_minmax(emb)
    print("sq8 top-3:", [r["vec_id"] for r in sq8_topk(emb, stats, QUERY_VEC, k=3).collect()])
    books = pq_fit(emb, m=16, k=16, iters=1)
    print("pq top-3:", [r["vec_id"] for r in pq_topk(emb, books, QUERY_VEC, k=3, shortlist=80).collect()])

    # ------------------------------------------------------------------
    # beyond the reference: model-based quality filtering — train a
    # linear classifier with MLlib, serve it as a literal-weight Catalyst
    # expression (zero shuffle, zero Python at scoring time).
    from radient_spark.operators.classify import (
        fit_linear_classifier,
        linear_classifier_score,
    )

    labeled = docs.withColumn(
        "label", (F.length("text") > 100).cast("double")
    )
    weights, bias = fit_linear_classifier(labeled, "label", dim=64, max_iter=5)
    scored = linear_classifier_score(docs, weights, bias=bias, sigmoid=True)
    print(
        "classifier keep-rate:",
        scored.filter("score >= 0.5").count(), "/", docs.count(),
    )

    # ------------------------------------------------------------------
    # beyond the reference: corpus refresh (MERGE INTO) + paragraph-level
    # boilerplate removal + budget-cut selection.
    from radient_spark.operators.dedup import paragraph_dedup
    from radient_spark.operators.merge import merge_summary

    delta = docs.filter("doc_id % 5 = 0").withColumn(
        "text", F.concat("text", F.lit(" updated"))
    )
    print(
        "merge audit:",
        {r["action"]: r["n_rows"]
         for r in merge_summary(
             docs.select("doc_id", "text"), delta.select("doc_id", "text"),
             ["doc_id"], ["text"]).collect()},
    )
    cleaned = paragraph_dedup(docs, "text", "doc_id", chunk_tokens=10)
    print(
        "paragraph dedup: dropped",
        cleaned.agg(F.sum(F.col("n_chunks") - F.col("n_kept"))).collect()[0][0],
        "duplicated chunks",
    )

    # ------------------------------------------------------------------
    # beyond the reference: Z-order layout for multi-column data skipping
    # and PageRank importance over a trade graph.
    from radient_spark.operators.graph import pagerank
    from radient_spark.operators.layout import zorder_repartition

    orders = load_tables(spark, SF_DIR)["orders"]
    laid = zorder_repartition(
        orders.withColumn("xk", F.pmod("o_custkey", F.lit(1024)))
        .withColumn("yd", F.pmod("o_orderkey", F.lit(1024))),
        ["xk", "yd"], bits=10, n_partitions=8,
    )
    print("zorder partitions:", laid.rdd.getNumPartitions())
    edges = orders.select(
        F.col("o_custkey").alias("src"), (F.col("o_orderkey") % 100).alias("dst")
    )
    pr = pagerank(edges, iters=3)
    print("pagerank top node:", pr.orderBy(F.desc("rank")).first()["node"])

    # ------------------------------------------------------------------
    # beyond the reference: hybrid retrieval (BM25 + vector RRF) and the
    # compressed-search family (binary Hamming, Matryoshka prefix).
    from radient_spark.functions.vector import (
        binary_quantize,
        hamming_distance_words,
    )
    from radient_spark.operators.retrieval import bm25_scores

    bm = bm25_scores(docs, ["spark", "join", "window"], "text", "doc_id")
    print("bm25 hits:", bm.count())
    codes = emb.select(
        "vec_id", binary_quantize(F.col("embedding"), 64, 32).alias("c")
    )
    q = codes.limit(1).collect()[0]["c"]
    ham = codes.select(
        "vec_id",
        hamming_distance_words(
            F.col("c"), F.array(*[F.lit(int(w)).cast("long") for w in q])
        ).alias("h"),
    )
    print("binary-quantized nearest:", ham.orderBy("h", "vec_id").first()["vec_id"])

    # ------------------------------------------------------------------
    # round-3 audit/sketch surfaces: bloom-gated ingest, hash-verified
    # sketches, exact distributed percentiles, dataset-card profiling.
    from radient_spark.operators.dataset import (
        exact_group_quantiles,
        profile_table,
    )
    from radient_spark.operators.dedup import bloom_build, bloom_gate
    from radient_spark.operators.sketch import cms_build, hll_cardinality

    bitmap = bloom_build(docs.select("text"), "text", m_bits=1 << 14, k=4)
    gated = bloom_gate(docs.select("doc_id", "text"), bitmap, "text", 1 << 14, 4)
    print("bloom maybe-dup rows:", gated.filter("maybe_dup").count())
    print(
        "hll distinct docs ~=",
        hll_cardinality(docs, "text").first()["estimate"],
    )
    print("cms cells:", cms_build(docs.select(F.col("source").alias("tok")), "tok").count())
    ev = load_tables(spark, SF_DIR)["events"]
    pcts = exact_group_quantiles(ev, "event_type", "value", [0.5, 0.99])
    print("exact percentile rows:", pcts.count())
    print("profile rows:", profile_table(load_tables(spark, SF_DIR)["orders"]).count())

    # ------------------------------------------------------------------
    # round-4 surfaces: BPE tokenizer training, histogram quantile
    # sketch, O(log n) components, SCD2 history, water-fill budgets.
    from radient_spark.operators.bpe import bpe_apply, bpe_learn
    from radient_spark.operators.graph import connected_components_star
    from radient_spark.operators.merge import scd2_history
    from radient_spark.operators.sketch import hist_build, hist_quantiles

    merges = bpe_learn(docs, rounds=3).collect()
    print("bpe merges:", [(m.left_sym, m.right_sym) for m in merges])
    toks = bpe_apply(
        docs.limit(5), [(m.left_sym, m.right_sym) for m in merges]
    )
    print("bpe-tokenized rows:", toks.count())

    sk = hist_build(
        ev.select(F.round(F.col("value") * 100).cast("long").alias("c")),
        F.col("c"),
    )
    print(
        "hist p95 bucket:",
        hist_quantiles(sk, [("p95", 19, 20)]).first()["est_lo"],
    )

    star = connected_components_star(
        spark.createDataFrame([(1, 2), (2, 3), (9, 9)], ["id_a", "id_b"])
    )
    print("star components:", star.count())

    orders = load_tables(spark, SF_DIR)["orders"]
    hist = scd2_history(
        orders, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    print("scd2 versions:", hist.count())

    print("migration example: all flows OK")


if __name__ == "__main__":
    main()
