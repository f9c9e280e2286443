"""End-to-end LLM training-data curation on radient_spark — the
beyond-reference surface as one runnable flow:

  contract gate -> C4 line cleaning -> exact + fuzzy dedup ->
  benchmark decontamination -> quality filter -> greedy coverage
  seed set -> snapshot fingerprint for the handoff.

Everything is ONE lazy DataFrame program per stage — no collect in any
corpus-sized path; the only driver rows are argmax picks and 1-row
fingerprints. Run: python examples/curation_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from radient_spark.catalog import load_tables
from radient_spark.operators.dataset import decontaminate, greedy_max_coverage
from radient_spark.operators.dedup import canonicalize_duplicates
from radient_spark.operators.quality import c4_line_classify, gopher_rules
from radient_spark.operators.reconcile import table_fingerprint
from radient_spark.operators.validate import validate
from radient_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_session("curation_demo")
    docs = load_tables(spark, SF_DIR)["documents"]

    # 1. contract gate: refuse the feed if the envelope is broken
    contract = validate(
        docs,
        [
            {"name": "id_unique", "type": "unique", "column": "doc_id"},
            {"name": "text_not_null", "type": "not_null", "column": "text"},
            {
                "name": "lang_enum",
                "type": "accepted_values",
                "column": "lang",
                "values": ["en", "de", "fr", "es", "zh"],
            },
        ],
    )
    print("contract:")
    contract.show(truncate=False)

    # 2. C4 line cleaning: drop docs dominated by banned/short lines
    # (this corpus has no terminal punctuation, so the no_punct rule is
    # informational here — real crawls gate on it too)
    lines = c4_line_classify(docs)
    bad_share = (
        lines.groupBy("doc_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("status").isin("banned", "short"), 1)
                    .otherwise(0)
                )
                * 100
                / F.count(F.lit(1))
            ).alias("bad_pct")
        )
        .filter(F.col("bad_pct") <= 50)
        .select("doc_id")
    )
    cleaned = docs.join(bad_share, "doc_id", "left_semi")

    # 3. exact dedup: canonical id per duplicate text group
    groups = canonicalize_duplicates(cleaned)
    deduped = cleaned.join(
        groups.select(F.col("canonical_id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )

    # 4. decontamination vs a held-out eval slice (13-gram hits)
    eval_slice = docs.filter(F.col("doc_id") % 97 == 0)
    train = deduped.join(eval_slice.select("doc_id"), "doc_id", "left_anti")
    audited = decontaminate(train, eval_slice, "text", "doc_id")
    clean = train.join(
        audited.filter(F.col("n_hit_grams") > 0).select("doc_id"),
        "doc_id",
        "left_anti",
    )

    # 5. Gopher quality rules (the synthetic corpus has no stopwords,
    # so gate on 5 of 6 rules; r_words is the live discriminator)
    rules = gopher_rules(clean)
    all_pass = (
        F.col("r_words") + F.col("r_mean_len") + F.col("r_symbol")
        + F.col("r_alpha") + F.col("r_stop") + F.col("r_repetition")
    ) >= 5
    quality = clean.join(
        rules.filter(all_pass).select("doc_id"), "doc_id", "left_semi"
    )
    print(f"kept after clean/dedup/decontam/quality: {quality.count()} docs")

    # 6. greedy max-coverage seed set (diverse few-shot pool)
    seeds = greedy_max_coverage(quality, k=3)
    print("coverage seeds:")
    seeds.show()

    # 7. fingerprint the deliverable for the downstream handoff
    fp = table_fingerprint(
        quality, [F.col("doc_id"), F.col("lang"), F.col("text")]
    )
    print("handoff fingerprint:")
    fp.show(truncate=False)

    # 8. embedding near-dup gate through the factory (round-10 surface):
    # sign-random-projection angle blocking, first-arrival ownership —
    # the batch replay of streaming.srp_dedup_sink. A vector is flagged
    # iff a lower id owns any of its SRP band buckets.
    from radient_spark.factory import make_operator

    emb = load_tables(spark, SF_DIR)["embeddings"]
    srp_gate = make_operator(
        "dedup", "srp_first_arrival", dim=64, n_bits=16, bands=4, seed=7
    )
    flagged = srp_gate(emb)
    print(f"embedding near-dups flagged: {flagged.count()}")
    flagged.orderBy("vec_id").show(5)

    # 9. vector top-k through the SQL front door (round-10 surface):
    # cosine as an INLINED SQL scalar function — whole-stage codegen,
    # no Python boundary; `ORDER BY cosine_distance(vec, q) LIMIT k`
    # works verbatim.
    from radient_spark.queries import register_sql_vector_functions

    emb.createOrReplaceTempView("demo_embeddings")
    register_sql_vector_functions(spark)
    print("SQL cosine top-5 neighbors of vec_id 0:")
    spark.sql("""
      WITH q AS (SELECT embedding AS qvec FROM demo_embeddings WHERE vec_id = 0)
      SELECT e.vec_id, ROUND(cosine_distance(e.embedding, q.qvec), 6) AS dist
      FROM demo_embeddings e CROSS JOIN q
      WHERE e.vec_id != 0
      ORDER BY dist ASC, e.vec_id ASC LIMIT 5
    """).show()


if __name__ == "__main__":
    main()
