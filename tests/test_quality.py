"""Unit tests for the Gopher rule filters, stratified sampling, and the
bigram LM (operators/quality.py, operators/dataset.py round-3 additions)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from radient_spark.operators.dataset import bigram_perplexity, stratified_sample
from radient_spark.operators.quality import gopher_report, gopher_rules


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_gopher_rules_flag_each_failure_mode(spark):
    good = " ".join(
        ["the quick brown fox jumps over lazy dogs and cats daily"] * 6
    )  # 60 words, mean len ~4.4, stopwords, varied bigrams
    rows = [
        (1, "a", good),
        (2, "a", "short text"),  # fails word count
        (3, "a", " ".join(["spam"] * 60)),  # repetition + stopwords fail
        (4, "a", ""),  # blank: fails words/alpha/stop
        (5, "a", " ".join(["1234 5678"] * 30)),  # alpha fraction fails
    ]
    r = {
        row["doc_id"]: row
        for row in gopher_rules(_docs(spark, rows)).collect()
    }
    assert r[1]["r_words"] == 1 and r[1]["r_stop"] == 1 and r[1]["r_repetition"] == 1
    assert r[2]["r_words"] == 0
    assert r[3]["r_repetition"] == 0 and r[3]["r_stop"] == 0
    assert r[4]["r_words"] == 0 and r[4]["r_alpha"] == 0
    assert r[5]["r_alpha"] == 0


def test_gopher_report_counts_add_up(spark):
    rows = [(i, "s", "word " * 60) for i in range(4)]
    rep = gopher_report(_docs(spark, rows)).collect()[0]
    assert rep["n_docs"] == 4
    # "word word ..." is maximally repetitive: all fail the repetition rule.
    assert rep["fail_repetition"] == 4
    assert rep["n_pass"] == 0


def test_stratified_sample_caps_each_stratum(spark):
    rows = [(i, "big" if i < 400 else "small", "t") for i in range(440)]
    df = _docs(spark, rows)
    out = stratified_sample(df, "source", "doc_id", target_per_stratum=40)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # big stratum (400 rows) downsampled to ~40 (binomial around 10%).
    assert 15 <= counts["big"] <= 70
    # small stratum (40 rows) kept whole: rate_bp = 10000.
    assert counts["small"] == 40


def test_stratified_sample_deterministic_and_validates(spark):
    rows = [(i, "s", "t") for i in range(100)]
    df = _docs(spark, rows)
    a = sorted(r["doc_id"] for r in stratified_sample(df, "source", "doc_id", 20).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df, "source", "doc_id", 20).collect())
    assert a == b and len(a) > 0
    assert stratified_sample(df, "source", "doc_id", 0).count() == 0
    with pytest.raises(ValueError):
        stratified_sample(df, "source", "doc_id", -1)


def test_bigram_perplexity_prefers_predictable_docs(spark):
    # "a b a b ..." has deterministic bigrams; the scrambled doc doesn't.
    rows = [
        (1, "en", "a b " * 20),
        (2, "en", "a a b b a b b a a b a b b b a a b a b a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in bigram_perplexity(df).collect()}
    assert out[1]["logppl"] < out[2]["logppl"]
    assert out[1]["ppl_bucket"] <= out[2]["ppl_bucket"]


def test_bigram_perplexity_single_token_doc_scores_unigram(spark):
    rows = [(1, "en", "solo"), (2, "en", "solo solo")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in bigram_perplexity(df).collect()}
    # corpus = 3 "solo" tokens; doc 1 = first-token surprisal -ln(3/3) = 0.
    assert math.isclose(out[1]["logppl"], 0.0, abs_tol=1e-9)


def test_luhn_valid_known_numbers(spark):
    from radient_spark.operators.quality import luhn_valid

    cases = [
        ("4539578763621486", True),
        ("6011000990139424", True),
        ("371449635398431", True),
        ("79927398713", True),
        ("4539578763621487", False),
        ("1234567812345678", False),
        ("", False),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["n"])
    got = {r["n"]: r["v"] for r in df.select("n", luhn_valid(F.col("n")).alias("v")).collect()}
    for s, want in cases:
        assert got[s] == want, s


def test_c4_line_classify_statuses(spark):
    from radient_spark.operators.quality import c4_line_classify

    docs = [
        (1, "the quick brown fox jumps high today.\nshort line\n"
            "this uses javascript everywhere fine.\n"
            "a long line with no terminal punctuation here"),
        (2, "the quick brown fox jumps high today.\n"
            "another perfectly fine sentence stands here."),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["line_idx"]): r["status"]
        for r in c4_line_classify(df, "text", "doc_id", min_words=5).collect()
    }
    assert got[(1, 0)] == "kept"
    assert got[(1, 1)] == "short"
    assert got[(1, 2)] == "banned"
    assert got[(1, 3)] == "no_punct"
    assert got[(2, 0)] == "dup"  # corpus-wide: doc 1 line 0 came first
    assert got[(2, 1)] == "kept"


def test_c4_line_classify_randomized_vs_python(spark):
    """Randomized corpus differential: the Spark classifier must match
    a pure-python re-implementation (precedence, word counting,
    terminal punctuation, corpus-wide first-occurrence dedup)."""
    import random

    from radient_spark.operators.quality import C4_BANNED, c4_line_classify

    rng = random.Random(23)
    words = ["alpha", "beta", "gamma", "delta", "cookie", "x"]
    docs = []
    for d in range(30):
        lines = []
        for _ in range(rng.randrange(1, 6)):
            n = rng.randrange(0, 9)
            line = " ".join(rng.choice(words) for _ in range(n))
            if rng.random() < 0.6:
                line += rng.choice([".", "!", "?", '"'])
            lines.append(line)
        docs.append((d, "\n".join(lines)))

    def py_classify(docs, min_words=5):
        out = {}
        pre = []
        for d, text in docs:
            for idx, line in enumerate(text.split("\n")):
                low = line.lower()
                if any(b in low for b in C4_BANNED):
                    out[(d, idx)] = "banned"
                elif len([w for w in line.split() if w]) < min_words:
                    out[(d, idx)] = "short"
                elif not line.rstrip().endswith((".", "!", "?", '"')):
                    out[(d, idx)] = "no_punct"
                else:
                    pre.append((d, idx, line))
        seen = {}
        for d, idx, line in sorted(pre):
            if line in seen:
                out[(d, idx)] = "dup"
            else:
                seen[line] = (d, idx)
                out[(d, idx)] = "kept"
        return out

    want = py_classify(docs)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["line_idx"]): r["status"]
        for r in c4_line_classify(df, "text", "doc_id", min_words=5).collect()
    }
    assert got == want


def test_benford_report_exact_counts(spark):
    from radient_spark.operators.quality import BENFORD_PPM, benford_report

    # 1000 rows, first digits forced: 600 ones, 300 twos, 100 nines;
    # sub-1 values are excluded by contract.
    vals = [1.5] * 600 + [25.0] * 300 + [900.25] * 100 + [0.4] * 7
    df = spark.createDataFrame([(v,) for v in vals], "amount double")
    rows = {r["digit"]: r for r in benford_report(df, "amount").collect()}
    assert set(rows) == {1, 2, 9}
    assert rows[1]["n"] == 600 and rows[1]["observed_ppm"] == 600000
    assert rows[2]["observed_ppm"] == 300000
    assert rows[9]["observed_ppm"] == 100000
    assert rows[1]["expected_ppm"] == BENFORD_PPM[0]
    assert rows[9]["abs_err_ppm"] == abs(100000 - BENFORD_PPM[8])


def test_benford_ppm_constants_are_log10_lattice():
    import math

    from radient_spark.operators.quality import BENFORD_PPM

    assert len(BENFORD_PPM) == 9 and sum(BENFORD_PPM) == 1000000
    for d, p in enumerate(BENFORD_PPM, start=1):
        assert p == round(math.log10(1 + 1 / d) * 1e6)
