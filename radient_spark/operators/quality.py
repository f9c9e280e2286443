"""Gopher-style rule-based quality filtering (Rae et al. 2021, App. A).

The reference's quality surface is the model-side vectorizers; a
large-scale training-data pipeline also needs the classic *rule* filters
that run before any model: word-count bands, mean word length,
symbol-to-word ratio, alphabetic-word fraction, stopword presence, and
the repetition rules (top-bigram mass). All thresholds are the published
Gopher values.

Spark-first shape: every per-document metric except the repetition rule
is a pure Catalyst expression (zero shuffle, whole-stage codegen). The
repetition rule needs per-doc mode-of-bigrams, which is one explode +
one (doc_id, gram) groupBy + one doc_id join — linear in corpus tokens,
the same shuffle shape as the dedup family. No Python in any hot path.

Float safety for the oracle: ratio *comparisons* (x <= 0.1) are
per-row IEEE ops on identically-derived doubles, so Spark and DuckDB
agree bit-for-bit; aggregated outputs are all BIGINT counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from radient_spark.functions.text import tokens

# Gopher's required-stopword list (App. A): a doc must contain >= 2.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Published thresholds.
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_LEN, MAX_MEAN_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_WORD_FRAC = 0.80
MIN_STOPWORDS = 2
MAX_TOP_BIGRAM_FRAC = 0.20


def _doc_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Catalyst metrics (everything but the repetition rule).

    Stages the token array behind a single projection so downstream
    lambda consumers don't re-split the text (the CollapseProject trap
    documented in functions/stage.py).
    """
    t = docs.withColumn("_toks", tokens(F.lower(F.col(text_col))))
    tk = F.col("_toks")
    n = F.size(tk)
    char_sum = F.aggregate(tk, F.lit(0), lambda a, x: a + F.length(x))
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    alpha_words = F.size(F.filter(tk, lambda x: x.rlike("[a-z]")))
    # '#' and ellipsis occurrences, counted on the raw text.
    n_symbols = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"#", ""))
        + F.size(F.split(F.col(text_col), r"\.\.\.|…")) - F.lit(1)
    )
    return t.select(
        "doc_id",
        "source",
        n.alias("n_words"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(char_sum.cast("double") / n.cast("double"))
        .alias("mean_word_len"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(n_symbols.cast("double") / n.cast("double"))
        .alias("symbol_ratio"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(alpha_words.cast("double") / n.cast("double"))
        .alias("alpha_word_frac"),
        F.size(F.array_intersect(F.array_distinct(tk), sw)).alias("n_stop"),
        tk.alias("_toks"),
    )


def _bigram_stats(metrics: DataFrame) -> DataFrame:
    """Per-doc top-bigram mass: max bigram count / total bigrams.

    One explode (Generate barrier — tokens evaluated once), one
    (doc_id, gram) partial-agg groupBy, one doc_id rollup. Docs with
    < 2 tokens produce no bigrams and default to fraction 0 downstream.
    """
    tk = F.col("_toks")
    n = F.size(tk)
    bigrams = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(1)),
            lambda i: F.concat_ws(" ", F.element_at(tk, i), F.element_at(tk, i + 1)),
        )
    )
    return (
        metrics.select("doc_id", F.explode(bigrams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("total_c"))
    )


def gopher_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document rule booleans + metrics. Columns r_* are 1/0 ints."""
    m = _doc_metrics(docs, text_col)
    bg = _bigram_stats(m)
    j = m.drop("_toks").join(bg, "doc_id", "left")
    top_frac = F.when(
        F.col("total_c").isNull() | (F.col("total_c") == 0), F.lit(0.0)
    ).otherwise(F.col("top_c").cast("double") / F.col("total_c").cast("double"))

    def b(c: Column) -> Column:
        return c.cast("int")

    return j.select(
        "doc_id",
        "source",
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        b(F.col("n_words").between(MIN_WORDS, MAX_WORDS)).alias("r_words"),
        b(F.col("mean_word_len").between(MIN_MEAN_LEN, MAX_MEAN_LEN)).alias(
            "r_mean_len"
        ),
        b(F.col("symbol_ratio") <= MAX_SYMBOL_RATIO).alias("r_symbol"),
        b(F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC).alias("r_alpha"),
        b(F.col("n_stop") >= MIN_STOPWORDS).alias("r_stop"),
        b(top_frac <= MAX_TOP_BIGRAM_FRAC).alias("r_repetition"),
    )


def gopher_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source audit: docs, per-rule fail counts, overall pass count.

    The report shape ops teams actually dashboard; all counts BIGINT so
    the DuckDB oracle hashes identically (VERDICT r2's HUGEINT lesson:
    Spark SUM(int)->BIGINT, DuckDB SUM->HUGEINT, so the oracle casts).
    """
    r = gopher_rules(docs, text_col)
    rules = [c for c in r.columns if c.startswith("r_")]
    passed = None
    for c in rules:
        passed = F.col(c) if passed is None else (passed & (F.col(c) == 1))
    agg = [F.count(F.lit(1)).alias("n_docs")]
    agg += [F.sum(F.lit(1) - F.col(c)).alias(f"fail_{c[2:]}") for c in rules]
    agg.append(
        F.sum(
            F.when(
                (F.col("r_words") == 1)
                & (F.col("r_mean_len") == 1)
                & (F.col("r_symbol") == 1)
                & (F.col("r_alpha") == 1)
                & (F.col("r_stop") == 1)
                & (F.col("r_repetition") == 1),
                1,
            ).otherwise(0)
        ).alias("n_pass")
    )
    return r.groupBy("source").agg(*agg)


def luhn_valid(num: Column) -> Column:
    """TRUE iff a digits-only string passes the Luhn checksum (ISO/IEC
    7812) — the payment-card validity test that separates real PANs
    from arbitrary digit runs in PII audits.  Pure Catalyst: one
    aggregate fold over the reversed digit positions (doubling every
    second digit, subtracting 9 on overflow); identical arithmetic is
    expressible in ANSI SQL, so audits are oracle-checkable."""
    rev = F.reverse(num)
    d = lambda i: F.substr(rev, i, F.lit(1)).cast("int")  # noqa: E731
    total = F.aggregate(
        F.sequence(F.lit(1), F.length(rev)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            i % 2 == 0,
            F.when(d(i) * 2 > 9, d(i) * 2 - 9).otherwise(d(i) * 2),
        ).otherwise(d(i)),
    )
    # guard: sequence(1, 0) would generate DESCENDING [1, 0]
    return F.when(F.length(num) == 0, F.lit(False)).otherwise(total % 10 == 0)


def card_number_audit(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Payment-card PII audit: extract maximal digit runs, keep the
    13-19-digit candidates (PAN lengths), Luhn-validate each, and
    report per group — the detector a takedown/scrub pipeline runs
    BEFORE masking.  Maximal-run extraction (\\d+ then length filter)
    instead of lookarounds keeps the regex RE2-compatible (DuckDB).

    Zero shuffles beyond the group aggregate; per-row work is one
    regex scan + a fold per candidate."""
    runs = F.filter(
        F.regexp_extract_all(F.col(text_col), F.lit(r"\d+"), 0),
        lambda s: (F.length(s) >= 13) & (F.length(s) <= 19),
    )
    per_doc = df.select(
        F.col(group_col),
        F.size(runs).alias("__n_runs"),
        F.size(F.filter(runs, luhn_valid)).alias("__n_valid"),
    )
    return per_doc.groupBy(group_col).agg(
        F.sum("__n_runs").cast("long").alias("n_card_candidates"),
        F.sum("__n_valid").cast("long").alias("n_luhn_valid"),
        F.sum((F.col("__n_valid") > 0).cast("long")).alias(
            "n_docs_with_valid"
        ),
    )


C4_BANNED = ("cookie", "javascript", "lorem ipsum", "terms of use")
C4_TERMINAL = (".", "!", "?", '"')


def c4_line_classify(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    banned: tuple = C4_BANNED,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): split
    documents on newlines and classify every line —

      banned   : contains a blocklisted phrase (policy/boilerplate)
      short    : fewer than `min_words` words
      no_punct : does not end in terminal punctuation
      dup      : an earlier surviving line (corpus-WIDE, C4's rule)
                 with identical text exists — first occurrence by
                 (doc, line index) wins
      kept     : survives all four

    Precedence is the listed order; only lines passing the three
    per-line rules compete in dedup.  Scale shape: the per-line rules
    are stateless row expressions; dedup shuffles (line md5, 16 bytes)
    once with a min-position window — corpus-wide line dedup without
    materializing line text twice.

    Returns (id_col, line_idx, line, status)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "line_idx", "line"
        ),
    )
    low = F.lower(F.col("line"))
    is_banned = F.lit(False)
    for b in banned:
        is_banned = is_banned | low.contains(b)
    stripped = F.rtrim(F.col("line"))
    ends_ok = F.lit(False)
    for t in C4_TERMINAL:
        ends_ok = ends_ok | stripped.endswith(t)
    n_words = F.size(tokens(F.col("line")))
    pre = lines.withColumn(
        "__pre",
        F.when(is_banned, F.lit("banned"))
        .when(n_words < min_words, F.lit("short"))
        .when(~ends_ok, F.lit("no_punct")),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("line")).orderBy(
        F.col(id_col).asc(), F.col("line_idx").asc()
    )
    survivors = (
        pre.filter(F.col("__pre").isNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "status",
            F.when(F.col("__rn") == 1, F.lit("kept")).otherwise(F.lit("dup")),
        )
        .drop("__rn")
    )
    failed = pre.filter(F.col("__pre").isNotNull()).withColumn(
        "status", F.col("__pre")
    )
    return survivors.unionByName(failed).select(
        id_col, "line_idx", "line", "status"
    )


# log10(1 + 1/d) in parts-per-million, d = 1..9 — Benford's law first-
# digit frequencies as exact integer literals (computed once here, the
# same constants appear in the registry oracle SQL, so no engine ever
# evaluates a logarithm at query time).
BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


def benford_report(
    df: DataFrame, amount_col: str, digit_col: str = "digit"
) -> DataFrame:
    """First-digit (Benford's law) audit of a positive numeric column —
    the standard screen for fabricated or truncated monetary data in a
    freshly ingested table.

    Determinism contract: the leading digit comes from FLOOR → BIGINT →
    string (floor is identical in Spark and DuckDB, unlike double→int
    casts which truncate in Spark but round-half-even in DuckDB), and
    all ratios are nonnegative integer floor divisions in ppm, so every
    output cell is exact integer arithmetic. Expected frequencies are
    the precomputed BENFORD_PPM literals.

    Scale shape: one scan → 9-group aggregate; the 1-row total joins
    back by broadcast cross join. Returns
    (digit, n, observed_ppm, expected_ppm, abs_err_ppm).
    """
    expected = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_PPM]), F.col(digit_col)
    )
    digits = (
        df.filter(F.col(amount_col) >= 1)
        .select(
            F.substring(
                F.floor(F.col(amount_col)).cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias(digit_col)
        )
        .groupBy(digit_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = digits.agg(F.sum("n").alias("__total"))
    return (
        digits.crossJoin(F.broadcast(total))
        .select(
            digit_col,
            "n",
            F.expr("(n * 1000000L) div __total").alias("observed_ppm"),
            expected.cast("long").alias("expected_ppm"),
            F.abs(
                F.expr("(n * 1000000L) div __total") - expected
            ).cast("long").alias("abs_err_ppm"),
        )
    )
