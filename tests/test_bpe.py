"""BPE merge learning vs a pure-Python reference implementation."""

from __future__ import annotations

import collections


def _ref_bpe(texts: list[str], rounds: int):
    """Reference BPE trainer: word-freq dict, freq-weighted pair
    counts, (count DESC, left ASC, right ASC) tie-break, greedy
    leftmost-nonoverlapping merge."""
    words = collections.Counter(w for t in texts for w in t.split())
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in words.items()}
    merges = []
    for rnd in range(1, rounds + 1):
        pc: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (left, right), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((rnd, left, right, cnt))
        nxt: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        vocab = nxt
    return merges


def test_bpe_learn_matches_reference(spark):
    from radient_spark.operators.bpe import bpe_learn

    texts = [
        "the fast fastest faster the the fast",
        "slow slower slowest the fast fast",
        "aaa aa aaaa the",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [
        (r["round"], r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_learn(df, rounds=5).orderBy("round").collect()
    ]
    assert got == _ref_bpe(texts, 5)


def test_bpe_apply_greedy_leftmost(spark):
    """Repeated-pair merges are leftmost-nonoverlapping: 'aaa' under
    merge (a,a) -> [aa, a], and chained merges compose in order."""
    from radient_spark.operators.bpe import bpe_apply

    df = spark.createDataFrame([("aaa aaaa st st",)], ["text"])
    out = bpe_apply(df, [("a", "a"), ("s", "t"), ("st", "</w>")]).collect()[0]
    assert out.bpe_tokens == [
        "aa", "a", "</w>",
        "aa", "aa", "</w>",
        "st</w>",
        "st</w>",
    ]


def test_bpe_learn_empty_corpus(spark):
    from radient_spark.operators.bpe import bpe_learn

    df = spark.createDataFrame([("",), ("   ",)], ["text"])
    assert bpe_learn(df, rounds=3).count() == 0


def test_bpe_learn_matches_reference_random_corpora(spark):
    """Randomized sweep: small corpora from a 3-letter alphabet maximize
    merge-tie and overlapping-pair edge cases (aaa..., ababab...); the
    distributed trainer must match the reference on every draw."""
    import random

    random.seed(1234)
    for trial in range(6):
        words = [
            "".join(random.choice("aab") for _ in range(random.randint(1, 6)))
            for _ in range(random.randint(3, 12))
        ]
        texts = [
            " ".join(random.choice(words) for _ in range(random.randint(1, 8)))
            for _ in range(3)
        ]
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        got = [
            (r["round"], r.left_sym, r.right_sym, r.pair_count)
            for r in bpe_learn_for_test(df).orderBy("round").collect()
        ]
        assert got == _ref_bpe(texts, 4), (trial, texts)


def bpe_learn_for_test(df):
    from radient_spark.operators.bpe import bpe_learn

    return bpe_learn(df, rounds=4)
