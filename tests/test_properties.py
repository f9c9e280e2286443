"""Hypothesis property tests for the pure (no-Spark) kernels: the
numpy halves of the vector-search and media operators. These run per
example in microseconds, so hypothesis can sweep the input space the
example-based suites can't."""

from __future__ import annotations

import base64

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from radient_spark.functions import media as M
from radient_spark.operators.topk import _topk_flat_candidates

COMMON = dict(deadline=None, derandomize=True, max_examples=40)


@settings(**COMMON)
@given(
    S=hnp.arrays(
        np.float64,
        st.tuples(st.integers(1, 30), st.integers(1, 8)),
        elements=st.floats(-1, 1, allow_nan=False).map(lambda x: round(x, 2)),
    ),
    k=st.integers(1, 12),
)
def test_topk_flat_candidates_matches_bruteforce(S, k):
    # per-query-column top-k with (score desc, id asc) tie ordering must
    # equal the brute-force lexsort — ESPECIALLY under heavy ties (the
    # 2-decimal rounding above forces them)
    n, nq = S.shape
    ids = np.arange(100, 100 + n)  # distinct, non-contiguous with rows
    kk = min(k, n)
    ii, jj, sc = _topk_flat_candidates(S, ids, kk)
    got = {}
    for r, c, s in zip(ii, jj, sc):
        got.setdefault(c, []).append((ids[r], s))
    for q in range(nq):
        order = np.lexsort((ids, -S[:, q]))
        expect = [(ids[i], S[i, q]) for i in order[:kk]]
        assert sorted(got.get(q, [])) == sorted(expect), (q, got.get(q), expect)


@settings(**COMMON)
@given(
    n=st.integers(1, 5 * 16_000),
    clip=st.integers(1, 4),
)
def test_split_clips_reconstructs_waveform(n, clip):
    wave = np.arange(n, dtype=np.float64)[None, :]
    clips = M.split_clips(wave, sample_rate=16_000, clip_duration=clip)
    assert np.array_equal(np.concatenate(clips, axis=1), wave)
    assert all(c.shape[1] <= 16_000 * clip for c in clips)


@settings(**COMMON)
@given(
    n=st.integers(400, 40_000),
    freq=st.floats(50, 4000, allow_nan=False),
)
def test_melspec_shape_invariant(n, freq):
    t = np.arange(n) / 16_000
    wave = np.sin(2 * np.pi * freq * t)
    mel = M.clip_to_melspec(wave)
    assert mel.shape == (M.NUM_MEL_BINS, M.TARGET_LENGTH)
    assert np.isfinite(mel).all()


@settings(**COMMON)
@given(
    h=st.integers(8, 300),
    w=st.integers(8, 300),
    v=st.integers(0, 255),
)
def test_image_tensor_shape_and_range(h, w, v):
    img = np.full((h, w, 3), v, dtype=np.uint8)
    t = M.image_to_clip_tensor(img)
    assert t.shape == (3, M.IMAGE_SIZE, M.IMAGE_SIZE)
    assert np.isfinite(t).all()
    # constant image -> (almost) constant channels regardless of geometry
    for c in range(3):
        assert float(t[c].std()) < 1e-4


@settings(**COMMON)
@given(payload=st.binary(min_size=1, max_size=200))
def test_sniff_base64_roundtrip(payload):
    kind, decoded = M.sniff_image_source(base64.b64encode(payload).decode())
    assert kind == "base64" and decoded == payload


@settings(**COMMON)
@given(
    n_in=st.integers(100, 8000),
    sr_pair=st.sampled_from([(8_000, 16_000), (16_000, 8_000), (22_050, 16_000), (16_000, 16_000)]),
)
def test_resample_length_contract(n_in, sr_pair):
    orig, target = sr_pair
    wave = np.random.RandomState(0).randn(1, n_in)
    out = M.resample_waveform(wave, orig, target)
    assert out.shape[0] == 1
    assert abs(out.shape[1] - round(n_in * target / orig)) <= 1
    assert np.isfinite(out).all()


def _py_hll_registers(keys: list[str], p: int) -> dict[int, int]:
    """Pure-Python reference of the portable HLL register math."""
    import hashlib

    m = 1 << p
    regs: dict[int, int] = {}
    for key in keys:
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        idx = h % m
        w = h >> p
        rho = (61 - p) if w == 0 else (61 - p) - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


@given(
    st.lists(st.text(alphabet="abcdefg0123456789", min_size=1, max_size=12),
             min_size=1, max_size=60),
    st.sampled_from([6, 8, 10]),
)
@settings(max_examples=20, deadline=None)
def test_hll_registers_match_python_reference(spark, keys, p):
    from pyspark.sql import functions as F
    from radient_spark.operators.sketch import hll_registers

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["idx"]: r["rho_max"]
        for r in hll_registers(df, F.col("k"), p).collect()
    }
    assert got == _py_hll_registers(keys, p)


@given(
    st.lists(st.sampled_from(["a", "b", "c", "dd", "ee"]),
             min_size=1, max_size=80),
)
@settings(max_examples=15, deadline=None)
def test_cms_estimate_upper_bounds_truth(spark, toks):
    from collections import Counter
    from radient_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([(t,) for t in toks], ["tok"])
    sk = cms_build(df, "tok", depth=3, width=32)
    cand = spark.createDataFrame(
        [(t,) for t in set(toks)], ["tok"]
    )
    est = {
        r["tok"]: r["est"]
        for r in cms_estimate(sk, cand, "tok", 3, 32).collect()
    }
    truth = Counter(toks)
    for t, c in truth.items():
        assert est[t] >= c


@settings(**COMMON)
@given(
    X=hnp.arrays(
        np.float64,
        st.tuples(st.integers(1, 16), st.integers(1, 8)),
        elements=st.floats(-3.9, 3.9, allow_nan=False, allow_subnormal=False),
    )
)
def test_micro_np_half_away_from_zero(X):
    """ann._micro_np is the numpy twin of cluster.micro_vec: integer
    output, positivity shift applied, and HALF-AWAY-FROM-ZERO on exact
    .5 boundaries (np.round would give half-to-even and silently break
    every lattice oracle)."""
    from radient_spark.ann import _micro_np
    from radient_spark.operators.cluster import MICRO, MICRO_SHIFT

    out = _micro_np(X)
    assert out.shape == X.shape
    assert np.all(out == np.floor(out))  # integral
    # reference: decimal-free half-away-from-zero per element
    S = X * MICRO
    ref = np.sign(S) * np.floor(np.abs(S) + 0.5) + MICRO_SHIFT
    assert np.array_equal(out, ref)


def test_micro_np_exact_half_boundaries():
    """Pin the .5 cases explicitly: 1.5e-6 * 1e6 = 1.5 -> 2 (away from
    zero), -1.5e-6 -> -2; np.round would give 2 and -2 here but 0.5 -> 0
    — prove we differ from np.round where it matters."""
    from radient_spark.ann import _micro_np
    from radient_spark.operators.cluster import MICRO_SHIFT

    # 0.5 exactly representable: 0.5 / 1e6 is not exact, so build the
    # boundary in micro space via exactly-representable halves
    vals = np.array([0.5, -0.5, 1.5, -1.5, 2.5, -2.5]) / 1e6
    # feed micro-space halves directly through the rounding law
    S = vals * 1e6
    got = _micro_np(vals) - MICRO_SHIFT
    # away-from-zero: 0.5->1, -0.5->-1, 1.5->2, 2.5->3 ...
    away = np.sign(S) * np.floor(np.abs(S) + 0.5)
    assert np.array_equal(got, away)
    # and np.round (half-to-even) DISAGREES on at least one of these,
    # proving the custom law is load-bearing
    assert not np.array_equal(away, np.round(S))


def test_nearest_cells_stable_tie_order():
    """Equidistant centroids must rank by cell id ascending — the (d, c)
    order every lattice SQL oracle uses."""
    from radient_spark.ann import _nearest_cells

    q = np.array([[0.0, 0.0]])
    C = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    cells = _nearest_cells(q, C, 4)[0]
    assert list(cells) == [0, 1, 2, 3]
