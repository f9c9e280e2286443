"""Vectorizers: the engine's embedding-operator family (SURVEY.md §2.3).

Reference surface being re-expressed:
- Vectorizer contract `_preprocess -> _vectorize -> _postprocess(normalize)`
  per item (/root/reference/radient/tasks/vectorizers/_base.py:75-103)
  becomes a DataFrame transform `df -> df.withColumn(out, <expr|udf>)`,
  with normalization as a Catalyst expression.
- text/sklearn CountVectorizer (vectorizers/text/sklearn.py:17-29):
  hashing/count vectorizers below, pure Catalyst (no UDF) or MLlib.
- molecule/rdkit fingerprints (vectorizers/molecule/rdkit.py:17-39):
  deterministic md5-bit fingerprint; rdkit used when importable.
- graph/fastrp (vectorizers/graph/fastrp.py:17-53): distributed FastRP as
  iterative edge-join matmul (A^k L R with weights), R broadcast.
- text/sbert, image/timm, audio/* (model-backed): iterator pandas_udf
  with a per-executor-process model singleton, gated behind import-try —
  the heavyweight models are not present in CI, exactly the architecture
  risk SURVEY §7 calls out, so the deterministic stand-ins are
  first-class `method` keys in the same factory.

Every vectorizer returns float arrays in the canonical `vector` column
convention (SURVEY §1.3) and composes with functions/vector.py
(normalize, distances) and operators/topk.py (search).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from radient_spark.functions import text as X
from radient_spark.functions import vector as V
from radient_spark.operators.dedup import str_hash


def hashing_vectorizer(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "vector",
    dim: int = 64,
    binary: bool = False,
    normalize: bool = False,
) -> DataFrame:
    """Hashing count-vectorizer: token t increments slot h(t) mod dim.

    Pure Catalyst (portable md5 hash + one fold over tokens): no UDF, no
    shuffle, whole-stage codegen. ≡ sklearn HashingVectorizer semantics
    (reference imports it at vectorizers/text/sklearn.py:12-14).
    """
    staged = df.withColumn(
        "__hv_slots",
        F.transform(X.tokens(F.col(text_col)), lambda t: str_hash(t) % dim),
    )
    counts = F.aggregate(
        F.col("__hv_slots"),
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, s: F.transform(
            acc,
            lambda v, i: F.when(i == s.cast("int"), v + 1.0).otherwise(v),
        ),
    )
    if binary:
        counts = F.transform(counts, lambda v: F.least(v, F.lit(1.0)))
    vec = F.transform(counts, lambda v: v.cast("float"))
    out = staged.withColumn(out_col, vec).drop("__hv_slots")
    if normalize:
        out = out.withColumn(out_col, V.l2_normalize(F.col(out_col)))
    return out


def fingerprint_vectorizer(
    df: DataFrame,
    input_col: str = "smiles",
    out_col: str = "fingerprint",
    dim: int = 256,
    n_hashes: int = 2,
    radius: int = 3,
) -> DataFrame:
    """Molecule/string fingerprint as ARRAY<BOOLEAN> (≡ the reference's
    topological/Morgan fingerprints, vectorizers/molecule/rdkit.py:17-39).

    Uses RDKit per-executor when importable (real Morgan fingerprints);
    otherwise a deterministic substructure stand-in: every character
    k-gram (k<=radius) sets n_hashes bits — same shape, same Jaccard
    search downstream (drug_discovery.md:42-48), model-free in CI.
    """
    try:  # pragma: no cover - rdkit not in the CI image
        import rdkit  # noqa: F401

        have_rdkit = True
    except ImportError:
        have_rdkit = False

    if have_rdkit:  # pragma: no cover
        import pandas as pd

        @F.pandas_udf(f"array<boolean>")
        def rdkit_fp(s: pd.Series) -> pd.Series:
            from rdkit import Chem
            from rdkit.Chem import AllChem

            def fp(smiles):
                mol = Chem.MolFromSmiles(smiles)
                if mol is None:
                    return [False] * dim
                bv = AllChem.GetMorganFingerprintAsBitVect(mol, radius, nBits=dim)
                return [bool(b) for b in bv]

            return s.map(fp)

        return df.withColumn(out_col, rdkit_fp(F.col(input_col)))

    grams = F.flatten(
        F.array(
            *[
                X.char_ngrams(F.col(input_col), n=k)
                for k in range(1, radius + 1)
            ]
        )
    )
    staged = df.withColumn("__fp_grams", grams)
    bits = F.aggregate(
        F.transform(
            F.col("__fp_grams"),
            lambda g: F.array(
                *[(str_hash(F.concat(F.lit(str(i) + "#"), g)) % dim) for i in range(n_hashes)]
            ),
        ),
        F.array_repeat(F.lit(False), dim),
        lambda acc, hs: F.transform(
            acc, lambda v, i: v | F.array_contains(hs, i.cast("bigint"))
        ),
    )
    return staged.withColumn(out_col, bits).drop("__fp_grams")


def fastrp_embeddings(
    edges: DataFrame,
    dim: int = 64,
    weights: tuple[float, ...] = (0.1, 0.2, 1.0, 3.0),
    beta: float = 0.0,
    seed: int = 42,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    cast_float: bool = True,
) -> DataFrame:
    """FastRP node embeddings, distributed (≡ vectorizers/graph/fastrp.py:
    17-53: sparse random projection R, degree normalization
    L = 0.5 * deg^beta / n, weighted sum over powers sum_k w_k A^k L R).

    Spark shape: R is generated per-node from a seeded hash (no driver
    materialization — works for billions of nodes); each A @ X step is one
    join on the edge list + groupBy-sum on the destination, i.e. exactly
    one shuffle per power. Skewed hubs are AQE's skew-join case.

    Returns (node BIGINT, vector ARRAY<FLOAT>).
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        (F.col(weight_col) if weight_col else F.lit(1.0)).alias("w"),
    )
    # undirected degree; nodes table from edge endpoints
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = (
        e.select(F.col("src").alias("node"), "w")
        .union(e.select(F.col("dst").alias("node"), "w"))
        .groupBy("node")
        .agg(F.sum("w").alias("deg"))
    )
    n_nodes = nodes.count()

    # Seeded sparse random projection row per node: R[node][j] in
    # {+s, 0, -s} with p = {1/6, 2/3, 1/6}, s = sqrt(3) (Achlioptas 2003),
    # derived from a portable hash of (seed, node, j).
    s = 3.0**0.5

    def proj_entry(j: int):
        h = str_hash(F.concat_ws("_", F.lit(seed), F.col("node"), F.lit(j))) % 6
        return (
            F.when(h == 0, F.lit(s)).when(h == 1, F.lit(-s)).otherwise(F.lit(0.0))
        )

    r = nodes.withColumn("vec", F.array(*[proj_entry(j) for j in range(dim)]))
    # L scaling: 0.5 * deg^beta / n  (fastrp.py:41-43)
    l_scaled = (
        r.join(deg, "node", "left")
        .withColumn(
            "vec",
            F.transform(
                "vec",
                lambda v: v
                * F.lit(0.5)
                * F.pow(F.coalesce(F.col("deg"), F.lit(0.0)), F.lit(beta))
                / F.lit(float(n_nodes)),
            ),
        )
        .select("node", "vec")
    )

    # propagate: X_{k} = A @ X_{k-1}; accumulate sum_k w_k X_k
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    x = l_scaled
    acc = None
    for w_k in weights:
        msgs = (
            sym.join(x.withColumnRenamed("node", "dst"), "dst")
            .select(
                F.col("src").alias("node"),
                F.transform("vec", lambda v: v * F.col("w")).alias("vec"),
            )
        )
        # Elementwise sum of neighbor vectors: collect_list + one fold.
        # Single shuffle per power; hub nodes bound memory at deg*dim —
        # acceptable for embedding dims; posexplode+two-shuffle variant is
        # the fallback for extreme skew.
        x = msgs.groupBy("node").agg(F.collect_list("vec").alias("vs"))
        # Order-independent elementwise sum: each neighbor contribution
        # casts to a fixed-scale DECIMAL before accumulation, so the sum
        # is EXACT (bit-identical in any partition order and in the SQL
        # oracle) and only then returns to double. A double fold's
        # ~1e-15 order jitter is invisible at sf0.01 but at larger
        # degree it lands values on the 6-decimal rounding grid — the
        # scale-dependent hash-drift class the sf0.1 sweep caught.
        dec = "decimal(30,15)"
        x = x.withColumn(
            "vec",
            F.aggregate(
                "vs",
                F.array_repeat(F.lit(0).cast(dec), dim),
                lambda a, b: F.zip_with(
                    a, b, lambda p, q: (p + q.cast(dec)).cast(dec)
                ),
                lambda a: F.transform(a, lambda v: v.cast("double")),
            ),
        ).select("node", "vec")
        term = x.withColumn(
            "vec", F.transform("vec", lambda v: v * F.lit(float(w_k)))
        )
        if acc is None:
            acc = term
        else:
            acc = (
                acc.withColumnRenamed("vec", "va")
                .join(term.withColumnRenamed("vec", "vb"), "node", "full")
                .select(
                    "node",
                    F.zip_with(
                        F.coalesce(F.col("va"), F.array_repeat(F.lit(0.0), dim)),
                        F.coalesce(F.col("vb"), F.array_repeat(F.lit(0.0), dim)),
                        lambda p, q: p + q,
                    ).alias("vec"),
                )
            )
    if cast_float:
        acc = acc.withColumn("vec", F.transform("vec", lambda v: v.cast("float")))
    return acc.withColumnRenamed("vec", "vector")


def sbert_vectorizer(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "vector",
    model_name: str = "BAAI/bge-small-en-v1.5",
    normalize: bool = True,
) -> DataFrame:
    """Model-backed text embedding (≡ vectorizers/text/sbert.py:20-67).

    Iterator pandas_udf: the sentence-transformers model is loaded ONCE
    per Python worker process (the reference reloads per Vectorizer
    instance) and fed Arrow batches. Raises ImportError at plan build if
    sentence-transformers is unavailable — callers in CI use
    hashing_vectorizer as the deterministic stand-in (same column
    contract).
    """
    import importlib.util

    if importlib.util.find_spec("sentence_transformers") is None:
        raise ImportError(
            "sentence-transformers not installed; use hashing_vectorizer as "
            "the deterministic stand-in (same output contract)"
        )
    import pandas as pd  # pragma: no cover — model path exercised off-CI

    @F.pandas_udf("array<float>")
    def embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:  # pragma: no cover
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(model_name)
        for s in it:
            vecs = model.encode(
                s.fillna("").tolist(), normalize_embeddings=normalize
            )
            yield pd.Series([v.tolist() for v in vecs])

    return df.withColumn(out_col, embed(F.col(text_col)))


def model_vectorizer(
    df: DataFrame,
    input_col: str,
    out_col: str,
    model_factory,
    required_module: str,
    batch_encode,
    return_type: str = "array<float>",
) -> DataFrame:
    """Generic model-backed vectorizer: iterator pandas_udf with a
    per-Python-worker model singleton (the pattern shared by the
    reference's sbert/timm/torchaudio/imagebind vectorizers, each of
    which reloads per instance — see SURVEY.md §2.3).

    model_factory() -> model (called once per worker);
    batch_encode(model, values: list) -> list matching `return_type`
    (one vector per input, or one LIST of vectors per input for
    per-frame outputs with return_type="array<array<float>>").
    """
    import importlib.util

    if importlib.util.find_spec(required_module) is None:
        raise ImportError(
            f"{required_module} is not installed; use a deterministic "
            "stand-in vectorizer (same column contract) in CI"
        )
    import pandas as pd  # pragma: no cover — model path exercised off-CI

    @F.pandas_udf(return_type)
    def embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:  # pragma: no cover
        model = model_factory()
        for s in it:
            yield pd.Series(batch_encode(model, s.tolist()))

    return df.withColumn(out_col, embed(F.col(input_col)))


def timm_image_vectorizer(
    df: DataFrame,
    image_col: str = "payload",
    out_col: str = "vector",
    model_name: str = "resnet50",
) -> DataFrame:  # pragma: no cover - timm not in CI
    """≡ vectorizers/image/timm.py:23-58 (classifier head reset, feature
    output). Input column holds encoded image bytes."""

    def factory():
        import timm

        return timm.create_model(model_name, pretrained=True, num_classes=0).eval()

    def encode(model, blobs):
        import io

        import torch
        from PIL import Image
        import timm

        cfg = timm.data.resolve_data_config({}, model=model)
        tf = timm.data.create_transform(**cfg)
        with torch.inference_mode():
            batch = torch.stack(
                [tf(Image.open(io.BytesIO(b)).convert("RGB")) for b in blobs]
            )
            return model(batch).numpy().tolist()

    return model_vectorizer(df, image_col, out_col, factory, "timm", encode)


def frames_to_rows(
    df: DataFrame, frames_col: str, out_col: str = "vector"
) -> DataFrame:
    """Fan a per-clip `array<array<float>>` feature column out to one row
    PER FRAME via posexplode — the DataFrame form of the reference's
    list-of-Vectors return (torchaudio.py:40-47, reduce_method != avg_pool
    yields one vector per frame). Output keeps every input column plus
    (frame_index, out_col)."""
    keep = [c for c in df.columns if c != frames_col]
    return df.select(
        *keep, F.posexplode(frames_col).alias("frame_index", out_col)
    )


# the torchaudio pipeline-bundle surface the reference documents
# (docs/supported_methods.md:9-21) — validated EAGERLY so a typo fails
# at plan-build time, not inside an executor after model download
TORCHAUDIO_PIPELINES = frozenset(
    {
        "WAV2VEC2_BASE",
        "WAV2VEC2_LARGE",
        "WAV2VEC2_LARGE_LV60K",
        "WAV2VEC2_XLSR53",
        "WAV2VEC2_XLSR_300M",
        "WAV2VEC2_XLSR_1B",
        "WAV2VEC2_XLSR_2B",
        "HUBERT_BASE",
        "HUBERT_LARGE",
        "HUBERT_XLARGE",
        "WAVLM_BASE",
        "WAVLM_BASE_PLUS",
        "WAVLM_LARGE",
    }
)


def torchaudio_audio_vectorizer(
    df: DataFrame,
    waveform_col: str = "waveform",
    out_col: str = "vector",
    reduce_method: str | None = "avg_pool",
    model_name: str = "HUBERT_BASE",
) -> DataFrame:  # pragma: no cover - torchaudio not in CI
    """≡ vectorizers/audio/torchaudio.py:16-67 (pipeline-bundle features;
    HUBERT_BASE default like the reference). `model_name` accepts every
    bundle the reference documents (docs/supported_methods.md:9-21:
    WAV2VEC2_* / HUBERT_* / WAVLM_*), validated before any gating.
    reduce_method="avg_pool" (the reference default) mean-pools to ONE
    vector per clip; reduce_method=None reproduces the per-frame branch
    (torchaudio.py:46-47) — one row per feature frame with a
    `frame_index` column, via frames_to_rows."""
    if reduce_method not in ("avg_pool", None):
        raise ValueError(
            f"reduce_method must be 'avg_pool' or None, got {reduce_method!r}"
        )
    if model_name not in TORCHAUDIO_PIPELINES:
        raise ValueError(
            f"unknown torchaudio pipeline {model_name!r}; expected one of "
            f"{sorted(TORCHAUDIO_PIPELINES)}"
        )

    def factory():
        import torchaudio

        return getattr(torchaudio.pipelines, model_name).get_model().eval()

    def encode(model, waves):
        import torch

        with torch.inference_mode():
            out = []
            for w in waves:
                feats, _ = model.extract_features(torch.tensor([w]))
                out.append(feats[-1].mean(dim=1).squeeze(0).numpy().tolist())
            return out

    if reduce_method == "avg_pool":
        return model_vectorizer(
            df, waveform_col, out_col, factory, "torchaudio", encode
        )

    def encode_frames(model, waves):
        import torch

        with torch.inference_mode():
            out = []
            for w in waves:
                feats, _ = model.extract_features(torch.tensor([w]))
                out.append(feats[-1].squeeze(0).numpy().tolist())
            return out

    staged = model_vectorizer(
        df,
        waveform_col,
        "__frames",
        factory,
        "torchaudio",
        encode_frames,
        return_type="array<array<float>>",
    )
    return frames_to_rows(staged, "__frames", out_col)


def _imagebind_factory(model_name: str = "imagebind_huge"):
    def factory():  # pragma: no cover - imagebind not in CI
        from imagebind.models import imagebind_model

        model = getattr(imagebind_model, model_name)(pretrained=True)
        model.eval()
        return model

    return factory


def imagebind_text_vectorizer(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "vector",
    model_name: str = "imagebind_huge",
) -> DataFrame:  # pragma: no cover - imagebind not in CI
    """≡ vectorizers/text/imagebind.py:30-68 — the joint-embedding text
    trunk (tokenization via imagebind.data, same space as image/audio)."""

    def encode(model, texts):
        import torch
        from imagebind import data
        from imagebind.models.imagebind_model import ModalityType

        with torch.inference_mode():
            x = data.load_and_transform_text(texts, "cpu")
            out = model({ModalityType.TEXT: x})[ModalityType.TEXT]
            return [v.numpy().tolist() for v in out]

    return model_vectorizer(
        df, text_col, out_col, _imagebind_factory(model_name), "imagebind", encode
    )


def imagebind_image_vectorizer(
    df: DataFrame,
    tensor_col: str = "tensor",
    out_col: str = "vector",
    model_name: str = "imagebind_huge",
) -> DataFrame:  # pragma: no cover - imagebind not in CI
    """≡ vectorizers/image/imagebind.py:24-72. The 224² bicubic resize +
    center crop + CLIP normalization runs FOR REAL in
    operators/preprocess.py (images_to_clip_tensors); this gated trunk
    consumes the flattened (3, 224, 224) tensors it emits."""
    from radient_spark.functions.media import IMAGE_SIZE

    def encode(model, tensors):
        import numpy as np
        import torch
        from imagebind.models.imagebind_model import ModalityType

        x = torch.tensor(
            np.asarray(tensors, dtype=np.float32).reshape(
                -1, 3, IMAGE_SIZE, IMAGE_SIZE
            )
        )
        with torch.inference_mode():
            out = model({ModalityType.VISION: x})[ModalityType.VISION]
            return [v.numpy().tolist() for v in out]

    return model_vectorizer(
        df, tensor_col, out_col, _imagebind_factory(model_name), "imagebind", encode
    )


def imagebind_audio_vectorizer(
    df: DataFrame,
    mel_col: str = "mel",
    out_col: str = "vector",
    model_name: str = "imagebind_huge",
) -> DataFrame:  # pragma: no cover - imagebind not in CI
    """≡ vectorizers/audio/imagebind.py:25-87. The resample -> 2 s clip
    -> 128-bin log-mel -> (128, 204) pad/trim -> Normalize(-4.268, 9.138)
    chain runs FOR REAL in operators/preprocess.py
    (audio_to_melspec_clips); this gated trunk consumes one mel clip per
    row shaped (n_clips=1, 1, NUM_MEL_BINS, TARGET_LENGTH)."""
    from radient_spark.functions.media import NUM_MEL_BINS, TARGET_LENGTH

    def encode(model, mels):
        import numpy as np
        import torch
        from imagebind.models.imagebind_model import ModalityType

        x = torch.tensor(
            np.asarray(mels, dtype=np.float32).reshape(
                -1, 1, 1, NUM_MEL_BINS, TARGET_LENGTH
            )
        )
        with torch.inference_mode():
            out = model({ModalityType.AUDIO: x})[ModalityType.AUDIO]
            return [v.numpy().tolist() for v in out]

    return model_vectorizer(
        df, mel_col, out_col, _imagebind_factory(model_name), "imagebind", encode
    )


def cohere_text_vectorizer(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "vector",
    model: str = "embed-english-v3.0",
    api_key: str | None = None,
) -> DataFrame:  # pragma: no cover - cohere not in CI
    """≡ vectorizers/text/cohere.py:18-39 — batched REST embedding calls
    from executors (note: the reference's env-var path is broken by an
    `os.envirion` typo, cohere.py:26; we read os.environ correctly)."""
    key = api_key or os.environ.get("COHERE_API_KEY")

    def factory():
        import cohere

        return cohere.Client(key)

    def encode(client, texts):
        resp = client.embed(texts=texts, model=model, input_type="search_document")
        return [list(e) for e in resp.embeddings]

    return model_vectorizer(df, text_col, out_col, factory, "cohere", encode)


def voyage_text_vectorizer(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "vector",
    model: str = "voyage-2",
    api_key: str | None = None,
) -> DataFrame:  # pragma: no cover - voyageai not in CI
    """≡ vectorizers/text/voyage.py:14-29."""
    key = api_key or os.environ.get("VOYAGE_API_KEY")

    def factory():
        import voyageai

        return voyageai.Client(api_key=key)

    def encode(client, texts):
        return client.embed(texts, model=model).embeddings

    return model_vectorizer(df, text_col, out_col, factory, "voyageai", encode)


def multimodal_vectorizer(
    df: DataFrame,
    modality_col: str = "modality",
    text_col: str = "text",
    out_col: str = "vector",
    dim: int = 64,
    method: str = "deterministic",
) -> DataFrame:
    """Modality-dispatch vectorizer (≡ vectorizers/multimodal.py:19-55):
    one output column, per-modality embedding logic selected by a CASE
    over the modality column.

    method='deterministic' (default, codec/model-free): text uses the
    hashing vectorizer; non-text modalities embed their URI/payload
    fingerprint so every row lands in the same vector space for joint
    search — the ImageBind idea, minus the model.

    method='imagebind' (gated): every modality routes through the REAL
    joint-embedding trunks — text via imagebind_text_vectorizer; image/
    audio rows are expected to carry the preprocessed columns from
    operators/preprocess.py ('tensor' / 'mel'), consumed by
    imagebind_image_vectorizer / imagebind_audio_vectorizer. Raises
    ImportError when the imagebind package is absent.
    """
    if method == "imagebind":  # pragma: no cover - imagebind not in CI
        text_rows = imagebind_text_vectorizer(
            df.filter(F.col(modality_col) == "text"), text_col=text_col,
            out_col=out_col,
        )
        image_rows = imagebind_image_vectorizer(
            df.filter(F.col(modality_col) == "image"), out_col=out_col
        )
        audio_rows = imagebind_audio_vectorizer(
            df.filter(F.col(modality_col) == "audio"), out_col=out_col
        )
        return text_rows.unionByName(image_rows).unionByName(audio_rows)
    if method != "deterministic":
        raise ValueError(f"unknown method {method!r}")
    with_text = hashing_vectorizer(
        df, text_col=text_col, out_col="__mm_text_vec", dim=dim
    )
    fallback_src = F.coalesce(F.col(text_col), F.col(modality_col))
    with_fp = with_text.withColumn(
        "__mm_hash_vec",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                (str_hash(F.concat_ws("#", fallback_src, i.cast("string"))) % 1000)
                / 1000.0
            ).cast("float"),
        ),
    )
    return with_fp.withColumn(
        out_col,
        F.when(F.col(modality_col) == "text", F.col("__mm_text_vec")).otherwise(
            F.col("__mm_hash_vec")
        ),
    ).drop("__mm_text_vec", "__mm_hash_vec")
