"""Operator factory: string-keyed registry of DataFrame transforms.

≡ the reference's `make_operator(task_name, task_type, **kwargs)`
(/root/reference/radient/factory.py:10-64), which wraps Task construction
in a Runner. Here every operator IS a DataFrame transform — a callable
`DataFrame -> DataFrame` — so "running" one just extends the lazy Catalyst
plan; laziness needs no LazyLocalRunner (orchestrate/runners.py:49-60),
it is Spark's execution model.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame

from radient_spark.operators import dedup, preprocess, transforms, vectorize

Transform = Callable[[DataFrame], DataFrame]

# (task_name, task_type) -> factory(**kwargs) -> Transform
_REGISTRY: dict[tuple[str, str], Callable[..., Transform]] = {}


def register(task_name: str, task_type: str):
    def deco(fn):
        _REGISTRY[(task_name, task_type)] = fn
        return fn

    return deco


def make_operator(
    task_name: str,
    task_type: str | None = None,
    runner=None,
    task_params: dict | None = None,
    *,
    method: str | None = None,
    **kwargs,
) -> Transform:
    """Look up and construct an operator.

    vectorizer: hashing | fingerprint | multimodal | sbert | text | ...
    transform:  video_demux | video-demux | speech-to-text | ...
    dedup:      exact | minhash | simhash | repeated_ngram | first_arrival
                | srp_first_arrival
    dataset:    hash_split | pack | decontaminate-free curation ops
    source/sink: local | youtube | ingest | milvus | mongodb

    Accepts the reference's exact calling conventions
    (/root/reference/radient/factory.py:10-22 and README.md:84-88):
    `task_params={...}` merges into kwargs; `method=` substitutes for
    task_type when task_type is omitted (the README's
    make_operator("sink", method="mongodb", ...) shape); `runner` is
    accepted and ignored — every operator here IS a lazy DataFrame
    transform, so Spark's execution model plays the LocalRunner role.
    """
    if task_type is None:
        if method is None:
            raise ValueError("task_type (or method=) is required")
        task_type = method
    elif method is not None:
        kwargs["method"] = method
    if task_params:
        kwargs = {**task_params, **kwargs}
    try:
        factory = _REGISTRY[(task_name, task_type)]
    except KeyError:
        known = sorted(k for k in _REGISTRY)
        raise ValueError(
            f"unknown operator ({task_name!r}, {task_type!r}); known: {known}"
        )
    return factory(**kwargs)


# --- vectorizers (≡ radient/tasks/vectorizers/*/__init__.py factories) ----

register("vectorizer", "hashing")(
    lambda **kw: functools.partial(vectorize.hashing_vectorizer, **kw)
)
register("vectorizer", "fingerprint")(
    lambda **kw: functools.partial(vectorize.fingerprint_vectorizer, **kw)
)
register("vectorizer", "multimodal")(
    lambda **kw: functools.partial(vectorize.multimodal_vectorizer, **kw)
)
register("vectorizer", "sbert")(
    lambda **kw: functools.partial(vectorize.sbert_vectorizer, **kw)
)
register("vectorizer", "timm")(
    lambda **kw: functools.partial(vectorize.timm_image_vectorizer, **kw)
)
register("vectorizer", "torchaudio")(
    lambda **kw: functools.partial(vectorize.torchaudio_audio_vectorizer, **kw)
)
register("vectorizer", "cohere")(
    lambda **kw: functools.partial(vectorize.cohere_text_vectorizer, **kw)
)
register("vectorizer", "voyage")(
    lambda **kw: functools.partial(vectorize.voyage_text_vectorizer, **kw)
)
register("vectorizer", "imagebind-text")(
    lambda **kw: functools.partial(vectorize.imagebind_text_vectorizer, **kw)
)
register("vectorizer", "imagebind-image")(
    lambda **kw: functools.partial(vectorize.imagebind_image_vectorizer, **kw)
)
register("vectorizer", "imagebind-audio")(
    lambda **kw: functools.partial(vectorize.imagebind_audio_vectorizer, **kw)
)

# --- transforms (≡ radient/tasks/transforms/*/__init__.py factories) ------

register("transform", "video_demux")(
    lambda **kw: functools.partial(transforms.video_demux, **kw)
)
register("transform", "document_screenshot")(
    lambda **kw: functools.partial(transforms.document_screenshot, **kw)
)
register("transform", "speech_to_text")(
    lambda **kw: functools.partial(transforms.speech_to_text, **kw)
)
register("transform", "audio_melspec")(
    lambda **kw: functools.partial(preprocess.audio_to_melspec_clips, **kw)
)
register("transform", "image_clip_tensor")(
    lambda **kw: functools.partial(preprocess.images_to_clip_tensors, **kw)
)

# --- dedup (north-star ops) ----------------------------------------------

register("dedup", "exact")(
    lambda **kw: functools.partial(dedup.exact_dedup, **kw)
)
register("dedup", "minhash")(
    lambda **kw: functools.partial(dedup.with_minhash, **kw)
)
register("dedup", "simhash")(
    lambda **kw: functools.partial(dedup.with_simhash, **kw)
)
register("dedup", "repeated_ngram")(
    lambda **kw: functools.partial(dedup.repeated_ngram_coverage, **kw)
)
register("dedup", "first_arrival")(
    lambda **kw: functools.partial(dedup.lsh_first_arrival_flags, **kw)
)
register("dedup", "srp_first_arrival")(
    lambda **kw: functools.partial(dedup.srp_first_arrival_flags, **kw)
)

# --- dataset curation (training-pipeline ops) -----------------------------

from radient_spark.operators import dataset as _dataset  # noqa: E402

register("dataset", "chunk")(
    lambda **kw: functools.partial(_dataset.chunk_documents, **kw)
)
register("dataset", "hash_split")(
    lambda **kw: functools.partial(_dataset.hash_split, **kw)
)
register("dataset", "pack")(
    lambda **kw: functools.partial(_dataset.sequential_pack, **kw)
)
register("dataset", "temperature_sample")(
    lambda **kw: functools.partial(_dataset.temperature_sample, **kw)
)
register("dataset", "perplexity_buckets")(
    lambda **kw: functools.partial(_dataset.perplexity_buckets, **kw)
)
register("dataset", "dsir")(
    lambda **kw: functools.partial(_dataset.dsir_logweights, **kw)
)
register("dataset", "ntile")(
    lambda **kw: functools.partial(_dataset.distributed_ntile, **kw)
)

# --- quantization (embedding-compression ops) ------------------------------

from radient_spark.operators import quantize as _quantize  # noqa: E402

register("quantize", "sq8_encode")(
    lambda stats, **kw: functools.partial(_quantize.sq8_encode, stats=stats, **kw)
)
register("quantize", "pq_encode")(
    lambda codebooks, **kw: functools.partial(
        _quantize.pq_encode, codebooks=codebooks, **kw
    )
)
register("quantize", "pack")(
    lambda **kw: functools.partial(_quantize.pack_codes, **kw)
)
register("quantize", "unpack")(
    lambda **kw: functools.partial(_quantize.unpack_codes, **kw)
)

# --- classification / merge / layout (round-3 curation ops) ---------------

from radient_spark.operators import classify as _classify  # noqa: E402
from radient_spark.operators import layout as _layout  # noqa: E402
from radient_spark.operators import merge as _merge  # noqa: E402

register("classify", "linear")(
    lambda weights, **kw: functools.partial(
        _classify.linear_classifier_score, weights=weights, **kw
    )
)
register("classify", "fasttext")(
    lambda model_path, **kw: functools.partial(
        _classify.fasttext_scorer, model_path=model_path, **kw
    )
)
register("merge", "upsert")(
    lambda keys, **kw: functools.partial(_merge.merge_upsert, keys=keys, **kw)
)
register("merge", "report")(
    lambda keys, compare_cols, **kw: functools.partial(
        _merge.merge_report, keys=keys, compare_cols=compare_cols, **kw
    )
)
register("layout", "zorder")(
    lambda cols, **kw: functools.partial(
        _layout.zorder_repartition, cols=cols, **kw
    )
)

from radient_spark.operators import graph as _graph  # noqa: E402

register("dedup", "paragraph")(
    lambda **kw: functools.partial(dedup.paragraph_dedup, **kw)
)
register("dataset", "cumsum")(
    lambda order_cols, range_col, value_col, **kw: functools.partial(
        _dataset.distributed_cumsum,
        order_cols=order_cols,
        range_col=range_col,
        value_col=value_col,
        **kw,
    )
)
register("graph", "pagerank")(
    lambda **kw: functools.partial(_graph.pagerank, **kw)
)

from radient_spark.operators import retrieval as _retrieval  # noqa: E402

register("retrieval", "bm25")(
    lambda query_terms, **kw: functools.partial(
        _retrieval.bm25_scores, query_terms=query_terms, **kw
    )
)
register("retrieval", "rrf")(
    lambda **kw: functools.partial(_retrieval.rrf_fuse, **kw)
)

# --- sketches / gates / profiling (round-3 audit ops) ----------------------

from radient_spark.operators import sketch as _sketch  # noqa: E402

register("dedup", "bloom_gate")(
    lambda bitmap, **kw: functools.partial(
        dedup.bloom_gate, bitmap=bitmap, **kw
    )
)
register("sketch", "hll")(
    lambda **kw: functools.partial(_sketch.hll_cardinality, **kw)
)
register("sketch", "cms")(
    lambda **kw: functools.partial(_sketch.cms_build, **kw)
)
register("dataset", "profile")(
    lambda **kw: functools.partial(_dataset.profile_table, **kw)
)
register("dataset", "quantiles")(
    lambda group_col, value_col, qs, **kw: functools.partial(
        _dataset.exact_group_quantiles,
        group_col=group_col,
        value_col=value_col,
        qs=qs,
        **kw,
    )
)

register("dedup", "sorted_neighborhood")(
    lambda **kw: functools.partial(dedup.sorted_neighborhood_pairs, **kw)
)
register("dedup", "simhash_pairs")(
    lambda **kw: functools.partial(dedup.simhash_near_pairs, **kw)
)
register("dataset", "weighted_sample")(
    lambda weight_col, id_col, k, **kw: functools.partial(
        _dataset.weighted_sample, weight_col=weight_col, id_col=id_col, k=k, **kw
    )
)
register("dataset", "rank")(
    lambda order_cols, range_col, **kw: functools.partial(
        _dataset.distributed_rank,
        order_cols=order_cols,
        range_col=range_col,
        **kw,
    )
)
register("graph", "triangles")(
    lambda **kw: functools.partial(_graph.triangle_count, **kw)
)

# --- round-4 operators -----------------------------------------------------

from radient_spark.operators import bpe as _bpe  # noqa: E402
from radient_spark.operators import cluster as _cluster  # noqa: E402
from radient_spark.operators import merge as _merge  # noqa: E402
from pyspark.sql import functions as _F  # noqa: E402

register("sketch", "histogram")(
    lambda value_col, **kw: functools.partial(
        _sketch.hist_build, value=_F.col(value_col), **kw
    )
)
register("graph", "components_star")(
    lambda **kw: functools.partial(_graph.connected_components_star, **kw)
)
register("graph", "local_clustering")(
    lambda **kw: functools.partial(_graph.local_clustering, **kw)
)
register("dataset", "water_fill")(
    lambda key_col, count_col, **kw: functools.partial(
        _dataset.water_fill_allocation,
        key_col=key_col,
        count_col=count_col,
        **kw,
    )
)
register("dedup", "bpe_learn")(
    lambda **kw: functools.partial(_bpe.bpe_learn, **kw)
)
register("transform", "bpe_apply")(
    lambda merges, **kw: functools.partial(
        _bpe.bpe_apply, merges=merges, **kw
    )
)
register("dataset", "scd2")(
    lambda key, attr, order_col, tiebreak_col, **kw: functools.partial(
        _merge.scd2_history,
        key=key,
        attr=attr,
        order_col=order_col,
        tiebreak_col=tiebreak_col,
        **kw,
    )
)
register("cluster", "silhouette")(
    lambda centroids, **kw: functools.partial(
        _cluster.silhouette_report, centroids=centroids, **kw
    )
)


# --- round-5 late families: audits, contracts, graph, skyline --------------

from radient_spark.operators import validate as _validate  # noqa: E402
from radient_spark.operators import skyline as _skyline  # noqa: E402
from radient_spark.operators import reconcile as _reconcile  # noqa: E402
from radient_spark.operators import quality as _quality2  # noqa: E402
from radient_spark.operators import graph as _graph  # noqa: E402

register("audit", "contract")(
    lambda rules, **kw: functools.partial(_validate.validate, rules=rules, **kw)
)
register("audit", "benford")(
    lambda amount_col, **kw: functools.partial(
        _quality2.benford_report, amount_col=amount_col, **kw
    )
)
register("audit", "fingerprint")(
    lambda cols, **kw: functools.partial(
        _reconcile.table_fingerprint, cols=cols, **kw
    )
)
register("audit", "sequence_gaps")(
    lambda key_col, **kw: functools.partial(
        _reconcile.sequence_gaps, key_col=key_col, **kw
    )
)
register("dataset", "skyline")(
    lambda x_col, y_col, **kw: functools.partial(
        _skyline.skyline_2d, x_col=x_col, y_col=y_col, **kw
    )
)
register("graph", "kcore")(
    lambda k, **kw: functools.partial(_graph.kcore, k=k, **kw)
)
register("graph", "label_propagation")(
    lambda **kw: functools.partial(_graph.label_propagation, **kw)
)
register("graph", "wl_colors")(
    lambda **kw: functools.partial(_graph.wl_colors, **kw)
)
register("graph", "hyperball")(
    lambda **kw: functools.partial(_graph.hyperball, **kw)
)
register("graph", "bfs_layers")(
    lambda seeds, **kw: functools.partial(_graph.bfs_layers, seeds=seeds, **kw)
)
register("graph", "personalized_pagerank")(
    lambda seed_node, **kw: functools.partial(
        _graph.personalized_pagerank_integer, seed_node=seed_node, **kw
    )
)
register("graph", "harmonic_centrality")(
    lambda **kw: functools.partial(_graph.hyperball_harmonic, **kw)
)
register("audit", "snapshot_diff")(
    lambda new, key_cols, cols, **kw: functools.partial(
        _reconcile.snapshot_diff, new=new, key_cols=key_cols, cols=cols, **kw
    )
)


# --- reference-vocabulary dispatch ------------------------------------------
# ≡ /root/reference/radient/factory.py:10-64 plus the per-modality `method`
# dispatch in tasks/vectorizers/*/__init__.py and
# tasks/transforms/*/__init__.py: the reference keys vectorizers by
# MODALITY with a `method` kwarg (text_vectorizer(method="sbert"), audio
# default "torchaudio", image default "timm", graph "fastrp", molecule
# "rdkit"), hyphenates transform type names ("video-demux",
# "speech-to-text"), and exposes "source"/"sink" task names. Register the
# exact same vocabulary so reference call sites port verbatim —
# make_operator("vectorizer", "text", method="sbert") works unchanged,
# and an unknown method raises NotImplementedError like the reference.


def _by_method(table, default: str):
    def build(method: str = default, **kw):
        for names, fn in table:
            if method in names:
                return fn(**kw)
        raise NotImplementedError(f"unknown method {method!r}")

    return build


register("vectorizer", "text")(
    _by_method(
        [
            (("sbert", "sentence-transformers"),
             lambda **kw: functools.partial(vectorize.sbert_vectorizer, **kw)),
            (("imagebind",),
             lambda **kw: functools.partial(
                 vectorize.imagebind_text_vectorizer, **kw)),
            (("sklearn", "scikit-learn"),
             lambda **kw: functools.partial(
                 vectorize.hashing_vectorizer, **kw)),
            (("cohere",),
             lambda **kw: functools.partial(
                 vectorize.cohere_text_vectorizer, **kw)),
            (("voyage", "voyageai"),
             lambda **kw: functools.partial(
                 vectorize.voyage_text_vectorizer, **kw)),
        ],
        "sbert",
    )
)
register("vectorizer", "audio")(
    _by_method(
        [
            (("torchaudio",),
             lambda **kw: functools.partial(
                 vectorize.torchaudio_audio_vectorizer, **kw)),
            (("imagebind",),
             lambda **kw: functools.partial(
                 vectorize.imagebind_audio_vectorizer, **kw)),
        ],
        "torchaudio",
    )
)
register("vectorizer", "image")(
    _by_method(
        [
            (("timm", "pytorch-image-models"),
             lambda **kw: functools.partial(
                 vectorize.timm_image_vectorizer, **kw)),
            (("imagebind",),
             lambda **kw: functools.partial(
                 vectorize.imagebind_image_vectorizer, **kw)),
        ],
        "timm",
    )
)
register("vectorizer", "graph")(
    _by_method(
        [(("fastrp",),
          lambda **kw: functools.partial(vectorize.fastrp_embeddings, **kw))],
        "fastrp",
    )
)
register("vectorizer", "molecule")(
    _by_method(
        [(("rdkit",),
          lambda **kw: functools.partial(
              vectorize.fingerprint_vectorizer, **kw))],
        "rdkit",
    )
)

register("transform", "video-demux")(
    _by_method(
        [
            (("default", None),
             lambda **kw: functools.partial(transforms.video_demux, **kw)),
            (("ffmpeg",),
             lambda output_dir=None, read_payloads=False, runner=None, **kw:
             functools.partial(
                 transforms.video_demux,
                 decoder=transforms.ffmpeg_demux_decoder(
                     output_dir=output_dir,
                     read_payloads=read_payloads,
                     runner=runner,
                 ),
                 **kw,
             )),
        ],
        "default",
    )
)
register("transform", "speech-to-text")(
    _by_method(
        [(("whisper", None),
          lambda **kw: functools.partial(transforms.speech_to_text, **kw))],
        "whisper",
    )
)
register("transform", "document-screenshot")(
    lambda **kw: functools.partial(transforms.document_screenshot, **kw)
)


def _sources():
    from radient_spark import sources

    return sources


def _sinks():
    from radient_spark import sinks

    return sinks


# Sources construct a zero-arg op producing a DataFrame (the Workflow
# head position, like the reference's Source.read contract).
register("source", "local")(
    lambda spark, path, **kw:
    lambda **_: _sources().local_source(spark, path, **kw)
)
register("source", "youtube")(
    lambda spark, url, output_directory, **kw:
    lambda **_: _sources().youtube_source(spark, url, output_directory, **kw)
)
# ingest(df, target_dir, mode) takes no extra kwargs and returns None,
# so the wrapper must not forward **kw (TypeError) and must return df so
# the step composes mid-Workflow as a pass-through sink, the way the
# reference's IngestSource hands its frame onward (sources/ingest.py:7-18).
def _ingest_passthrough(target_dir, mode="append"):
    def op(df, **_):
        _sources().ingest(df, target_dir, mode=mode)
        return df

    return op


register("source", "ingest")(_ingest_passthrough)

# Sinks dispatch on operation= like the reference task_params
# ({"operation": "insert"} vs {"operation": "search"},
# sinks/milvus.py:23-127, mongodb.py:29-115).
def _sink_factory(insert_fn_name: str, search_fn_name: str):
    def build(operation: str = "insert", **kw):
        if operation == "insert":
            return lambda df, **_: getattr(_sinks(), insert_fn_name)(df, **kw)
        if operation == "search":
            return lambda queries, **extra: getattr(_sinks(), search_fn_name)(
                queries, **{**kw, **extra}
            )
        raise ValueError(f"unknown operation {operation!r}")

    return build


register("sink", "milvus")(_sink_factory("milvus_sink", "milvus_search"))
register("sink", "mongodb")(_sink_factory("mongodb_sink", "mongodb_search"))
