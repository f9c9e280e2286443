from radient_spark.operators import asof, dedup, topk, transforms, vectorize

__all__ = ["asof", "dedup", "topk", "transforms", "vectorize"]
