from radient_spark.operators import asof, dedup, topk

__all__ = ["asof", "dedup", "topk"]
