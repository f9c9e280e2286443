"""Vector-metadata operations (SURVEY.md §1.1): the reference's per-vector
OrderedDict metadata (radient/vector.py:29-48) as MAP<STRING,STRING>
column expressions.

- putmeta(key, value) -> map_concat (vector.py:29-38)
- popmeta(key)        -> map_filter (vector.py:40-42)
- todict(vector_field)-> struct/to_json flattening metadata + vector into
  one record for sink insertion (vector.py:44-48)
- stamp(data, type)   -> the automatic provenance stamping every
  vectorizer applies (vectorizers/_base.py:99)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def empty_meta() -> Column:
    return F.create_map().cast("map<string,string>")


def putmeta(meta: Column | str, key: str, value: Column | str) -> Column:
    """Set/overwrite one metadata key (≡ Vector.putmeta)."""
    v = value if isinstance(value, Column) else F.lit(value)
    cleaned = F.map_filter(_c(meta), lambda k, _: k != key)
    return F.map_concat(cleaned, F.create_map(F.lit(key), v.cast("string")))


def popmeta(meta: Column | str, key: str) -> Column:
    """Remove one metadata key (≡ Vector.popmeta)."""
    return F.map_filter(_c(meta), lambda k, _: k != key)


def getmeta(meta: Column | str, key: str) -> Column:
    return F.element_at(_c(meta), key)


def stamp(meta: Column | str, data: Column | str, modality: Column | str) -> Column:
    """Provenance stamping: putmeta('data', str(d)).putmeta('type', m)
    (≡ vectorizers/_base.py:99)."""
    return putmeta(putmeta(meta, "data", _c(data)), "type", _c(modality))


def todict(
    meta: Column | str, vector: Column | str, vector_field: str = "vector"
) -> Column:
    """Flatten metadata + vector into one JSON record for sink insertion
    (≡ Vector.todict): {'<vector_field>': [...], **meta}."""
    return F.to_json(
        F.struct(
            _c(vector).alias(vector_field),
            _c(meta).alias("meta"),
        )
    )
