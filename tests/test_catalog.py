"""Catalog resolution cache (optimization r12): plans are reused per
session, invalidated on file change, and never leak across sessions.

The cache holds METADATA only (StructType + unexecuted lazy plans);
these tests pin the safety properties: correct data after a hit,
invalidation when the files change, per-session isolation.
"""

from __future__ import annotations

import os
import shutil

import pytest

from radient_spark import catalog
from radient_spark.catalog import load_tables


def test_second_call_serves_cached_plans(spark, sf_dir):
    a = load_tables(spark, sf_dir)
    b = load_tables(spark, sf_dir)
    # identity: the second call returned the same resolved DataFrame
    # objects (no re-resolution), in a fresh dict (callers can mutate)
    assert a is not b
    assert all(a[t] is b[t] for t in a)
    # and the cached plan still computes from the files
    assert b["region"].count() == a["region"].count() > 0


def test_cache_entry_is_lazy_metadata_only(spark, sf_dir):
    df = load_tables(spark, sf_dir)["nation"]
    lvl = df.storageLevel
    assert not (lvl.useMemory or lvl.useDisk), (
        "cached catalog entries must be unpersisted lazy plans — "
        "data caching here would be bench-gaming, not optimization"
    )


def test_file_change_invalidates(spark, sf_dir, tmp_path):
    # copy one table dir, resolve, then touch the files: the signature
    # (count, bytes, max mtime) must force a re-resolution
    src = os.path.join(sf_dir, "region.parquet")
    workdir = str(tmp_path / "sfcopy")
    os.makedirs(workdir)
    dst = os.path.join(workdir, "region.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    for name in catalog.TABLES:
        if name == "region":
            continue
        s = os.path.join(sf_dir, f"{name}.parquet")
        d = os.path.join(workdir, f"{name}.parquet")
        (shutil.copytree if os.path.isdir(s) else shutil.copy)(s, d)

    a = load_tables(spark, workdir)["region"]
    # bump mtime beyond ns-resolution noise
    if os.path.isdir(dst):
        for root, _dirs, files in os.walk(dst):
            for fn in files:
                p = os.path.join(root, fn)
                st = os.stat(p)
                os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 10_000_000))
    else:
        st = os.stat(dst)
        os.utime(dst, ns=(st.st_atime_ns, st.st_mtime_ns + 10_000_000))
    b = load_tables(spark, workdir)["region"]
    assert a is not b, "mtime change must invalidate the resolution cache"
    assert b.count() == a.count()


def test_schema_cache_matches_inference(spark, sf_dir):
    # the schema-cache path (explicit schema) must yield the inferred
    # schema exactly — including the legacy bigint nanos columns
    catalog._SCHEMA_CACHE.clear()
    first = load_tables(spark, sf_dir)  # populates the schema cache
    skey = catalog._session_key(spark)
    catalog._TABLE_CACHE.pop(skey, None)  # force table re-resolution
    second = load_tables(spark, sf_dir)  # resolves via cached schemas
    for t in catalog.TABLES:
        assert first[t].schema == second[t].schema, t


def test_sessions_do_not_share_plans(spark, sf_dir):
    a = load_tables(spark, sf_dir)["region"]
    newSession = spark.newSession()
    try:
        b = load_tables(newSession, sf_dir)["region"]
        assert a is not b
        assert b.count() == a.count()
    finally:
        pass


@pytest.mark.parametrize("bad", ["/does/not/exist"])
def test_uncacheable_paths_fall_through(bad):
    assert catalog._path_signature(bad) is None
