"""End-to-end golden for the composed drug-discovery example flow.

The reference's de-facto correctness artifact is its worked example with
a printed golden: molecule fingerprints -> Jaccard cdist -> argsort[:10]
(/root/reference/examples/drug_discovery.md:42-51, golden list at :51).
The real flow needs rdkit + the FDA CSV (absent here); this mirrors the
COMPOSED pipeline — Workflow(load -> vectorize -> score -> top10) over a
seeded public-SMILES fixture with the deterministic stand-in fingerprint
vectorizer — and pins the exact ranked top-10, so the example-level
composition (not just each operator) is under a golden.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from radient_spark.functions import vector as V
from radient_spark.operators.vectorize import fingerprint_vectorizer
from radient_spark.orchestrate import Workflow

# public SMILES (PubChem): ibuprofen + profen-family analogs + controls
MOLS = [
    ("Ibuprofen", "CC(C)CC1=CC=C(C=C1)C(C)C(O)=O"),
    ("Dexibuprofen", "CC(C)CC1=CC=C(C=C1)[C@@H](C)C(O)=O"),
    ("Naproxen", "COC1=CC2=CC(=CC=C2C=C1)C(C)C(O)=O"),
    ("Ketoprofen", "CC(C(O)=O)C1=CC=CC(=C1)C(=O)C1=CC=CC=C1"),
    ("Fenoprofen", "CC(C(O)=O)C1=CC=CC(OC2=CC=CC=C2)=C1"),
    ("Loxoprofen", "CC(C(O)=O)C1=CC=C(CC2CCCC2=O)C=C1"),
    ("Flurbiprofen", "CC(C(O)=O)C1=CC(F)=C(C=C1)C1=CC=CC=C1"),
    ("Aspirin", "CC(=O)OC1=CC=CC=C1C(O)=O"),
    ("Paracetamol", "CC(=O)NC1=CC=C(O)C=C1"),
    ("Caffeine", "CN1C=NC2=C1C(=O)N(C)C(=O)N2C"),
    ("Mandelic acid", "OC(C(O)=O)C1=CC=CC=C1"),
    ("Phenylacetic acid", "OC(=O)CC1=CC=CC=C1"),
    ("Benzoic acid", "OC(=O)C1=CC=CC=C1"),
    ("Salicylic acid", "OC(=O)C1=CC=CC=C1O"),
    ("Oxeladin", "CCN(CC)CCOCCOC(=O)C(CC)(CC)C1=CC=CC=C1"),
]
QUERY = "CC(C)CC1=CC=C(C=C1)C(C)C(O)=O"  # ibuprofen, as in the example

# exact composed-pipeline golden (stand-in fingerprints, dim=256,
# jaccard rounded to 6, name tiebreak) — the profen family ranks top,
# mirroring the reference golden's shape (Ibuprofen first, analgesic
# analogs following, drug_discovery.md:51)
GOLDEN_TOP10 = [
    ("Ibuprofen", 1.0),
    ("Ketoprofen", 0.776316),
    ("Flurbiprofen", 0.7375),
    ("Dexibuprofen", 0.72043),
    ("Naproxen", 0.688889),
    ("Mandelic acid", 0.68),
    ("Fenoprofen", 0.636364),
    ("Loxoprofen", 0.615385),
    ("Paracetamol", 0.566265),
    ("Phenylacetic acid", 0.56),
]


def test_drug_discovery_composed_pipeline_golden(spark):
    qfp = fingerprint_vectorizer(
        spark.createDataFrame([(QUERY,)], "mol string"),
        input_col="mol",
        out_col="fp",
        dim=256,
    ).first()["fp"]

    def load(**kw):
        return spark.createDataFrame(MOLS, "name string, mol string")

    def vectorize(df):
        return fingerprint_vectorizer(
            df, input_col="mol", out_col="fp", dim=256
        )

    def score(df):
        qlit = F.array(*[F.lit(bool(b)) for b in qfp])
        return df.withColumn(
            "jac", F.round(V.jaccard_bool(F.col("fp"), qlit), 6)
        )

    def top10(df):
        return (
            df.orderBy(F.col("jac").desc(), F.col("name").asc())
            .limit(10)
            .select("name", "jac")
        )

    wf = (
        Workflow()
        .add(load, "load")
        .add(vectorize, "vectorize")
        .add(score, "score")
        .add(top10, "top10")
    )
    got = [(r["name"], r["jac"]) for r in wf.run().collect()]
    assert got == GOLDEN_TOP10, got
    # the self-query tops the list at exactly 1.0, like the reference's
    # golden (Dexibuprofen/Ibuprofen lead drug_discovery.md:51)
    assert got[0] == ("Ibuprofen", 1.0)


def _sorted_rows_md5(df):
    import hashlib

    rows = sorted(tuple(str(x) for x in r) for r in df.collect())
    return hashlib.md5(str(rows).encode()).hexdigest()


def test_media_pipeline_checksum_golden(spark):
    """Round-8: q_media_pipeline is a deliberate rows-only driver row
    (stubbed decoders), so pin its sf0.001 output with a value checksum
    here — the media fan-out path is value-checked in CI even without a
    DuckDB oracle. The checksum is over stringified sorted rows; the
    output is integer counts, so it is platform-stable."""
    from radient_spark.queries import QUERIES

    df = QUERIES["q_media_pipeline"][0](spark, "/root/testdata/sf0.001")
    assert _sorted_rows_md5(df) == "b3224fd6c815ae1dcf5ea9f80ccd049e"


def test_mel_clip_features_checksum_golden(spark):
    """Round-8: q_mel_clip_features is rows-only (FFT is not
    SQL-expressible), so pin the sf0.001 per-clip summary features with
    a checksum. mel_mean is rounded to 4 decimals in the query — far
    above FFT float noise — so the checksum is stable across runs."""
    from radient_spark.queries import QUERIES

    df = QUERIES["q_mel_clip_features"][0](spark, "/root/testdata/sf0.001")
    assert _sorted_rows_md5(df) == "3b7e965a462457a0847e019dc0ef0e04"
