"""COVERAGE_LEDGER.md staleness guard (VERDICT r10 #1).

Rounds 9 and 10 both ended with the committed ledger contradicting the
newest CORRECTNESS_r*.json on disk — the file landed after the last
ledger regeneration. This test regenerates the ledger text in-memory
(scripts/coverage_ledger.render is a pure function of the CORRECTNESS
files + the query registry) and compares byte-for-byte with the
committed file, so EITHER a new driver window landing OR a registry
change fails the suite until `python scripts/coverage_ledger.py` is
re-run and the result committed.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_ledger_matches_disk_state():
    import coverage_ledger

    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        expected = coverage_ledger.render()
    finally:
        os.chdir(cwd)
    with open(os.path.join(REPO, "COVERAGE_LEDGER.md")) as f:
        actual = f.read()
    assert actual == expected, (
        "COVERAGE_LEDGER.md is stale: a CORRECTNESS_r*.json or the query "
        "registry changed after the last regeneration. Run "
        "`python scripts/coverage_ledger.py` from the repo root and commit "
        "the result."
    )


def test_ledger_has_no_never_checked_regression():
    # The cumulative record reached 0 never-checked in round 11; a query
    # added to the registry without ever entering a driver rotation
    # should be a conscious choice, surfaced here.
    with open(os.path.join(REPO, "COVERAGE_LEDGER.md")) as f:
        text = f.read()
    line = next(ln for ln in text.splitlines() if ln.startswith("Never-checked"))
    n = int(line.split("(")[1].split(")")[0])
    assert n <= 5, (
        f"{n} registry queries have never been driver-checked — add them "
        "to the next rotation (COVERAGE.md) or trim the registry."
    )
