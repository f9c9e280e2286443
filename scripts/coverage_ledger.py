"""Regenerate COVERAGE_LEDGER.md from CORRECTNESS_r*.json.

The rotation plan (which queries go into _DRIVER_PRIORITY next round) is
derived from this ledger, never hand-written: for every registry query it
records the driver rounds it appeared in and its latest driver status.
Unlike the old scripts/verify_sf001.py heuristic (recursive key scan,
flagged in round-8 ADVICE), this parses the known CORRECTNESS shape
explicitly — top-level query-name keys only.

Run from the repo root:  python scripts/coverage_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_history() -> dict[str, list[tuple[int, dict]]]:
    hist: dict[str, list[tuple[int, dict]]] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(f.split("_r")[1].split(".")[0])
        data = json.load(open(f))
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            if isinstance(rec, dict):
                hist.setdefault(name, []).append((rnd, rec))
    for v in hist.values():
        v.sort()
    return hist


def status_of(rec: dict) -> str:
    if rec.get("err") == "no_oracle":
        rows = rec.get("spark_rows")
        return "rows-only" if isinstance(rows, int) and rows >= 0 else "ERROR"
    if rec.get("err"):
        return "ERROR"
    if rec.get("hash_match") is True:
        return "green"
    if rec.get("hash_match") is False:
        return "hash-RED"
    if rec.get("rows_match") is True:
        return "rows-only"
    return "RED"


def render() -> str:
    """The ledger text as a pure function of disk state.

    tests/test_coverage_ledger.py regenerates this in-memory and compares
    byte-for-byte with the committed COVERAGE_LEDGER.md, so a new
    CORRECTNESS_r*.json landing (or a registry change) makes the suite
    fail until the ledger is regenerated — staleness is structurally
    impossible to ship (VERDICT r10 #1).
    """
    from radient_spark.queries import QUERIES

    hist = load_history()
    names = list(QUERIES)
    never = [n for n in names if n not in hist]
    latest_red = []
    consumed = sorted(glob.glob("CORRECTNESS_r*.json"))
    lines = [
        "# COVERAGE_LEDGER — mechanically generated, do not hand-edit",
        "",
        "Regenerate with `python scripts/coverage_ledger.py`. Source of",
        "truth for every rotation claim: per-query driver rounds checked",
        "and latest driver status, parsed from CORRECTNESS_r*.json",
        "(top-level query-name keys only).",
        "",
        "Consumed: " + ", ".join(consumed),
        "",
        f"Registry: {len(names)} queries. Ever driver-checked: "
        f"{len(names) - len(never)}. Never checked: {len(never)}.",
        "",
        "| query | rounds checked | latest status |",
        "|---|---|---|",
    ]
    for n in names:
        if n in hist:
            rounds = ",".join(f"r{r}" for r, _ in hist[n])
            st = status_of(hist[n][-1][1])
            if st not in ("green",):
                latest_red.append((n, st))
        else:
            rounds, st = "—", "never-checked"
        lines.append(f"| {n} | {rounds} | {st} |")
    lines += [
        "",
        f"Latest-status non-green ({len(latest_red)}): "
        + (", ".join(f"{n} ({s})" for n, s in latest_red) or "none"),
        "",
        f"Never-checked ({len(never)}): " + (", ".join(never) or "none"),
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    text = render()
    with open("COVERAGE_LEDGER.md", "w") as f:
        f.write(text)
    summary = [ln for ln in text.splitlines() if ln.startswith("Registry:")][0]
    print(f"wrote COVERAGE_LEDGER.md: {summary}")


if __name__ == "__main__":
    main()
