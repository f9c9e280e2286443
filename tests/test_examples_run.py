"""The example scripts must stay runnable (VERDICT r10 #7): they are the
discoverability surface for the flagship capabilities, so a drifted
import or renamed kwarg in examples/ is a real regression. Runs each
main() in-process against the test SF (get_session reuses the suite's
session), asserting only that it completes — the operators themselves
are value-tested elsewhere."""

from __future__ import annotations

import importlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))


def _run_example(name, spark, sf_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    mod = importlib.import_module(name)
    importlib.reload(mod)  # re-read SF_DIR from the patched env
    mod.main()


def test_migration_example_runs(spark, sf_dir, monkeypatch):
    _run_example("migration", spark, sf_dir, monkeypatch)


def test_curation_demo_runs(spark, sf_dir, monkeypatch):
    _run_example("curation_demo", spark, sf_dir, monkeypatch)
