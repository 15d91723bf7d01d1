"""Regression tests for bench.py's per-round archive round derivation.

VERDICT r15 What's-wrong #2: the glob BENCH_r*.json also matches the
suffixed archives (BENCH_r15_runs.json, BENCH_r15_c8.json) whose names
do not match the round regex; `.group(1)` on the None match raised
AttributeError, the exception was swallowed at the archive-write
try/except, and the driver's per-round archive was silently never
written — destroying PERF_r15's per-query and scaling comparison.
"""

import importlib.util
import os
import sys


def _load_bench():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(here, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    # bench.py imports olympia_spark at module level — repo root is
    # already on sys.path via conftest, so this import is cheap (no
    # Spark session is created at import time)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_round_derivation_survives_suffixed_archives(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    # the exact r15 file set that crashed the derivation
    for name in ("BENCH_r14.json", "BENCH_r15.json",
                 "BENCH_r15_runs.json", "BENCH_r15_c8.json",
                 "BENCH_SUMMARY_r15.json"):
        (tmp_path / name).write_text("{}")
    assert bench.derive_archive_round(str(tmp_path)) == 16


def test_round_derivation_rerun_within_round(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    # driver wrote BENCH_r16.json but no summary archive exists yet for
    # r16 → this run is a re-run within round 16, not round 17
    for name in ("BENCH_r15.json", "BENCH_SUMMARY_r15.json",
                 "BENCH_r16.json", "BENCH_r16_runs.json"):
        (tmp_path / name).write_text("{}")
    assert bench.derive_archive_round(str(tmp_path)) == 16


def test_round_derivation_env_override(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "42")
    (tmp_path / "BENCH_r15_runs.json").write_text("{}")
    assert bench.derive_archive_round(str(tmp_path)) == 42


def test_round_derivation_empty_dir(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    assert bench.derive_archive_round(str(tmp_path)) == 1
