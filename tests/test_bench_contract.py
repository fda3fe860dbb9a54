"""Driver-contract tests for bench.py's stdout line.

The per-round driver captures only a ~2,000-char tail of bench stdout and
parses the LAST JSON line into BENCH_r{N}.json.  Rounds 2-4 lost their
record because embedded scaling-evidence blobs pushed the line past the
tail.  These tests pin the contract: the printed record for the FULL
checked-in registry stays under the budget with per-query timings intact,
and the evidence blobs never ride stdout.
"""

from __future__ import annotations

import importlib.util
import json
import os

_BENCH_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")
_spec = importlib.util.spec_from_file_location("bench_mod", _BENCH_PATH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _full_result() -> dict:
    # worst-case realistic timings: 999.999 s/query (a 68-query suite
    # averaging >=1000 s/query is an 18-hour bench run — no driver round
    # completes that, so 3-digit seconds bounds any line the driver can
    # actually capture; rounding carries it to the 6-char "1000.0")
    timings = {name: 999.999 for name in bench.BENCH_QUERIES}
    return {
        "metric": "bench_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": "/root/testdata/sf0.1",
        "cpus": 32,
        "host_steal_pct": 99.99,
        "flagship_docs_per_sec": 99999.9,
        "last_measured_scaling": {"blob": "x" * 1500},
        "last_measured_exec_scaling": {"blob": "y" * 1500},
    }


def test_stdout_line_fits_driver_tail_with_queries():
    line = bench.compact_stdout_line(_full_result())
    assert len(line) <= bench._STDOUT_BUDGET, (
        f"stdout bench line is {len(line)}B > {bench._STDOUT_BUDGET}B budget"
        " — the driver's tail capture would truncate it (BENCH_r{N}.json"
        " parsed=null, the rounds-2-4 failure); trim the record or shrink"
        " the registry's stdout footprint")
    parsed = json.loads(line)
    # per-query timings must survive compaction for the checked-in registry
    # (1-decimal on stdout; .bench_last.json keeps full precision)
    assert parsed["queries"] == {n: 1000.0 for n in bench.BENCH_QUERIES}
    assert "last_measured_scaling" not in parsed
    assert "last_measured_exec_scaling" not in parsed


def test_stdout_guard_sheds_queries_rather_than_overflow():
    result = _full_result()
    # a pathological registry 10x today's size must still print parseable
    result["queries"] = {f"q_pathologically_long_query_name_{i:04d}": 1.0
                         for i in range(500)}
    line = bench.compact_stdout_line(result)
    assert len(line) <= bench._STDOUT_BUDGET
    assert json.loads(line)["queries_in"] == ".bench_last.json"


def test_bench_registry_queries_exist():
    from cfht2caom2_spark.plans.driver_queries import (NO_ORACLE_QUERIES,
                                                       QUERIES)
    known = set(QUERIES) | set(NO_ORACLE_QUERIES)
    missing = [n for n in bench.BENCH_QUERIES if n not in known]
    assert not missing, f"BENCH_QUERIES not in registry: {missing}"
