#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4 noop-sink isolation).

NOT part of the driver contract — bench.py stays the frozen measurement
surface.  This harness times individual registry queries in isolation with
the noop sink, optionally repeats them, and can dump .explain("formatted")
plans for the plans/r06/ evidence files.

Usage:
    python bench_extra.py time q_semantic_keep_one [q_... ...] \
        [--sf /root/testdata/sf1.0] [--repeats 3]
    python bench_extra.py plan q_semantic_keep_one --out plans/r06/q_semantic_keep_one_before.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _cpu_stat() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        v = [int(x) for x in fh.readline().split()[1:]]
    idle = v[3] + v[4]
    return sum(v) - idle, v[7] if len(v) > 7 else 0


def _spark():
    from cfht2caom2_spark.session import get_spark
    spark = get_spark(app_name="bench_extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _queries():
    from cfht2caom2_spark.plans.driver_queries import (NO_ORACLE_QUERIES,
                                                       QUERIES)
    return {**QUERIES, **NO_ORACLE_QUERIES}


def cmd_time(names: list[str], sf: str, repeats: int, warm: bool) -> None:
    spark = _spark()
    qs = _queries()
    if warm:
        qs["q_text_stats"](spark, sf).write.format("noop").mode(
            "overwrite").save()
    out: dict[str, list[float]] = {}
    busy0, steal0 = _cpu_stat()
    for name in names:
        out[name] = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            out[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    busy1, steal1 = _cpu_stat()
    steal_pct = round(
        100 * (steal1 - steal0) / max(busy1 - busy0 + steal1 - steal0, 1), 2)
    print(json.dumps({"sf": sf, "repeats": repeats, "timings": out,
                      "min": {k: min(v) for k, v in out.items()},
                      "host_steal_pct": steal_pct}))
    spark.stop()


def cmd_plan(name: str, sf: str, out_path: str | None) -> None:
    spark = _spark()
    df = _queries()[name](spark, sf)
    text = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as fh:
            fh.write(text)
        print(f"wrote {out_path} ({len(text)} bytes)")
    else:
        print(text)
    spark.stop()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["time", "plan"])
    p.add_argument("names", nargs="+")
    p.add_argument("--sf", default=SF_DIR)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--no-warm", action="store_true")
    p.add_argument("--out", default=None)
    a = p.parse_args()
    if a.mode == "time":
        cmd_time(a.names, a.sf, a.repeats, not a.no_warm)
    else:
        cmd_plan(a.names[0], a.sf, a.out)
