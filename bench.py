#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode (north_rule evidence): run the SAME flagship pipeline job
on the SAME synthetic pages input at local[8] and local[32] (fresh JVM each,
via subprocess), report docs/sec at both and the scaling efficiency
``(thr_32 / thr_8) / 4``, and append the table to BASELINE.md.

Results are materialized with the noop sink so the full plan executes without
collect() driver pressure.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "q_text_stats", "q_quality_decision", "q_token_count", "q_fingerprint",
    "q_scrub_pii", "q_dedup_exact", "q_dedup_first_wins", "q_minhash_pairs",
    "q_simhash", "q_cosine_topk", "q_ann_lsh", "q_pricing_report",
    "q_revenue_by_nation", "q_window_backfill", "q_anti_join_resume",
    "q_semi_join", "q_incremental_window", "q_topk_users",
    "q_merge_last_wins", "q_langid_heuristic", "q_pipeline_flagship",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_suite() -> None:
    from cfht2caom2_spark.plans.driver_queries import (NO_ORACLE_QUERIES,
                                                       QUERIES)
    from cfht2caom2_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    all_queries = {**QUERIES, **NO_ORACLE_QUERIES}

    # warm the JVM + python workers once so per-query numbers measure the
    # plan, not interpreter startup
    _materialize(all_queries["q_text_stats"](spark, SF_DIR))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _materialize(all_queries[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    total = round(sum(timings.values()), 3)
    flagship = timings.get("q_pipeline_flagship", float("nan"))
    print(json.dumps({
        "metric": "bench_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "flagship_docs_per_sec": round(n_docs / flagship, 1) if flagship else None,
    }))
    spark.stop()


# ---------------------------------------------------------------------------
# scaling mode
# ---------------------------------------------------------------------------

def _scaling_child(cores: int, pages_path: str) -> None:
    """Child process: run the flagship pipeline once at local[cores]."""
    from cfht2caom2_spark.plans.pipeline import build_pipeline
    from cfht2caom2_spark.session import get_spark

    spark = get_spark(app_name=f"scale{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    n = pages.count()
    # warm-up pass so JVM/JIT + python worker pool startup is excluded
    _materialize(build_pipeline(pages.limit(512), spark))
    t0 = time.time()
    _materialize(build_pipeline(pages, spark))
    dt = time.time() - t0
    print(json.dumps({"cores": cores, "rows": n, "sec": round(dt, 2),
                      "docs_per_sec": round(n / dt, 1)}))
    spark.stop()


def run_scaling(n_rows: int = 40_000) -> None:
    from cfht2caom2_spark.session import get_spark
    from cfht2caom2_spark.sources.pages import synth_pages

    import tempfile
    workdir = tempfile.mkdtemp(prefix="bench_scaling_")
    pages_path = f"{workdir}/pages.parquet"
    spark = get_spark(app_name="gen", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    synth_pages(spark, n_rows, partitions=64).write.parquet(pages_path)
    spark.stop()

    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cores), pages_path],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    thr8, thr32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = round((thr32 / thr8) / 4, 3)
    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "docs_per_sec_8": thr8,
        "docs_per_sec_32": thr32,
        "rows": n_rows,
    }
    print(json.dumps(summary))

    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE.md"), "a") as fh:
        fh.write(
            f"\n## Measured scaling evidence ({stamp})\n\n"
            f"Same flagship pipeline job, same {n_rows}-row synthetic pages "
            f"parquet, fresh JVM per run (subprocess), warm-up pass excluded:\n\n"
            f"| parallelism | docs/sec | seconds |\n|---|---|---|\n"
            f"| local[8]  | {thr8} | {results[8]['sec']} |\n"
            f"| local[32] | {thr32} | {results[32]['sec']} |\n\n"
            f"**Scaling efficiency (8 -> 32 cores) = (thr32/thr8)/4 = {eff}** "
            f"(gate: >= 0.8).\n"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling(int(sys.argv[2]) if len(sys.argv) > 2 else 40_000)
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        _scaling_child(int(sys.argv[2]), sys.argv[3])
    else:
        run_suite()
