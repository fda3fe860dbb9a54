#!/usr/bin/env python
"""Full-registry Spark-vs-DuckDB parity at the DRIVER's scale factor.

VERDICT r5 item 2: 13 late-round registry queries had no driver
CORRECTNESS row.  Until the driver's own check runs, this script commits a
locally-generated equivalent at the driver's sf0.01 (the pytest harness
runs sf0.001): every oracle-bearing queries() entry compared on rows,
schema and order-insensitive values, plus a row-count record for the
NO_ORACLE twins.  Writes CORRECTNESS_r06_local_sf0.01.json.

Usage: python scripts/full_registry_parity.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from cfht2caom2_spark.plans.driver_queries import (NO_ORACLE_QUERIES,
                                                       ORACLES, QUERIES)
    from cfht2caom2_spark.session import get_spark
    from tests.oracle_harness import compare, duck_con

    spark = get_spark(app_name="full_registry_parity", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(SF)
    out: dict[str, dict] = {}
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, SF)
            problems = compare(name, df, ORACLES[name], con)
            out[name] = {"parity": problems == [],
                         "problems": problems,
                         "rows": df.count()}
        except Exception as exc:           # pragma: no cover
            out[name] = {"parity": False, "problems": [repr(exc)[:500]]}
        print(name, "OK" if out[name]["parity"] else out[name]["problems"])
    for name in sorted(NO_ORACLE_QUERIES):
        try:
            n = NO_ORACLE_QUERIES[name](spark, SF).count()
            out[name] = {"parity": None, "rows": n,
                         "note": "NO_ORACLE twin; pinned by pytest "
                                 "equality against its oracle-mode sibling"}
        except Exception as exc:           # pragma: no cover
            out[name] = {"parity": False, "problems": [repr(exc)[:500]]}
        print(name, out[name].get("rows", out[name].get("problems")))
    ok = all(v["parity"] is not False for v in out.values())
    sf_tag = os.path.basename(SF.rstrip("/"))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"CORRECTNESS_r06_local_{sf_tag}.json")
    with open(path, "w") as fh:
        json.dump({"sf": SF, "all_green": ok, "queries": out}, fh, indent=1)
    print("wrote", path, "all_green:", ok)
    spark.stop()


if __name__ == "__main__":
    main()
