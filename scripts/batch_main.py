"""spark-submit main for the batch quality-filter job.

The package arrives via --py-files (north_rule launch shape); this main only
parses args and delegates to the same run_batch every other mode uses.
"""
import argparse
import json

from pyspark.sql import SparkSession

from cfht2caom2_spark.plans.pipeline import run_batch

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--snapshot-id", type=int, default=0)
    args = p.parse_args()
    spark = SparkSession.builder.appName("cfht2caom2_spark-batch").getOrCreate()
    pages = spark.read.parquet(args.pages)
    if "p_day" in pages.columns:
        pages = pages.drop("p_day")
    print(json.dumps(run_batch(spark, pages, args.out,
                               snapshot_id=args.snapshot_id)))
    spark.stop()
