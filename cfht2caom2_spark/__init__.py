"""cfht2caom2_spark — a PySpark-native web-text quality-filter engine.

A from-scratch rebuild, on Spark, of the query/data-processing capabilities of
``opencadc-metadata-curation/cfht2caom2`` (reference at /root/reference, studied
structurally in SURVEY.md).  The reference is a per-file
extract -> classify -> map -> repair -> emit pipeline with golden-output
testing; this package recasts that discipline as a columnar DataFrame job over
Common-Crawl-style page tables:

    read pages -> structural filter -> HTML->text extraction (Arrow batches)
    -> identity/heuristic columns (built-in exprs) -> language ID (pandas UDF)
    -> perplexity (pandas UDF) -> PII/toxicity scrub (regexp chains)
    -> near-dup removal (MinHash/LSH) -> keep/drop decision + lineage.

Design rules (see SURVEY.md §7):
  * DataFrame / built-in ``pyspark.sql.functions`` everywhere; pandas UDFs
    (Arrow-vectorized) only for model scoring and byte-level extraction;
    never row-at-a-time Python.
  * All thresholds live in a versioned :class:`~cfht2caom2_spark.config.RuleProfile`
    broadcast to executors — the analogue of the reference's cache.yml +
    per-instrument factory dispatch (reference instruments.py:3578-3655).
  * Errors never fail tasks: bad input rows get drop-rules, mirroring the
    reference's rejected.record discipline (reference instruments.py:859-863).
"""

__version__ = "0.1.0"
