"""Fused extraction + model-scoring stage — one Arrow crossing.

Reference analogue: single-visit fusion — when STORE/INGEST/MODIFY co-occur,
the reference replaces the multi-executor list with ONE fused executor so the
file bytes and headers are read exactly once (composable.py:90-98 decision,
cfht_name.py:830-903 executor choice).  Here: extraction, language-ID and
perplexity all need the payload on the Python side, so shipping the batch
across the Arrow boundary three times (mapInPandas + two pandas UDFs) pays
3x serialization.  This stage does all three in one ``mapInPandas`` pass:

    payload bytes -> extracted_text, extracted_sha256,
                     lang_pred, lang_conf, ppl

The per-stage modules (extraction/langid/perplexity) remain the unit-tested
source of truth; this stage composes their pure kernels unchanged, so fused
and unfused paths are result-identical (asserted in tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .extraction import extract_html, sha256_text
from .langid import TrigramLangID
from .perplexity import BigramLM

_OUT_FIELDS = [
    T.StructField("extracted_text", T.StringType()),
    T.StructField("extracted_sha256", T.StringType()),
    T.StructField("lang_pred", T.StringType()),
    T.StructField("lang_conf", T.DoubleType()),
    T.StructField("ppl", T.DoubleType()),
]


def with_extract_and_scores(df: DataFrame, spark: SparkSession,
                            langid_model: TrigramLangID | None = None,
                            ppl_model: BigramLM | None = None,
                            html_col: str = "html", text_col: str = "text",
                            has_html: bool = True) -> DataFrame:
    """Append extraction + all model scores in a single Arrow pass."""
    bc = spark.sparkContext.broadcast(
        (langid_model or TrigramLangID(), ppl_model or BigramLM())
    )
    schema = T.StructType(list(df.schema.fields) + _OUT_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lid, lm = bc.value  # one deserialize per task
        for pdf in batches:
            if has_html:
                texts = [
                    extract_html(h) if h is not None and len(h) > 0 else t
                    for h, t in zip(pdf[html_col], pdf[text_col])
                ]
            else:
                texts = [t for t in pdf[text_col]]
            langs, confs, ppls = [], [], []
            for t in texts:
                lang, conf = lid.predict_one(t)
                langs.append(lang)
                confs.append(conf)
                ppls.append(lm.perplexity_one(t, lang))
            out = pdf.copy()
            out["extracted_text"] = pd.Series(texts, index=pdf.index, dtype=object)
            out["extracted_sha256"] = out["extracted_text"].map(
                sha256_text, na_action="ignore")
            out["lang_pred"] = langs
            out["lang_conf"] = pd.Series(confs, index=pdf.index, dtype="float64")
            out["ppl"] = pd.Series(ppls, index=pdf.index, dtype="float64")
            yield out

    return df.mapInPandas(run, schema=schema)
