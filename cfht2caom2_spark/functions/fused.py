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

from ..operators.dedup import MERSENNE_31, _perm_params
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

_SIG_FIELD = T.StructField("minhash_sig", T.ArrayType(T.LongType()))


def minhash_sig_py(text: str | None, A, B, k: int = 3):
    """numpy-vectorized MinHash of word k-shingles — semantics identical to
    operators.dedup.minhash_signature with shingle_hash_fast (crc32 base
    hash), pinned by tests.  Runs here because Spark's higher-order array
    functions are interpreted, not codegen'd: a JVM-side fold costs ~2 ms/doc
    and dominates the whole pipeline, while one (n_shingles x n_perms) numpy
    broadcast is ~30 us."""
    import re
    from zlib import crc32

    import numpy as np

    if not text:
        return None
    # split on the JVM's \s class (ASCII whitespace ONLY) — str.split()
    # splits on Unicode whitespace too, so e.g. the U+00A0 that extract_html
    # emits for &nbsp; would tokenize differently fused vs unfused
    toks = [t for t in re.split(r"[ \t\n\x0b\f\r]+", text.lower()) if t]
    # whitespace-only text: single empty shingle — IDENTICAL to the JVM path
    # (word_shingles yields [array_join([], ' ')] = ['']); returning None here
    # would silently exclude such rows from dedup on the fused path only
    if len(toks) >= k:
        # hot loop: encode each token ONCE (not once per shingle it appears
        # in), skip shingle dedup (duplicates cannot change a min), and keep
        # the MERSENNE mod out of python — utf-8 is byte-compositional, so
        # crc32(b"a b c") == crc32 of the joined-string encoding exactly
        enc = [t.encode("utf-8") for t in toks]
        n = len(toks) - k + 1
        sp = b" "
        h = np.fromiter(
            (crc32(sp.join(w)) for w in zip(*[enc[j:] for j in range(k)])),
            dtype=np.int64, count=n)
    else:
        h = np.array([crc32(" ".join(toks).encode("utf-8"))], dtype=np.int64)
    h %= MERSENNE_31
    sig = (h[:, None] * A + B) % MERSENNE_31
    return sig.min(axis=0).tolist()


def with_extract_and_scores(df: DataFrame, spark: SparkSession,
                            langid_model: TrigramLangID | None = None,
                            ppl_model: BigramLM | None = None,
                            html_col: str = "html", text_col: str = "text",
                            has_html: bool = True,
                            minhash_perms: int = 0,
                            shingle_k: int = 3) -> DataFrame:
    """Append extraction + all model scores (+ optional MinHash signature)
    in a single Arrow pass."""
    bc = spark.sparkContext.broadcast(
        (langid_model or TrigramLangID(), ppl_model or BigramLM())
    )
    # payload columns cross INTO Python (extraction needs the bytes) but are
    # consumed there — returning them would ship every page body back across
    # Arrow a second time for a downstream .drop(); exclude them from the
    # output schema instead (halves UDF serialization traffic)
    consumed = {html_col, text_col}
    kept_fields = [f for f in df.schema.fields if f.name not in consumed]
    fields = kept_fields + _OUT_FIELDS
    if minhash_perms:
        import numpy as np

        perms = _perm_params(minhash_perms)
        A = np.array([a for a, _ in perms], dtype=np.int64)
        B = np.array([b for _, b in perms], dtype=np.int64)
        fields = fields + [_SIG_FIELD]
    schema = T.StructType(fields)

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
            # whole-batch model scoring: one np.unique + segment-reduceat per
            # Arrow batch instead of ~135 us/doc of per-doc numpy fixed cost
            langs, confs = lid.predict_batch(texts)
            ppls = lm.perplexity_batch(texts, langs)
            out = pdf.drop(columns=[c for c in (html_col, text_col)
                                    if c in pdf.columns])
            out["extracted_text"] = pd.Series(texts, index=pdf.index, dtype=object)
            out["extracted_sha256"] = out["extracted_text"].map(
                sha256_text, na_action="ignore")
            out["lang_pred"] = langs
            out["lang_conf"] = pd.Series(confs, index=pdf.index, dtype="float64")
            out["ppl"] = pd.Series(ppls, index=pdf.index, dtype="float64")
            if minhash_perms:
                out["minhash_sig"] = pd.Series(
                    [minhash_sig_py(t, A, B, shingle_k) for t in texts],
                    index=pdf.index, dtype=object)
            yield out

    return df.mapInPandas(run, schema=schema)
