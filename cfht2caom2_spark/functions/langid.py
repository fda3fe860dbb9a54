"""Language identification — broadcast n-gram model, Arrow-batched scoring.

Reference analogue: instrument detection with an honest fallback chain
(``get_instrument``, reference cfht_name.py:447-522): try strong evidence
first, degrade gracefully, NEVER raise — unsupported input yields a sentinel
(cfht_name.py:516-520).  Here: CJK-ratio shortcut -> character-trigram
naive-Bayes over the seed corpora -> ``und`` sentinel below the confidence
floor (the ``lang_conf`` drop-rule fires downstream, it is not an error).

Execution contract (north_rule "no per-row Python"): the model is trained once
on the driver, shipped via ``SparkContext.broadcast``, and applied with a
scalar-iterator ``pandas_udf`` — the model deserializes once per task, then
scores whole Arrow batches with vectorized pandas ops.  This is the Spark
idiom replacing fastText in environments where the binary model/library is
unavailable; the class is swappable for a fastText wrapper with the same
``predict_series`` signature.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..corpora import CORPORA

_RE_WS = re.compile(r"\s+")
_RE_CJK = re.compile("[一-鿿]")


def _normalize(text: str) -> str:
    return " " + _RE_WS.sub(" ", text.lower()).strip() + " "


class TrigramLangID:
    """Add-one-smoothed character-trigram naive Bayes.  Pure, picklable.

    The unseen-trigram penalty is a UNIFORM floor across languages: with
    per-corpus floors, the language with the smallest corpus gets the highest
    floor and wins by default on out-of-domain text (the degenerate case any
    honest small-model langid hits).  Scripts gate candidates first: a model
    whose script doesn't appear in the text can't win on floor ties.
    """

    UNSEEN_LOGPROB = -9.0
    SAMPLE_CHARS = 1200  # classification saturates well below this

    def __init__(self, corpora: dict[str, str] | None = None):
        corpora = corpora or CORPORA
        self.langs: list[str] = sorted(corpora)
        self.logprob: dict[str, dict[str, float]] = {}
        self.floor: dict[str, float] = {}
        for lang, corpus in corpora.items():
            text = _normalize(corpus)
            counts = Counter(text[i : i + 3] for i in range(len(text) - 2))
            total = sum(counts.values())
            vocab = len(counts) + 1
            self.logprob[lang] = {
                g: math.log((c + 1) / (total + vocab)) for g, c in counts.items()
            }
            self.floor[lang] = self.UNSEEN_LOGPROB
        # per-gram score tuple across all langs: ONE dict lookup per unique
        # gram at scoring time instead of len(langs) lookups per gram token
        all_grams = set().union(*[set(m) for m in self.logprob.values()])
        self.gram_scores: dict[str, tuple[float, ...]] = {
            g: tuple(self.logprob[l].get(g, self.floor[l]) for l in self.langs)
            for g in all_grams
        }
        self.floor_vec = tuple(self.floor[l] for l in self.langs)

    def predict_one(self, text: str | None) -> tuple[str, float]:
        if not text:
            return "und", 0.0
        # CJK shortcut — the strong-evidence-first branch
        n = min(len(text), self.SAMPLE_CHARS)
        sample = text[:n]
        cjk = len(_RE_CJK.findall(sample))
        if cjk / max(n, 1) > 0.30:
            return "zh", min(1.0, cjk / max(n, 1) + 0.5)
        norm = _normalize(sample)
        n_grams = len(norm) - 2
        if n_grams <= 0:
            return "und", 0.0
        # aggregate over UNIQUE grams with multiplicity: one lookup per
        # unique gram, all languages scored from the precomputed tuple
        acc = [0.0] * len(self.langs)
        gs = self.gram_scores
        fv = self.floor_vec
        for g, c in Counter(norm[i : i + 3] for i in range(n_grams)).items():
            vec = gs.get(g, fv)
            for k in range(len(acc)):
                acc[k] += c * vec[k]
        # script gating: zh competes only when CJK is actually present
        zh_ok = cjk / max(n, 1) > 0.05
        scores = {
            lang: acc[k] / n_grams
            for k, lang in enumerate(self.langs)
            if lang != "zh" or zh_ok
        }
        # deterministic argmax: score desc, lang asc
        best = min(scores, key=lambda l: (-scores[l], l))
        ordered = sorted(scores.values(), reverse=True)
        # margin-based confidence in (0,1]: softmax over per-gram avg logprob
        margin = ordered[0] - (ordered[1] if len(ordered) > 1 else ordered[0] - 1.0)
        conf = 1.0 - math.exp(-3.0 * margin)
        # absolute-fit floor: pure gibberish fits no model
        if ordered[0] < -7.5:
            conf = min(conf, 0.2)
        return best, max(0.0, min(1.0, conf))

    def predict_series(self, texts: pd.Series) -> pd.DataFrame:
        out = [self.predict_one(t) for t in texts]
        return pd.DataFrame(
            {"lang": [o[0] for o in out], "conf": [o[1] for o in out]},
            index=texts.index,
        )


def langid_udf(spark: SparkSession, model: TrigramLangID | None = None) -> Column:
    """Returns a scalar-iterator pandas UDF column factory over broadcast model."""
    bc = spark.sparkContext.broadcast(model or TrigramLangID())

    @pandas_udf("struct<lang:string, conf:double>")
    def _predict(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        m = bc.value  # deserialized once per task, reused across batches
        for texts in batches:
            yield m.predict_series(texts)

    return _predict


def with_langid(df, spark: SparkSession, text_col: str = "extracted_text",
                model: TrigramLangID | None = None):
    """Append lang_pred / lang_conf in one Arrow pass."""
    udf = langid_udf(spark, model)
    df = df.withColumn("_lid", udf(F.col(text_col)))
    return (
        df.withColumn("lang_pred", F.col("_lid.lang"))
        .withColumn("lang_conf", F.col("_lid.conf"))
        .drop("_lid")
    )
