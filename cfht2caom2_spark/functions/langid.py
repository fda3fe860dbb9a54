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
    SAMPLE_CHARS = 600  # classification saturates well below this

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
        # one preassembled (G+1 x L) score matrix; grams map to row indices
        # (UTF-16 code units packed into int64), last row = unseen floor —
        # scoring is then counts @ M[idx], no per-gram array work
        import numpy as np

        all_grams = sorted(set().union(*[set(m) for m in self.logprob.values()]))
        self.rowmap: dict[int, int] = {
            (ord(g[0]) << 32) | (ord(g[1]) << 16) | ord(g[2]): i
            for i, g in enumerate(all_grams)
        }
        rows = [[self.logprob[l].get(g, self.floor[l]) for l in self.langs]
                for g in all_grams]
        rows.append([self.floor[l] for l in self.langs])
        self.score_matrix = np.array(rows, dtype=np.float64)
        self.floor_row = len(all_grams)
        # sorted-id + row-permutation arrays: gram-id -> row resolves with one
        # np.searchsorted instead of a python dict.get per unique gram (the
        # dict path profiled at ~40% of predict_one)
        ids = np.fromiter(self.rowmap.keys(), dtype=np.int64, count=len(self.rowmap))
        order = np.argsort(ids)
        self._sorted_ids = ids[order]
        self._sorted_rows = np.fromiter(
            self.rowmap.values(), dtype=np.int64, count=len(self.rowmap))[order]
        # the python dicts are construction scaffolding only — scoring reads
        # the arrays; dropping them halves what the broadcast ships to every
        # executor and what each task deserializes
        del self.rowmap, self.logprob

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
        # vectorized: UTF-16 code units -> int64 trigram ids -> np.unique ->
        # one lookup per UNIQUE gram, counts (x) score-matrix product
        import numpy as np

        codes = np.frombuffer(norm.encode("utf-16-le"), dtype=np.uint16) \
            .astype(np.int64)
        ids = (codes[:-2] << 32) | (codes[1:-1] << 16) | codes[2:]
        uniq, counts = np.unique(ids, return_counts=True)
        # vectorized id->row: searchsorted into the sorted gram-id array,
        # misses fall to the floor row (exactly rowmap.get(u, floor_row))
        pos = np.searchsorted(self._sorted_ids, uniq)
        pos[pos >= len(self._sorted_ids)] = 0
        hit = self._sorted_ids[pos] == uniq
        idx = np.where(hit, self._sorted_rows[pos], self.floor_row)
        acc = counts @ self.score_matrix[idx]
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
