"""Property-based tests (hypothesis) for the pure kernels.

The reference has no property testing (SURVEY §5); these harden the total-
function contract the engine relies on: kernels NEVER raise on arbitrary
input, and are deterministic — a task retry must reproduce bytes exactly.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cfht2caom2_spark.functions.extraction import extract_html, sha256_text
from cfht2caom2_spark.functions.fused import minhash_sig_py
from cfht2caom2_spark.functions.langid import TrigramLangID
from cfht2caom2_spark.functions.perplexity import BigramLM
from cfht2caom2_spark.operators.dedup import _perm_params

_LID = TrigramLangID()
_LM = BigramLM()
_PERMS = _perm_params(16)
_A = np.array([a for a, _ in _PERMS], dtype=np.int64)
_B = np.array([b for _, b in _PERMS], dtype=np.int64)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_html_total_and_deterministic(payload):
    a = extract_html(payload)
    b = extract_html(payload)
    assert a == b
    if a is not None:
        assert a == a.strip()
        assert "  " not in a.replace("\n", "|")  # no space runs survive


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2048))
def test_langid_total(text):
    lang, conf = _LID.predict_one(text)
    assert lang in set(_LID.langs) | {"und"}
    assert 0.0 <= conf <= 1.0


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2048),
       st.sampled_from(["en", "fr", "de", "es", "zh", "xx", None]))
def test_perplexity_total(text, lang):
    ppl = _LM.perplexity_one(text, lang)
    assert ppl > 0  # inf allowed for empty


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from("the quick brown fox alpha beta gamma".split()),
                min_size=0, max_size=60))
def test_minhash_sig_matches_naive(words):
    """numpy path == naive per-permutation python reimplementation."""
    import zlib

    text = " ".join(words)
    got = minhash_sig_py(text, _A, _B, 3)
    toks = text.lower().split()
    if not toks:
        assert got is None
        return
    if len(toks) >= 3:
        sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
    else:
        sh = {" ".join(toks)}
    hs = [zlib.crc32(s.encode()) % 2_147_483_647 for s in sh]
    want = [min((a * h + b) % 2_147_483_647 for h in hs) for a, b in _PERMS]
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=1024))
def test_sha256_stability(text):
    assert sha256_text(text) == sha256_text(text)


# --- repeated spans vs an independent python reference ----------------------

def _ref_repeated_spans(docs, k, min_count):
    """Pure-python ExactSubstr summary: window-count vote + interval merge
    (independent re-derivation, not a port of the Spark fold)."""
    counts: dict[str, int] = {}
    per_doc = {}
    for did, text in docs:
        toks = (text or "").lower().split()
        ws = ([" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
              if len(toks) >= k else [])
        per_doc[did] = (toks, ws)
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    out = {}
    for did, (toks, ws) in per_doc.items():
        spans: list[list[int]] = []
        for p in (i for i, w in enumerate(ws) if counts[w] >= min_count):
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            else:
                spans.append([p, p + k - 1])
        dup = sum(e - s + 1 for s, e in spans)
        out[did] = (len(toks), len(spans), dup)
    return out


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_repeated_spans_matches_python_reference(spark, data):
    """Random tiny corpora (repetition-prone 4-word alphabet) through BOTH
    window builders (k=3 cascade / k=13 flat) must match the independent
    python reference exactly — marks, merge rule, counts."""
    from cfht2caom2_spark.operators.spans import repeated_spans

    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    doc = st.lists(word, min_size=0, max_size=30).map(" ".join)
    docs = [(i, data.draw(doc)) for i in range(data.draw(st.integers(2, 5)))]
    k = data.draw(st.sampled_from([3, 13]))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_token_count"])
           for r in repeated_spans(df, k=k, min_count=2).collect()}
    assert got == _ref_repeated_spans(docs, k, 2)


def _ref_ladder(toks: list[str], n: int) -> tuple[float, float]:
    """Independent python model of (top_ngram_char_frac,
    dup_ngram_char_frac): counts via dict, coverage via position set."""
    tchars = sum(len(t) for t in toks)
    grams = ([" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
             if len(toks) >= n else [])
    if not grams or not tchars:
        return 0.0, 0.0
    counts: dict[str, int] = {}
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    # max (count, token-chars), lexicographically-smallest gram on full tie
    best = min(sorted(counts.items()),
               key=lambda kv: (-kv[1], -(len(kv[0]) - (n - 1))))
    top = best[1] * (len(best[0]) - (n - 1)) / tchars
    covered: set[int] = set()
    for i, g in enumerate(grams):
        if counts[g] > 1:
            covered.update(range(i, i + n))
    dup = sum(len(toks[j]) for j in covered) / tchars
    return top, dup


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_repetition_ladder_matches_python_reference(spark, data):
    """Random repetition-prone token streams: the one-fold Spark exprs for
    the Gopher ladder must equal the independent python model bit-for-bit
    (integer numerators/denominators, one final division on both sides)."""
    from pyspark.sql import functions as F

    from cfht2caom2_spark.functions import quality as Q

    word = st.sampled_from(["aa", "bbb", "c", "dd"])
    doc = st.lists(word, min_size=0, max_size=40).map(" ".join)
    docs = [(i, data.draw(doc)) for i in range(data.draw(st.integers(2, 4)))]
    n = data.draw(st.sampled_from([2, 3, 5, 7]))
    df = spark.createDataFrame(docs, "doc_id bigint, text string") \
        .withColumn("_toks", Q.tokens(F.col("text")))
    got = {r["doc_id"]: (r["top"], r["dup"]) for r in df.select(
        "doc_id",
        Q.top_ngram_char_frac(F.col("_toks"), n).alias("top"),
        Q.dup_ngram_char_frac(F.col("_toks"), n).alias("dup"),
    ).collect()}
    want = {i: _ref_ladder(t.split(), n) for i, t in docs}
    assert got == want


def test_split_assign_matches_python_md5_model(spark):
    """The split label is a pure function of (id, seed) with md5 semantics —
    pinned against an independent python computation so the contract can't
    drift toward whatever the engines happen to agree on."""
    import hashlib

    from cfht2caom2_spark.operators.sampling import BUCKETS, split_assign

    fracs = {"train": 0.8, "val": 0.1, "test": 0.1}
    seed = 11
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["split"]
           for r in split_assign(df, "doc_id", fracs, seed=seed).collect()}

    def py_split(doc_id):
        h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()
        b = int(h[:15], 16) % BUCKETS
        cum = 0
        for name, f in fracs.items():
            cum += int(round(f * BUCKETS))
            if b < cum:
                return name
        return "test"

    assert got == {i: py_split(i) for i in range(300)}


def test_cluster_sample_invariant_under_repartitioning(spark):
    """The cluster-balanced keep-set is a pure function of the data — the
    same rows survive at any partitioning (the cluster-size-independence
    contract every deterministic sampler in this repo carries)."""
    from cfht2caom2_spark.operators.kmeans import (cluster_balanced_sample,
                                                   train_centroids)

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.normal(5.0 * (i % 4), 0.4, 4)])
            for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = train_centroids(df, k=4, n_iter=3, seed=0)
    a = {(r["vec_id"], r["cell"]) for r in
         cluster_balanced_sample(df.repartition(2), cents, 10).collect()}
    b = {(r["vec_id"], r["cell"]) for r in
         cluster_balanced_sample(df.repartition(13), cents, 10).collect()}
    assert a == b and a
