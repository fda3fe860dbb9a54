"""BPE trainer/encoder (functions/bpe.py).

Pins: the paper's worked example, the greedy-by-rank encoder's equivalence
with replaying merges in learned order, lossless round trip, the Arrow
batch path's equality with the driver-side encoder over a full table, and
training determinism.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cfht2caom2_spark.functions.bpe import (END_OF_WORD, encode_text,
                                            encode_word, learn_merges,
                                            merges_from_json, merges_to_json,
                                            train_bpe, with_bpe_tokens)

SENNRICH_VOCAB = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_merges_worked_example():
    # pair counts round 1: (e,s)=9 (s,t)=9 (t,</w>)=9 -> lexicographic min
    merges = learn_merges(SENNRICH_VOCAB, 5)
    assert merges == [("e", "s"), ("es", "t"), ("est", END_OF_WORD),
                      ("l", "o"), ("lo", "w")]


def test_learn_merges_stops_when_no_pair_repeats():
    merges = learn_merges([("ab", 1), ("cd", 1)], 100)
    assert merges == []  # every pair occurs once; nothing worth merging


def _replay_reference(word: str, merges):
    """Independent encoder: apply each merge over the symbol sequence in
    learned order (the paper's definition), no rank shortcuts."""
    sym = list(word) + [END_OF_WORD]
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_encoder_equals_merge_replay_reference():
    rng = random.Random(7)
    words = ["".join(rng.choice("abcde") for _ in range(rng.randint(1, 12)))
             for _ in range(300)]
    merges = learn_merges([(w, 1 + i % 5) for i, w in enumerate(words)], 40)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in words:
        assert encode_word(w, ranks) == _replay_reference(w, merges), w


def test_encode_round_trip_lossless():
    merges = learn_merges(SENNRICH_VOCAB, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in SENNRICH_VOCAB:
        toks = encode_word(w, ranks)
        assert "".join(toks).replace(END_OF_WORD, "") == w


def test_frequent_word_collapses_to_single_token():
    merges = learn_merges(SENNRICH_VOCAB, 100)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["newest" + END_OF_WORD]


def test_batch_encoding_matches_driver_reference(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe(docs, n_merges=40, vocab_top_k=500)
    assert len(merges) == 40
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in with_bpe_tokens(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for r in docs.collect():
        assert got[r["doc_id"]] == encode_text(r["text"], ranks)


def test_null_text_encodes_to_null(spark):
    df = spark.createDataFrame([(1, None), (2, "a b")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r["bpe_tokens"]
            for r in with_bpe_tokens(df, [("a", END_OF_WORD)]).collect()}
    assert rows[1] is None
    assert rows[2] == ["a" + END_OF_WORD, "b", END_OF_WORD]


def test_training_deterministic_and_json_round_trip(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = train_bpe(docs, n_merges=25, vocab_top_k=300)
    m2 = train_bpe(docs, n_merges=25, vocab_top_k=300)
    assert m1 == m2
    assert merges_from_json(merges_to_json(m1)) == m1


def test_q_bpe_tokens_matches_python_reference(spark):
    """The registry query's (n_tokens, md5) golden against the independent
    replay reference — the driver records rows-only for this entry, so the
    value check lives here."""
    import hashlib

    from cfht2caom2_spark.plans.driver_queries import (BPE_N_MERGES,
                                                       BPE_VOCAB_TOP_K,
                                                       q_bpe_tokens)

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["tokens_md5"])
           for r in q_bpe_tokens(spark, sf).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    merges = train_bpe(docs, n_merges=BPE_N_MERGES,
                       vocab_top_k=BPE_VOCAB_TOP_K)
    for r in docs.collect():
        toks = []
        for w in r["text"].lower().split():
            toks.extend(_replay_reference(w, merges))
        want = (len(toks),
                hashlib.md5("".join(toks).encode()).hexdigest())
        assert got[r["doc_id"]] == want
