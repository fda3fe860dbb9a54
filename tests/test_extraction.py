"""Extraction unit tests — the byte-identical contract (north_rule).

Mirrors the reference's identity-parsing unit tests
(/root/reference/cfht2caom2/tests/test_storage_name.py:76,288): pure-function
behavior pinned without a cluster.
"""

from __future__ import annotations

from cfht2caom2_spark.functions.extraction import (detect_encoding,
                                                   extract_html, sha256_text)


def test_strips_tags_and_blocks():
    html = (b"<html><head><title>t</title><style>x{}</style>"
            b"<script>var a=1;</script></head>"
            b"<body><p>hello <b>world</b></p><div>bye</div></body></html>")
    assert extract_html(html) == "hello world\nbye"


def test_entities_unescaped():
    assert extract_html(b"<p>a &amp; b &mdash; c</p>") == "a & b — c"


def test_comments_removed():
    assert extract_html(b"<p>keep</p><!-- drop this -->") == "keep"


def test_charset_sniff_latin1():
    payload = ('<html><head><meta charset="latin-1"></head>'
               "<body><p>caf\xe9</p></body></html>").encode("latin-1")
    assert detect_encoding(payload) == "latin-1"
    assert extract_html(payload) == "café"


def test_utf8_default():
    payload = "<p>héllo</p>".encode("utf-8")
    assert extract_html(payload) == "héllo"


def test_binary_junk_returns_none():
    junk = bytes(range(128, 256)) * 3
    assert extract_html(junk) is None


def test_empty_payload_returns_none():
    assert extract_html(b"") is None
    assert extract_html(None) is None


def test_whitespace_normalization():
    assert extract_html(b"<p>a   b\t c</p>\n\n\n<p>d</p>") == "a b c\nd"


def test_deterministic_hash():
    h1 = sha256_text(extract_html(b"<p>stable</p>"))
    h2 = sha256_text(extract_html(b"<p>stable</p>"))
    assert h1 == h2 and len(h1) == 64


def test_langid_regression_latin_not_zh():
    """Regression: the per-corpus floor degeneracy classified all Latin text
    as zh (smallest corpus won on unseen-gram floors)."""
    from cfht2caom2_spark.functions.langid import TrigramLangID

    lid = TrigramLangID()
    lang, conf = lid.predict_one(
        "the people of the town gather at the market every morning")
    assert lang == "en" and conf > 0.5
    for text, want in [
        ("les gens de la ville se réunissent au marché chaque matin", "fr"),
        ("die menschen der stadt treffen sich jeden morgen auf dem markt", "de"),
        ("la gente de la ciudad se reúne en el mercado cada mañana", "es"),
        ("镇上的人们每天早晨聚集在市场买面包和水果", "zh"),
    ]:
        assert lid.predict_one(text)[0] == want, text


def test_langid_gibberish_low_confidence():
    from cfht2caom2_spark.functions.langid import TrigramLangID

    lid = TrigramLangID()
    _, conf = lid.predict_one("xq zvv kjw qqp zzx mnvb wklq jjx " * 10)
    assert conf < 0.3


def test_perplexity_orders_clean_vs_gibberish():
    from cfht2caom2_spark.functions.perplexity import BigramLM

    lm = BigramLM()
    clean = lm.perplexity_one("the quick brown fox jumps over the lazy dog", "en")
    junk = lm.perplexity_one("xq zvv kjw qqp zzx mnvb wklq jjx", "en")
    assert clean < 20 < junk


def test_batch_kernels_match_scalar_reference():
    """predict_batch / perplexity_batch must reproduce the scalar reference
    kernels: language exact, conf/ppl within float-reassociation tolerance.
    Batch-of-1 must equal batch-of-N BIT-exactly (every production caller —
    fused stage, pandas UDFs, reference labeler — goes through the batch
    path, so goldens cannot drift between batch shapes)."""
    import math

    from cfht2caom2_spark.functions.langid import TrigramLangID
    from cfht2caom2_spark.functions.perplexity import BigramLM

    texts = [
        None, "", " ", "ab", "你好世界" * 50,
        "the people of the town gather at the market every morning",
        "les gens de la ville se réunissent au marché chaque matin",
        "die menschen der stadt treffen sich jeden morgen auf dem markt",
        "la gente de la ciudad se reúne en el mercado cada mañana",
        "镇上的人们每天早晨聚集在市场买面包和水果",
        "xq zvv kjw qqp zzx mnvb wklq jjx " * 10,
        "\U0001F600 emoji and non-BMP \U0001D11E here",
        "短文 with mixed 中文 and english words here",
        "the quick brown fox jumps over the lazy dog " * 40,  # > SAMPLE_CHARS
    ]
    lid, lm = TrigramLangID(), BigramLM()
    langs, confs = lid.predict_batch(texts)
    ppls = lm.perplexity_batch(texts, langs)
    for i, t in enumerate(texts):
        sl, sc = lid.predict_one_scalar(t)
        assert sl == langs[i], (i, t, sl, langs[i])
        assert math.isclose(sc, confs[i], rel_tol=1e-9, abs_tol=1e-12), (i, t)
        sp = lm.perplexity_one_scalar(t, langs[i])
        assert (math.isinf(sp) and math.isinf(ppls[i])) or math.isclose(
            sp, ppls[i], rel_tol=1e-9), (i, t, sp, ppls[i])
        # bit-exact across batch shapes
        l1, c1 = lid.predict_batch([t])
        assert l1[0] == langs[i] and c1[0] == confs[i], (i, t)
        p1 = lm.perplexity_batch([t], [langs[i]])[0]
        assert p1 == ppls[i] or (math.isinf(p1) and math.isinf(ppls[i])), (i, t)
