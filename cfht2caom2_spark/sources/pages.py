"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Schema is exactly the input_hint: (url string, warc_ts timestamp, html binary,
text string, lang string).  Every row is a pure function of ``(row_id, seed)``
— independent of partitioning, executor count, and run — so goldens are stable
and the same table can be generated at any parallelism for the scaling bench.

Row classes (by ``row_id % 100``) mirror the reference's fixture census —
per-failure-mode calibration inputs (reference tests/data/single_plane/: 24
mega / 24 espadons / 16 sitelle / 13 spirou / 17 wircam headers, one expected
output each) plus multi-record groups (tests/test_multi_plane.py:85-116):

    00-54  clean keepable docs, language round-robin (en-weighted)
    55-58  too_short
    59-62  extreme mean word length (gibberish long words)
    63-66  high symbol-to-word ratio
    67-70  numeric/low-stopword (alpha_frac + stopword_frac violators)
    71-74  high repeated-line fraction
    75-78  high-perplexity gibberish (lang-ID fallback -> und)
    79-82  PII-bearing (keep, but scrubbed)
    83-85  toxicity-bearing
    86-88  near-duplicate cluster (3 members per century, MinHash fodder)
    89-90  exact re-arrival of rows 00/01 of the century (+2 days warc_ts)
    91-93  latin-1 encoded html with meta charset
    94-95  undecodable binary junk html (UNSUPPORTED analogue)
    96-97  boilerplate-heavy html (nav/script/style wrapping)
    98-99  empty payload (html empty, text null)

Host distribution is deliberately skewed: ~30% of urls land on one host
(``big.example.com``) to exercise salting (SURVEY.md §4 skew row).
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..corpora import CORPORA, words

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

_BASE_TS = datetime(2025, 6, 1, 0, 0, 0)
_LANG_ROTATION = ("en", "en", "fr", "de", "es", "zh")
_WORDS = {lang: words(lang) for lang in CORPORA}

_HTML_TEMPLATE = (
    "<html><head><title>{title}</title>"
    '<meta charset="utf-8"><style>body {{ color: #222; }}</style>'
    "<script>var x = 1; // tracking</script></head>"
    "<body><nav><ul><li>Home</li><li>About</li><li>Contact</li></ul></nav>"
    "<!-- boilerplate -->"
    "<div id=\"main\"><p>{body}</p></div>"
    "<footer>&copy; 2025 Example Corp &mdash; all rights reserved</footer>"
    "</body></html>"
)


def _sample_text(rng: random.Random, lang: str, n_tokens: int) -> str:
    pool = _WORDS[lang]
    toks = [pool[rng.randrange(len(pool))] for _ in range(n_tokens)]
    if lang == "zh":
        return "".join(toks)
    return " ".join(toks)


def _gibberish_word(rng: random.Random, lo: int, hi: int) -> str:
    n = rng.randrange(lo, hi)
    return "".join(chr(ord("a") + rng.randrange(26)) for _ in range(n))


def _clean_doc(rng: random.Random, lang: str) -> str:
    if lang == "zh":
        return _sample_text(rng, "zh", rng.randrange(150, 400))
    body = _sample_text(rng, lang, rng.randrange(80, 250))
    # split into a few paragraphs (distinct lines — repeated_line_frac stays low)
    toks = body.split(" ")
    lines, i = [], 0
    while i < len(toks):
        step = rng.randrange(12, 25)
        lines.append(" ".join(toks[i : i + step]))
        i += step
    return "\n".join(lines)


def gen_row(i: int, seed: int = 42) -> dict:
    """One deterministic page row.  Pure function of (i, seed)."""
    rng = random.Random((seed << 34) ^ (i * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFF))
    cls = i % 100
    century = i // 100
    lang = _LANG_ROTATION[(i * 7 + century) % len(_LANG_ROTATION)]

    if cls >= 89 and cls <= 90:  # exact re-arrival of row (century*100 + cls-89)
        src = century * 100 + (cls - 89)
        row = gen_row(src, seed)
        row["warc_ts"] = row["warc_ts"] + timedelta(days=2)
        return row

    if cls <= 54:
        text = _clean_doc(rng, lang)
    elif cls <= 58:
        text = _sample_text(rng, "en", rng.randrange(5, 30)); lang = "en"
    elif cls <= 62:
        text = " ".join(_gibberish_word(rng, 14, 24) for _ in range(80)); lang = "en"
    elif cls <= 66:
        base = _sample_text(rng, "en", 120).split(" ")
        syms = ["#", "@#$", "%^&", "*~|", "=+#"]
        out = []
        for k, t in enumerate(base):
            out.append(t)
            if k % 4 == 0:
                out.append(syms[rng.randrange(len(syms))])
        text = " ".join(out); lang = "en"
    elif cls <= 70:
        text = " ".join(str(rng.randrange(10**6)) for _ in range(100)); lang = "en"
    elif cls <= 74:
        line = _sample_text(rng, "en", 12)
        uniq = [_sample_text(rng, "en", 12) for _ in range(3)]
        text = "\n".join([line] * 10 + uniq); lang = "en"
    elif cls <= 78:
        text = " ".join(_gibberish_word(rng, 3, 9) for _ in range(120)); lang = None
    elif cls <= 82:
        base = _sample_text(rng, "en", 100)
        text = (f"{base}\ncontact me at user{i}@example.com or "
                f"call 555-{rng.randrange(100,999)}-{rng.randrange(1000,9999)} "
                f"ssn {rng.randrange(100,999)}-{rng.randrange(10,99)}-{rng.randrange(1000,9999)} "
                f"server 10.0.{rng.randrange(255)}.{rng.randrange(255)}"); lang = "en"
    elif cls <= 85:
        toks = _sample_text(rng, "en", 100).split(" ")
        toks[rng.randrange(len(toks))] = "badword1"
        toks[rng.randrange(len(toks))] = "slur2"
        text = " ".join(toks); lang = "en"
    elif cls <= 88:
        # near-dup cluster: same century-base text, light perturbation per member
        base_rng = random.Random(
            (seed << 34) ^ ((0x5851F42D + century * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFF)
        )
        base = _sample_text(base_rng, "en", 150)
        member = cls - 86
        if member == 1:
            base = base + " extra footer words appended here"
        elif member == 2:
            base = "prepended header line\n" + base
        text = base; lang = "en"
    elif cls <= 93:
        body = _sample_text(rng, "fr", 120)
        payload = (
            f'<html><head><meta charset="latin-1"><title>page {i}</title></head>'
            f"<body><p>{body}</p></body></html>"
        ).encode("latin-1")
        return _finish(i, rng, cls, payload, None, "fr")
    elif cls <= 95:
        payload = bytes(rng.randrange(128, 256) for _ in range(400))
        return _finish(i, rng, cls, payload, None, None)
    elif cls <= 97:
        body = _clean_doc(rng, "en").replace("\n", "</p><p>")
        payload = _HTML_TEMPLATE.format(title=f"page {i}", body=body).encode("utf-8")
        return _finish(i, rng, cls, payload, None, "en")
    else:
        return _finish(i, rng, cls, b"", None, None)

    # payload form for text classes: ~half wrapped in simple html, half raw text
    if rng.random() < 0.5 and lang != "zh":
        body = text.replace("\n", "</p><p>")
        payload = _HTML_TEMPLATE.format(title=f"page {i}", body=body).encode("utf-8")
        return _finish(i, rng, cls, payload, None, lang)
    return _finish(i, rng, cls, None, text, lang)


def _finish(i: int, rng: random.Random, cls: int, html: bytes | None,
            text: str | None, true_lang: str | None) -> dict:
    # claimed lang: 80% truthful, 10% wrong, 10% null — detection must not
    # trust it (the instrument-detection lesson, reference cfht_name.py:447-522)
    r = rng.random()
    if true_lang is None or r < 0.10:
        claimed = None
    elif r < 0.20:
        claimed = "it"
    else:
        claimed = true_lang
    host = "big.example.com" if rng.random() < 0.30 else f"host{rng.randrange(50)}.example.org"
    ext = (".html", ".php", "")[i % 3]
    return {
        "url": f"https://{host}/p/{i:09d}{ext}",
        "warc_ts": _BASE_TS + timedelta(days=i % 5, seconds=(i * 37) % 86400),
        "html": html,
        "text": text,
        "lang": claimed,
    }


def synth_pages(spark: SparkSession, n_rows: int, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation: spark.range -> one Arrow pass."""
    rng_ids = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return rng_ids.mapInPandas(gen, schema=PAGES_SCHEMA)
