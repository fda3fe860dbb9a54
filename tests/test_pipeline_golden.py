"""Golden-output gate: the Spark pipeline vs the independent Python labeler.

The analogue of the reference's backbone test
(/root/reference/cfht2caom2/tests/test_caom_gen_visit.py:101-209): every
fixture row gets an independently derived expected record; the engine must
match — keep/drop F1 >= 0.99, byte-identical extraction sha256, scrubbed text
exact (north_rule gates).
"""

from __future__ import annotations

import pytest

from cfht2caom2_spark.plans.pipeline import build_pipeline
from cfht2caom2_spark.sources.pages import synth_pages

from .reference_impl import reference_labels

N_ROWS = 600


@pytest.fixture(scope="module")
def golden():
    return reference_labels(N_ROWS)


@pytest.fixture(scope="module")
def actual(spark):
    df = build_pipeline(synth_pages(spark, N_ROWS), spark)
    return {
        (r["url"], r["warc_ts"]): r
        for r in df.collect()
    }


def test_row_count(actual):
    assert len(actual) == N_ROWS  # (url, warc_ts) unique incl. re-arrivals


def test_extraction_byte_identical(actual, golden):
    mismatches = [
        (url, ts)
        for (url, ts), row in actual.items()
        if row["extracted_sha256"] != golden[url]["sha256"]
    ]
    assert mismatches == []


def test_keep_f1_gate(actual, golden):
    tp = fp = fn = tn = 0
    diffs = []
    for (url, ts), row in actual.items():
        want = golden[url]["keep"]
        got = row["keep"]
        if want and got:
            tp += 1
        elif not want and not got:
            tn += 1
        elif got and not want:
            fp += 1
            diffs.append((url, "fp", sorted(golden[url]["rules"]), row["rules"]))
        else:
            fn += 1
            diffs.append((url, "fn", sorted(golden[url]["rules"]), row["rules"]))
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    assert f1 >= 0.99, (f1, diffs[:10])


def test_rules_attribution_exact(actual, golden):
    """Stronger than F1: rule sets must match exactly on every row."""
    diffs = [
        (url, sorted(golden[url]["rules"]), row["rules"])
        for (url, ts), row in actual.items()
        if set(row["rules"]) != golden[url]["rules"]
    ]
    assert len(diffs) <= N_ROWS * 0.01, diffs[:10]


def test_scrubbed_text_exact(actual, golden):
    diffs = []
    for (url, ts), row in actual.items():
        want = golden[url]["scrubbed"] if golden[url]["keep"] else None
        if row["scrubbed_text"] != want:
            diffs.append((url, want, row["scrubbed_text"]))
    assert diffs == [], diffs[:5]


def test_pii_actually_scrubbed(actual):
    kept_texts = [r["scrubbed_text"] for r in actual.values() if r["keep"]]
    assert kept_texts, "no kept rows?"
    import re

    for t in kept_texts:
        assert not re.search(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", t)
        assert "<EMAIL>" in t or "@" not in t


def test_near_dup_clusters_resolved(actual):
    """Per century, rows 86-88 are a 3-member near-dup cluster: exactly one
    survivor (the earliest by (warc_ts, url))."""
    import re

    clusters: dict[int, list] = {}
    for (url, ts), row in actual.items():
        m = re.search(r"/p/(\d{9})", url)
        i = int(m.group(1))
        if i % 100 in (86, 87, 88):
            clusters.setdefault(i // 100, []).append(row)
    assert clusters
    for century, rows in clusters.items():
        dups = [r for r in rows if "near_duplicate" in r["rules"]]
        assert len(dups) == len(rows) - 1, (century, [r["rules"] for r in rows])


def test_fused_equals_unfused(spark):
    """The single-Arrow-pass fusion must be result-identical to the staged
    path (same kernels, different plumbing)."""
    pages = synth_pages(spark, 200)
    a = build_pipeline(pages, spark, dedupe=False, fused=True)
    b = build_pipeline(pages, spark, dedupe=False, fused=False)
    rows_a = {(r["url"], r["warc_ts"]): (r["extracted_sha256"], r["keep"],
                                          tuple(r["rules"]), r["ppl"])
              for r in a.collect()}
    rows_b = {(r["url"], r["warc_ts"]): (r["extracted_sha256"], r["keep"],
                                          tuple(r["rules"]), r["ppl"])
              for r in b.collect()}
    assert rows_a == rows_b


def test_host_backfill_adopts_consensus_in_pipeline(spark):
    """profile.host_lang_backfill wires hostnorm into the main visit (the
    reference runs sibling-backfill inside the visit, instruments.py:1951-2019):
    a low-confidence page on a monolingual host adopts the host language and
    is rescued from the lang_conf gate; without the flag it is dropped."""
    import datetime as dt

    from cfht2caom2_spark.config import RuleProfile
    from cfht2caom2_spark.sources.pages import PAGES_SCHEMA

    en = ("the people in the town walk to the market every morning and the "
          "children play in the park while the old men talk about the "
          "weather and the price of bread near the harbor gate %d")
    ambiguous = "la casa the house das haus le chat"   # conf ~0.11 -> adopts
    t0 = dt.datetime(2025, 6, 1)
    rows = [(f"https://mono.example/p/{i}", t0 + dt.timedelta(hours=i), None,
             en % i, "en") for i in range(3)]
    rows.append(("https://mono.example/p/9", t0, None, ambiguous, "en"))
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    lenient = dict(min_words=5, min_stopword_frac=0.0)

    on = RuleProfile(host_lang_backfill=True, **lenient)
    got = {r["url"]: r for r in
           build_pipeline(pages, spark, profile=on, dedupe=False).collect()}
    adopted = got["https://mono.example/p/9"]
    assert adopted["lang_source"] == "host_consensus"
    assert adopted["lang_pred"] == "en"
    assert adopted["keep"], adopted["rules"]
    assert all(got[u]["lang_source"] == "model" for u in got
               if u != "https://mono.example/p/9")

    off = RuleProfile(**lenient)
    got_off = {r["url"]: r for r in
               build_pipeline(pages, spark, profile=off, dedupe=False).collect()}
    assert "lang_conf" in got_off["https://mono.example/p/9"]["rules"]


def test_exact_duplicate_collapse_before_minhash(spark):
    """Byte-identical content on different urls: one canonical survives, the
    rest are exact_duplicate (and never reach the minhash join)."""
    import datetime as dt

    from cfht2caom2_spark.sources.pages import PAGES_SCHEMA

    base = ("the quick brown fox jumps over the lazy dog and runs into the "
            "quiet forest where people gather every morning near the stone "
            "bridge to buy bread and fruit from the market in the valley "
            "while children play near the river and travelers rest happily "
            "watching the green fields and the mountains in the distance "
            "under a mild sky for most of the pleasant year it is calm here")
    t0 = dt.datetime(2025, 6, 1)
    rows = [
        (f"https://h{i}.org/p/{i}", t0 + dt.timedelta(hours=i), None, base, "en")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = {r["url"]: r["rules"] for r in build_pipeline(df, spark).collect()}
    dups = [u for u, rules in out.items() if "exact_duplicate" in rules]
    assert len(dups) == 3
    assert "https://h0.org/p/0" not in dups       # earliest canonical survives
    assert all("near_duplicate" not in out[u] for u in out)  # collapsed pre-minhash


def test_boilerplate_removal_in_pipeline(spark):
    """profile.boilerplate_removal wires CCNet-style cross-doc line dedup
    into the main visit (the reference runs cleanup inside DATA_VISITORS,
    composable.py:84-88): template lines (nav items, footer) occurring in
    >= min_df docs vanish from scrubbed_text; rows without template lines
    keep byte-identical decisions vs the flag-off run."""
    from cfht2caom2_spark.config import RuleProfile

    pages = synth_pages(spark, 300)
    on = RuleProfile(boilerplate_removal=True)
    got_on = {(r["url"], r["warc_ts"]): r
              for r in build_pipeline(pages, spark, profile=on).collect()}
    got_off = {(r["url"], r["warc_ts"]): r
               for r in build_pipeline(pages, spark).collect()}
    assert set(got_on) == set(got_off)

    footer = "© 2025 Example Corp — all rights reserved"
    kept_on = [r for r in got_on.values() if r["keep"] and r["scrubbed_text"]]
    assert kept_on
    # the template footer/nav lines are stripped from every kept artifact
    for r in kept_on:
        assert footer not in r["scrubbed_text"], r["url"]
        for line in r["scrubbed_text"].split("\n"):
            assert line.strip() not in ("Home", "About", "Contact"), r["url"]
    # flag-off artifacts DO contain the footer (the pass did something)
    assert any(r["keep"] and r["scrubbed_text"] and footer in r["scrubbed_text"]
               for r in got_off.values())
    # rows whose text never had template lines: decision unchanged
    same = diff = 0
    for k, off_r in got_off.items():
        on_r = got_on[k]
        if off_r["scrubbed_text"] and footer not in off_r["scrubbed_text"]:
            if (off_r["keep"], sorted(off_r["rules"])) == \
               (on_r["keep"], sorted(on_r["rules"])):
                same += 1
            else:
                diff += 1
    assert same > 50 and diff <= same * 0.05, (same, diff)
    # schema stable across profiles
    assert [f for f in got_on[next(iter(got_on))].asDict()] == \
           [f for f in got_off[next(iter(got_off))].asDict()]


def test_benchmark_decontamination_in_pipeline(spark):
    """A doc whose text IS in the eval suite fires `contaminated` and drops;
    docs without the rule keep exactly their benchmark-free decision (the
    flag is additive, never rewrites other rules)."""
    from pyspark.sql import functions as F

    pages = synth_pages(spark, 300)
    base = build_pipeline(pages, spark, dedupe=False)
    base_rows = {r["url"]: r for r in base.collect()}
    target_url = min(u for u, r in base_rows.items()
                     if r["keep"] and r["scrubbed_text"])
    bench = spark.createDataFrame(
        [(base_rows[target_url]["scrubbed_text"],)], "text string")

    out = build_pipeline(pages, spark, dedupe=False, benchmark=bench)
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == len(base_rows)
    tr = rows[target_url]
    assert "contaminated" in tr["rules"] and not tr["keep"]
    n_contam = sum(1 for r in rows.values() if "contaminated" in r["rules"])
    assert n_contam < len(rows) // 4  # the suite taints its matches, not the corpus
    for url, r in rows.items():
        if "contaminated" not in r["rules"]:
            assert list(r["rules"]) == list(base_rows[url]["rules"])
            assert r["keep"] == base_rows[url]["keep"]


# --------------------------------------------------------------------------
# join-back key integrity (round-4 advice): derived-frame joins must never
# multiply rows or cross-assign values when (url, warc_ts) is not unique
# --------------------------------------------------------------------------

def _mk_pages(spark, rows):
    import datetime as dt
    t0 = dt.datetime(2025, 6, 1)
    data = [(u, t0 + dt.timedelta(seconds=off), None, txt, "en")
            for u, off, txt in rows]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")


_CLEAN_A = ("the quick brown fox jumps over the lazy dog and then walks "
            "back home across the wide green field while the evening sun "
            "sets slowly behind the old stone bridge near the quiet river "
            "bank where children often play during long summer afternoons "
            "and birds sing in the tall shade trees")
_CLEAN_B = ("a completely different story unfolds in the busy city where "
            "trains arrive every morning full of people reading papers "
            "and drinking coffee before work starts at the tall office "
            "towers along the main avenue with its bright shop windows "
            "and crowded sidewalks full of noise and motion every day")


def test_decontam_duplicate_row_key_no_multiplication(spark):
    """THE round-4 advice repro: an input with a duplicated (url, warc_ts)
    row must come out of build_pipeline with exactly one output row per
    input row, and a non-overlapping doc must NOT inherit another doc's
    contaminated flag through join-back key collision."""
    pages = _mk_pages(spark, [
        ("https://dup.com/a", 0, _CLEAN_A),
        ("https://dup.com/a", 0, _CLEAN_A),      # exact re-arrival, same ts
        ("https://clean.com/b", 5, _CLEAN_B),    # no benchmark overlap
    ])
    bench = spark.createDataFrame([(_CLEAN_A,)], "text string")
    out = build_pipeline(pages, spark, dedupe=False, has_html=False,
                         benchmark=bench).collect()
    assert len(out) == 3, [r["url"] for r in out]
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    assert len(by_url["https://dup.com/a"]) == 2
    for r in by_url["https://dup.com/a"]:
        assert "contaminated" in r["rules"]
    (b,) = by_url["https://clean.com/b"]
    assert "contaminated" not in b["rules"]


def test_decontam_same_url_ts_different_text_not_cross_flagged(spark):
    """Two DIFFERENT documents legally sharing (url, warc_ts): the content
    hash folded into the join-back key keeps their flags separate — the
    non-overlapping text must not be flagged because its sibling is."""
    pages = _mk_pages(spark, [
        ("https://dup.com/a", 0, _CLEAN_A),
        ("https://dup.com/a", 0, _CLEAN_B),      # same key cols, other text
    ])
    bench = spark.createDataFrame([(_CLEAN_A,)], "text string")
    out = build_pipeline(pages, spark, dedupe=False, has_html=False,
                         benchmark=bench).collect()
    assert len(out) == 2
    flags = {r["extracted_sha256"]: "contaminated" in r["rules"] for r in out}
    assert len(flags) == 2
    assert sorted(flags.values()) == [False, True]


def test_boilerplate_duplicate_rows_reassemble_one_copy(spark):
    """Duplicated (url, warc_ts, text) rows share a reassembly id by
    construction; the line-deduped reassembly must hand BOTH carrier rows
    the single-copy cleaned text, not an interleaved double."""
    from cfht2caom2_spark.config import RuleProfile

    footer = "COMMON FOOTER LINE SHARED BY ALL"
    docs = [(f"https://site{i}.com/", i * 10,
             _CLEAN_A + f" unique tail {i}\n" + footer) for i in range(6)]
    docs.append(("https://site0.com/", 0, _CLEAN_A + " unique tail 0\n" + footer))
    pages = _mk_pages(spark, docs)
    on = RuleProfile(boilerplate_removal=True, min_words=10)
    out = build_pipeline(pages, spark, profile=on, dedupe=False,
                         has_html=False).collect()
    assert len(out) == 7
    dup_rows = [r for r in out if r["url"] == "https://site0.com/"]
    assert len(dup_rows) == 2
    solo = next(r for r in out if r["url"] == "https://site1.com/")
    expected = solo["scrubbed_text"].replace("unique tail 1", "unique tail 0")
    for r in dup_rows:
        assert footer not in (r["scrubbed_text"] or "")
        assert r["scrubbed_text"] == expected


def test_scrub_rules_attributed_in_decisions(spark):
    """Round-4 verdict #3: scrub mutations reach the decisions store — each
    fired PII pattern id appears in scrub_rules (reference analogue: value
    repairs are recorded, instruments.py:222-266)."""
    pages = _mk_pages(spark, [
        ("https://pii.com/a", 0,
         _CLEAN_A + " reach me at alice@example.com or 555-123-4567"),
        ("https://nopii.com/b", 1, _CLEAN_B),
    ])
    out = {r["url"]: r for r in
           build_pipeline(pages, spark, dedupe=False, has_html=False).collect()}
    assert "scrub_rules" in next(iter(out.values())).asDict()
    assert out["https://pii.com/a"]["scrub_rules"] == ["pii_email", "pii_phone"]
    assert out["https://nopii.com/b"]["scrub_rules"] == []


def test_blocked_domain_rule_in_pipeline(spark):
    """UT1-style domain blocklist (RuleProfile.blocked_hosts): exact host
    and subdomain matches fire `blocked_domain`; other hosts are untouched;
    the default empty list changes nothing."""
    from cfht2caom2_spark.config import RuleProfile

    pages = _mk_pages(spark, [
        ("https://spam.example/page", 0, _CLEAN_A),
        ("https://deep.sub.spam.example/x", 1, _CLEAN_A + " extra"),
        ("https://notspam.example/y", 2, _CLEAN_B),
        ("https://ok.example/z", 3, _CLEAN_B + " extra"),
    ])
    prof = RuleProfile(blocked_hosts=("spam.example",))
    out = {r["url"]: r for r in build_pipeline(
        pages, spark, profile=prof, dedupe=False, has_html=False).collect()}
    assert "blocked_domain" in out["https://spam.example/page"]["rules"]
    assert not out["https://spam.example/page"]["keep"]
    assert "blocked_domain" in out["https://deep.sub.spam.example/x"]["rules"]
    # "notspam.example" ends with "spam.example" as a STRING but is not a
    # subdomain — the dot-anchored match must not fire
    assert "blocked_domain" not in out["https://notspam.example/y"]["rules"]
    assert "blocked_domain" not in out["https://ok.example/z"]["rules"]
    # default profile: rule absent entirely
    base = {r["url"]: r for r in build_pipeline(
        pages, spark, dedupe=False, has_html=False).collect()}
    assert all("blocked_domain" not in r["rules"] for r in base.values())


def test_repeated_paragraph_rule_fires_where_lines_do_not(spark):
    """Gopher dup-paragraph gate: repeated single-line paragraphs push the
    paragraph fraction over 0.30 while the line fraction stays under it —
    the case the line gate structurally misses."""
    spam = "LIMITED TIME OFFER ACT NOW"
    body = "\n".join(f"unique line {i} with several plain words here"
                     for i in range(12))
    text = f"{spam}\n\n{spam}\n\n{body}"
    pages = _mk_pages(spark, [("https://a.example/p", 0, text),
                              ("https://b.example/q", 1, _CLEAN_B)])
    out = {r["url"]: r for r in build_pipeline(
        pages, spark, dedupe=False, has_html=False).collect()}
    a = out["https://a.example/p"]
    assert "repeated_paragraphs" in a["rules"]
    assert "repeated_lines" not in a["rules"]
    assert a["repeated_paragraph_frac"] > 0.3
    assert out["https://b.example/q"]["repeated_paragraph_frac"] == 0.0


def test_span_removal_in_pipeline(spark):
    """profile.span_removal strips later occurrences of a copied >=K-token
    run inside the main visit: the earliest carrier keeps its text, later
    carriers lose exactly the copied tokens, untouched docs keep
    byte-identical artifacts vs the flag-off run."""
    from dataclasses import replace

    from cfht2caom2_spark.config import RuleProfile

    def filler(tag):
        return " ".join(f"{tag}{i} plainword{i}" for i in range(15))

    copied = ("this exact syndicated paragraph appears verbatim in many "
              "places across the crawl with plenty of tokens to span")
    pages = _mk_pages(spark, [
        ("https://orig.example/a", 0, f"{filler('aa')} {copied}"),
        ("https://copy1.example/b", 10, f"{copied} {filler('bb')}"),
        ("https://copy2.example/c", 20, f"{filler('cc')} {copied} end"),
        ("https://solo.example/d", 30, filler("dd") + " completely separate"),
    ])
    # gates opened wide: this test pins the span-removal plumbing, and the
    # synthetic filler is deliberately not natural language
    prof = RuleProfile(
        span_removal=True, span_k=8, min_words=2,
        min_stopword_frac=0.0, min_mean_word_len=0.0,
        max_mean_word_len=100.0, min_alpha_word_frac=0.0,
        min_lang_conf=0.0, max_perplexity=float("inf"),
        allowed_langs=("en", "fr", "de", "es", "zh", "und"))
    on = {r["url"]: r for r in build_pipeline(
        pages, spark, profile=prof, dedupe=False, has_html=False).collect()}
    off = {r["url"]: r for r in build_pipeline(
        pages, spark, profile=replace(prof, span_removal=False),
        dedupe=False, has_html=False).collect()}
    assert set(on) == set(off) and len(on) == 4
    # earliest carrier (lowest warc_ts) keeps the copied run
    assert copied in on["https://orig.example/a"]["scrubbed_text"]
    # later carriers lose it (stats/scrub see the cleaned text)
    assert copied not in (on["https://copy1.example/b"]["scrubbed_text"] or "")
    assert copied not in (on["https://copy2.example/c"]["scrubbed_text"] or "")
    assert on["https://copy1.example/b"]["n_words"] < \
        off["https://copy1.example/b"]["n_words"]
    # untouched doc byte-identical to the flag-off run
    assert on["https://solo.example/d"]["scrubbed_text"] == \
        off["https://solo.example/d"]["scrubbed_text"]


def test_decontam_duplicate_rows_do_not_double_overlap(spark):
    """Round-4 self-review: identical re-crawls share the sha-folded key;
    without input dedup both rows' grams enter the overlap count and a doc
    with n true overlaps counts 2n — here 3 shared 3-grams (< min_overlap
    5) must stay clean even though the page arrived twice."""
    from dataclasses import replace

    from cfht2caom2_spark.config import DEFAULT_PROFILE

    shared = "omega psi chi phi upsilon"        # 5 tokens -> 3 distinct 3-grams
    doc = f"{_CLEAN_A} {shared}"
    pages = _mk_pages(spark, [
        ("https://dup.example/a", 0, doc),
        ("https://dup.example/a", 0, doc),      # identical re-crawl
    ])
    bench = spark.createDataFrame(
        [(f"{shared} totally unrelated benchmark filler words",)],
        "text string")
    prof = replace(DEFAULT_PROFILE, decontam_k=3, decontam_min_overlap=5)
    out = build_pipeline(pages, spark, profile=prof, dedupe=False,
                         has_html=False, benchmark=bench).collect()
    assert len(out) == 2
    for r in out:
        assert "contaminated" not in r["rules"], r["rules"]


def test_canonicalize_urls_in_pipeline(spark):
    """profile.canonicalize_urls: two campaign-link fetches of one page
    share one url identity at ingress — the exact-dup url ranking collapses
    them to a single canonical row + one exact_duplicate, where the raw-url
    run keeps two independent identities."""
    from cfht2caom2_spark.config import RuleProfile

    pages = _mk_pages(spark, [
        ("https://site.example/art/1?utm_source=nl", 0, _CLEAN_A),
        ("https://site.example/art/1?utm_source=tw&fbclid=x", 60, _CLEAN_A),
        ("https://other.example/art/2", 120, _CLEAN_B),
    ])
    on = RuleProfile(canonicalize_urls=True)
    got = build_pipeline(pages, spark, profile=on, dedupe=True,
                         has_html=False).collect()
    urls = sorted(r["url"] for r in got)
    # both variants rewrote to the SAME canonical url
    assert urls == ["https://other.example/art/2",
                    "https://site.example/art/1",
                    "https://site.example/art/1"]
    canon = [r for r in got if r["url"] == "https://site.example/art/1"]
    # url-identity ranking: one canonical arrival, the re-arrival is not an
    # independent identity (no exact_duplicate pair of SEPARATE urls)
    assert {tuple(r["rules"]) for r in canon} is not None
    off = build_pipeline(pages, spark, dedupe=True, has_html=False).collect()
    raw_urls = {r["url"] for r in off}
    assert len(raw_urls) == 3                       # raw run: 3 identities
    # raw run treats the second campaign variant as a different url with
    # identical content -> exact_duplicate fires on exactly one of them
    dups = [r for r in off if "exact_duplicate" in r["rules"]]
    assert len(dups) == 1


def test_line_format_gates_in_pipeline(spark):
    """Gopher bullet/ellipsis gates + C4 terminal-punct gate: a near-pure
    bullet list and an ellipsis-teaser page drop with the right rule; prose
    is untouched; the terminal-punct gate stays off until a deployment
    raises its threshold from the never-firing 0.0 default."""
    from dataclasses import replace

    from cfht2caom2_spark.config import DEFAULT_PROFILE

    # enough words per line that only the line-format gates fire
    filler = "assorted words keep this line long enough for the gates"
    bullets = "\n".join(f"- {filler} item {i}" for i in range(20))
    teaser = "\n".join(f"{filler} teaser {i}..." if i < 9
                       else f"{filler} plain {i}."
                       for i in range(20))
    pages = _mk_pages(spark, [
        ("https://bul.example/a", 0, bullets),
        ("https://tea.example/b", 1, teaser),
        ("https://ok.example/c", 2, _CLEAN_A),
    ])
    out = {r["url"]: r for r in build_pipeline(
        pages, spark, dedupe=False, has_html=False).collect()}
    assert "bullet_lines" in out["https://bul.example/a"]["rules"]
    assert not out["https://bul.example/a"]["keep"]
    assert "ellipsis_lines" in out["https://tea.example/b"]["rules"]
    assert not out["https://tea.example/b"]["keep"]
    assert out["https://ok.example/c"]["keep"]
    assert all("terminal_punct" not in r["rules"] for r in out.values())

    # opt-in terminal-punct gate: _CLEAN_A has no sentence punctuation at
    # all, so a raised threshold drops it; the teaser page's lines all end
    # in . or ... and pass
    prof = replace(DEFAULT_PROFILE, min_terminal_punct_line_frac=0.5)
    strict = {r["url"]: r for r in build_pipeline(
        pages, spark, profile=prof, dedupe=False, has_html=False).collect()}
    assert "terminal_punct" in strict["https://ok.example/c"]["rules"]
    assert "terminal_punct" not in strict["https://tea.example/b"]["rules"]


def test_c4_content_gates_in_pipeline(spark):
    """C4 §2.2 content gates: a page containing "lorem ipsum" (any case) or
    a curly brace drops with the right rule by default; the min-sentences
    gate is off by default (the synthetic corpus is punctuation-free prose)
    and drops sentence-less pages once a deployment opts in."""
    from dataclasses import replace

    from cfht2caom2_spark.config import DEFAULT_PROFILE

    sentences = " ".join(f"{_CLEAN_A} and so it goes on number {i}."
                         for i in range(4))
    pages = _mk_pages(spark, [
        ("https://lorem.example/a", 0, _CLEAN_A + "\nLorem Ipsum dolor sit"),
        ("https://code.example/b", 1, _CLEAN_A + "\nif (x) { return y; }"),
        ("https://ok.example/c", 2, _CLEAN_A),
        ("https://prose.example/d", 3, sentences),
    ])
    out = {r["url"]: r for r in build_pipeline(
        pages, spark, dedupe=False, has_html=False).collect()}
    assert "lorem_ipsum" in out["https://lorem.example/a"]["rules"]
    assert not out["https://lorem.example/a"]["keep"]
    assert "curly_brace" in out["https://code.example/b"]["rules"]
    assert not out["https://code.example/b"]["keep"]
    assert out["https://ok.example/c"]["keep"]
    assert all("too_few_sentences" not in r["rules"] for r in out.values())

    # opt in at the published C4 value: punctuation-free prose drops, the
    # 4-sentence page sails through
    prof = replace(DEFAULT_PROFILE, min_sentences=3)
    strict = {r["url"]: r for r in build_pipeline(
        pages, spark, profile=prof, dedupe=False, has_html=False).collect()}
    assert "too_few_sentences" in strict["https://ok.example/c"]["rules"]
    assert "too_few_sentences" not in strict["https://prose.example/d"]["rules"]
    assert strict["https://prose.example/d"]["keep"]

    # gates are profile-switchable off again
    lax = replace(DEFAULT_PROFILE, block_lorem_ipsum=False,
                  block_curly_brace=False)
    off = {r["url"]: r for r in build_pipeline(
        pages, spark, profile=lax, dedupe=False, has_html=False).collect()}
    assert off["https://lorem.example/a"]["keep"]
    assert off["https://code.example/b"]["keep"]


def test_gopher_repetition_ladder_in_pipeline(spark):
    """Opt-in Gopher dup-ngram ladder: a doc that is one 6-word sentence
    repeated over and over drops with the dup-5..10-gram rules fired; a doc
    dominated by one repeated bigram fires the top-2-gram gate; clean prose
    is untouched; default profile leaves the ladder off entirely."""
    from dataclasses import replace

    from cfht2caom2_spark.config import DEFAULT_PROFILE

    looped = " ".join(["the quick brown fox jumps over"] * 12
                      + [_CLEAN_A])
    bigrammy = " ".join(["winter storm"] * 40) + " " + " ".join(
        _CLEAN_A.split()[:40])
    pages = _mk_pages(spark, [
        ("https://loop.example/a", 0, looped),
        ("https://bigram.example/b", 1, bigrammy),
        ("https://ok.example/c", 2, _CLEAN_A),
    ])
    prof = replace(DEFAULT_PROFILE, gopher_repetition_gates=True)
    out = {r["url"]: r for r in build_pipeline(
        pages, spark, profile=prof, dedupe=False, has_html=False).collect()}
    a = out["https://loop.example/a"]
    assert {"dup_5gram", "dup_6gram"} <= set(a["rules"])
    assert not a["keep"]
    b = out["https://bigram.example/b"]
    assert "dup_top_2gram" in b["rules"]
    assert not b["keep"]
    assert not any(r.startswith("dup_") for r in
                   out["https://ok.example/c"]["rules"])

    # default profile: ladder off, the looped doc is caught (or not) only
    # by the always-on repetition gates — no dup_* rules ever appear
    off = {r["url"]: r for r in build_pipeline(
        pages, spark, dedupe=False, has_html=False).collect()}
    assert not any(r.startswith("dup_") for row in off.values()
                   for r in row["rules"])


def test_fuzzy_decontamination_tier_in_pipeline(spark):
    """With decontam_fuzzy on, a lightly-EDITED copy of an eval doc fires
    `contaminated_fuzzy` (while the exact tier at default k=13 misses it —
    one changed token destroys every covering 13-gram of a short doc); the
    verbatim copy fires BOTH tiers; untouched docs keep their
    benchmark-free decision exactly."""
    import datetime as dt
    from dataclasses import replace

    from cfht2caom2_spark.config import DEFAULT_PROFILE

    bench_text = " ".join(f"token{i}" for i in range(14))
    edited = bench_text.replace("token7", "tokenX")
    t0 = dt.datetime(2025, 6, 1)
    pages = spark.createDataFrame(
        [("u1", t0, None, bench_text, "en"),
         ("u2", t0, None, edited, "en"),
         ("u3", t0, None, "entirely unrelated words about other topics "
                          "padded to clear the shingle minimum", "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    bench = spark.createDataFrame([(bench_text,)], "text string")
    profile = replace(DEFAULT_PROFILE, decontam_fuzzy=True)

    base = {r["url"]: r for r in build_pipeline(
        pages, spark, dedupe=False, has_html=False,
        profile=DEFAULT_PROFILE).collect()}
    rows = {r["url"]: r for r in build_pipeline(
        pages, spark, dedupe=False, has_html=False, profile=profile,
        benchmark=bench).collect()}
    assert "contaminated" in rows["u1"]["rules"]
    assert "contaminated_fuzzy" in rows["u1"]["rules"]
    assert "contaminated" not in rows["u2"]["rules"]
    assert "contaminated_fuzzy" in rows["u2"]["rules"]
    for extra in ("contaminated", "contaminated_fuzzy"):
        assert extra not in rows["u3"]["rules"]
    assert list(rows["u3"]["rules"]) == list(base["u3"]["rules"])
