"""Independent pure-Python reference labeler for the golden-output tests.

Recomputes every pipeline decision WITHOUT Spark — plain Python over the
generator rows — mirroring how the reference pins behavior with expected XML
files produced outside the code under test
(/root/reference/cfht2caom2/tests/test_caom_gen_visit.py:101-209).  The Spark
pipeline must reach F1 >= 0.99 against these labels (north_rule) and
byte-identical extraction hashes.

Shares ONLY the model classes (langid/perplexity) and the extractor with the
engine — those are plain functions unit-tested separately; everything the
Spark expression layer does (tokenization, stats, rules, minhash dedup) is
re-derived here with independent code.
"""

from __future__ import annotations

import hashlib
import re

from cfht2caom2_spark.config import (DEFAULT_PROFILE, PII_PATTERNS, STOPWORDS,
                                     TOXICITY_WORDS, RuleProfile)
from cfht2caom2_spark.corpora import ZH_STOP_CHARS
from cfht2caom2_spark.functions.extraction import extract_html
from cfht2caom2_spark.functions.langid import TrigramLangID
from cfht2caom2_spark.functions.perplexity import BigramLM
from cfht2caom2_spark.sources.pages import gen_row

_MERSENNE = 2_147_483_647


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip()) if t]


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = [t for t in re.split(r"\s+", text.lower().strip()) if t]
    if len(toks) >= k:
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return {" ".join(toks)}


def _shingle_hash(s: str) -> int:
    # matches operators.dedup.shingle_hash_fast (Spark F.crc32 == zlib.crc32)
    import zlib
    return zlib.crc32(s.encode("utf-8")) % _MERSENNE


def _minhash_sig(shingles: set[str], num_perms: int) -> list[int]:
    hs = [_shingle_hash(s) for s in shingles]
    sig = []
    for i in range(num_perms):
        a = (2 * i + 1) % _MERSENNE
        b = (i * 40_503 + 1_299_721) % _MERSENNE
        sig.append(min((a * x + b) % _MERSENNE for x in hs))
    return sig


def reference_labels(n_rows: int, seed: int = 42,
                     profile: RuleProfile = DEFAULT_PROFILE) -> dict[str, dict]:
    """url -> {sha256, lang_pred, keep, rules, scrubbed} for n generator rows.

    For duplicate urls (re-arrival fixtures) the later warc_ts wins in the
    dict, matching nothing in particular — tests compare per (url, warc_ts)
    via the row list instead; this helper keys by url only for convenience of
    the non-rearrival classes.
    """
    lid, lm = TrigramLangID(), BigramLM()
    rows = []
    for i in range(n_rows):
        r = gen_row(i, seed)
        text = extract_html(r["html"]) if (r["html"] is not None and len(r["html"]) > 0) else r["text"]
        rows.append((i, r, text))

    # --- per-row rules ------------------------------------------------------
    results: dict[str, dict] = {}
    alive = []  # (url, warc_ts, text) candidates for dedup
    for i, r, text in rows:
        rules: set[str] = set()
        lang, conf, ppl = "und", 0.0, float("inf")
        scrubbed = None
        if text is None or len(text) == 0:
            rules.add("empty_payload")
        if text:
            lang, conf = lid.predict_one(text)
            ppl = lm.perplexity_one(text, lang)
            if lang == "zh":
                toks = [c for c in re.sub(r"\s+", "", text)]
            else:
                toks = _tokens(text)
            n = len(toks)
            mean_len = sum(len(t) for t in toks) / max(n, 1)
            n_sym = sum(text.count(c) for c in "#@$%^&*+=~|")
            symbol_ratio = n_sym / max(len(text), 1)
            if lang in STOPWORDS:
                sw = set(STOPWORDS[lang])
            else:
                sw = set(ZH_STOP_CHARS) if lang == "zh" else set(STOPWORDS["en"])
            swf = sum(1 for t in toks if t.lower() in sw) / max(n, 1)
            alpha = sum(1 for t in toks
                        if re.search(r"[A-Za-zÀ-ÿ一-鿿]", t)) / max(n, 1)
            lines = [l for l in text.split("\n") if l.strip()]
            rep = 1 - len(set(lines)) / len(lines) if lines else 0.0
            paras = [p for p in re.split(r"\n{2,}", text) if p.strip()]
            rep_p = 1 - len(set(paras)) / len(paras) if paras else 0.0
            tox = sum(1 for t in toks if t.lower() in TOXICITY_WORDS)

            if n < profile.min_words:
                rules.add("too_short")
            if n > profile.max_words:
                rules.add("too_long")
            if lang != "zh" and mean_len < profile.min_mean_word_len:
                rules.add("word_len_low")
            if lang != "zh" and mean_len > profile.max_mean_word_len:
                rules.add("word_len_high")
            if symbol_ratio > profile.max_symbol_ratio:
                rules.add("symbol_ratio")
            if swf < profile.min_stopword_frac:
                rules.add("stopword_frac")
            if alpha < profile.min_alpha_word_frac:
                rules.add("alpha_frac")
            if rep > profile.max_repeated_line_frac:
                rules.add("repeated_lines")
            if rep_p > profile.max_repeated_paragraph_frac:
                rules.add("repeated_paragraphs")
            n_lines = max(len(lines), 1)
            bullet = sum(1 for l in lines
                         if re.search(r"^\s*[-*•]", l)) / n_lines
            ellip = sum(1 for l in lines
                        if re.search(r"(\.\.\.|…)\s*$", l)) / n_lines
            term = sum(1 for l in lines
                       if re.search(r"[.!?\"]\s*$", l)) / n_lines
            # fracs are 0.0 for line-less text (matching the Spark stats),
            # so bullet/ellipsis can't fire there and terminal_punct fires
            # only under an opted-in threshold
            if bullet > profile.max_bullet_line_frac:
                rules.add("bullet_lines")
            if ellip > profile.max_ellipsis_line_frac:
                rules.add("ellipsis_lines")
            if term < profile.min_terminal_punct_line_frac:
                rules.add("terminal_punct")
            sent = sum(1 for _ in re.finditer(r"[.!?](\s|$)|[。！？]", text))
            if sent < profile.min_sentences:
                rules.add("too_few_sentences")
            if profile.block_lorem_ipsum and "lorem ipsum" in text.lower():
                rules.add("lorem_ipsum")
            if profile.block_curly_brace and "{" in text:
                rules.add("curly_brace")
            if profile.gopher_repetition_gates:
                tchars = sum(len(t) for t in toks)
                for gn, thr in profile.max_top_ngram_char_frac:
                    grams = [" ".join(toks[i:i + gn])
                             for i in range(len(toks) - gn + 1)]
                    if grams and tchars:
                        counts: dict[str, int] = {}
                        for g in grams:
                            counts[g] = counts.get(g, 0) + 1
                        cnt, glen, _g = max(
                            ((c, len(g) - (gn - 1), g)
                             for g, c in counts.items()),
                            key=lambda t3: (t3[0], t3[1], [-ord(ch) for ch
                                                           in t3[2]]))
                        if cnt * glen / tchars > thr:
                            rules.add(f"dup_top_{gn}gram")
                for gn, thr in profile.max_dup_ngram_char_frac:
                    grams = [" ".join(toks[i:i + gn])
                             for i in range(len(toks) - gn + 1)]
                    seen: dict[str, int] = {}
                    for g in grams:
                        seen[g] = seen.get(g, 0) + 1
                    covered: set[int] = set()
                    for i, g in enumerate(grams):
                        if seen[g] > 1:
                            covered.update(range(i, i + gn))
                    cov = sum(len(toks[j]) for j in covered)
                    if tchars and cov / tchars > thr:
                        rules.add(f"dup_{gn}gram")
            if tox > profile.max_toxicity_hits:
                rules.add("toxicity")
            thr = (profile.max_perplexity_zh if lang == "zh"
                   else profile.max_perplexity)
            if ppl > thr:
                rules.add("perplexity")
            if conf < profile.min_lang_conf:
                rules.add("lang_conf")
            if lang not in profile.allowed_langs:
                rules.add("lang_blocked")

            scrubbed = text
            for _rid, pat, repl in PII_PATTERNS:
                scrubbed = re.sub(pat, repl, scrubbed)
            alive.append((r["url"], r["warc_ts"], text))

        results[r["url"]] = {
            "warc_ts": r["warc_ts"],
            "sha256": hashlib.sha256(text.encode()).hexdigest() if text else None,
            "lang_pred": lang,
            "rules": rules,
            "scrubbed": scrubbed,
        }

    # --- minhash near-dup (pair dominance, earliest wins) --------------------
    num_perms = profile.minhash_bands * profile.minhash_rows_per_band
    # first arrival per url represents the url (same rule as the engine)
    alive = sorted(alive, key=lambda x: (x[1], x[0]))
    seen_urls = set()
    firsts = []
    for url, ts, text in alive:
        if url not in seen_urls:
            seen_urls.add(url)
            firsts.append((url, ts, text))
    alive = firsts
    # exact-duplicate collapse by content hash (same order: earliest canonical
    # wins; later urls with identical bytes get exact_duplicate and do not
    # participate in minhash — mirrors plans/pipeline.py)
    seen_sha: dict[str, str] = {}
    canonicals = []
    for url, ts, text in alive:
        sha = hashlib.sha256(text.encode()).hexdigest()
        if sha in seen_sha:
            results[url]["rules"].add("exact_duplicate")
        else:
            seen_sha[sha] = url
            canonicals.append((url, ts, text))
    alive = canonicals
    sigs = {}
    sh = {}
    for url, ts, text in alive:
        s = _shingles(text, profile.shingle_size)
        sh[url] = s
        sigs[url] = _minhash_sig(s, num_perms)
    urls = sorted(sigs)
    buckets: dict[tuple, list[str]] = {}
    for url in urls:
        sig = sigs[url]
        for b in range(profile.minhash_bands):
            key = (b, tuple(sig[b * profile.minhash_rows_per_band:
                                (b + 1) * profile.minhash_rows_per_band]))
            buckets.setdefault(key, []).append(url)
    ts_of = {url: ts for url, ts, _ in alive}
    losers = set()
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                if a == b:
                    continue
                # MinHash similarity estimator — fraction of agreeing
                # permutations (same verification as the engine's
                # minhash_losers_from_sig)
                est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / num_perms
                if est >= profile.dedup_jaccard:
                    # earliest (warc_ts, url) wins
                    if (ts_of[a], a) < (ts_of[b], b):
                        losers.add(b)
                    else:
                        losers.add(a)
    for url in losers:
        results[url]["rules"].add("near_duplicate")

    for url, res in results.items():
        res["keep"] = len(res["rules"]) == 0
    return results
