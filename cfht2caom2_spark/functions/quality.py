"""Gopher/C4-style heuristic quality statistics as built-in Column exprs.

Reference analogue: the ~40 keyword-chain getters with validity guards
(reference instruments.py:385-653, e.g. elevation range-check 0-90 at :385-393,
humidity guard at :439-444) — each output field is a guarded pure expression
over the row.  Here each text statistic is one Catalyst expression over the
token array; NO Python UDFs in this module (north_rule: vectorized only).
WholeStageCodegen fuses the whole block into the scan stage.

Every function takes/returns ``pyspark.sql.Column`` so the same definitions are
used by the batch pipeline, the streaming mode, and the DuckDB-oracle queries
(semantics are pinned by tests/test_quality.py and the driver's oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import STOPWORDS, TOXICITY_WORDS, RuleProfile
from ..corpora import ZH_STOP_CHARS

# Symbols counted for the Gopher symbol-to-char ratio (ASCII-only on purpose:
# identical semantics in Java regex and RE2, and CJK text is not penalized).
SYMBOL_CLASS = "[#@$%^&*+=~|]"


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties removed (identical to the SQL oracle's
    list_filter(regexp_split_to_array(trim(x),'\\s+'), t->t<>''))."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))


def zh_chars(text: Column) -> Column:
    """Per-character tokens for space-free CJK text (rule-profile dispatch,
    the P13 analogue: the token model is data-dependent, not subclassed)."""
    return F.split(F.regexp_replace(text, r"\s+", ""), "")


def n_words(toks: Column) -> Column:
    return F.size(toks).cast("bigint")


def mean_word_len(toks: Column) -> Column:
    # greatest(.,1) guards ANSI div-by-zero (Spark 4 default); an empty token
    # array then yields 0.0, which the too_short rule catches anyway.
    total = F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def symbol_ratio(text: Column) -> Column:
    n_sym = F.length(text) - F.length(F.regexp_replace(text, SYMBOL_CLASS, ""))
    return n_sym.cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def stopword_frac(toks: Column, lang: str = "en") -> Column:
    sw = STOPWORDS.get(lang)
    if sw is None and lang == "zh":
        sw = ZH_STOP_CHARS
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*sw)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def stopword_frac_by_lang(toks: Column, zh_toks: Column, lang: Column) -> Column:
    """Per-row language dispatch over the broadcast stop-word tables."""
    expr = stopword_frac(toks, "en")  # default profile
    for lg in ("fr", "de", "es"):
        expr = F.when(lang == lg, stopword_frac(toks, lg)).otherwise(expr)
    return F.when(lang == "zh", stopword_frac(zh_toks, "zh")).otherwise(expr)


def alpha_word_frac(toks: Column) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-zÀ-ÿ一-鿿]")))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def lines(text: Column) -> Column:
    return F.filter(F.split(text, "\n"), lambda l: F.trim(l) != F.lit(""))


def repeated_line_frac(text: Column) -> Column:
    ls = lines(text)
    n = F.size(ls)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(ls)).cast("double") / n.cast("double")
    )


def paragraphs(text: Column) -> Column:
    """Blank-line-delimited blocks with empties removed (split on \\n{2,} —
    the regex is RE2/Java-identical so the DuckDB oracle matches)."""
    return F.filter(F.split(text, r"\n{2,}"), lambda p: F.trim(p) != F.lit(""))


def repeated_paragraph_frac(text: Column) -> Column:
    """Gopher dup-paragraph gate (Rae et al. 2021 Table A1): the fraction of
    paragraphs that are verbatim repeats of an earlier one.  Catches
    template/spam blocks that span multiple lines (each line unique, the
    BLOCK repeated) which repeated_line_frac misses."""
    ps = paragraphs(text)
    n = F.size(ps)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(ps)).cast("double") / n.cast("double")
    )


def bullet_line_frac(text: Column) -> Column:
    """Fraction of non-empty lines that start with a bullet glyph (Gopher
    Table A1: docs that are >90% bullet lists are navigation/link farms,
    not prose)."""
    ls = lines(text)
    n = F.size(ls)
    hits = F.size(F.filter(ls, lambda l: l.rlike(r"^\s*[-*•]")))
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double"))


def ellipsis_line_frac(text: Column) -> Column:
    """Fraction of non-empty lines ending in an ellipsis (Gopher Table A1:
    >30% ellipsis lines marks truncated teaser/snippet pages)."""
    ls = lines(text)
    n = F.size(ls)
    hits = F.size(F.filter(ls, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double"))


def terminal_punct_line_frac(text: Column) -> Column:
    """Fraction of non-empty lines ending in terminal punctuation — the
    doc-level form of C4's line rule (Raffel et al. 2020 §2.2 keeps only
    lines ending in . ! ? ").  Low values mark list/menu/fragment pages."""
    ls = lines(text)
    n = F.size(ls)
    hits = F.size(F.filter(ls, lambda l: l.rlike(r"[.!?\"]\s*$")))
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double"))


# --- Gopher dup-ngram ladder -------------------------------------------------
#
# The repetition family beyond lines/paragraphs/2-grams (Rae et al. 2021
# Table A1): top-{2,3,4}-gram char fraction and dup-{5..10}-gram char
# fraction.  Character fractions are over TOKEN characters (separators
# excluded on both sides of the ratio).  Every computed array below is
# consumed exactly once, in ARGUMENT position (array_sort / the array being
# folded), never element-wise inside another lambda — higher-order functions
# re-evaluate lambda-body subtrees per element, so that discipline is what
# keeps each stat O(T·n + G log G) per doc instead of O(T²).

REP_LADDER_TOP_NS: tuple[int, ...] = (2, 3, 4)
REP_LADDER_DUP_NS: tuple[int, ...] = (5, 6, 7, 8, 9, 10)


def ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as single-space-joined strings; [] for docs with fewer
    than ``n`` tokens.  Gram i (1-based) covers tokens i..i+n-1."""
    win = F.size(toks) - (n - 1)
    return F.when(win >= 1, F.transform(
        F.sequence(F.lit(1), win),
        lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def total_token_chars(toks: Column) -> Column:
    return F.aggregate(toks, F.lit(0).cast("bigint"),
                       lambda a, t: a + F.length(t))


def top_ngram_char_frac(toks: Column, n: int) -> Column:
    """Fraction of token characters covered by the most frequent word
    n-gram: count × the gram's token chars / total token chars (Gopher
    "fraction of characters contained in the most frequently-occurring
    n-gram").  Overlapping occurrences count independently, so degenerate
    single-token spam can exceed 1.0 — harmless for a > threshold gate.
    Ties on (count, char length) keep the lexicographically smallest gram
    (= first in sort order), which the SQL oracle mirrors with ORDER BY
    cnt DESC, len DESC, gram ASC.  ONE fold over the sorted gram array."""
    sorted_g = F.array_sort(ngrams(toks, n))
    acc0 = F.struct(F.lit("").alias("prev"),
                    F.lit(0).cast("bigint").alias("run"),
                    F.lit(0).cast("bigint").alias("best"),
                    F.lit(0).cast("bigint").alias("best_len"))

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1) \
            .otherwise(F.lit(1).cast("bigint"))
        ln = (F.length(x) - F.lit(n - 1)).cast("bigint")
        better = (run > acc["best"]) | ((run == acc["best"])
                                        & (ln > acc["best_len"]))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, ln).otherwise(acc["best_len"]).alias("best_len"))

    cov = F.aggregate(sorted_g, acc0, step,
                      lambda a: a["best"] * a["best_len"])
    tot = total_token_chars(toks)
    return F.when(tot <= 0, F.lit(0.0)).otherwise(
        cov.cast("double") / tot.cast("double"))


def dup_ngram_char_frac(toks: Column, n: int) -> Column:
    """Fraction of token characters inside at least one DUPLICATED n-gram
    occurrence (union of covered token positions — overlap not double-
    counted, Gopher's "fraction of characters contained within duplicate
    n-grams").  Shape: one fold over the sorted (gram, pos) pairs collects
    the duplicated start positions, one interval-merge fold (same walk as
    the span-removal gap fold, operators/spans.py) sums the union's token
    chars — O(T·n + G log G + D·n) per doc, D = duplicated starts."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.struct(F.array_join(F.slice(toks, i, n), " ").alias("g"),
                           i.cast("bigint").alias("pos")))
    sorted_p = F.when(F.size(toks) >= n, F.array_sort(pairs)) \
        .otherwise(F.array().cast("array<struct<g:string,pos:bigint>>"))
    acc0 = F.struct(F.lit("").alias("prev"),
                    F.lit(0).cast("bigint").alias("prev_pos"),
                    F.lit(0).cast("bigint").alias("run"),
                    F.array().cast("array<bigint>").alias("dups"))

    def step(acc, x):
        run = F.when(x["g"] == acc["prev"], acc["run"] + 1) \
            .otherwise(F.lit(1).cast("bigint"))
        # run hits 2: the FIRST occurrence retroactively joins the dup set
        dups = F.when(run == 2,
                      F.concat(acc["dups"],
                               F.array(acc["prev_pos"], x["pos"]))) \
            .when(run > 2, F.array_append(acc["dups"], x["pos"])) \
            .otherwise(acc["dups"])
        return F.struct(x["g"].alias("prev"), x["pos"].alias("prev_pos"),
                        run.alias("run"), dups.alias("dups"))

    dup_starts = F.array_sort(F.aggregate(sorted_p, acc0, step,
                                          lambda a: a["dups"]))
    # interval-merge: each start i covers tokens [i, i+n-1]; clip to the
    # last covered index and sum the newly covered tokens' chars
    m0 = F.struct(F.lit(0).cast("bigint").alias("end"),
                  F.lit(0).cast("bigint").alias("chars"))

    def merge(acc, i):
        s = F.greatest(i, acc["end"] + 1)
        e = i + F.lit(n - 1)
        seg = F.aggregate(
            F.slice(toks, s.cast("int"), (e - s + 1).cast("int")),
            F.lit(0).cast("bigint"), lambda a, t: a + F.length(t))
        return F.struct(e.alias("end"), (acc["chars"] + seg).alias("chars"))

    covered = F.aggregate(dup_starts, m0, merge, lambda a: a["chars"])
    tot = total_token_chars(toks)
    return F.when(tot <= 0, F.lit(0.0)).otherwise(
        covered.cast("double") / tot.cast("double"))


def repetition_ladder_stats_fast(df: DataFrame, id_col: str = "doc_id",
                                 text_col: str = "text") -> DataFrame:
    """(id, the 9 ladder fracs) via one vectorized mapInPandas crossing —
    the batch-counting twin of the ladder's Column expressions (round 6,
    guide §4.2).  The expression rungs each array_sort the gram array and
    run interpreted struct-accumulator folds per doc per n (9 rungs);
    here a Python dict per (doc, n) counts grams in one pass and numpy
    masks the duplicated coverage.  Semantics are identical, tie-breaks
    included: top rung picks max (count, gram char len) with the
    lexicographically smallest joined gram among ties; dup rung covers the
    union of duplicated occurrences; all fractions are the same
    bigint->double divisions.  Parity is pinned by the DuckDB oracle and a
    direct expression-vs-fast equality test
    (tests/test_operators.py::test_repetition_ladder_fast_parity).

    Edge note: NULL text yields all-zero fracs here where the expression
    rungs propagate NULL — indistinguishable on this engine's tables (the
    testdata generator never emits NULL text; callers that might should
    filter first, as every other text operator here does)."""
    import re

    import numpy as np
    import pandas as pd

    top_ns, dup_ns = REP_LADDER_TOP_NS, REP_LADDER_DUP_NS
    frac_cols = [f"top_{n}gram_char_frac" for n in top_ns] + \
                [f"dup_{n}gram_char_frac" for n in dup_ns]

    def ladder_batches(batches):
        ws = re.compile(r"\s+", re.ASCII)

        def doc_stats(text):
            toks = [t for t in ws.split((text or "").strip(" ")) if t]
            T = len(toks)
            lens = np.fromiter((len(t) for t in toks), dtype="int64",
                               count=T)
            tot = int(lens.sum())
            run = np.cumsum(np.concatenate(([0], lens)))
            out = []
            for n in top_ns:
                cov = 0
                if tot > 0 and T >= n:
                    # the winner is max by (count, then charlen) — the
                    # expression fold's final lexicographic tie-break only
                    # picks WHICH gram wins, and every such tie shares the
                    # same (count, charlen) product, so cov is tie-free
                    cnt: dict = {}
                    charlen = {}
                    for i in range(T - n + 1):
                        g = tuple(toks[i:i + n])
                        cnt[g] = cnt.get(g, 0) + 1
                        if g not in charlen:
                            charlen[g] = int(run[i + n] - run[i])
                    bc = max(cnt.values())
                    bl = max(charlen[g] for g, c in cnt.items() if c == bc)
                    cov = bc * bl
                out.append(0.0 if tot <= 0 else float(cov) / float(tot))
            for n in dup_ns:
                chars = 0
                if tot > 0 and T >= n:
                    occ: dict = {}
                    for i in range(T - n + 1):
                        occ.setdefault(tuple(toks[i:i + n]), []).append(i)
                    covered = np.zeros(T, dtype=bool)
                    for idxs in occ.values():
                        if len(idxs) > 1:
                            for i in idxs:
                                covered[i:i + n] = True
                    chars = int(lens[covered].sum())
                out.append(0.0 if tot <= 0 else float(chars) / float(tot))
            return out

        for pdf in batches:
            stats = [doc_stats(t) for t in pdf[text_col]]
            if stats:
                res = pd.DataFrame(stats, columns=frac_cols)
            else:
                res = pd.DataFrame(
                    {c: pd.Series(dtype="float64") for c in frac_cols})
            res.insert(0, id_col, pdf[id_col].to_numpy())
            yield res

    id_type = df.select(id_col).schema.fields[0].dataType.simpleString()
    schema = f"{id_col} {id_type}, " + ", ".join(
        f"{c} double" for c in frac_cols)
    return df.select(id_col, text_col).mapInPandas(ladder_batches,
                                                   schema=schema)


def with_repetition_ladder(df: DataFrame, text_col: str = "extracted_text",
                           lang_col: str | None = None) -> DataFrame:
    """Append the 9 ladder stats (top_{2,3,4}gram_char_frac,
    dup_{5..10}gram_char_frac).  Same token dispatch as
    with_quality_stats; opt-in from the pipeline via
    RuleProfile.gopher_repetition_gates."""
    text = F.col(text_col)
    is_zh = (F.col(lang_col) == "zh") if lang_col else F.lit(False)
    df = df.withColumn("_toks", F.when(is_zh, zh_chars(text))
                       .otherwise(tokens(text)))
    t = F.col("_toks")
    cols = {f"top_{n}gram_char_frac": top_ngram_char_frac(t, n)
            for n in REP_LADDER_TOP_NS}
    cols.update({f"dup_{n}gram_char_frac": dup_ngram_char_frac(t, n)
                 for n in REP_LADDER_DUP_NS})
    return df.withColumns(cols).drop("_toks")


def repetition_ladder_rules(profile: RuleProfile) -> dict[str, Column]:
    rules: dict[str, Column] = {}
    for n, thr in profile.max_top_ngram_char_frac:
        rules[f"dup_top_{n}gram"] = F.col(f"top_{n}gram_char_frac") > thr
    for n, thr in profile.max_dup_ngram_char_frac:
        rules[f"dup_{n}gram"] = F.col(f"dup_{n}gram_char_frac") > thr
    return rules


def sentence_count(text: Column) -> Column:
    """Number of sentence terminators — an ASCII terminator ([.!?]) followed
    by whitespace or end-of-text, or a CJK full-width terminator (。！？,
    which zh prose does NOT space-separate).  C4's "at least 3 sentences"
    page gate (Raffel et al. 2020 §2.2) needs only this count, not a
    segmenter.  The alternation is RE2/Java-identical (no lookarounds)."""
    return F.regexp_count(text, F.lit(r"[.!?](\s|$)|[。！？]")).cast("bigint")


def has_lorem_ipsum(text: Column) -> Column:
    """C4 §2.2: any page containing the placeholder phrase "lorem ipsum"
    (case-insensitive) is an unfinished template shell."""
    return F.contains(F.lower(text), F.lit("lorem ipsum"))


def has_curly_brace(text: Column) -> Column:
    """C4 §2.2: '{' in EXTRACTED text means code/CSS/JSON leaked through
    markup removal — C4 drops the page outright."""
    return F.contains(text, F.lit("{"))


def char_run_sq_sum(text: Column) -> Column:
    """Sum over distinct characters of count², as exact BIGINT — the
    numerator of the Simpson (Herfindahl) character-concentration index.
    ONE fold over the SORTED char array (longest-equal-run bookkeeping, same
    shape as the repetition-stats fold): zero shuffle, stays in codegen, and
    the integer result means the index later needs exactly one double
    division — bitwise-safe under the DuckDB oracle no matter the
    summation order."""
    # split('', '') yields [''] (not []) — drop it so empty text folds to 0
    sorted_c = F.array_sort(
        F.filter(F.split(text, ""), lambda c: c != F.lit("")))
    acc0 = F.struct(F.lit("").alias("prev"),
                    F.lit(0).cast("bigint").alias("run"),
                    F.lit(0).cast("bigint").alias("acc"))

    def step(acc, x):
        is_run = x == acc["prev"]
        run = F.when(is_run, acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))
        # retire the finished run's run² when the char changes
        acc_out = F.when(is_run, acc["acc"]) \
            .otherwise(acc["acc"] + acc["run"] * acc["run"])
        return F.struct(x.alias("prev"), run.alias("run"),
                        acc_out.alias("acc"))

    return F.aggregate(sorted_c, acc0, step,
                       lambda a: a["acc"] + a["run"] * a["run"])


def char_simpson(text: Column) -> Column:
    """Simpson/Herfindahl concentration of the document's character
    distribution: sum_c (count_c / n)², range (0, 1], 1 = one repeated
    character.  The ALGEBRAIC stand-in for character entropy (monotone
    transform of Rényi-2 entropy, which needs log — not identically rounded
    across libms; see the quality-score sigmoid note).  High values flag
    ascii-art / padding / single-char spam that token-level stats miss."""
    n = F.length(text)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        char_run_sq_sum(text).cast("double") / (n * n).cast("double"))


def distinct_char_frac(text: Column) -> Column:
    """Distinct characters over total characters — the companion diversity
    signal (low for repetitive junk, high for dense prose)."""
    n = F.length(text)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(F.split(text, ""))).cast("double")
        / n.cast("double"))


def char_stats_fast(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, n_chars_text, char_sq_sum, char_simpson, distinct_char_frac)
    via one vectorized mapInPandas crossing — the batch twin of the
    char_run_sq_sum / char_simpson / distinct_char_frac Column folds.

    Round-6 motivation is not just speed but DETERMINISM of speed: the
    expression form's per-codepoint array_sort + struct fold is big enough
    that HotSpot's decision to compile the generated loop is a per-JVM
    coin flip — the same query ran 1.5 s or 6.5 s at sf1.0 depending on
    the JVM, stable within a session (BENCH_r05's own samples:
    [8.4, 2.4, 2.3]).  A collections.Counter per doc computes the same
    exact integers (sum of count² over codepoints, distinct codepoints)
    and the same single double divisions; parity pinned by the DuckDB
    oracle and test_char_stats_fast_parity.  NULL text yields zeros here
    (expression form: NULL) — absent from this engine's tables, same note
    as repetition_ladder_stats_fast."""
    from collections import Counter

    import pandas as pd

    def stats_batches(batches):
        def one(t):
            t = t or ""
            n = len(t)
            if n == 0:
                return (0, 0, 0.0, 0.0)
            cnt = Counter(t)
            sq = sum(c * c for c in cnt.values())
            return (n, sq, float(sq) / float(n * n),
                    float(len(cnt)) / float(n))

        for pdf in batches:
            rows = [one(t) for t in pdf[text_col]]
            res = pd.DataFrame(
                rows, columns=["n_chars_text", "char_sq_sum",
                               "char_simpson", "distinct_char_frac"]) \
                if rows else pd.DataFrame({
                    "n_chars_text": pd.Series(dtype="int64"),
                    "char_sq_sum": pd.Series(dtype="int64"),
                    "char_simpson": pd.Series(dtype="float64"),
                    "distinct_char_frac": pd.Series(dtype="float64")})
            res.insert(0, id_col, pdf[id_col].to_numpy())
            yield res

    id_type = df.select(id_col).schema.fields[0].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        stats_batches,
        schema=f"{id_col} {id_type}, n_chars_text bigint, "
               "char_sq_sum bigint, char_simpson double, "
               "distinct_char_frac double")


def toxicity_hits(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*TOXICITY_WORDS))).cast("bigint")


def with_quality_stats(df: DataFrame, text_col: str = "extracted_text",
                       lang_col: str | None = None) -> DataFrame:
    """Append the full heuristic-stat block in one narrow projection.

    Emits: n_words, mean_word_len, symbol_ratio, stopword_frac,
    alpha_word_frac, repeated_line_frac, repeated_paragraph_frac,
    toxicity_hits.
    """
    text = F.col(text_col)
    is_zh = (F.col(lang_col) == "zh") if lang_col else F.lit(False)
    toks = F.when(is_zh, zh_chars(text)).otherwise(tokens(text))
    df = df.withColumn("_toks", toks)
    t = F.col("_toks")
    sw = (stopword_frac_by_lang(t, t, F.col(lang_col)) if lang_col
          else stopword_frac(t, "en"))
    return (
        df.withColumns({
            "n_words": n_words(t),
            "mean_word_len": mean_word_len(t),
            "symbol_ratio": symbol_ratio(text),
            "stopword_frac": sw,
            "alpha_word_frac": alpha_word_frac(t),
            "repeated_line_frac": repeated_line_frac(text),
            "repeated_paragraph_frac": repeated_paragraph_frac(text),
            "bullet_line_frac": bullet_line_frac(text),
            "ellipsis_line_frac": ellipsis_line_frac(text),
            "terminal_punct_line_frac": terminal_punct_line_frac(text),
            "sentence_count": sentence_count(text),
            "has_lorem_ipsum": has_lorem_ipsum(text),
            "has_curly_brace": has_curly_brace(text),
            "toxicity_hits": toxicity_hits(t),
        })
        .drop("_toks")
    )


def heuristic_rules(profile: RuleProfile) -> dict[str, Column]:
    """rule_id -> fired-predicate over the stat columns.  The decision stage
    folds these into the rules array (the rejected.record analogue)."""
    return {
        "too_short": F.col("n_words") < profile.min_words,
        "too_long": F.col("n_words") > profile.max_words,
        "word_len_low": F.col("mean_word_len") < profile.min_mean_word_len,
        "word_len_high": F.col("mean_word_len") > profile.max_mean_word_len,
        "symbol_ratio": F.col("symbol_ratio") > profile.max_symbol_ratio,
        "stopword_frac": F.col("stopword_frac") < profile.min_stopword_frac,
        "alpha_frac": F.col("alpha_word_frac") < profile.min_alpha_word_frac,
        "repeated_lines": F.col("repeated_line_frac") > profile.max_repeated_line_frac,
        "repeated_paragraphs": (F.col("repeated_paragraph_frac")
                                > profile.max_repeated_paragraph_frac),
        "bullet_lines": (F.col("bullet_line_frac")
                         > profile.max_bullet_line_frac),
        "ellipsis_lines": (F.col("ellipsis_line_frac")
                           > profile.max_ellipsis_line_frac),
        # C4's line gate at doc granularity; the default threshold 0.0 can
        # never fire (frac >= 0) — deployments opt in via the profile
        "terminal_punct": (F.col("terminal_punct_line_frac")
                           < profile.min_terminal_punct_line_frac),
        # count/frac are never negative, so the 0 defaults can't fire
        "too_few_sentences": F.col("sentence_count") < profile.min_sentences,
        "lorem_ipsum": (F.col("has_lorem_ipsum") if profile.block_lorem_ipsum
                        else F.lit(False)),
        "curly_brace": (F.col("has_curly_brace") if profile.block_curly_brace
                        else F.lit(False)),
        "toxicity": F.col("toxicity_hits") > profile.max_toxicity_hits,
    }


# --- model-based quality score ----------------------------------------------
#
# The DCLM/FineWeb-style continuous quality signal: a linear model over the
# heuristic stats squashed to (0, 1).  Downstream mixing samples by score
# bucket instead of a hard keep/drop (operators/sampling.py).  The weights
# here are fixed, documented placeholders — a trained classifier (fastText /
# logistic regression on annotated pages) drops in as a new weight vector,
# same column formula, no plan change.
#
# Reference analogue: records carry a GRADED level next to the binary
# accept/reject — Plane.calibrationLevel assigned per product during mapping
# (reference instruments.py:369-372) and propagated through merges
# (instruments.py:838); here the grade is continuous and drives sampling.
#
# Engine-portability constraint (the reason there is no exp/ln here): the
# DuckDB oracle compares DOUBLES BITWISE, and transcendental functions are
# not guaranteed identically rounded across libms.  Every op used — +, -, *,
# /, abs, sqrt — IS correctly rounded under IEEE-754, so Spark and DuckDB
# agree to the last bit.  The squash is the algebraic sigmoid
# z -> 0.5 + z / (2 * (1 + |z|)), monotone, range (0, 1).

QUALITY_WEIGHTS = {
    "bias": -2.0,
    "sqrt_n_words": 0.08,       # saturating size credit (sqrt, not log: IEEE-exact)
    "stopword_frac": 4.0,       # natural-language evidence
    "alpha_word_frac": 2.0,
    "symbol_ratio": -8.0,       # markup/ascii-art penalty
    "repeated_line_frac": -3.0,
    "mean_word_len_dev": -0.15, # distance from the ~5-char prose sweet spot
}


WORD_LEN_SWEET_SPOT = 5.0   # ~prose mean word length the dev-term centers on


def score_feature_exprs(n_words_c: Column, mean_word_len_c: Column,
                        symbol_ratio_c: Column, stopword_frac_c: Column,
                        alpha_word_frac_c: Column,
                        repeated_line_frac_c: Column) -> dict[str, Column]:
    """The ONE definition of the score's feature space, shared by scoring
    and training so trained weights can never silently fit a different
    space.  INSERTION ORDER IS LOAD-BEARING: quality_score sums the terms
    in this order and the DuckDB oracle mirrors it — floating-point
    addition is order-sensitive and the parity check is bitwise."""
    return {
        "sqrt_n_words": F.sqrt(n_words_c.cast("double")),
        "stopword_frac": stopword_frac_c,
        "alpha_word_frac": alpha_word_frac_c,
        "symbol_ratio": symbol_ratio_c,
        "repeated_line_frac": repeated_line_frac_c,
        "mean_word_len_dev": F.abs(mean_word_len_c
                                   - F.lit(WORD_LEN_SWEET_SPOT)),
    }


def quality_score(n_words_c: Column, mean_word_len_c: Column,
                  symbol_ratio_c: Column, stopword_frac_c: Column,
                  alpha_word_frac_c: Column,
                  repeated_line_frac_c: Column,
                  weights: dict[str, float] | None = None) -> Column:
    w = weights or QUALITY_WEIGHTS
    z = F.lit(w["bias"])
    feats = score_feature_exprs(n_words_c, mean_word_len_c, symbol_ratio_c,
                                stopword_frac_c, alpha_word_frac_c,
                                repeated_line_frac_c)
    for name, expr in feats.items():
        z = z + F.lit(w[name]) * expr
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def with_quality_score(df: DataFrame,
                       weights: dict[str, float] | None = None) -> DataFrame:
    """Append ``quality_score`` from the stat columns (with_quality_stats
    must have run).  Null stats (empty payload) propagate to a null score.
    ``weights``: a trained vector from ``train_quality_weights`` drops in
    here; None keeps the documented placeholder weights."""
    return df.withColumn("quality_score", quality_score(
        F.col("n_words"), F.col("mean_word_len"), F.col("symbol_ratio"),
        F.col("stopword_frac"), F.col("alpha_word_frac"),
        F.col("repeated_line_frac"), weights=weights))


def train_quality_weights(decisions: DataFrame,
                          label_col: str = "keep",
                          max_iter: int = 50,
                          reg_param: float = 0.0) -> dict[str, float]:
    """Fit the promised trained classifier for the quality score: a Spark ML
    logistic regression over the SAME six features ``quality_score``
    consumes, returned as a QUALITY_WEIGHTS-shaped dict so it drops
    straight into ``with_quality_score(weights=...)`` with no plan change
    (the DCLM/FineWeb recipe — train on labeled keep/drop decisions, score
    the corpus, mix by score bucket; operators/sampling.py).

    Input: any frame with the stat columns + a boolean label (a decisions
    store read works as-is).  Rows with null stats (empty payloads) are
    excluded — they carry no trainable signal and the pipeline gates them
    deterministically anyway.  Training is JVM-side (pyspark.ml), one pass
    shape: assemble -> L-BFGS; fine at corpus scale (each iteration is one
    map-reduce over the slim feature projection).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feat_exprs = score_feature_exprs(
        F.col("n_words"), F.col("mean_word_len"), F.col("symbol_ratio"),
        F.col("stopword_frac"), F.col("alpha_word_frac"),
        F.col("repeated_line_frac"))
    feats = list(feat_exprs)
    prepared = (
        decisions
        .filter(F.col("n_words").isNotNull()
                & F.col(label_col).isNotNull())
        .select(
            *[expr.alias(name) for name, expr in feat_exprs.items()],
            F.col(label_col).cast("double").alias("label"),
        )
    )
    assembled = VectorAssembler(inputCols=feats, outputCol="features") \
        .transform(prepared)
    model = LogisticRegression(maxIter=max_iter, regParam=reg_param) \
        .fit(assembled)
    out = {"bias": float(model.intercept)}
    out.update({name: float(c) for name, c in zip(feats, model.coefficients)})
    return out
