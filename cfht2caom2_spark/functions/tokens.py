"""Token counting and document fingerprinting — built-in expressions only.

Training-data-pipeline utilities over text columns:
  * whitespace token count and a BPE-ish subword count (regex segmentation
    approximating GPT-2's pre-tokenizer word/number/punct split);
  * md5 fingerprint of whitespace-normalized text (exact-dup key);
  * polynomial rolling hash over the character stream (order-sensitive
    fingerprint; the classic Rabin-Karp shape) via ``F.aggregate`` — stays in
    the JVM, and is expressible verbatim in the DuckDB oracle via
    ``list_reduce``.

Reference analogue: md5-based change detection (`store_modified_files_only`,
reference config/config.yml:33-36) and the string-projection getter family
(cfht_name.py:433-444).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# GPT-2-style pre-tokenizer approximation: a token is a letter run, a digit
# run, or a single non-space symbol.  Same regex works in RE2 for the oracle.
BPE_ISH_PATTERN = r"[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-z0-9À-ÿ\s]"

POLY_MOD = 1_000_000_007
POLY_BASE = 31


def ws_token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish segments via regexp_count (JVM, no tokenizer lib)."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("bigint")


def norm_text(text: Column) -> Column:
    """Whitespace-normalized lowercase text — the dedup canonical form."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def md5_fingerprint(text: Column) -> Column:
    return F.md5(norm_text(text).cast("binary"))


def rolling_hash(text: Column) -> Column:
    """Polynomial hash sum(c_i * 31^i) mod 1e9+7 over ASCII codes, computed
    left-to-right with mod at each step (all intermediates < 2^35, overflow-
    free in int64 under both Spark and DuckDB semantics)."""
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * POLY_BASE + c) % POLY_MOD,
    )
