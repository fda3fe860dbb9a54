"""PII / toxicity scrub pass — compiled-regex replacement chains, JVM-side.

Reference analogue: ``CFHTValueRepair`` — a table-driven canonicalization of
known-bad values applied to the finished record (reference
instruments.py:222-266, invoked at :830): *repair, don't reject, when safe;
record what was repaired*.  Here each PII pattern is one ``regexp_replace``
link in a chain (whole-stage-codegen'd, zero Python), and each pattern that
matched contributes a scrub-rule id so lineage can attribute every mutation.

Patterns live in config.PII_PATTERNS and are restricted to the regex subset
with identical semantics in Java regex and RE2 — so the DuckDB oracle can run
the very same patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import PII_PATTERNS


def scrubbed(text: Column) -> Column:
    """The scrub chain: apply every pattern in declared order."""
    out = text
    for _rule, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def scrub_rules_fired(text: Column) -> Column:
    """array<string> of scrub-rule ids whose pattern matched the input."""
    flags = [
        F.when(text.rlike(pattern), F.lit(rule))
        for rule, pattern, _repl in PII_PATTERNS
    ]
    arr = F.array(*flags)
    return F.array_sort(F.filter(arr, lambda x: x.isNotNull()))


def with_scrub(df: DataFrame, text_col: str = "extracted_text") -> DataFrame:
    """Append ``scrubbed_text`` + ``scrub_rules`` (order: declared chain)."""
    text = F.col(text_col)
    return df.withColumns({
        "scrubbed_text": scrubbed(text),
        "scrub_rules": scrub_rules_fired(text),
    })
