"""URL identity columns — pure string projections.

Reference analogue: file-name identity parsing — ``remove_extensions``
(cfht_name.py:433-444), ``sequence_number`` regex prefix (cfht_name.py:231-242),
``get_obs_id`` suffix stripping (cfht_name.py:407-431).  All become built-in
Column expressions so Catalyst folds/fuses them; no Python crossing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def host(url: Column) -> Column:
    """Registered host of the url (the skew/salting key, SURVEY.md §4)."""
    return F.parse_url(url, F.lit("HOST"))


def path(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def doc_id_from_url(url: Column) -> Column:
    """Stable content key: path with a trailing .html/.htm/.php stripped —
    the ``remove_extensions`` analogue (cfht_name.py:433-444)."""
    return F.regexp_replace(path(url), r"\.(html?|php|aspx?)$", "")


TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "utm_term",
                   "utm_content", "gclid", "fbclid", "ref")


def canonical_url(url: Column) -> Column:
    """Canonical form for crawl identity: drop the fragment, strip the
    well-known tracking query params (UTM family, click ids), drop a
    then-empty ``?``, and strip one trailing slash from a non-root path —
    the same URL fetched through different campaign links collapses to one
    identity.  Pure regexp chain (codegen'd, zero Python), restricted to
    the Java/RE2-identical subset so the DuckDB oracle runs the SAME
    patterns.  Reference analogue: ``remove_extensions`` normalizes the
    storage name before identity is assigned (cfht_name.py:433-444)."""
    out = F.regexp_replace(url, r"#.*$", "")                # fragment
    for p in TRACKING_PARAMS:
        # a tracking param + its value, keeping exactly one separator sane:
        # '?p=v&x' -> '?x'; '&p=v' -> ''
        out = F.regexp_replace(out, r"([?&])" + p + r"=[^&#]*&", "$1")
        out = F.regexp_replace(out, r"[?&]" + p + r"=[^&#]*$", "")
    out = F.regexp_replace(out, r"\?$", "")                 # bare '?'
    return F.regexp_replace(out, r"(//[^/]+/.+?)/$", "$1")  # trailing slash


def payload_info(html: Column) -> Column:
    """struct<n_bytes, md5> of the raw payload — the FileInfo probe (S6,
    reference cfht_name.py:528-529: size/md5/type per file), used for
    change detection and idempotent re-stores."""
    return F.struct(
        F.coalesce(F.length(html), F.lit(0)).cast("bigint").alias("n_bytes"),
        F.md5(html).alias("md5"),
    )


def salted_key(url: Column, n_salts: int = 16) -> Column:
    """host + deterministic salt bucket — used to repartition ahead of
    per-host windows so one hot host cannot pin a single task (SURVEY.md §4
    skew row; north_rule 'salted repartition for skewed hosts')."""
    return F.concat_ws("#", host(url), F.pmod(F.xxhash64(url), F.lit(n_salts)).cast("string"))
