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


# The unambiguous tracking set only: campaign/click identifiers that never
# select content.  Bare "ref" is deliberately ABSENT — on many sites it is
# functional (?ref=<branch> on code hosts, ?ref=<page> pagination) and
# stripping it merges genuinely distinct pages before dedup; deployments
# wanting aggressive stripping pass their own set via ``tracking_params``.
TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "utm_term",
                   "utm_content", "gclid", "fbclid")


def canonical_url(url: Column,
                  tracking_params: tuple[str, ...] = TRACKING_PARAMS) -> Column:
    """Canonical form for crawl identity: drop the fragment, strip the
    well-known tracking query params (UTM family, click ids — ALL
    occurrences), drop a then-empty query, and strip one trailing slash
    from a non-root PATH — the same URL fetched through different campaign
    links collapses to one identity.

    Decomposes on the first ``?`` and filters the split param LIST instead
    of regex-rewriting the whole URL (the round-4 review's failure cases:
    a literal ``&`` in the PATH must never be read as a param separator;
    repeated params must all go; ``/x/?page=2`` must collapse with
    ``/x?page=2``).  The query is extracted by the SAME first-``?`` string
    split as the base — NOT ``parse_url`` (java.net.URI rejects unencoded
    spaces/``|``/``[``/non-ASCII, common in crawl data, and would NULL out
    a legitimate query while the regex-derived base kept the path:
    ``/search?q=a b`` and ``/search?q=c`` must stay distinct identities).
    Four passes total, all codegen'd; the DuckDB oracle mirrors the same
    decomposition.  Reference analogue: ``remove_extensions`` normalizes
    the storage name before identity is assigned (cfht_name.py:433-444)."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    base = F.regexp_replace(no_frag, r"\?.*$", "")          # scheme+host+path
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)        # '' when no '?'
    tracking = "|".join(tracking_params)
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != F.lit("")) & ~kv.rlike(f"^(?:{tracking})="))
    base = F.regexp_replace(base, r"(//[^/]+/.+?)/$", "$1")  # path slash
    return F.when(F.size(kept) > 0,
                  F.concat(base, F.lit("?"), F.array_join(kept, "&"))) \
        .otherwise(base)


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
