"""URL canonicalization — the standard pre-dedup normalization of a
web-crawl curation pipeline (C4, Raffel et al., JMLR 2020 §2.2; CCNet,
Wenzek et al., LREC 2020 dedup by URL): the same page arrives under
scheme/host case variants, default ports, www prefixes, duplicate or
trailing slashes, tracking query parameters, reordered query strings,
and fragments. Canonicalizing before the per-URL keep-newest pass is
what makes URL dedup catch them as one page.

Everything here is a map-only JVM expression chain (regexp + string +
array HOFs): no UDF, no shuffle — it canonicalizes 100 TB of URLs at
scan speed and the dedup that follows is one groupBy on the canonical
key. Every rule is mirrored verbatim in the DuckDB oracles (RE2-safe
regexes only: no lookaround, no backreferences).

Rules (applied in order):
1. drop the fragment (``#...``);
2. lowercase the scheme and the host; strip a ``www.`` host prefix;
3. strip the scheme's default port (``:80`` http, ``:443`` https);
4. collapse duplicate ``/`` runs in the path, strip one trailing ``/``;
5. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``ref``), sort the survivors, rejoin; a query left
   empty disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters dropped before the sort — exact names, plus the
#: ``utm_`` prefix family
TRACKING_PARAM_NAMES = ("gclid", "fbclid", "msclkid", "ref")


def _keep_param(p: Column) -> Column:
    key = F.split(p, "=").getItem(0)
    return (
        (p != "")
        & ~key.startswith("utm_")
        & ~key.isin(*TRACKING_PARAM_NAMES)
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules — one map-only
    expression tree, no shuffle, no Python."""
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    pathq = rest.substr(F.length(hostport) + 1, F.length(rest))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host)
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(F.split(query, "&"), _keep_param))
    qjoined = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qjoined == "", F.lit("")).otherwise(F.concat(F.lit("?"), qjoined)),
    )


def sql_canonicalize_url(url_expr: str) -> str:
    """The DuckDB twin of :func:`canonicalize_url` over a SQL expression
    string — identical rule chain so value hashes match exactly."""
    names = ", ".join(f"'{n}'" for n in TRACKING_PARAM_NAMES)
    u = f"regexp_replace({url_expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    hostport = f"lower(regexp_extract({rest}, '^([^/?]*)', 1))"
    pathq = f"substring({rest}, length({hostport}) + 1)"
    host = f"regexp_replace({hostport}, '^www\\.', '')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )
    path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    path = f"regexp_replace(regexp_replace({path}, '/{{2,}}', '/', 'g'), '/$', '')"
    query = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT starts_with(string_split(p, '=')[1], 'utm_') "
        f"AND string_split(p, '=')[1] NOT IN ({names})))"
    )
    # DuckDB array_to_string([]) is NULL (Spark array_join is '') — the
    # un-coalesced form would NULL out the whole concat for any URL whose
    # query is empty or all-tracking (driver-contract gotcha list)
    qjoined = f"coalesce(array_to_string({params}, '&'), '')"
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"(CASE WHEN {qjoined} = '' THEN '' ELSE '?' || {qjoined} END)"
    )
