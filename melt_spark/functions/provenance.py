"""URL/domain provenance gating — the C4/RefinedWeb cleaning step the
corpus pipeline runs BEFORE content-quality scoring: extract the
registrable domain from each document's URL, drop blocklisted domains,
cap documents per domain, and profile what survived per domain.

Background (public): C4 (Raffel et al., JMLR 2020) applies source-level
blocklists; RefinedWeb (Penedo et al., NeurIPS 2023) documents URL
filtering + per-domain caps as the first pipeline stage; the
"registrable domain" notion (eTLD+1) follows the Public Suffix List
convention (publicsuffix.org) — the label directly left of the public
suffix, so `www.example.co.uk` and `cdn.example.co.uk` both gate as
`example.co.uk`.

Scale shape: pure string expressions (codegen'd, zero Python) for the
extraction; the cap is a SALTED two-level top-k (rank within
(domain, salt), then rank the bounded survivors per domain) so a hot
origin never lands in one sort task; one map-side-combined groupBy for
the profile. The suffix set is a literal — a production run swaps in
the full PSL the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Multi-label public suffixes the fixture URLs exercise; a production
# deployment replaces this literal with the full Public Suffix List.
MULTI_SUFFIXES = ("co.uk", "ac.uk", "com.au", "co.jp", "org.uk")


def registrable_domain(url: Column) -> Column:
    """eTLD+1 of a URL: host = authority part, lowercased, userinfo and
    port stripped; registrable = last two labels, or last three when the
    last two form a listed multi-label public suffix.

    The optional ``userinfo@`` prefix is consumed greedily up to the
    LAST '@' before the path, so ``https://user:pw@example.com`` gates
    as ``example.com`` — without it the host capture stopped at the
    first ':' and admitted the spoofable ``user`` (a real-crawl URL can
    smuggle an allowed domain into userinfo: ``https://good.com:x@evil.com``)."""
    host = F.regexp_extract(
        F.lower(url), r"^[a-z][a-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#@]+)", 1)
    labels = F.split(host, r"[.]")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2),
                        F.element_at(labels, -1))
    is_multi = last2.isin(*MULTI_SUFFIXES)
    return F.when(
        (n >= 3) & is_multi,
        F.concat_ws(".", F.element_at(labels, -3), last2)
    ).when(n >= 2, last2).otherwise(host)


def canonical_url(url: Column) -> Column:
    """Canonical form of a crawl URL — the key every crawler dedups on
    before any content is fetched twice (C4/RefinedWeb run URL-level
    exact dedup as stage zero). Contract, applied in order:

      1. fragment dropped (everything from the first '#');
      2. userinfo dropped (up to the last '@' before the path);
      3. scheme and host lowercased; ports dropped; a leading 'www.'
         dropped (www/apex serve the same resource in practice);
      4. tracking parameters removed from the QUERY ONLY (utm_*, gclid,
         fbclid — the client-side decoration that multiplies URLs
         without changing content);
      5. trailing '/' runs stripped from the PATH ONLY.

    Path and query are normalized SEPARATELY (r10, ADVICE fix): the
    earlier single-string pass deleted a literal '&gclid=...' sequence
    occurring in a PATH segment (legal without any '?' — '&' is a valid
    path character) and '/+$' stripped slashes ending a query VALUE
    (?p=/x/ -> ?p=/x) — both silently merged distinct resources in
    stage-zero dedup, invisibly to the oracle because both engines
    agreed. Now the path keeps every '&' and only the query loses
    trackers; the trailing-slash strip runs only on the path (so
    '/a/?x=1' canonicalizes to '/a?x=1' — path-level slash equivalence
    holds regardless of query).

    Deliberately NOT normalized (pinned in tests/test_provenance.py):
    %-encoding case ('%2F' vs '%2f' stay distinct — uppercasing hex
    needs a per-match callback no pure-regexp engine subset shares) and
    ports, which are dropped ENTIRELY (not just :80/:443 — crawl
    decorations near-always keep the scheme default; a genuinely
    distinct same-host service on another port is rarer than the
    decoration noise, and the collapse is the conservative dedup-side
    choice).

    Pure string codegen (regexp extract/replace, no lookarounds — the
    regex subset Java and RE2 agree on), so the DuckDB oracle restates
    it verbatim."""
    scheme = F.lower(F.regexp_extract(
        url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/:?#@]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*[^?#]*[?]([^#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    # tracking-param strip, NAME-ANCHORED at its delimiter (an unanchored
    # pattern would also mangle params merely CONTAINING a tracker name,
    # e.g. ?xgclid=1 — corrupting the canonical key): prefix the query
    # with '&' so every param starts with '&', drop '&tracker=value'
    # params (each consumes only to the next '&' — runs of consecutive
    # trackers all match in one pass), then turn a surviving leading '&'
    # back into '?'; a fully-emptied query contributes nothing
    qn = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("&"), query))
    qn = F.regexp_replace(
        qn, r"&(utm_[a-zA-Z0-9_]+|gclid|fbclid)=[^&]*", "")
    qn = F.regexp_replace(qn, r"^&", "?")
    return F.concat(scheme, F.lit("://"), host, path, qn)


def domain_gate(docs: DataFrame, url_col: str,
                blocklist: list[str], max_per_domain: int,
                id_col: str = "doc_id",
                chars_col: str = "n_chars",
                n_salts: int = 32) -> DataFrame:
    """Per-document gate verdicts: (id, domain, verdict) with verdict in
    {'kept', 'blocked', 'capped'}. Blocklisted domains drop whole;
    surviving domains keep their first ``max_per_domain`` docs in
    ``id_col`` order (deterministic — the cap is reproducible on any
    engine). The cap ranks only unblocked docs.

    Hot-domain hatch (salted top-k): a single per-domain row_number
    would sort a wikipedia.org-sized origin in ONE task at 100 TB.
    Instead the cap is a two-level select: (1) rank within
    (domain, salt) — ``n_salts`` flat tasks per domain; a row whose
    salt-local rank exceeds the cap already has >= cap smaller ids in
    its OWN bucket, so it is provably 'capped' with no global look;
    (2) only salt-local survivors (<= n_salts * cap rows per domain,
    a bounded constant) enter the per-domain rank that picks the true
    first ``max_per_domain`` ids. Output is provably identical to the
    unsalted window (ids are unique), and no unbounded table is ever
    broadcast or single-task-sorted.

    Single-frame derivation (r10, ADVICE fix): the first cut of the
    hatch unioned three branches that each re-derived the scan — the
    registrable_domain regex chain ran three times and the probes showed
    the COMMON (non-hot) case regressing ~7-10x. Now ONE salt-local
    window runs over the whole frame (blocked rows rank among
    themselves — the block flag is in the partition key, so they still
    consume no cap slots), the frame is localCheckpoint'd (one narrow
    row per doc), and both output branches read the materialized frame:
    blocked/provably-capped verdicts are pure projections; only the
    bounded survivors pay the second window."""
    d = docs.select(F.col(id_col).alias("id"), F.col(chars_col).alias("nc"),
                    registrable_domain(F.col(url_col)).alias("domain"))
    local = (d.withColumn("__blk", F.col("domain").isin(*blocklist))
             .withColumn("__lrn", F.row_number().over(
                 Window.partitionBy("__blk", "domain",
                                    F.pmod(F.xxhash64("id"),
                                           F.lit(n_salts)))
                 .orderBy("id")))
             .localCheckpoint(eager=False))
    pre = (local.filter(F.col("__blk")
                        | (F.col("__lrn") > max_per_domain))
           .select("id", "domain", "nc",
                   F.when(F.col("__blk"), F.lit("blocked"))
                   .otherwise(F.lit("capped")).alias("verdict")))
    cand = (local.filter(~F.col("__blk")
                         & (F.col("__lrn") <= max_per_domain))
            .withColumn("__grn", F.row_number().over(
                Window.partitionBy("domain").orderBy("id")))
            .select("id", "domain", "nc",
                    F.when(F.col("__grn") <= max_per_domain, F.lit("kept"))
                    .otherwise(F.lit("capped")).alias("verdict")))
    return pre.unionByName(cand)


def domain_profile(gated: DataFrame) -> DataFrame:
    """Per-domain provenance profile over domain_gate's verdicts:
    (domain, n_docs, n_kept, n_blocked, n_capped, kept_chars) — the
    table a corpus audit reads to see WHERE the training data comes
    from and what the gate did to each origin. One map-side-combined
    groupBy on the domain."""
    return (gated.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("verdict") == "kept").cast("int"))
        .cast("bigint").alias("n_kept"),
        F.sum((F.col("verdict") == "blocked").cast("int"))
        .cast("bigint").alias("n_blocked"),
        F.sum((F.col("verdict") == "capped").cast("int"))
        .cast("bigint").alias("n_capped"),
        F.sum(F.when(F.col("verdict") == "kept", F.col("nc"))
              .otherwise(F.lit(0))).cast("bigint").alias("kept_chars")))
