"""Web-corpus URL and paragraph operators.

Standard stages of a crawl-derived training pipeline that act on the
page's ADDRESS and BLOCK structure rather than its token stream:

- :func:`canonical_url` — URL canonicalization, the key every crawl
  dedup/blocklist/recrawl policy joins on (a page is fetched under many
  spellings of one address: case in scheme/host, default ports,
  tracking params, fragments, param order).
- :func:`paragraph_dedup` — corpus-wide duplicated-paragraph removal,
  the CCNet dedup unit (Wenzek et al. 2020 dedup by paragraph hash;
  boilerplate nav/footer blocks repeat across a site's every page while
  the documents stay distinct, so doc-level dedup never catches them).

Both are pure JVM expression/aggregation plans (no Python in the row
path) and are exactly reproducible in ANSI SQL for the driver oracle.
Reference scope note: the reference engine indexes activities that
already carry canonical keys (miru-api MiruActivity's termized fields);
these operators produce such keys from raw crawl columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RFC-3986 appendix-B style split, restricted to hierarchical scheme://
# URLs (the crawl case). Plain regex — no lookarounds — so the Java
# (Spark) and RE2 (DuckDB oracle) engines agree on every input.
_URL_RE = r"^([^:/?#]+)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

# tracking parameters dropped by name (utm_* dropped by prefix)
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref")


def canonical_url(df: DataFrame, url_col: str) -> DataFrame:
    """Append ``url_canon`` and ``host`` columns.

    Canonicalization rules (each a deterministic, idempotent rewrite):

    - scheme and authority lowercased (userinfo, when present, is
      lowercased with the authority — a documented simplification);
    - default ports dropped (``:80`` for http, ``:443`` for https);
    - trailing ``/`` stripped from the path (root collapses to "");
    - query parameters: tracking params removed (``utm_`` prefix +
      :data:`TRACKING_PARAMS` by name), the rest SORTED (param order is
      transport noise), empty query dropped with its ``?``;
    - fragment dropped (never sent to the server).

    A value that does not parse as ``scheme://...`` passes through
    verbatim (relative links, mailto:, data: — the caller's filter
    problem, not silently mangled). Everything is one whole-stage
    codegen expression per row: no UDF, no shuffle.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    auth = F.lower(F.regexp_extract(u, _URL_RE, 2))
    path = F.regexp_extract(u, _URL_RE, 3)
    query = F.regexp_extract(u, _URL_RE, 4)

    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    # host = authority minus userinfo and port (join key for per-domain
    # caps/blocklists); split('@') takes the last element, split(':') the
    # first — both total on hosts without the separators
    host = F.split(F.element_at(F.split(auth, "@"), -1), ":")[0]

    path = F.regexp_replace(path, "/+$", "")

    params = F.filter(F.split(query, "&"), lambda p: p != "")
    kept = F.filter(
        params,
        lambda p: ~F.split(p, "=")[0].startswith("utm_")
        & ~F.split(p, "=")[0].isin(*TRACKING_PARAMS),
    )
    qs = F.array_join(F.array_sort(kept), "&")

    canon = F.concat(
        scheme, F.lit("://"), auth, path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return df.withColumn(
        "url_canon", F.when(scheme == "", u).otherwise(canon)
    ).withColumn("host", F.when(scheme == "", F.lit(None)).otherwise(host))


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep_re: str = r"\n+",
) -> DataFrame:
    """Corpus-wide duplicated-paragraph removal, keep-first.

    Split each doc on ``sep_re``, trim, drop empties; a paragraph whose
    exact text occurs at more than one (doc, position) keeps only its
    globally-first occurrence (min (id, pos)) — CCNet's paragraph-hash
    dedup unit, the stage that removes repeated nav/footer/boilerplate
    blocks that doc-level dedup can never see. Surviving paragraphs
    rejoin with ``\\n`` in original order.

    Returns ``(id, text_clean, n_paragraphs, removed_paragraphs)``; docs
    with no duplicated paragraph pass through with ``removed_paragraphs
    = 0`` (text re-joined from their own split, so the separator is
    normalized to ``\\n`` — token content is untouched).

    Plan shape (100 TB): paragraphs explode to block scale; ONE
    groupBy(paragraph-hash) computes each hash's first occurrence with
    map-side partial min; the candidate stream re-joins on the same
    hash key (co-partitioned, AQE handles the boilerplate-hash skew);
    one groupBy(id) reassembles docs. groupBy-min + join, not a window
    over the hash partition — the hottest boilerplate paragraph may
    repeat 10^9 times and a window would sort that group. The exploded
    relation is persisted (it feeds the first-occurrence agg, the
    candidate join, and the per-doc counts): the source table is
    scanned and regex-split exactly once, not once per consumer — at
    scale a checkpoint table does the same job.
    """
    # posexplode_outer + carried n_paragraphs: empty/null docs keep one
    # (pos=null, para=null) row so they survive to the output with
    # text_clean="" — and no second pass over the source for counts
    px = (
        df.select(
            F.col(id_col).alias("id"),
            F.filter(
                F.transform(F.split(F.col(text_col), sep_re), lambda x: F.trim(x)),
                lambda x: x != "",
            ).alias("ps"),
        )
        .select(
            "id",
            F.size("ps").alias("n_paragraphs"),
            F.posexplode_outer("ps").alias("pos", "para"),
        )
        .withColumn("h", F.md5(F.col("para")))
        .persist()
    )
    firsts = (
        px.filter(F.col("para").isNotNull())
        .groupBy("h")
        .agg(F.min(F.struct("id", "pos")).alias("first_occ"))
    )
    kept = (
        px.join(firsts, "h")
        .filter(
            (F.col("id") == F.col("first_occ.id"))
            & (F.col("pos") == F.col("first_occ.pos"))
        )
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                "\n",
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    # all-duplicate docs drop out of `kept` entirely — the per-doc count
    # side (one agg over the SAME cached relation) restores them
    return (
        px.groupBy("id").agg(F.first("n_paragraphs").alias("n_paragraphs"))
        .join(kept, "id", "left")
        .select(
            "id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "n_paragraphs",
            (F.col("n_paragraphs") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("removed_paragraphs"),
        )
    )
