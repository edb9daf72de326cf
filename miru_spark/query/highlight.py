"""Snippet highlighting: fragments of matched docs around query hits.

Reference: ``LuceneBackedQueryParser.highlight`` wraps Lucene's
Highlighter/QueryScorer to return ``<b>``-tagged fragments
(miru-stream-plugins ``.../fulltext/LuceneBackedQueryParser.java:56-74``).
Here: a deterministic Arrow-batched kernel — find query-term hits with
the same tokenizer the index uses, emit up to ``max_fragments`` windows
of ``fragment_chars`` centered on the first hits, with hits wrapped in
``<b>...</b>``. Applied AFTER top-k (project-after-limit: only surviving
docs pay the cost, the reference's lazy Promise gather,
``FullText.java:204-217``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _make_highlighter(terms: list[str], fragment_chars: int, max_fragments: int):
    # one alternation regex over analyzed terms, longest-first, word-ish
    # boundaries via the same [a-z0-9]+ token alphabet as the analyzer
    alts = sorted({t for t in terms if t}, key=len, reverse=True)
    pat = re.compile(
        r"(?<![a-z0-9])(" + "|".join(re.escape(t) for t in alts) + r")(?![a-z0-9])",
        re.IGNORECASE,
    )

    def fragments(text: str | None) -> list[str]:
        if not text:
            return []
        out = []
        last_end = -1
        for m in pat.finditer(text):
            if len(out) >= max_fragments:
                break
            if m.start() < last_end:  # hit already inside previous fragment
                continue
            lo = max(0, m.start() - fragment_chars // 2)
            hi = min(len(text), m.end() + fragment_chars // 2)
            frag = text[lo:hi]
            out.append(pat.sub(lambda mm: f"<b>{mm.group(0)}</b>", frag))
            last_end = hi
        return out

    return fragments


def token_fragments(
    hits: DataFrame,
    docs: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    context_tokens: int = 5,
    max_fragments: int = 3,
    use_stopwords: bool = False,
    locale: str | None = None,
) -> DataFrame:
    """Token-level fragment twin of :func:`highlight` — same greedy
    windowing rule, but over the ANALYZED token stream, which makes it a
    pure whole-stage-codegen expression (no Python) AND exactly
    SQL-expressible, so a relational oracle can reproduce the fragments
    byte-for-byte (the char-level form's lookaround windows cannot be
    stated in RE2).

    Rule: hit positions = 1-based indexes of tokens in ``terms``; greedy
    pick of up to ``max_fragments`` hits, each next hit strictly past the
    previous hit's window end (``pos > prev + context_tokens``); each
    fragment is the ±``context_tokens`` token window with every hit token
    wrapped in ``<b>..</b>``, fragments joined with ``" … "``. Adds a
    ``fragments`` string column to ``hits``.

    ``locale`` must be the locale the index was analyzed with (it
    resolves through the same ``find_analyzer`` chain as indexing), so
    hit positions and windows agree with the index's token stream —
    the frozen ASCII default would mis-tokenize e.g. 'Straße' on a
    ``de`` index.
    """
    from miru_spark.analysis.tokenizer import tokens_col

    w = context_tokens
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    joined = src.join(F.broadcast(hits), "doc_id")

    terms_arr = F.array(*[F.lit(t) for t in sorted(set(terms))])
    # Every intermediate is PROJECTED to its own column: referencing the
    # tokens/hit-positions expressions inline would re-inline their whole
    # subtree at each use site (the greedy chain references the previous
    # pick several times -> exponential expression blowup; measured 22s
    # for 5 rows inlined vs milliseconds projected).
    step = joined.withColumn(
        "_toks", tokens_col(F.col("_text"), use_stopwords=use_stopwords, locale=locale)
    )
    # guard: sequence(1, 0) would count DOWN; empty texts get no positions
    pos = F.when(
        F.size("_toks") > 0, F.sequence(F.lit(1), F.size("_toks"))
    ).otherwise(F.array().cast("array<int>"))
    step = step.withColumn(
        "_hits",
        F.filter(pos, lambda i: F.array_contains(terms_arr, F.element_at(F.col("_toks"), i))),
    )
    # greedy chain: h_{i+1} = first hit past h_i's window. Null-safe:
    # p > null is null -> filter drops it -> array_min(empty) is null,
    # so a missing h_i nulls every later pick and concat_ws skips them.
    pick_cols = []
    step = step.withColumn("_h0", F.get("_hits", 0))
    pick_cols.append("_h0")
    for i in range(1, max_fragments):
        prev = F.col(f"_h{i - 1}")
        step = step.withColumn(
            f"_h{i}", F.array_min(F.filter(F.col("_hits"), lambda p: p > prev + w))
        )
        pick_cols.append(f"_h{i}")

    def _frag(name):
        h = F.col(name)
        lo = F.greatest(F.lit(1), h - w)
        ln = F.least(F.size("_toks"), h + w) - lo + F.lit(1)
        return F.when(
            h.isNotNull(),
            F.array_join(
                F.transform(
                    F.slice(F.col("_toks"), lo, ln),
                    lambda t: F.when(
                        F.array_contains(terms_arr, t),
                        F.concat(F.lit("<b>"), t, F.lit("</b>")),
                    ).otherwise(t),
                ),
                " ",
            ),
        )

    out_cols = [c for c in joined.columns if c != "_text"]
    return step.select(
        *out_cols,
        F.concat_ws(" … ", *[_frag(n) for n in pick_cols]).alias("fragments"),
    )


def highlight(
    hits: DataFrame,
    docs: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    fragment_chars: int = 60,
    max_fragments: int = 3,
) -> DataFrame:
    """Join top-k ``hits`` (doc_id, score, ...) back to ``docs`` and add a
    ``fragments`` array column. Hits side is small (post-limit), so it
    broadcasts; the doc scan is pruned by the join."""
    frag_fn = _make_highlighter(terms, fragment_chars, max_fragments)

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    joined = src.join(F.broadcast(hits), "doc_id")

    cols = [c for c in joined.columns if c != "_text"]
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in joined.schema.fields if f.name != "_text"
    ) + ", fragments array<string>"

    def _hl(pdf_iter):
        for pdf in pdf_iter:
            out = pdf[cols].copy()
            out["fragments"] = [frag_fn(t) for t in pdf["_text"]]
            yield out

    return joined.mapInPandas(_hl, schema=schema)
