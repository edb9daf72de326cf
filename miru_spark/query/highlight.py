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
