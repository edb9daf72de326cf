"""Versioned index schema descriptor + additive-evolution guard.

Reference analogue: ``MiruSchema.checkAdditive`` (reference:
miru-api .../activity/schema/MiruSchema.java:303-314) rejects a schema
replacement unless every existing field definition is preserved and new
fields are only appended — a non-additive change (dropping a field,
changing a field's type) would silently mix incompatible vocabularies
inside one index. Here the analogue of a "field definition" is the
build configuration that shapes the indexed vocabulary and physical
layout: analyzer locale, stopword setting, keyword (composite-term)
fields, stored columns, block size, and the id/text column bindings.

``build_index`` / ``StreamingIndexer`` persist this descriptor as
``schema.json`` at the index root on first build, and every later
append/resume re-checks it: a non-additive mismatch raises
``SchemaEvolutionError`` BEFORE any data is written; an additive change
(new keyword field, new stored column) is accepted and re-persisted
with a bumped version, applying to shards built from then on — the
reference's forward-only additive evolution.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


class SchemaEvolutionError(ValueError):
    """A build/append was configured non-additively vs the persisted schema."""


def _analyzer_gen_compatible(old_gen: int, new_gen: int) -> bool:
    """True when appending under analyzer generation ``new_gen`` to an
    index pinned at ``old_gen`` is safe: the newer generation only ADDED
    locale codes, so every locale valid under the old generation
    tokenizes identically (tokenizer.ANALYZER_COMPATIBLE_PREDECESSORS
    declares which generations that holds for)."""
    from miru_spark.analysis.tokenizer import (ANALYZER_COMPATIBLE_PREDECESSORS,
                                               ANALYZER_VERSION)

    return new_gen == ANALYZER_VERSION and old_gen in ANALYZER_COMPATIBLE_PREDECESSORS


@dataclass
class IndexSchema:
    id_col: str
    text_col: str
    locale: str | None
    use_stopwords: bool
    block_bits: int
    # name -> source column of composite ``field:value`` terms
    keyword_fields: dict = field(default_factory=dict)
    stored_cols: list = field(default_factory=list)
    version: int = 1
    # tokenizer.ANALYZER_VERSION at build time; indexes persisted before
    # the field existed read back as generation 1
    analyzer_version: int = 1

    # Fields whose change rewires the TOKEN STREAM or physical layout of
    # every already-built shard — never additive (the reference's
    # "type.isAdditiveTo" has no analogue here: a different analyzer is a
    # different vocabulary, a different block size a different layout).
    _IMMUTABLE = ("id_col", "text_col", "locale", "use_stopwords",
                  "block_bits", "analyzer_version")


def schema_path(index_dir: str) -> str:
    return os.path.join(index_dir, "schema.json")


def read_schema(index_dir: str) -> IndexSchema | None:
    path = schema_path(index_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return IndexSchema(**json.load(f))


def write_schema(index_dir: str, schema: IndexSchema) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = schema_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(schema), f, indent=1, sort_keys=True)
    os.replace(tmp, schema_path(index_dir))  # atomic, like the manifests


def check_additive(old: IndexSchema, new: IndexSchema) -> list[str]:
    """Violations making ``new`` a NON-additive evolution of ``old``.

    Empty list = additive (identical, or appends only). Mirrors
    ``MiruSchema.checkAdditive``: every existing definition must be
    preserved verbatim; only appends are allowed.
    """
    problems: list[str] = []
    for f_ in IndexSchema._IMMUTABLE:
        a, b = getattr(old, f_), getattr(new, f_)
        if a != b:
            if f_ == "analyzer_version" and _analyzer_gen_compatible(a, b):
                continue
            problems.append(f"{f_} changed {a!r} -> {b!r} (rewires every built shard)")
    for name, src in old.keyword_fields.items():
        if name not in new.keyword_fields:
            problems.append(f"keyword field {name!r} removed")
        elif new.keyword_fields[name] != src:
            problems.append(
                f"keyword field {name!r} rebound {src!r} -> {new.keyword_fields[name]!r}"
            )
    missing_stored = [c for c in old.stored_cols if c not in new.stored_cols]
    if missing_stored:
        problems.append(f"stored columns removed: {missing_stored}")
    return problems


def enforce_additive(index_dir: str, new: IndexSchema) -> IndexSchema:
    """Validate ``new`` against the persisted schema and persist the result.

    No persisted schema (fresh build, or an index predating the guard):
    ``new`` is written as version 1. Additive change: written with
    ``old.version + 1``. Non-additive: ``SchemaEvolutionError`` with every
    violation listed — before any data write, so the index is untouched.
    """
    old = read_schema(index_dir)
    if old is None:
        write_schema(index_dir, new)
        return new
    problems = check_additive(old, new)
    if problems:
        raise SchemaEvolutionError(
            f"non-additive schema change for index {index_dir!r}: "
            + "; ".join(problems)
            + " (rebuild with overwrite=True to change these)"
        )
    changed = (
        new.keyword_fields != old.keyword_fields
        or new.stored_cols != old.stored_cols
        # a compatible analyzer-generation step (new codes only) is
        # re-persisted so the pin reflects the code that now appends
        or new.analyzer_version != old.analyzer_version
    )
    new.version = old.version + 1 if changed else old.version
    if changed:
        write_schema(index_dir, new)
    return new
