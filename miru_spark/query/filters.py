"""MiruFilter-analog boolean filter AST -> Spark Column trees.

The reference evaluates a recursive JSON filter tree
``MiruFilter{operation ∈ and|or|pButNotQ, fieldFilters, subFilters}``
against term bitmaps (reference: miru-plugin
``.../plugin/solution/MiruAggregateUtil.java:770-913`` — wildcard
expansion 826-839, empty-AND short-circuit 847-849; AST types
``MiruFilter.java:9-33``, ``MiruFieldFilter.java:14-27``,
``MiruFilterOperation.java:10-23``). Here the same tree compiles to a
Catalyst ``Column`` expression, which gets predicate pushdown, constant
folding, and codegen for free (SURVEY §4 rows 1-2).

Semantics preserved:
- a field filter matches if the field equals any of the exact values OR
  starts with any prefix (``value*`` wildcard);
- multi-valued (array) columns match if any element matches
  (``arrays_overlap``, like the per-term bitmap OR);
- ``pButNotQ`` = first leg AND NOT (any later leg)
  (``MiruAggregateUtil.executeFilter:894-913``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class FieldFilter:
    field: str
    values: list[str] = field(default_factory=list)
    prefixes: list[str] = field(default_factory=list)


@dataclass
class Filter:
    op: str = "and"  # and | or | pButNotQ
    field_filters: list[FieldFilter] = field(default_factory=list)
    sub_filters: list["Filter"] = field(default_factory=list)


def _field_condition(df: DataFrame, ff: FieldFilter) -> Column:
    dtype = df.schema[ff.field].dataType
    col = F.col(ff.field)
    if isinstance(dtype, T.ArrayType):
        conds = []
        if ff.values:
            conds.append(F.arrays_overlap(col, F.array(*[F.lit(v) for v in ff.values])))
        for p in ff.prefixes:
            conds.append(F.exists(col, lambda x: x.startswith(p)))
    else:
        conds = []
        if ff.values:
            conds.append(col.isin(ff.values))
        for p in ff.prefixes:
            conds.append(col.startswith(p))
    if not conds:
        return F.lit(False)  # empty term set -> empty bitmap (reference :847-849)
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def to_column(df: DataFrame, flt: Filter) -> Column:
    legs: list[Column] = [_field_condition(df, ff) for ff in flt.field_filters]
    legs += [to_column(df, sf) for sf in flt.sub_filters]
    if not legs:
        return F.lit(True)
    if flt.op == "and":
        out = legs[0]
        for leg in legs[1:]:
            out = out & leg
        return out
    if flt.op == "or":
        out = legs[0]
        for leg in legs[1:]:
            out = out | leg
        return out
    if flt.op == "pButNotQ":
        out = legs[0]
        for leg in legs[1:]:
            out = out & ~leg
        return out
    raise ValueError(f"unknown filter op {flt.op!r}")


def apply_filter(df: DataFrame, flt: Filter | None) -> DataFrame:
    return df if flt is None else df.filter(to_column(df, flt))
