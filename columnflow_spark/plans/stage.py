"""Stage planner: column-set resolution -> select pushdown.

The reference's planner (SURVEY §3.2/§4) computes the union of every
operator's ``used_columns`` and passes it to the chunked reader as the
read-column set, then filters writes through ``RouteFilter`` on
``produced_columns``.  On Spark the same logic becomes a leading
``select`` — Catalyst then prunes the parquet scan (including *nested*
schema pruning for struct/array fields) — plus an optional trailing
projection before write.

This is deliberately plain Python, not a Catalyst rule: the operator
declarations are the only thing Catalyst cannot see (Python closures), so
we resolve them up front and keep everything downstream declarative.
"""

from __future__ import annotations

import enum
from collections.abc import Iterable

from pyspark.sql import DataFrame

from columnflow_spark.core.registry import ArrayFunction
from columnflow_spark.core.routes import Route


class ColumnCollection(enum.Flag):
    """Named column sets usable in keep declarations (reference
    ``ColumnCollection``, columnar_util.py:578): resolved against the ops
    of a chain by operator family name, so a reduction config can say
    "keep everything the producers made" without naming columns."""

    ALL_FROM_CALIBRATOR = enum.auto()
    ALL_FROM_SELECTOR = enum.auto()
    ALL_FROM_REDUCER = enum.auto()
    ALL_FROM_PRODUCER = enum.auto()
    ALL_FROM_ML_EVALUATION = enum.auto()


_COLLECTION_FAMILY = {
    ColumnCollection.ALL_FROM_CALIBRATOR: "Calibrator",
    ColumnCollection.ALL_FROM_SELECTOR: "Selector",
    ColumnCollection.ALL_FROM_REDUCER: "Reducer",
    ColumnCollection.ALL_FROM_PRODUCER: "Producer",
    ColumnCollection.ALL_FROM_ML_EVALUATION: "MLModel",
}


def resolve_collection(collection: ColumnCollection, ops: Iterable[ArrayFunction]) -> set[Route]:
    """Union of produced columns of every op whose family matches any flag
    set in *collection*."""
    families = {name for flag, name in _COLLECTION_FAMILY.items() if flag in collection}
    out: set[Route] = set()
    for op in ops:
        bases = {c.__name__ for c in type(op).__mro__}
        if bases & families:
            out |= op.produced_columns
    return out


def prune_columns(df: DataFrame, routes: Iterable[Route], keep: Iterable[str] = ()) -> DataFrame:
    """Project ``df`` down to the top-level columns containing any used
    route (nested-field pruning below the root is left to Catalyst's
    SchemaPruning, which handles struct/array-of-struct access natively).

    A missing root raises — unless every route under it is tagged
    ``optional`` (reference optional_column, columnar_util.py:2503), in
    which case it is silently dropped."""
    required_roots: set[str] = set()
    optional_roots: set[str] = set()
    for r in routes:
        if not r.fields:
            continue
        (optional_roots if r.has_tag("optional") else required_roots).add(r.fields[0])
    optional_roots -= required_roots
    roots = required_roots | optional_roots | set(keep)
    existing = [c for c in df.columns if c in roots]
    missing = (required_roots | set(keep)) - set(df.columns)
    if missing:
        raise ValueError(f"used columns missing from input: {sorted(missing)}")
    return df.select(*existing)


class StageChain:
    """Compose operator instances into one lazy DataFrame plan.

    ``run`` = prune(union of used columns) -> op1 -> op2 -> ... with schema
    validation between stages (reference ``ArrayFunction._check_columns``,
    columnar_util.py:2366)."""

    def __init__(self, ops: Iterable[ArrayFunction], keep: Iterable[str] = ()):
        self.ops = [op for op in ops if not op.skipped]
        self.keep = tuple(keep)

    @property
    def used_columns(self) -> set[Route]:
        """Columns required *from the input*: each stage's uses minus
        everything earlier stages produce (the reference resolves this the
        same way when assembling read_columns, tasks/selection.py:171-179)."""
        out: set[Route] = set()
        produced_roots: set[str] = set()
        for op in self.ops:
            for r in op.used_columns:
                if r.fields and r.fields[0] not in produced_roots:
                    out.add(r)
            produced_roots |= {r.fields[0] for r in op.produced_columns if r.fields}
        return out

    @property
    def produced_columns(self) -> set[Route]:
        out: set[Route] = set()
        for op in self.ops:
            out |= op.produced_columns
        return out

    def filter_output(self, df: DataFrame, keep=()) -> DataFrame:
        """Write-side keep filter (reference ReduceEvents ``keep_columns``):
        ``keep`` entries are route patterns or :class:`ColumnCollection`
        flags resolved against this chain's operators (e.g. keep everything
        the producers made, without naming columns)."""
        from columnflow_spark.core.columns import route_filter

        patterns: list[str] = []
        for k in keep:
            if isinstance(k, ColumnCollection):
                patterns.extend(str(r) for r in resolve_collection(k, self.ops))
            else:
                patterns.append(str(k))
        return route_filter(df, keep=patterns)

    def run(self, df: DataFrame, prune: bool = True) -> DataFrame:
        if prune:
            df = prune_columns(df, self.used_columns, keep=self.keep)
        for op in self.ops:
            op.setup()
            result = op(df)
            df = result[0] if isinstance(result, tuple) else result
        return df
