"""SelectionResult: masks-as-data (reference columnflow/selection/__init__.py:129-344).

The reference's selectors do NOT drop rows; they emit a result object
holding the per-event decision, named step masks, and per-object masks,
which is persisted as its own table and only applied at the reduction
stage.  Spark form: every mask is a Column —

- ``event``: BooleanType column (AND of steps by default)
- ``steps``: dict name -> BooleanType column
- ``objects``: dict src_collection -> dict dst_collection -> array<boolean>
  (object mask) or array<int> (index list) column

``+`` merges results like the reference (AND of event masks, union of
steps/objects with duplicate detection, selection/__init__.py:228).
``to_columns`` flattens into namespaced columns (``sel__event``,
``sel__step_<name>``, ``sel__obj_<src>__<dst>``) so the whole result can be
written as a masks table next to the events parquet, exactly like
SelectEvents does (reference tasks/selection.py:171-179).
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EVENT_COL = "sel__event"
STEP_PREFIX = "sel__step_"
OBJ_PREFIX = "sel__obj_"


class SelectionResult:
    def __init__(
        self,
        event: Column | None = None,
        steps: dict[str, Column] | None = None,
        objects: dict[str, dict[str, Column]] | None = None,
        aux: dict[str, Any] | None = None,
    ):
        self.event = event
        self.steps = dict(steps or {})
        self.objects = {k: dict(v) for k, v in (objects or {}).items()}
        self.aux = dict(aux or {})

    def __add__(self, other: "SelectionResult") -> "SelectionResult":  # noqa: UP037
        if not isinstance(other, SelectionResult):
            return NotImplemented
        dup_steps = set(self.steps) & set(other.steps)
        if dup_steps:
            raise ValueError(f"duplicate selection steps: {dup_steps}")
        event = (
            (self.event & other.event)
            if self.event is not None and other.event is not None
            else (self.event if self.event is not None else other.event)
        )
        objects = {k: dict(v) for k, v in self.objects.items()}
        for src, dsts in other.objects.items():
            tgt = objects.setdefault(src, {})
            dup = set(tgt) & set(dsts)
            if dup:
                raise ValueError(f"duplicate object masks for {src}: {dup}")
            tgt.update(dsts)
        return SelectionResult(event, {**self.steps, **other.steps}, objects, {**self.aux, **other.aux})

    def event_or_all_steps(self) -> Column:
        """The event decision: explicit mask, else AND of all steps
        (reference create_event_mask, reduction/util.py:26)."""
        if self.event is not None:
            return self.event
        if not self.steps:
            return F.lit(True)
        return reduce(lambda a, b: a & b, self.steps.values())

    def to_columns(self) -> dict[str, Column]:
        cols = {EVENT_COL: self.event_or_all_steps()}
        for name, col in self.steps.items():
            cols[f"{STEP_PREFIX}{name}"] = col
        for src, dsts in self.objects.items():
            for dst, col in dsts.items():
                cols[f"{OBJ_PREFIX}{src}__{dst}"] = col
        return cols

    def attach(self, df: DataFrame) -> DataFrame:
        """Materialize all masks as namespaced columns."""
        return df.withColumns(self.to_columns())


def apply_event_mask(df: DataFrame) -> DataFrame:
    """Reduction step 1: drop failing events (reference reduction/default.py:48)."""
    return df.filter(F.col(EVENT_COL))


def rebuild_collection(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Reduction step 2: build sub-collection ``dst`` from the stored object
    mask over ``src`` (reference create_collections_from_masks,
    reduction/util.py:55-113).  The mask column may be array<boolean>
    (elementwise) or array<int> (index list, already sorted)."""
    mask_col = f"{OBJ_PREFIX}{src}__{dst}"
    dtype = dict(df.dtypes).get(mask_col, "")
    if dtype.startswith("array<int") or dtype.startswith("array<bigint"):
        expr = F.transform(F.col(mask_col), lambda i: F.try_element_at(F.col(src), i + 1))
    else:
        expr = F.filter(
            F.zip_with(F.col(src), F.col(mask_col), lambda x, m: F.when(m, x)),
            lambda x: x.isNotNull(),
        )
    return df.withColumn(dst, expr)
