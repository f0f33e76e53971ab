"""awkward-style jagged-array helpers as Column builders (SURVEY §2.8).

Maps the ``ak.*`` surface the reference uses (num/sum/max/argsort/
pad_none/fill_none/firsts/local_index/where/cartesian, e.g. reference
columnflow/production/util.py:124-214, hist_util.py:30-140) onto Spark
higher-order array functions.  Everything stays inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def num(arr: Column) -> Column:
    """ak.num: object multiplicity per event (empty array -> 0)."""
    return F.coalesce(F.array_size(arr), F.lit(0))


def asum(arr: Column, zero: float = 0.0) -> Column:
    """ak.sum over the object axis."""
    return F.aggregate(arr, F.lit(zero), lambda acc, x: acc + x)


def amax(arr: Column) -> Column:
    return F.array_max(arr)


def amin(arr: Column) -> Column:
    return F.array_min(arr)


def firsts(arr: Column, null_value=None) -> Column:
    """ak.firsts: first element or null/sentinel."""
    col = F.try_element_at(arr, F.lit(1))
    return F.coalesce(col, F.lit(null_value)) if null_value is not None else col


def pad_fill(arr: Column, index: int, null_value) -> Column:
    """ak.pad_none + ak.fill_none at an object index (0-based)."""
    col = F.try_element_at(arr, F.lit(index + 1 if index >= 0 else index))
    return F.coalesce(col, F.lit(null_value))


def local_index(arr: Column) -> Column:
    """ak.local_index: 0-based positions; implemented via sequence()."""
    n = F.coalesce(F.array_size(arr), F.lit(0))
    return F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(F.array().cast("array<int>"))


def where(mask: Column, a: Column, b: Column) -> Column:
    """ak.where elementwise over aligned arrays."""
    return F.zip_with(mask, F.zip_with(a, b, lambda x, y: F.struct(x.alias("x"), y.alias("y"))),
                      lambda m, xy: F.when(m, xy["x"]).otherwise(xy["y"]))


def sort_desc_by(arr: Column, key) -> Column:
    """Sort an array<struct> by ``key(struct)`` descending with a stable
    total order (reference sorted_indices_from_mask / pt-sort,
    columnar_util.py:1134).  Spark's array_sort comparator must return
    -1/0/1."""
    return F.array_sort(
        arr,
        lambda a, b: F.when(key(a) > key(b), F.lit(-1))
        .when(key(a) < key(b), F.lit(1))
        .otherwise(F.lit(0)),
    )


def mask_elements(arr: Column, mask: Column) -> Column:
    """Keep elements where the aligned boolean mask is true (the reducer's
    collection rebuild, reference reduction/util.py:55-113)."""
    return F.filter(
        F.zip_with(arr, mask, lambda x, m: F.when(m, x)),
        lambda x: x.isNotNull(),
    )


def take_indices(arr: Column, indices: Column) -> Column:
    """Build a sub-collection from an index-list column (1-based-safe)."""
    return F.transform(indices, lambda i: F.try_element_at(arr, i + 1))


def concat_safe(a: Column, b: Column) -> Column:
    """ak_concatenate_safe (reference columnar_util.py:1433): concat with
    null arrays treated as empty."""
    empty = F.array()
    return F.concat(F.coalesce(a, empty), F.coalesce(b, empty))
