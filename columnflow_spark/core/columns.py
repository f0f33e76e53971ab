"""Nested column operations (SURVEY §2.2): the Spark re-expression of the
reference's column manipulation layer —

- ``set_column``    ≈ ``set_ak_column``     (reference columnar_util.py:669)
- ``remove_column`` ≈ ``remove_ak_column``  (:759)
- ``add_aliases``   ≈ ``add_ak_alias(es)``  (:803, :883) incl. the
  raise/original/remove missing-source strategies
- ``update_table``  ≈ ``update_ak_array``   (:905), the N-source column
  merge; the positional lockstep of the reference becomes a natural-key
  join (SURVEY §7.4: positional merges are fragile under shuffling, the
  key form is the robust distributed equivalent)
- ``flatten_table`` ≈ ``flatten_ak_array``  (:993) in dot or nano format
- ``route_filter``  ≈ ``RouteFilter``       (:1550), keep/remove route
  sets with brace/glob patterns, rebuilding partial structs/collections

Event-level fields are struct members (arbitrary nesting); object-level
fields live one level inside an ``array<struct>`` collection — the same
two shapes the reference distinguishes (event vs jagged object columns).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnflow_spark.core.routes import Route, get_routes, match_routes


def _schema_of(df: DataFrame, root: str) -> T.DataType:
    return df.schema[root].dataType


def set_column(
    df: DataFrame,
    route: Route | str,
    value: Column | Callable[[Column], Column],
    cast: str | None = None,
) -> DataFrame:
    """Insert or overwrite a (nested) column.

    Event level (``"x"`` / ``"rec.x"``): *value* is a Column.  Object level
    (``"items.x"`` where ``items`` is array<struct>): *value* is a callable
    ``element -> Column`` applied per object.  ``cast`` is the optional
    explicit dtype (the reference's ``value_type``)."""
    route = Route(route)
    root, rest = route.fields[0], route.fields[1:]
    if not rest:
        col = value if isinstance(value, Column) else F.lit(value)
        return df.withColumn(root, col.cast(cast) if cast else col)
    dt = _schema_of(df, root) if root in df.columns else None
    if isinstance(dt, T.ArrayType):
        if isinstance(value, Column) or not callable(value):
            raise TypeError(f"object-level set on '{route}' needs a per-element callable")
        field = ".".join(rest)

        def rebuild(x: Column) -> Column:
            v = value(x)
            return x.withField(field, v.cast(cast) if cast else v)

        return df.withColumn(root, F.transform(F.col(root), rebuild))
    # struct (or new struct) path
    if not isinstance(value, Column):
        raise TypeError(f"event-level set on '{route}' needs a Column")
    v = value.cast(cast) if cast else value
    if root not in df.columns:
        base: Column = F.struct(v.alias(rest[-1]))
        for name in reversed(rest[:-1]):
            base = F.struct(base.alias(name))
        return df.withColumn(root, base)
    return df.withColumn(root, F.col(root).withField(".".join(rest), v))


def remove_column(df: DataFrame, route: Route | str) -> DataFrame:
    """Drop a (nested) column (reference remove_ak_column,
    columnar_util.py:759)."""
    route = Route(route)
    root, rest = route.fields[0], route.fields[1:]
    if not rest:
        return df.drop(root)
    dt = _schema_of(df, root)
    field = ".".join(rest)
    if isinstance(dt, T.ArrayType):
        return df.withColumn(root, F.transform(F.col(root), lambda x: x.dropFields(field)))
    return df.withColumn(root, F.col(root).dropFields(field))


def add_aliases(
    df: DataFrame,
    aliases: Mapping[str, str],
    remove_src: bool = False,
    missing: str = "raise",
) -> DataFrame:
    """Copy ``src`` routes onto ``dst`` routes (shift aliasing, reference
    add_ak_aliases columnar_util.py:883).  ``missing`` handles absent
    sources: ``"raise"``, ``"original"`` (keep dst as-is) or ``"remove"``
    (drop dst)."""
    names = {r.string_column for r in get_routes(df.schema)} | set(df.columns)
    for dst, src in aliases.items():
        if Route(src).string_column in names:
            df = set_column(df, dst, Route(src).apply())
            if remove_src:
                df = remove_column(df, src)
        elif missing == "original":
            continue
        elif missing == "remove":
            if Route(dst).string_column in names:
                df = remove_column(df, dst)
        else:
            raise ValueError(f"alias source missing: {src}")
    return df


def update_table(
    primary: DataFrame,
    *others: DataFrame,
    key: Iterable[str],
    policy: str = "overwrite",
) -> DataFrame:
    """Merge the columns of N same-event tables (reference update_ak_array,
    columnar_util.py:905: the chunked lockstep positional merge).  Rows are
    aligned on the natural ``key``; non-key columns from later tables win
    under ``policy="overwrite"`` (the reference default) or must be new
    under ``policy="raise"``."""
    key = list(key)
    out = primary
    for other in others:
        new_cols = [c for c in other.columns if c not in key]
        clashes = [c for c in new_cols if c in out.columns]
        if clashes and policy == "raise":
            raise ValueError(f"overlapping columns: {clashes}")
        out = out.drop(*clashes).join(other, on=key, how="left")
    return out


def flatten_table(df: DataFrame, fmt: str = "dot") -> DataFrame:
    """Nested -> flat projection of all leaf routes with dot
    (``items.price``) or nano (``items_price``) names (reference
    flatten_ak_array columnar_util.py:993 + nano naming §1.2)."""
    routes = get_routes(df.schema)
    cols = []
    for r in routes:
        name = r.string_column if fmt == "dot" else r.nano_column
        cols.append(r.apply().alias(name))
    return df.select(*cols)


def has_column(df: DataFrame, route: Route | str) -> bool:
    """Whether the (possibly nested) route exists in the schema (reference
    ``has_ak_column``, columnar_util.py:773): descends structs and
    arrays-of-struct field by field."""
    route = Route(route)
    dt: T.DataType = df.schema
    for name in route.fields:
        if isinstance(dt, T.ArrayType):
            dt = dt.elementType
        if not isinstance(dt, T.StructType) or name not in dt.fieldNames():
            return False
        dt = dt[name].dataType
    return True


def nest_nano_columns(df: DataFrame) -> DataFrame:
    """Flat nano-style columns -> nested collections (reference
    ``attach_nano_schema``: NanoAOD ships ``Jet_pt``/``Jet_eta`` flat
    arrays that become the per-event ``Jet`` collection).  Columns sharing
    an underscore prefix whose members are all arrays zip into one
    ``array<struct>`` via ``arrays_zip`` (positional, in-row, no shuffle);
    all-scalar groups nest into a struct; ungrouped columns pass through.
    The inverse of :func:`flatten_table` with ``fmt="nano"``."""
    groups: dict[str, list[str]] = {}
    singles: list[str] = []
    for c in df.columns:
        head, sep, tail = c.partition("_")
        if sep and tail:
            groups.setdefault(head, []).append(c)
        else:
            singles.append(c)
    out_cols: list[Column] = [F.col(c) for c in singles]
    dtypes = dict(df.dtypes)
    for head, members in groups.items():
        if len(members) == 1:
            out_cols.append(F.col(members[0]))
            continue
        fields = [m.partition("_")[2] for m in members]
        if all(dtypes[m].startswith("array") for m in members):
            out_cols.append(
                F.arrays_zip(*[F.col(m).alias(f) for m, f in zip(members, fields)]).alias(head)
            )
        else:
            out_cols.append(
                F.struct(*[F.col(m).alias(f) for m, f in zip(members, fields)]).alias(head)
            )
    return df.select(*out_cols)


def _rebuild_partial(dt: T.DataType, col: Column, kept: list[tuple[tuple[str, ...], Route]]) -> Column:
    """Rebuild a struct column keeping only the listed relative paths."""
    assert isinstance(dt, T.StructType)
    members = []
    for f in dt.fields:
        sub = [(path[1:], r) for path, r in kept if path and path[0] == f.name]
        if not sub:
            continue
        child = col[f.name]
        if any(len(p) > 0 for p, _ in sub) and isinstance(f.dataType, T.StructType):
            members.append(_rebuild_partial(f.dataType, child, sub).alias(f.name))
        else:
            members.append(child.alias(f.name))
    return F.struct(*members)


def route_filter(
    df: DataFrame,
    keep: Iterable[str] | None = None,
    remove: Iterable[str] = (),
) -> DataFrame:
    """Write-side projection from keep/remove route patterns (reference
    RouteFilter columnar_util.py:1550; brace patterns like
    ``"items.{price,qty}"`` and globs like ``"sel__*"`` supported).
    Partially-kept structs and array<struct> collections are rebuilt with
    only the surviving members."""
    routes = get_routes(df.schema)
    kept = set(match_routes(routes, keep)) if keep is not None else set(routes)
    kept -= set(match_routes(routes, remove))
    by_root: dict[str, list[Route]] = {}
    for r in routes:
        by_root.setdefault(r.fields[0], []).append(r)
    cols: list[Column] = []
    for root in df.columns:  # preserve input column order
        all_leaves = by_root.get(root, [])
        kept_leaves = [r for r in all_leaves if r in kept]
        if not kept_leaves:
            continue
        if len(kept_leaves) == len(all_leaves):
            cols.append(F.col(root))
            continue
        dt = _schema_of(df, root)
        rel = [(r.fields[1:], r) for r in kept_leaves]
        if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):

            def make_rebuild(elem_dt: T.StructType, paths):
                # single-arg closure: pyspark infers HOF lambda arity from
                # the signature, so extra defaulted params are not allowed
                return lambda x: _rebuild_partial(elem_dt, x, paths)

            cols.append(F.transform(F.col(root), make_rebuild(dt.elementType, rel)).alias(root))
        elif isinstance(dt, T.StructType):
            cols.append(_rebuild_partial(dt, F.col(root), rel).alias(root))
        else:
            cols.append(F.col(root))
    return df.select(*cols)
