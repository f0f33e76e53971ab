"""Route: the column-reference IR (reference columnflow/columnar_util.py:125-576).

A Route is a sequence of nested field names plus an optional trailing
object-axis selection (index or slice).  The reference evaluates routes
against awkward arrays with ``ak.pad_none`` + ``ak.fill_none``; here a route
*compiles to a Spark Column expression*:

- ``"o_totalprice"``        -> ``F.col("o_totalprice")``
- ``"items.price"``         -> ``F.col("items.price")`` (array of the field
  when ``items`` is an array<struct> — Spark's native jagged projection)
- ``"items.price[:, 0]"``   -> ``element_at(..., 1)`` with null fill
  (pad+fill parity: out-of-range object index yields ``null_value``)
- ``"items.price[:, -1]"``  -> last element, null-filled
- ``"items.price[:, 1:3]"`` -> ``F.slice(..., 2, 2)`` (no fill — slices
  shrink, matching awkward semantics)

Nano-style underscore names (``"Jet_pt"`` <-> ``"Jet.pt"``) are supported
for parity with ``Route.split_nano``/``join_nano`` (columnar_util.py:254,340).
Sentinel constants match columnar_util.py:48-51.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, types as T
from pyspark.sql import functions as F

#: sentinel values persisted instead of nulls (reference columnar_util.py:48-51)
EMPTY_INT = -99999
EMPTY_FLOAT = -99999.0

_SLICE_RE = re.compile(r"^\[\s*:\s*(?:,\s*(?P<obj>[^\]]+))?\]$")


@dataclass(frozen=True)
class ObjIndex:
    """Object-axis integer index (0-based, may be negative)."""

    index: int


@dataclass(frozen=True)
class ObjSlice:
    """Object-axis slice ``start:stop`` (0-based, stop exclusive, no step)."""

    start: int
    stop: int | None


class Route:
    """Nested column path with optional object-axis selection."""

    DOT_SEP = "."
    NANO_SEP = "_"

    def __init__(self, route: "Route | str | Sequence[str]" = ()):  # noqa: UP037
        tags: set[str] = set()
        if isinstance(route, Route):
            fields, selection = route.fields, route.selection
            tags = set(route.tags)
        elif isinstance(route, str):
            fields, selection = self._parse(route)
        else:
            fields, selection = tuple(route), None
        self.fields: tuple[str, ...] = tuple(fields)
        self.selection: ObjIndex | ObjSlice | None = selection
        #: string tags (reference TagMixin on Route, columnar_util.py:2464):
        #: "optional" — existence checks tolerate absence; "skip" — produced
        #: internally but excluded from keep/write sets.  Tags never affect
        #: equality/hash (two routes to the same column are the same route).
        self.tags: set[str] = tags

    # -- parsing / serialization ------------------------------------------
    @classmethod
    def _parse(cls, s: str) -> tuple[tuple[str, ...], ObjIndex | ObjSlice | None]:
        s = s.strip()
        selection = None
        if "[" in s:
            base, _, rest = s.partition("[")
            m = _SLICE_RE.match("[" + rest)
            if not m:
                raise ValueError(f"unsupported route selection syntax: {s!r}")
            obj = m.group("obj")
            if obj is not None:
                obj = obj.strip()
                if ":" in obj:
                    start_s, _, stop_s = obj.partition(":")
                    start = int(start_s) if start_s.strip() else 0
                    stop = int(stop_s) if stop_s.strip() else None
                    selection = ObjSlice(start, stop)
                else:
                    selection = ObjIndex(int(obj))
            s = base
        fields = tuple(f for f in s.split(cls.DOT_SEP) if f)
        return fields, selection

    @classmethod
    def join(cls, fields: Iterable[str]) -> str:
        return cls.DOT_SEP.join(fields)

    @classmethod
    def join_nano(cls, fields: Iterable[str]) -> str:
        return cls.NANO_SEP.join(fields)

    @classmethod
    def split(cls, name: str) -> tuple[str, ...]:
        return tuple(name.split(cls.DOT_SEP))

    @classmethod
    def split_nano(cls, name: str) -> tuple[str, ...]:
        return tuple(name.split(cls.NANO_SEP))

    @property
    def string_column(self) -> str:
        return self.join(self.fields)

    @property
    def nano_column(self) -> str:
        return self.join_nano(self.fields)

    @property
    def column(self) -> str:
        return self.string_column

    def __str__(self) -> str:
        s = self.string_column
        if isinstance(self.selection, ObjIndex):
            s += f"[:, {self.selection.index}]"
        elif isinstance(self.selection, ObjSlice):
            stop = "" if self.selection.stop is None else self.selection.stop
            s += f"[:, {self.selection.start}:{stop}]"
        return s

    def __repr__(self) -> str:
        return f"Route({str(self)!r})"

    def __hash__(self) -> int:
        return hash((self.fields, self.selection))

    def __eq__(self, other: object) -> bool:
        if isinstance(other, str):
            return str(self) == str(Route(other))
        if isinstance(other, Route):
            return self.fields == other.fields and self.selection == other.selection
        return NotImplemented

    def __add__(self, other: "Route | str | Sequence[str]") -> "Route":  # noqa: UP037
        other = Route(other)
        if self.selection is not None:
            raise ValueError(f"cannot extend route with selection: {self}")
        r = Route(self.fields + other.fields)
        r.selection = other.selection
        return r

    def __len__(self) -> int:
        return len(self.fields)

    def __getitem__(self, i):
        return self.fields[i]

    def startswith(self, other: "Route | str") -> bool:  # noqa: UP037
        other = Route(other)
        return self.fields[: len(other.fields)] == other.fields

    # -- tags --------------------------------------------------------------
    def add_tag(self, tag: "str | Iterable[str]") -> "Route":  # noqa: UP037
        self.tags |= {tag} if isinstance(tag, str) else set(tag)
        return self

    def has_tag(self, tag: "str | Iterable[str]", mode=any) -> bool:
        """Tag membership with glob patterns (reference TagMixin semantics:
        ``has_tag("opt*")`` matches an ``optional`` tag)."""
        import fnmatch

        patterns = [tag] if isinstance(tag, str) else list(tag)
        return mode(any(fnmatch.fnmatch(t, p) for t in self.tags) for p in patterns)

    # -- compilation -------------------------------------------------------
    def apply(self, null_value: float | int | None = None) -> Column:
        """Compile to a Column.  For an object-axis index, out-of-range
        access yields ``null_value`` (pad_none+fill_none parity, reference
        columnar_util.py:499-575); slices shrink without filling."""
        col = F.col(self.string_column)
        if isinstance(self.selection, ObjIndex):
            i = self.selection.index
            # 1-based; negative counts from the end; try_element_at (not
            # element_at) because Spark 4 ANSI mode throws on out-of-range —
            # we want null -> null_value (pad_none+fill_none parity)
            col = F.try_element_at(col, F.lit(i + 1 if i >= 0 else i))
            if null_value is not None:
                col = F.coalesce(col, F.lit(null_value))
        elif isinstance(self.selection, ObjSlice):
            start, stop = self.selection.start, self.selection.stop
            if start < 0:
                raise ValueError(f"negative slice start unsupported: {self}")
            if stop is None:
                # open-ended: length = size - start (a huge constant length
                # silently overflows start+length inside Spark's slice and
                # yields nulls)
                n = F.coalesce(F.array_size(col), F.lit(0))
                col = F.slice(col, start + 1, F.greatest(n - F.lit(start), F.lit(0)))
            else:
                col = F.slice(col, start + 1, max(stop - start, 0))
        return col


def brace_expand(pattern: str) -> list[str]:
    """``"items.{pt,eta}"`` -> ``["items.pt", "items.eta"]`` (reference
    pattern expansion in keep_columns sets, SURVEY §1.4)."""
    m = re.search(r"\{([^{}]*)\}", pattern)
    if not m:
        return [pattern]
    head, tail = pattern[: m.start()], pattern[m.end() :]
    out: list[str] = []
    for part in m.group(1).split(","):
        out.extend(brace_expand(head + part + tail))
    return out


def tagged_column(tag: str | Iterable[str], *routes) -> "Route | set[Route]":
    """Tag one or more routes (reference ``tagged_column``,
    columnar_util.py:2464-2501): accepts anything the Route constructor
    accepts plus sets and brace patterns; returns a single Route for a
    single input, else a set."""
    if not routes:
        raise ValueError("at least one route argument must be given")
    multiple = len(routes) > 1 or isinstance(routes[0], set)
    flat = []
    for r in routes[0] if isinstance(routes[0], set) else routes:
        if isinstance(r, str):
            flat.extend(brace_expand(r))
        else:
            flat.append(r)
    tagged = {Route(r).add_tag(tag) for r in flat}
    multiple |= len(tagged) > 1
    return tagged if multiple else tagged.pop()


def optional_column(*routes) -> "Route | set[Route]":
    """Tag routes ``"optional"`` — their absence never fails existence
    checks or pruning (reference columnar_util.py:2503)."""
    return tagged_column("optional", *routes)


def skip_column(*routes) -> "Route | set[Route]":
    """Tag routes ``"skip"`` — produced internally but excluded from the
    operator's kept/written column set (reference columnar_util.py:2514)."""
    return tagged_column("skip", *routes)


def get_routes(schema: T.StructType, max_depth: int = -1) -> list[Route]:
    """Flatten a (possibly nested) schema into leaf Routes (reference
    ``get_ak_routes``, columnar_util.py:593-643).  Descends through structs
    and arrays-of-struct; an array of primitives is a leaf."""
    out: list[Route] = []

    def walk(fields: tuple[str, ...], dtype: T.DataType, depth: int) -> None:
        if isinstance(dtype, T.StructType) and (max_depth < 0 or depth < max_depth):
            for f in dtype.fields:
                walk(fields + (f.name,), f.dataType, depth + 1)
        elif (
            isinstance(dtype, T.ArrayType)
            and isinstance(dtype.elementType, T.StructType)
            and (max_depth < 0 or depth < max_depth)
        ):
            for f in dtype.elementType.fields:
                walk(fields + (f.name,), f.dataType, depth + 1)
        else:
            out.append(Route(fields))

    for f in schema.fields:
        walk((f.name,), f.dataType, 1)
    return out


def match_routes(routes: Iterable[Route], patterns: Iterable[str]) -> list[Route]:
    """Select routes matching any brace/glob pattern."""
    import fnmatch

    expanded: list[str] = []
    for p in patterns:
        expanded.extend(brace_expand(p))
    out = []
    for r in routes:
        name = r.string_column
        if any(fnmatch.fnmatch(name, p) for p in expanded):
            out.append(r)
    return out
