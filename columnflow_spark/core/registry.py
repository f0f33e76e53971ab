"""ArrayFunction registry: the engine's operator/extension API.

Reproduces the contract of the reference's ``ArrayFunction`` /
``TaskArrayFunction`` (reference columnflow/columnar_util.py:1625-3160):

- operators are subclasses created via ``derive`` or decorators, registered
  in per-class registries (reference ``DerivableMeta``, util.py:791-1030);
- class-level ``uses`` / ``produces`` sets declare column dependencies —
  entries are route strings, ``Route`` objects, or *other operator classes*
  whose column sets are resolved recursively
  (``used_columns``/``produced_columns``, columnar_util.py:2350-2365);
- instances hold instantiated dependencies addressable as ``self[dep]``
  (``create_dependencies``, columnar_util.py:2187);
- lifecycle hooks: ``init_func`` (may mutate uses/produces, add deps),
  ``skip_func`` (conditionally drop an operator, e.g. mc_only),
  ``requires_func``/``setup_func`` (load external payloads — broadcast
  variables in Spark), ``teardown_func``;
- ``__call__`` runs ``call_func(df, **kwargs)``.

Unlike the reference there is no sandboxing/task re-exec: a Spark plan is
assembled lazily in one process, so hooks run inline.  Column-set
resolution feeds the stage planner (:mod:`columnflow_spark.plans.stage`)
which turns it into a ``select`` pushdown so Catalyst prunes parquet IO.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any, ClassVar

from pyspark.sql import DataFrame

from columnflow_spark.core.routes import Route


class ConditionalColumn:
    """Column set included only when ``condition(func_inst)`` holds at
    resolution time (reference ``ArrayFunction.ConditionalColumn``,
    columnar_util.py:1905; factories ``IF_DATA``/``IF_MC``/
    ``IF_DATASET_HAS_TAG`` :2448-2462).  The condition sees the operator
    instance, so ``func.dataset_inst`` (a catalog :class:`Dataset`) drives
    mc/data conditioning of individual columns."""

    def __init__(self, routes: tuple, condition: Callable, name: str = "?"):
        self.routes = routes
        self.condition = condition
        self.name = name

    def __invert__(self) -> "ConditionalColumn":  # noqa: UP037
        return ConditionalColumn(self.routes, lambda func: not self.condition(func), f"!{self.name}")

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"ConditionalColumn({self.name}, {self.routes!r})"

    def applies(self, func: "ArrayFunction") -> bool:  # noqa: UP037
        return bool(self.condition(func))

    @classmethod
    def factory(cls, condition: Callable, name: str) -> Callable:
        def make(*routes) -> ConditionalColumn:
            return cls(routes, condition, name)

        make.__name__ = name
        return make


IF_DATA = ConditionalColumn.factory(lambda func: func.dataset_inst.is_data, "IF_DATA")
IF_MC = ConditionalColumn.factory(lambda func: func.dataset_inst.is_mc, "IF_MC")


def IF_DATASET_HAS_TAG(*tags: str, negate: bool = False) -> Callable:
    """Factory of factories (reference columnar_util.py:2457): columns
    included when the instance's dataset carries any of *tags*."""
    return ConditionalColumn.factory(
        lambda func: bool(func.dataset_inst.has_tag(tags)) != bool(negate),
        f"IF_DATASET_HAS_TAG{tags!r}",
    )


class ArrayFunction:
    """Base operator: wraps ``call_func(df) -> df`` with declared column
    sets and a dependency closure."""

    # class-level declarations (copied per subclass by derive())
    uses: ClassVar[set] = set()
    produces: ClassVar[set] = set()

    call_func: ClassVar[Callable | None] = None
    init_func: ClassVar[Callable | None] = None
    skip_func: ClassVar[Callable | None] = None
    requires_func: ClassVar[Callable | None] = None
    setup_func: ClassVar[Callable | None] = None
    teardown_func: ClassVar[Callable | None] = None

    # registry of derived classes, keyed by cls_name (shared per subclass tree)
    _subclasses: ClassVar[dict[str, type["ArrayFunction"]]] = {}  # noqa: UP037

    # ------------------------------------------------------------------ class
    @classmethod
    def derive(cls, cls_name: str, cls_dict: dict[str, Any] | None = None) -> type["ArrayFunction"]:  # noqa: UP037
        cls_dict = dict(cls_dict or {})
        cls_dict.setdefault("uses", set())
        cls_dict.setdefault("produces", set())
        subcls = type(cls_name, (cls,), cls_dict)
        cls._registry()[cls_name] = subcls  # type: ignore[index]
        return subcls  # type: ignore[return-value]

    @classmethod
    def _registry(cls) -> dict[str, type["ArrayFunction"]]:  # noqa: UP037
        # each direct subclass family gets its own registry dict
        if "_subclasses" not in cls.__dict__:
            cls._subclasses = {}
        return cls.__dict__["_subclasses"]

    @classmethod
    def get_cls(cls, name: str) -> type["ArrayFunction"]:  # noqa: UP037
        return cls._registry()[name]

    @classmethod
    def has_cls(cls, name: str) -> bool:
        return name in cls._registry()

    # --------------------------------------------------------------- instance
    def __init__(self, **kwargs: Any):
        self.inst_dict = dict(kwargs)
        # copy class-level sets so init_func mutations stay per-instance
        self.uses = set(type(self).uses)
        self.produces = set(type(self).produces)
        self.deps: dict[type[ArrayFunction], ArrayFunction] = {}
        self._setup_done = False
        self.create_dependencies()
        if self.init_func is not None:
            type(self).init_func(self)
            # init may have added new deps
            self.create_dependencies()

    def __getattr__(self, attr: str) -> Any:
        try:
            return self.__dict__["inst_dict"][attr]
        except KeyError:
            raise AttributeError(f"{type(self).__name__} has no attribute {attr!r}") from None

    def __getitem__(self, dep: "type[ArrayFunction] | str") -> "ArrayFunction":  # noqa: UP037
        if isinstance(dep, str):
            dep = type(self).get_cls(dep)
        return self.deps[dep]

    def create_dependencies(self) -> None:
        # descend through nested containers AND ConditionalColumn contents:
        # the reference iterates DeferredColumn contents during dependency
        # sync (columnar_util.py:2116/2240), so e.g. IF_MC(SomeProducer)
        # must instantiate SomeProducer here — applies() gates resolution
        # later, not construction
        def walk(entry: Any):
            dep_cls = self._as_dependency(entry)
            if dep_cls is not None:
                yield dep_cls
            elif isinstance(entry, ConditionalColumn):
                for r in entry.routes:
                    yield from walk(r)
            elif isinstance(entry, (set, frozenset, tuple, list)):
                for r in entry:
                    yield from walk(r)

        for entry in list(self.uses) + list(self.produces):
            for dep_cls in walk(entry):
                if dep_cls not in self.deps:
                    # skipped deps are kept too, for introspection
                    self.deps[dep_cls] = dep_cls(**self.inst_dict)

    @staticmethod
    def _as_dependency(entry: Any) -> "type[ArrayFunction] | None":  # noqa: UP037
        if isinstance(entry, type) and issubclass(entry, ArrayFunction):
            return entry
        if isinstance(entry, ArrayFunction):
            return type(entry)
        return None

    @property
    def skipped(self) -> bool:
        return bool(self.skip_func and type(self).skip_func(self))

    # --------------------------------------------------------- column-set IR
    def _resolve_columns(self, attr: str, _seen: set | None = None) -> set[Route]:
        _seen = _seen if _seen is not None else set()
        if id(self) in _seen:
            return set()
        _seen.add(id(self))
        # keyed by route (tags excluded from eq/hash), values carry the
        # UNION of tags seen for that route: when the same column appears
        # both tagged and untagged across entries/deps, which instance
        # arrives first must not decide skip-filtering or optional-pruning
        out: dict[Route, Route] = {}

        def merge(r: Route) -> None:
            prev = out.get(r)
            if prev is None:
                out[r] = r
            elif r.tags - prev.tags:
                merged = Route(prev)
                merged.tags |= r.tags
                out[r] = merged

        def add_entry(entry: Any) -> None:
            dep_cls = self._as_dependency(entry)
            if dep_cls is not None:
                dep = self.deps[dep_cls]
                if not dep.skipped:
                    # a dependency in `uses` contributes its USED columns;
                    # in `produces` its PRODUCED columns (reference flag
                    # semantics AUTO, columnar_util.py:2350-2365)
                    for r in dep._resolve_columns(attr, _seen):
                        merge(r)
            elif isinstance(entry, ConditionalColumn):
                # evaluated against THIS instance: dataset-dependent columns
                # appear/disappear per dataset (reference IF_MC/IF_DATA)
                if entry.applies(self):
                    for r in entry.routes:
                        add_entry(r)
            elif isinstance(entry, Route):
                merge(entry)
            elif isinstance(entry, str):
                merge(Route(entry))
            elif isinstance(entry, (set, frozenset, tuple, list)):
                for r in entry:
                    add_entry(r)
            else:
                raise TypeError(f"unsupported {attr} entry: {entry!r}")

        for entry in getattr(self, attr):
            add_entry(entry)
        return set(out.values())

    @property
    def used_columns(self) -> set[Route]:
        return self._resolve_columns("uses")

    @property
    def produced_columns(self) -> set[Route]:
        """Resolved produced routes; ``skip``-tagged routes are produced
        internally but never part of the kept/written set (reference
        skip_column semantics, columnar_util.py:2514)."""
        return {r for r in self._resolve_columns("produces") if not r.has_tag("skip")}

    # ------------------------------------------------------------------ call
    def setup(self, payloads: dict[str, Any] | None = None) -> None:
        """Run setup hooks bottom-up (broadcast payload loading)."""
        for dep in self.deps.values():
            if not dep.skipped:
                dep.setup(payloads)
        if not self._setup_done and self.setup_func is not None:
            type(self).setup_func(self, payloads or {})
        self._setup_done = True

    def teardown(self) -> None:
        for dep in self.deps.values():
            dep.teardown()
        if self.teardown_func is not None:
            type(self).teardown_func(self)

    def __call__(self, df: DataFrame, **kwargs: Any):
        if self.call_func is None:
            raise NotImplementedError(f"{type(self).__name__} has no call_func")
        return type(self).call_func(self, df, **kwargs)


def array_function(
    base: type[ArrayFunction] = ArrayFunction,
    name: str | None = None,
    uses: Iterable | None = None,
    produces: Iterable | None = None,
    **hooks: Callable | Any,
) -> Callable:
    """Decorator creating an ArrayFunction subclass from ``call_func``
    (mirrors the reference's ``@calibrator/@selector/...`` decorators,
    e.g. calibration/__init__.py:78)."""

    def deco(func: Callable) -> type[ArrayFunction]:
        cls_dict: dict[str, Any] = {
            "uses": set(uses or ()),
            "produces": set(produces or ()),
            "call_func": func,
        }
        cls_dict.update(hooks)
        return base.derive(name or func.__name__, cls_dict)

    return deco
