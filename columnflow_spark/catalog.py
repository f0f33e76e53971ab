"""Metadata catalog: Analysis → Config → Dataset / Process / Channel /
hierarchical Category, mirroring the reference's ``order``-based object
model (reference columnflow/config_util.py:440-780, and the ``od.*``
classes it builds on) without the external dependency.

The reference wires every task to an ``od.Config`` carrying datasets
(``is_mc``, file counts), a process tree with cross-sections, channels and
a category hierarchy whose leaves carry *selection* strings; categorizers
evaluate those selections per event into a ``category_ids`` array column.
Here the same registry drives Spark plans: :func:`leaf_category_ids_column`
compiles the leaf selections into one ``array_compact(array(when(...)))``
expression (pure Catalyst, codegen'd — the catalog stays driver-side
metadata and never ships to executors).

Parity anchors:

- ``create_category_id``      → reference config_util.py:440 (hash + offset)
- ``CategoryGroup``           → reference config_util.py:523
- ``create_category_combinations`` → reference config_util.py:549
- ``get_events_from_categories``   → reference config_util.py:31
  (leaf-expansion semantics pinned by reference tests/test_config_util.py)
"""

from __future__ import annotations

import dataclasses
import hashlib
import itertools
from collections.abc import Callable, Iterable, Iterator
from typing import Any


class UniqueObject:
    """Named, id'd catalog node with aux data and string tags (the slice of
    the reference's ``od.UniqueObject``/``AuxDataMixin``/``TagMixin`` the
    engine needs)."""

    def __init__(
        self,
        name: str,
        id: int,
        label: str | None = None,
        aux: dict[str, Any] | None = None,
        tags: Iterable[str] = (),
    ) -> None:
        if not name:
            raise ValueError("a non-empty name is required")
        self.name = str(name)
        self.id = int(id)
        self.label = label if label is not None else self.name
        self.aux = dict(aux or {})
        self.tags = set(tags)

    def x(self, key: str, default: Any = ...) -> Any:
        if default is ...:
            return self.aux[key]
        return self.aux.get(key, default)

    def has_tag(self, tag: str | Iterable[str], mode: Callable = any) -> bool:
        """Tag membership with glob patterns (reference TagMixin)."""
        import fnmatch

        patterns = [tag] if isinstance(tag, str) else list(tag)
        return mode(any(fnmatch.fnmatch(t, p) for t in self.tags) for p in patterns)

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"{type(self).__name__}(name={self.name!r}, id={self.id})"


class UniqueObjectIndex:
    """Order-preserving name+id index; rejects duplicate names and ids."""

    def __init__(self, cls: type) -> None:
        self._cls = cls
        self._by_name: dict[str, UniqueObject] = {}
        self._by_id: dict[int, UniqueObject] = {}

    def add(self, obj: UniqueObject) -> UniqueObject:
        if not isinstance(obj, self._cls):
            raise TypeError(f"expected {self._cls.__name__}, got {type(obj).__name__}")
        if obj.name in self._by_name:
            raise ValueError(f"duplicate {self._cls.__name__} name {obj.name!r}")
        if obj.id in self._by_id:
            raise ValueError(f"duplicate {self._cls.__name__} id {obj.id} ({obj.name!r})")
        self._by_name[obj.name] = obj
        self._by_id[obj.id] = obj
        return obj

    def get(self, key: str | int) -> UniqueObject:
        table = self._by_id if isinstance(key, int) else self._by_name
        if key not in table:
            raise ValueError(f"unknown {self._cls.__name__} {key!r}")
        return table[key]

    def has(self, key: str | int) -> bool:
        return key in (self._by_id if isinstance(key, int) else self._by_name)

    def __iter__(self) -> Iterator[UniqueObject]:
        return iter(self._by_name.values())

    def __len__(self) -> int:
        return len(self._by_name)

    def names(self) -> list[str]:
        return list(self._by_name)


class Process(UniqueObject):
    """Physics/data process with per-energy cross-sections and sub-process
    tree (reference ``od.Process``; xsec stitching uses the leaf sums —
    see queries/physics.py normalization_stitched)."""

    def __init__(self, name: str, id: int, xsecs: dict[float, float] | None = None, **kwargs) -> None:
        super().__init__(name, id, **kwargs)
        self.xsecs = dict(xsecs or {})
        self.processes = UniqueObjectIndex(Process)
        self.parent: Process | None = None

    def add_process(self, process: Process | str, id: int | None = None, **kwargs) -> Process:
        if isinstance(process, str):
            process = Process(process, id, **kwargs)
        self.processes.add(process)
        process.parent = self
        return process

    def walk_processes(self) -> Iterator[Process]:
        """Depth-first over this process and all sub-processes."""
        yield self
        for child in self.processes:
            yield from child.walk_processes()

    @property
    def is_leaf(self) -> bool:
        return len(self.processes) == 0

    def get_leaf_processes(self) -> list[Process]:
        return [p for p in self.walk_processes() if p.is_leaf]

    def get_xsec(self, ecm: float) -> float:
        """Cross-section at center-of-mass energy *ecm*; non-leaf processes
        sum their leaves (the stitching invariant)."""
        if self.is_leaf or ecm in self.xsecs:
            return self.xsecs[ecm]
        return sum(p.get_xsec(ecm) for p in self.get_leaf_processes())


class Dataset(UniqueObject):
    """A concrete set of files for one or more processes (reference
    ``od.Dataset``): ``is_mc`` drives IF_MC/IF_DATA column conditioning,
    ``n_files``/``n_events`` drive chunking decisions."""

    def __init__(
        self,
        name: str,
        id: int,
        is_mc: bool = True,
        n_files: int = 1,
        n_events: int = 0,
        processes: Iterable[Process] = (),
        **kwargs,
    ) -> None:
        super().__init__(name, id, **kwargs)
        self.is_mc = bool(is_mc)
        self.n_files = int(n_files)
        self.n_events = int(n_events)
        self.processes = UniqueObjectIndex(Process)
        for p in processes:
            self.processes.add(p)

    @property
    def is_data(self) -> bool:
        return not self.is_mc


class Channel(UniqueObject):
    """Analysis channel, hierarchical (reference ``od.Channel``)."""

    def __init__(self, name: str, id: int, **kwargs) -> None:
        super().__init__(name, id, **kwargs)
        self.channels = UniqueObjectIndex(Channel)
        self.parent: Channel | None = None

    def add_channel(self, name: str, id: int, **kwargs) -> Channel:
        child = Channel(name, id, **kwargs)
        self.channels.add(child)
        child.parent = self
        return child


class Category(UniqueObject):
    """Hierarchical event category (reference ``od.Category``).

    ``selection`` is a Spark-SQL boolean expression string (the engine's
    analogue of the reference's categorizer names); combination categories
    hold a *list* of parent selections whose conjunction defines them.
    Categories form a DAG: a combination category is a child of every
    category it combines.
    """

    def __init__(self, name: str, id: int, selection: str | list[str] | None = None, **kwargs) -> None:
        super().__init__(name, id, **kwargs)
        self.selection = selection
        self.categories = UniqueObjectIndex(Category)
        self.parents: list[Category] = []

    def add_category(self, category: Category | str, id: int | None = None, **kwargs) -> Category:
        if isinstance(category, str):
            category = Category(category, id, **kwargs)
        self.categories.add(category)
        category.parents.append(self)
        return category

    @property
    def is_leaf(self) -> bool:
        return len(self.categories) == 0

    def walk_categories(self) -> Iterator[Category]:
        yield self
        for child in self.categories:
            yield from child.walk_categories()

    def get_leaf_categories(self) -> list[Category]:
        """Unique leaves below (or at) this category, insertion order."""
        seen: dict[int, Category] = {}
        for cat in self.walk_categories():
            if cat.is_leaf:
                seen.setdefault(cat.id, cat)
        return list(seen.values())

    def selection_expr(self) -> str:
        """The category's full boolean SQL expression (conjunction for
        combination categories)."""
        if self.selection is None:
            raise ValueError(f"category {self.name!r} has no selection")
        sels = [self.selection] if isinstance(self.selection, str) else list(self.selection)
        if len(sels) == 1:
            return sels[0]
        return " AND ".join(f"({s})" for s in sels)


class Shift(UniqueObject):
    """Systematic variation (reference ``od.Shift``): ``<source>_<direction>``
    naming, with ``column_aliases`` aux mapping nominal column names to the
    shifted source columns.  Bridged to the execution layer via
    :meth:`to_plan_shift` (plans/shifts.py applies the aliases right after
    the scan, reference add_ak_aliases columnar_util.py:803)."""

    UP = "up"
    DOWN = "down"
    NOMINAL = "nominal"

    def __init__(self, name: str, id: int, **kwargs) -> None:
        super().__init__(name, id, **kwargs)
        self.source, self.direction = self.split_name(name)

    @classmethod
    def join_name(cls, source: str, direction: str) -> str:
        if direction == cls.NOMINAL:
            return cls.NOMINAL
        if direction not in (cls.UP, cls.DOWN):
            raise ValueError(f"unknown shift direction {direction!r}")
        return f"{source}_{direction}"

    @classmethod
    def split_name(cls, name: str) -> tuple[str, str]:
        if name == cls.NOMINAL:
            return cls.NOMINAL, cls.NOMINAL
        source, sep, direction = name.rpartition("_")
        if not sep or direction not in (cls.UP, cls.DOWN):
            raise ValueError(f"invalid shift name {name!r} (want <source>_<up|down>)")
        return source, direction

    @property
    def is_up(self) -> bool:
        return self.direction == self.UP

    @property
    def is_down(self) -> bool:
        return self.direction == self.DOWN

    @property
    def column_aliases(self) -> dict[str, str]:
        return self.aux.setdefault("column_aliases", {})

    def to_plan_shift(self):
        from columnflow_spark.plans.shifts import Shift as PlanShift

        return PlanShift(self.name, dict(self.column_aliases))


class VariableDef(UniqueObject):
    """Catalog entry for a histogram variable (reference ``od.Variable``:
    name, expression, binning, null_value, plus aux like ``selection``,
    ``log_x``, ``x_title`` — SURVEY §1.5).  :meth:`to_hist_variable`
    hands the definition to the hist engine."""

    def __init__(
        self,
        name: str,
        id: int,
        expression: str | None = None,
        binning=None,
        null_value: float | None = None,
        **kwargs,
    ) -> None:
        super().__init__(name, id, **kwargs)
        self.expression = expression if expression is not None else name
        self.binning = binning
        self.null_value = null_value

    @property
    def selection(self) -> str | None:
        """Optional row-level SQL predicate applied before filling
        (reference od.Variable.selection)."""
        return self.x("selection", None)

    @property
    def log_x(self) -> bool:
        return bool(self.x("log_x", False))

    def to_hist_variable(self):
        from columnflow_spark.hist.axes import Variable

        if self.binning is None:
            raise ValueError(f"variable {self.name!r} has no binning")
        return Variable(self.name, self.expression, self.binning, self.null_value, aux=dict(self.aux))


class Config(UniqueObject):
    """Per-campaign configuration holding the object registries (reference
    ``od.Config``).  Categories added at config level are roots of the
    category DAG."""

    def __init__(self, name: str, id: int, **kwargs) -> None:
        super().__init__(name, id, **kwargs)
        self.processes = UniqueObjectIndex(Process)
        self.datasets = UniqueObjectIndex(Dataset)
        self.channels = UniqueObjectIndex(Channel)
        self.categories = UniqueObjectIndex(Category)
        self.variables = UniqueObjectIndex(UniqueObject)
        self.shifts = UniqueObjectIndex(UniqueObject)

    # -- processes / datasets / channels ------------------------------------
    def add_process(self, process: Process | str, id: int | None = None, **kwargs) -> Process:
        if isinstance(process, str):
            process = Process(process, id, **kwargs)
        return self.processes.add(process)

    def get_process(self, key: str | int, deep: bool = True) -> Process:
        """Look up a process; ``deep`` (default) searches the whole
        sub-process tree like the reference's ``od.Config.get_process``."""
        if not deep:
            return self.processes.get(key)
        for root in self.processes:
            for p in root.walk_processes():
                if p.name == key or p.id == key:
                    return p
        raise ValueError(f"unknown Process {key!r}")

    def add_dataset(self, dataset: Dataset | str, id: int | None = None, **kwargs) -> Dataset:
        if isinstance(dataset, str):
            dataset = Dataset(dataset, id, **kwargs)
        return self.datasets.add(dataset)

    def get_dataset(self, key: str | int) -> Dataset:
        return self.datasets.get(key)

    def add_channel(self, name: str, id: int, **kwargs) -> Channel:
        return self.channels.add(Channel(name, id, **kwargs))

    def add_shift(self, name: str, id: int, **kwargs) -> Shift:
        return self.shifts.add(Shift(name, id, **kwargs))

    def get_shift(self, key: str | int) -> Shift:
        return self.shifts.get(key)

    def has_shift(self, key: str | int) -> bool:
        return self.shifts.has(key)

    def add_variable(self, name: str, id: int, **kwargs) -> VariableDef:
        return self.variables.add(VariableDef(name, id, **kwargs))

    def get_variable(self, key: str | int) -> VariableDef:
        return self.variables.get(key)

    # -- categories ---------------------------------------------------------
    def add_category(self, category: Category | str, id: int | None = None, **kwargs) -> Category:
        if isinstance(category, str):
            category = Category(category, id, **kwargs)
        return self.categories.add(category)

    def walk_categories(self) -> Iterator[Category]:
        """Depth-first over the whole category DAG; combination categories
        (multiple parents) are yielded once per parent path, as in the
        reference's ``walk_categories``."""
        for root in self.categories:
            yield from root.walk_categories()

    def iter_unique_categories(self) -> Iterator[Category]:
        seen: set[int] = set()
        for cat in self.walk_categories():
            if cat.id not in seen:
                seen.add(cat.id)
                yield cat

    def get_category(self, key: str | int, deep: bool = True) -> Category:
        if not deep:
            return self.categories.get(key)
        for cat in self.walk_categories():
            if cat.name == key or cat.id == key:
                return cat
        raise ValueError(f"unknown category {key!r}")

    def has_category(self, key: str | int, deep: bool = True) -> bool:
        try:
            self.get_category(key, deep=deep)
            return True
        except ValueError:
            return False

    def get_leaf_categories(self) -> list[Category]:
        seen: dict[int, Category] = {}
        for cat in self.walk_categories():
            if cat.is_leaf:
                seen.setdefault(cat.id, cat)
        return list(seen.values())


class Analysis(UniqueObject):
    """Top-level analysis owning one or more configs (reference
    ``od.Analysis``)."""

    def __init__(self, name: str, id: int, **kwargs) -> None:
        super().__init__(name, id, **kwargs)
        self.configs = UniqueObjectIndex(Config)

    def add_config(self, config: Config | str, id: int | None = None, **kwargs) -> Config:
        if isinstance(config, str):
            config = Config(config, id, **kwargs)
        return self.configs.add(config)

    def get_config(self, key: str | int) -> Config:
        return self.configs.get(key)


# ---------------------------------------------------------------------------
# category id + combination helpers (reference config_util.py:440-780)
# ---------------------------------------------------------------------------


def create_category_id(config: Config, category_name: str, hash_len: int = 7, salt: Any = None) -> int:
    """Deterministic category id from (config name, config id, category
    name, salt): first *hash_len* hex digits of sha256, plus a power-of-ten
    offset so generated ids never collide with small hand-assigned ones
    (reference config_util.py:440-466; same construction, sha256 instead of
    law's hash helper)."""
    payload = repr((config.name, config.id, category_name, salt)).encode()
    h = int(hashlib.sha256(payload).hexdigest()[:hash_len], base=16)
    digits = len(str(int("F" * hash_len, base=16)))
    return h + int(10 ** digits)


def add_category(config: Config, parent: Config | Category | None = None, *, name: str, **kwargs) -> Category:
    """Create a category under *parent* (default: the config), assigning a
    deterministic id when none is given (reference config_util.py:468)."""
    if kwargs.get("id") is None:
        kwargs["id"] = create_category_id(config, name)
    return (parent if parent is not None else config).add_category(Category(name, **kwargs))


@dataclasses.dataclass
class CategoryGroup:
    """A named axis of categories used for combination building (reference
    config_util.py:523).  ``is_complete``: the union covers the phase space;
    ``has_overlap``: members pairwise intersect.  Only full partitions are
    safe to sum over — and, in ``parent_mode="safe"``, to project away."""

    categories: list[Category | str]
    is_complete: bool
    has_overlap: bool
    warn: bool = True

    @property
    def is_partition(self) -> bool:
        return self.is_complete and not self.has_overlap


def create_category_combinations(
    config: Config,
    categories: dict[str, CategoryGroup],
    name_fn: Callable[[dict[str, Category]], str],
    parent_mode: str = "safe",
    kwargs_fn: Callable[[dict[str, Category]], dict] | None = None,
    skip_existing: bool = True,
    skip_fn: Callable[[dict[str, Category]], bool] | None = None,
) -> int:
    """Create all cross-combinations of the category groups, connecting
    each new category as a child of every category it combines (reference
    config_util.py:549-780: same iteration order — combinations of group
    subsets by size, then the per-group product; ``parent_mode`` semantics:

    - ``"all"``: every intermediate subset layer is created;
    - ``"none"``: only the full-depth leaves;
    - ``"safe"`` (default): intermediate layers are created only when every
      *omitted* group is a full partition (skipping a non-partition group
      would silently under/over-count on summation).

    Returns the number of newly created categories.
    """
    parent_mode = parent_mode.lower()
    if parent_mode not in ("all", "none", "safe"):
        raise ValueError(f"unknown parent_mode {parent_mode!r}")
    if not callable(name_fn):
        raise TypeError("name_fn must be callable")
    if kwargs_fn is not None and not callable(kwargs_fn):
        raise TypeError("kwargs_fn must be callable when set")

    groups: dict[str, CategoryGroup] = {}
    for gname, group in categories.items():
        if not isinstance(group, CategoryGroup):
            group = CategoryGroup(categories=list(group), is_complete=True, has_overlap=False)
        cats = [config.get_category(c) if isinstance(c, str) else c for c in group.categories]
        groups[gname] = dataclasses.replace(group, categories=cats)

    n_groups = len(groups)
    if n_groups < 2:
        return 0
    group_names = list(groups)
    unsafe = {n for n, g in groups.items() if not g.is_partition}
    created: dict[str, Category] = {}
    n_created = 0

    sizes = [n_groups] if parent_mode == "none" else range(2, n_groups + 1)
    for size in sizes:
        for combo_names in itertools.combinations(group_names, size):
            if parent_mode == "safe" and (set(group_names) - set(combo_names)) & unsafe:
                continue
            for cats in itertools.product(*(groups[n].categories for n in combo_names)):
                root_cats = dict(zip(combo_names, cats))
                cat_name = name_fn(root_cats)
                if skip_existing and (cat_name in created or config.has_category(cat_name)):
                    continue
                if skip_fn is not None and skip_fn(root_cats):
                    continue
                kwargs = dict(kwargs_fn(root_cats)) if kwargs_fn is not None else {}
                if kwargs.get("id") is None:
                    kwargs["id"] = create_category_id(config, cat_name)
                if "selection" not in kwargs:
                    kwargs["selection"] = [c.selection_expr() for c in root_cats.values()]
                new_cat = Category(cat_name, **kwargs)
                created[cat_name] = new_cat
                n_created += 1

                # connect: child of the (size-1)-combinations when they
                # exist, else of the root categories themselves
                connected = False
                if size > 2:
                    for sub_names in itertools.combinations(combo_names, size - 1):
                        sub_name = name_fn({n: root_cats[n] for n in sub_names})
                        parent = created.get(sub_name)
                        if parent is None and config.has_category(sub_name):
                            parent = config.get_category(sub_name)
                        if parent is not None:
                            parent.add_category(new_cat)
                            connected = True
                if not connected:
                    for cat in root_cats.values():
                        cat.add_category(new_cat)
    return n_created


def add_shift_aliases(config: Config, shift_source: str, aliases: dict[str, str]) -> None:
    """Assign column aliases to the up and down shifts of *shift_source*
    (reference config_util.py:285): ``{direction}``/``{name}``/``{source}``
    template fields in keys and values are substituted per shift.

    Example::

        add_shift_aliases(cfg, "pdf", {"pdf_weight": "pdf_weight_{direction}"})
        # pdf_up   gets {"pdf_weight": "pdf_weight_up"}
        # pdf_down gets {"pdf_weight": "pdf_weight_down"}
    """
    for direction in (Shift.UP, Shift.DOWN):
        shift = config.get_shift(Shift.join_name(shift_source, direction))
        fields = {"name": shift.name, "id": shift.id, "source": shift.source, "direction": shift.direction}
        shift.column_aliases.update(
            {k.format(**fields): v.format(**fields) for k, v in aliases.items()}
        )


def get_shifts_from_sources(config: Config, *shift_sources: str) -> list[Shift]:
    """Both directions for each source (reference config_util.py:337)."""
    return [
        config.get_shift(Shift.join_name(src, d))
        for src in shift_sources
        for d in (Shift.UP, Shift.DOWN)
    ]


# ---------------------------------------------------------------------------
# Spark wiring
# ---------------------------------------------------------------------------


def leaf_category_ids_column(config: Config, roots: Iterable[Category | str] | None = None):
    """Compile the catalog's leaf selections to one Catalyst expression:
    ``array_compact(array(when(sel_1, id_1), ...))`` — the engine's
    ``category_ids`` producer (reference production/categories.py:31).  The
    catalog is driver-side metadata; only the compiled expression enters the
    plan, fully codegen'd, zero shuffles."""
    from pyspark.sql import functions as F

    if roots is None:
        leaves = config.get_leaf_categories()
    else:
        leaves = []
        seen: set[int] = set()
        for root in roots:
            cat = config.get_category(root) if isinstance(root, str) else root
            for leaf in cat.get_leaf_categories():
                if leaf.id not in seen:
                    seen.add(leaf.id)
                    leaves.append(leaf)
    branches = [F.when(F.expr(leaf.selection_expr()), F.lit(leaf.id)) for leaf in leaves]
    return F.array_compact(F.array(*branches))


def category_filter_column(config: Config, categories: Iterable[Category | str], ids_col: str = "category_ids"):
    """Membership predicate for events whose ``category_ids`` array
    intersects the *leaf* ids under any of the given categories (reference
    ``get_events_from_categories``, config_util.py:31: non-leaf categories
    expand to their leaves; only leaf ids ever match)."""
    from pyspark.sql import functions as F

    leaf_ids: list[int] = []
    seen: set[int] = set()
    for cat in categories:
        cat = config.get_category(cat) if isinstance(cat, str) else cat
        for leaf in cat.get_leaf_categories():
            if leaf.id not in seen:
                seen.add(leaf.id)
                leaf_ids.append(leaf.id)
    if not leaf_ids:
        return F.lit(False)
    return F.arrays_overlap(F.col(ids_col), F.array(*[F.lit(i) for i in leaf_ids]))
