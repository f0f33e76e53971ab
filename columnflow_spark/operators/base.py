"""The five operator classes (SURVEY.md §2.10).

Each family is an ``ArrayFunction`` subclass tree with its own registry and
decorator, mirroring the reference's ``@calibrator`` (reference
columnflow/calibration/__init__.py:65), ``@selector``
(selection/__init__.py:22), ``@reducer`` (reduction/__init__.py:16),
``@producer`` (production/__init__.py:65), ``@categorizer``
(categorization/__init__.py:16) and ``@hist_producer``
(histogramming/__init__.py:23).

Semantics on Spark:

- **Calibrator**: ``df -> df`` mutating raw columns (withColumn /
  withField batches).
- **Selector**: ``df -> (df, SelectionResult)`` building masks *without*
  applying them (reference stores masks and drops rows only at reduction).
- **Reducer**: applies the event mask and rebuilds object collections from
  object masks.
- **Producer**: ``df -> df`` deriving new columns.
- **Categorizer**: ``df -> Column`` boolean mask naming a category.
- **HistProducer**: ``df -> (df, weight Column)`` used by the hist engine.

``mc_only`` / ``data_only`` map to ``skip_func`` exactly like the
reference (calibration/__init__.py:19-63): operators are dropped from the
chain when the dataset type does not match.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from columnflow_spark.core.registry import ArrayFunction


def _family(name: str) -> type[ArrayFunction]:
    cls = type(name, (ArrayFunction,), {"uses": set(), "produces": set()})
    cls._subclasses = {}
    return cls


Calibrator = _family("Calibrator")
Selector = _family("Selector")
Reducer = _family("Reducer")
Producer = _family("Producer")
Categorizer = _family("Categorizer")
HistProducer = _family("HistProducer")


def _make_decorator(base: type[ArrayFunction]) -> Callable:
    def decorator(
        func: Callable | None = None,
        *,
        name: str | None = None,
        uses: Iterable | None = None,
        produces: Iterable | None = None,
        mc_only: bool = False,
        data_only: bool = False,
        **hooks: Any,
    ):
        def deco(f: Callable) -> type[ArrayFunction]:
            cls_dict: dict[str, Any] = {
                "uses": set(uses or ()),
                "produces": set(produces or ()),
                "call_func": f,
                "mc_only": mc_only,
                "data_only": data_only,
            }
            if mc_only or data_only:
                def skip_func(self) -> bool:
                    is_mc = bool(self.inst_dict.get("is_mc", True))
                    return (self.mc_only and not is_mc) or (self.data_only and is_mc)

                cls_dict.setdefault("skip_func", skip_func)
            cls_dict.update(hooks)
            return base.derive(name or f.__name__, cls_dict)

        return deco(func) if func is not None else deco

    return decorator


calibrator = _make_decorator(Calibrator)
selector = _make_decorator(Selector)
reducer = _make_decorator(Reducer)
producer = _make_decorator(Producer)
categorizer = _make_decorator(Categorizer)
hist_producer = _make_decorator(HistProducer)
