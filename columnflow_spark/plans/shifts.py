"""Systematic shifts as column-alias maps (SURVEY §1.5/§4).

The reference models a shift (e.g. ``jec_up``) as a set of column aliases
(``add_shift_aliases``, reference columnflow/config_util.py:285) applied
right after the scan (``add_ak_aliases``, columnar_util.py:803): downstream
operators then transparently read the shifted column under the nominal
name.  A task runs shifted only when the shift is "local" to one of its
operators (``resolve_shifts``, tasks/framework/base.py:1581-1650) —
planner logic we reproduce in :meth:`plan_shifts`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Shift:
    name: str  # e.g. "price_up"; "nominal" has no aliases
    column_aliases: dict = field(default_factory=dict)  # dst -> src, e.g. {"price": "price_up"}

    @property
    def is_nominal(self) -> bool:
        return self.name == "nominal"


NOMINAL = Shift("nominal")


def apply_shift_aliases(df: DataFrame, shift: Shift, missing: str = "raise") -> DataFrame:
    """Rename shifted source columns onto their nominal names.

    ``missing``: "raise" | "original" (keep nominal if the shifted source
    is absent) — strategies of the reference's ``add_ak_alias``
    (columnar_util.py:803)."""
    cols = {}
    for dst, src in shift.column_aliases.items():
        if src not in df.columns:
            if missing == "original":
                continue
            raise ValueError(f"shift {shift.name}: source column {src!r} missing")
        cols[dst] = F.col(src)
    return df.withColumns(cols) if cols else df


def plan_shifts(requested: list[Shift], local_shift_names: set[str]) -> dict[str, Shift]:
    """Map requested shift name -> shift actually executed: shifts not
    local to any operator in the chain collapse onto nominal (the
    reference's shift-dedup planner, base.py:1599-1650)."""
    out: dict[str, Shift] = {}
    for shift in requested:
        out[shift.name] = shift if (shift.is_nominal or shift.name in local_shift_names) else NOMINAL
    return out
