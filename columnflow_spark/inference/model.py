"""Inference-model spec objects (reference
columnflow/inference/__init__.py:212 ``InferenceModel`` with spec builders
:394 ``category_spec``, :444 ``process_spec``, :481 ``parameter_spec``).

Plain dataclasses instead of the reference's DotAccess dicts; the nesting
(model -> categories -> processes -> parameters) and the lookup helpers
mirror the reference API surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Parameter:
    """Nuisance parameter attached to one process in one category.

    ``type``: ``"rate_gauss"`` (lnN), ``"rate_uniform"`` (lnU) or
    ``"shape"`` (template morphing; the per-shift histograms live in the
    exported shapes file, reference inference/__init__.py ParameterType).
    ``effect``: symmetric factor (1.02) or ``(down, up)`` pair; for shape
    parameters it is the morphing coefficient (usually 1.0).
    ``transformations``: ordered effect transformations applied by the
    datacard writer (reference inference/__init__.py
    ``ParameterTransformation`` + inference/cms/datacard.py:35 docstring):
    ``symmetrize``, ``asymmetrize``, ``asymmetrize_if_large``,
    ``effect_from_shape``, ``effect_from_shape_if_flat``,
    ``flip_smaller_if_one_sided``, ``flip_larger_if_one_sided`` (rate
    side) and ``effect_from_rate``, ``normalize``, ``envelope``,
    ``envelope_if_one_sided``, ``envelope_enforce_two_sided`` (shape
    side) — see columnflow_spark/inference/transform.py.
    """

    name: str
    type: str = "rate_gauss"
    effect: float | tuple[float, float] = 1.0
    transformations: tuple[str, ...] = ()

    @property
    def combine_type(self) -> str:
        return {"rate_gauss": "lnN", "rate_uniform": "lnU", "shape": "shape"}[self.type]

    def effect_str(self, precision: int = 4) -> str:
        if isinstance(self.effect, tuple):
            d, u = self.effect
            return f"{round(d, precision)}/{round(u, precision)}"
        return f"{round(self.effect, precision)}"


@dataclass
class Process:
    name: str
    is_signal: bool = False
    scale: float = 1.0
    parameters: list[Parameter] = field(default_factory=list)

    def add_parameter(self, param: Parameter) -> Parameter:
        if any(p.name == param.name for p in self.parameters):
            raise ValueError(f"duplicate parameter: {param.name}")
        self.parameters.append(param)
        return param


@dataclass
class Category:
    """One datacard bin; ``data_from_processes`` (reference model field)
    replaces observed data with the sum of the named processes
    (Asimov-style) when no data rate is supplied."""

    name: str
    variable: str | None = None
    data_from_processes: list[str] = field(default_factory=list)
    processes: list[Process] = field(default_factory=list)

    def add_process(self, proc: Process) -> Process:
        if any(p.name == proc.name for p in self.processes):
            raise ValueError(f"duplicate process: {proc.name}")
        self.processes.append(proc)
        return proc

    def get_process(self, name: str) -> Process:
        for p in self.processes:
            if p.name == name:
                return p
        raise KeyError(name)


@dataclass
class InferenceModel:
    name: str
    categories: list[Category] = field(default_factory=list)

    def add_category(self, cat: Category) -> Category:
        if any(c.name == cat.name for c in self.categories):
            raise ValueError(f"duplicate category: {cat.name}")
        self.categories.append(cat)
        return cat

    def get_category(self, name: str) -> Category:
        for c in self.categories:
            if c.name == name:
                return c
        raise KeyError(name)

    @property
    def parameter_names(self) -> list[str]:
        """All distinct parameter names in first-appearance order (the
        datacard's kmax axis)."""
        seen: list[str] = []
        for c in self.categories:
            for p in c.processes:
                for par in p.parameters:
                    if par.name not in seen:
                        seen.append(par.name)
        return seen
