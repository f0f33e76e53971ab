"""Declarative statistical-inference model + datacard serialization
(SURVEY §2.10 InferenceModel).

Reference semantics: ``InferenceModel`` (reference
columnflow/inference/__init__.py:212) is a declarative spec — categories,
each with signal/background processes, each with nuisance parameters —
hydrated with rates from merged histograms and serialized to a
combine-style datacard by ``DatacardWriter`` (reference
columnflow/inference/cms/datacard.py:35).

Spark realization: rates come from the engine's long-format hist/yield
tables (one ``groupBy(category, process)`` aggregation); the model and the
writer are pure driver-side Python — the only cluster work is the tiny
final aggregate that is collected.
"""

from __future__ import annotations

from columnflow_spark.inference.model import (  # noqa: F401
    Category,
    InferenceModel,
    Parameter,
    Process,
)
from columnflow_spark.inference.datacard import render_datacard, write_datacard  # noqa: F401
from columnflow_spark.inference.transform import (  # noqa: F401
    shape_integral_effects,
    transform_rate_effect,
    transform_shapes,
)
