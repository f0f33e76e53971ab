"""Combine-style counting-datacard serialization (reference
columnflow/inference/cms/datacard.py:35 ``DatacardWriter``).

Rates are read from the engine's long-format yield table — a DataFrame (or
pre-collected mapping) with columns ``(category, process, sum_w)`` as
produced by ``yield_table``-style aggregations — so the cluster-side work
is one tiny aggregate; formatting happens on the driver exactly like the
reference.

Combine datacard conventions honored: signal processes get ids <= 0,
backgrounds 1..n; ``observation`` is the data rate or (with
``data_from_processes``) the rounded sum of the named processes; nuisance
lines are ``<name> <lnN|lnU>`` with ``-`` for unaffected columns.
"""

from __future__ import annotations

from collections.abc import Mapping

from columnflow_spark.inference.model import InferenceModel


def _collect_rates(rates) -> dict[tuple[str, str], float]:
    """Accept a DataFrame[(category, process, sum_w)] or a mapping
    {(category, process): rate}."""
    if isinstance(rates, Mapping):
        return dict(rates)
    return {(r["category"], r["process"]): float(r["sum_w"]) for r in rates.collect()}


def export_shapes(hists, path: str) -> str:
    """Write the per-(category, process, shift) histogram table as the
    datacard's shapes store (reference DatacardWriter writes ROOT
    templates via uproot, inference/cms/datacard.py:243; ROOT IO is out of
    scope here — SURVEY §2.1 — so the store is a parquet directory
    partitioned by category, with the combine naming contract
    ``$CHANNEL/$PROCESS`` / ``$CHANNEL/$PROCESS_$SYSTEMATIC(Up|Down)``
    realized as the (category, process, shift) columns)."""
    hists.write.mode("overwrite").partitionBy("category").parquet(path)
    return path


def render_datacard(
    model: InferenceModel,
    rates,
    *,
    observations: Mapping[str, float] | None = None,
    rate_precision: int = 4,
    shapes_file: str | None = None,
) -> str:
    """Serialize *model* + *rates* into datacard text.  With
    *shapes_file*, a combine-style ``shapes`` header line is emitted
    pointing at the exported store (see :func:`export_shapes`)."""
    rate_map = _collect_rates(rates)
    observations = dict(observations or {})

    # process ids: signals <= 0 (descending), backgrounds >= 1, per category
    columns: list[tuple[str, str, int, float]] = []  # (cat, proc, id, rate)
    for cat in model.categories:
        sig_id, bkg_id = 0, 1
        for proc in cat.processes:
            if proc.is_signal:
                pid, sig_id = sig_id, sig_id - 1
            else:
                pid, bkg_id = bkg_id, bkg_id + 1
            rate = rate_map.get((cat.name, proc.name), 0.0) * proc.scale
            columns.append((cat.name, proc.name, pid, rate))

    obs_lines = []
    for cat in model.categories:
        if cat.name in observations:
            obs = observations[cat.name]
        elif cat.data_from_processes:
            obs = round(
                sum(
                    r for (c, p, _i, r) in columns
                    if c == cat.name and p in cat.data_from_processes
                )
            )
        else:
            obs = -1  # combine convention: unknown/asimov handled downstream
        obs_lines.append(obs)

    param_names = model.parameter_names
    sep = "-" * 80

    def fmt(v) -> str:
        return f"{v}"

    lines = [
        f"# datacard: {model.name}",
        f"imax {len(model.categories)}",
        f"jmax {max(0, max((sum(1 for c2, *_ in columns if c2 == c.name) for c in model.categories), default=1) - 1)}",
        f"kmax {len(param_names)}",
        sep,
    ]
    if shapes_file is not None:
        lines.append(f"shapes * * {shapes_file} $CHANNEL/$PROCESS $CHANNEL/$PROCESS_$SYSTEMATIC")
        lines.append(sep)
    lines += [
        "bin          " + "  ".join(c.name for c in model.categories),
        "observation  " + "  ".join(fmt(o) for o in obs_lines),
        sep,
        "bin      " + "  ".join(c for c, *_ in columns),
        "process  " + "  ".join(p for _c, p, *_ in columns),
        "process  " + "  ".join(str(i) for _c, _p, i, _r in columns),
        "rate     " + "  ".join(f"{round(r, rate_precision)}" for *_x, r in columns),
        sep,
    ]
    for pname in param_names:
        effects = []
        ptype = "lnN"
        for cat_name, proc_name, _pid, _rate in columns:
            par = next(
                (
                    par
                    for par in model.get_category(cat_name).get_process(proc_name).parameters
                    if par.name == pname
                ),
                None,
            )
            if par is None:
                effects.append("-")
            else:
                ptype = par.combine_type
                effects.append(par.effect_str())
        lines.append(f"{pname}  {ptype}  " + "  ".join(effects))
    return "\n".join(lines) + "\n"


def write_datacard(model: InferenceModel, rates, path: str, **kwargs) -> str:
    text = render_datacard(model, rates, **kwargs)
    with open(path, "w") as fh:
        fh.write(text)
    return text
