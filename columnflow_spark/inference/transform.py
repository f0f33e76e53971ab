"""Datacard parameter-effect transformations (reference
columnflow/inference/cms/datacard.py:35 ``DatacardWriter`` docstring and
:376/:811 transformation loops).

Two surfaces, mirroring the reference's split:

- **rate effects** are scalars (``1.02`` or ``(0.9, 1.1)``) — the
  transformations are exact driver-side math
  (:func:`transform_rate_effect`), identical formulae to the reference's
  rate branch (datacard.py:376-431).
- **shape templates** live in the engine's long-format hist table
  ``(category, process, shift, bin…, sum_w, sum_w2)`` (the shapes-store
  schema of ``export_shapes``) — the transformations are DataFrame
  column expressions over a nominal/up/down-joined wide table
  (:func:`transform_shapes`), the Spark re-expression of the reference's
  boost-histogram view arithmetic (datacard.py:811-878).  At scale the
  shapes table is (categories x processes x systs x bins) rows and the
  whole pass is one join + one projection per parameter — no collect.

``effect_from_shape(_if_flat)`` needs per-template integrals and
flatness statistics; :func:`shape_integral_effects` computes them in two
small aggregations (:778-792: flat iff population-std/mean <= 0.1 AND
max |v - mean|/mean <= 0.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: transformations that only make sense on shape-type parameters
#: (reference datacard.py:106 ``shape_only_trafos``)
SHAPE_ONLY_TRAFOS = {
    "effect_from_rate",
    "normalize",
    "envelope",
    "envelope_if_one_sided",
    "envelope_enforce_two_sided",
}
#: rate-only set (reference datacard.py:111)
RATE_ONLY_TRAFOS = {
    "effect_from_shape",
    "effect_from_shape_if_flat",
    "asymmetrize",
    "asymmetrize_if_large",
    "flip_smaller_if_one_sided",
    "flip_larger_if_one_sided",
}
#: must be the first transformation when present (reference datacard.py:100)
FIRST_INDEX_TRAFOS = {"effect_from_rate", "effect_from_shape", "effect_from_shape_if_flat"}


def _safe_div(a: Column, b: Column) -> Column:
    """Reference ``safe_div`` (util.py:468): a/b, or 0 when b is 0."""
    return F.when(b != 0, a / b).otherwise(F.lit(0.0))


def transform_rate_effect(
    effect,
    transformations,
    *,
    shape_effect: tuple[float, float] | None = None,
    shape_is_flat: bool | None = None,
    asymmetrize_if_large_threshold: float = 0.2,
):
    """Apply rate-side transformations in order; returns
    ``(effect, became_shape)``.

    ``shape_effect`` is the ``(∫down/∫nom, ∫up/∫nom)`` pair from
    :func:`shape_integral_effects` (required for the from_shape
    transformations); ``shape_is_flat`` is the combined flatness verdict
    of both variations — when False under ``effect_from_shape_if_flat``,
    the parameter converts to shape-type (reference datacard.py:783-797)
    and the caller keeps the templates instead of a rate line.
    """
    transformations = list(transformations)
    for i, trafo in enumerate(transformations):
        if trafo in ("effect_from_shape", "effect_from_shape_if_flat"):
            if i != 0:
                raise ValueError(f"{trafo} must be the first transformation")
            if shape_effect is None:
                raise ValueError(f"{trafo} requires shape_effect")
            if trafo == "effect_from_shape_if_flat" and not shape_is_flat:
                # not flat -> parameter becomes shape-type; remaining
                # rate-only transformations are dropped by the caller
                return 1.0, True
            effect = tuple(shape_effect)

        elif trafo == "symmetrize":
            if not isinstance(effect, tuple) or len(effect) != 2:
                continue
            if not (min(effect) <= 1 <= max(effect)):
                continue  # one-sided: skip
            d, u = effect
            diff = 0.5 * (d + u) - 1.0
            effect = (d - diff, u - diff)

        elif trafo == "asymmetrize" or (
            trafo == "asymmetrize_if_large"
            and isinstance(effect, float)
            and abs(effect - 1.0) >= asymmetrize_if_large_threshold
        ):
            if not isinstance(effect, float):
                continue
            effect = (2.0 - effect, effect)

        elif trafo in ("flip_smaller_if_one_sided", "flip_larger_if_one_sided"):
            if not isinstance(effect, tuple) or len(effect) != 2:
                continue
            flip_larger = trafo == "flip_larger_if_one_sided"
            flip_smaller = not flip_larger
            if max(effect) < 1.0:
                flip_index = int(
                    (effect[1] > effect[0] and flip_larger)
                    or (effect[1] < effect[0] and flip_smaller)
                )
            elif min(effect) > 1.0:
                flip_index = int(
                    (effect[1] > effect[0] and flip_smaller)
                    or (effect[1] < effect[0] and flip_larger)
                )
            else:
                continue  # two-sided: skip
            effect = tuple(
                (2.0 - e) if j == flip_index else e for j, e in enumerate(effect)
            )

    return effect, False


def shape_integral_effects(
    hists: DataFrame,
    param: str,
    *,
    value_col: str = "sum_w",
    max_deviation: float = 0.1,
    max_outlier: float = 0.2,
) -> DataFrame:
    """Per (category, process): integral rate effects and flatness of the
    ``<param>Up`` / ``<param>Down`` templates.

    Returns ``(category, process, eff_down, eff_up, is_flat)`` where
    ``eff_* = ∫varied / ∫nominal`` (reference datacard.py:885-889) and
    ``is_flat`` ANDs the reference's two criteria over BOTH variations
    (:783-792): population std/mean <= *max_deviation* and
    max |v - mean| / mean <= *max_outlier*.
    """
    v = F.col(value_col)
    shifts = {"nominal": "nom", f"{param}Up": "up", f"{param}Down": "down"}
    sub = hists.filter(F.col("shift").isin(list(shifts))).withColumn(
        "_role",
        F.when(F.col("shift") == "nominal", "nom")
        .when(F.col("shift") == f"{param}Up", "up")
        .otherwise("down"),
    )
    stats = sub.groupBy("category", "process", "_role").agg(
        F.sum(v).alias("integ"),
        F.avg(v).alias("mean"),
        F.stddev_pop(v).alias("std"),
        F.max(F.abs(v)).alias("_absmax"),  # placeholder; outlier below
        F.collect_list(v).alias("_vals"),
    )
    # max |v - mean| via a higher-order fold over the per-group bin list
    # (bins per template are bounded — this is the per-template flatness
    # statistic, not a data-sized aggregate)
    outlier = F.aggregate(
        "_vals", F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x - F.col("mean")))
    )
    stats = stats.withColumn("max_out", outlier).drop("_vals", "_absmax")
    flat = (
        _safe_div(F.col("std"), F.col("mean")) <= max_deviation
    ) & (_safe_div(F.col("max_out"), F.col("mean")) <= max_outlier)
    stats = stats.withColumn("is_flat", flat)

    def side(role):
        return (
            stats.filter(F.col("_role") == role)
            .select(
                "category",
                "process",
                F.col("integ").alias(f"integ_{role}"),
                F.col("is_flat").alias(f"flat_{role}"),
            )
        )

    out = (
        side("nom")
        .join(side("up"), ["category", "process"])
        .join(side("down"), ["category", "process"])
        .select(
            "category",
            "process",
            _safe_div(F.col("integ_down"), F.col("integ_nom")).alias("eff_down"),
            _safe_div(F.col("integ_up"), F.col("integ_nom")).alias("eff_up"),
            (F.col("flat_up") & F.col("flat_down")).alias("is_flat"),
        )
    )
    return out


def transform_shapes(
    hists: DataFrame,
    param: str,
    transformations,
    *,
    effect=None,
    value_col: str = "sum_w",
    variance_col: str = "sum_w2",
) -> DataFrame:
    """Apply shape-side transformations for *param*, returning the hist
    table with that parameter's Up/Down templates replaced.

    The nominal/up/down templates join on (category, process, bin…) into
    one wide row per bin; every transformation is then a column
    expression (reference's view arithmetic, datacard.py:811-878):

    - ``effect_from_rate``: templates = nominal x (f_down, f_up) from the
      scalar *effect* (float e -> (2-e, e)); requires *effect*.
    - ``normalize``: scale each variation to the nominal integral.
    - ``symmetrize``: shift both variations so their integrals center on
      the nominal one (skipped when the effect is one-sided, per the
      docstring contract; the reference's guard at :815 compares
      ``min(d, n) <= n <= max(d, n)`` which is identically true — the
      documented intent, "skip one sided effects", is what's implemented
      here).
    - ``envelope`` / ``envelope_if_one_sided``: per bin, mirror the
      absolutely-larger variation onto the other side (the if_one_sided
      variant only where both deviations share a sign).
    - ``envelope_enforce_two_sided``: per bin, up = nominal + max
      absolute deviation, down = nominal - it.
    """
    transformations = list(transformations)
    bin_cols = [
        c for c in hists.columns
        if c not in ("category", "process", "shift", value_col, variance_col)
    ]
    keys = ["category", "process", *bin_cols]
    up_name, down_name = f"{param}Up", f"{param}Down"

    nom = hists.filter(F.col("shift") == "nominal").select(
        *keys, F.col(value_col).alias("nv"), F.col(variance_col).alias("nw")
    )
    if "effect_from_rate" in transformations:
        if isinstance(effect, tuple):
            f_down, f_up = effect
        elif isinstance(effect, (int, float)):
            f_down, f_up = 2.0 - float(effect), float(effect)
        else:
            raise ValueError(f"cannot build shapes from rate effect {effect!r}")
        wide = nom.select(
            *keys,
            "nv",
            "nw",
            (F.col("nv") * F.lit(f_down)).alias("dv"),
            (F.col("nw") * F.lit(f_down) * F.lit(f_down)).alias("dw"),
            (F.col("nv") * F.lit(f_up)).alias("uv"),
            (F.col("nw") * F.lit(f_up) * F.lit(f_up)).alias("uw"),
        )
    else:
        up = hists.filter(F.col("shift") == up_name).select(
            *keys, F.col(value_col).alias("uv"), F.col(variance_col).alias("uw")
        )
        down = hists.filter(F.col("shift") == down_name).select(
            *keys, F.col(value_col).alias("dv"), F.col(variance_col).alias("dw")
        )
        wide = nom.join(up, keys).join(down, keys)

    from pyspark.sql.window import Window as W

    integ = W.partitionBy("category", "process")
    for trafo in transformations:
        if trafo == "effect_from_rate":
            continue  # consumed above
        # NOTE: every transformation updates dv/uv in a single select so
        # both new columns resolve against the PRE-transform values — a
        # withColumn chain would rebind the second expression's window
        # sums to the already-updated first column
        if trafo == "normalize":
            n, d, u = (F.sum(c).over(integ) for c in ("nv", "dv", "uv"))
            wide = wide.select(
                *keys,
                "nv",
                "nw",
                (F.col("dv") * _safe_div(n, d)).alias("dv"),
                "dw",
                (F.col("uv") * _safe_div(n, u)).alias("uv"),
                "uw",
            )
        elif trafo == "symmetrize":
            n, d, u = (F.sum(c).over(integ) for c in ("nv", "dv", "uv"))
            diff = 0.5 * (d + u) - n
            # DELIBERATE divergence from reference output: the reference's
            # guard min(d,n) <= n <= max(d,n) is identically true, so it
            # symmetrizes one-sided effects too; this implements the
            # docstring's stated intent (skip one-sided variations).
            # Shape files for one-sided effects therefore differ from
            # reference-produced ones — add a compat flag if byte parity
            # with upstream checkpoints is ever required.
            two_sided = (F.least(d, u) <= n) & (n <= F.greatest(d, u))
            wide = wide.select(
                *keys,
                "nv",
                "nw",
                F.when(two_sided, F.col("dv") * _safe_div(d - diff, d))
                .otherwise(F.col("dv"))
                .alias("dv"),
                "dw",
                F.when(two_sided, F.col("uv") * _safe_div(u - diff, u))
                .otherwise(F.col("uv"))
                .alias("uv"),
                "uw",
            )
        elif trafo in ("envelope", "envelope_if_one_sided"):
            du = F.col("uv") - F.col("nv")
            dd = F.col("dv") - F.col("nv")
            up_mask = F.abs(du) > F.abs(dd)
            down_mask = F.abs(dd) > F.abs(du)
            if trafo == "envelope_if_one_sided":
                one_sided = (du * dd) > 0
                up_mask = up_mask & one_sided
                down_mask = down_mask & one_sided
            wide = wide.select(
                *keys,
                "nv",
                "nw",
                F.when(down_mask, F.col("nv") - dd).otherwise(F.col("uv")).alias("uv"),
                F.when(down_mask, F.col("dw")).otherwise(F.col("uw")).alias("uw"),
                F.when(up_mask, F.col("nv") - du).otherwise(F.col("dv")).alias("dv"),
                F.when(up_mask, F.col("uw")).otherwise(F.col("dw")).alias("dw"),
            )
        elif trafo == "envelope_enforce_two_sided":
            adu = F.abs(F.col("uv") - F.col("nv"))
            add = F.abs(F.col("dv") - F.col("nv"))
            up_mask = adu >= add
            mx = F.greatest(adu, add)
            wide = wide.select(
                *keys,
                "nv",
                "nw",
                (F.col("nv") + mx).alias("uv"),
                F.when(up_mask, F.col("uw")).otherwise(F.col("dw")).alias("uw"),
                (F.col("nv") - mx).alias("dv"),
                F.when(up_mask, F.col("uw")).otherwise(F.col("dw")).alias("dw"),
            )
        elif trafo in RATE_ONLY_TRAFOS:
            raise ValueError(f"{trafo} is rate-only; not applicable to shapes")
        else:
            raise ValueError(f"unknown shape transformation: {trafo}")

    untouched = hists.filter(~F.col("shift").isin([up_name, down_name]))
    rebuilt = wide.select(
        *keys,
        F.lit(up_name).alias("shift"),
        F.col("uv").alias(value_col),
        F.col("uw").alias(variance_col),
    ).unionByName(
        wide.select(
            *keys,
            F.lit(down_name).alias("shift"),
            F.col("dv").alias(value_col),
            F.col("dw").alias(variance_col),
        )
    )
    cols = hists.columns
    return untouched.select(*cols).unionByName(rebuilt.select(*cols))
