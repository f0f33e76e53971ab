"""MLModel interface: the train/evaluate/fold lifecycle a user plugs a
model into (reference columnflow/ml/__init__.py:23 ``MLModel``, train :555,
evaluate :581; k-fold split tasks/ml.py:221).

Spark-first translation of the reference contract:

- ``uses`` / ``produces``: column sets, used for scan pruning exactly like
  the other operator classes.
- fold split: deterministic content-derived fold id (sha-seeded, never
  partition-derived) — reproducible on any cluster layout; the reference's
  per-fold dataset split becomes a ``fold != k`` filter on one DataFrame.
- ``train(spark, df, fold)``: returns a *small* model artifact (a plain
  dict of parameters).  Training itself is expressed as DataFrame
  aggregations (closed-form fits, gradient steps as single-pass aggs) so it
  distributes; only the artifact ever reaches the driver.
- ``evaluate(df, models)``: attaches score columns by compiling the
  per-fold artifacts into literal when-chains — pure codegen, no join, no
  UDF; each event is scored by the model of the fold it was *held out*
  from (reference ``events_used_in_training`` semantics).
- per-fold outputs: artifacts persist as parquet via the sinks layer
  (reference per-fold ``law`` targets).

``@ml_model`` registers subclasses by name like the other operator
families (reference DerivableMeta registries).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from columnflow_spark.functions.hashing import seed_long

_ML_MODELS: dict[str, type["MLModel"]] = {}


def ml_model(cls: type["MLModel"] | None = None, *, name: str | None = None):
    """Class decorator registering an :class:`MLModel` subclass."""

    def register(c: type[MLModel]) -> type[MLModel]:
        c.cls_name = name or c.__name__
        _ML_MODELS[c.cls_name] = c
        return c

    return register(cls) if cls is not None else register


def get_ml_model(name: str) -> type["MLModel"]:
    if name not in _ML_MODELS:
        raise ValueError(f"unknown ml model {name!r}")
    return _ML_MODELS[name]


class MLModel:
    """Base lifecycle (reference ml/__init__.py:23).  Subclasses implement
    :meth:`uses`, :meth:`produces`, :meth:`features`, :meth:`target`,
    :meth:`train` and :meth:`evaluate`; :meth:`fold_column`,
    :meth:`run_training` and :meth:`run_evaluation` are the engine-provided
    harness."""

    cls_name: str = "ml_model"
    folds: int = 2
    store_name: str | None = None

    def __init__(self, config=None, folds: int | None = None, parameters: dict | None = None):
        self.config = config
        if folds is not None:
            self.folds = int(folds)
        self.parameters = dict(parameters or {})
        self.setup()

    # -- optional hooks ------------------------------------------------------
    def setup(self) -> None:
        """Post-init hook (reference MLModel.setup)."""

    def datasets(self) -> list[str]:
        """Datasets used in training (names into the config catalog)."""
        return []

    def parameter_pairs(self) -> list[tuple[str, str]]:
        """String-encoded hyper-parameters for output paths (reference
        MLModel.parameter_pairs)."""
        return sorted((k, str(v)) for k, v in self.parameters.items())

    # -- required hooks ------------------------------------------------------
    def uses(self) -> set[str]:
        raise NotImplementedError

    def produces(self) -> set[str]:
        raise NotImplementedError

    def fold_key_columns(self) -> list[str]:
        """Columns whose hash defines the fold split (content-derived)."""
        raise NotImplementedError

    def train(self, spark: SparkSession, df: DataFrame, fold: int) -> dict:
        """Fit on *df* (the events NOT in *fold*) and return a small
        artifact dict of plain Python values."""
        raise NotImplementedError

    def evaluate(self, df: DataFrame, models: dict[int, dict]) -> DataFrame:
        """Attach ``produces`` columns to *df*, scoring each event with the
        model of its own (held-out) fold."""
        raise NotImplementedError

    # -- engine-provided harness --------------------------------------------
    def fold_column(self) -> Column:
        """Deterministic fold id in [0, folds) from the key columns."""
        keys = [F.col(c) for c in self.fold_key_columns()]
        return (seed_long(*keys) % self.folds).alias("fold")

    def fold_case(self, models: dict[int, dict], branch: Callable[[dict], Column]) -> Column:
        """Compile per-fold artifacts into one literal when-chain over the
        ``fold`` column — broadcast-free, join-free, codegen'd scoring."""
        expr = None
        for k in sorted(models):
            b = branch(models[k])
            expr = F.when(F.col("fold") == k, b) if expr is None else expr.when(F.col("fold") == k, b)
        return expr

    def output_path(self, base_dir: str, fold: int) -> str:
        store = self.store_name or self.cls_name
        params = "__".join(f"{k}_{v}" for k, v in self.parameter_pairs())
        leaf = f"fold_{fold}" + (f"__{params}" if params else "")
        return os.path.join(base_dir, store, leaf)

    def save_model(self, spark: SparkSession, artifact: dict, path: str) -> None:
        """Persist one fold's artifact as a single-row parquet (the per-fold
        output target; reference MLModel.output)."""
        row = [(k, float(v)) for k, v in sorted(artifact.items())]
        spark.createDataFrame(row, "param string, value double").coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)

    def open_model(self, spark: SparkSession, path: str) -> dict:
        """Load a fold artifact written by :meth:`save_model` (reference
        MLModel.open_model)."""
        return {r.param: r.value for r in spark.read.parquet(path).collect()}

    def run_training(
        self,
        spark: SparkSession,
        df: DataFrame,
        output_dir: str | None = None,
    ) -> dict[int, dict]:
        """k-fold training loop (reference MLTraining task): for each fold,
        fit on the complement and optionally persist the artifact."""
        with_fold = df.withColumn("fold", self.fold_column())
        models: dict[int, dict] = {}
        for k in range(self.folds):
            artifact = self.train(spark, with_fold.filter(F.col("fold") != k), k)
            if output_dir is not None:
                self.save_model(spark, artifact, self.output_path(output_dir, k))
            models[k] = artifact
        return models

    def run_evaluation(
        self,
        spark: SparkSession,
        df: DataFrame,
        models: dict[int, dict] | None = None,
        output_dir: str | None = None,
    ) -> DataFrame:
        """Score events with their held-out fold's model (reference
        MLEvaluation task).  *models* may be omitted when *output_dir*
        holds artifacts from :meth:`run_training`."""
        if models is None:
            if output_dir is None:
                raise ValueError("need models or output_dir")
            models = {
                k: self.open_model(spark, self.output_path(output_dir, k))
                for k in range(self.folds)
            }
        with_fold = df.withColumn("fold", self.fold_column())
        return self.evaluate(with_fold, models)


@ml_model
class LinregDemo(MLModel):
    """Reference-style demo model (the engine's analogue of the reference
    user guide's ``TestModel``): 2-feature linear regression with intercept,
    fit closed-form per fold via a single-pass sufficient-statistics
    aggregation — training distributes; only the 3 betas reach the driver.

    Feature values are integer-valued doubles, so the sufficient sums are
    exact in IEEE double regardless of partial-aggregation order, and the
    determinant arithmetic (fixed expression tree) reproduces bit-for-bit
    in the SQL oracle — the property the hash-compare gate needs.
    """

    folds = 3
    store_name = "linreg_demo"

    def uses(self) -> set[str]:
        return {"l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice"}

    def produces(self) -> set[str]:
        return {"score"}

    def fold_key_columns(self) -> list[str]:
        return ["l_orderkey", "l_linenumber"]

    @staticmethod
    def _features(df: DataFrame) -> DataFrame:
        return df.withColumns(
            {
                "x1": F.col("l_quantity").cast("double"),
                "x2": F.round(F.col("l_discount") * 100, 0),
                "y": F.round(F.col("l_extendedprice") * 100, 0),
            }
        )

    def train(self, spark: SparkSession, df: DataFrame, fold: int) -> dict:
        from columnflow_spark.queries.physics import _det3

        f = self._features(df)
        s = f.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
            F.sum(F.col("x1") * F.col("x1")).alias("s11"),
            F.sum(F.col("x1") * F.col("x2")).alias("s12"),
            F.sum(F.col("x2") * F.col("x2")).alias("s22"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x1") * F.col("y")).alias("s1y"),
            F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        ).first()
        det = _det3(s.n, s.s1, s.s2, s.s1, s.s11, s.s12, s.s2, s.s12, s.s22)
        det0 = _det3(s.sy, s.s1, s.s2, s.s1y, s.s11, s.s12, s.s2y, s.s12, s.s22)
        det1 = _det3(s.n, s.sy, s.s2, s.s1, s.s1y, s.s12, s.s2, s.s2y, s.s22)
        det2 = _det3(s.n, s.s1, s.sy, s.s1, s.s11, s.s1y, s.s2, s.s12, s.s2y)
        return {"beta0": det0 / det, "beta1": det1 / det, "beta2": det2 / det}

    def evaluate(self, df: DataFrame, models: dict[int, dict]) -> DataFrame:
        f = self._features(df)
        score = self.fold_case(
            models,
            lambda m: F.lit(m["beta0"])
            + F.lit(m["beta1"]) * F.col("x1")
            + F.lit(m["beta2"]) * F.col("x2"),
        )
        return f.withColumn("score", score)
