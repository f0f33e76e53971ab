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
        """Persist one fold's artifact as a small parquet file.  Written
        driver-side with pyarrow: the artifact is a handful of scalars the
        driver already holds (the reference likewise writes model targets
        from the training process, not through the cluster), and a Spark
        write job costs seconds of pure overhead per tiny file.  The file
        stays a plain parquet directory readable by ``spark.read.parquet``
        on any cluster."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        keys = sorted(artifact)
        table = pa.table(
            {"param": pa.array(keys, pa.string()),
             "value": pa.array([float(artifact[k]) for k in keys], pa.float64())}
        )
        pq.write_table(table, os.path.join(path, "part-00000.parquet"))

    def open_model(self, spark: SparkSession, path: str) -> dict:
        """Load a fold artifact written by :meth:`save_model` (reference
        MLModel.open_model)."""
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        return dict(zip(t.column("param").to_pylist(), t.column("value").to_pylist()))

    def run_training(
        self,
        spark: SparkSession,
        df: DataFrame,
        output_dir: str | None = None,
    ) -> dict[int, dict]:
        """k-fold training loop (reference MLTraining task): for each fold,
        fit on the complement and optionally persist the artifact."""
        with_fold = df.withColumn("fold", self.fold_column())
        models = self._train_artifacts(spark, with_fold)
        if output_dir is not None:
            for k, artifact in models.items():
                self.save_model(spark, artifact, self.output_path(output_dir, k))
        return models

    def _train_artifacts(self, spark: SparkSession, with_fold: DataFrame) -> dict[int, dict]:
        """Default: one :meth:`train` job per fold on its complement.
        Models whose fit is a sufficient-statistics aggregation should
        override this with a single grouped pass (see LinregDemo)."""
        return {
            k: self.train(spark, with_fold.filter(F.col("fold") != k), k)
            for k in range(self.folds)
        }

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

    Feature values are integer-valued doubles, so the first-order sums are
    exact in IEEE double regardless of partial-aggregation order.  The
    SQUARED sums (s2/s22) are not once magnitudes push products past 2^53
    — y up to ~1e7 does — so they are order-dependent in principle; the
    oracle compare absorbs this through its round-4 tolerance at the test
    scales, and a bit-exact-at-any-scale variant would aggregate the
    squared sums as DECIMAL at ~2x aggregation cost.  The determinant
    arithmetic itself (fixed expression tree over those sums) reproduces
    exactly in the SQL oracle.
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

    _SUFF = ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")

    @staticmethod
    def _suff_aggs() -> list:
        return [
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
            F.sum(F.col("x1") * F.col("x1")).alias("s11"),
            F.sum(F.col("x1") * F.col("x2")).alias("s12"),
            F.sum(F.col("x2") * F.col("x2")).alias("s22"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x1") * F.col("y")).alias("s1y"),
            F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        ]

    @staticmethod
    def _betas(s: dict) -> dict:
        from columnflow_spark.queries.physics import _det3

        det = _det3(s["n"], s["s1"], s["s2"], s["s1"], s["s11"], s["s12"], s["s2"], s["s12"], s["s22"])
        det0 = _det3(s["sy"], s["s1"], s["s2"], s["s1y"], s["s11"], s["s12"], s["s2y"], s["s12"], s["s22"])
        det1 = _det3(s["n"], s["sy"], s["s2"], s["s1"], s["s1y"], s["s12"], s["s2"], s["s2y"], s["s22"])
        det2 = _det3(s["n"], s["s1"], s["sy"], s["s1"], s["s11"], s["s1y"], s["s2"], s["s12"], s["s2y"])
        return {"beta0": det0 / det, "beta1": det1 / det, "beta2": det2 / det}

    def train(self, spark: SparkSession, df: DataFrame, fold: int) -> dict:
        s = self._features(df).agg(*self._suff_aggs()).first()
        return self._betas(s.asDict())

    def _train_artifacts(self, spark: SparkSession, with_fold: DataFrame) -> dict[int, dict]:
        """All folds in ONE pass: sufficient statistics grouped by fold,
        complement = total - fold (exact — the features are integer-valued
        doubles), betas per fold driver-side.  Identical arithmetic to the
        oracle's tot-minus-fold CTE, and k-fold training costs one scan
        instead of k."""
        per_fold = {r["fold"]: r.asDict() for r in with_fold.transform(self._features).groupBy("fold").agg(*self._suff_aggs()).collect()}
        tot = {k: sum(s[k] for s in per_fold.values()) for k in self._SUFF}
        return {
            f: self._betas({k: tot[k] - s[k] for k in self._SUFF})
            for f, s in sorted(per_fold.items())
        }

    def evaluate(self, df: DataFrame, models: dict[int, dict]) -> DataFrame:
        f = self._features(df)
        score = self.fold_case(
            models,
            lambda m: F.lit(m["beta0"])
            + F.lit(m["beta1"]) * F.col("x1")
            + F.lit(m["beta2"]) * F.col("x2"),
        )
        return f.withColumn("score", score)
