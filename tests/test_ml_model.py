"""MLModel lifecycle tests (reference ml/__init__.py:23: train :555,
evaluate :581, per-fold outputs; k-fold split tasks/ml.py:221)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from columnflow_spark.ml import LinregDemo, get_ml_model, ml_model, MLModel
from columnflow_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_registry_and_params():
    assert get_ml_model("LinregDemo") is LinregDemo
    m = LinregDemo(folds=4, parameters={"l2": 0.1, "alpha": 3})
    assert m.folds == 4
    assert m.parameter_pairs() == [("alpha", "3"), ("l2", "0.1")]
    assert "fold_2__alpha_3__l2_0.1" in m.output_path("/tmp/x", 2)

    @ml_model(name="custom_name")
    class Other(MLModel):
        pass

    assert get_ml_model("custom_name") is Other


def test_fold_split_deterministic(spark):
    m = LinregDemo()
    li = load_table(spark, SF_SMOKE, "lineitem", columns=sorted(m.uses()))
    f1 = li.withColumn("fold", m.fold_column())
    counts = {r.fold: r.n for r in f1.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {0, 1, 2}
    # content-derived: balanced-ish and identical across evaluations
    total = sum(counts.values())
    assert all(abs(c - total / 3) < total * 0.1 for c in counts.values())
    counts2 = {r.fold: r.n for r in f1.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == counts2


def test_train_evaluate_roundtrip(spark, tmp_path):
    m = LinregDemo()
    li = load_table(spark, SF_SMOKE, "lineitem", columns=sorted(m.uses()))
    out_dir = str(tmp_path)
    models = m.run_training(spark, li, output_dir=out_dir)
    assert set(models) == {0, 1, 2}
    # per-fold sink outputs exist and round-trip exactly
    for k, artifact in models.items():
        path = m.output_path(out_dir, k)
        assert os.path.isdir(path)
        assert m.open_model(spark, path) == artifact
        assert set(artifact) == {"beta0", "beta1", "beta2"}
    # evaluation from disk artifacts scores every event with its own fold
    scored = m.run_evaluation(spark, li, output_dir=out_dir)
    assert "score" in scored.columns
    row = scored.select(F.count(F.lit(1)).alias("n"), F.count("score").alias("ns")).first()
    assert row.n == row.ns > 0
    # the closed-form fit agrees with an independent numpy least-squares
    # on the same complement data (fold 0's model trains on folds 1+2)
    import numpy as np

    pdf = m._features(li.withColumn("fold", m.fold_column())).filter(F.col("fold") != 0).select(
        "x1", "x2", "y"
    ).toPandas()
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    ref = np.linalg.lstsq(X, pdf.y.to_numpy(), rcond=None)[0]
    got = [models[0]["beta0"], models[0]["beta1"], models[0]["beta2"]]
    assert np.allclose(got, ref, rtol=1e-6), (got, ref)
