"""Media-column plumbing tests: typed struct schema, mapInPandas batch
shapes, deterministic fallbacks, frame fan-out (columnflow_spark.mmdata)."""

from __future__ import annotations

from pyspark.sql import functions as F

from columnflow_spark.mmdata import audio_features, build_media_table, decode_image, sample_frames
from columnflow_spark.sources import load_table


def _media(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
        .limit(50)
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    )
    return build_media_table(docs, payload="payload", mime="image/fake")


def test_media_struct_schema(spark, sf_dir):
    media = _media(spark, sf_dir)
    dt = dict(media.dtypes)["media"]
    assert "payload:binary" in dt.replace(" ", "")
    assert "n_bytes:bigint" in dt.replace(" ", "")
    # metadata usable without decoding payloads
    row = media.select(F.col("media.meta.n_bytes").alias("nb"), F.col("media.mime").alias("m")).first()
    assert row["nb"] > 0 and row["m"] == "image/fake"


def test_decode_image_deterministic(spark, sf_dir):
    media = _media(spark, sf_dir)
    a = {r["doc_id"]: (r["width"], r["height"]) for r in decode_image(media).collect()}
    b = {r["doc_id"]: (r["width"], r["height"]) for r in decode_image(media).collect()}
    assert a == b and len(a) == 50
    assert all(64 <= w < 64 + 577 for w, _h in a.values())


def test_sample_frames_fanout(spark, sf_dir):
    media = _media(spark, sf_dir)
    frames = sample_frames(media, every_n=30).collect()
    by_doc: dict = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # every doc emits frame 0, strides of 30, fingerprints in range
    for idxs in by_doc.values():
        assert sorted(idxs)[0] == 0
        assert all(i % 30 == 0 for i in idxs)
    assert all(0 <= r["frame_fp"] < 1000003 for r in frames)


def test_audio_features_shape(spark, sf_dir):
    media = _media(spark, sf_dir)
    rows = audio_features(media).collect()
    assert len(rows) == 50
    assert all(r["duration_ms"] >= 0 and 0.0 <= r["loudness"] < 1.0 for r in rows)


def test_funnel_classifier_stage_counts_and_discrimination(spark, sf_dir):
    import pyspark.sql.functions as F

    import columnflow_spark.queries.mmdata as M
    from columnflow_spark.queries import all_queries

    rows = {r.name: r for r in all_queries()["training_corpus_pipeline"](spark, sf_dir).collect()}
    assert [rows[n].stage for n in (
        "input", "lang_filter", "quality_gate", "exact_dedup",
        "decontaminated", "classifier_filter", "tokenized",
    )] == [1, 2, 3, 4, 5, 6, 7]
    # the learned gate actually filters, and tokenization sees its output
    assert 0 < rows["classifier_filter"].n_docs < rows["decontaminated"].n_docs
    assert rows["tokenized"].n_docs == rows["classifier_filter"].n_docs

    # discrimination: the median-threshold keep rate for 'dup'-marked docs
    # (the weak-supervision negative class) is below the clean-doc rate
    docs = M.load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    w = M._tf_logreg_train(spark, sf_dir)
    wl = F.array(*[F.lit(float(v)) for v in w])
    z = F.aggregate(
        F.zip_with(wl, M._tf_x_expr(), lambda a, b: a * b), F.lit(0.0), lambda a, v: a + v
    )
    thr = float(docs.select(z.alias("z")).agg(F.expr("percentile(z, 0.5)")).collect()[0][0])
    scored = docs.select(z.alias("z"), F.col("text")).withColumn(
        "keep", F.col("z") >= F.lit(thr)
    ).withColumn("is_dup_marked", F.array_contains(F.split("text", " "), "dup"))
    rates = {
        r.is_dup_marked: r.rate
        for r in scored.groupBy("is_dup_marked").agg(F.avg(F.col("keep").cast("double")).alias("rate")).collect()
    }
    assert rates[True] < rates[False]
