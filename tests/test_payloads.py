"""External payload bundle tests (reference tasks/external.py:467
BundleExternalFiles + selection/cms/json_filter.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from columnflow_spark.payloads import ExternalFile, PayloadBundle, golden_json_rows


@pytest.fixture
def golden_file(tmp_path):
    payload = {"0": [[1, 10], [15, 25]], "1": [[5, 20]]}
    p = tmp_path / "golden.json"
    p.write_text(json.dumps(payload))
    return str(p), payload


def test_fetch_caches_and_invalidates(golden_file, tmp_path):
    path, _ = golden_file
    bundle = PayloadBundle({"golden": ExternalFile(path)}, cache_dir=str(tmp_path / "cache"))
    c1 = bundle.fetch("golden")
    assert os.path.exists(c1)
    # same declaration -> same cached copy
    assert bundle.fetch("golden") == c1
    # a content change (mtime bump) re-fetches under a new key
    os.utime(path, (1, 1))
    assert bundle.fetch("golden") != c1
    # version bump busts the cache too
    b2 = PayloadBundle({"golden": ExternalFile(path, version="v2")}, cache_dir=str(tmp_path / "cache"))
    assert b2.fetch("golden") != bundle.fetch("golden")
    with pytest.raises(ValueError):
        bundle.fetch("nope")


def test_load_and_broadcast(spark, golden_file, tmp_path):
    path, payload = golden_file
    bundle = PayloadBundle({"golden": path}, cache_dir=str(tmp_path / "cache"))
    assert bundle.load("golden") == payload
    bc = bundle.broadcast(spark, "golden")
    assert bc.value == payload
    # memoized per session
    assert bundle.broadcast(spark, "golden") is bc
    assert bundle.as_payloads(spark) == {"golden": payload}


def test_golden_filter_via_bundle(spark, golden_file, tmp_path):
    # the bundled golden JSON drives the same interval semi-join as the
    # literal-table form in queries/physics.py golden_json_filter
    path, _ = golden_file
    bundle = PayloadBundle({"golden": path}, cache_dir=str(tmp_path / "cache"))
    golden = bundle.dataframe(spark, "golden", "run long, lo long, hi long", golden_json_rows)
    ev = spark.createDataFrame(
        [(1, 0, 5), (2, 0, 12), (3, 1, 20), (4, 1, 21), (5, 2, 1)],
        "event_id long, run long, lumi long",
    )
    cond = (ev.run == golden.run) & ev.lumi.between(golden.lo, golden.hi)
    kept = sorted(r.event_id for r in ev.join(golden, cond, "left_semi").collect())
    assert kept == [1, 3]
    # plan quality: the payload side must broadcast
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ev.join(golden, cond, "left_semi").explain()
    assert "Broadcast" in buf.getvalue()


def test_operator_setup_receives_payloads(spark, golden_file, tmp_path):
    from columnflow_spark.core.registry import ArrayFunction

    path, payload = golden_file
    bundle = PayloadBundle({"golden": path}, cache_dir=str(tmp_path / "cache"))
    seen = {}

    def setup(self, payloads):
        seen.update(payloads)

    op = ArrayFunction.derive(
        "payload_op", {"uses": {"run"}, "produces": set(), "setup_func": setup,
                       "call_func": lambda self, df: df}
    )()
    op.setup(bundle.as_payloads(spark))
    assert seen == {"golden": payload}


def test_bundle_from_catalog_config(spark, golden_file, tmp_path):
    # reference wiring: cfg.x.external_files declares the bundle
    from columnflow_spark.catalog import Config
    from columnflow_spark.payloads import ExternalFile, PayloadBundle

    path, payload = golden_file
    cfg = Config("c", 1, aux={"external_files": {"golden": ExternalFile(path)}})
    bundle = PayloadBundle.from_config(cfg, cache_dir=str(tmp_path / "cache"))
    assert bundle.load("golden") == payload
