"""Regression pins for the round-9 ADVICE items closed in round 10.

1. scripts/floor_capture.py — the four-way adjudication is factored
   into one `_adjudicate` helper used by BOTH the first pass and the
   idle re-measure loop (the loop previously skipped the calibration
   branch, so a calibrated entry could keep a stale plan_slack label).
2. scripts/floor_capture.py — `_calibrate` restores the caller's
   shuffle.partitions and `SET threads={cpus}` instead of hardcoded
   32/8 (with --cpus != 32 the first entry's duck_s ran at 32 threads).
3. scout_spark/inventory/r9_ops.py — url_flag_frame coalesces NULL
   source identically on the engine and the oracle (a NULL source
   previously NULLed the Spark concat -> reg_domain '' vs the oracle's
   NULL — latent parity divergence).
4. tests/test_r9_ops.py keyframe stream test uses the sf_dir fixture
   (regression is the test itself; no extra pin needed).
"""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import functions as F  # noqa: F401  (fixture import parity)


def _floor_capture():
    p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "floor_capture.py",
    )
    spec = importlib.util.spec_from_file_location("floor_capture_mod", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_adjudicate_four_way_branches():
    fc = _floor_capture()

    rec = {"spark_sp1_s": 0.3, "spark_noop_s": 0.4, "ratio_sp1_vs_1t": 9.0}
    fc._adjudicate(rec, "anything", {})
    assert rec["adjudication"] == "job_floor"

    rec = {"spark_sp1_s": 1.2, "spark_noop_s": 0.9, "ratio_sp1_vs_1t": 1.9}
    fc._adjudicate(rec, "anything", {})
    assert rec["adjudication"] == "engine_floor"

    name = "graph_butterfly_count_bipartite"  # has THROUGHPUT_EVIDENCE
    calib_key = fc.THROUGHPUT_EVIDENCE[name]["calibration"]
    calibs = {calib_key: {"ratio": 4.0}}

    rec = {"spark_sp1_s": 3.0, "spark_noop_s": 2.0, "ratio_sp1_vs_1t": 7.9}
    fc._adjudicate(rec, name, calibs)
    assert rec["adjudication"] == "engine_floor_throughput"
    assert rec["calibration"] == calib_key
    assert rec["calibration_ratio"] == 4.0

    rec = {"spark_sp1_s": 3.0, "spark_noop_s": 2.0, "ratio_sp1_vs_1t": 8.1}
    fc._adjudicate(rec, name, calibs)
    assert rec["adjudication"] == "plan_slack"

    rec = {"spark_sp1_s": 3.0, "spark_noop_s": 2.0, "ratio_sp1_vs_1t": 5.0}
    fc._adjudicate(rec, "uncalibrated_entry", calibs)
    assert rec["adjudication"] == "plan_slack"


def test_remeasure_loop_uses_shared_adjudication():
    """The re-measure loop must call the SAME helper as the first pass
    — pinned structurally: exactly two `_adjudicate(rec, name,` call
    sites in main(), zero inline adjudication branches left."""
    p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "floor_capture.py",
    )
    src = open(p).read()
    assert src.count("_adjudicate(rec, name, calibrations)") == 2
    # no stray inline assignment of the two labels the loop used to
    # re-derive by hand (definitions inside _adjudicate excepted —
    # count total occurrences instead)
    assert src.count('"job_floor"') == 1
    assert src.count('"engine_floor"') == 1


def test_calibrate_restores_threads_and_partitions(monkeypatch):
    fc = _floor_capture()
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute("SET threads=4")

    class FakeConf:
        def __init__(self):
            self.vals = {"spark.sql.shuffle.partitions": "5"}

        def get(self, k):
            return self.vals[k]

        def set(self, k, v):
            self.vals[k] = v

    class FakeSpark:
        def __init__(self):
            self.conf = FakeConf()

    # empty the calibration programs: we're testing the save/restore
    # envelope, not the measurement
    monkeypatch.setattr(fc, "CALIBRATIONS", {})
    spark = FakeSpark()
    out = fc._calibrate(spark, con, passes=1, cpus=4)
    assert out == {}
    assert spark.conf.vals["spark.sql.shuffle.partitions"] == "5"
    assert (
        int(con.execute("SELECT current_setting('threads')").fetchone()[0])
        == 4
    )


def test_url_flag_frame_null_source_matches_oracle(spark):
    """NULL source must produce the SAME coalesced host/reg_domain on
    the engine and on the oracle's prediction arithmetic — covering
    both the generic-TLD branch (doc 41 -> .net) and the 2-label
    public-suffix branch (doc 63 -> .co.uk)."""
    import duckdb

    from scout_spark.inventory.r9_ops import url_flag_frame

    docs = spark.createDataFrame(
        [(41, None, "en"), (63, None, None), (42, "SRC3", None)],
        "doc_id long, source string, lang string",
    )
    got = {
        r.doc_id: (r.host, r.reg_domain, r.blocked)
        for r in url_flag_frame(docs).collect()
    }
    # no NULL/'' leaks through the parse on NULL source
    for doc_id, (host, reg, _) in got.items():
        assert host, f"NULL host for doc {doc_id}"
        assert reg, f"empty reg_domain for doc {doc_id}"

    con = duckdb.connect()
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
        WITH documents AS (
          SELECT 41::BIGINT doc_id, NULL::VARCHAR source, 'en' lang
          UNION ALL SELECT 63, NULL, NULL
          UNION ALL SELECT 42, 'SRC3', NULL
        )
        SELECT doc_id,
               ['www','cdn','m'][(doc_id % 3 + 1)::INT] || '.' ||
                 lower(coalesce(source, 'unksrc')) || '.' ||
                 ['com','org','net','co.uk','io']
                 [((doc_id // 20) % 5 + 1)::INT] AS host,
               lower(coalesce(source, 'unksrc')) || '.' ||
                 ['com','org','net','co.uk','io']
                 [((doc_id // 20) % 5 + 1)::INT] AS reg_domain
        FROM documents
        """
        ).fetchall()
    }
    for doc_id, (host, reg) in duck.items():
        assert got[doc_id][0] == host
        assert got[doc_id][1] == reg
    # the 2-label suffix branch really fired and kept 3 labels
    assert got[63][1] == "unksrc.co.uk"
    assert got[63][0] == "www.unksrc.co.uk"
