"""Service-layer parity tests: settings precedence (env > toml >
default), request validation, response shape + timing, build CLI
idempotency gate."""

from __future__ import annotations

import os

import pytest

from scout_spark.settings import load_settings


def test_settings_defaults():
    s = load_settings(None)
    assert s.weights["similarity"] == 0.60
    assert s.proximity_km == 25.0
    assert s.type_boost["tourism:"] == 0.80
    assert s.type_boost["default"] == 0.40
    assert s.limit_scan == 10_000


def test_settings_toml_and_env(tmp_path, monkeypatch):
    cfg = tmp_path / "cfg.toml"
    cfg.write_text(
        """
[data]
dir = "from-toml"
[build]
overwrite = false
[ranking.weights]
similarity = 0.5
proximity_km = 10
[ranking.type_boost]
"shop:" = 0.9
"""
    )
    s = load_settings(str(cfg))
    assert s.data_dir == "from-toml" and s.overwrite is False
    assert s.weights["similarity"] == 0.5 and s.weights["type"] == 0.25
    assert s.proximity_km == 10.0
    assert s.type_boost["shop:"] == 0.9 and s.type_boost["amenity:"] == 0.70
    # env beats toml (reference settings.py:36-41)
    monkeypatch.setenv("SCOUT_SPARK_DATA_DIR", "from-env")
    monkeypatch.setenv("SCOUT_SPARK_OVERWRITE", "1")
    s2 = load_settings(str(cfg))
    assert s2.data_dir == "from-env" and s2.overwrite is True


def test_forward_request_validation():
    from scout_spark.plans.api import ForwardRequest

    with pytest.raises(ValueError):
        ForwardRequest(candidates=[])
    with pytest.raises(ValueError):
        ForwardRequest(candidates=["x"], limit=0)
    r = ForwardRequest(candidates=["Monograph Dining"], country="my", limit=3)
    assert r.limit == 3


def test_forward_geocode_response(spark):
    from scout_spark.etl.fixtures import raw_osm_fixture
    from scout_spark.etl.gazetteer import build_admin, build_pois
    from scout_spark.plans.api import ForwardRequest, forward_geocode
    from scout_spark.plans.api import engine_from_settings
    from scout_spark.settings import load_settings

    raw = raw_osm_fixture(spark, n_pois=100)
    engine = engine_from_settings(
        spark, build_pois(raw).cache(), build_admin(raw), load_settings(None)
    )
    resp = forward_geocode(
        engine, ForwardRequest(candidates=["Monograph Dining"], country="malaysia", limit=3)
    )
    assert len(resp.hits) == 3
    assert resp.hits[0]["name"] == "Monograph Dining"
    assert resp.took_ms > 0
    assert set(resp.hits[0]) == {
        "name", "lat", "lon", "country", "state", "city", "osm_id", "kind", "score",
    }


def test_build_cli_idempotency_gate(tmp_path, capsys):
    from scout_spark.etl.build import main

    out = str(tmp_path / "gaz")
    rc = main(["--raw", "fixture", "--out", out, "--fixture-rows", "50", "--overwrite"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "pois"))
    assert os.path.exists(os.path.join(out, "_meta.json"))
    # second run with --no-overwrite: gate fires before any Spark work
    rc2 = main(["--raw", "fixture", "--out", out, "--no-overwrite"])
    assert rc2 == 0
    assert "nothing to do" in capsys.readouterr().out


def test_concurrent_queries_one_session(spark):
    """SURVEY.md §4 O10: one long-lived session serves concurrent
    requests (replacing the reference's per-request connections) —
    parallel threads against the same cached engine must all return
    correct, independent results."""
    from concurrent.futures import ThreadPoolExecutor

    from scout_spark.etl.fixtures import raw_osm_fixture
    from scout_spark.etl.gazetteer import build_admin, build_pois
    from scout_spark.plans.geocode import GeocodeSettings, ScoutEngine

    raw = raw_osm_fixture(spark, n_pois=100)
    engine = ScoutEngine(
        spark, build_pois(raw).cache(), build_admin(raw),
        GeocodeSettings(use_pandas_udf=False),
    )
    queries = ["Monograph Dining", "kopitiam 88", "taman botani", "美食中心"] * 3

    def run(q):
        return (q, engine.forward([q], limit=1).collect())

    with ThreadPoolExecutor(max_workers=6) as ex:
        results = dict(ex.map(run, queries))
    assert results["Monograph Dining"][0]["name"] == "Monograph Dining"
    assert results["美食中心"][0]["name"] == "美食中心"
    assert all(len(v) >= 1 for v in results.values())
