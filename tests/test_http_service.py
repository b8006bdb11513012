"""HTTP service shim (plans/http_service.py): the reference's wire
contract — POST /v1/geocode/forward with {"candidates":[{"text":...}]},
GET /healthz, Server-Timing / X-Process-Time headers, 422 validation —
served from one shared SparkSession-backed engine."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from scout_spark.etl.fixtures import raw_osm_fixture
from scout_spark.etl.gazetteer import build_admin, build_pois
from scout_spark.plans.geocode import GeocodeSettings, ScoutEngine
from scout_spark.plans.http_service import serve


@pytest.fixture(scope="module")
def server(spark):
    raw = raw_osm_fixture(spark, n_pois=300)
    engine = ScoutEngine(
        spark, build_pois(raw).cache(), build_admin(raw), GeocodeSettings()
    )
    srv = serve(engine)
    yield srv
    srv.shutdown()


def _url(server, path):
    host, port = server.server_address
    return f"http://{host}:{port}{path}"


def _post(server, path, payload):
    req = urllib.request.Request(
        _url(server, path),
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    return urllib.request.urlopen(req)


def test_healthz(server):
    with urllib.request.urlopen(_url(server, "/healthz")) as r:
        assert r.status == 200
        assert json.loads(r.read()) == {"ok": True}
        assert r.headers["Server-Timing"].startswith("app;dur=")
        assert r.headers["X-Process-Time"].endswith("ms")


def test_forward_readme_example_shape(server):
    # the reference's canonical OpenAPI example (app.py:76-84)
    with _post(
        server,
        "/v1/geocode/forward",
        {"candidates": [{"text": "Monograph Dining"}], "country": "my", "limit": 3},
    ) as r:
        assert r.status == 200
        body = json.loads(r.read())
    hits = body["hits"]
    assert 1 <= len(hits) <= 3
    top = hits[0]
    assert top["name"] == "Monograph Dining"
    assert set(top) == {
        "name", "lat", "lon", "country", "state", "city", "osm_id", "kind", "score",
    }
    assert top["score"] >= hits[-1]["score"]


def test_forward_accepts_bare_string_candidates(server):
    with _post(
        server, "/v1/geocode/forward", {"candidates": ["Kopitiam 88"], "limit": 2}
    ) as r:
        assert json.loads(r.read())["hits"]


def test_validation_errors_are_422(server):
    for payload in ({"candidates": []}, {"candidates": ["x"], "limit": 0}):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, "/v1/geocode/forward", payload)
        assert ei.value.code == 422


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(_url(server, "/nope"))
    assert ei.value.code == 404


def test_concurrent_requests_share_session(server):
    from concurrent.futures import ThreadPoolExecutor

    def one(_):
        with _post(
            server, "/v1/geocode/forward", {"candidates": [{"text": "Monograph"}]}
        ) as r:
            return json.loads(r.read())["hits"]

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(one, range(8)))
    assert all(results[0] == r for r in results)
