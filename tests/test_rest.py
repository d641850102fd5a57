"""REST façade tests — the SirixVerticle route surface
(SirixVerticle.kt:371-520) over the versioned store, driven through a
real HTTP client (urllib) against an embedded server."""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from datetime import datetime

import pytest


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from sirix_spark.api import Sirix

    sirix = Sirix(spark, str(tmp_path_factory.mktemp("rest_store")))
    srv = sirix.serve()
    yield srv
    srv.stop()


def _req(srv, path, method="GET", body=None):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}",
        data=body.encode() if body is not None else None,
        method=method,
    )
    try:
        with urllib.request.urlopen(req) as r:
            raw = r.read().decode()
            return r.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        raw = e.read().decode()
        return e.code, json.loads(raw) if raw else None


def test_crud_roundtrip_and_time_travel(server):
    # POST creates revision 1
    recs = [{"id": 1, "name": "a", "v": 10}, {"id": 2, "name": "b", "v": 20}]
    code, out = _req(server, "/db1/res1?key=id", "POST", json.dumps(recs))
    assert (code, out) == (201, {"revision": 1})
    # duplicate POST is rejected
    code, _ = _req(server, "/db1/res1?key=id", "POST", json.dumps(recs))
    assert code == 409

    # PUT upserts → revision 2
    code, out = _req(server, "/db1/res1?key=id", "PUT", json.dumps([{"id": 2, "name": "b", "v": 99}]))
    assert (code, out) == (200, {"revision": 2})

    # GET latest reflects the upsert; ?revision=1 is the frozen past.
    # The POSTed ?key= column comes back canonicalized as record_key.
    code, rows = _req(server, "/db1/res1")
    assert code == 200 and {r["record_key"]: r["v"] for r in rows} == {1: 10, 2: 99}
    _, rows1 = _req(server, "/db1/res1?revision=1")
    assert {r["record_key"]: r["v"] for r in rows1} == {1: 10, 2: 20}

    # listing endpoints
    assert _req(server, "/")[1] == {"databases": ["db1"]}
    assert _req(server, "/db1")[1] == {"resources": ["res1"]}

    # history has both commits
    code, hist = _req(server, "/db1/res1/history")
    assert code == 200 and [h["revision"] for h in hist] == [1, 2]

    # revision-timestamp resolves to revision 1's snapshot
    ts1 = urllib.parse.quote(hist[0]["committed_at"])
    _, rows_ts = _req(server, f"/db1/res1?revision-timestamp={ts1}")
    assert {r["record_key"]: r["v"] for r in rows_ts} == {1: 10, 2: 20}

    # diff between revisions is the JSON-patch shape
    code, patch = _req(server, "/db1/res1/diff?first-revision=1&second-revision=2")
    assert code == 200
    ops = patch if isinstance(patch, list) else patch["diffs"]
    assert any("update" in json.dumps(op) for op in ops)

    # revision range read
    _, revs = _req(server, "/db1/res1?start-revision=1&end-revision=2")
    assert [r["revision"] for r in revs] == [1, 2]

    # SQL query entry (view named after the resource)
    code, rows = _req(server, "/db1/res1?query=SELECT+sum(v)+AS+s+FROM+res1")
    assert code == 200 and rows == [{"s": 109}]

    # JSONiq query entry (the reference's ?query= language:
    # SirixVerticle.kt routes ?query= through SirixCompileChain)
    jq = urllib.parse.quote(
        "for $i in jn:doc('db1','res1') where $i.v ge 20 "
        "return {\"k\": $i.record_key, \"v\": $i.v}"
    )
    code, rows = _req(server, f"/db1/res1?query={jq}")
    assert code == 200
    assert {r["k"]: r["v"] for r in rows} == {2: 99}

    # explicit language override wins over the prefix heuristic
    code, rows = _req(server, f"/db1/res1?query={jq}&query-language=jsoniq")
    assert code == 200 and len(rows) == 1

    # path summary endpoint (SirixVerticle /pathSummary route)
    code, summary = _req(server, "/db1/res1/pathSummary")
    assert code == 200
    paths = {r["path"] for r in summary}
    assert "v" in paths or any("v" in p for p in paths)

    # limit applies (serializer maxNodes analog)
    _, rows = _req(server, "/db1/res1?limit=1")
    assert len(rows) == 1

    # DELETE resource then 404
    assert _req(server, "/db1/res1", "DELETE")[0] == 204
    assert _req(server, "/db1/res1")[0] == 404
    assert _req(server, "/db1", "DELETE")[0] == 204


def test_errors(server):
    assert _req(server, "/nope/none")[0] == 404
    assert _req(server, "/nope")[0] == 404
    code, _ = _req(server, "/db2/res2?key=id", "PUT", json.dumps([{"id": 1}]))
    assert code == 404


def test_path_traversal_rejected(server):
    """ADVICE round-1 (high): '..'/dotted segments must never reach
    the filesystem — DELETE /.. would rmtree the store root's parent."""
    for path in ("/..", "/../..", "/db1/..", "/.hidden", "/db1/..%2Fres"):
        for method in ("GET", "DELETE"):
            code, out = _req(server, path, method)
            assert code == 400, (path, method, code)
            assert "invalid path segment" in out["error"]
    # still works for legal names after the guard
    code, _ = _req(server, "/no_such_db")
    assert code == 404


def test_parse_ts_normalizes_offsets():
    """ADVICE round-1 (low): a '+05:00' timestamp must convert to UTC
    wall time, not have its offset silently dropped."""
    from sirix_spark.rest import _parse_ts

    assert _parse_ts("2024-01-01T10:00:00+05:00") == datetime(2024, 1, 1, 5, 0, 0)
    assert _parse_ts("2024-01-01T10:00:00Z") == datetime(2024, 1, 1, 10, 0, 0)
    assert _parse_ts("2024-01-01T10:00:00") == datetime(2024, 1, 1, 10, 0, 0)
    # unencoded '+05:00' whose '+' arrived as a space
    assert _parse_ts("2024-01-01T10:00:00 05:00") == datetime(2024, 1, 1, 5, 0, 0)


def test_concurrent_query_revisions_no_view_race(server):
    """ADVICE round-1 (medium): concurrent ?query= for different
    revisions of one resource must each see their own snapshot."""
    import concurrent.futures

    recs = [{"id": 1, "v": 1}]
    _req(server, "/racedb/r?key=id", "POST", json.dumps(recs))
    _req(server, "/racedb/r?key=id", "PUT", json.dumps([{"id": 1, "v": 2}]))

    def fetch(rev):
        q = urllib.parse.quote(f"SELECT v FROM r")
        code, out = _req(server, f"/racedb/r?revision={rev}&query={q}")
        assert code == 200
        return rev, out[0]["v"]

    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        results = list(ex.map(fetch, [1, 2] * 8))
    assert all(v == rev for rev, v in results), results


# ---- bearer-token auth (SirixVerticle.kt Keycloak-layer analog) -----
def test_token_auth_rejects_and_accepts(spark, tmp_path_factory):
    from sirix_spark.api import Sirix

    sirix = Sirix(spark, str(tmp_path_factory.mktemp("rest_auth")))
    srv = sirix.serve(token="s3cret")
    try:
        base = f"http://{srv.host}:{srv.port}"
        # no token → 401
        code, out = _req(srv, "/")
        assert code == 401
        # wrong token → 401
        req = urllib.request.Request(base + "/", headers={"Authorization": "Bearer nope"})
        try:
            urllib.request.urlopen(req)
            assert False, "expected 401"
        except urllib.error.HTTPError as e:
            assert e.code == 401
        # right token → 200
        req = urllib.request.Request(base + "/", headers={"Authorization": "Bearer s3cret"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert json.loads(r.read().decode()) == {"databases": []}
    finally:
        srv.stop()


@pytest.fixture(scope="module")
def scoped_server(spark, tmp_path_factory):
    from sirix_spark.api import Sirix

    sirix = Sirix(spark, str(tmp_path_factory.mktemp("rest_scoped")))
    srv = sirix.serve(
        scopes={
            "admin-tok": {"*": "rw"},
            "writer-tok": {"salesdb": "rw"},
            "reader-tok": {"salesdb": "ro"},
        }
    )
    yield srv
    srv.stop()


def _req_tok(srv, path, token, method="GET", body=None):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}",
        data=body.encode() if body is not None else None,
        method=method,
        headers={"Authorization": f"Bearer {token}"} if token else {},
    )
    try:
        with urllib.request.urlopen(req) as r:
            raw = r.read().decode()
            return r.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        e.read()
        return e.code, None


def test_per_database_scopes(scoped_server):
    recs = json.dumps([{"id": 1, "v": 10}])
    # no token → 401; reader can't write; writer can
    assert _req_tok(scoped_server, "/salesdb/r1?key=id", None, "POST", recs)[0] == 401
    assert _req_tok(scoped_server, "/salesdb/r1?key=id", "reader-tok", "POST", recs)[0] == 401
    code, out = _req_tok(
        scoped_server, "/salesdb/r1?key=id&author=wally", "writer-tok", "POST", recs
    )
    assert (code, out) == (201, {"revision": 1})
    # reader reads salesdb but not another db; writer's scope is db-bound
    assert _req_tok(scoped_server, "/salesdb/r1", "reader-tok")[0] == 200
    assert _req_tok(scoped_server, "/otherdb/r1?key=id", "writer-tok", "POST", recs)[0] == 401
    # admin wildcard writes anywhere
    assert _req_tok(scoped_server, "/otherdb/r1?key=id", "admin-tok", "POST", recs)[0] == 201
    # author metadata surfaces in /history (GetAuthorName parity)
    code, hist = _req_tok(scoped_server, "/salesdb/r1/history", "reader-tok")
    assert code == 200
    assert hist[0]["author"] == "wally"
    # deletes need write scope
    assert _req_tok(scoped_server, "/salesdb/r1", "reader-tok", "DELETE")[0] == 401
    assert _req_tok(scoped_server, "/salesdb/r1", "writer-tok", "DELETE")[0] == 204
