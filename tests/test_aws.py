"""Flag-backend Lambda handler tests against an in-memory DynamoDB fake
(the reference backend has no automated tests at all — SURVEY §4)."""

import importlib.util
import json
import sys
import time
import types
from pathlib import Path

import pytest

LAMBDA_DIR = Path(__file__).parent.parent / "emosaic_tpu" / "aws" / "lambda"


class FakeTable:
    def __init__(self, name, key):
        self.name = name
        self.key = key
        self.items = {}
        self.meta = types.SimpleNamespace(client=FakeClient(self))

    def put_item(self, Item):
        self.items[Item[self.key]] = Item

    def get_item(self, Key):
        item = self.items.get(Key[self.key])
        return {"Item": item} if item else {}

    def delete_item(self, Key):
        self.items.pop(Key[self.key], None)

    def update_item(self, Key, UpdateExpression, ExpressionAttributeNames,
                    ExpressionAttributeValues, ReturnValues):
        # supports the quota counter's "ADD #n :one SET expiresAt =
        # if_not_exists(expiresAt, :exp)" expression
        assert "ADD #n :one" in UpdateExpression
        item = self.items.setdefault(Key[self.key], dict(Key))
        item["n"] = int(item.get("n", 0)) + ExpressionAttributeValues[":one"]
        item.setdefault("expiresAt", ExpressionAttributeValues[":exp"])
        return {"Attributes": {"n": item["n"]}}

    def scan(self, **kwargs):
        vals = list(self.items.values())
        limit = kwargs.get("Limit", len(vals))
        start = 0
        if "ExclusiveStartKey" in kwargs:
            keys = [v[self.key] for v in vals]
            start = keys.index(kwargs["ExclusiveStartKey"][self.key]) + 1
        page = vals[start : start + limit]
        resp = {"Items": page}
        if start + limit < len(vals):
            resp["LastEvaluatedKey"] = {self.key: page[-1][self.key]}
        return resp


class FakeClient:
    def __init__(self, table):
        self.table = table

    def batch_get_item(self, RequestItems):
        (name, spec), = RequestItems.items()
        found = [
            self.table.items[k["tileHash"]]
            for k in spec["Keys"]
            if k["tileHash"] in self.table.items
        ]
        return {"Responses": {name: found}}


@pytest.fixture
def backend(monkeypatch):
    flags = FakeTable("prod-tile-flags", "tileHash")
    rates = FakeTable("prod-rate-limits", "key")

    class FakeDDB:
        def Table(self, name):
            return flags if "tile-flags" in name else rates

    fake_boto3 = types.SimpleNamespace(resource=lambda *a, **k: FakeDDB())
    monkeypatch.setitem(sys.modules, "boto3", fake_boto3)

    mods = {}
    for name in ("toggle_flag", "get_flags", "admin_get_all_flags"):
        spec = importlib.util.spec_from_file_location(name, LAMBDA_DIR / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        # register before exec: get_flags lazily imports toggle_flag
        # (shared quota enforcement), like the shared deploy zip provides
        monkeypatch.setitem(sys.modules, name, mod)
        spec.loader.exec_module(mod)
        mod._TABLE = None  # reset lazy singletons per test
        if hasattr(mod, "_RATE_TABLE"):
            mod._RATE_TABLE = None
        mods[name] = mod
    return mods, flags, rates


def _event(method, hash_=None, body=None, qs=None, ip="1.2.3.4"):
    return {
        "httpMethod": method,
        "pathParameters": {"tileHash": hash_} if hash_ else {},
        "body": json.dumps(body) if body is not None else None,
        "queryStringParameters": qs,
        "requestContext": {"identity": {"sourceIp": ip}},
    }


def test_toggle_and_get(backend):
    mods, flags, _ = backend
    r = mods["toggle_flag"].handler(
        _event("POST", "abc123", {"tilePath": "t.jpg"}), None
    )
    assert r["statusCode"] == 200 and json.loads(r["body"])["flagged"]
    assert "abc123" in flags.items

    r = mods["get_flags"].handler(
        _event("POST", body={"tileHashes": ["abc123", "nope99"]}), None
    )
    body = json.loads(r["body"])
    assert body["flags"] == {"abc123": True, "nope99": False}
    assert body["count"] == 1

    r = mods["toggle_flag"].handler(_event("DELETE", "abc123"), None)
    assert not json.loads(r["body"])["flagged"]
    assert "abc123" not in flags.items


def test_toggle_validates_hash(backend):
    mods, *_ = backend
    assert mods["toggle_flag"].handler(_event("POST", ""), None)["statusCode"] == 400
    assert (
        mods["toggle_flag"].handler(_event("POST", "bad/../hash"), None)[
            "statusCode"
        ]
        == 400
    )


def test_rate_limit_10_per_minute(backend):
    mods, _, rates = backend
    codes = [
        mods["toggle_flag"].handler(_event("POST", f"hash{i:02d}"), None)[
            "statusCode"
        ]
        for i in range(12)
    ]
    assert codes[:10] == [200] * 10
    assert codes[10] == codes[11] == 429  # toggle_flag.py:35-40 envelope
    # different IP unaffected
    r = mods["toggle_flag"].handler(_event("POST", "zz11", ip="9.9.9.9"), None)
    assert r["statusCode"] == 200


def test_get_flags_limits(backend):
    mods, *_ = backend
    r = mods["get_flags"].handler(_event("POST", body={"tileHashes": []}), None)
    assert r["statusCode"] == 400
    r = mods["get_flags"].handler(
        _event("POST", body={"tileHashes": ["x"] * 101}), None
    )
    assert r["statusCode"] == 400  # get_flags.py:27-28 cap


def test_admin_pagination_and_summary(backend):
    mods, flags, _ = backend
    now = int(time.time())
    for i in range(5):
        flags.put_item(
            Item={
                "tileHash": f"h{i}",
                "flaggedBy": "1.1.1.1" if i < 3 else "2.2.2.2",
                "flaggedAt": now - i,
            }
        )
    r = mods["admin_get_all_flags"].handler(_event("GET", qs={"pageSize": "3"}), None)
    body = json.loads(r["body"])
    assert body["count"] == 3 and "nextStartKey" in body
    r2 = mods["admin_get_all_flags"].handler(
        _event("GET", qs={"pageSize": "3", "startKey": body["nextStartKey"]}), None
    )
    body2 = json.loads(r2["body"])
    assert body2["count"] == 2
    assert body["summary"]["uniqueFlaggers"] >= 1


def test_daily_quota_per_api_key(backend):
    """UsagePlan quota parity (api-gateway.yaml:166-168: 1000/day): the
    Lambdas enforce a per-day counter scoped by x-api-key / client IP."""
    mods, _, rates = backend
    tf = mods["toggle_flag"]
    tf.DAILY_QUOTA = 3  # shrink for the test
    tf.API_KEYS = frozenset({"alpha", "beta"})  # registered keys

    def ev(i, key=None, ip="1.2.3.4"):
        e = _event("POST", f"qq{i:02d}", ip=ip)
        if key:
            e["headers"] = {"X-Api-Key": key}
        return e

    codes = [tf.handler(ev(i, key="alpha"), None)["statusCode"] for i in range(5)]
    assert codes == [200, 200, 200, 429, 429]
    body = json.loads(tf.handler(ev(9, key="alpha"), None)["body"])
    assert "daily quota" in body["error"]
    # a different key has its own budget
    assert tf.handler(ev(6, key="beta"), None)["statusCode"] == 200
    # no key -> scoped by client IP
    assert tf.handler(ev(7, ip="9.9.9.9"), None)["statusCode"] == 200
    # an UNREGISTERED key must NOT mint a fresh scope (spoof bypass):
    # it falls back to the client IP, which the 'alpha' calls above
    # never consumed — but repeated random keys share that IP budget
    ip_codes = [
        tf.handler(
            {**ev(20 + i), "headers": {"X-Api-Key": f"spoof{i}"}}, None
        )["statusCode"]
        for i in range(5)
    ]
    assert ip_codes == [200, 200, 200, 429, 429]
    # counters carry a TTL for DynamoDB expiry
    qkeys = [k for k in rates.items if k.startswith("quota#")]
    assert qkeys and all("expiresAt" in rates.items[k] for k in qkeys)


def test_daily_quota_covers_read_path(backend):
    mods, flags, rates = backend
    gf = mods["get_flags"]
    gf.DAILY_QUOTA = 2
    ev = _event("POST", body={"tileHashes": ["abc123"]})
    assert gf.handler(ev, None)["statusCode"] == 200
    assert gf.handler(ev, None)["statusCode"] == 200
    assert gf.handler(ev, None)["statusCode"] == 429


@pytest.fixture
def manager(backend, monkeypatch):
    """tile_manager wired to the same in-memory DynamoDB fake."""
    import importlib.util

    mods, flags, rates = backend
    spec = importlib.util.spec_from_file_location(
        "tile_manager",
        Path(__file__).parent.parent / "emosaic_tpu" / "aws" / "tile_manager.py",
    )
    tm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tm)
    monkeypatch.setattr(tm, "_table", lambda env: flags)
    return tm, flags


def test_tile_manager_list_and_stats(manager, capsys):
    tm, flags = manager
    now = int(time.time())
    for i in range(4):
        flags.put_item(
            Item={
                "tileHash": f"h{i}",
                "flaggedBy": "1.1.1.1" if i < 3 else "2.2.2.2",
                "flaggedAt": now - i,
                "tilePath": f"/tiles/t{i}.jpg",
            }
        )
    assert tm.main(["list"]) == 0
    out = capsys.readouterr()
    assert out.out.count("\n") == 4 and "h2" in out.out
    assert "4 flags shown" in out.err

    assert tm.main(["stats"]) == 0
    out = capsys.readouterr().out
    assert "Total flags: 4" in out
    assert "Unique flaggers: 2" in out
    assert "1.1.1.1: 3" in out


def test_tile_manager_list_pagination(manager, capsys):
    """Reference parity (tile_manager.py:37-62, 186-215): --limit bounds
    ONE scan page, the emitted base64 token resumes it, and --format json
    carries flags/count/hasMore/nextKey (VERDICT r4 weak #6 — the old
    list path scanned the whole table)."""
    import json as _json

    tm, flags = manager
    for i in range(5):
        flags.put_item(
            Item={"tileHash": f"h{i}", "flaggedBy": "ip", "flaggedAt": i}
        )
    assert tm.main(["list", "--limit", "2", "--format", "json"]) == 0
    page1 = _json.loads(capsys.readouterr().out)
    assert page1["count"] == 2 and page1["hasMore"] is True
    assert [f["tileHash"] for f in page1["flags"]] == ["h0", "h1"]
    tok = page1["nextKey"]

    assert tm.main(
        ["list", "-l", "2", "-n", tok, "--format", "json"]
    ) == 0
    page2 = _json.loads(capsys.readouterr().out)
    assert [f["tileHash"] for f in page2["flags"]] == ["h2", "h3"]
    assert page2["hasMore"] is True

    # table format surfaces the continuation hint
    assert tm.main(["list", "--limit", "2"]) == 0
    out = capsys.readouterr()
    assert "2 flags shown" in out.err and "--next-key" in out.err

    # final page: no token
    assert tm.main(
        ["list", "-l", "2", "-n", page2["nextKey"], "-f", "json"]
    ) == 0
    page3 = _json.loads(capsys.readouterr().out)
    assert page3["hasMore"] is False and "nextKey" not in page3
    assert [f["tileHash"] for f in page3["flags"]] == ["h4"]

    # invalid token: warn + fall back to page 1 (reference behavior)
    assert tm.main(["list", "-l", "2", "-n", "!!notb64!!", "-f", "json"]) == 0
    out = capsys.readouterr()
    assert "Invalid pagination token" in out.err
    assert _json.loads(out.out)["flags"][0]["tileHash"] == "h0"


def test_tile_manager_delete(manager, capsys):
    tm, flags = manager
    flags.put_item(Item={"tileHash": "gone1", "flaggedBy": "x"})
    assert tm.main(["delete", "gone1"]) == 0
    assert "gone1" not in flags.items
    assert "Deleted flag gone1" in capsys.readouterr().out


def test_tile_manager_review_unflag_and_delete_file(
    manager, capsys, monkeypatch, tmp_path
):
    tm, flags = manager
    tile = tmp_path / "bad.jpg"
    tile.write_bytes(b"x")
    flags.put_item(
        Item={"tileHash": "aa1", "flaggedBy": "x", "tilePath": str(tile)}
    )
    flags.put_item(Item={"tileHash": "bb2", "flaggedBy": "x", "tilePath": ""})
    flags.put_item(Item={"tileHash": "cc3", "flaggedBy": "x", "tilePath": ""})
    answers = iter(["d", "u", "q"])  # delete file+flag, unflag, quit
    monkeypatch.setattr("builtins.input", lambda *_: next(answers))
    assert tm.main(["review", "--no-open"]) == 0
    assert not tile.exists()  # [d] removed the local file
    assert "aa1" not in flags.items and "bb2" not in flags.items
    assert "cc3" in flags.items  # [q] before reaching it


def test_quota_fails_open_on_ddb_error(backend):
    """ADVICE r3: a throttled/unavailable rate-limits table must not turn
    flag reads/writes into 500s — the quota check fails open (the
    reference's gateway UsagePlan never fails closed either)."""
    mods, flags, rates = backend

    def boom(*a, **k):
        raise RuntimeError("ProvisionedThroughputExceededException")

    rates.update_item = boom
    r = mods["toggle_flag"].handler(_event("POST", "abc123"), None)
    assert r["statusCode"] == 200
    r = mods["get_flags"].handler(
        _event("POST", body={"tileHashes": ["abc123"]}), None
    )
    assert r["statusCode"] == 200
    # the per-minute limiter shares the same table and must fail open too
    # (its get_item/put_item are just as throttled during such an outage)
    rates.get_item = boom
    rates.put_item = boom
    r = mods["toggle_flag"].handler(_event("POST", "def456"), None)
    assert r["statusCode"] == 200
    assert "def456" in flags.items


def test_invalid_requests_do_not_burn_quota(backend):
    """ADVICE r3: validation runs before quota bookkeeping — malformed
    requests must not consume daily-quota units (UsagePlan only counts
    gateway-accepted requests)."""
    mods, _, rates = backend
    # 405 (bad method) and 400 (bad hash) against toggle_flag
    assert mods["toggle_flag"].handler(_event("PUT", "abc123"), None)[
        "statusCode"
    ] == 405
    assert mods["toggle_flag"].handler(_event("POST", "bad/../h"), None)[
        "statusCode"
    ] == 400
    # 400 against get_flags (empty list)
    assert mods["get_flags"].handler(
        _event("POST", body={"tileHashes": []}), None
    )["statusCode"] == 400
    # 400 against get_flags when EVERY hash fails sanitization — a
    # garbage-only list must not burn a quota unit either
    assert mods["get_flags"].handler(
        _event("POST", body={"tileHashes": ["../../etc", "bad/hash"]}), None
    )["statusCode"] == 400
    assert not any(k.startswith("quota#") for k in rates.items), (
        "rejected requests consumed quota units"
    )


def test_http_api_v2_event_shape_and_preflight(backend):
    """HTTP API v2 events carry the method under requestContext.http
    (no top-level httpMethod — deviation 10: the backend is API GW v2);
    OPTIONS preflight returns 200 with CORS headers and touches nothing."""
    mods, flags, rates = backend
    ev = {
        "pathParameters": {"tileHash": "abc9"},
        "body": None,
        "requestContext": {
            "http": {"method": "OPTIONS", "sourceIp": "1.2.3.4"}
        },
    }
    for name in ("toggle_flag", "get_flags"):
        r = mods[name].handler(ev, None)
        assert r["statusCode"] == 200
    assert not flags.items  # preflight never writes

    # a real v2 POST flags the tile
    ev["requestContext"]["http"]["method"] = "POST"
    r = mods["toggle_flag"].handler(ev, None)
    assert r["statusCode"] == 200 and json.loads(r["body"])["flagged"]


def test_malformed_json_bodies(backend):
    """toggle_flag treats an unparseable body as empty metadata (the flag
    itself still lands); get_flags rejects it as a 400."""
    mods, flags, _ = backend
    ev = _event("POST", "dead00")
    ev["body"] = "{not json"
    r = mods["toggle_flag"].handler(ev, None)
    assert r["statusCode"] == 200 and json.loads(r["body"])["flagged"]

    ev2 = _event("POST")
    ev2["body"] = "{not json"
    r = mods["get_flags"].handler(ev2, None)
    assert r["statusCode"] == 400
    assert "invalid JSON" in json.loads(r["body"])["error"]


def test_admin_bad_page_size_falls_back(backend):
    mods, flags, _ = backend
    mods["toggle_flag"].handler(_event("POST", "aa11"), None)
    r = mods["admin_get_all_flags"].handler(
        _event("GET", qs={"pageSize": "not-a-number"}), None
    )
    assert r["statusCode"] == 200
    body = json.loads(r["body"])
    assert body["count"] == 1 and body["summary"]["uniqueFlaggers"] == 1
