"""The three reference tools added in round 3 (find_models_by_column,
find_models_by_path, rate_capsule + session_events feedback sink —
reference: server.py:399-527, schema.sql:185-196) and the import-guarded
fastmcp adapter."""

from __future__ import annotations

import sys
import types

import pytest

from ariadne_dbt_spark.operators.usage import SessionEventLog
from ariadne_dbt_spark.server import ToolServer


@pytest.fixture(scope="module")
def server(index, tmp_path_factory):
    return ToolServer(index, usage_dir=str(tmp_path_factory.mktemp("usage")))


def _call(server, tool, **args):
    return server.handle({"id": 1, "tool": tool, "args": args})


def test_tool_surface(server):
    # reference's 10 tools + rate_capsule-adjacent additions + the
    # roadmap-v1.0 anti-pattern report
    assert len(ToolServer.TOOLS) == 13
    assert {
        "find_models_by_column", "find_models_by_path", "rate_capsule",
        "detect_antipatterns",
    } <= set(ToolServer.TOOLS)


def test_detect_antipatterns_tool(server):
    r = _call(server, "detect_antipatterns")["result"]
    assert set(r["counts"]) <= {
        "no_tests", "view_mart", "source_direct_to_mart", "layer_inversion",
        "undocumented",
    }
    # jaffle fixture: stg_payments has no tests
    flagged = {v["name"] for v in r["violations"] if v["rule"] == "no_tests"}
    assert "stg_payments" in flagged


def test_refresh_index_tool_is_incremental(server):
    import os
    man = os.path.join(os.path.dirname(__file__), "fixtures", "manifest.json")
    r = _call(server, "refresh_index", manifest_path=man)["result"]
    assert r["status"] == "ok"
    assert r["delta"] == {"changed": 0, "reused": 5, "removed": 0}


def test_find_models_by_column(server):
    r = _call(server, "find_models_by_column", column_name="order_id")["result"]
    assert r["count"] >= 2
    names = {row["name"] for row in r["results"]}
    assert "fct_orders" in names
    # partial match: "order" also hits order_date etc.
    r2 = _call(server, "find_models_by_column", column_name="order")["result"]
    assert r2["count"] >= r["count"]


def test_find_models_by_path(server):
    r = _call(server, "find_models_by_path", path_pattern="models/staging/%")["result"]
    names = sorted(row["name"] for row in r["results"])
    assert names == ["stg_customers", "stg_orders", "stg_payments"]
    # names ordered ascending (reference: search.py ORDER BY name)
    assert [row["name"] for row in r["results"]] == names


def test_rate_capsule_before_any_capsule(server):
    r = _call(server, "rate_capsule", rating=5)["result"]
    assert r["success"] is False
    assert "No capsule call" in r["error"]


def test_rate_capsule_roundtrip(server):
    _call(server, "get_context_capsule", task="debug failing test on fct_orders",
          token_budget=2000)
    r = _call(server, "rate_capsule", rating=9, notes="great")["result"]
    assert r["success"] is True
    assert r["rating"] == 5  # clamped 1..5 (reference: usage.py:51)
    stats = _call(server, "usage_stats", days=10)["result"]
    assert stats["rated_calls"] == 1
    assert stats["avg_rating"] == 5.0
    # re-rating overwrites (latest-per-log_id reconciliation)
    r2 = _call(server, "rate_capsule", rating=1)["result"]
    assert r2["log_id"] == r["log_id"]
    stats2 = _call(server, "usage_stats", days=10)["result"]
    assert stats2["rated_calls"] == 1
    assert stats2["avg_rating"] == 1.0
    # feedback event landed in the session_events sink
    events = server.events.for_session("server")
    # capsule calls record session-memory events alongside the two
    # rating feedback events
    validations = [e for e in events if e["event_type"] == "validation"]
    assert len(validations) == 2
    assert validations[0]["tool_name"] == "rate_capsule"


def test_ratings_subdir_hidden_from_usage_scan(server):
    """The _ratings parquet lives inside the usage dir; the underscore
    prefix keeps it out of spark.read.parquet(log_dir)."""
    df = server.usage._read()
    assert "rating" not in df.columns
    assert df.count() >= 2


def test_session_event_log_roundtrip(spark, tmp_path):
    log = SessionEventLog(spark, str(tmp_path / "events"))
    log.record("s1", "investigation", tool_name="search_models", payload={"q": "x"})
    log.record("s1", "decision", payload={"pick": "fct_orders"})
    log.record("s2", "change")
    ev = log.for_session("s1")
    assert [e["event_type"] for e in ev] == ["investigation", "decision"]
    assert ev[0]["session_id"] == "s1"
    assert log.for_session("nope") == []


# -- fastmcp adapter (import-guarded; stub module proves registration) --------


def _stub_fastmcp(monkeypatch):
    class FakeFastMCP:
        def __init__(self, name):
            self.name = name
            self.tools = {}

        def tool(self):
            def deco(fn):
                self.tools[fn.__name__] = fn
                return fn

            return deco

    mod = types.ModuleType("fastmcp")
    mod.FastMCP = FakeFastMCP
    monkeypatch.setitem(sys.modules, "fastmcp", mod)
    return mod


def test_mcp_adapter_unavailable_without_fastmcp():
    from ariadne_dbt_spark import mcp_adapter

    if "fastmcp" not in sys.modules:
        assert mcp_adapter.mcp_available() is False
        with pytest.raises(ImportError):
            mcp_adapter.build_mcp_app(None)


def test_mcp_adapter_registers_all_tools(server, monkeypatch):
    _stub_fastmcp(monkeypatch)
    from ariadne_dbt_spark import mcp_adapter

    assert mcp_adapter.mcp_available() is True
    app = mcp_adapter.build_mcp_app(server)
    assert set(app.tools) == set(ToolServer.TOOLS)
    # a registered tool delegates to the live server
    out = app.tools["find_models_by_path"](path_pattern="models/marts/%")
    assert {r["name"] for r in out["results"]} == {"dim_customers", "fct_orders"}
    # docstrings surfaced for MCP schema generation
    assert app.tools["search_models"].__doc__


def test_session_memory_fills_capsule(index, tmp_path):
    """Second capsule call in a server session sees the first call as a
    recent event in session_context (reference reserves session_context
    but always emits {}; roadmap v1.0 'session memory')."""
    srv = ToolServer(index, usage_dir=str(tmp_path / "usage"))
    first = _call(srv, "get_context_capsule", task="debug failing revenue test")["result"]
    assert first["session_context"]["recent_events"] == []
    second = _call(srv, "get_context_capsule", task="add a customer column")["result"]
    events = second["session_context"]["recent_events"]
    assert events and events[0]["event_type"] == "capsule"
    assert "revenue" in events[0]["payload"]
    # the filled session slot counts against the estimate and the
    # capsule still respects its overall budget envelope
    assert second["token_estimate"] <= 1.2 * second["token_budget"]


_HANDSHAKE_FRAMES = [
    {"jsonrpc": "2.0", "id": 1, "method": "initialize",
     "params": {"protocolVersion": "2024-11-05",
                "capabilities": {},
                "clientInfo": {"name": "pytest-client", "version": "0"}}},
    {"jsonrpc": "2.0", "method": "notifications/initialized"},
    {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
    {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
     "params": {"name": "search_models",
                "arguments": {"query": "orders revenue", "limit": 3}}},
    {"jsonrpc": "2.0", "id": 4, "method": "ping"},
    {"jsonrpc": "2.0", "id": 5, "method": "no/such/method"},
    # a RESPONSE frame from the client (id, no method): the spec says
    # servers must never answer these — no -32601, no reply at all
    {"jsonrpc": "2.0", "id": 99, "result": {}},
]


def _drive_stdio(server, frames):
    import io
    import json

    from ariadne_dbt_spark.mcp_adapter import serve_mcp_stdio

    infile = io.StringIO("".join(json.dumps(f) + "\n" for f in frames))
    outfile = io.StringIO()
    serve_mcp_stdio(server, infile=infile, outfile=outfile)
    return [json.loads(line) for line in outfile.getvalue().splitlines()]


def _drive_sse(server, frames):
    """Drive the stdlib SSE transport exactly as an HTTP client would:
    GET /sse → endpoint event with the session POST URL, POST each
    frame there (202), read each response as a `message` event."""
    import http.client
    import json

    from ariadne_dbt_spark.mcp_adapter import start_sse_server

    httpd = start_sse_server(server)
    host, port = httpd.server_address
    try:
        stream = http.client.HTTPConnection(host, port, timeout=30)
        stream.request("GET", "/sse", headers={"Accept": "text/event-stream"})
        resp = stream.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type").startswith("text/event-stream")

        def read_event():
            event, data = None, []
            while True:
                line = resp.fp.readline().decode().rstrip("\n")
                if line == "":
                    if event or data:
                        return event, "\n".join(data)
                    continue
                if line.startswith("event: "):
                    event = line[7:]
                elif line.startswith("data: "):
                    data.append(line[6:])

        ev, endpoint = read_event()
        assert ev == "endpoint" and endpoint.startswith("/messages")

        out = []
        post = http.client.HTTPConnection(host, port, timeout=30)
        for frame in frames:
            body = json.dumps(frame)
            post.request("POST", endpoint, body=body,
                         headers={"Content-Type": "application/json"})
            accepted = post.getresponse()
            assert accepted.status == 202 and accepted.read() == b""
            # responses (when any) arrive on the stream in POST order
            if frame.get("id") is not None and frame.get("method"):
                ev, data = read_event()
                assert ev == "message"
                out.append(json.loads(data))
        # prove the no-reply frames (notification, client response) left
        # NOTHING queued: the next stream event must answer this ping
        post.request(
            "POST", endpoint,
            body=json.dumps({"jsonrpc": "2.0", "id": 1000, "method": "ping"}),
            headers={"Content-Type": "application/json"},
        )
        assert post.getresponse().status == 202
        ev, data = read_event()
        assert ev == "message" and json.loads(data)["id"] == 1000
        post.close()
        stream.close()
        return out
    finally:
        httpd.shutdown()


@pytest.mark.parametrize("transport", ["stdio", "sse"])
def test_mcp_real_handshake(server, transport):
    """Drive the built-in minimal MCP server through a REAL protocol
    session — initialize, initialized notification, tools/list,
    tools/call, ping, an unknown method, and a client response frame —
    over both framings: newline-delimited stdio pipes and the stdlib
    HTTP+SSE transport (endpoint event + POST /messages + message
    events)."""
    import json

    from ariadne_dbt_spark.server import ToolServer

    driver = _drive_stdio if transport == "stdio" else _drive_sse
    resps = {r["id"]: r for r in driver(server, _HANDSHAKE_FRAMES)}

    # the notification and the client-response frame produced NO
    # response; everything else did
    assert set(resps) == {1, 2, 3, 4, 5}
    init = resps[1]["result"]
    assert init["protocolVersion"] == "2024-11-05"
    assert init["serverInfo"]["name"] == "ariadne-dbt-spark"
    assert "tools" in init["capabilities"]

    tools = {t["name"]: t for t in resps[2]["result"]["tools"]}
    assert set(tools) == set(ToolServer.TOOLS)
    sm = tools["search_models"]["inputSchema"]
    assert sm["type"] == "object" and sm["properties"]["query"]["type"] == "string"
    assert sm["properties"]["limit"]["type"] == "integer"
    assert "query" in sm.get("required", [])
    # list-typed params advertise as arrays (a scalar schema would make
    # conformant clients send strings the tool iterates char-by-char)
    cap = tools["get_context_capsule"]["inputSchema"]["properties"]
    assert cap["entry_models"] == {"type": "array", "items": {"type": "string"}}
    rules = tools["detect_antipatterns"]["inputSchema"]["properties"]["rules"]
    assert rules["type"] == "array"

    call = resps[3]["result"]
    assert call["isError"] is False
    payload = json.loads(call["content"][0]["text"])
    assert payload["results"] and "fct_orders" in {
        r["name"] for r in payload["results"]
    }

    assert resps[4]["result"] == {}
    assert resps[5]["error"]["code"] == -32601


def test_mcp_stdio_tool_error_and_parse_error(server):
    import io
    import json

    from ariadne_dbt_spark.mcp_adapter import serve_mcp_stdio

    infile = io.StringIO(
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "tools/call",
                    "params": {"name": "not_a_tool", "arguments": {}}}) + "\n"
        + "this is not json\n"
    )
    outfile = io.StringIO()
    serve_mcp_stdio(server, infile=infile, outfile=outfile)
    bad_tool, parse_err = map(json.loads, outfile.getvalue().splitlines())
    assert bad_tool["error"]["code"] == -32602
    assert parse_err["error"]["code"] == -32700 and parse_err["id"] is None
