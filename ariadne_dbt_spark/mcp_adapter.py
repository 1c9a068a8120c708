"""MCP transport adapter: expose ToolServer's tools over the Model
Context Protocol (reference: src/ariadne_dbt/server.py:26-520 builds a
FastMCP app with @mcp.tool() per tool; cli.py:131-161 runs it over stdio
or SSE).

Two implementations of the same tool surface:

* fastmcp, when importable (not in this image — import-guarded);
* a minimal self-contained stdio MCP server (`serve_mcp_stdio`) speaking
  JSON-RPC 2.0 per the public MCP spec (protocol 2024-11-05,
  newline-delimited messages): initialize → initialized →
  tools/list → tools/call, with tool input schemas derived from the
  ToolServer method signatures. This makes a REAL MCP handshake
  testable/servable without any third-party dependency;
* a minimal SSE server (`serve_mcp_sse` / `start_sse_server`) speaking
  the MCP HTTP+SSE transport over stdlib http.server — same
  handle_mcp_message core, different framing (endpoint event + POST
  /messages + message events).

The adapter is pure plumbing: every tool call routes through
`ToolServer.handle()`, so semantics, usage logging, and tests stay in
one place.
"""

from __future__ import annotations

import importlib
import inspect
import json
import sys
from typing import Any

from ariadne_dbt_spark.server import ToolServer

MCP_PROTOCOL_VERSION = "2024-11-05"
SERVER_VERSION = "1.0.0"

#: MCP descriptions, mirrored from the reference's tool docstrings
_TOOL_DOCS = {
    "search_models": "Hybrid BM25+centrality search over dbt models.",
    "get_model_details": "Full detail for one model: columns, tests, coverage, macros, sources.",
    "get_lineage": "Upstream/downstream lineage to a depth (<=10).",
    "get_impact_analysis": "Blast radius: affected models/exposures/tests + risk.",
    "discover_models": "Names-only discovery list for a task.",
    "get_context_capsule": "Token-budgeted context capsule for a task.",
    "get_project_patterns": "Project conventions: layers, materializations, coverage.",
    "refresh_index": "Re-index from dbt artifacts.",
    "usage_stats": "Usage telemetry stats over a trailing window.",
    "find_models_by_column": "Find models containing a column name (partial match).",
    "find_models_by_path": "Find models by file-path LIKE pattern.",
    "rate_capsule": "Rate the most recent context capsule 1-5.",
    "detect_antipatterns": "Scan the project for modeling anti-patterns.",
}


def _import_fastmcp():
    try:
        return importlib.import_module("fastmcp")
    except ImportError:
        return None


def mcp_available() -> bool:
    return _import_fastmcp() is not None


def build_mcp_app(server: ToolServer, *, name: str = "ariadne-dbt-spark") -> Any:
    """Return a FastMCP app with one registered tool per ToolServer.TOOLS
    entry. Raises ImportError when fastmcp is absent — gate on
    `mcp_available()` or catch and fall back to `server.serve()`.
    """
    fastmcp = _import_fastmcp()
    if fastmcp is None:
        raise ImportError("fastmcp is not installed; use ToolServer.serve() (JSON lines)")
    mcp = fastmcp.FastMCP(name)

    def _register(tool_name: str) -> None:
        method = getattr(server, tool_name)

        def tool_fn(**kwargs: Any) -> dict:
            # route through handle() so usage logging + capsule-id
            # tracking behave identically on both transports
            resp = server.handle({"tool": tool_name, "args": kwargs})
            return resp.get("result", resp)

        tool_fn.__name__ = tool_name
        tool_fn.__doc__ = _TOOL_DOCS.get(tool_name, method.__doc__ or tool_name)
        mcp.tool()(tool_fn)

    for tool_name in ToolServer.TOOLS:
        _register(tool_name)
    return mcp


def serve_mcp(server: ToolServer, *, transport: str = "stdio") -> None:
    """Run the MCP app, mirroring `ariadne serve` (reference:
    cli.py:131-161). fastmcp handles any transport when installed;
    without it, the built-in minimal implementations cover stdio
    (`serve_mcp_stdio`) and SSE (`serve_mcp_sse`, pure http.server)."""
    if mcp_available():
        build_mcp_app(server).run(transport=transport)
    elif transport == "stdio":
        serve_mcp_stdio(server)
    elif transport == "sse":
        serve_mcp_sse(server)
    else:
        raise ImportError(
            f"transport {transport!r} requires fastmcp; the built-in "
            "minimal MCP server supports stdio and sse"
        )


# -- minimal stdio MCP server (no third-party deps) --------------------------

def tool_input_schema(server: ToolServer, tool_name: str) -> dict:
    """JSON Schema for one tool's arguments, derived from the ToolServer
    method signature (Optional/union annotations reduce to their first
    non-None member; ``list[...]`` parameters become JSON arrays of
    their element type — a client following a scalar schema would send
    "fct_orders" where a list is expected and the tool would iterate it
    character-by-character; parameters without defaults are required)."""
    sig = inspect.signature(getattr(server, tool_name))
    props: dict[str, dict] = {}
    required: list[str] = []
    scalar = {"str": "string", "int": "integer", "float": "number", "bool": "boolean"}
    for pname, p in sig.parameters.items():
        if pname == "self":
            continue
        ann = p.annotation
        ann_s = ann if isinstance(ann, str) else getattr(ann, "__name__", str(ann))
        ann_s = ann_s.split("|")[0].strip()  # "list[str] | None" -> "list[str]"
        if ann_s.startswith("list"):
            inner = ann_s[5:-1].strip() if "[" in ann_s else "str"
            props[pname] = {
                "type": "array",
                "items": {"type": scalar.get(inner, "string")},
            }
        else:
            props[pname] = {"type": scalar.get(ann_s, "string")}
        if p.default is inspect.Parameter.empty:
            required.append(pname)
    schema: dict = {"type": "object", "properties": props}
    if required:
        schema["required"] = required
    return schema


def tool_descriptors(server: ToolServer) -> list[dict]:
    return [
        {
            "name": name,
            "description": _TOOL_DOCS.get(name, getattr(server, name).__doc__ or name),
            "inputSchema": tool_input_schema(server, name),
        }
        for name in ToolServer.TOOLS
    ]


def handle_mcp_message(server: ToolServer, msg: dict) -> dict | None:
    """One JSON-RPC 2.0 message → response dict (None for notifications,
    which get no response per spec)."""
    method = msg.get("method")
    msg_id = msg.get("id")
    if not method:
        # No method ⇒ either a malformed frame or a JSON-RPC RESPONSE
        # from the client (result/error + id). The spec forbids replying
        # to responses — answering with -32601 here risks an error loop
        # with strict clients — so drop it; -32601 is reserved for
        # genuine unknown-METHOD requests below.
        return None
    if msg_id is None:
        return None  # notification (e.g. notifications/initialized)

    def ok(result: dict) -> dict:
        return {"jsonrpc": "2.0", "id": msg_id, "result": result}

    def err(code: int, message: str) -> dict:
        return {"jsonrpc": "2.0", "id": msg_id, "error": {"code": code, "message": message}}

    if method == "initialize":
        return ok(
            {
                "protocolVersion": MCP_PROTOCOL_VERSION,
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "ariadne-dbt-spark", "version": SERVER_VERSION},
            }
        )
    if method == "ping":
        return ok({})
    if method == "tools/list":
        return ok({"tools": tool_descriptors(server)})
    if method == "tools/call":
        params = msg.get("params") or {}
        name = params.get("name")
        if name not in ToolServer.TOOLS:
            return err(-32602, f"unknown tool: {name}")
        resp = server.handle({"tool": name, "args": params.get("arguments") or {}})
        is_error = "error" in resp or resp.get("status") == "error"
        payload = resp.get("result", resp)
        return ok(
            {
                "content": [{"type": "text", "text": json.dumps(payload, default=str)}],
                "isError": bool(is_error),
            }
        )
    return err(-32601, f"method not found: {method}")


def serve_mcp_stdio(server: ToolServer, infile=None, outfile=None) -> None:
    """Blocking newline-delimited JSON-RPC loop over stdio (or any file
    pair — tests drive it with in-memory pipes). Parse errors respond
    with JSON-RPC -32700 as the spec requires; notifications produce no
    output; EOF ends the session."""
    infile = infile or sys.stdin
    outfile = outfile or sys.stdout
    for line in infile:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
        except json.JSONDecodeError as e:
            resp: dict | None = {
                "jsonrpc": "2.0",
                "id": None,
                "error": {"code": -32700, "message": f"parse error: {e}"},
            }
        else:
            resp = handle_mcp_message(server, msg)
        if resp is not None:
            outfile.write(json.dumps(resp, default=str) + "\n")
            outfile.flush()


# -- minimal SSE MCP server (no third-party deps) ----------------------------
#
# The reference serves SSE through fastmcp (reference: cli.py:131-161);
# fastmcp is import-guarded above and absent from this image, so this is
# a pure-stdlib implementation of the MCP HTTP+SSE transport
# (protocol 2024-11-05): GET /sse opens a text/event-stream whose first
# frame is an `endpoint` event naming the POST URL (with a per-session
# id); the client POSTs JSON-RPC messages there and receives each
# response as a `message` event on its stream. Same handle_mcp_message
# core as stdio — the transports differ only in framing.


def start_sse_server(server: ToolServer, host: str = "127.0.0.1", port: int = 0):
    """Start the SSE MCP server on a daemon thread; returns the
    ``ThreadingHTTPServer`` (``.server_address`` for the bound port,
    ``.shutdown()`` to stop — how tests drive it)."""
    import queue
    import threading
    import uuid
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    sessions: dict[str, queue.Queue] = {}

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 so POST connections keep-alive (every POST response
        # carries Content-Length); the SSE stream itself sends neither
        # Content-Length nor chunked framing — read-until-close, which
        # is exactly what an event stream is
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # silence per-request stderr
            pass

        def do_GET(self):
            if urlparse(self.path).path != "/sse":
                self.send_error(404)
                return
            session_id = uuid.uuid4().hex
            q: queue.Queue = queue.Queue()
            sessions[session_id] = q
            try:
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(
                    f"event: endpoint\ndata: /messages/?session_id={session_id}\n\n".encode()
                )
                self.wfile.flush()
                while True:
                    resp = q.get()
                    if resp is None:  # server shutdown sentinel
                        return
                    self.wfile.write(
                        b"event: message\ndata: "
                        + json.dumps(resp, default=str).encode()
                        + b"\n\n"
                    )
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away; drop the session
            finally:
                sessions.pop(session_id, None)

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path.rstrip("/") != "/messages":
                self.send_error(404)
                return
            sid = (parse_qs(parsed.query).get("session_id") or [None])[0]
            q = sessions.get(sid)
            if q is None:
                self.send_error(400, "unknown session_id")
                return
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            try:
                msg = json.loads(body)
            except json.JSONDecodeError as e:
                q.put(
                    {
                        "jsonrpc": "2.0",
                        "id": None,
                        "error": {"code": -32700, "message": f"parse error: {e}"},
                    }
                )
            else:
                resp = handle_mcp_message(server, msg)
                if resp is not None:
                    q.put(resp)
            self.send_response(202)
            self.send_header("Content-Length", "0")
            self.end_headers()

    httpd = ThreadingHTTPServer((host, port), Handler)
    httpd.daemon_threads = True
    # let shutdown() unblock live streams
    _orig_shutdown = httpd.shutdown

    def shutdown():
        for q in list(sessions.values()):
            q.put(None)
        _orig_shutdown()

    httpd.shutdown = shutdown  # type: ignore[method-assign]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def serve_mcp_sse(server: ToolServer, host: str = "127.0.0.1", port: int = 8000) -> None:
    """Blocking SSE serve loop (the `serve --transport sse` path)."""
    import time as _time

    httpd = start_sse_server(server, host, port)
    print(f"MCP SSE server on http://{host}:{httpd.server_address[1]}/sse", file=sys.stderr)
    try:
        while True:
            _time.sleep(3600)
    except KeyboardInterrupt:
        httpd.shutdown()
