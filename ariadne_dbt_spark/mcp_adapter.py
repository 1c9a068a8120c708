"""MCP transport adapter: expose ToolServer's tools over fastmcp when the
library is importable (reference: src/ariadne_dbt/server.py:26-520 builds
a FastMCP app with @mcp.tool() per tool; cli.py:131-161 runs it over
stdio or SSE). fastmcp is not in this image, so the adapter is
import-guarded — `mcp_available()` is False and callers fall back to the
JSON-lines transport in server.py, which serves the identical tool
surface. The adapter is pure plumbing: every tool closure delegates to
the corresponding ToolServer method, so semantics/tests stay in one
place.
"""

from __future__ import annotations

import importlib
from typing import Any

from ariadne_dbt_spark.server import ToolServer

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
    """Run the MCP app (stdio or sse), mirroring `ariadne serve`
    (reference: cli.py:131-161)."""
    build_mcp_app(server).run(transport=transport)
