"""Usage telemetry: append-only log + analytics (SURVEY §2.1 S8, §2.4 A10,
§2.5 O6).

Reference behavior (src/ariadne_dbt/usage.py): one row per tool call;
stats = count/avg over a trailing window grouped by tool, intent and day;
top-10 focus models; recent queries. Spark shape: `mode("append")`
parquet writes (date-partitioned so stat queries prune), time-bucketed
groupBys. The streaming twin lives in streaming/usage_stream.py.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class UsageLog:
    def __init__(self, spark: SparkSession, log_dir: str):
        self.spark = spark
        self.log_dir = log_dir

    def record(
        self,
        tool_name: str,
        *,
        task_text: str = "",
        intent: str = "",
        focus_model: str = "",
        pivot_count: int = 0,
        token_estimate: int = 0,
        duration_ms: int = 0,
        ts: datetime | None = None,
    ) -> None:
        ts = ts or datetime.now(timezone.utc).replace(tzinfo=None)
        row = [(
            int(time.time_ns()),
            ts,
            tool_name,
            task_text,
            intent,
            focus_model,
            int(pivot_count),
            int(token_estimate),
            int(duration_ms),
        )]
        df = self.spark.createDataFrame(
            row,
            "id long, ts timestamp, tool_name string, task_text string, intent string,"
            " focus_model string, pivot_count int, token_estimate int, duration_ms int",
        ).withColumn("dt", F.to_date("ts"))
        # date-partitioned append → stats queries prune to the window
        df.write.mode("append").partitionBy("dt").parquet(self.log_dir)

    def _read(self) -> DataFrame | None:
        if not os.path.isdir(self.log_dir) or not os.listdir(self.log_dir):
            return None
        return self.spark.read.parquet(self.log_dir)

    def stats(self, *, days: int = 30) -> dict:
        """A10: counts/averages by tool, intent, day over the window."""
        df = self._read()
        if df is None:
            return {"total_calls": 0}
        df = df.where(F.col("ts") >= F.date_sub(F.current_timestamp(), days))
        total = df.count()
        by_tool = {
            r.tool_name: r.n
            for r in df.groupBy("tool_name").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        by_intent = {
            r.intent: r.n
            for r in df.where(F.col("intent") != "")
            .groupBy("intent")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        daily = {
            str(r.d): r.n
            for r in df.groupBy(F.to_date("ts").alias("d"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("d")
            .collect()
        }
        avgs = df.agg(
            F.avg("token_estimate").alias("avg_tokens"),
            F.avg("duration_ms").alias("avg_ms"),
        ).first()
        top_focus = [
            (r.focus_model, r.n)
            for r in df.where(F.col("focus_model") != "")
            .groupBy("focus_model")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "focus_model")
            .limit(10)
            .collect()
        ]
        return {
            "total_calls": total,
            "by_tool": by_tool,
            "by_intent": by_intent,
            "daily": daily,
            "avg_token_estimate": float(avgs.avg_tokens) if avgs.avg_tokens else 0.0,
            "avg_duration_ms": float(avgs.avg_ms) if avgs.avg_ms else 0.0,
            "top_focus_models": top_focus,
        }

    def recent(self, *, limit: int = 20) -> list[dict]:
        """O6: last N calls, id-descending."""
        df = self._read()
        if df is None:
            return []
        return [
            r.asDict()
            for r in df.orderBy(F.desc("id")).limit(limit).collect()
        ]
