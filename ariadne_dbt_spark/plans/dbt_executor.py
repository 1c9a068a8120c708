"""dbt-style model executor on Spark SQL (SURVEY §2.1 S10, §7 step 3).

The reference stores compiled model SQL but never executes it
(warehouse-agnostic by design — reference: README.md:40, indexer.py:223);
a "same capabilities" Spark engine must be able to RUN the project. This
executor does what dbt-spark does, minus the packaging:

1. resolve ``{{ ref('m') }}`` / ``{{ source('s','t') }}`` / project
   macros with Jinja (exactly dbt's approach: render first, then hand
   pure SQL to the engine) — ``{{ config(...) }}`` renders to nothing
2. topologically order models by their model-to-model depends_on
3. execute each with ``spark.sql`` against temp views; materialization
   honors the model config: ``view`` → temp view (lazy, fused into
   downstream plans by Catalyst; ``ephemeral`` rides the same path —
   Catalyst inlines a temp view into its consumer exactly the way dbt
   inlines an ephemeral CTE, so the distinction is materialized away by
   the optimizer), ``seed`` → CSV load with ``column_types`` casts
   (round 8), ``snapshot`` → SCD2 merge (round 8, see
   ``_run_snapshot``), ``table`` → parquet write + re-read
   (cuts lineage, downstream stages scan columnar data — at 100 TB this
   is the shuffle-boundary you want between marts), ``incremental`` →
   dbt's incremental contract: ``is_incremental()`` is False on the
   first build (full write), True on subsequent runs where ``{{ this }}``
   resolves to the existing target so the model SQL can filter to new
   rows; ``incremental_strategy`` picks the fold (round 8): ``append``,
   ``delete+insert`` (existing rows with an incoming key are replaced
   whole), or ``merge`` (matched rows take ``merge_update_columns`` from
   the incoming row and KEEP every other column's old value — the
   partial-update semantics delete+insert cannot express; without a
   ``unique_key`` merge degrades to dbt's insert-only form). Defaults
   preserve dbt-spark's file-format pairing: unique_key →
   delete+insert, else append. ``full_refresh=True`` rebuilds from
   scratch, exactly dbt's flag.

At 100 TB the incremental merge is the one operator whose physical form
depends on the table format: on plain parquet it is anti-join + union +
a rename-aside directory swap (what this executor does — the tmp write
materializes before any rename, and the live dir is moved aside rather
than deleted first, so the data is recoverable at every step and the
no-readable-target window shrinks to the instant between the two
renames; crash-safe but not atomic — true atomicity and concurrent
readers need a transactional table format); on Delta/Iceberg it
becomes a native MERGE INTO, and date-partitioned models should prefer
dynamic partition-overwrite (``insert_overwrite``) so only touched
partitions rewrite.

Scale posture: the executor itself never touches rows — every model is a
declarative plan; Catalyst fuses view-materialized staging models into
their consumers, so the classic stg→fct chain compiles into ONE scan per
source with pushed-down projections.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ariadne_dbt_spark.ingest import manifest as mf

try:
    import jinja2

    _HAS_JINJA = True
except ImportError:  # pragma: no cover - jinja2 ships with pyspark images
    _HAS_JINJA = False


class _MacroShim:
    """Makes project macros callable from model templates: renders the
    macro body with positional args bound to its parameter names."""

    def __init__(self, env: "jinja2.Environment", name: str, params: list[str], body: str):
        self.env = env
        self.name = name
        self.params = params
        self.body = body

    def __call__(self, *args, **kwargs):
        ctx = dict(zip(self.params, args))
        ctx.update(kwargs)
        return self.env.from_string(self.body).render(**ctx)


_MACRO_DEF = re.compile(
    r"{%-?\s*macro\s+(\w+)\s*\(([^)]*)\)\s*-?%}(.*?){%-?\s*endmacro\s*-?%}", re.S
)


def parse_macro_sql(macro_sql: str) -> tuple[str, list[str], str] | None:
    """``{% macro name(a, b=1) %}body{% endmacro %}`` → (name, params, body)."""
    m = _MACRO_DEF.search(macro_sql or "")
    if not m:
        return None
    name, params_s, body = m.group(1), m.group(2), m.group(3)
    params = [p.split("=")[0].strip() for p in params_s.split(",") if p.strip()]
    return name, params, body.strip()


@dataclass
class DbtSparkExecutor:
    spark: SparkSession
    manifest: dict
    #: (source_name, table_name) → parquet path or DataFrame
    source_map: dict[tuple[str, str], object]
    #: where `materialized='table'` models land (parquet)
    target_dir: str | None = None
    #: project root that seed CSV paths resolve against (dbt's
    #: `seeds/<name>.csv`); None → seeds raise at run time
    seed_dir: str | None = None
    _models: dict[str, dict] = field(default_factory=dict, init=False)
    _macros: dict[str, _MacroShim] = field(default_factory=dict, init=False)
    _relations: dict[str, DataFrame] = field(default_factory=dict, init=False)

    def __post_init__(self):
        if not _HAS_JINJA:
            raise RuntimeError("jinja2 is required for the dbt executor")
        self._env = jinja2.Environment(undefined=jinja2.StrictUndefined)
        for row in mf.parse_models(self.manifest):
            self._models[row["name"]] = row
        # dbt SNAPSHOT and SEED nodes (round 8): same executable shape
        # as models — snapshots route through the SCD2 merge, seeds load
        # their CSV (resolved against ``seed_dir``); ref() on either
        # resolves like any model view
        for uid, n in (self.manifest.get("nodes") or {}).items():
            rt = n.get("resource_type")
            if rt not in ("snapshot", "seed"):
                continue
            config = n.get("config") or {}
            self._models[n.get("name")] = {
                "unique_id": uid,
                "name": n.get("name") or "",
                "raw_code": n.get("raw_code") or n.get("raw_sql") or "",
                "file_path": n.get("original_file_path") or n.get("path") or "",
                "materialization": rt,
                "config": {str(k): str(v) for k, v in config.items()},
                "depends_on_nodes": [
                    str(x) for x in (n.get("depends_on") or {}).get("nodes") or []
                ],
            }
        for row in mf.parse_macros(self.manifest):
            parsed = parse_macro_sql(row["macro_sql"])
            if parsed:
                name, params, body = parsed
                self._macros[name] = _MacroShim(self._env, name, params, body)

    # -- rendering -----------------------------------------------------------
    def _view_name(self, model_name: str) -> str:
        return f"dbt__{model_name}"

    def render(self, model_name: str, *, is_incremental: bool = False) -> str:
        """Jinja-render one model's raw_code to executable Spark SQL.

        ``is_incremental`` drives dbt's ``is_incremental()`` predicate;
        ``{{ this }}`` resolves to a view over the model's existing
        target (only registered when an incremental target exists)."""
        row = self._models[model_name]

        def ref(name, package=None):
            return self._view_name(str(name))

        def source(src, tbl):
            key = (str(src), str(tbl))
            if key not in self.source_map:
                raise KeyError(f"unmapped source {key}")
            return f"dbt_src__{src}__{tbl}"

        def config(*args, **kwargs):
            return ""

        ctx = {
            "ref": ref,
            "source": source,
            "config": config,
            "is_incremental": lambda: is_incremental,
            "this": self._this_name(model_name),
            **self._macros,
        }
        return self._env.from_string(row["raw_code"]).render(**ctx)

    # -- execution -----------------------------------------------------------
    def _register_sources(self) -> None:
        for (src, tbl), target in self.source_map.items():
            df = (
                target
                if isinstance(target, DataFrame)
                else self.spark.read.parquet(str(target))
            )
            df.createOrReplaceTempView(f"dbt_src__{src}__{tbl}")

    def topo_order(self, subset: list[str] | None = None) -> list[str]:
        """Kahn's algorithm over model→model depends_on edges."""
        names = set(subset or self._models)
        deps: dict[str, set[str]] = {}
        for name in names:
            row = self._models[name]
            deps[name] = {
                d.split(".")[-1]
                for d in row["depends_on_nodes"]
                if d.startswith(("model.", "snapshot.", "seed."))
                and d.split(".")[-1] in names
            }
        order, ready = [], sorted(n for n, d in deps.items() if not d)
        remaining = {n: set(d) for n, d in deps.items()}
        while ready:
            n = ready.pop(0)
            order.append(n)
            for m in sorted(remaining):
                if n in remaining[m]:
                    remaining[m].discard(n)
                    if not remaining[m] and m not in order and m not in ready:
                        ready.append(m)
        if len(order) != len(names):
            cyclic = sorted(names - set(order))
            raise ValueError(f"dependency cycle among models: {cyclic}")
        return order

    def _this_name(self, model_name: str) -> str:
        return f"dbt_this__{model_name}"

    def _config_list(self, model_name: str, key: str) -> list[str]:
        """Identifier list from a model config value; manifest configs
        arrive as stringified maps, so '["a", "b"]' / "['a','b']" / 'a'
        and real lists all parse."""
        raw = (self._models[model_name].get("config") or {}).get(key) or ""
        return [k for k in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", str(raw))]

    def _unique_key(self, model_name: str) -> list[str]:
        return self._config_list(model_name, "unique_key")

    def _strategy(self, model_name: str) -> str:
        """dbt's ``incremental_strategy`` config: explicit value wins;
        the default preserves this executor's historical behavior
        (unique_key → delete+insert, else append), which is also
        dbt-spark's file-format default pairing."""
        raw = str(
            (self._models[model_name].get("config") or {}).get(
                "incremental_strategy"
            )
            or ""
        ).strip().lower()
        if raw:
            if raw not in ("append", "delete+insert", "merge"):
                raise ValueError(
                    f"unsupported incremental_strategy {raw!r} for "
                    f"{model_name} (supported: append, delete+insert, merge)"
                )
            return raw
        return "delete+insert" if self._unique_key(model_name) else "append"

    def _merge_frames(
        self, old: DataFrame, new: DataFrame, key: list[str], upd: list[str]
    ) -> DataFrame:
        """dbt's ``merge`` semantics on the parquet path: matched rows
        (incoming key exists) take the ``merge_update_columns`` from the
        incoming row and KEEP every other column's old value (what
        delete+insert cannot express); unmatched incoming rows insert
        whole. A legitimately-NULL incoming value updates to NULL — the
        match test is a marker column, never a value coalesce."""
        from pyspark.sql import functions as F

        o = old.alias("_o")
        n = new.withColumn("_nm", F.lit(True)).alias("_n")
        joined = o.join(n, key, "left")
        cols = []
        for c in old.columns:
            if c in key:
                cols.append(F.col(c))
            elif c in upd:
                cols.append(
                    F.when(F.col("_nm"), F.col(f"_n.{c}"))
                    .otherwise(F.col(f"_o.{c}"))
                    .alias(c)
                )
            else:
                cols.append(F.col(f"_o.{c}").alias(c))
        merged = joined.select(*cols)
        inserts = new.join(old.select(*key).distinct(), key, "left_anti")
        return merged.unionByName(inserts.select(*old.columns))

    def _run_incremental(self, name: str, full_refresh: bool) -> DataFrame:
        out = os.path.join(self.target_dir, name)
        exists = not full_refresh and os.path.exists(
            os.path.join(out, "_SUCCESS")
        )
        if exists:
            old = self.spark.read.parquet(out)
            old.createOrReplaceTempView(self._this_name(name))
        new = self.spark.sql(self.render(name, is_incremental=exists))
        if not exists:
            new.write.mode("overwrite").parquet(out)
        else:
            key = self._unique_key(name)
            strategy = self._strategy(name)
            if strategy == "merge" and key:
                upd = self._config_list(name, "merge_update_columns") or [
                    c for c in old.columns if c not in key
                ]
                final = self._merge_frames(old, new, key, upd)
            elif strategy == "delete+insert" and key:
                # delete+insert: incoming keys replace existing rows
                kept = old.join(new.select(*key).distinct(), key, "left_anti")
                final = kept.select(*old.columns).unionByName(new.select(*old.columns))
            else:
                # append — also dbt's insert-only merge (no unique_key)
                final = old.select(*old.columns).unionByName(new.select(*old.columns))
            self._swap_commit(out, final)
        return self.spark.read.parquet(out)

    def _swap_commit(self, out: str, final: DataFrame) -> None:
        # the tmp write EXECUTES the read of `out`, so the swap below
        # never drops data that hasn't been rewritten yet. Swap order:
        # move the live dir ASIDE first, then promote tmp — a crash
        # between the two steps leaves the data recoverable in __old
        # and never a window with no readable target path about to be
        # created from nothing (rmtree-then-replace had one).
        tmp = out + "__tmp"
        final.write.mode("overwrite").parquet(tmp)
        import shutil

        old_dir = out + "__old"
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir)
        os.replace(out, old_dir)
        os.replace(tmp, out)
        shutil.rmtree(old_dir)

    def _run_seed(self, name: str) -> DataFrame:
        """dbt SEED: load the node's CSV (header row; ``column_types``
        config wins over inference, exactly dbt's contract) and register
        it like any relation — `ref('my_seed')` then resolves normally."""
        if not self.seed_dir:
            raise ValueError(
                f"seed {name} requires seed_dir= on the executor "
                "(the project root its CSV path resolves against)"
            )
        row = self._models[name]
        path = os.path.join(self.seed_dir, row.get("file_path") or f"seeds/{name}.csv")
        if not os.path.exists(path):
            raise FileNotFoundError(f"seed csv not found: {path}")
        df = self.spark.read.option("header", "true").option(
            "inferSchema", "true"
        ).csv(path)
        col_types = (row.get("config") or {}).get("column_types") or ""
        # stringified map '{"col": "bigint", ...}' → explicit casts
        for col, typ in re.findall(r"['\"]?(\w+)['\"]?\s*:\s*['\"](\w+)['\"]", str(col_types)):
            if col in df.columns:
                df = df.withColumn(col, df[col].cast(typ))
        return df

    def _run_snapshot(self, name: str, full_refresh: bool) -> DataFrame:
        """dbt SNAPSHOT materialization (round 8): SCD2 over the
        snapshot's select, timestamp strategy (``check`` needs a
        wall-clock snapshot time — pass ``snapshot_at`` on the executor
        to enable it deterministically).

        Columns follow dbt: ``dbt_updated_at`` / ``dbt_valid_from`` /
        ``dbt_valid_to`` (NULL = current) / ``dbt_scd_id``
        (md5(key|updated_at)). Timestamp semantics per run: a source row
        whose ``updated_at`` advanced past the key's open row closes it
        (``dbt_valid_to`` = new updated_at) and inserts the new open
        version; unchanged keys pass through; brand-new keys insert
        open. Hard deletes are left open (dbt's default;
        invalidate_hard_deletes is not modeled). Commit is the same
        crash-safe dir swap as incremental."""
        from pyspark.sql import functions as F

        cfg = self._models[name].get("config") or {}
        strategy = str(cfg.get("strategy") or "timestamp").strip().lower()
        if strategy != "timestamp":
            raise ValueError(
                f"snapshot strategy {strategy!r} not supported for {name} "
                "(timestamp only; check-strategy needs a snapshot clock)"
            )
        key = self._unique_key(name)
        updated_at = str(cfg.get("updated_at") or "").strip()
        if not key or not updated_at:
            raise ValueError(
                f"snapshot {name} needs unique_key and updated_at configs"
            )
        out = os.path.join(self.target_dir, name)
        exists = not full_refresh and os.path.exists(os.path.join(out, "_SUCCESS"))
        new = self.spark.sql(self.render(name))

        def scd_cols(df: DataFrame) -> DataFrame:
            u = F.col(updated_at)
            return (
                df.withColumn("dbt_updated_at", u)
                .withColumn("dbt_valid_from", u)
                .withColumn(
                    "dbt_valid_to", F.lit(None).cast(df.schema[updated_at].dataType)
                )
                .withColumn(
                    "dbt_scd_id",
                    F.md5(F.concat_ws("|", *key, u.cast("string"))),
                )
            )

        if not exists:
            scd_cols(new).write.mode("overwrite").parquet(out)
            return self.spark.read.parquet(out)

        old = self.spark.read.parquet(out)
        open_old = old.where(F.col("dbt_valid_to").isNull())
        closed_old = old.where(F.col("dbt_valid_to").isNotNull())
        o = open_old.alias("_o")
        n = new.withColumn("_nm", F.lit(True)).alias("_n")
        j = o.join(n, key, "left")
        advanced = F.col("_nm") & (
            F.col(f"_n.{updated_at}") > F.col("_o.dbt_updated_at")
        )
        # keys whose source row advanced: close the open version at the
        # new updated_at ...
        closed_now = j.where(advanced).select(
            *[F.col(c) if c in key else F.col(f"_o.{c}").alias(c) for c in old.columns if c != "dbt_valid_to"],
            F.col(f"_n.{updated_at}").cast(old.schema["dbt_valid_to"].dataType).alias("dbt_valid_to"),
        ).select(*old.columns)
        # ... and keys that didn't (or vanished from the source): the
        # open row passes through untouched
        still_open = j.where(~F.coalesce(advanced, F.lit(False))).select(
            *[F.col(c) if c in key else F.col(f"_o.{c}").alias(c) for c in old.columns]
        )
        source_cols = new.columns
        changed_new = (
            j.where(advanced)
            .select(
                *[
                    F.col(c) if c in key else F.col(f"_n.{c}").alias(c)
                    for c in source_cols
                ]
            )
        )
        fresh_keys = new.join(open_old.select(*key).distinct(), key, "left_anti")
        inserts = scd_cols(changed_new.unionByName(fresh_keys)).select(*old.columns)
        final = closed_old.unionByName(closed_now).unionByName(still_open).unionByName(inserts)
        self._swap_commit(out, final)
        return self.spark.read.parquet(out)

    def run(
        self, subset: list[str] | None = None, *, full_refresh: bool = False
    ) -> dict[str, DataFrame]:
        """Execute the project (or a subset closure): returns
        name → result DataFrame, registered as temp views."""
        self._register_sources()
        for name in self.topo_order(subset):
            mat = self._models[name]["materialization"]
            if mat == "incremental" and self.target_dir:
                df = self._run_incremental(name, full_refresh)
            elif mat == "snapshot" and self.target_dir:
                df = self._run_snapshot(name, full_refresh)
            elif mat == "seed":
                df = self._run_seed(name)
            else:
                df = self.spark.sql(self.render(name))
                if mat == "table" and self.target_dir:
                    out = os.path.join(self.target_dir, name)
                    df.write.mode("overwrite").parquet(out)
                    df = self.spark.read.parquet(out)
            df.createOrReplaceTempView(self._view_name(name))
            self._relations[name] = df
        return dict(self._relations)

    def relation(self, model_name: str) -> DataFrame:
        if model_name not in self._relations:
            self.run()
        return self._relations[model_name]
