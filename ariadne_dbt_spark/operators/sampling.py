"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus pipeline samples constantly — held-out splits, per-source
mixing ratios, quality-stratified subsets. ``rand()``-based sampling is
non-reproducible across retries and engines, so everything here keys the
decision on a hash of the ROW IDENTITY instead:

* ``hash_sample`` — keep a row iff ``xxhash64(key) pmod 1e6 < fraction·1e6``.
  Reproducible anywhere xxhash64 exists, stable under re-partitioning,
  speculative retries, and incremental re-runs (a row's fate never
  changes), and exactly expressible in SQL for the oracle.
* ``stratified_quota_sample`` — per-stratum exact quotas: rank rows
  inside each stratum by hash order (a deterministic shuffle) and keep
  ``row_number ≤ quota``. One window pass; at scale this is the standard
  top-k-per-group shape (partial ranks prune in the shuffle via the
  window group limit optimization).
* ``split`` — disjoint train/val/test by hash range over the same keyed
  hash, so membership is stable as the corpus grows (new rows land in a
  split; old rows never migrate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_M = 1_000_000


def _bucket(key: Column) -> Column:
    """Uniform [0, 1e6) bucket from the row key (non-negative pmod)."""
    return F.pmod(F.xxhash64(key), F.lit(_M))


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``key``."""
    return df.where(_bucket(F.col(key)) < int(fraction * _M))


def split(
    df: DataFrame, key: str, fractions: dict[str, float], out_col: str = "split"
) -> DataFrame:
    """Label each row with a stable split name by hash range. Fractions
    must sum to ≤ 1; any remainder is labeled NULL (excluded rows)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = _bucket(F.col(key))
    expr, lo = F.lit(None).cast("string"), 0
    bounds = []
    for name, frac in fractions.items():
        hi = lo + int(frac * _M)
        bounds.append((name, lo, hi))
        lo = hi
    for name, lo_b, hi_b in reversed(bounds):
        expr = F.when((b >= lo_b) & (b < hi_b), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def leakproof_split(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    fractions: dict[str, float],
    out_col: str = "split",
) -> DataFrame:
    """Near-dup-ATOMIC train/val/test split: every row is assigned by
    the hash of its cluster REPRESENTATIVE (``dedup_clusters``' min-
    member ``cluster_id``), so near-duplicate documents can never
    straddle a split boundary — the eval-contamination channel a
    per-doc hash split leaves open (a test doc whose near-clone sits in
    train is a leaked answer, which ``split_leakage_audit`` can only
    DETECT after the fact; this prevents it by construction). Docs in
    no cluster split by their own id, so the assignment stays total,
    stable, and growth-stable like :func:`split`.

    ``clusters`` is the ``(id, cluster_id)`` frame from
    ``dedup_clusters`` (or any grouping with the same shape — e.g. a
    URL-domain or source key for grouped splits). One left join against
    the churn-sized cluster frame (AQE broadcasts it when it fits);
    everything else is :func:`split`'s map-only bucket expression.
    """
    key = clusters.select(
        F.col(clusters.columns[0]).alias(id_col),
        F.col(clusters.columns[1]).alias("_cl"),
    )
    withk = df.join(key, id_col, "left").withColumn(
        "_skey", F.coalesce(F.col("_cl"), F.col(id_col))
    )
    return split(withk, "_skey", fractions, out_col).drop("_cl", "_skey")


def stratified_quota_sample(
    df: DataFrame, stratum_col: str, quotas: dict, *, key: str
) -> DataFrame:
    """Exactly ``quotas[stratum]`` rows per stratum (fewer if the stratum
    is smaller), chosen by deterministic hash order on ``key`` — a
    reproducible 'random' subset with hard per-group counts, the usual
    contract for balanced eval sets and per-source mixing."""
    w = Window.partitionBy(stratum_col).orderBy(_bucket(F.col(key)), key)
    quota_map = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= quota_map[F.col(stratum_col)])
        .drop("_rn")
    )


def pack_sequences(
    df,
    id_col: str,
    text_col: str,
    *,
    max_tokens: int = 256,
    n_buckets: int = 8,
):
    """Greedy sequence packing for LLM training: assign documents to
    training sequences of at most ``max_tokens`` whitespace tokens —
    ``(id, bucket, pack_id, n_tokens)``, where ``pack_id`` is unique
    across the corpus: ``(bucket << 44) | pack`` — 2^44 packs per bucket
    (≈4.5e12 · max_tokens tokens/bucket) before any collision, far past
    the 100 TB envelope, with room for 2^19 buckets in the high bits.

    Greedy first-fit packing is a sequential recurrence (each pack
    boundary depends on every earlier one), so it cannot be a window
    cumsum. The distributed shape: documents hash into ``n_buckets``
    deterministic buckets (``id % n_buckets`` — stable under
    repartitioning and growth), each bucket packs independently in
    doc-id order inside one Arrow-batched ``applyInPandas`` group.
    Packing quality is per-bucket (≤ one underfull tail pack per
    bucket); parallelism is n_buckets. Documents longer than
    ``max_tokens`` get a pack of their own (never split here — chunk
    first with ``chunk_documents`` if splitting is wanted).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    sized = df.select(
        F.col(id_col).alias("id"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")).alias(
            "n_tokens"
        ),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        pack_ids, cur_pack, cur_fill = [], 0, 0
        for n in pdf["n_tokens"]:
            if cur_fill > 0 and cur_fill + n > max_tokens:
                cur_pack += 1
                cur_fill = 0
            cur_fill += int(n)
            pack_ids.append(cur_pack)
        pdf["pack_id"] = [
            (int(pdf["bucket"].iloc[0]) << 44) | p for p in pack_ids
        ]
        return pdf[["id", "bucket", "pack_id", "n_tokens"]]

    return sized.groupBy("bucket").applyInPandas(
        pack, "id bigint, bucket int, pack_id bigint, n_tokens int"
    )


def temperature_mixing(
    df: DataFrame,
    source_col: str,
    *,
    tau: float = 0.7,
    budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled source-mixing weights for multi-source training
    corpora: ``(source, n_docs, weight, target_docs)`` where
    weight_i = n_i^tau / Σ_j n_j^tau.

    tau < 1 up-weights small sources relative to proportional sampling
    (tau=1 ≡ natural mix, tau=0 ≡ uniform) — the standard recipe for
    balancing dominant web crawl against small high-quality sources.
    One groupBy + a broadcast total join. Float discipline (the oracle
    hash-compares values): weights round to 6 decimals, which absorbs
    any last-ULP divergence between engines' ``pow``; tau=0.5 is exact
    everywhere (IEEE sqrt is correctly rounded, unlike general pow), so
    oracle-gated workloads pin that setting. ``target_docs`` is the
    rounded per-source quota for a ``budget``-doc epoch — feed it
    straight into ``stratified_quota_sample``'s quotas.
    """
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # tau ∈ {0, 0.5, 1} compile to lit/sqrt/identity: IEEE requires
    # sqrt to be correctly rounded where general pow has only a 1-ulp
    # contract, so the oracle-pinned tau=0.5 setting is exact BY
    # CONSTRUCTION, not by rounding luck (an ULP flip at an exact .5
    # boundary could otherwise flip round(p/t*budget) by one doc).
    n = F.col("n_docs").cast("double")
    if tau == 0.0:
        p = F.lit(1.0)
    elif tau == 0.5:
        p = F.sqrt(n)
    elif tau == 1.0:
        p = n
    else:
        p = F.pow(n, F.lit(float(tau)))
    powered = counts.withColumn("_p", p)
    total = powered.agg(F.sum("_p").alias("_tot"))
    return (
        powered.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            F.round(F.col("_p") / F.col("_tot"), 6).alias("weight"),
            F.round(F.col("_p") / F.col("_tot") * F.lit(float(budget)))
            .cast("bigint")
            .alias("target_docs"),
        )
        .orderBy("source")
    )


def per_source_cap(
    df: DataFrame,
    source_col: str,
    id_col: str,
    *,
    cap: int,
) -> DataFrame:
    """Per-domain/source document cap — the C4/RefinedWeb-style recipe
    for stopping a handful of giant domains from dominating a web
    corpus: keep at most ``cap`` docs per source, selected by a
    deterministic hash priority (md5 of source:id — uniform, so the
    kept subset is an unbiased sample of the source, yet reproducible
    across engines/runs; id tiebreak makes it total).

    One window over the source partitioning; the group-limit shuffle
    optimization keeps only ~cap rows per (source, partition) through
    the exchange, so output-bound cost even when one domain holds a
    billion rows. md5 (not xxhash64) so the SQL oracle can replay the
    exact selection.
    """
    pri = F.md5(
        F.concat_ws(":", F.col(source_col), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(source_col).orderBy(pri, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    *,
    seed: int = 0,
    shard_chars: int = 1,
) -> DataFrame:
    """Reproducible global training-order shuffle: ``(…, shard, pos)``.

    Every pretraining pipeline randomizes document order; ``rand()`` is
    unstable across retries/engines, so the order key is
    ``md5(seed ':' id)`` — reproducible anywhere md5 exists (and
    exactly mirrorable in the SQL oracle, unlike xxhash64 which DuckDB
    lacks). The corpus is split into ``16^shard_chars`` shards by the
    key's first hex chars (uniform by construction), and position is a
    PER-SHARD ``row_number`` ordered by (key, id) — never one global
    window (a single-partition sort is the classic 100 TB scale
    killer). Consumers read shards in name order, rows in pos order:
    the concatenation is a uniform deterministic permutation. At scale
    raise ``shard_chars`` so each shard's window fits an executor
    (3 hex chars = 4096 shards ≈ 25 GB/shard at 100 TB).
    """
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    out = df.withColumn("_key", key).withColumn(
        "shard", F.substring("_key", 1, shard_chars)
    )
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return out.withColumn("pos", F.row_number().over(w).cast("bigint")).drop("_key")


def quality_percentile_prune(
    df: DataFrame,
    id_col: str,
    score_col: str,
    group_col: str,
    *,
    keep_pct: int = 30,
) -> DataFrame:
    """FineWeb-style per-source quality pruning: keep the top
    ``keep_pct`` percent of rows WITHIN each group by score — a global
    score cutoff would let one high-scoring source crowd out the rest,
    so production corpus builds threshold per domain/source.

    Adds a ``keep`` boolean; the cutoff is the exact integer
    cross-multiplication ``rank * 100 <= n_group * keep_pct`` (no float
    percentile boundary to disagree on across engines). Ties on score
    break by id, so the ranked order — and therefore the kept set — is
    deterministic under any partitioning.

    Scale: one shuffle on ``group_col`` serving both window functions
    (rank and group count share the partition); group cardinality is
    domain-count-sized, and AQE splits a skewed giant source.
    """
    w = Window.partitionBy(group_col).orderBy(F.desc(score_col), F.col(id_col))
    wn = Window.partitionBy(group_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_ng", F.count(F.lit(1)).over(wn))
        .withColumn(
            "keep",
            (F.col("_rn") * F.lit(100)) <= (F.col("_ng") * F.lit(int(keep_pct))),
        )
        .drop("_rn", "_ng")
    )


def weighted_sample(
    df: DataFrame,
    *,
    weight_col: str,
    id_col: str,
    k: int,
    salt: str = "ws",
    key_decimals: int | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006): each row gets key ``ln(u) / w`` with u uniform in (0,1]; the
    k largest keys form an exact weighted sample — one pass, no
    sequential draw loop, the distributed-native formulation of
    reservoir sampling.

    u derives from md5(salt:id) (first 13 hex chars -> 52-bit uniform
    integer), the repo's reproducible-priority recipe (see
    per_source_cap): the selection replays bit-for-bit across engines
    and runs. Rows with weight <= 0 are excluded up front (E-S gives
    them zero inclusion probability; ANSI mode would raise on the
    division); heavier rows have keys closer to 0, so DESC ranks first.

    ``orderBy(key DESC, id).limit(k)`` compiles to TakeOrdered: per-
    partition top-k heaps, k rows per partition to the driver — no
    global sort, no full shuffle, output-bound at any input size.
    ``key_decimals`` optionally rounds the key BEFORE ranking so an
    external SQL oracle ranks on bit-identical values (ln differs by
    ~1 ulp across libms; the id tiebreak then fixes the order).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 13
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**52) + 1.0)
    key = F.log(u) / F.col(weight_col).cast("double")
    if key_decimals is not None:
        key = F.round(key, key_decimals)
    return (
        df.where(F.col(weight_col).cast("double") > 0)
        .withColumn("es_key", key)
        .orderBy(F.desc("es_key"), F.col(id_col))
        .limit(int(k))
    )


def curriculum_order(
    df: DataFrame,
    id_col: str,
    score_col: str,
    *,
    n_phases: int = 3,
    seed: int = 0,
    shard_chars: int = 1,
) -> DataFrame:
    """Curriculum training order: ``(…, phase, shard, pos)`` — documents
    staged easy→hard by a difficulty score, deterministically shuffled
    WITHIN each phase (curriculum learning's standard data layout: phases
    consumed in order, order randomized inside a phase).

    Scale shape: phases come from EXACT interpolated score percentiles
    (one distributed aggregate) compiled into a literal CASE — never a
    global ``ntile`` window, which would funnel the corpus through one
    partition. Within-phase order reuses :func:`deterministic_shuffle`'s
    recipe: md5(seed:id) key, per-(phase, first-hex-chars) sharded
    ``row_number`` windows, so no single window exceeds
    corpus/(phases·16^shard_chars). Ties at a phase boundary resolve by
    ``score <= boundary`` (deterministic; boundaries at integer scores
    are exact in IEEE, interpolated ones can't equal an integer score).
    """
    if n_phases < 2:
        raise ValueError("n_phases must be >= 2")
    # round 10: value-histogram rank selection (bit-identical to
    # F.percentile, see operators/drift.py:quantile_edges) — difficulty
    # scores are rounded/integer by contract, so the histogram is tiny
    # and no aggregation buffer ever holds corpus values
    from ariadne_dbt_spark.operators.drift import quantile_edges

    bounds = quantile_edges(df, score_col, bins=n_phases)
    phase = F.lit(int(n_phases))
    for i in range(n_phases - 1, 0, -1):
        phase = F.when(
            F.col(score_col) <= F.lit(bounds[i - 1]), F.lit(i)
        ).otherwise(phase)
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    out = (
        df.withColumn("phase", phase.cast("int"))
        .withColumn("_key", key)
        .withColumn("shard", F.substring("_key", 1, shard_chars))
    )
    w = Window.partitionBy("phase", "shard").orderBy("_key", id_col)
    return out.withColumn("pos", F.row_number().over(w).cast("bigint")).drop("_key")


def block_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    block_size: int = 128,
    eos: str = "<eos>",
    seed: int = 0,
    shard_chars: int = 1,
) -> DataFrame:
    """Concat-and-chunk block packing — the GPT-pretraining data layout:
    shuffle docs deterministically, concatenate their token streams with
    an ``eos`` separator, cut into fixed ``block_size`` blocks ACROSS
    document boundaries. Returns ``(shard, block_id, n_tokens,
    block_text)``; the last block of each shard may be partial
    (n_tokens < block_size) — drop or pad it downstream.

    This complements :func:`pack_sequences` (greedy whole-sample packing
    for SFT, where examples must not cross block edges); block packing
    is the zero-waste layout pretraining uses.

    Scale shape: document order comes from :func:`deterministic_shuffle`
    (md5 key, 16^k shards) and blocks NEVER cross shards, so every
    window here is per-shard: one cumulative-offset window over doc
    COUNTS (skinny), one posexplode, one groupBy (shard, block) whose
    groups are bounded by block_size. No global sort, no driver state;
    at 100 TB raise ``shard_chars`` exactly like the shuffle.
    """
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " "), r"\s+"),
        lambda t: F.length(t) >= 1,
    )
    ordered = deterministic_shuffle(
        df.select(F.col(id_col).alias("_id"), toks.alias("_toks")),
        "_id",
        seed=seed,
        shard_chars=shard_chars,
    ).withColumn("_toks", F.concat("_toks", F.array(F.lit(eos))))
    w = (
        Window.partitionBy("shard")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = ordered.withColumn(
        "_off", F.coalesce(F.sum(F.size("_toks")).over(w), F.lit(0)).cast("bigint")
    )
    tok_rows = offs.select(
        "shard", "_off", F.posexplode("_toks").alias("_i", "tok")
    ).select(
        "shard",
        (F.col("_off") + F.col("_i")).alias("_g"),
        "tok",
    )
    b = F.lit(int(block_size)).cast("bigint")
    blocks = (
        tok_rows.select(
            "shard",
            (F.col("_g") / b).cast("bigint").alias("block_id"),
            F.pmod(F.col("_g"), b).cast("int").alias("_p"),
            "tok",
        )
        .groupBy("shard", "block_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "tok"))),
                    lambda s: s.getField("tok"),
                ),
                " ",
            ).alias("block_text"),
        )
    )
    return blocks.select("shard", "block_id", "n_tokens", "block_text")
