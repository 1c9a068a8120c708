"""Text-analysis workloads (north-star scale extensions) over `documents`:
language-ID, quality scoring, token counting, fingerprinting — each
backed by a SQL oracle that re-derives the identical heuristic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ariadne_dbt_spark.functions.text import STOPWORDS
from ariadne_dbt_spark.operators.text import (
    LANG_MARKERS,
    bpe_ish_token_count,
    detect_language,
    fingerprint_md5,
    quality_score_millionths,
    whitespace_token_count,
)
from ariadne_dbt_spark.session import table_path
from ariadne_dbt_spark.workloads import query

_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

# zipf_law_fit ranks at most this many top-tf terms: bounds the global
# row_number window regardless of vocabulary size (web-scale vocabs run
# to hundreds of millions of terms; the OLS fit only needs the
# head+body of the ranking — the tail is noise below ln-resolution)
_ZIPF_FIT_TOP_K = 100_000


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "documents"))


@query(
    "doc_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS INT) AS bpe_ish_tokens,
           length(text) AS text_chars
    FROM documents ORDER BY doc_id
    """,
    survey="token-counting",
    doc="Whitespace + BPE-ish token counts per document.",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        whitespace_token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_ish_tokens"),
        F.length("text").cast("bigint").alias("text_chars"),
    ).orderBy("doc_id")


def _lang_oracle() -> str:
    """SQL mirror of operators.text.detect_language: per-language marker
    hit counts → argmax with (hits, lang) lexicographic tie-break."""
    hits = ",\n".join(
        "list_count(list_filter(toks, t -> t IN ({m}))) AS hits_{lang}".format(
            lang=lang, m=", ".join(f"'{w}'" for w in markers)
        )
        for lang, markers in LANG_MARKERS.items()
    )
    structs = ", ".join("{{'hits': hits_{lang}, 'lang': '{lang}'}}".format(lang=lang) for lang in LANG_MARKERS)
    return f"""
    WITH toked AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
                   t -> length(t) >= 1) AS toks
        FROM documents
    ),
    hits AS (SELECT doc_id, lang, {hits} FROM toked),
    best AS (
        SELECT doc_id, lang,
               list_aggregate([{structs}], 'max') AS b
        FROM hits
    )
    SELECT lang, CASE WHEN b.hits > 0 THEN b.lang ELSE 'unknown' END AS detected,
           COUNT(*) AS n
    FROM best GROUP BY 1, 2 ORDER BY lang, detected
    """


def _langid_model_oracle() -> str:
    """The planted corpus has pairwise-disjoint per-language vocabularies
    and the winner's softmax probability is ≥0.999 on held-out docs, so
    the expected confusion matrix is EXACTLY diagonal — the oracle
    derives it from the language-assignment rule alone (same
    invariant-style oracle as the MinHash guaranteed-recall row)."""
    from ariadne_dbt_spark.operators.langid import LANG_LEXICONS

    langs = sorted(LANG_LEXICONS)
    case = " ".join(
        f"WHEN {i} THEN '{lang}'" for i, lang in enumerate(langs)
    )
    return f"""
    WITH labeled AS (
        SELECT doc_id,
               CASE CAST(doc_id % {len(langs)} AS INT) {case} END AS lang_true
        FROM documents
        WHERE (doc_id // {len(langs)}) % 2 = 1
    )
    SELECT lang_true, lang_true AS lang_pred, COUNT(*) AS n
    FROM labeled GROUP BY 1 ORDER BY lang_true
    """


def _lang_suite_oracle() -> str:
    """Two-section language-ID suite oracle: the marker-heuristic
    confusion (SQL mirror) UNION the model confusion (arithmetic
    invariant — exact diagonal by construction, see
    ``_langid_model_oracle``)."""
    return f"""
    SELECT 'marker' AS section, lang, detected, n
    FROM ({_lang_oracle()})
    UNION ALL
    SELECT 'model' AS section, lang_true AS lang, lang_pred AS detected, n
    FROM ({_langid_model_oracle()})
    ORDER BY section, lang, detected
    """


@query(
    "lang_detect_confusion",
    oracle=_lang_suite_oracle(),
    survey="language-id,T7",
    doc="Language-ID suite: (marker) keyword-hit argmax vs the curated "
    "lang column — the reference's intent-detection shape, "
    "capsule.py:24-43; (model) char-3-gram HashingTF + multinomial LR "
    "held-out confusion on the planted 12-language corpus — exactly "
    "diagonal by construction (disjoint vocabularies), which the "
    "oracle knows arithmetically.",
)
def lang_detect_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.functions.text import tokenize
    from ariadne_dbt_spark.operators.text import detect_language_from_tokens

    docs = documents(spark, sf_dir)
    # tokenize ONCE below an exchange barrier: without it, projection
    # collapse inlines the tokenizer into every per-language filter
    # lambda (len(LANG_MARKERS) re-tokenizations per doc, interpreted,
    # on however few partitions the parquet came in as). The repartition
    # shuffles ~MBs of token arrays and parallelizes the lexicon scans.
    toked = docs.select(
        "lang", tokenize("text", min_len=1, stop=False).alias("toks")
    ).repartition(spark.sparkContext.defaultParallelism)
    marker = (
        toked.select("lang", detect_language_from_tokens(F.col("toks")).alias("detected"))
        .groupBy("lang", "detected")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("marker").alias("section"), "lang", "detected", "n")
    )
    model = lang_id_model_confusion(spark, sf_dir).select(
        F.lit("model").alias("section"),
        F.col("lang_true").alias("lang"),
        F.col("lang_pred").alias("detected"),
        "n",
    )
    return marker.unionByName(model).orderBy("section", "lang", "detected")


@query(
    "doc_quality_scores",
    oracle=f"""
    WITH stats AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n,
               CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS BIGINT) AS n_punct,
               CAST(list_count(list_filter(
                   string_split_regex(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
                   t -> length(t) >= 1)) AS BIGINT) AS n_toks,
               CAST(list_count(list_filter(
                   string_split_regex(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
                   t -> length(t) >= 1 AND t IN ({_STOP_SQL}))) AS BIGINT) AS n_stop
        FROM documents
    )
    SELECT doc_id,
           least(n * 800, 400000)
           + (CASE WHEN n > 0
                   THEN 300000 - least((n_punct * 1200000) // n, 300000)
                   ELSE 300000 END)
           + (CASE WHEN n_toks > 0
                   THEN least((n_stop * 1500000) // n_toks, 300000)
                   ELSE 0 END) AS quality_millionths
    FROM stats ORDER BY doc_id
    """,
    survey="quality-scoring",
    doc="Composite length/punctuation/stopword quality heuristic per doc "
    "(integer millionths — engine-stable, no float boundary effects).",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents(spark, sf_dir)
    return docs.select(
        "doc_id", quality_score_millionths("text").alias("quality_millionths")
    ).orderBy("doc_id")


@query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
    survey="fingerprinting,E5",
    doc="Normalized-text MD5 fingerprint (the exact-dedup key).",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents(spark, sf_dir)
    return docs.select("doc_id", fingerprint_md5("text").alias("fingerprint")).orderBy("doc_id")


# PII scrubbing + repetition quality signals. The synthetic corpus is
# PII-free, so the workload plants deterministic emails/URLs from doc_id
# on BOTH sides (same concat in Spark and SQL) — the redaction math is
# exercised on non-trivial values and still exactly oracle-checkable.
@query(
    "doc_pii_repetition",
    oracle=r"""
    WITH dirty AS (
        SELECT doc_id,
               text,
               CASE WHEN doc_id % 3 = 0 THEN
                    text || ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com or https://example.com/d/'
                         || CAST(doc_id AS VARCHAR)
               ELSE text END AS text2
        FROM documents),
    pii AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
               CAST(len(regexp_extract_all(text2, 'https?://[^\s]+')) AS INT) AS n_urls,
               CAST(length(regexp_replace(regexp_replace(text2,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    'https?://[^\s]+', '<URL>', 'g')) AS BIGINT) AS redacted_len
        FROM dirty),
    toks AS (
        SELECT doc_id, tok
        FROM dirty, UNNEST(string_split(text, ' ')) AS t(tok)
        WHERE tok <> ''),
    per_tok AS (
        SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY 1, 2),
    rep AS (
        SELECT doc_id,
               (1000000 * (SUM(n) - COUNT(*))) // SUM(n) AS dup_tok_millionths,
               (1000000 * MAX(n)) // SUM(n) AS top_tok_millionths
        FROM per_tok GROUP BY doc_id)
    SELECT p.doc_id, p.n_emails, p.n_urls, p.redacted_len,
           r.dup_tok_millionths, r.top_tok_millionths
    FROM pii p JOIN rep r ON p.doc_id = r.doc_id
    """,
    survey="pii-redaction,repetition-quality",
    doc="PII scrub (email/URL counts + redacted length) and Gopher-style "
    "repetition signals per document, integer-exact vs the oracle.",
)
def doc_pii_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.text import count_pii, redact_pii, repetition_stats

    docs = documents(spark, sf_dir)
    dirty = docs.select(
        "doc_id",
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or https://example.com/d/"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.col("text")).alias("text2"),
    )
    n_emails, n_urls = count_pii("text2")
    pii = dirty.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        F.length(redact_pii("text2")).cast("bigint").alias("redacted_len"),
    )
    rep = repetition_stats(dirty, "doc_id", "text").withColumnRenamed("id", "doc_id")
    return pii.join(rep, "doc_id")


# Embedding-prep chunking: token windows with overlap. Chunk starts are
# 0, stride, 2·stride, … < n_tokens; the last window may be short.
@query(
    "doc_chunks",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents),
    starts AS (
        SELECT doc_id, toks, len(toks) AS n,
               unnest(range(0, len(toks), 48)) AS st
        FROM t)
    SELECT doc_id,
           CAST(st // 48 AS BIGINT) AS chunk_id,
           array_to_string(toks[st + 1 : st + 64], ' ') AS chunk_text,
           CAST(least(64, n - st) AS INT) AS n_tokens
    FROM starts
    """,
    survey="chunking",
    doc="Token-window chunking (64-token windows, stride 48) for "
    "embedding pipelines; chunk text and sizes exact vs the oracle.",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.text import chunk_documents

    docs = documents(spark, sf_dir)
    return chunk_documents(docs, "doc_id", "text", chunk_tokens=64, stride=48).select(
        F.col("id").alias("doc_id"), "chunk_id", "chunk_text", "n_tokens"
    )

# CCNet-style statistical quality filter: a bigram LM with Laplace
# smoothing trained corpus-wide, each doc scored by mean bigram negative
# log-likelihood (cross-entropy, nats). The oracle re-derives the LM and
# the scores from first principles in SQL; ROUND(...,6) absorbs
# summation-order / ln last-ulp drift (repo float rule).
@query(
    "doc_lm_cross_entropy",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok,
               UNNEST(generate_series(1, len(string_split_regex(trim(lower(text)), '\\s+')))) AS pos
        FROM documents
    ),
    bg AS (
        SELECT doc_id, tok AS w1,
               LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks
    ),
    bg2 AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
    lm AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg2 GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM lm GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT tok) AS vocab_v FROM toks)
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(-ln((l.c12 + 1.0) / (c.c1 + v.vocab_v))), 6) AS xent
    FROM bg2 b
    JOIN lm l ON b.w1 = l.w1 AND b.w2 = l.w2
    JOIN ctx c ON b.w1 = c.w1
    CROSS JOIN v
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
    survey="lm-perplexity-scoring",
    doc="Bigram-LM cross-entropy per document (CCNet-style perplexity "
    "quality filter): LM trained on the corpus itself (two aggregations "
    "with map-side combine), scores joined back per bigram. The scale "
    "path is score_with_lm(broadcast pretrained/pruned LM) = map-only "
    "scoring; this in-gate variant self-scores so the oracle can "
    "re-derive every probability exactly.",
)
def doc_lm_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.lm import lm_cross_entropy

    return lm_cross_entropy(documents(spark, sf_dir), "doc_id", "text").orderBy("doc_id")


# BPE tokenizer induction: the corpus-sized stage (word counting) and
# the first-merge statistic (weighted adjacent symbol-pair counts) are
# exactly SQL-mirrorable; the iterative merge loop + encode are pinned
# by tests/test_bpe.py against the classic Sennrich worked example.
@query(
    "bpe_pair_counts",
    oracle="""
    WITH words AS (
        SELECT word, COUNT(*) AS n FROM (
            SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS word
            FROM documents)
        WHERE word <> '' GROUP BY word
    ),
    syms AS (
        SELECT word, n,
               UNNEST(list_append(regexp_extract_all(word, '.'), '</w>')) AS s1,
               UNNEST(generate_series(1, len(regexp_extract_all(word, '.')) + 1)) AS pos
        FROM words
    ),
    pairs AS (
        SELECT word, n, s1, LEAD(s1) OVER (PARTITION BY word ORDER BY pos) AS s2
        FROM syms
    )
    SELECT s1, s2, CAST(SUM(n) AS BIGINT) AS pair_count
    FROM pairs WHERE s2 IS NOT NULL
    GROUP BY s1, s2
    ORDER BY pair_count DESC, s1, s2
    LIMIT 20
    """,
    survey="bpe-vocab-induction",
    doc="BPE vocabulary induction, gate-checkable stage: corpus word "
    "counts (the one corpus-sized aggregation) distilled to weighted "
    "adjacent symbol-pair counts with the </w> terminal — exactly the "
    "statistic the first BPE merge maximizes. Top-20 pairs vs the SQL "
    "mirror; the driver-side merge loop and the Arrow-batched encoder "
    "are pinned by pytest (Sennrich worked example + roundtrip).",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.bpe import symbol_pair_counts, word_counts

    wc = word_counts(documents(spark, sf_dir), "text")
    return (
        symbol_pair_counts(wc)
        .orderBy(F.desc("pair_count"), "s1", "s2")
        .limit(20)
    )


_GOPHER_TOKS = (
    "list_filter(string_split_regex(trim(lower(t)), '\\s+'), x -> length(x) >= 1)"
)
_GOPHER_STOP_SUM = " + ".join(
    f"CAST(list_contains({_GOPHER_TOKS}, '{w}') AS INT)"
    for w in ("the", "be", "to", "of", "and", "that", "have", "with")
)


@query(
    "gopher_quality_flags",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN '- bullet item one' || chr(10) || '* bullet two' || chr(10)
                    ELSE '' END
               || text ||
               CASE WHEN doc_id % 4 = 0
                    THEN chr(10) || 'to be continued...' ELSE '' END AS t
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len({_GOPHER_TOKS}) AS n_words,
               len(string_split(t, chr(10))) AS n_lines,
               list_sum(list_transform({_GOPHER_TOKS}, x -> length(x))) AS total_chars,
               len(string_split(t, '#')) - 1 AS n_hash,
               len(string_split_regex(t, '\\.\\.\\.')) - 1 AS n_ellipsis,
               len(list_filter(string_split(t, chr(10)),
                               l -> regexp_matches(trim(l), '^[-*]'))) AS bullet_lines,
               len(list_filter(string_split(t, chr(10)),
                               l -> ends_with(rtrim(l), '...'))) AS ellipsis_lines,
               len(list_filter({_GOPHER_TOKS}, x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
               {_GOPHER_STOP_SUM} AS n_stop
        FROM corpus
    ),
    r AS (
        SELECT doc_id AS id, CAST(n_words AS BIGINT) AS n_words,
               n_words >= 50 AND n_words <= 100000 AS r_word_count,
               total_chars >= 3 * n_words AND total_chars <= 10 * n_words AS r_mean_word_len,
               10 * (n_hash + n_ellipsis) <= n_words AS r_symbol_ratio,
               10 * bullet_lines <= n_lines AS r_bullet_lines,
               10 * ellipsis_lines <= 3 * n_lines AS r_ellipsis_lines,
               10 * alpha_words >= 8 * n_words AS r_alpha_words,
               n_stop >= 2 AS r_stopwords
        FROM m
    )
    SELECT *,
           r_word_count AND r_mean_word_len AND r_symbol_ratio AND r_bullet_lines
           AND r_ellipsis_lines AND r_alpha_words AND r_stopwords AS pass_all
    FROM r ORDER BY id
    """,
    survey="gopher-quality-rules",
    doc="The Gopher document-quality rule bundle (Rae et al. 2021 App. A) "
    "on a constructed multi-line corpus (planted bullet lines on every "
    "3rd doc, a trailing-ellipsis line on every 4th): all seven rules "
    "as integer-exact cross-multiplied thresholds, map-only, mirrored "
    "bit-for-bit by the oracle.",
)
def gopher_quality_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.text import gopher_quality_flags

    docs = documents(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("- bullet item one\n* bullet two\n"),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("\nto be continued...")).otherwise(
                F.lit("")
            ),
        ).alias("t"),
    )
    return (
        gopher_quality_flags(docs, "doc_id", "t")
        .withColumnRenamed("id", "id")
        .orderBy("id")
    )


# Web-pipeline URL ops: normalization + registered-domain extraction +
# per-domain stats + blocklist anti-join, on URLs constructed
# deterministically from doc_id (uppercase scheme/host, default port,
# utm param, fragment — each exercising one normalization rewrite).
_URL_EXPR = (
    "'HTTPS://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.COM:443/Path/' || "
    "CAST(doc_id AS VARCHAR) || '?utm_source=feed&q=' || CAST(doc_id AS VARCHAR) || '#Frag'"
)
_HOST_SQL = (
    "lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1))"
)


@query(
    "url_domain_stats",
    oracle=f"""
    WITH urls AS (
        SELECT doc_id, {_URL_EXPR} AS url FROM documents
    ),
    deport AS (
        SELECT doc_id, url,
            regexp_replace(
              regexp_replace(
                lower(regexp_extract(url, '^([^/?#]*://[^/?#]*)', 1))
                  || regexp_replace(url, '^[^/?#]*://[^/?#]*', ''),
                '#.*$', ''),
              '^([a-z]+://[^/:?#]+):(?:80|443)([/?].*)?$', '\\1\\2') AS u
        FROM urls
    ),
    requery AS (
        SELECT doc_id, url, u,
            regexp_extract(u, '^([^?]*)', 1) AS base,
            list_filter(string_split(regexp_extract(u, '^[^?]*\\?(.*)$', 1), '&'),
                        p -> NOT regexp_matches(p, '^utm_') AND p <> '') AS kept
        FROM deport
    ),
    norm AS (
        SELECT doc_id, url,
            regexp_replace(
              base || CASE WHEN len(kept) > 0
                           THEN '?' || array_to_string(kept, '&') ELSE '' END,
              '(://[^/?#]+.+?)/$', '\\1') AS nurl,
            CASE WHEN len(string_split({_HOST_SQL}, '.')) <= 2
                 THEN {_HOST_SQL}
                 ELSE array_to_string(
                     string_split({_HOST_SQL}, '.')[len(string_split({_HOST_SQL}, '.')) - 1
                                                    : len(string_split({_HOST_SQL}, '.'))], '.')
            END AS domain
        FROM requery
    ),
    stats AS (
        SELECT domain, COUNT(*) AS n_docs, MIN(nurl) AS min_norm_url
        FROM norm GROUP BY domain
    ),
    kept AS (
        SELECT domain, COUNT(*) AS n_kept FROM norm
        WHERE domain NOT IN ('site0.com', 'site1.com')
        GROUP BY domain
    )
    SELECT s.domain, s.n_docs,
           s.domain IN ('site0.com', 'site1.com') AS blocked,
           COALESCE(k.n_kept, 0) AS n_kept,
           s.min_norm_url
    FROM stats s LEFT JOIN kept k ON s.domain = k.domain
    ORDER BY s.domain
    """,
    survey="url-domain-ops",
    doc="Web-pipeline URL operators: canonical normalization (scheme/"
    "host lowercase, fragment/default-port/utm strip), registered-"
    "domain extraction, per-domain stats and a REAL broadcast blocklist "
    "anti-join (n_kept=0 for blocked domains comes from executing the "
    "filter, not deriving it). Every regex is RE2-compatible so the "
    "oracle applies the identical rewrites.",
)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.urls import (
        domain_stats,
        filter_blocked_domains,
        normalize_url,
        registered_domain,
    )

    blocked = ["site0.com", "site1.com"]
    docs = documents(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW.Site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".COM:443/Path/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_source=feed&q="),
            F.col("doc_id").cast("string"),
            F.lit("#Frag"),
        ).alias("url"),
    )
    norm = docs.select(
        "doc_id",
        "url",
        normalize_url("url").alias("nurl"),
        registered_domain("url").alias("domain"),
    )
    stats = norm.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("nurl").alias("min_norm_url")
    )
    kept = (
        filter_blocked_domains(docs, "url", blocked)
        .select(registered_domain("url").alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        stats.join(kept, "domain", "left")
        .select(
            "domain",
            "n_docs",
            F.col("domain").isin(blocked).alias("blocked"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "min_norm_url",
        )
        .orderBy("domain")
    )


@query(
    "unicode_normalization",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 2 = 0
                   THEN ' caf' || chr(233) || ' z' || chr(252) || 'rich'
                   ELSE ' cafe' || chr(769) || ' zu' || chr(776) || 'rich'
               END AS r
        FROM documents
    ),
    n AS (
        SELECT doc_id, r,
               nfc_normalize(r) AS nfc,
               strip_accents(nfc_normalize(r)) AS stripped
        FROM raw
    )
    SELECT COUNT(*) FILTER (WHERE nfc <> r) AS n_recomposed,
           COUNT(*) FILTER (WHERE stripped <> nfc) AS n_had_marks,
           COUNT(DISTINCT md5(nfc)) AS n_distinct_nfc_fp,
           COUNT(DISTINCT md5(r)) AS n_distinct_raw_fp
    FROM n
    """,
    survey="unicode-normalization",
    doc="Unicode NFC + accent folding before fingerprinting: every even "
    "doc gets a COMPOSED accent suffix, every odd doc the DECOMPOSED "
    "form of the same text (combining marks) — NFC must recompose "
    "exactly the odd docs, accent folding must touch every doc, and "
    "the NFC fingerprint space must collapse composed/decomposed "
    "variants the raw bytes keep apart. Spark side is unicodedata via "
    "an Arrow-batched UDF, verified char-for-char against DuckDB's "
    "nfc_normalize/strip_accents.",
)
def unicode_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.text import unicode_normalize

    docs = documents(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" café zürich")
            ).otherwise(F.lit(" café zürich")),
        ).alias("r"),
    )
    n = docs.select(
        "r",
        unicode_normalize("r").alias("nfc"),
        unicode_normalize("r", strip_marks=True).alias("stripped"),
    )
    return n.agg(
        F.count(F.when(F.col("nfc") != F.col("r"), 1)).alias("n_recomposed"),
        F.count(F.when(F.col("stripped") != F.col("nfc"), 1)).alias("n_had_marks"),
        F.countDistinct(F.md5("nfc")).alias("n_distinct_nfc_fp"),
        F.countDistinct(F.md5("r")).alias("n_distinct_raw_fp"),
    )


_SB_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


@query(
    "stupid_backoff_eval",
    oracle=f"""
    WITH train AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    eval0 AS (
        SELECT doc_id, {_SB_TOKS} AS l
        FROM documents WHERE doc_id % 2 = 1
    ),
    eval_docs AS (
        SELECT doc_id,
               array_to_string(list_transform(generate_series(1, len(l)),
                   i -> CASE WHEN i % 7 = 3 THEN 'zz' || l[i] ELSE l[i] END), ' ') AS text
        FROM eval0
    ),
    ttoks AS (SELECT UNNEST({_SB_TOKS}) AS w FROM train),
    uni AS (SELECT w, COUNT(*) AS c1 FROM ttoks GROUP BY w),
    tots AS (SELECT COUNT(*) AS n, COUNT(DISTINCT w) AS v FROM ttoks),
    ttk AS (
        SELECT doc_id, UNNEST({_SB_TOKS}) AS tok,
               UNNEST(generate_series(1, len({_SB_TOKS}))) AS pos
        FROM train
    ),
    tlead AS (
        SELECT doc_id, tok AS w1,
               LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
               LEAD(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
        FROM ttk
    ),
    bic AS (SELECT w1, w2, COUNT(*) AS c12 FROM tlead WHERE w2 IS NOT NULL GROUP BY 1, 2),
    tric AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM tlead WHERE w3 IS NOT NULL GROUP BY 1, 2, 3),
    etk AS (
        SELECT doc_id, UNNEST({_SB_TOKS}) AS tok,
               UNNEST(generate_series(1, len({_SB_TOKS}))) AS pos
        FROM eval_docs
    ),
    etri AS (
        SELECT doc_id, w1, w2, w3 FROM (
            SELECT doc_id, tok AS w1,
                   LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
                   LEAD(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
            FROM etk)
        WHERE w3 IS NOT NULL
    ),
    j AS (
        SELECT e.doc_id, t.c123, b1.c12 AS c12_ctx, b2.c12 AS c23,
               u2.c1 AS c2, u3.c1 AS c3, tots.n, tots.v
        FROM etri e
        LEFT JOIN tric t ON e.w1 = t.w1 AND e.w2 = t.w2 AND e.w3 = t.w3
        LEFT JOIN bic b1 ON e.w1 = b1.w1 AND e.w2 = b1.w2
        LEFT JOIN bic b2 ON e.w2 = b2.w1 AND e.w3 = b2.w2
        LEFT JOIN uni u2 ON e.w2 = u2.w
        LEFT JOIN uni u3 ON e.w3 = u3.w
        CROSS JOIN tots
    ),
    s AS (
        SELECT doc_id,
               CASE WHEN c123 IS NOT NULL THEN 'tri'
                    WHEN c23 IS NOT NULL THEN 'bi' ELSE 'uni' END AS br,
               CASE WHEN c123 IS NOT NULL THEN c123 * 1.0 / c12_ctx
                    WHEN c23 IS NOT NULL THEN 0.4 * c23 / c2
                    ELSE 0.4 * 0.4 * (COALESCE(c3, 0) + 1.0) / (n + v) END AS p
        FROM j
    )
    SELECT doc_id,
           COUNT(*) AS n_trigrams,
           COUNT(*) FILTER (br = 'tri') AS n_tri_hits,
           COUNT(*) FILTER (br = 'bi') AS n_bi_backoffs,
           COUNT(*) FILTER (br = 'uni') AS n_uni_backoffs,
           ROUND(AVG(-ln(p)), 6) AS xent_sb
    FROM s GROUP BY doc_id ORDER BY doc_id
    """,
    survey="lm-stupid-backoff",
    doc="Trigram stupid-backoff LM (Brants et al. 2007 — the backoff "
    "designed for MapReduce-scale counting) evaluated on HELD-OUT "
    "perturbed text: train on even docs, score odd docs with every 7th "
    "token made OOV ('zz' prefix), so all three branches (trigram hit, "
    "bigram backoff, unigram Laplace floor) fire and the oracle checks "
    "each branch's count per document plus the blended cross-entropy.",
)
def stupid_backoff_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.lm import stupid_backoff_scores, train_backoff_lm

    docs = documents(spark, sf_dir)
    train = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    eval_docs = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.size(toks)),
                lambda i: F.when(
                    i % 7 == 3,
                    F.concat(F.lit("zz"), F.element_at(toks, i)),
                ).otherwise(F.element_at(toks, i)),
            ),
            " ",
        ).alias("text"),
    )
    lm = train_backoff_lm(train, "doc_id", "text")
    return stupid_backoff_scores(eval_docs, lm, "doc_id", "text").orderBy("doc_id")


def _dsir_score_cte(prefix: str, train_where: str) -> str:
    """Scoring CTE chain: train a Laplace bigram LM on ``train_where``
    docs, score EVERY doc (left joins + coalesce — OOV-safe), emit
    ``{prefix}_scores(doc_id, n_bigrams, xent)``."""
    return f"""
    {prefix}_ttoks AS (
        SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w
        FROM documents WHERE {train_where}
    ),
    {prefix}_v AS (SELECT COUNT(DISTINCT w) AS v FROM {prefix}_ttoks),
    {prefix}_tk AS (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok,
               UNNEST(generate_series(1, len(string_split_regex(trim(lower(text)), '\\s+')))) AS pos
        FROM documents WHERE {train_where}
    ),
    {prefix}_bg AS (
        SELECT doc_id, tok AS w1, LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM {prefix}_tk
    ),
    {prefix}_lm AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM {prefix}_bg WHERE w2 IS NOT NULL GROUP BY 1, 2
    ),
    {prefix}_ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM {prefix}_lm GROUP BY 1),
    {prefix}_ek AS (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok,
               UNNEST(generate_series(1, len(string_split_regex(trim(lower(text)), '\\s+')))) AS pos
        FROM documents
    ),
    {prefix}_ebg AS (
        SELECT doc_id, w1, w2 FROM (
            SELECT doc_id, tok AS w1, LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM {prefix}_ek)
        WHERE w2 IS NOT NULL
    ),
    {prefix}_scores AS (
        SELECT e.doc_id, COUNT(*) AS n_bigrams,
               ROUND(AVG(-ln((COALESCE(l.c12, 0) + 1.0)
                             / (COALESCE(c.c1, 0) + v.v))), 6) AS xent
        FROM {prefix}_ebg e
        LEFT JOIN {prefix}_lm l ON e.w1 = l.w1 AND e.w2 = l.w2
        LEFT JOIN {prefix}_ctx c ON e.w1 = c.w1
        CROSS JOIN {prefix}_v v
        GROUP BY e.doc_id
    )"""


@query(
    "dsir_selection",
    oracle=f"""
    WITH {_dsir_score_cte("t", "source = 'src0'")},
    {_dsir_score_cte("r", "TRUE")}
    SELECT doc_id,
           ROUND(r_scores.xent - t_scores.xent, 6) AS log_ratio
    FROM t_scores JOIN r_scores USING (doc_id)
    ORDER BY log_ratio DESC, doc_id
    LIMIT 50
    """,
    survey="lm-dsir-selection",
    doc="DSIR-style data selection (Xie et al. 2023): every document "
    "scored under a TARGET-domain bigram LM (trained on source='src0') "
    "and under the raw-corpus LM; log_ratio = xent_raw - xent_target "
    "ranks target-likeness, top-50 selected deterministically. Both "
    "scoring chains reuse the exact lm_score mirror (left-join OOV-safe "
    "variant), chained twice in one oracle.",
)
def dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.lm import dsir_select

    docs = documents(spark, sf_dir).select("doc_id", "text", "source")
    target = docs.where(F.col("source") == "src0").select("doc_id", "text")
    return dsir_select(
        docs.select("doc_id", "text"), target, "doc_id", "text", k=50
    ).select("doc_id", "log_ratio")


@query(
    "doc_lexical_diversity",
    oracle="""
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id,
                   UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok
            FROM documents)
        WHERE tok <> ''
    ),
    per_tok AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(COUNT(*) * 1000000 // SUM(cnt) AS BIGINT) AS ttr_millionths,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1000000 // SUM(cnt) AS BIGINT)
               AS hapax_millionths
    FROM per_tok GROUP BY doc_id ORDER BY doc_id
    """,
    survey="quality-scoring",
    doc="Lexical-diversity features per document (type-token ratio + "
    "hapax share, exact integer millionths): templated/machine text "
    "scores low TTR, OCR noise scores high hapax — standard corpus "
    "quality signals beside the Gopher bundle. One (doc,token) shuffle "
    "with map-side combine; no per-doc quadratic array lambdas.",
)
def doc_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.text import lexical_diversity

    return (
        lexical_diversity(documents(spark, sf_dir), "doc_id", "text")
        .orderBy("doc_id")
    )


@query(
    "pmi_top_collocations",
    oracle="""
    WITH toks AS (
        SELECT doc_id, tok, pos FROM (
            SELECT doc_id,
                   UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok,
                   UNNEST(generate_series(1, len(string_split_regex(trim(lower(text)), '\\s+')))) AS pos
            FROM documents)
    ),
    bg AS (
        SELECT doc_id, tok AS w1, LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg WHERE w2 IS NOT NULL GROUP BY 1, 2),
    uni AS (SELECT tok, COUNT(*) AS c FROM toks WHERE tok <> '' GROUP BY 1),
    tot AS (
        SELECT (SELECT CAST(SUM(c12) AS BIGINT) FROM c12) AS n_pairs,
               (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n_tok
    )
    SELECT p.w1, p.w2, CAST(p.c12 AS BIGINT) AS pair_count,
           ROUND(ln(p.c12 * 1.0 * t.n_tok / t.n_pairs * t.n_tok / (u1.c * 1.0 * u2.c)), 6) AS pmi
    FROM c12 p
    JOIN uni u1 ON p.w1 = u1.tok
    JOIN uni u2 ON p.w2 = u2.tok
    CROSS JOIN tot t
    WHERE p.c12 >= 5
    ORDER BY pmi DESC, p.w1, p.w2
    LIMIT 20
    """,
    survey="collocation-mining",
    doc="Top-20 adjacent-word collocations by PMI (Church & Hanks 1990) "
    "with min-count 5 — surfaces boilerplate phrases / phrase-vocab "
    "candidates. PMI argument is ONE fixed-association double "
    "expression (bitwise-identical across engines); the single ln is "
    "rounded to 6dp and the top-k cutoff sorts on the ROUNDED value + "
    "(w1,w2) so rank boundaries cannot flip. Counting is the bigram-LM "
    "shuffle shape; unigram joins are broadcast-size after min-count "
    "pruning.",
)
def pmi_top_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.lm import pmi_collocations

    return pmi_collocations(documents(spark, sf_dir), "doc_id", "text", min_count=5, k=20)


# FineWeb-style corpus pruning: threshold quality PER SOURCE (a global
# cutoff would let one high-scoring domain crowd out the rest). The keep
# decision is an exact integer cross-multiplication on the ranked
# position, so the kept set is engine-stable.
@query(
    "quality_prune_per_source",
    oracle=f"""
    WITH stats AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n,
               CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS BIGINT) AS n_punct,
               CAST(list_count(list_filter(
                   string_split_regex(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
                   t -> length(t) >= 1)) AS BIGINT) AS n_toks,
               CAST(list_count(list_filter(
                   string_split_regex(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
                   t -> length(t) >= 1 AND t IN ({_STOP_SQL}))) AS BIGINT) AS n_stop
        FROM documents
    ),
    q AS (
        SELECT doc_id,
               least(n * 800, 400000)
               + (CASE WHEN n > 0
                       THEN 300000 - least((n_punct * 1200000) // n, 300000)
                       ELSE 300000 END)
               + (CASE WHEN n_toks > 0
                       THEN least((n_stop * 1500000) // n_toks, 300000)
                       ELSE 0 END) AS quality_millionths
        FROM stats
    ),
    r AS (
        SELECT d.doc_id, d.source, q.quality_millionths,
               ROW_NUMBER() OVER (PARTITION BY d.source
                                  ORDER BY q.quality_millionths DESC, d.doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY d.source) AS ng
        FROM documents d JOIN q USING (doc_id)
    )
    SELECT doc_id, source, quality_millionths, rn * 100 <= ng * 30 AS keep
    FROM r ORDER BY doc_id
    """,
    survey="quality-scoring,sampling",
    doc="Per-source top-30% quality pruning (FineWeb-style): composite "
    "quality score ranked within each source, keep decided by exact "
    "integer cross-multiplication rank*100 <= n*pct. One shuffle on "
    "source serves both window functions.",
)
def quality_prune_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.sampling import quality_percentile_prune

    docs = documents(spark, sf_dir).select(
        "doc_id", "source", quality_score_millionths("text").alias("quality_millionths")
    )
    return quality_percentile_prune(
        docs, "doc_id", "quality_millionths", "source", keep_pct=30
    ).orderBy("doc_id")


# Link-graph construction: hrefs extracted from (deterministically
# synthesized) HTML, grouped into source→target-domain edges — the
# host-level web graph that crawl prioritization / PageRank consumes.
_HTML_EXPR = (
    "'<html><body><p>' || text || '</p>"
    "<a href=\"https://WWW.Target' || CAST(doc_id % 5 AS VARCHAR) || "
    "'.Example.org/a/' || CAST(doc_id AS VARCHAR) || '\">t</a>' || "
    "CASE WHEN doc_id % 2 = 0 THEN "
    "'<a href=\"http://cdn.target' || CAST((doc_id + 1) % 5 AS VARCHAR) || "
    "'.example.org/b\">u</a>' ELSE '' END || '</body></html>'"
)


@query(
    "link_graph_edges",
    oracle=f"""
    WITH pages AS (
        SELECT doc_id, source, {_HTML_EXPR} AS html FROM documents
    ),
    links AS (
        SELECT source, UNNEST(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS href
        FROM pages
    ),
    hosts AS (
        SELECT source,
               lower(regexp_extract(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)) AS host
        FROM links
    ),
    doms AS (
        SELECT source,
               CASE WHEN len(string_split(host, '.')) <= 2 THEN host
                    ELSE array_to_string(
                        string_split(host, '.')[len(string_split(host, '.')) - 1
                                                : len(string_split(host, '.'))], '.')
               END AS to_domain
        FROM hosts
    )
    SELECT source AS from_source, to_domain, COUNT(*) AS n_links
    FROM doms GROUP BY 1, 2 ORDER BY 1, 2
    """,
    survey="link-graph",
    doc="Source→target-domain link-graph edges: href extraction "
    "(regexp_extract_all + explode, JVM-side), host → registered-domain "
    "folding, one aggregation with map-side combine. The synthetic HTML "
    "plants 1-2 anchors per doc (mixed-case hosts + a cdn. subdomain) "
    "so extraction, lowercasing and domain folding are all exercised.",
)
def link_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.urls import extract_links, registered_domain

    docs = documents(spark, sf_dir)
    pages = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit('<html><body><p>'),
            F.col("text"),
            F.lit('</p><a href="https://WWW.Target'),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('.Example.org/a/'),
            F.col("doc_id").cast("string"),
            F.lit('">t</a>'),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit('<a href="http://cdn.target'),
                    ((F.col("doc_id") + 1) % 5).cast("string"),
                    F.lit('.example.org/b">u</a>'),
                ),
            ).otherwise(F.lit("")),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    links = extract_links(pages, "html")
    return (
        links.select(
            F.col("source").alias("from_source"),
            registered_domain("href").alias("to_domain"),
        )
        .groupBy("from_source", "to_domain")
        .agg(F.count(F.lit(1)).alias("n_links"))
        .orderBy("from_source", "to_domain")
    )


# Sequence-length distribution: fixed-width histogram over per-doc token
# counts — the planning input for pack_sequences bucket sizing and
# truncation budgets. Integer bin arithmetic end-to-end (no float
# boundaries); share is exact integer millionths.
@query(
    "token_length_histogram",
    oracle="""
    WITH counts AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_toks
        FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM counts)
    SELECT (n_toks // 16) * 16 AS bin_lo,
           (n_toks // 16) * 16 + 15 AS bin_hi,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) * 1000000 // MAX(t.n_total) AS BIGINT) AS share_millionths
    FROM counts CROSS JOIN tot t
    GROUP BY 1, 2 ORDER BY bin_lo
    """,
    survey="token-counting,histogram",
    doc="16-token-wide histogram of per-document whitespace token counts "
    "(sequence-length distribution for packing/truncation planning). "
    "Pure integer bin + share arithmetic; one aggregation with map-side "
    "combine; the total is a broadcast 1-row cross join.",
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.text import whitespace_token_count

    docs = documents(spark, sf_dir)
    counts = docs.select(
        whitespace_token_count("text").cast("bigint").alias("n_toks")
    )
    tot = counts.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .groupBy(
            (F.expr("n_toks DIV 16") * 16).alias("bin_lo"),
            (F.expr("n_toks DIV 16") * 16 + 15).alias("bin_hi"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("CAST(count(1) * 1000000 DIV max(n_total) AS BIGINT)").alias(
                "share_millionths"
            ),
        )
        .orderBy("bin_lo")
    )


# Corpus report card: the one-query corpus snapshot an engineer pulls
# before/after a pipeline change — size, mix, dup rate, quality, and
# exact discrete length percentiles. Every metric is integer-exact
# (millionths / counts), so the report hashes identically everywhere.
@query(
    "corpus_report_card",
    oracle=f"""
    WITH counts AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_toks,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    ),
    stats AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n,
               CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS BIGINT) AS n_punct,
               CAST(list_count(list_filter(
                   string_split_regex(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
                   t -> length(t) >= 1)) AS BIGINT) AS n_toks,
               CAST(list_count(list_filter(
                   string_split_regex(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'),
                   t -> length(t) >= 1 AND t IN ({_STOP_SQL}))) AS BIGINT) AS n_stop
        FROM documents
    ),
    q AS (
        SELECT doc_id,
               least(n * 800, 400000)
               + (CASE WHEN n > 0
                       THEN 300000 - least((n_punct * 1200000) // n, 300000)
                       ELSE 300000 END)
               + (CASE WHEN n_toks > 0
                       THEN least((n_stop * 1500000) // n_toks, 300000)
                       ELSE 0 END) AS quality_millionths
        FROM stats
    ),
    ranked AS (
        SELECT n_toks,
               ROW_NUMBER() OVER (ORDER BY n_toks, doc_id) AS rn,
               COUNT(*) OVER () AS nt
        FROM counts
    ),
    src AS (SELECT source, COUNT(*) AS ns FROM counts GROUP BY source)
    SELECT 'n_docs' AS metric, (SELECT COUNT(*) FROM counts) AS value
    UNION ALL SELECT 'n_sources', (SELECT COUNT(*) FROM src)
    UNION ALL SELECT 'n_langs', (SELECT COUNT(DISTINCT lang) FROM documents)
    UNION ALL SELECT 'exact_dup_rate_millionths',
        (SELECT (COUNT(*) - COUNT(DISTINCT fp)) * 1000000 // COUNT(*) FROM counts)
    UNION ALL SELECT 'total_ws_tokens', (SELECT SUM(n_toks) FROM counts)
    UNION ALL SELECT 'p50_tokens',
        (SELECT n_toks FROM ranked WHERE rn = (nt + 1) // 2)
    UNION ALL SELECT 'p95_tokens',
        (SELECT n_toks FROM ranked WHERE rn = (19 * nt + 19) // 20)
    UNION ALL SELECT 'mean_quality_millionths',
        (SELECT SUM(quality_millionths) // COUNT(*) FROM q)
    UNION ALL SELECT 'top_source_share_millionths',
        (SELECT MAX(ns) * 1000000 // SUM(ns) FROM src)
    ORDER BY metric
    """,
    survey="corpus-report,A4",
    doc="One-query corpus report card: size, source/lang mix, exact-dup "
    "rate (fingerprint distinct), token mass, exact DISCRETE length "
    "percentiles (rank-selected — no interpolation semantics to "
    "disagree on), mean quality and top-source concentration, all as "
    "integer counts/millionths. One pass over documents feeds every "
    "branch; each KPI is a 1-row aggregate unioned into a tall report.",
)
def corpus_report_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ariadne_dbt_spark.operators.text import (
        fingerprint_md5,
        quality_score_millionths,
        whitespace_token_count,
    )

    docs = documents(spark, sf_dir)
    counts = docs.select(
        "doc_id",
        "source",
        "lang",
        whitespace_token_count("text").cast("bigint").alias("n_toks"),
        fingerprint_md5("text").alias("fp"),
        quality_score_millionths("text").alias("qm"),
    ).localCheckpoint(eager=True)

    def one(metric: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(metric).alias("metric"), F.col(df.columns[0]).cast("bigint").alias("value"))

    base = counts.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("fp").alias("n_fp"),
        F.sum("n_toks").alias("tot"),
        F.expr("SUM(qm) DIV COUNT(1)").alias("mean_q"),
    )
    dup = base.select(F.expr("(n_docs - n_fp) * 1000000 DIV n_docs").alias("v"))
    # exact discrete percentiles via VALUE-histogram selection: the
    # value at rank k in (n_toks, doc_id) order is the smallest length
    # whose cumulative count reaches k, so the only window runs over
    # DISTINCT LENGTH VALUES (bounded by the longest doc, never corpus
    # rows) — an unpartitioned row_number over every doc would funnel
    # the whole corpus through one partition at 100x
    hist = counts.groupBy("n_toks").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("n_toks").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "n_toks",
        F.sum("c").over(wv).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("nt"),
    )
    p50 = (
        cum.where(F.col("cum") >= F.expr("(nt + 1) DIV 2"))
        .orderBy("n_toks").limit(1).select("n_toks")
    )
    p95 = (
        cum.where(F.col("cum") >= F.expr("(19 * nt + 19) DIV 20"))
        .orderBy("n_toks").limit(1).select("n_toks")
    )
    src = counts.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    top_share = src.agg(F.expr("MAX(ns) * 1000000 DIV SUM(ns)").alias("v"))
    out = (
        one("n_docs", base.select("n_docs"))
        .unionByName(one("n_sources", base.select("n_sources")))
        .unionByName(one("n_langs", base.select("n_langs")))
        .unionByName(one("exact_dup_rate_millionths", dup))
        .unionByName(one("total_ws_tokens", base.select("tot")))
        .unionByName(one("p50_tokens", p50))
        .unionByName(one("p95_tokens", p95))
        .unionByName(one("mean_quality_millionths", base.select("mean_q")))
        .unionByName(one("top_source_share_millionths", top_share))
        .orderBy("metric")
    )
    import pandas as pd

    res = spark.createDataFrame(out.toPandas(), "metric string, value bigint")
    counts.unpersist()
    return res


# Tokenizer/vocabulary coverage: build the min-count-5 corpus vocabulary,
# then report each doc's out-of-vocabulary token share — the coverage
# check run before freezing a tokenizer or vocab size.
@query(
    "doc_oov_rates",
    oracle="""
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id,
                   UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok
            FROM documents)
        WHERE tok <> ''
    ),
    vocab AS (SELECT tok FROM toks GROUP BY tok HAVING COUNT(*) >= 5)
    SELECT t.doc_id,
           COUNT(*) AS n_toks,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
               AS oov_millionths
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
    survey="tokenizer-coverage",
    doc="Per-document out-of-vocabulary rate against the corpus' own "
    "min-count-5 vocabulary (integer millionths). The vocabulary is "
    "min-count-pruned and therefore broadcast-sized at any corpus "
    "scale (Heaps' law); the per-token membership join is map-only.",
)
def doc_oov_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 5)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_toks",
            "n_oov",
            F.expr("n_oov * 1000000 DIV n_toks").cast("bigint").alias("oov_millionths"),
        )
        .orderBy("doc_id")
    )


# Compressibility (entropy proxy): zlib ratio separates repeated spam,
# natural text and high-entropy junk. The oracle is a PLANTED INVARIANT
# (like the minhash clone rows): the class ranking by mean ratio is a
# structural property of the construction, not a float comparison —
# repeated text compresses ~20x below natural word salad, hex noise
# sits far above it.
@query(
    "compressibility_classes",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE doc_id % 50 = 0)
    SELECT 'hexish' AS klass, n_docs, 3 AS rank_by_ratio FROM n
    UNION ALL SELECT 'natural', n_docs, 2 FROM n
    UNION ALL SELECT 'repeat', n_docs, 1 FROM n
    ORDER BY klass
    """,
    survey="quality-scoring,compressibility",
    doc="zlib-compressibility quality signal (Arrow-batched pandas UDF): "
    "three planted classes per sampled doc — a 6-char loop, the natural "
    "text cycled to a fixed 1200-char window, and a 1200-char md5 hex "
    "chain — must rank 1 < 2 < 3 by mean compression ratio. All three "
    "classes are LENGTH-NORMALIZED so the invariant is independent of "
    "how long the corpus' docs happen to be (a sub-100-char natural doc "
    "barely compresses at all — zlib header overhead — and at tiny SFs "
    "that flipped natural above hexish). The ranking (not the float "
    "ratios) is the oracle-checked output, the invariant pattern used "
    "for every engine-hash-unstable operator here.",
)
def compressibility_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ariadne_dbt_spark.operators.text import compression_ratio_millionths

    base = documents(spark, sf_dir).where(F.col("doc_id") % 50 == 0)
    window_chars = 1200
    # natural text cycled to the window: zlib dedups the cycles (the
    # repeats cost ~nothing) but each window still carries one full copy
    # of natural-entropy text → ratio lands firmly between the pure
    # 6-char loop and the hex chain at ANY base doc length
    natural = F.substring(F.repeat(F.col("text"), 16), 1, window_chars)
    hexish = F.substring(
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(1), F.lit(window_chars // 32 + 1)),
                lambda i: F.md5(F.concat(F.col("text"), i.cast("string"))),
            ),
        ),
        1,
        window_chars,
    )
    classes = base.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit("repeat").alias("klass"), F.repeat(F.lit("spark "), 200).alias("t")),
                F.struct(F.lit("natural").alias("klass"), natural.alias("t")),
                F.struct(F.lit("hexish").alias("klass"), hexish.alias("t")),
            )
        ).alias("r"),
    ).select("doc_id", "r.klass", "r.t")
    scored = classes.select(
        "klass", compression_ratio_millionths("t").alias("ratio")
    )
    per_class = scored.groupBy("klass").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("ratio").alias("mean_ratio"),
    )
    w = Window.orderBy("mean_ratio")
    return (
        per_class.select(
            "klass",
            "n_docs",
            F.row_number().over(w).cast("int").alias("rank_by_ratio"),
        )
        .orderBy("klass")
    )


# CCNet's actual FILTERING step on top of the perplexity scores: per-
# language head/middle/tail terciles (Wenzek et al. 2020 keep head+middle
# as high-quality). Terciles are exact interpolated percentiles of the
# ROUNDED xent values (identical doubles on both engines), per lang.
@query(
    "ccnet_perplexity_buckets",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok,
               UNNEST(generate_series(1, len(string_split_regex(trim(lower(text)), '\\s+')))) AS pos
        FROM documents
    ),
    bg AS (
        SELECT doc_id, tok AS w1,
               LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks
    ),
    bg2 AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
    lm AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg2 GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM lm GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT tok) AS vocab_v FROM toks),
    x AS (
        SELECT b.doc_id,
               ROUND(AVG(-ln((l.c12 + 1.0) / (c.c1 + v.vocab_v))), 6) AS xent
        FROM bg2 b
        JOIN lm l ON b.w1 = l.w1 AND b.w2 = l.w2
        JOIN ctx c ON b.w1 = c.w1
        CROSS JOIN v
        GROUP BY b.doc_id
    ),
    xl AS (SELECT x.doc_id, d.lang, x.xent
           FROM x JOIN documents d ON x.doc_id = d.doc_id),
    qs AS (SELECT lang, quantile_cont(xent, 1.0/3) AS b1,
                  quantile_cont(xent, 2.0/3) AS b2
           FROM xl GROUP BY lang)
    SELECT xl.doc_id, xl.lang, xl.xent,
           CASE WHEN xl.xent <= qs.b1 THEN 'head'
                WHEN xl.xent <= qs.b2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM xl JOIN qs ON xl.lang = qs.lang
    ORDER BY xl.doc_id
    """,
    survey="lm-perplexity-scoring,sampling-curriculum",
    doc="CCNet head/middle/tail perplexity buckets PER LANGUAGE "
    "(Wenzek et al. 2020): bigram-LM cross-entropy terciles within each "
    "lang — the quality partition CCNet keeps head+middle of. Bucket "
    "membership is exactly the interpolated-tercile semantics the "
    "oracle's quantile_cont computes, but the Spark side derives it by "
    "value-histogram rank selection over DISTINCT rounded xents "
    "(round 8) — no executor ever buffers a language's full score "
    "list; every membership SQL-verified.",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.lm import perplexity_buckets

    # the test corpus ships a curated lang column, so the oracle can
    # verify the buckets; corpora without one pass lang_clf= instead and
    # the same operator keys the terciles off detect_language_model's
    # prediction (pinned by tests/test_langid.py)
    docs = documents(spark, sf_dir)
    return perplexity_buckets(docs, "doc_id", "text", lang_col="lang")


# corpus sanity statistic: Zipf-law fit over the term-frequency ranking
# (natural corpora sit near slope -1; a synthetic or corrupted corpus
# shows up as a bad fit). OLS on (ln rank, ln tf) — closed-form sums,
# deterministic given the (tf desc, term) tie-break, SQL-exact.
@query(
    "zipf_law_fit",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(
                   regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+')) AS term
        FROM documents
    ),
    terms AS (
        SELECT doc_id, term FROM toks
        WHERE length(term) >= 2 AND term NOT IN ({_STOP_SQL})
    ),
    tf AS (SELECT term, COUNT(*) AS tf FROM terms GROUP BY term),
    ranked AS (
        SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS DOUBLE)) AS x,
               ln(CAST(tf AS DOUBLE)) AS y
        FROM tf
    ),
    s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
          FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_terms,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r_squared
    FROM s
    """,
    survey="T1,A8,corpus-stats",
    doc="Zipf-law fit over the term-frequency ranking: OLS slope + R^2 "
    "on (ln rank, ln tf) via closed-form sums — the corpus-health "
    "sanity statistic (natural text sits near slope -1).",
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ariadne_dbt_spark.functions.text import tokenize

    docs = documents(spark, sf_dir)
    terms = docs.select(F.explode(tokenize("text")).alias("term"))
    tf = terms.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    # the fit only needs the head+body of the ranking: pre-cut to the
    # top-K tf terms via orderBy+limit, which compiles to
    # TakeOrderedAndProject (per-partition top-K, merged on the driver
    # side of the exchange — no global sort). That bounds the
    # row_number window below to ≤ K rows at ANY vocabulary size; at
    # gate scale vocab ≪ K so the oracle (which ranks the full vocab)
    # is unchanged.
    tf = tf.orderBy(F.desc("tf"), "term").limit(_ZIPF_FIT_TOP_K)
    # rank ties broken by term for engine-identical ordering
    w = Window.orderBy(F.desc("tf"), "term")
    ranked = tf.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("tf").cast("double")).alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(num / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")), 6).alias(
            "zipf_slope"
        ),
        F.round(
            (num * num)
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r_squared"),
    )


# Model-based language ID (SURVEY §8.3 / CCNet): char-n-gram HashingTF +
# multinomial LR trained on one half of a planted 12-language corpus
# (disjoint vocabularies, deterministic JVM-side synthesis), confusion
# matrix measured on the OTHER half. The marker heuristic
# (lang_detect_confusion) stays as the zero-dependency fallback; this is
# the scale path real pipelines key per-language processing off.
@query(
    "lang_id_model_confusion",
    oracle=_langid_model_oracle(),
    survey="language-id,T7",
    doc="Model-based language ID: hashed char-3-gram multinomial "
    "logistic regression (MLlib, map-only inference) on a planted "
    "12-language corpus; held-out confusion matrix is exactly diagonal "
    "by construction (disjoint vocabularies), which the oracle knows "
    "arithmetically.",
)
def lang_id_model_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.langid import detect_language_model

    clf = _train_langid_on_corpus(spark, sf_dir)
    corpus, half = _langid_synth_corpus(spark, sf_dir)
    pred = detect_language_model(corpus.where(half == 1), clf, "text")
    return (
        pred.groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_true", "lang_pred")
    )


def _langid_synth_corpus(spark: SparkSession, sf_dir: str):
    """(synth 12-language corpus, train/held-out half expression). The
    split is decorrelated from the lang assignment (which is id % L):
    alternate L-sized blocks, so every language appears in both halves."""
    from ariadne_dbt_spark.operators.langid import LANG_LEXICONS, synth_lang_corpus

    n_langs = len(LANG_LEXICONS)
    docs = documents(spark, sf_dir).select("doc_id")
    corpus = synth_lang_corpus(docs, "doc_id")
    return corpus, F.expr(f"(doc_id div {n_langs}) % 2")


def _train_langid_on_corpus(spark: SparkSession, sf_dir: str) -> dict:
    """Train the language classifier on the capped labeled half.

    Training cost is capped (≤200 docs/language — ample for the
    disjoint-vocabulary corpus) while INFERENCE still covers the whole
    held-out half: the oracle's expected counts depend only on that
    half, which is untouched. At 100 TB this is exactly the real
    shape — the classifier trains once on a small labeled set and the
    corpus only ever pays the map-only transform."""
    from ariadne_dbt_spark.operators.langid import (
        LANG_LEXICONS,
        train_language_classifier,
    )

    n_langs = len(LANG_LEXICONS)
    corpus, half = _langid_synth_corpus(spark, sf_dir)
    return train_language_classifier(
        corpus.where(half == 0).where(F.col("doc_id") < n_langs * 200),
        "text",
        "lang_true",
    )


#: train-once cache for the langid_infer bench row, keyed by (app, sf):
#: mirrors production (train once, load in every ingest job) and gives
#: the bench a pure map-only inference number — a cold langid_infer run
#: trains (like a job loading a saved model pays I/O once), the warm run
#: is inference only, so inference-path regressions stop hiding inside
#: training noise (round-7 note on lang_detect_confusion's 2.5 s).
_LANGID_CLF_CACHE: dict[tuple[str, str], dict] = {}


def _cached_langid_clf(spark: SparkSession, sf_dir: str) -> dict:
    key = (spark.sparkContext.applicationId, sf_dir)
    clf = _LANGID_CLF_CACHE.get(key)
    if clf is None:
        clf = _train_langid_on_corpus(spark, sf_dir)
        _LANGID_CLF_CACHE.clear()  # models bind to their session
        _LANGID_CLF_CACHE[key] = clf
    return clf


def _langid_train_oracle() -> str:
    from ariadne_dbt_spark.operators.langid import LANG_LEXICONS

    n_langs = len(LANG_LEXICONS)
    return f"""
    SELECT {n_langs} AS n_classes, COUNT(*) AS n_train_docs
    FROM documents
    WHERE (doc_id // {n_langs}) % 2 = 0 AND doc_id < {n_langs * 200}
    """


@query(
    "langid_train",
    oracle=_langid_train_oracle(),
    survey="language-id,T7",
    doc="Language-ID TRAINING cost, isolated: fit the hashed char-3-gram "
    "multinomial LR on the capped labeled half and report the model "
    "shape. The bench-side twin of bm25_index_build — training wall "
    "clock gets its own number instead of hiding inside the confusion "
    "rows.",
)
def langid_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.langid import LANG_LEXICONS

    n_langs = len(LANG_LEXICONS)
    corpus, half = _langid_synth_corpus(spark, sf_dir)
    n_train = corpus.where(half == 0).where(F.col("doc_id") < n_langs * 200).count()
    clf = _train_langid_on_corpus(spark, sf_dir)
    return spark.createDataFrame(
        [(len(clf["labels"]), n_train)], "n_classes int, n_train_docs bigint"
    )


@query(
    "langid_infer",
    oracle=_langid_model_oracle(),
    survey="language-id,T7",
    doc="Language-ID INFERENCE cost, isolated: map-only transform of the "
    "held-out half under a train-once cached classifier (the bench-side "
    "twin of bm25_search — cold pays one training, warm is pure "
    "inference). Same diagonal-confusion oracle as "
    "lang_id_model_confusion.",
)
def langid_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ariadne_dbt_spark.operators.langid import detect_language_model

    clf = _cached_langid_clf(spark, sf_dir)
    corpus, half = _langid_synth_corpus(spark, sf_dir)
    pred = detect_language_model(corpus.where(half == 1), clf, "text")
    return (
        pred.groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_true", "lang_pred")
    )
