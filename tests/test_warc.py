"""WARC ingestion: plain + per-record-gzip files through the real
Spark binaryFile → mapInPandas path; HTTP response payload split."""

from __future__ import annotations

import os

import pytest

from ariadne_dbt_spark.ingest.warc import (
    make_warc_bytes,
    parse_warc_bytes,
    read_warc,
)

_RECORDS = [
    {
        "warc_type": "warcinfo",
        "record_id": "<urn:uuid:info>",
        "content_type": "application/warc-fields",
        "payload": b"software: test\r\n",
    },
    {
        "warc_type": "response",
        "record_id": "<urn:uuid:r1>",
        "target_uri": "http://example.com/a",
        "content_type": "application/http; msgtype=response",
        "payload": (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html>hello world</html>"
        ),
    },
    {
        "warc_type": "response",
        "record_id": "<urn:uuid:r2>",
        "target_uri": "http://example.com/b",
        "content_type": "application/http; msgtype=response",
        "payload": b"HTTP/1.1 404 Not Found\r\n\r\ngone",
    },
    {
        "warc_type": "resource",
        "record_id": "<urn:uuid:r3>",
        "target_uri": "http://example.com/c.txt",
        "content_type": "text/plain",
        "payload": b"plain resource body",
    },
]


@pytest.mark.parametrize("gz", [False, True])
def test_parse_roundtrip(gz):
    recs = parse_warc_bytes(make_warc_bytes(_RECORDS, gzip_members=gz))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "response", "resource",
    ]
    assert recs[1]["http_status"] == 200
    assert recs[1]["payload"] == b"<html>hello world</html>"
    assert recs[2]["http_status"] == 404
    assert recs[2]["payload"] == b"gone"
    assert recs[3]["http_status"] is None
    assert recs[3]["payload"] == b"plain resource body"


def test_read_warc_distributed(spark, tmp_path):
    d = str(tmp_path / "warcs")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc"), "wb") as f:
        f.write(make_warc_bytes(_RECORDS))
    with open(os.path.join(d, "b.warc.gz"), "wb") as f:
        f.write(make_warc_bytes(_RECORDS, gzip_members=True))

    df = read_warc(spark, d)
    rows = df.collect()
    assert len(rows) == 8  # 4 records x 2 files
    by_uri = {}
    for r in rows:
        by_uri.setdefault(r.target_uri, []).append(r)
    assert len(by_uri["http://example.com/a"]) == 2
    for r in by_uri["http://example.com/a"]:
        assert r.http_status == 200
        assert bytes(r.payload) == b"<html>hello world</html>"
    # downstream text pipeline: payload decodes as a normal column
    from pyspark.sql import functions as F

    n = (
        df.where(F.col("http_status") == 200)
        .select(F.decode(F.col("payload"), "utf-8").alias("html"))
        .where(F.col("html").contains("hello"))
        .count()
    )
    assert n == 2


def test_html_to_text_extraction(spark):
    from pyspark.sql import functions as F

    from ariadne_dbt_spark.operators.text import html_to_text

    html = (
        "<html><head><style>p { color: red }</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Title &amp; More</h1><!-- hidden -->"
        "<p>First&nbsp;paragraph.</p><p>Second   one.</p>"
        "<div>List:<ul><li>a</li><li>b</li></ul></div></body></html>"
    )
    got = (
        spark.createDataFrame([(html,)], "html string")
        .select(html_to_text("html").alias("t"))
        .first()
        .t
    )
    assert "not text" not in got and "color" not in got and "hidden" not in got
    assert "Title & More" in got
    assert "First paragraph." in got and "Second one." in got
    # block tags became line boundaries
    lines = got.split("\n")
    assert "a" in lines and "b" in lines


def test_warc_to_clean_text_pipeline(spark, tmp_path):
    """End to end: WARC shard -> 200-only responses -> html_to_text ->
    line-level boilerplate removal -> quality scoring. The CommonCrawl
    preprocessing shape, each stage an existing operator."""
    from pyspark.sql import functions as F

    from ariadne_dbt_spark.operators.dedup import remove_boilerplate_lines
    from ariadne_dbt_spark.operators.text import html_to_text, quality_score_millionths

    def page(i):
        return (
            f"<html><body><p>Document number {i} with unique words "
            f"alpha{i} beta{i} and some real sentence content here.</p>"
            "<div>SHARED COOKIE BANNER TEXT</div></body></html>"
        ).encode()

    recs = [
        {
            "warc_type": "response",
            "record_id": f"<urn:uuid:p{i}>",
            "target_uri": f"http://site{i}.test/",
            "content_type": "application/http; msgtype=response",
            "payload": b"HTTP/1.1 200 OK\r\n\r\n" + page(i),
        }
        for i in range(6)
    ]
    d = str(tmp_path / "cc")
    os.makedirs(d)
    with open(os.path.join(d, "shard.warc.gz"), "wb") as f:
        f.write(make_warc_bytes(recs, gzip_members=True))

    docs = (
        read_warc(spark, d)
        .where(F.col("http_status") == 200)
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            html_to_text(F.decode(F.col("payload"), "utf-8")).alias("text"),
        )
    )
    clean = remove_boilerplate_lines(docs, "doc_id", "text", min_df=3)
    rows = clean.collect()
    assert len(rows) == 6
    for r in rows:
        assert "COOKIE BANNER" not in r.text  # boilerplate line removed
        assert "real sentence content" in r.text
        assert r.n_lines_dropped == 1
    scored = clean.select(quality_score_millionths("text").alias("q")).collect()
    assert all(r.q > 0 for r in scored)
