"""WARC reader: round-trip against the deterministic fixture formulas,
both plain and per-record-gzip layouts, HTTP payload split, and the
pages-shape mapping."""

import gzip

import pytest

from hllspark import warc as W


def _expected(i):
    body_len = 10 + (i * 7) % 50
    ch = chr(97 + i % 26)
    hh, mm = divmod(i, 60)
    return {
        "uri": f"https://w{i % 7}.example.com/p{i}",
        "date": f"2024-06-01T{hh:02d}:{mm:02d}:00Z",
        "body": (ch * body_len).encode("ascii"),
    }


def test_parse_record_block_strict():
    rec = W.format_warc_record("https://x/", "2024-06-01T00:00:00Z", b"abc")
    headers, payload, end = W._parse_record_block(rec)
    assert payload == b"abc"
    assert headers["warc-target-uri"] == "https://x/"
    assert rec[end:] == b"\r\n\r\n"
    with pytest.raises(ValueError):
        W._parse_record_block(rec[: len(rec) - 8])  # truncated payload
    with pytest.raises(ValueError):
        W._parse_record_block(b"HTTP/1.1 200 OK\r\n\r\n")


def test_gzip_member_iteration():
    members = [b"first", b"second" * 100, b""]
    blob = b"".join(gzip.compress(m) for m in members)
    assert list(W._iter_gzip_members(blob)) == members


def test_warc_roundtrip_plain_and_gzip(spark, tmp_path):
    n = 40
    paths = W.synthesize_warc_files(str(tmp_path), n, records_per_file=7)
    assert any(p.endswith(".warc.gz") for p in paths)
    assert any(p.endswith(".warc") and not p.endswith(".gz") for p in paths)

    df = W.read_warc(spark, str(tmp_path)).orderBy("target_uri")
    rows = {r.target_uri: r for r in df.collect()}
    assert len(rows) == n
    for i in range(n):
        exp = _expected(i)
        r = rows[exp["uri"]]
        assert r.warc_type == "response"
        assert r.warc_date == exp["date"]
        assert r.http_status == 200
        assert bytes(r.payload) == exp["body"]
        # content_length covers the HTTP envelope, not just the body
        assert r.content_length > len(exp["body"])


def test_warc_raw_mode_keeps_http_envelope(spark, tmp_path):
    W.synthesize_warc_files(str(tmp_path), 5, records_per_file=5,
                            gzip_every_other_file=False)
    df = W.read_warc(spark, str(tmp_path), parse_http=False)
    r = df.orderBy("record_index").first()
    assert r.http_status is None
    assert bytes(r.payload).startswith(b"HTTP/1.1 200 OK\r\n")
    assert r.content_length == len(bytes(r.payload))


def test_warc_to_pages_shape(spark, tmp_path):
    W.synthesize_warc_files(str(tmp_path), 12, records_per_file=4)
    pages = W.warc_to_pages(W.read_warc(spark, str(tmp_path)))
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    rows = {r.url: r for r in pages.collect()}
    assert len(rows) == 12
    exp = _expected(3)
    r = rows[exp["uri"]]
    assert r.text == exp["body"].decode("ascii")
    assert bytes(r.html) == exp["body"]
    assert r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ") == exp["date"]


def test_warc_to_pages_real_extractor(spark, tmp_path):
    """warc_to_pages(extractor=extract_text_html) routes ingest through
    the REAL boilerplate stripper; on the tag-free fixture bodies it must
    agree byte-for-byte with the default fixture-parity twin."""
    from hllspark import text as T

    W.synthesize_warc_files(str(tmp_path), 6, records_per_file=3)
    records = W.read_warc(spark, str(tmp_path))
    base = {r.url: r.text for r in W.warc_to_pages(records).collect()}
    real = {r.url: r.text
            for r in W.warc_to_pages(
                records, extractor=T.extract_text_html).collect()}
    assert real == base and len(real) == 6


def test_warc_one_task_per_file(spark, tmp_path):
    W.synthesize_warc_files(str(tmp_path), 30, records_per_file=10)
    df = W.read_warc(spark, str(tmp_path))
    # 3 files -> 3 input partitions (binaryFile is non-splittable; the CC
    # work granularity the module docstring claims)
    assert df.select("warc_file").distinct().count() == 3
    assert df.count() == 30


def test_write_warc_round_trip(spark, tmp_path):
    from hllspark import io as hio

    pages = hio.generate_pages(spark, 200, num_partitions=5)
    out = str(tmp_path / "export")
    shards = W.write_warc(pages, out).collect()
    assert sum(r.n_records for r in shards) == 200
    assert all(r.warc_file.endswith(".warc.gz") for r in shards)

    back = W.read_warc(spark, out)
    # duplicate urls carry distinct timestamps -> compare as multisets
    expected = sorted(
        (r.url, r.warc_ts.isoformat() + "Z", bytes(r.html))
        for r in pages.select("url", "warc_ts", "html").collect()
    )
    got = back.collect()
    assert all(r.http_status == 200 for r in got)
    assert expected == sorted(
        (r.target_uri, r.warc_date, bytes(r.payload)) for r in got
    )


def test_write_warc_plain_no_http(spark, tmp_path):
    from hllspark import io as hio

    pages = hio.generate_pages(spark, 30, num_partitions=2)
    out = str(tmp_path / "plain")
    W.write_warc(pages, out, gzip_records=False, http_wrap=False).collect()
    back = W.read_warc(spark, out)
    assert back.count() == 30
    r = back.first()
    assert r.http_status is None
    assert bytes(r.payload).startswith(b"<html><body>")


def test_warc_stream_matches_batch(spark, tmp_path):
    """Streaming ingest: files become record micro-batches; after the
    availableNow drain the streamed record set equals the batch read."""
    src = str(tmp_path / "stream_src")
    W.synthesize_warc_files(src, 48, records_per_file=16)
    stream = W.warc_stream(spark, src, max_files_per_trigger=1)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("warc_stream_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.target_uri, r.warc_date, bytes(r.payload))
        for r in spark.sql("SELECT * FROM warc_stream_test").collect()
    )
    exp = sorted(
        (r.target_uri, r.warc_date, bytes(r.payload))
        for r in W.read_warc(spark, src).collect()
    )
    assert got == exp and len(got) == 48
