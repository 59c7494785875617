"""WARC ingestion: record framing, gzip members, pages projection, and
extraction parity with the native pages table (cites the synthesis in
sources/pages.py — the reference's crawlers never land archives, so the
oracle here is the repo's own deterministic corpus)."""

import gzip

from myaku_spark.sources.warc import (
    read_warc,
    warc_record_bytes,
    warc_to_pages,
)


def _shard_records():
    return [
        warc_record_bytes(
            "", "2026-01-01T00:00:00Z", b"software: test",
            warc_type="warcinfo",
        ),
        warc_record_bytes(
            "http://a.example/1", "2026-01-01T00:00:01Z",
            "<html>A</html>".encode(),
        ),
        warc_record_bytes(
            "http://a.example/404", "2026-01-01T00:00:02Z", b"gone",
            http_status=404,
        ),
        warc_record_bytes(
            "http://a.example/2", "2026-01-01T00:00:03.250000Z",
            "<html>B</html>".encode(),
        ),
    ]


def test_warc_roundtrip_plain_and_gz(spark, tmp_path):
    recs = _shard_records()
    (tmp_path / "shard-00000.warc").write_bytes(b"".join(recs))
    # standard member-per-record .warc.gz layout
    (tmp_path / "shard-00001.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )

    rows = read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 8  # both shards parse identically
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.warc_path.rsplit("/", 1)[-1], []).append(r)
    assert set(by_shard) == {"shard-00000.warc", "shard-00001.warc.gz"}
    for shard_rows in by_shard.values():
        info = [r for r in shard_rows if r.warc_type == "warcinfo"]
        assert len(info) == 1
        assert info[0].http_status is None and info[0].url is None
        resp = {r.url: r for r in shard_rows if r.warc_type == "response"}
        assert resp["http://a.example/1"].http_status == 200
        assert bytes(resp["http://a.example/1"].body) == b"<html>A</html>"
        assert resp["http://a.example/1"].content_type.startswith(
            "text/html"
        )
        assert resp["http://a.example/404"].http_status == 404
        # fractional-second WARC-Date survives
        assert resp["http://a.example/2"].warc_ts.microsecond == 250_000

    pages = warc_to_pages(read_warc(spark, str(tmp_path))).collect()
    # 2 shards x 2 OK responses; the 404 and the warcinfo are dropped
    assert len(pages) == 4
    assert {r.url for r in pages} == {
        "http://a.example/1", "http://a.example/2"
    }
    assert all(r.text is None and r.lang == "" for r in pages)
    assert {bytes(r.html) for r in pages} == {
        b"<html>A</html>", b"<html>B</html>"
    }


def test_warc_truncated_and_garbage_tails(spark, tmp_path):
    good = warc_record_bytes(
        "http://ok.example/", "2026-01-01T00:00:00Z", b"<html>ok</html>"
    )
    # garbage after a valid record: scan stops, the good record survives
    (tmp_path / "g.warc").write_bytes(good + b"NOT-A-WARC-HEADER")
    # header with an unparseable length: scan stops at that record
    bad_len = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: nope\r\n\r\nxxx"
    )
    (tmp_path / "h.warc").write_bytes(good + bad_len)
    rows = read_warc(spark, str(tmp_path)).collect()
    ok = [r for r in rows if r.url == "http://ok.example/"]
    assert len(ok) == 2 and all(r.http_status == 200 for r in ok)
    assert len(rows) == 2  # neither tail produced a phantom record


def test_warc_streaming_decompress_chunk_boundaries():
    # The gz stream parser must frame records correctly no matter where
    # decompression chunk boundaries fall — force 7-byte chunks so every
    # header and block straddles boundaries; multi-member layout too.
    import gzip as gz

    from myaku_spark.sources.warc import _gz_chunks, _parse_stream

    recs = [
        warc_record_bytes(
            f"http://m.example/{i}",
            "2026-01-01T00:00:00Z",
            bytes([65 + i % 26]) * (i % 97 + 1),
        )
        for i in range(200)
    ]
    payload = b"".join(gz.compress(r) for r in recs)
    rows = list(
        _parse_stream("s.warc.gz", _gz_chunks(payload, max_chunk=7))
    )
    assert len(rows) == 200
    for i, r in enumerate(rows):
        assert r[1] == f"http://m.example/{i}"
        assert r[6] == bytes([65 + i % 26]) * (i % 97 + 1)
        assert r[4] == 200


def test_wet_write_read_roundtrip(spark, tmp_path):
    # Delivery side: curated text out as WET conversion records,
    # parsed back by the same reader.
    import datetime as dt

    from myaku_spark.sources.warc import write_wet

    docs = spark.createDataFrame(
        [
            (i, f"http://d.example/{i}", f"text body {i}\nline two {i}")
            for i in range(40)
        ],
        "doc_id long, url string, text string",
    ).repartition(3)
    man = write_wet(docs, str(tmp_path / "wet"), url_col="url").collect()
    assert sum(r.records for r in man) == 40
    assert all(r.shard.endswith(".warc.gz") and r.bytes > 0 for r in man)

    back = read_warc(spark, str(tmp_path / "wet")).collect()
    assert len(back) == 40
    assert all(
        r.warc_type == "conversion" and r.http_status is None for r in back
    )
    got = {r.url: bytes(r.body).decode() for r in back}
    assert got == {
        f"http://d.example/{i}": f"text body {i}\nline two {i}"
        for i in range(40)
    }
    # default timestamp is the fixed deterministic epoch, not wall clock
    assert {r.warc_ts for r in back} == {dt.datetime(1970, 1, 1)}


def test_warc_non_latin1_uri_roundtrip(spark, tmp_path):
    # r5 advice: warc_record_bytes encoded headers latin-1, so a
    # non-latin-1 WARC-Target-URI (routine on the Japanese web) raised
    # UnicodeEncodeError inside write_wet's shard writer. WARC 1.0
    # permits UTF-8 header values; the reader already decodes UTF-8 —
    # writer and reader must agree.
    from myaku_spark.sources.warc import write_wet

    ja_url = "http://例え.テスト/記事/日本語ページ"
    rec = warc_record_bytes(ja_url, "2026-01-01T00:00:00Z", b"<html>j</html>")
    (tmp_path / "ja.warc").write_bytes(rec)
    rows = read_warc(spark, str(tmp_path / "ja.warc")).collect()
    assert len(rows) == 1 and rows[0].url == ja_url

    docs = spark.createDataFrame(
        [(ja_url, "日本語の本文")], "url string, text string"
    )
    man = write_wet(docs, str(tmp_path / "wet"), url_col="url").collect()
    assert sum(r.records for r in man) == 1
    back = read_warc(spark, str(tmp_path / "wet")).collect()
    assert back[0].url == ja_url
    assert bytes(back[0].body).decode() == "日本語の本文"


def test_warc_truncated_mid_block_drops_partial(spark, tmp_path):
    # r5 advice: a shard ending before Content-Length bytes arrive must
    # drop the partial record (a cut-off HTML body must not land as a
    # normal-looking pages row).
    good = warc_record_bytes(
        "http://ok.example/", "2026-01-01T00:00:00Z", b"<html>ok</html>"
    )
    cut = warc_record_bytes(
        "http://cut.example/", "2026-01-01T00:00:01Z", b"X" * 1000
    )[:-600]  # header intact, block short of Content-Length
    (tmp_path / "t.warc").write_bytes(good + cut)
    rows = read_warc(spark, str(tmp_path / "t.warc")).collect()
    assert [r.url for r in rows] == ["http://ok.example/"]


def test_wet_tz_aware_timestamp_roundtrip(spark, tmp_path):
    # r5 advice: a tz-aware ts_col yielded '...+00:00Z', which the
    # reader rejects → warc_ts NULL → row dropped by warc_to_pages.
    # Aware datetimes must normalize to UTC-naive before the Z suffix.
    import datetime as dt

    from myaku_spark.sources.warc import write_wet

    jst = dt.timezone(dt.timedelta(hours=9))
    aware = dt.datetime(2026, 1, 2, 9, 30, 0, tzinfo=jst)  # = 00:30 UTC
    docs = spark.createDataFrame(
        [("http://tz.example/", "body", aware)],
        "url string, text string, ts timestamp",
    )
    # Spark stores naive UTC; force the aware case through the writer
    # directly too, since session-tz handling may already strip tzinfo.
    man = write_wet(
        docs, str(tmp_path / "wet"), url_col="url", ts_col="ts"
    ).collect()
    assert sum(r.records for r in man) == 1
    back = read_warc(spark, str(tmp_path / "wet")).collect()
    assert len(back) == 1 and back[0].warc_ts is not None

    # unit-level: the writer's normalization mirrors _parse_warc_ts
    from myaku_spark.sources.warc import _parse_warc_ts

    norm = aware.astimezone(dt.timezone.utc).replace(tzinfo=None)
    assert _parse_warc_ts(norm.isoformat() + "Z") == norm


def test_warc_to_index_extraction_parity(spark, tmp_path):
    # A synthesized corpus archived as one .warc.gz shard must extract
    # byte-identically to the same corpus landed as a native pages
    # table — the WARC path feeds the untouched P1-P5 pipeline.
    from myaku_spark.plans.build_index import extract_and_dedupe
    from myaku_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(spark, 30, partitions=2)
    rows = pages.collect()
    shard = b"".join(
        gzip.compress(
            warc_record_bytes(
                r.url, r.warc_ts.isoformat() + "Z", bytes(r.html)
            )
        )
        for r in rows
    )
    (tmp_path / "cc-00000.warc.gz").write_bytes(shard)

    from_warc = warc_to_pages(read_warc(spark, str(tmp_path)))
    assert from_warc.count() == 30
    got_ts = {
        r.url: r.warc_ts
        for r in from_warc.select("url", "warc_ts").collect()
    }
    assert got_ts == {r.url: r.warc_ts for r in rows}

    native = {
        (r.url, r.text)
        for r in extract_and_dedupe(pages).select("url", "text").collect()
    }
    archived = {
        (r.url, r.text)
        for r in extract_and_dedupe(from_warc)
        .select("url", "text")
        .collect()
    }
    assert native == archived
    assert len(archived) > 0


def test_read_warc_bounded_batches_identical(spark, tmp_path, monkeypatch):
    # r6: read_warc drains the record stream in bounded Arrow batches
    # (compressed + ONE batch live per task, not compressed + the whole
    # inflated shard). Forcing tiny batch caps must change only the
    # batching, never the rows.
    import myaku_spark.sources.warc as w

    recs = [
        warc_record_bytes(
            f"http://b.example/{i}", "2026-01-01T00:00:00Z",
            f"<html>{'x' * (i % 50)}</html>".encode(),
        )
        for i in range(57)
    ]
    (tmp_path / "s.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )

    def rows():
        return sorted(
            (r.url, bytes(r.body))
            for r in read_warc(spark, str(tmp_path)).collect()
        )

    want = rows()
    assert len(want) == 57
    monkeypatch.setattr(w, "WARC_BATCH_ROWS", 3)
    monkeypatch.setattr(w, "WARC_BATCH_BYTES", 1)
    assert rows() == want


def test_gz_chunks_bounded_input_slices():
    # r6: _gz_chunks must be LINEAR in shard size for member-per-record
    # layouts (unused_data copies the tail; feeding bounded slices caps
    # the copy at one slice). Sweep tiny in/out chunk sizes over a
    # multi-member payload — framing must be exact at every boundary.
    import gzip as gz

    from myaku_spark.sources.warc import _gz_chunks

    members = [
        (f"m{i}:".encode() + bytes([65 + i % 26]) * (i * 13 % 257))
        for i in range(120)
    ]
    payload = b"".join(gz.compress(m) for m in members)
    want = b"".join(members)
    for in_chunk in (5, 64, 1 << 20):
        for max_chunk in (7, 1 << 20):
            got = b"".join(
                _gz_chunks(payload, max_chunk=max_chunk, in_chunk=in_chunk)
            )
            assert got == want, (in_chunk, max_chunk)
    # truncated mid-member still terminates cleanly
    got = b"".join(_gz_chunks(payload[:-30], in_chunk=11))
    assert want.startswith(got)


def test_warc_body_containing_fake_headers_never_misframes():
    # Content-Length framing must never split on payload bytes: bodies
    # here embed complete-looking WARC headers, inter-record CRLF runs,
    # and partial header prefixes — byte-exact roundtrip required,
    # plain and gzipped, at adversarial chunk sizes.
    import gzip as gz

    from myaku_spark.sources.warc import _gz_chunks, _parse_stream

    evil_bodies = [
        b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: 3\r\n\r\nxyz\r\n\r\n",
        b"WARC/1.0" * 10,
        b"\r\n" * 50,
        b"Content-Length: 999999\r\n\r\n" + b"A" * 100,
        b"",  # zero-length block
        bytes(range(256)) * 3,  # all byte values incl. NUL
    ]
    recs = [
        warc_record_bytes(
            f"http://evil.example/{i}", "2026-01-01T00:00:00Z", b
        )
        for i, b in enumerate(evil_bodies)
    ]
    plain = b"".join(recs)
    rows = list(_parse_stream("e.warc", iter((plain,))))
    assert len(rows) == len(evil_bodies)
    for i, r in enumerate(rows):
        assert r[1] == f"http://evil.example/{i}"
        assert r[6] == evil_bodies[i], i

    payload = b"".join(gz.compress(r) for r in recs)
    for chunk in (5, 1 << 20):
        rows = list(
            _parse_stream(
                "e.warc.gz", _gz_chunks(payload, max_chunk=chunk)
            )
        )
        assert [r[6] for r in rows] == evil_bodies, chunk
