"""WARC source (sources/warc.py): framing, gzip members, HTTP split,
Spark reader."""

from tecs_hardware_kbc_spark.sources.warc import (
    read_warc, read_warc_cdx, split_warc_records, warc_cdx, warc_pages,
    write_warc)


def _http(status: int, body: str) -> bytes:
    b = body.encode()
    return (f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(b)}\r\n\r\n").encode() + b


def _records():
    return [
        {"warc_type": "warcinfo", "url": "", "warc_ts": "",
         "payload": b"software: test\r\n"},
        {"warc_type": "request", "url": "https://a.com/1",
         "warc_ts": "2024-01-02T03:04:05Z",
         "payload": b"GET /1 HTTP/1.1\r\n\r\n"},
        {"warc_type": "response", "url": "https://a.com/1",
         "warc_ts": "2024-01-02T03:04:05Z",
         "payload": _http(200, "<html><body>Page one</body></html>")},
        {"warc_type": "response", "url": "https://a.com/gone",
         "warc_ts": "2024-01-02T03:04:06Z",
         "payload": _http(404, "<html>nope</html>")},
        {"warc_type": "response", "url": "https://b.co.uk/2",
         "warc_ts": "2024-01-02T03:04:07Z",
         "payload": _http(200, "<html>Zwei\xe2\x82\xac</html>")},
    ]


def test_roundtrip_plain_and_gzip_members():
    for gz in (False, True):
        data = write_warc(_records(), gzip_members=gz)
        recs = list(split_warc_records(data))
        assert [h["warc-type"] for h, _ in recs] == \
            ["warcinfo", "request", "response", "response", "response"]
        pages = list(warc_pages(data))
        assert [p["url"] for p in pages] == \
            ["https://a.com/1", "https://a.com/gone", "https://b.co.uk/2"]
        assert pages[0]["http_status"] == 200
        assert pages[0]["html"] == "<html><body>Page one</body></html>"
        assert pages[1]["http_status"] == 404


def test_truncated_tail_stops_cleanly():
    data = write_warc(_records())
    assert len(list(warc_pages(data[:-40]))) >= 2  # last record dropped
    assert list(warc_pages(b"garbage")) == []


def test_cdx_offsets_random_access():
    # the CDX contract: data[offset:offset+length] re-parses to exactly
    # that one record, in BOTH storage layouts
    for gz in (False, True):
        data = write_warc(_records(), gzip_members=gz)
        idx = list(warc_cdx(data))
        assert [r["warc_type"] for r in idx] == \
            ["warcinfo", "request", "response", "response", "response"]
        for r in idx:
            chunk = data[r["offset"]:r["offset"] + r["length"]]
            sub = list(split_warc_records(chunk))
            assert len(sub) == 1
            assert sub[0][0].get("warc-target-uri", "") == r["url"]
        # extents tile the file exactly in the gzip layout
        if gz:
            assert idx[0]["offset"] == 0
            assert all(idx[i]["offset"] + idx[i]["length"]
                       == idx[i + 1]["offset"] for i in range(len(idx) - 1))


def test_read_warc_cdx_spark(spark, tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(
        write_warc(_records(), gzip_members=True))
    df = read_warc_cdx(spark, str(tmp_path / "*"))
    rows = df.orderBy("offset").collect()
    assert len(rows) == 5
    assert rows[2].url == "https://a.com/1"
    assert rows[2].warc_type == "response"


def test_read_warc_spark(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(write_warc(_records()))
    (tmp_path / "b.warc.gz").write_bytes(
        write_warc([{"warc_type": "response", "url": "https://c.org/3",
                     "warc_ts": "2024-02-03T00:00:00Z",
                     "payload": _http(200, "<html>three</html>")}],
                   gzip_members=True))
    df = read_warc(spark, str(tmp_path / "*")).orderBy("url")
    rows = df.collect()
    assert [r.url for r in rows] == \
        ["https://a.com/1", "https://b.co.uk/2", "https://c.org/3"]
    assert all(r.warc_ts is not None for r in rows)
    assert rows[0].html == "<html><body>Page one</body></html>"
    # 404 filtered by ok_only; keep it when asked
    assert read_warc(spark, str(tmp_path / "*"), ok_only=False).count() == 4
