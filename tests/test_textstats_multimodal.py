"""Text analysis + multimodal plumbing unit tests."""

import pyspark.sql.functions as F
import pytest

from tecs_hardware_kbc_spark.operators.multimodal import (
    extract_media_features,
    frame_sample,
    resize_spec,
    size_filter,
)
from tecs_hardware_kbc_spark.operators.textstats import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "The cat and the dog are friends in the house."),
            (1, "Der Hund ist nicht hier und das ist gut."),
            (2, "le chat est dans la maison et il dort pas mal."),
            (3, "zzz qqq 12345 !!!"),
        ],
        "doc_id long, text string",
    ).cache()


def test_token_stats(spark, docs):
    r = {x["doc_id"]: x for x in token_stats(docs).collect()}
    assert r[0]["n_words"] == 10
    assert r[0]["n_chars"] == 45
    assert r[0]["n_unique_words"] == 8  # 'the' x3 collapses
    assert r[3]["n_tokens"] == 6  # zzz, qqq, 12345, !, !, !


def test_language_id(spark, docs):
    r = {x["doc_id"]: x["lang_pred"] for x in language_id(docs).collect()}
    assert r[0] == "en" and r[1] == "de" and r[2] == "fr"
    assert r[3] == "und"


def test_quality_score_orders_garbage_last(spark, docs):
    r = {x["doc_id"]: x["quality"] for x in quality_score(docs).collect()}
    assert r[0] > r[3]
    assert 0.0 <= min(r.values()) and max(r.values()) <= 1.0


def test_fingerprint(spark, docs):
    r = {x["doc_id"]: x for x in fingerprint(docs).collect()}
    assert r[0]["fp_md5"] != r[1]["fp_md5"]
    assert len(r[0]["fp_set"]) <= 4
    assert r[0]["fp_set"] == sorted(r[0]["fp_set"])


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", None, "image", b"\x89PNG-fake-bytes-1", "image/png"),
        ("m2", None, "video", b"\x00\x00ftyp-fake-movie", "video/mp4"),
        ("m3", None, "image", b"tiny", "image/png"),
    ]
    return spark.createDataFrame(
        rows, "media_id string, url string, kind string, content binary, "
              "mime string")


def test_media_feature_extraction(spark, media):
    feats = extract_media_features(media).collect()
    assert len(feats) == 3
    by_id = {r["media_id"]: r for r in feats}
    assert by_id["m1"]["kind"] == "image" and by_id["m1"]["n_frames"] == 1
    assert by_id["m2"]["kind"] == "video" and by_id["m2"]["n_frames"] >= 1
    assert len(by_id["m1"]["features"]) == 8
    # deterministic: same bytes -> same features
    feats2 = {r["media_id"]: r["features"]
              for r in extract_media_features(media).collect()}
    assert feats2["m1"] == by_id["m1"]["features"]


def _tiny_png(w: int = 7, h: int = 5) -> bytes:
    """A real, minimal grayscale PNG built with stdlib zlib only."""
    import struct
    import zlib

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * w for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_header_parse_real_dimensions():
    """The header-parse tier reads REAL dimensions from valid containers
    and rejects everything else (stub path keeps its md5 dims)."""
    from tecs_hardware_kbc_spark.operators.multimodal import (
        _parse_image_header, decode_media)
    assert _parse_image_header(_tiny_png(7, 5)) == (7, 5)
    import struct
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 4
    assert _parse_image_header(gif) == (12, 34)
    assert _parse_image_header(b"\x89PNG-fake-bytes-1") is None
    assert _parse_image_header(b"plain text payload") is None
    d = decode_media(_tiny_png(300, 200), "image")
    assert (d["width"], d["height"]) == (300, 200)
    assert len(d["features"]) == 8  # stub features unless PIL is present


def test_header_parse_jpeg_sof():
    """JPEG: dimensions live in the first SOFn segment; the scanner must
    skip APP0/DQT/COM segments (and tolerate a missing SOF)."""
    import struct

    from tecs_hardware_kbc_spark.operators.multimodal import (
        _parse_image_header)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
            + payload

    app0 = seg(0xE0, b"JFIF\x00" + b"\x00" * 9)
    dqt = seg(0xDB, b"\x00" + b"\x01" * 64)
    com = seg(0xFE, b"a comment")
    sof0 = seg(0xC0, b"\x08" + struct.pack(">HH", 480, 640) + b"\x03"
               + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01")
    jpeg = b"\xff\xd8" + app0 + dqt + com + sof0 + b"\xff\xd9"
    assert _parse_image_header(jpeg) == (640, 480)  # (width, height)
    # DHT (0xC4) must NOT be mistaken for a SOF marker
    dht = seg(0xC4, b"\x00" + b"\x01" * 16)
    jpeg2 = b"\xff\xd8" + app0 + dht + sof0 + b"\xff\xd9"
    assert _parse_image_header(jpeg2) == (640, 480)
    assert _parse_image_header(b"\xff\xd8" + app0 + b"\xff\xd9") is None


def test_header_parse_png_gif_roundtrip_fuzz():
    """Property: any (w, h) in range round-trips through the PNG and GIF
    container builders and the header parser."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tecs_hardware_kbc_spark.operators.multimodal import (
        _parse_image_header)

    @settings(max_examples=60, deadline=None)
    @given(st.integers(1, 2**31 - 1), st.integers(1, 2**31 - 1))
    def png_case(w, h):
        # header-only container (building full pixel rows for 2^31-wide
        # images would be absurd; the parser only reads sig + IHDR)
        hdr = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
               + struct.pack(">II", w, h) + b"\x08\x00\x00\x00\x00")
        assert _parse_image_header(hdr) == (w, h)

    @settings(max_examples=60, deadline=None)
    @given(st.integers(1, 2**16 - 1), st.integers(1, 2**16 - 1))
    def gif_case(w, h):
        payload = b"GIF87a" + struct.pack("<HH", w, h) + b"\x00" * 3
        assert _parse_image_header(payload) == (w, h)

    png_case()
    gif_case()


def test_pil_decode_branch():
    """Exercises the full-PIL tier when the library is installed."""
    pytest.importorskip("PIL")
    from tecs_hardware_kbc_spark.operators.multimodal import _pil_decode
    d = _pil_decode(_tiny_png(7, 5), "image")
    assert d is not None and (d["width"], d["height"]) == (7, 5)
    assert d["n_frames"] == 1 and len(d["features"]) == 8
    assert all(0.0 <= f <= 1.0 for f in d["features"])


def test_media_plans(spark, media):
    feats = extract_media_features(media)
    kept = size_filter(feats, min_px=50)
    assert kept.count() <= 3
    frames = frame_sample(feats, every_n=4)
    assert frames.filter(F.col("frame_idx") < 0).count() == 0
    rs = resize_spec(feats, target=224).collect()
    assert all(min(r["resized_w"], r["resized_h"]) == 224 for r in rs)


def test_redact_pii_counts_and_replacement(spark):
    from tecs_hardware_kbc_spark.operators.textstats import redact_pii

    docs = spark.createDataFrame(
        [(0, "mail a.b-c_9@sub.example.co and x@y.io today"),
         (1, "host 192.168.001.7 then acct 12345678901 end"),
         (2, "clean text with no sensitive content at all"),
         (3, "short 12345678 is fine but 123456789 is not")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r for r in redact_pii(docs).collect()}

    assert rows[0]["n_email"] == 2
    assert rows[0]["redacted"] == "mail [PII] and [PII] today"
    assert rows[1]["n_ipv4"] == 1 and rows[1]["n_long_digits"] == 1
    assert rows[1]["redacted"] == "host [PII] then acct [PII] end"
    assert rows[2]["redacted"] == "clean text with no sensitive content at all"
    assert (rows[2]["n_email"], rows[2]["n_ipv4"],
            rows[2]["n_long_digits"]) == (0, 0, 0)
    # 8-digit run survives, 9-digit run is scrubbed (word-boundary rule)
    assert rows[3]["redacted"] == "short 12345678 is fine but [PII] is not"


def test_repetition_stats_exact_values(spark):
    from tecs_hardware_kbc_spark.operators.textstats import repetition_stats

    d = spark.createDataFrame(
        [
            # 3 lines, one duplicated; "ab cd" 2-gram repeated 3x
            (0, "ab cd ab cd ab cd\nsame line\nsame line"),
            # no repetition at all
            (1, "one two three four five"),
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in repetition_stats(d).collect()}

    assert r[0]["n_lines"] == 3
    assert r[0]["dup_line_frac"] == round(1 / 3, 6)
    # duplicate occurrences beyond the first: one "same line" (9 chars)
    # over total line chars 17 + 9 + 9
    assert r[0]["dup_line_char_frac"] == round(9 / 35, 6)
    # norm text = "ab cd ab cd ab cd same line same line" (37 chars);
    # top 2-gram "ab cd" count 3, len 5 -> 15/37
    assert r[0]["top_2gram_char_frac"] == round(15 / 37, 6)

    assert r[1]["dup_line_frac"] == 0.0
    # every 2-gram occurs once; tie-break -> lexicographically smallest
    # ("four five", 9 chars) over norm length 23
    assert r[1]["top_2gram_char_frac"] == round(
        len("four five") / len("one two three four five"), 6)
    for n in (5, 6, 7, 8, 9, 10):
        assert r[1][f"dup_{n}gram_char_frac"] == 0.0


def test_repetition_top_gram_tiebreak_smallest(spark):
    from tecs_hardware_kbc_spark.operators.textstats import repetition_stats

    # "zz yy" and "aa bb" both appear twice; the smaller gram wins
    d = spark.createDataFrame(
        [(0, "zz yy zz yy qq aa bb aa bb")], "doc_id long, text string")
    row = repetition_stats(d).collect()[0]
    # both candidate 2-grams have len 5, count 2; norm len 26
    assert row["top_2gram_char_frac"] == round(10 / 26, 6)


def test_gopher_quality_each_rule_drops_its_offender(spark):
    from tecs_hardware_kbc_spark.operators.textstats import gopher_quality

    good = ("the cat and the dog have been to the house of that family "
            "and with them be the birds " * 3)
    rows = [
        (0, good),                                    # passes everything
        (1, "the of and that be"),                    # too few words
        (2, good + " ##### ##### ##### ##### #####"
                  " ##### ##### ##### ##### #####"),  # symbol ratio
        (3, "\n".join(["- " + good] * 10)),           # all bullet lines
        (4, "\n".join([good + "..."] * 10)),          # all ellipsis lines
        (5, ("9 8 7 6 5 4 3 2 1 0 " * 10) + good[:40]),  # non-alpha words
        (6, ("walrus penguin otter seal dolphin " * 20)),  # no stopwords
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    r = {x["doc_id"]: x for x in
         gopher_quality(d, min_words=20).collect()}

    assert r[0]["gopher_keep"] is True
    assert r[1]["n_words"] < 20 and r[1]["gopher_keep"] is False
    assert r[2]["symbol_ratio"] > 0.1 and r[2]["gopher_keep"] is False
    assert r[3]["bullet_line_frac"] == 1.0 and r[3]["gopher_keep"] is False
    assert (r[4]["ellipsis_line_frac"] == 1.0
            and r[4]["gopher_keep"] is False)
    assert (r[5]["alpha_word_frac"] < 0.8
            and r[5]["gopher_keep"] is False)
    assert (r[6]["n_req_stopwords"] == 0
            and r[6]["gopher_keep"] is False)
