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


def test_media_plans(spark, media):
    feats = extract_media_features(media)
    kept = size_filter(feats, min_px=50)
    assert kept.count() <= 3
    frames = frame_sample(feats, every_n=4)
    assert frames.filter(F.col("frame_idx") < 0).count() == 0
    rs = resize_spec(feats, target=224).collect()
    assert all(min(r["resized_w"], r["resized_h"]) == 224 for r in rs)
