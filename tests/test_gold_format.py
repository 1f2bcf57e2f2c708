"""Raw-gold formatting: wide vendor rows -> long normalized gold tuples
(the reference's format_gold.py/normalizers.py behavior, columnar)."""

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.sources.gold_format import format_gold

WIDE = ("doc_name string, part_family string, part_num string, "
        "manufacturer string, polarity string, ce_v_max string, "
        "cb_v_max string, eb_v_max string, c_current_max string, "
        "dev_dissipation string, stg_temp_min string, stg_temp_max string, "
        "dc_gain_min string, notes string, annotator string")


def _row(**kw):
    base = dict(doc_name="ds1.pdf", part_family="Y", part_num="bc 547",
                manufacturer=" Fairchild ", polarity="NPN",
                ce_v_max="45 V", cb_v_max="50 V", eb_v_max="6 V",
                c_current_max="100 mA", dev_dissipation="625 mW",
                stg_temp_min="-55 C", stg_temp_max="150 C",
                dc_gain_min="110 @ 2V", notes="", annotator="x")
    base.update(kw)
    return tuple(base.values())


def test_format_gold_normalizers(spark):
    raw = spark.createDataFrame([_row()], WIDE)
    out = {(r["attribute"]): r for r in format_gold(raw).collect()}
    any_r = next(iter(out.values()))
    assert any_r["filename"] == "ds1"            # .pdf stripped
    assert any_r["part"] == "BC547"              # upper, no spaces
    assert any_r["manuf"] == "Fairchild"         # trimmed
    assert out["ce_v_max"]["value"] == "45"      # unit dropped
    assert out["stg_temp_min"]["value"] == "-55" # temp KEEPS sign
    assert out["dc_gain_min"]["value"] == "110"  # pre-@ token
    assert out["polarity"]["value"] == "NPN"
    assert out["c_current_max"]["value"] == "100"


def test_format_gold_multivalue_na_and_dedup(spark):
    rows = [
        _row(ce_v_max="-30 V;65 V"),             # two rows, signs dropped
        _row(ce_v_max="N/A;45 V"),               # whole CELL skipped
        _row(part_family="N/A", polarity="npn"), # family skip, bad polarity
        _row(),                                  # exact dup of defaults
        _row(),
    ]
    raw = spark.createDataFrame(rows, WIDE)
    out = format_gold(raw)
    ce = sorted(r["value"] for r in
                out.filter(F.col("attribute") == "ce_v_max").collect())
    assert ce == ["30", "45", "65"]              # 45 from defaults only once
    assert out.filter(F.col("attribute") == "polarity").count() == 1
    fam = [r["value"] for r in
           out.filter(F.col("attribute") == "part_family").collect()]
    assert fam == ["Y"]
    # tuple-level dedup: no duplicate rows anywhere
    assert out.count() == out.distinct().count()


def test_format_gold_voltage_k_expansion(spark):
    raw = spark.createDataFrame([_row(ce_v_max="1K V")], WIDE)
    v = format_gold(raw).filter(F.col("attribute") == "ce_v_max") \
        .collect()[0]["value"]
    assert v == "1000"                           # K -> 000, reference-style


def test_format_gold_feeds_the_pipeline_schema(spark):
    """The formatter's output is exactly the gold schema run_kbc scores
    against (filename, manuf, part, attribute, value)."""
    raw = spark.createDataFrame([_row()], WIDE)
    assert format_gold(raw).columns == [
        "filename", "manuf", "part", "attribute", "value"]
