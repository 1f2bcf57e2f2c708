"""The curation funnel: each stage drops exactly the planted offender."""

import json

import pyspark.sql.functions as F

from tecs_hardware_kbc_spark.curate import curate

# each surviving doc gets its OWN vocabulary — a shared long prefix
# would make every doc a minhash near-dup of doc 0 and collapse the
# whole fixture into one component
D0 = ("the steady river flows to the sea and the boats are of the water "
      "with a calm wind for days ") * 6
D5 = ("the market opens at dawn and the traders shout in the square "
      "with a loud voice for hours ") * 6
D6 = ("the garden grows in spring and the flowers bloom for the bees "
      "with a bright sun for weeks ") * 6


def _docs(spark):
    rows = [
        (0, D0 + "zero marker words here"),              # survives
        (1, D0 + "zero marker words here"),              # exact dup of 0
        (2, D0 + "zero marker words here appended"),     # near-dup of 0
        # identifies as English (the 'the') but low quality: short,
        # symbol-heavy -> len/alpha components sink it below the gate
        (3, "the @@@@ ##### $$$$$ %%%% !!!! " * 4),
        (4, ("der die das und ist nicht ein kein hier mit immer "
             "wieder ") * 8),                            # German
        (5, D5 + "one two three four five six seven eight tail"),
                                                         # contaminated
        (6, D6 + "contact me at bob@example.com thanks"),  # PII
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_curate_funnel(spark):
    bench = spark.createDataFrame(
        [(100, "one two three four five six seven eight nine ten")],
        "doc_id int, text string")
    curated, funnel = curate(
        spark, _docs(spark), benchmark=bench, min_quality=0.75,
        langs=["en"], splits={"train": 2, "val": 1, "test": 1})

    rows = {r["doc_id"]: r for r in curated.collect()}
    # doc 0 survives; 1 exact-dup'd; 2 near-dup'd; 3 quality; 4 lang;
    # 5 decontaminated; 6 survives with redacted text
    assert set(rows) == {0, 6}
    assert "[PII]" in rows[6]["text"]
    assert "bob@example.com" not in rows[6]["text"]
    assert "@" not in rows[6]["text"]
    assert rows[0]["text"].startswith("the steady")  # untouched content
    assert all(r["split"] in ("train", "val", "test")
               for r in rows.values())

    assert funnel["input"] == 7
    assert funnel["exact_dedup"] == 6          # doc 1 gone
    assert funnel["near_dedup"] == 5           # doc 2 gone
    assert funnel["lang_filter"] == 4          # doc 4 gone
    assert funnel["quality_gate"] == 3         # doc 3 gone
    assert funnel["decontaminated"] == 2       # doc 5 gone
    assert funnel["output"] == 2
    json.dumps(funnel)  # CLI-serializable


def test_curate_cli(spark, tmp_path, capsys):
    from tecs_hardware_kbc_spark.__main__ import main

    docs = _docs(spark)
    docs.write.mode("overwrite").parquet(str(tmp_path / "docs"))
    rc = main(["curate", "--docs", str(tmp_path / "docs"),
               "--out", str(tmp_path / "out"), "--langs", "en"])
    assert rc == 0
    funnel = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert funnel["input"] == 7 and funnel["output"] >= 2
    out = spark.read.parquet(str(tmp_path / "out"))
    assert "split" in out.columns
    assert out.count() == funnel["output"]


def test_curate_optional_stages(spark):
    """paragraph dedup + Gopher gate drop exactly their offenders."""
    boiler = "subscribe to our newsletter for updates every week"
    rows = [
        (0, D0 + "zero marker words here\n\n" + boiler),
        (1, D5 + "one marker tail\n\n" + boiler),     # loses the banner
        (2, boiler),                                  # ALL boilerplate
        (3, D6 + " #### " * 30),                      # symbol ratio > 0.1
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    curated, funnel = curate(
        spark, docs, min_quality=0.0, dedup_paragraphs=True,
        gopher_rules=True, gopher_kwargs={"min_words": 20})

    out = {r["doc_id"]: r for r in curated.collect()}
    # 0 keeps the banner (first occurrence); 1 survives minus banner;
    # 2 reduced to nothing by paragraph dedup; 3 killed by Gopher
    assert set(out) == {0, 1}
    assert boiler in out[0]["text"]
    assert boiler not in out[1]["text"]
    assert funnel["input"] == 4
    assert funnel["para_dedup"] == 3      # doc 2 dropped (empty)
    assert funnel["gopher_gate"] == 2     # doc 3 dropped (symbols)
    assert funnel["output"] == 2


def test_curate_lm_perplexity_gate(spark):
    """The CCNet LM gate drops exactly the out-of-domain doc: an LM
    trained on clean prose keeps in-domain docs and kills gibberish."""
    from tecs_hardware_kbc_spark.operators.ngram_lm import train_ngram_lm

    ref = spark.createDataFrame(
        [(i, D0) for i in range(4)] + [(4, D5), (5, D6)],
        "doc_id int, text string")
    lm = train_ngram_lm(ref, n=2)
    rows = [
        (0, D0 + "zero marker words here"),               # in-domain
        (1, D5 + "one marker tail words"),                # in-domain
        (2, ("zxq vbnm qwerty plok mnbv xswz qazx edcr tgbv yhnm "
             "ujmk iolp wsad " * 8)),                     # gibberish
        (3, "solo"),                                      # unscored: kept
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    curated, funnel = curate(
        spark, docs, min_quality=0.0, ngram_lm=lm,
        max_perplexity=float(lm.vocab_size) / 2)

    out = {r["doc_id"] for r in curated.collect()}
    assert out == {0, 1, 3}
    assert funnel["lm_perplexity"] == 3
    assert funnel["output"] == 3
