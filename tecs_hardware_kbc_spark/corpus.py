"""Deterministic synthetic page corpus (FIXTURES.md F1-F4).

Generates Common-Crawl-style rows ``(url, warc_ts, html, text, lang)`` of
datasheet-like HTML plus the jointly-planted gold triples, a part gazetteer,
and a parts-by-doc alias table. Every surface form the reference pipeline
handles is exercised (citations into lukehsiao/tecs-hardware-kbc):

* part naming families — EECA/JEDEC/JIS/house regexes
  (``transistor_matchers.py:82-95``);
* part ranges "BC546 thru BC548" and slash forms "BC546A/B"
  (``transistor_spaces.py:12-144``);
* spec tables with per-variant columns (value vertically aligned with its
  part header — the structural analog of ``is_vert_aligned``);
* storage-temp cells "-55 to 150", ce_v_max "45 V" rows, polarity in the
  ``<h1>``, opamp "1.1 MHz" gain and "±2.3 mA" supply-current rows
  (``opamp_utils.py:197-207`` ± doubling);
* distractor rows (operating temp, junction temp, VCBO, collector current,
  offset voltage) that the matchers/LFs must reject;
* hot-domain URL skew (>=25% of rows on one domain), duplicate urls with a
  later ``warc_ts`` (late re-crawl), and near-duplicate mirrored pages;
* ~3% of gold rows reference values not present on any page (recall
  ceiling < 1.0, as in the reference corpus).

The ``text`` column is produced by THE canonical extractor
(``operators.extract.extract_text``), which is what the byte-identical
invariant asserts.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

from tecs_hardware_kbc_spark.operators.extract import extract_text

DOMAINS = [
    "datasheets.example-hot.com",  # hot domain: ~25% of pages (skew test)
    "semi.acme-components.io",
    "parts.transistor-depot.net",
    "docs.opamp-warehouse.org",
    "archive.chipfinder.dev",
    "cdn.electrocat.co",
    "mirror.partslib.org",
]

MANUFACTURERS = [
    "Fairchild", "ON Semiconductor", "NXP", "STMicroelectronics",
    "Toshiba", "Infineon", "Linear Technology", "Analog Devices",
]

_EECA_PREFIXES = ["BC", "BD", "BF", "BU"]
_HOUSE_PREFIXES = ["TIP", "MPS", "ZTX", "KSC"]
_OPAMP_PREFIXES = ["LT", "AD", "OPA", "MAX"]


@dataclass
class Page:
    url: str
    warc_ts: dt.datetime
    html: bytes
    text: str
    lang: str


@dataclass
class Corpus:
    pages: list[Page] = field(default_factory=list)
    # gold rows: (filename, manuf, part, attribute, value) — schema of the
    # reference gold CSVs (transistor_utils.py:82-83)
    gold: list[tuple[str, str, str, str, str]] = field(default_factory=list)
    gazetteer: list[tuple[str, str]] = field(default_factory=list)  # (part, url)


def doc_key(url: str) -> str:
    """Document identity = uppercased stem of the url path (the Spark analog
    of fonduer's ``document.name.upper()``)."""
    stem = url.rsplit("/", 1)[-1]
    if stem.endswith(".html"):
        stem = stem[:-5]
    return stem.upper()


def _pick_domain(rng: random.Random) -> str:
    return DOMAINS[0] if rng.random() < 0.25 else rng.choice(DOMAINS[1:])


def _part_family(rng: random.Random, kind: str) -> list[str]:
    """A base part plus consecutive-numbered or letter-suffixed variants."""
    if kind == "eeca":
        base = f"{rng.choice(_EECA_PREFIXES)}{rng.randrange(100, 999)}"
    elif kind == "jedec":
        base = f"2N{rng.randrange(1000, 9999)}"
    elif kind == "jis":
        base = f"2S{rng.choice('ABCD')}{rng.randrange(100, 1999)}"
    else:
        base = f"{rng.choice(_HOUSE_PREFIXES)}{rng.randrange(100, 999)}"
    style = rng.random()
    n = rng.choice([1, 2, 3])
    if style < 0.5:  # numeric siblings BC546, BC547, BC548
        # Range expansion (reference transistor_spaces.py:70-73) enumerates
        # by str.replace of the differing digit — which replaces EVERY
        # occurrence. Keep families well-formed for it: the varying last
        # digit must be unique in the part and must not carry.
        last = int(base[-1])
        if last + n - 1 > 9 or base.count(base[-1]) != 1:
            return _part_family(rng, kind)
        return [f"{base[:-1]}{last + i}" for i in range(n)]
    # letter-suffix siblings BC546A, BC546B — same uniqueness constraint on
    # the suffix letters (e.g. 2SA123A would corrupt under replace("A", ...))
    if n > 1 and any(chr(ord("A") + i) in base for i in range(n)):
        return _part_family(rng, kind)
    return [base] if n == 1 else [f"{base}{chr(ord('A') + i)}" for i in range(n)]


def _range_expr(rng: random.Random, family: list[str]) -> str:
    """A prose surface form implying the whole family (exercises P6)."""
    if len(family) == 1:
        return family[0]
    joiner = rng.choice([" thru ", " to ", " ~ ", " - "])
    if rng.random() < 0.4 and all(f[:-1] == family[0][:-1] for f in family):
        # slash suffix form: BC546A/B
        return family[0] + "/" + "/".join(f[-1] for f in family[1:])
    return f"{family[0]}{joiner}{family[-1]}"


def _transistor_page(rng: random.Random, family: list[str], manuf: str,
                     corpus: Corpus, noise: bool) -> tuple[str, list[tuple]]:
    polarity = rng.choice(["NPN", "PNP"])
    t_min = rng.choice([-55, -65, -50, -60])
    t_max = rng.choice([150, 150, 175, 200])
    ce_vals = [rng.choice([30, 40, 45, 60, 65, 80]) for _ in family]
    ic_ma = rng.choice([100, 500, 800])
    with_junction = rng.random() < 0.3
    with_complement = rng.random() < 0.15
    comp_part = None
    if with_complement:
        comp_part = f"{family[0][:2]}{rng.randrange(100, 999)}"

    range_expr = _range_expr(rng, family)
    per_variant_cols = rng.random() < 0.5 and len(family) > 1

    head_cols = family if per_variant_cols else [range_expr]
    val_cols = ce_vals if per_variant_cols else [ce_vals[0]]
    if not per_variant_cols:
        ce_vals = [ce_vals[0]] * len(family)

    def row(param: str, symbol: str, values: list, unit: str) -> str:
        cells = "".join(f"<td>{v}</td>" for v in values)
        return f"<tr><td>{param}</td><td>{symbol}</td>{cells}<td>{unit}</td></tr>"

    header = (
        "<tr><th>Parameter</th><th>Symbol</th>"
        + "".join(f"<th>{p}</th>" for p in head_cols)
        + "<th>Unit</th></tr>"
    )
    nvals = len(head_cols)
    rows = [
        header,
        row("Collector-Emitter Voltage", "VCEO", val_cols, "V"),
        row("Collector-Base Voltage", "VCBO", [v + 15 for v in val_cols], "V"),
        row("Collector Current", "IC", [ic_ma] * nvals, "mA"),
        row("Storage Temperature", "Tstg", [f"{t_min} to {t_max}"] * nvals, "°C"),
        row("Operating Temperature", "Topr", ["-40 to 125"] * nvals, "°C"),
    ]
    if with_junction:
        rows.insert(4, row("Junction Temperature", "TJ", [175] * nvals, "°C"))

    prose = (
        f"<p>{range_expr} are {polarity} silicon epitaxial planar transistors "
        f"designed for general purpose switching and amplification.</p>"
    )
    comp_html = (
        f"<p>Complementary to the {comp_part} series.</p>" if with_complement else ""
    )
    html = (
        f"<html><head><title>{family[0]} Datasheet - {manuf}</title></head><body>"
        f"<h1>{family[0]} {polarity} Silicon Transistor</h1>"
        f"{prose}{comp_html}"
        f"<table>{''.join(rows)}</table>"
        f"</body></html>"
    )

    gold: list[tuple] = []
    doc = family[0].upper()
    for part, ce in zip(family, ce_vals):
        part = part.upper()
        plant = [
            ("polarity", polarity),
            ("stg_temp_min", str(t_min)),
            ("stg_temp_max", str(t_max)),
            ("ce_v_max", str(ce)),
        ]
        for attr, val in plant:
            gold.append((doc, manuf, part, attr, val))
            if noise and rng.random() < 0.03:
                # recall ceiling: gold knows a variant the page never
                # mentions (unrecoverable -> FN only, like the reference's
                # candidate-stage recall ceiling). The "Z" prefix keeps it
                # out of reach of prefix alias-widening too.
                gold.append((doc, manuf, "Z" + part, attr, val))
    return html, gold


def _opamp_page(rng: random.Random, part: str, manuf: str,
                noise: bool) -> tuple[str, list[tuple]]:
    gbp_mhz = rng.choice([0.5, 1.1, 2.2, 4.5, 8.0, 10.0])
    pm = rng.random() < 0.4
    if pm:
        cur_val, cur_unit = rng.choice([1.1, 2.3, 4.5]), "mA"
    else:
        cur_val, cur_unit = rng.choice([230, 450, 950]), "µA"
    cur_span = f"±{cur_val}" if pm else f"{cur_val}"

    def row(param: str, symbol: str, value, unit: str) -> str:
        return (f"<tr><td>{param}</td><td>{symbol}</td>"
                f"<td>{value}</td><td>{unit}</td></tr>")

    html = (
        f"<html><head><title>{part} Datasheet - {manuf}</title></head><body>"
        f"<h1>{part} Low Power Operational Amplifier</h1>"
        f"<p>The {part} is a precision operational amplifier optimized for "
        f"low supply current and wide bandwidth.</p>"
        f"<table>"
        f"<tr><th>Parameter</th><th>Symbol</th><th>Typ</th><th>Unit</th></tr>"
        f"{row('Gain Bandwidth Product', 'GBP', gbp_mhz, 'MHz')}"
        f"{row('Supply Current', 'Is', cur_span, cur_unit)}"
        f"{row('Slew Rate', 'SR', 0.4, 'V/µs')}"
        f"{row('Input Offset Voltage', 'Vos', 50, 'µV')}"
        f"</table></body></html>"
    )

    doc = part.upper()
    # gold values in display units matching the reference's output rescale
    # (kHz for gain, µA for current — hack/opamps/opamps.py:47-49), with ±
    # doubling (opamp_utils.py:197-207).
    gbp_khz = int(gbp_mhz * 1000)
    gold = [(doc, manuf, doc, "typ_gbp", str(gbp_khz))]
    cur_ua = cur_val * (1000 if cur_unit == "mA" else 1)
    currents = [cur_ua, 2 * cur_ua] if pm else [cur_ua]
    for c in currents:
        c_str = str(int(c)) if float(c) == int(c) else str(c)
        gold.append((doc, manuf, doc, "typ_supply_current", c_str))
    if noise and rng.random() < 0.03:
        gold.append((doc, manuf, doc, "typ_gbp", "31415"))
    return html, gold


def generate_corpus(n_pages: int = 100, seed: int = 42,
                    noise: bool = True) -> Corpus:
    """Deterministic corpus of ``n_pages`` primary pages (plus duplicate /
    re-crawl rows on top, ~8%)."""
    rng = random.Random(seed)
    corpus = Corpus()
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    seen_parts: set[str] = set()

    for i in range(n_pages):
        manuf = rng.choice(MANUFACTURERS)
        domain = _pick_domain(rng)
        is_opamp = rng.random() < 0.4
        if is_opamp:
            part = f"{rng.choice(_OPAMP_PREFIXES)}{rng.randrange(1000, 9999)}"
            while part in seen_parts:
                part = f"{rng.choice(_OPAMP_PREFIXES)}{rng.randrange(1000, 9999)}"
            html, gold = _opamp_page(rng, part, manuf, noise)
            family = [part]
        else:
            family = _part_family(rng, rng.choice(["eeca", "jedec", "jis", "house"]))
            while family[0] in seen_parts:
                family = _part_family(rng, rng.choice(["eeca", "jedec", "jis", "house"]))
            html, gold = _transistor_page(rng, family, manuf, corpus, noise)
        seen_parts.update(family)

        url = f"https://{domain}/{family[0].lower()}.html"
        ts = base_ts + dt.timedelta(minutes=i * 17 % 50000)
        html_b = html.encode("utf-8")
        corpus.pages.append(Page(url, ts, html_b, extract_text(html_b), "en"))
        corpus.gold.extend(gold)
        for p in family:
            corpus.gazetteer.append((p.upper(), url))

        # late re-crawl: same url, later ts, identical content (ingest should
        # keep exactly one row per url)
        if rng.random() < 0.05:
            corpus.pages.append(
                Page(url, ts + dt.timedelta(days=30), html_b,
                     extract_text(html_b), "en")
            )
        # mirrored page on another domain with a DIFFERENT url stem: its doc
        # key only unifies with the original through connected-components
        # canonicalization over content-identity alias edges — without it,
        # every mirror triple is a precision hit. No extra gold is planted.
        if rng.random() < 0.06:
            mdomain = rng.choice([d for d in DOMAINS if d != domain])
            murl = f"https://{mdomain}/{family[0].lower()}-m.html"
            corpus.pages.append(
                Page(murl, ts + dt.timedelta(days=3), html_b,
                     extract_text(html_b), "en")
            )

    # a few non-English rows (lang filter test): no gold planted
    for j, lang in enumerate(["de", "zh", "fr"]):
        html = (f"<html><body><h1>Übersicht {j}</h1><p>Kein Datenblatt hier."
                f"</p></body></html>").encode("utf-8")
        url = f"https://{rng.choice(DOMAINS)}/misc-{lang}-{j}.html"
        corpus.pages.append(
            Page(url, base_ts + dt.timedelta(days=j), html,
                 extract_text(html), lang)
        )

    # gazetteer gains extra dictionary-only parts (like the Digi-Key CSV's
    # 11,620 rows, transistor_matchers.py:21-31)
    for _ in range(max(50, n_pages // 2)):
        fam = _part_family(rng, rng.choice(["eeca", "jedec", "jis", "house"]))
        for p in fam:
            if p not in seen_parts:
                corpus.gazetteer.append(
                    (p.upper(), f"https://www.digikey.example/{p.lower()}")
                )
    return corpus


def corpus_to_dataframes(spark, corpus: Corpus):
    """Materialize the corpus as (pages, gold, gazetteer) DataFrames."""
    import pyspark.sql.types as T

    pages_schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ])
    pages = spark.createDataFrame(
        [(p.url, p.warc_ts, p.html, p.text, p.lang) for p in corpus.pages],
        schema=pages_schema,
    )
    gold = spark.createDataFrame(
        corpus.gold, schema="filename string, manuf string, part string, "
                            "attribute string, value string",
    )
    gaz = spark.createDataFrame(
        corpus.gazetteer, schema="part string, url string"
    )
    return pages, gold, gaz


def write_corpus(spark, out_dir: str, n_pages: int = 100, seed: int = 42,
                 noise: bool = True) -> None:
    """Write pages/gold/gazetteer parquet under ``out_dir`` (bench input)."""
    corpus = generate_corpus(n_pages=n_pages, seed=seed, noise=noise)
    pages, gold, gaz = corpus_to_dataframes(spark, corpus)
    pages.repartition(max(spark.sparkContext.defaultParallelism, 8)) \
        .write.mode("overwrite").parquet(f"{out_dir}/pages.parquet")
    gold.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/gold.parquet")
    gaz.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/gazetteer.parquet")
