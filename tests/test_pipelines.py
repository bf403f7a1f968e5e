"""End-to-end golden tests for the reference-parity pipelines, on
reference-shaped synthetic fixtures (FIXTURES.md §1-4): fixed-width death
records, `;`-separated plant CSVs, and the INSEE geo CSV.

Covers the reference's documented edge semantics: unknown INSEE code →
dropped; NaN coordinates → dropped; unparseable dates → dropped; plant
dedup on name; never-throwing multi-format date parse.
"""

from __future__ import annotations

import pytest

from data_eng_project_spark.pipelines import deaths as deaths_mod
from data_eng_project_spark.pipelines.plants import build_power_plants


def _death_line(name: str, birth: str, middle: str, death: str, insee: str) -> str:
    """Compose an exact-width death record (FIXTURES.md §3 layout)."""
    rec = name.ljust(80)[:80] + "1" + birth + middle.ljust(65)[:65] + death + insee
    assert len(rec) == 167
    return rec


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_fixtures")
    (d / "deaths.txt").write_text(
        "\n".join(
            [
                # kept: valid dates + known INSEE code
                _death_line("DOE*JANE/", "19250404", "51582TRIGNY", "20220804", "01007"),
                # dropped: INSEE code not in geo dim (drop-on-miss, Report.md:72)
                _death_line("ROE*RICK/", "19400101", "75001PARIS", "20220101", "99999"),
                # dropped: garbage birth date (to_postgres_date → None)
                _death_line("POE*EDGAR/", "19XX0101", "69001LYON", "20220315", "01007"),
                # dropped: NaN coordinates in geo row
                _death_line("LOE*LISA/", "19350607", "13001MARSEILLE", "20220620", "02002"),
                # kept: second format date is NOT possible in fwf (8 chars) but
                # a valid yyyyMMdd parses
                _death_line("MOE*MARY/", "19550101", "31000TOULOUSE", "20221231", "01007"),
            ]
        )
    )
    (d / "geo.csv").write_text(
        "code_commune_INSEE,latitude,longitude\n"
        "01007,46.1517,4.9306\n"
        "02002,NaN,NaN\n"
        "31555,43.6045,1.444\n"
    )
    nuclear_header = "centrale;fuel;point_gps_wsg84;date_de_mise_en_service_industrielle;puissance_installee;unite"
    (d / "nuclear.csv").write_text(
        f"{nuclear_header}\n"
        "SITE_A;Enriched Uranium;47.508946,2.875676;1988-06-01;1310.0;MW\n"
        "SITE_A;Enriched Uranium;47.508946,2.875676;1990-01-14;1310.0;MW\n"  # dup plant name
        "SITE_B;Enriched Uranium;47.733,-1.18;19830601;880.0;MW\n"  # yyyyMMdd format
        "SITE_C;Enriched Uranium;44.1,5.2;not-a-date;900.0;MW\n"  # dropped: bad date
    )
    (d / "thermal.csv").write_text(
        f"{nuclear_header}\n"
        "SITE_T;Gas;43.4,5.05;2009-10-26;440.0;MW\n"
    )
    return d


def test_deaths_pipeline_golden(spark, fixture_dir):
    out = deaths_mod.run(
        spark, str(fixture_dir / "deaths.txt"), str(fixture_dir / "geo.csv")
    ).orderBy("date_of_death")
    rows = out.collect()
    # Only DOE (valid) and MOE (valid) survive.
    assert len(rows) == 2
    assert all(r.latitude == 46.1517 and r.longitude == 4.9306 for r in rows)
    assert [str(r.date_of_death) for r in rows] == ["2022-08-04", "2022-12-31"]
    assert [str(r.date_of_birth) for r in rows] == ["1925-04-04", "1955-01-01"]
    # ids are sha1 hex of the name field — anonymized, 40 hex chars, unique
    assert all(len(r.id) == 40 and int(r.id, 16) >= 0 for r in rows)
    assert rows[0].id != rows[1].id


def test_deaths_id_is_name_prefix_hash(spark, fixture_dir):
    import hashlib

    out = deaths_mod.run(
        spark, str(fixture_dir / "deaths.txt"), str(fixture_dir / "geo.csv")
    )
    ids = {r.id for r in out.collect()}
    expected = hashlib.sha1("DOE*JANE/".ljust(80)[:80].encode()).hexdigest()
    assert expected in ids


def test_plants_pipeline_golden(spark, fixture_dir):
    out = build_power_plants(
        spark, str(fixture_dir / "nuclear.csv"), str(fixture_dir / "thermal.csv")
    )
    rows = {r.plant_name: r for r in out.collect()}
    # SITE_C dropped (unparseable date); SITE_A deduped to one row.
    assert set(rows) == {"SITE_A", "SITE_B", "SITE_T"}
    a = rows["SITE_A"]
    assert str(a.creation_date) == "1988-06-01"  # first-wins = earliest date
    assert a.plant_type == "NUCLEAR" and rows["SITE_T"].plant_type == "THERMAL"
    # yyyyMMdd variant parsed (multi-format F1 semantics)
    assert str(rows["SITE_B"].creation_date) == "1983-06-01"
    assert rows["SITE_T"].latitude == pytest.approx(43.4)
    # canonical ids: 40-hex, unique
    assert len({r.id for r in rows.values()}) == 3


def test_composer_equals_handwritten_pipeline(spark):
    """The declarative spec and the handwritten composition must select
    the exact same document set."""
    from data_eng_project_spark.pipelines.composer import compose
    from data_eng_project_spark.pipelines.corpus import clean_corpus
    from data_eng_project_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    composed = compose(
        docs,
        [
            {"stage": "lang_filter", "lang": "en"},
            {"stage": "min_words", "n": 20},
            {"stage": "dedup_exact"},
        ],
    )
    hand = clean_corpus(docs, lang="en", min_words=20)
    a = {r.doc_id for r in composed.select("doc_id").collect()}
    b = {r.doc_id for r in hand.select("doc_id").collect()}
    assert a == b and len(a) > 0


def test_composer_transform_and_sample_stages(spark):
    from data_eng_project_spark.pipelines.composer import compose

    docs = spark.createDataFrame(
        [(i, "s", f"text {i} mail u{i}@x.io more") for i in range(200)],
        "doc_id long, source string, text string",
    )
    out = compose(
        docs,
        [
            {"stage": "pii_redact"},
            {"stage": "mixture_sample", "modulus": 100, "keep_lt": 50},
        ],
    )
    rows = out.collect()
    assert 0 < len(rows) < 200  # deterministic downsample kept a strict subset
    assert all("[EMAIL]" in r.text for r in rows)
    # re-running yields the identical set (hash-mod, not rand())
    again = {r.doc_id for r in compose(docs, [{"stage": "pii_redact"}, {"stage": "mixture_sample", "modulus": 100, "keep_lt": 50}]).collect()}
    assert again == {r.doc_id for r in rows}


def test_composer_unknown_stage_raises(spark):
    from data_eng_project_spark.pipelines.composer import compose

    docs = spark.createDataFrame([(1, "s", "x")], "doc_id long, source string, text string")
    with pytest.raises(KeyError, match="unknown stage"):
        compose(docs, [{"stage": "nope"}])
