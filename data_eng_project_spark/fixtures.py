"""Deterministic reference-shaped fixture files (FIXTURES.md §1-4).

The driver's synthetic tables (TESTDATA.md) carry the analytics surface,
but the reference's own inputs — fixed-width death records, ;-separated
plant CSVs, the INSEE geo CSV — have formats the parquet tables can't
represent. This module mints small deterministic files in those exact
formats so the END-TO-END reference pipelines (pipelines/deaths.py,
pipelines/plants.py) can be registered as oracle-checked queries: the
DuckDB oracle re-reads the same files with read_csv + substr and must
reproduce the pipeline's output bit-for-bit.

``ensure_reference_fixtures`` is called at plans-module import so the
files exist before the driver evaluates either side. Content is a pure
function of the loop index — no randomness, no timestamps.
"""

from __future__ import annotations

import os

FIXTURE_DIR = "/tmp/spark_graft_fixtures"


def _death_line(name: str, birth: str, middle: str, death: str, insee: str) -> str:
    """Exact-width 167-char record (FIXTURES.md §3 layout)."""
    rec = name.ljust(80)[:80] + "1" + birth + middle.ljust(65)[:65] + death + insee
    assert len(rec) == 167
    return rec


def _deaths_txt() -> str:
    lines = []
    for i in range(240):
        name = f"NAME{i:03d}*SURNAME{i % 7}/"
        # every 13th record: unparseable birth date (dropped by F1+P4)
        birth = "19XX0101" if i % 13 == 0 else f"19{30 + i % 60:02d}{1 + i % 12:02d}{1 + i % 28:02d}"
        middle = f"{10000 + i}CITY{i % 50}"
        death = f"2022{1 + i % 12:02d}{1 + i % 28:02d}"
        # 80 distinct codes; the geo dim only has 60 → 1/4 drop-on-miss
        insee = f"{1000 + i % 80:05d}"
        lines.append(_death_line(name, birth, middle, death, insee))
    return "\n".join(lines) + "\n"


def _geo_csv() -> str:
    rows = ["code_commune_INSEE,latitude,longitude"]
    for j in range(60):
        if j % 17 == 0:  # NaN coordinates → rows dropped (P4)
            rows.append(f"{1000 + j:05d},NaN,NaN")
        else:
            rows.append(f"{1000 + j:05d},{42 + j * 0.1:.4f},{-1 + j * 0.05:.4f}")
    return "\n".join(rows) + "\n"


_PLANT_HEADER = (
    "centrale;fuel;point_gps_wsg84;date_de_mise_en_service_industrielle;"
    "puissance_installee;unite"
)


def _plant_rows(prefix: str, fuel: str, n: int) -> list[str]:
    rows = []
    for k in range(n):
        if k % 4 == 1:
            date = f"19{70 + k:02d}0{1 + k % 9}15"  # yyyyMMdd variant (F1)
        elif k % 5 == 4:
            date = "not-a-date"  # dropped (P5)
        else:
            date = f"19{80 + k:02d}-0{1 + k % 9}-01"
        rows.append(
            f"{prefix}{k % 7};{fuel};{45 + k * 0.3:.4f},{2 + k * 0.2:.4f};"
            f"{date};{500 + k * 37.5};MW"
        )  # k%7 → deliberate duplicate plant names (A1 first-wins dedup)
    return rows


def ensure_reference_fixtures(directory: str = FIXTURE_DIR) -> str:
    os.makedirs(directory, exist_ok=True)
    files = {
        "deaths.txt": _deaths_txt,
        "geo.csv": _geo_csv,
        "nuclear.csv": lambda: "\n".join([_PLANT_HEADER] + _plant_rows("SITE_N", "Enriched Uranium", 10)) + "\n",
        "thermal.csv": lambda: "\n".join([_PLANT_HEADER] + _plant_rows("SITE_T", "Gas", 6)) + "\n",
    }
    for fname, gen in files.items():
        path = os.path.join(directory, fname)
        if not os.path.exists(path):
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                f.write(gen())
            os.replace(tmp, path)
    return directory
