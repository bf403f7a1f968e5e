"""HTTP dataset ingestion (reference S1-S5, SURVEY.md §2.1).

The reference pulls four public datasets over HTTP before staging them:
curl of dataset-metadata JSON (``dags/global_dag.py:283-287,298-302``),
a Python metadata GET that dumps the ``resources`` array to a JSON file
(``pull_death_file_list``, ``:223-233``), format-filtered resource
downloads (``pull_nuclear_plants`` ``:258-271``, ``pull_thermal_plants_
data`` ``:171-185``), a bounded multi-file download (``pull_all_death_
files(max_resource=5)`` ``:236-255``), and a static CSV curl
(``:331-335``) — with one retry / 10 s delay configured DAG-wide
(``:37-38``).

Spark-first framing: fetching is CONTROL PLANE. The resource list is
dozens of metadata rows, so the download loop is a driver concern by
design (exactly like the reference's); everything downstream of the
landed files — scanning, cleaning, joining — is distributed. At 100 TB
the "download" step is files landing in object storage out-of-band and
this module degenerates to the resource-list bookkeeping; the landed
paths feed ``spark.read`` unchanged.

Offline testability (the reference's own course requirement,
``README.md:25``): everything goes through ``urllib``, which serves
``file://`` URLs with the same code path as ``http(s)://`` — tests
exercise retry/filter/limit semantics against local fixtures with zero
network.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fetch_url(
    url: str,
    dest_path: str,
    retries: int = 1,
    retry_delay_s: float = 10.0,
    timeout_s: float = 30.0,
) -> str:
    """Download one URL to a local file (reference S1/S5 curl tasks),
    with the reference's retry posture (1 retry / 10 s,
    ``dags/global_dag.py:37-38``). Returns ``dest_path``.

    Supports ``http(s)://`` and ``file://`` schemes — the latter is the
    offline-fixture path the tests use.
    """
    last_err: Exception | None = None
    # Land atomically: stream to a .part sibling and os.replace() on
    # success, so a mid-stream failure never leaves a truncated file at
    # the final destination for directory-scanning consumers (ledger
    # discovery, spark.read globs) to ingest as if complete.
    part = dest_path + ".part"
    for attempt in range(retries + 1):
        try:
            with urllib.request.urlopen(url, timeout=timeout_s) as resp:
                os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
                with open(part, "wb") as out:
                    while chunk := resp.read(1 << 20):
                        out.write(chunk)
            os.replace(part, dest_path)
            return dest_path
        except (urllib.error.URLError, OSError) as e:  # noqa: PERF203
            last_err = e
            if os.path.exists(part):
                os.remove(part)
            if attempt < retries:
                time.sleep(retry_delay_s)
    raise OSError(f"fetch failed after {retries + 1} attempts: {url}") from last_err


def pull_resource_list(
    spark: SparkSession,
    metadata_url: str,
    out_json_path: str,
    retries: int = 1,
    retry_delay_s: float = 10.0,
) -> DataFrame:
    """Fetch dataset metadata and persist its ``resources`` array as a
    JSON file (reference ``pull_death_file_list``,
    ``dags/global_dag.py:223-233``); returns the resources as a
    DataFrame (format, latest, title) for filtering/limiting.
    """
    from data_eng_project_spark.sources.readers import read_resources_json

    tmp = out_json_path + ".fetch"
    fetch_url(metadata_url, tmp, retries=retries, retry_delay_s=retry_delay_s)
    with open(tmp, encoding="utf-8") as f:
        meta = json.load(f)
    os.remove(tmp)
    with open(out_json_path, "w", encoding="utf-8") as f:
        json.dump({"resources": meta.get("resources", [])}, f)
    return read_resources_json(spark, out_json_path)


def download_resources(
    resources: DataFrame,
    dest_dir: str,
    fmt: str | None = "csv",
    limit: int | None = None,
    retries: int = 1,
    retry_delay_s: float = 10.0,
) -> list[str]:
    """Format-filtered, optionally bounded resource download (reference
    S3/S4: ``pull_nuclear_plants`` filters ``format=='csv'``;
    ``pull_all_death_files`` stops at ``max_resource``). Returns the
    local paths, ready for a distributed ``spark.read`` scan.

    The collect() here is deliberate and metadata-sized: resource lists
    are O(dozens) rows (the reference's largest is the death-file list).
    Payload bytes never pass through the driver loop as data — they land
    as files for executors to scan.
    """
    df = resources
    if fmt is not None:
        df = df.filter(F.col("format") == fmt)
    df = df.orderBy("title")  # deterministic download order
    if limit is not None:
        df = df.limit(limit)
    rows = df.select("latest", "title").collect()
    os.makedirs(dest_dir, exist_ok=True)
    out: list[str] = []
    seen: set[str] = set()
    for i, r in enumerate(rows):
        # Unique, sandboxed filenames: URL basenames collide for
        # '.../res/<id>/download'-shaped APIs (every resource ends in
        # 'download' and the later fetch would silently overwrite the
        # earlier), and a '/' in a title fallback would escape dest_dir
        # — so sanitize, and prefix the ordinal on any repeat.
        raw = os.path.basename(urlparse(r["latest"]).path) or r["title"] or "resource"
        name = "".join(c if c.isalnum() or c in "._-" else "_" for c in raw)
        if name in seen:
            name = f"{i:04d}_{name}"
        seen.add(name)
        dest = os.path.join(dest_dir, name)
        fetch_url(r["latest"], dest, retries=retries, retry_delay_s=retry_delay_s)
        out.append(dest)
    return out
