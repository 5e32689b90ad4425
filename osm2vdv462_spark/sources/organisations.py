"""Organisations CSV source (S5).

The reference downloads a Wikidata SPARQL result as CSV and COPYs it into
Postgres (/root/reference/pipeline/organisations/run.sh:13-18, table DDL
setup/sql/02_setup.sql:10-21). The Spark-first equivalent is a plain
``spark.read.csv`` with an explicit schema — header row, quoted fields
with embedded commas/quotes, and multi-line address cells (all of which
real Wikidata output contains).

``fetch_csv`` stands in for the HTTP download (hermetic sandbox rule: no
external services): it renders the same CSV shape deterministically from
a seed DataFrame. On a real cluster the written path would be
HDFS/S3/DBFS; local-mode shares one filesystem so a temp dir suffices.
"""

from __future__ import annotations

import csv
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

ORGANISATIONS_SCHEMA = (
    "id string, label string, alternatives string, official_name string,"
    " short_name string, website string, email string, phone string,"
    " address string, type string"
)

_HEADER = [
    "id", "label", "alternatives", "official_name", "short_name",
    "website", "email", "phone", "address", "type",
]


def render_rows(nations: list[tuple[int, str]]) -> list[list]:
    """Deterministic Wikidata-shaped organisation rows from (key, name)
    seeds. Cells deliberately contain commas, double quotes, and
    newlines so the CSV reader's quoting/multiLine handling is what's
    actually under test."""
    out = []
    for key, name in nations:
        out.append([
            f"Q{1000 + key}",
            f'{name}, "Verkehr"',          # embedded comma + quotes
            f"{name};ALT",
            f"{name} GmbH",
            name[:3],
            f"https://{name.lower()}.example",
            None if key % 2 == 1 else f"info@{name.lower()}.example",
            f"+49 {key}",
            f"Street {key}\nCity",          # embedded newline
            "operator" if key % 2 == 0 else "authority",
        ])
    return out


def write_csv(rows: list[list], path: str | None = None) -> str:
    if path is None:
        path = os.path.join(
            tempfile.mkdtemp(prefix="organisations_"), "organisations.csv"
        )
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f, quoting=csv.QUOTE_MINIMAL)
        w.writerow(_HEADER)
        for r in rows:
            w.writerow(["" if v is None else v for v in r])
    return path


def read_organisations(spark: SparkSession, path: str) -> DataFrame:
    """COPY ... CSV HEADER equivalent: schema-pinned csv scan. multiLine
    handles quoted newlines; escape='"' matches RFC-4180 doubled quotes
    (Python csv and Wikidata both emit that form)."""
    return spark.read.csv(
        path,
        schema=ORGANISATIONS_SCHEMA,
        header=True,
        multiLine=True,
        quote='"',
        escape='"',
        nullValue="",
    )
