"""S5 CSV source query: a Wikidata-shaped organisations CSV (quoted
commas/doubled quotes/multi-line cells) rendered from the nation view,
ingested with spark.read.csv, and checked against an oracle that derives
the same values relationally (ref organisations/run.sh:13-18 COPY ...
CSV HEADER)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.organisations import read_organisations, render_rows, write_csv
from . import register

_ORACLE = """
SELECT 'Q' || CAST(1000 + n_nationkey AS VARCHAR) AS id,
       n_name || ', "Verkehr"' AS label,
       n_name || ';ALT' AS alternatives,
       n_name || ' GmbH' AS official_name,
       substr(n_name, 1, 3) AS short_name,
       'https://' || lower(n_name) || '.example' AS website,
       CASE WHEN n_nationkey % 2 = 0
            THEN 'info@' || lower(n_name) || '.example' END AS email,
       '+49 ' || CAST(n_nationkey AS VARCHAR) AS phone,
       'Street ' || CAST(n_nationkey AS VARCHAR) || chr(10) || 'City'
         AS address,
       CASE WHEN n_nationkey % 2 = 0 THEN 'operator' ELSE 'authority' END
         AS type
FROM nation
"""


@register("organisations_csv", _ORACLE)
def organisations_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render -> write -> spark.read.csv round-trip. The collect is the
    25-row nation dimension (driver-side render stands in for the curl;
    the SCAN is the operator under test)."""
    nations = [
        (int(r[0]), str(r[1]))
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name")
        .collect()
    ]
    path = write_csv(render_rows(nations))
    return read_organisations(spark, path)
