"""S5 CSV source query: a Wikidata-shaped organisations CSV (quoted
commas/doubled quotes/multi-line cells) rendered from the nation view,
ingested with spark.read.csv, and checked against an oracle that derives
the same values relationally (ref organisations/run.sh:13-18 COPY ...
CSV HEADER)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators._guard import collect_dim
from ..sources.organisations import read_organisations, render_rows, write_csv
from . import register, register_extra


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _nation_rows(spark: SparkSession, sf_dir: str) -> list[tuple[int, str]]:
    return [
        (int(r[0]), str(r[1]))
        for r in collect_dim(
            spark.read.parquet(f"{sf_dir}/nation.parquet").select(
                "n_nationkey", "n_name"
            ),
            "nation dim (CSV render)",
        )
    ]

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
    nations = _nation_rows(spark, sf_dir)
    path = write_csv(render_rows(nations))
    return read_organisations(spark, path)


# XML escaping as DuckDB SQL (mirror of functions/xmlbuild.py::esc)
def _esc(expr: str) -> str:
    return (
        "replace(replace(replace(replace(" + expr + ","
        " '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '\"', '&quot;')"
    )


_ORG_XML_ORACLE = f"""
WITH o AS (
  SELECT 'Q' || CAST(1000 + n_nationkey AS VARCHAR) AS id,
         n_name || ', "Verkehr"' AS label,
         n_name || ' GmbH' AS official_name,
         substr(n_name, 1, 3) AS short_name,
         'https://' || lower(n_name) || '.example' AS website,
         CASE WHEN n_nationkey % 2 = 0
              THEN 'info@' || lower(n_name) || '.example' END AS email,
         '+49 ' || CAST(n_nationkey AS VARCHAR) AS phone,
         CASE WHEN n_nationkey % 2 = 0 THEN 'operator'
              ELSE 'authority' END AS type
  FROM nation
),
b AS (
  SELECT type, id,
         CASE WHEN type = 'operator' THEN 'Operator'
              ELSE 'Authority' END AS el,
         '<Name>' || {_esc("label")} || '</Name>'
         || '<ShortName>' || {_esc("short_name")} || '</ShortName>'
         || '<LegalName>' || {_esc("official_name")} || '</LegalName>'
         || '<ContactDetails>'
         || coalesce('<Email>' || {_esc("email")} || '</Email>', '')
         || '<Phone>' || {_esc("phone")} || '</Phone>'
         || '<Url>' || {_esc("website")} || '</Url>'
         || '</ContactDetails>'
         || '<OrganisationType>' || type || '</OrganisationType>' AS body
  FROM o
)
SELECT type, id,
       '<' || el || ' id="' || {_esc("id")} || '" version="any">'
       || body || '</' || el || '>' AS xml
FROM b ORDER BY id
"""


@register("xml_organisations", _ORG_XML_ORACLE)
def xml_organisations_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's organisations document DAG end-to-end (ref
    organisations.sql:9-92): CSV source -> DISTINCT ON (id) -> per-org
    Operator/Authority NeTEx fragment. The oracle rebuilds the exact XML
    strings from the nation view (the CSV's closed-form seed), so the
    whole document body is value-hash gated — strings only, no floats."""
    from ..pipeline import export as ex_mod

    nations = _nation_rows(spark, sf_dir)
    path = write_csv(render_rows(nations))
    orgs = read_organisations(spark, path)
    return ex_mod.xml_organisations(orgs).orderBy("id")


_JSONL_DIRS: dict = {}

_JSONL_ORACLE = """
SELECT doc_id, md5(text) AS text_md5, lang, source,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents
"""


def _register_jsonl():
    from . import register_extra

    @register_extra("jsonl_docs_roundtrip", _JSONL_ORACLE)
    def jsonl_docs_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
        """JSONL source/sink round-trip: the documents table written as
        gzipped sharded JSON-lines (the dominant training-data
        interchange format) via Spark's native sink, read back with a
        PINNED schema, and every row hash-compared (md5 of the full
        text) against the parquet original — JSON string escaping
        (newlines, quotes, unicode) can't silently corrupt a byte.
        Scale notes: the sink writes one .json.gz part per partition
        executor-side (nothing rows through the driver); the pinned
        read schema skips spark.read.json's schema-INFERENCE pass,
        which is a full extra scan of a 100 TB corpus; gzip splits per
        FILE, so shard count (not file size) sets read parallelism."""
        import os as _os
        import tempfile

        from pyspark.sql import functions as F

        key = _os.path.abspath(sf_dir)
        pool = _JSONL_DIRS.get(key)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        if pool is None:
            pool = tempfile.mkdtemp(prefix="jsonlpool_")
            (
                docs.repartition(8)
                .write.mode("overwrite")
                .option("compression", "gzip")
                .json(pool)
            )
            _JSONL_DIRS[key] = pool
        back = spark.read.schema(docs.schema).json(pool)
        return back.select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            "lang",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
        )


_register_jsonl()


# ------------------------------------------------ JSON path extraction


@register_extra(
    "json_extract_rollup",
    """
    WITH j AS (
      SELECT event_type,
             '{"k": ' || CAST(json_extract(props, '$.k') AS VARCHAR)
             || ', "tags": ["t'
             || CAST(user_id % 7 AS VARCHAR) || '", "t'
             || CAST(event_id % 5 AS VARCHAR) || '"], "geo": {"x": '
             || CAST(event_id % 100 AS VARCHAR) || '}}' AS doc
      FROM events
    ),
    x AS (
      SELECT event_type,
             CAST(json_extract(doc, '$.k') AS BIGINT) AS k,
             json_extract_string(doc, '$.tags[1]') AS tag2,
             CAST(json_extract(doc, '$.geo.x') AS BIGINT) AS gx
      FROM j
    )
    SELECT event_type, tag2,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(sum(gx) AS BIGINT) AS sum_gx
    FROM x GROUP BY 1, 2 ORDER BY event_type, tag2
    """,
)
def json_extract_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON-path extraction + rollup — the schema-on-
    read workload Spark serves constantly (event payloads, API logs):
    build a nested JSON document per event (object / array-index /
    nested-object fields, byte-identical construction on both engines),
    then extract '$.k', '$.tags[1]', '$.geo.x' and aggregate. Gates
    that Spark's get_json_object and DuckDB's json_extract agree on
    path semantics (array indexing is 0-based in BOTH JSONPath
    dialects), and that numeric extraction casts identically. The
    extraction is pure JVM expression work — at scale it pushes
    straight into the scan projection with no shuffle beyond the final
    partial agg."""
    ev = _t(spark, sf_dir, "events")
    j = ev.select(
        "event_type",
        F.concat(
            F.lit('{"k": '),
            F.get_json_object("props", "$.k"),
            F.lit(', "tags": ["t'),
            F.pmod(F.col("user_id"), F.lit(7)).cast("string"),
            F.lit('", "t'),
            F.pmod(F.col("event_id"), F.lit(5)).cast("string"),
            F.lit('"], "geo": {"x": '),
            F.pmod(F.col("event_id"), F.lit(100)).cast("string"),
            F.lit("}}"),
        ).alias("doc"),
    )
    x = j.select(
        "event_type",
        F.get_json_object("doc", "$.k").cast("long").alias("k"),
        F.get_json_object("doc", "$.tags[1]").alias("tag2"),
        F.get_json_object("doc", "$.geo.x").cast("long").alias("gx"),
    )
    return (
        x.groupBy("event_type", "tag2")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.sum("gx").cast("long").alias("sum_gx"),
        )
        .orderBy("event_type", "tag2")
    )
