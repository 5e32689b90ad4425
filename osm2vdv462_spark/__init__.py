"""osm2vdv462_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
OPENER-next/osm2vdv462 (a PostGIS + osm2pgsql + Python geospatial ETL pipeline,
see /root/reference) re-expressed Spark-first:

* geometry = WKB ``binary`` columns decoded by a pure-numpy kernel
  (``osm2vdv462_spark.geo``) inside Arrow-vectorized pandas UDFs — no
  per-row Python on hot paths;
* spatial joins = two-phase plans: hierarchical grid-cell equi-join
  prefilter (H3-style quadkey cells, ``geo.cells``) followed by an exact
  vectorized predicate (point-in-polygon / touches / dwithin);
* kNN = cell ring-expansion candidate generation + window top-k;
* everything else (membership joins, tag-map logic, ordered aggregation,
  XML assembly) = built-in Catalyst operators.

Designed for 10^12-row image+caption tables: the big side of every spatial
join stays (lon, lat) doubles (no geometry decode), small dimension sides are
broadcast, hot cells are salted.
"""

__version__ = "0.1.0"
