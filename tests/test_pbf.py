"""Real .osm.pbf scan (sources/pbf.py) against the reference's own
example extracts — the ingest stage the reference feeds to osm2pgsql
(main.lua:12-35), decoded from scratch from the public PBF format."""

import pytest
from pyspark.sql import functions as F

from osm2vdv462_spark.sources import pbf

TU = "/root/reference/example_data/tu-campus_technopark.osm.pbf"
CHEMNITZ = "/root/reference/example_data/chemnitz-bernsdorf.osm.pbf"


@pytest.fixture(scope="module")
def tu_df(spark):
    return pbf.read_pbf(spark, TU).cache()


class TestPbfScan:
    def test_counts_and_types(self, tu_df):
        counts = {
            r["element_type"]: r["count"]
            for r in tu_df.groupBy("element_type").count().collect()
        }
        # real-extract invariants: nodes >> ways >> relations
        assert counts["node"] > counts["way"] > counts["relation"] > 0

    def test_coordinates_are_chemnitz(self, tu_df):
        r = tu_df.filter(F.col("element_type") == "node").agg(
            F.min("lon"), F.max("lon"), F.min("lat"), F.max("lat")
        ).collect()[0]
        assert 12.8 < r[0] <= r[1] < 13.0   # TU Chemnitz campus
        assert 50.7 < r[2] <= r[3] < 50.9

    def test_ids_unique_per_type(self, tu_df):
        n = tu_df.count()
        assert tu_df.select("element_type", "osm_id").distinct().count() == n

    def test_real_transit_tags(self, tu_df):
        pt = tu_df.filter(F.element_at("tags", "public_transport").isNotNull())
        vals = {
            r[0]
            for r in pt.select(
                F.element_at("tags", "public_transport")
            ).distinct().collect()
        }
        assert {"platform", "stop_position", "stop_area"} <= vals

    def test_relation_members_resolve(self, tu_df, spark):
        """stop_area members must reference nodes/ways that exist in the
        extract (spot-check on node members — extracts clip ways less
        consistently)."""
        sa = tu_df.filter(
            (F.col("element_type") == "relation")
            & (F.element_at("tags", "public_transport") == "stop_area")
        )
        assert sa.count() >= 5
        members = sa.select(
            F.explode(F.arrays_zip("member_types", "member_refs")).alias("m")
        ).select(
            F.col("m.member_types").alias("mt"), F.col("m.member_refs").alias("mr")
        )
        node_members = members.filter(F.col("mt") == "node")
        nodes = tu_df.filter(F.col("element_type") == "node").select(
            F.col("osm_id").alias("mr")
        )
        n_mem = node_members.count()
        n_resolved = node_members.join(nodes, "mr").count()
        assert n_mem > 0 and n_resolved / n_mem > 0.9

    def test_way_refs_nonempty(self, tu_df):
        ways = tu_df.filter(F.col("element_type") == "way")
        n = ways.count()
        # the extract is bbox-clipped: a few boundary ways keep a single
        # node; every way must still carry >=1 decoded ref and >=95%
        # the usual >=2
        assert ways.filter(F.size("refs") < 1).count() == 0
        assert ways.filter(F.size("refs") >= 2).count() / n > 0.95

    def test_partition_invariance(self, spark):
        a = pbf.read_pbf(spark, TU, partitions=1)
        b = pbf.read_pbf(spark, TU, partitions=3)
        ka = sorted((r[0], r[1]) for r in a.select("element_type", "osm_id").collect())
        kb = sorted((r[0], r[1]) for r in b.select("element_type", "osm_id").collect())
        assert ka == kb


class TestPbfDispatch:
    def test_dispatch_on_real_extract(self, spark, tu_df):
        """S1 end-to-end on real data: the scan feeds the first-match
        dispatch; counts must agree with direct tag filters."""
        from osm2vdv462_spark.pipeline.extract import dispatch

        out = dispatch(pbf.elements_for_dispatch(tu_df)).cache()
        by_table = {
            r["target_table"]: r["count"]
            for r in out.groupBy("target_table").count().collect()
        }
        ifopt_platforms = tu_df.filter(
            F.element_at("tags", "ref:IFOPT").isNotNull()
            & (
                F.element_at("tags", "public_transport").isin("platform")
                | F.element_at("tags", "highway").isin("platform")
                | F.element_at("tags", "railway").isin("platform")
            )
        ).count()
        assert by_table.get("platforms", 0) == ifopt_platforms > 0
        assert by_table.get("stop_areas", 0) > 0
        # first-match: nothing lands in two tables (one row per element)
        assert out.count() == tu_df.count()

    def test_chemnitz_bernsdorf_scale(self, spark):
        df = pbf.read_pbf(spark, CHEMNITZ)
        assert df.count() > 50_000
        sa = df.filter(
            F.element_at("tags", "public_transport") == "stop_area"
        ).count()
        assert sa >= 50


class TestWireFormat:
    """Hand-encoded protobuf blobs exercise paths the reference
    fixtures don't use (plain non-dense Nodes, raw uncompressed
    payloads)."""

    @staticmethod
    def _vi(n):
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    @classmethod
    def _field(cls, fno, wire, payload):
        key = cls._vi((fno << 3) | wire)
        if wire == 0:
            return key + cls._vi(payload)
        return key + cls._vi(len(payload)) + payload

    @classmethod
    def _zz(cls, n):
        return (n << 1) ^ (n >> 63) if n < 0 else n << 1

    def test_plain_node_and_raw_blob(self, tmp_path):
        import struct

        from osm2vdv462_spark.sources import pbf

        f = self._field
        vi = self._vi
        st = f(1, 2, b"") + f(1, 2, b"name") + f(1, 2, b"Plain Stop")
        node = (
            f(1, 0, self._zz(4242))          # id sint64
            + f(2, 2, vi(1))                  # keys: [1]
            + f(3, 2, vi(2))                  # vals: [2]
            + f(8, 0, self._zz(508100000))   # lat raw (gran 100 -> 50.81)
            + f(9, 0, self._zz(129200000))   # lon raw -> 12.92
        )
        group = f(1, 2, node)
        block = f(1, 2, st) + f(2, 2, group)
        blob = f(1, 2, block)  # raw (uncompressed) payload, field 1
        hdr = f(1, 2, b"OSMData") + f(3, 0, len(blob))
        path = tmp_path / "tiny.osm.pbf"
        with open(path, "wb") as fh:
            fh.write(struct.pack(">I", len(hdr)) + hdr + blob)

        descs = pbf.scan_blob_descriptors(str(path))
        assert descs == [(4 + len(hdr), len(blob), "OSMData")]
        with open(path, "rb") as fh:
            fh.seek(descs[0][0])
            raw = fh.read(descs[0][1])
        rows = pbf._decode_primitive_block(pbf._blob_payload(raw))
        assert len(rows) == 1
        t, oid, lon, lat, tags = rows[0][:5]
        assert (t, oid) == ("node", 4242)
        assert abs(lon - 12.92) < 1e-9 and abs(lat - 50.81) < 1e-9
        assert tags == {"name": "Plain Stop"}

    def test_multi_file_scan(self, spark):
        """Sharded input: a glob over two extracts pools their blobs."""
        df = pbf.read_pbf(
            spark,
            ["/root/reference/example_data/tu-campus_technopark.osm.pbf",
             "/root/reference/example_data/magdeburg-hbf.pbf"],
        )
        n = df.count()
        a = pbf.read_pbf(spark, TU).count()
        b = pbf.read_pbf(
            spark, "/root/reference/example_data/magdeburg-hbf.pbf"
        ).count()
        assert n == a + b

    def test_round_trip_real_extract(self, spark, tu_df, tmp_path):
        """write_pbf(read_pbf(x)) == read_pbf(x): full-fidelity
        round-trip of a real extract through the from-scratch encoder
        (parallel per-partition blob encode, driver concatenates)."""
        out = str(tmp_path / "roundtrip.osm.pbf")
        n = pbf.write_pbf(tu_df, out)
        assert n == tu_df.count()
        back = pbf.read_pbf(spark, out)

        def canon(df):
            rows = {}
            for r in df.collect():
                rows[(r["element_type"], r["osm_id"])] = (
                    None if r["lon"] is None else round(r["lon"], 7),
                    None if r["lat"] is None else round(r["lat"], 7),
                    dict(r["tags"]) if r["tags"] else None,
                    list(r["refs"]) if r["refs"] else None,
                    list(r["member_types"]) if r["member_types"] else None,
                    list(r["member_refs"]) if r["member_refs"] else None,
                    list(r["member_roles"]) if r["member_roles"] else None,
                )
            return rows

        a, b = canon(tu_df), canon(back)
        assert a.keys() == b.keys()
        diff = [(k, a[k], b[k]) for k in a if a[k] != b[k]]
        assert not diff, diff[:2]
