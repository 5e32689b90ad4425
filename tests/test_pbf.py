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


def _canon(df):
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


class TestPbfSink:
    """The scale-shaped writer: vectorized varint encode, spec block
    limits, executor-side sharded parts, required header features."""

    def test_encode_packed_varints_inverse(self):
        import numpy as np

        rng = np.random.default_rng(7)
        vals = np.concatenate(
            [
                rng.integers(0, 1 << 62, 5000, dtype=np.int64).view(np.uint64),
                np.array(
                    [0, 1, 127, 128, 16383, 16384, (1 << 63) - 1,
                     (1 << 64) - 1, 1 << 63],
                    np.uint64,
                ),
            ]
        )
        enc = pbf.encode_packed_varints(vals)
        back = pbf.decode_packed_varints(enc).view("uint64")
        assert (back == vals).all()
        assert pbf.encode_packed_varints(vals[:0]) == b""

    def test_zigzag_inverse(self):
        import numpy as np

        v = np.array(
            [0, -1, 1, -2, 2, 2**62, -(2**62), -(2**63), 2**63 - 1], np.int64
        )
        assert (pbf._unzigzag(pbf._zigzag(v).view(np.int64)) == v).all()

    def test_unknown_compression_raises(self):
        # a Blob whose payload is zstd (field 7) must fail loudly, not
        # silently decode to zero elements (ADVICE r3)
        zstd_blob = TestWireFormat._field(2, 0, 10) + TestWireFormat._field(
            7, 2, b"\x28\xb5\x2f\xfd fake"
        )
        # the error must NAME the workaround (r4 verdict item 8): a
        # user with a 2024+ planet extract hits this boundary first
        with pytest.raises(ValueError, match="osmium cat"):
            pbf._blob_payload(zstd_blob)
        with pytest.raises(ValueError, match="pbf_compression=zlib"):
            pbf._blob_payload(zstd_blob)
        with pytest.raises(ValueError, match="no recognized payload"):
            pbf._blob_payload(TestWireFormat._field(2, 0, 10))
        # lzma/bzip2 blobs now decode via stdlib
        import bz2 as _bz2
        import lzma as _lzma

        for fno, comp in ((4, _lzma.compress), (5, _bz2.compress)):
            blob = TestWireFormat._field(2, 0, 5) + TestWireFormat._field(
                fno, 2, comp(b"hello")
            )
            assert pbf._blob_payload(blob) == b"hello"

    def test_header_declares_densenodes(self, spark, tmp_path):
        out = str(tmp_path / "hdr.osm.pbf")
        df = spark.createDataFrame(
            [("node", 1, 12.9, 50.8, {"a": "b"}, None, None, None, None)],
            pbf.PBF_SCHEMA,
        )
        pbf.write_pbf(df, out)
        descs = pbf.scan_blob_descriptors(out)
        assert descs[0][2] == "OSMHeader"
        with open(out, "rb") as fh:
            fh.seek(descs[0][0])
            hdr = pbf._blob_payload(fh.read(descs[0][1]))
        feats = {v.decode() for f, w, v in pbf._fields(hdr) if f == 4}
        assert {"OsmSchema-V0.6", "DenseNodes"} <= feats

    def test_block_chunking_respects_spec_limits(self, spark, tmp_path):
        """>8000 elements in one partition must split into multiple
        spec-compliant blocks, each decodable and <=8000 elements."""
        out = str(tmp_path / "big.osm.pbf")
        df = spark.range(20_000).selectExpr(
            "'node' as element_type",
            "id + 1 as osm_id",
            "12.0 + id * 1e-6 as lon",
            "50.0 + id * 1e-6 as lat",
            "map('i', cast(id as string)) as tags",
            "cast(null as array<long>) as refs",
            "cast(null as array<string>) as member_types",
            "cast(null as array<long>) as member_refs",
            "cast(null as array<string>) as member_roles",
        )
        n = pbf.write_pbf(df, out, partitions=1)
        assert n == 20_000
        data = [d for d in pbf.scan_blob_descriptors(out) if d[2] == "OSMData"]
        assert len(data) >= 3  # 20k / 8k
        with open(out, "rb") as fh:
            for off, size, _ in data:
                fh.seek(off)
                block = pbf._blob_payload(fh.read(size))
                assert len(block) < 32 << 20
                rows = pbf._decode_primitive_block(block)
                assert 0 < len(rows) <= 8000
        assert pbf.read_pbf(spark, out).count() == 20_000

    def test_sharded_round_trip_real_extract(self, spark, tu_df, tmp_path):
        """Executor-side sharded write -> directory of part files;
        read_pbf(dir) restores the exact element set."""
        out = str(tmp_path / "sharded_out")
        n = pbf.write_pbf(tu_df, out, sharded=True, partitions=4)
        assert n == tu_df.count()
        import os

        parts = sorted(os.listdir(out))
        assert len(parts) >= 2 and all(p.endswith(".osm.pbf") for p in parts)
        assert not any(p.endswith(".inprogress") for p in parts)
        back = pbf.read_pbf(spark, out)
        a, b = _canon(tu_df), _canon(back)
        assert a.keys() == b.keys()
        diff = [(k, a[k], b[k]) for k in a if a[k] != b[k]]
        assert not diff, diff[:2]


class TestLz4Codec:
    def test_block_round_trips_and_fuzz(self):
        import random

        from osm2vdv462_spark.functions.lz4codec import (
            lz4_block_compress as C,
            lz4_block_decompress as D,
        )

        for c in (b"", b"a", b"abc", b"a" * 100, b"ab" * 500,
                  bytes(range(256)) * 10, b"hello world " * 1000):
            assert D(C(c)) == c
        rng = random.Random(11)
        for _ in range(200):
            n = rng.randrange(0, 3000)
            if rng.random() < 0.5:
                base = bytes(
                    rng.randrange(256) for _ in range(rng.randrange(1, 20))
                )
                c = (base * (n // max(1, len(base)) + 1))[:n]
            else:
                c = bytes(rng.randrange(256) for _ in range(n))
            assert D(C(c)) == c
        # compressible input actually compresses
        rep = b"node/way/relation " * 2000
        assert len(C(rep)) < len(rep) // 10

    def test_malformed_raises(self):
        import pytest as _pytest

        from osm2vdv462_spark.functions.lz4codec import (
            lz4_block_decompress as D,
        )

        with _pytest.raises(ValueError):
            D(b"\x00\x12\x34")  # match with offset beyond empty output
        with _pytest.raises(ValueError):
            D(b"\xf0")  # truncated literal run

    def test_lz4_pbf_round_trip_real_extract(self, spark, tu_df, tmp_path):
        """The full real-extract round-trip with lz4-compressed blobs:
        write_pbf(codec='lz4') -> read_pbf equals the zlib path."""
        out = str(tmp_path / "roundtrip_lz4.osm.pbf")
        n = pbf.write_pbf(tu_df, out, codec="lz4")
        assert n == tu_df.count()
        back = pbf.read_pbf(spark, out)
        assert back.count() == n
        a = {
            (r["element_type"], r["osm_id"]): (r["lon"], r["lat"])
            for r in tu_df.collect()
        }
        b = {
            (r["element_type"], r["osm_id"]): (r["lon"], r["lat"])
            for r in back.collect()
        }
        assert set(a) == set(b)
        for k in a:
            la, lb = a[k], b[k]
            for x, y in zip(la, lb):
                assert (x is None) == (y is None)
                if x is not None:
                    assert abs(x - y) < 1e-7
