"""WebDataset tar-shard source/sink (sources/wds.py): exact round trip,
one-task-per-shard parallelism, manifest integrity, byte-stable writes."""

import hashlib
import os

import pytest

from osm2vdv462_spark.pipeline import images as im
from osm2vdv462_spark.sources import wds


def _rows(df):
    out = [tuple(r) for r in df.select(*wds._COLS).collect()]
    return sorted(out)


@pytest.fixture(scope="module")
def pool(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wds"))
    imgs = im.images_df(spark, sf_dir, every=10, mixed_formats=True)
    manifest = wds.write_shards(imgs, d, shards=4)
    return d, manifest, imgs


def test_roundtrip_exact(spark, pool):
    d, _, imgs = pool
    back = wds.read_shards(spark, d)
    assert _rows(back) == _rows(imgs)  # bytes, caption, phash — everything


def test_one_task_per_shard(spark, pool):
    d, manifest, _ = pool
    back = wds.read_shards(spark, d)
    assert back.rdd.getNumPartitions() == len(manifest)


def test_manifest_matches_files(spark, pool):
    d, manifest, imgs = pool
    assert sum(m["rows"] for m in manifest) == imgs.count()
    for m in manifest:
        assert os.path.getsize(os.path.join(d, m["shard"])) == m["bytes"]


def test_rewrite_is_byte_stable(spark, sf_dir, pool, tmp_path):
    d, manifest, imgs = pool
    d2 = str(tmp_path / "again")
    wds.write_shards(
        im.images_df(spark, sf_dir, every=10, mixed_formats=True), d2, shards=4
    )
    for m in manifest:
        h1 = hashlib.md5(open(os.path.join(d, m["shard"]), "rb").read()).hexdigest()
        h2 = hashlib.md5(open(os.path.join(d2, m["shard"]), "rb").read()).hexdigest()
        assert h1 == h2


def test_glob_and_list_inputs(spark, pool):
    d, manifest, _ = pool
    via_glob = wds.read_shards(spark, os.path.join(d, "*.tar"))
    via_list = wds.read_shards(
        spark, [os.path.join(d, m["shard"]) for m in manifest]
    )
    assert via_glob.count() == via_list.count()
    with pytest.raises(FileNotFoundError):
        wds.read_shards(spark, os.path.join(d, "nope-*.tar"))
