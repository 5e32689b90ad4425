"""The spark-submit entry body (__main__.py): each subcommand runs,
prints one JSON object, and resumes where the DAG runners resume."""

import json

from osm2vdv462_spark.__main__ import main


def _run(capsys, argv):
    out = main(argv)
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed == json.loads(json.dumps(out))  # stdout == return
    return out


def test_imagepipe_runs_and_resumes(spark, sf_dir, tmp_path, capsys):
    work = str(tmp_path / "w")
    out = _run(capsys, ["imagepipe", "--workdir", work,
                        "--sf-dir", sf_dir, "--every", "20"])
    assert all(not s["skipped"] for s in out["stages"].values())
    again = _run(capsys, ["imagepipe", "--workdir", work,
                          "--sf-dir", sf_dir, "--every", "20"])
    assert all(s["skipped"] for s in again["stages"].values())


def test_export_shards_and_refresh_tiles(spark, sf_dir, tmp_path, capsys):
    pool = str(tmp_path / "pool")
    out = _run(capsys, ["export-shards", "--sf-dir", sf_dir,
                        "--out", pool, "--shards", "4", "--every", "20"])
    assert out["shards"] == 4 and out["rows"] > 0

    from osm2vdv462_spark.pipeline import datagen
    from osm2vdv462_spark.sources import snaptable as st
    from pyspark.sql import functions as F

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    pts = datagen.geo_points(spark, sf_dir)
    st.create_table(pts.filter(F.col("event_id") < 500), src, files_hint=2)
    init = _run(capsys, ["refresh-tiles", "--source", src,
                         "--view", view, "--init"])
    assert init["initialized_version"] == 1
    st.append_table(pts.filter(F.col("event_id") >= 500), src, files_hint=2)
    ref = _run(capsys, ["refresh-tiles", "--source", src, "--view", view])
    assert ref["refreshed"] and ref["keys_upserted"] > 0


def test_export_mvt(spark, sf_dir, tmp_path, capsys):
    out_dir = str(tmp_path / "tiles")
    out = _run(capsys, ["export-mvt", "--sf-dir", sf_dir, "--out", out_dir])
    assert out["tiles"] > 0 and out["features"] >= 25
    from osm2vdv462_spark.sources import mvtiles

    back = mvtiles.read_tiles(spark, out_dir)
    assert back.count() == out["features"]
