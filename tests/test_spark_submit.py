"""The ACTUAL north-rule launch line, end to end: build the package
zip, then run a real ``spark-submit --py-files osm2vdv462_spark.zip``
subprocess from a foreign cwd — the driver script imports the engine
FROM THE ZIP (the repo is never on its path), builds its session from
the launcher's conf (``--submitted``), runs the checkpointed image
DAG, and prints the one-JSON-object contract. This is the subprocess
twin of test_cli.py (which exercises the same entry body in-process).
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

from tests.conftest import SF_DIR

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

DRIVER = """\
import sys
from osm2vdv462_spark.__main__ import main

main(["--submitted", "imagepipe", "--workdir", sys.argv[1],
      "--sf-dir", sys.argv[2], "--every", "50"])
"""


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit binary"
)
def test_spark_submit_py_files_launch(tmp_path):
    from osm2vdv462_spark import deploy

    zpath = deploy.build_zip(str(tmp_path / "osm2vdv462_spark.zip"))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    work = tmp_path / "work"
    env = dict(os.environ)
    # the driver must resolve the package from --py-files alone
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            str(driver), str(work), SF_DIR,
        ],
        cwd=str(tmp_path),  # foreign cwd: nothing importable here
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["stages"] and all(
        not s["skipped"] for s in out["stages"].values()
    )
    assert all(s["rows"] > 0 for s in out["stages"].values())

    # resume: a second submit over the same workdir skips every stage
    proc2 = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            str(driver), str(work), SF_DIR,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc2.returncode == 0, proc2.stderr[-4000:]
    out2 = json.loads(proc2.stdout.strip().splitlines()[-1])
    assert all(s["skipped"] for s in out2["stages"].values())
