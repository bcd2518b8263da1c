"""S3-path end-to-end without network (VERDICT r4 next #10): a tiny
Hadoop FileSystem stub (tests/fixtures/S3StubFileSystem.java) serves
the s3a:// scheme from the local filesystem, so read_files with an
S3Connection exercises the FULL path — connection registry -> s3a URI
resolution -> per-bucket fs.s3a.* conf application -> Hadoop
FileSystem.get by scheme -> parquet scan — in a sandbox that has no
hadoop-aws jar and no network. Only the final S3AFileSystem byte
transport is substituted (it is absent from the classpath entirely, so
this is the maximal honest coverage here).

Runs in a SUBPROCESS: the stub class must be on the driver classpath at
JVM start (spark.driver.extraClassPath), which the shared test session
can't change."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "S3StubFileSystem.java")

_DRIVER = r"""
import json, os, sys, tempfile
import chapterhousedb_spark as chdb

classes = sys.argv[1]
spark = chdb.build_session(
    app_name="s3-standin-test",
    shuffle_partitions=4,
    extra_conf={
        "spark.driver.extraClassPath": classes,
        "spark.executor.extraClassPath": classes,
        "spark.hadoop.fs.s3a.impl": "S3StubFileSystem",
        "spark.hadoop.fs.s3a.impl.disable.cache": "true",
        "spark.ui.enabled": "false",
    },
)
d = tempfile.mkdtemp(prefix="s3standin_data_")
spark.range(7).selectExpr("id", "id * 3 as v").write.parquet(os.path.join(d, "t.parquet"))
conn = chdb.S3Connection(
    name="s3x", bucket="test-bucket", region="eu-west-1",
    access_key_id="AKTEST", secret_access_key="SKTEST", path_style=True,
)
eng = chdb.Engine(
    spark=spark,
    results_dir=tempfile.mkdtemp(prefix="s3standin_res_"),
    connections=chdb.ConnectionRegistry({"s3x": conn}),
)
key = d.lstrip("/") + "/t.parquet"
h = eng.sql_wait(
    f"select count(*) as n, sum(v) as s from read_files('{key}', connection=>'s3x');"
)[0]
hconf = spark.sparkContext._jsc.hadoopConfiguration()
print(json.dumps({
    "status": h.status.value,
    "error": h.error,
    "resolved": conn.resolve(key),
    "result": eng.fetch(h.query_id).to_pydict() if h.result_dir else None,
    "bucket_region": hconf.get("fs.s3a.bucket.test-bucket.endpoint.region"),
    "bucket_key": hconf.get("fs.s3a.bucket.test-bucket.access.key"),
    "path_style": hconf.get("fs.s3a.bucket.test-bucket.path.style.access"),
}))
eng.close()
"""


def test_read_files_via_s3_connection_end_to_end(tmp_path):
    javac = shutil.which("javac")
    if javac is None:
        pytest.skip("no javac in environment")
    import pyspark

    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    cp = ":".join(
        os.path.join(jars_dir, j)
        for j in os.listdir(jars_dir)
        if "hadoop-client" in j
    )
    classes = str(tmp_path / "classes")
    subprocess.run(
        [javac, "-cp", cp, "-d", classes, FIXTURE], check=True, timeout=120
    )
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    proc = subprocess.run(
        [sys.executable, str(driver), classes],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=repo_root,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["status"] == "complete", out
    assert out["resolved"].startswith("s3a://test-bucket/")
    assert out["result"] == {"n": [7], "s": [63]}
    # per-bucket (not global) conf reached the live Hadoop configuration
    assert out["bucket_region"] == "eu-west-1"
    assert out["bucket_key"] == "AKTEST"
    assert out["path_style"] == "true"
