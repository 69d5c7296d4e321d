"""North-rule evidence: the engine runs via ``spark-submit
--py-files pg_textsearch_spark.zip`` with NO repo on sys.path — the
deployment story for a real cluster. The submitted job builds an
index over a small corpus and runs a BM25 top-k; the test asserts the
printed result matches the in-process engine."""

import json
import os
import shutil
import subprocess
import sys

import pyspark
import pytest

_JOB = """
import json, sys
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
# package must come from --py-files, not a checkout on sys.path
import pg_textsearch_spark
assert ".zip" in pg_textsearch_spark.__file__, pg_textsearch_spark.__file__
from pg_textsearch_spark.index.builder import build_index
from pg_textsearch_spark.operators.topk import BM25Index
from pg_textsearch_spark.operators.bmw import topk_bmw

out_dir, sf_dir = sys.argv[1], sys.argv[2]
docs = spark.read.parquet(sf_dir + "/documents.parquet")
build_index(spark, docs, out_dir, config="ascii", n_buckets=4)
idx = BM25Index(spark, out_dir)
rows = [
    (r["rank"], r["doc_id"], round(r["score"], 6))
    for r in topk_bmw(idx, "spark query table", k=5).collect()
]
print("RESULT:" + json.dumps(rows))
spark.stop()
"""


def test_spark_submit_pyfiles_deployment(tmp_path, spark):
    from pg_textsearch_spark.index.builder import build_index
    from pg_textsearch_spark.operators.bmw import topk_bmw
    from pg_textsearch_spark.operators.topk import BM25Index
    from pg_textsearch_spark.shipping import build_pyfiles_zip

    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not available")

    zip_path = build_pyfiles_zip(str(tmp_path / "pg_textsearch_spark.zip"))
    job_path = str(tmp_path / "job.py")
    with open(job_path, "w") as f:
        f.write(_JOB)

    sf_dir = "/root/testdata/sf0.001"
    out_dir = str(tmp_path / "submit_idx")
    # scrub the repo from the child's import path: the package must
    # resolve from the shipped zip alone
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [spark_submit, "--py-files", zip_path, job_path, out_dir, sf_dir],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    got = [tuple(r) for r in json.loads(line[0][len("RESULT:"):])]

    # same corpus, in-process engine
    d = str(tmp_path / "local_idx")
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    build_index(spark, docs, d, config="ascii", n_buckets=4)
    idx = BM25Index(spark, d)
    want = [
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in topk_bmw(idx, "spark query table", k=5).collect()
    ]
    assert got == want
    shutil.rmtree(out_dir, ignore_errors=True)
