"""Deployment-shape checks: the package really runs under
``spark-submit --py-files opensearch_spark.zip`` (the north-rule
cluster entry point), and the catalog-table / iceberg input shapes
resolve correctly.  The submit test launches a REAL second JVM via the
pyspark-bundled spark-submit, so it is the one test here that costs
~60s; everything else reuses the session fixture."""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    found = shutil.which("spark-submit")
    if not found:
        pytest.skip("spark-submit not available")
    return found


def _zip_package(dst_dir: str) -> str:
    zpath = os.path.join(dst_dir, "opensearch_spark.zip")
    src = os.path.join(REPO, "opensearch_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(src):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_pyfiles_smoke():
    """zip -> spark-submit --py-files zip cli.py smoke: generate, build
    through the catalog-table input path, query; assert the JSON line."""
    work = tempfile.mkdtemp(prefix="osps-submit-")
    try:
        zpath = _zip_package(work)
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        out = subprocess.run(
            [
                _spark_submit(),
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.driver.memory=2g",
                "--py-files", zpath,
                os.path.join(REPO, "opensearch_spark", "cli.py"),
                "smoke", "--convs", "120", "--workdir", work,
            ],
            env=env,
            capture_output=True,
            text=True,
            timeout=420,
            cwd=work,  # NOT the repo root: imports must come from the zip
        )
        assert out.returncode == 0, out.stderr[-4000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        res = json.loads(line)
        assert res["turns_indexed"] > 400  # ~8 turns/conv at 120 convs
        assert res["hits"] >= 5 and res["top"] is not None
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_read_input_table_and_parquet(spark, tmp_path):
    from opensearch_spark.cli import read_input
    from opensearch_spark.transcripts import generate

    docs = generate(spark, 30, partitions=2)
    docs.createOrReplaceTempView("cli_in_tbl")
    via_table = read_input(spark, "cli_in_tbl", "table")
    assert via_table.count() == docs.count()

    p = str(tmp_path / "cli_in_pq")
    docs.write.mode("overwrite").parquet(p)
    assert read_input(spark, p, "parquet").count() == docs.count()


def test_read_input_iceberg_absent_is_actionable(spark):
    """No iceberg runtime jar in this sandbox: the failure must carry
    the --packages hint, not a bare ClassNotFound."""
    from opensearch_spark.cli import read_input

    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_input(spark, "cat.db.transcripts", "iceberg")


def test_cli_analyze(tmp_path):
    """`cli analyze` prints the _analyze response shape (r5)."""
    import json as _json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "opensearch_spark.cli", "analyze",
         "--text", "The Quick FOXES"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert [t["token"] for t in out["tokens"]] == ["the", "quick", "foxes"]
    r2 = subprocess.run(
        [sys.executable, "-m", "opensearch_spark.cli", "analyze",
         "--text", "Schmidt",
         "--spec", _json.dumps({"tokenizer": "whitespace",
                                "filter": [{"type": "phonetic",
                                            "encoder": "double_metaphone"}]})],
        capture_output=True, text=True, cwd="/root/repo",
    )
    out2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert [t["token"] for t in out2["tokens"]] == ["XMT", "SMT"]
