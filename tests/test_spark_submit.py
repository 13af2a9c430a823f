"""North-rule execution-path test: the pipeline driver runs under real
``spark-submit --py-files deepie_spark.zip`` (fresh JVM, package shipped
as an archive exactly as on a cluster), and a second submission resumes
to a no-op.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_pkg_zip(tmp_path) -> str:
    zpath = str(tmp_path / "deepie_spark.zip")
    pkg = os.path.join(REPO, "deepie_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.fixture(scope="module")
def spark_submit():
    exe = shutil.which("spark-submit")
    if exe is None:
        exe = os.path.join(
            os.path.dirname(sys.executable), "spark-submit"
        )
    if not os.path.exists(exe):
        pytest.skip("spark-submit not available")
    return exe


def submit(spark_submit, zpath, pages_dir, out, manifest):
    cmd = [
        spark_submit,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zpath,
        os.path.join(REPO, "scripts", "run_pipeline.py"),
        "--pages", pages_dir,
        "--out", out,
        "--manifest", manifest,
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, env=env
    )
    assert res.returncode == 0, res.stderr[-3000:]
    last = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def test_spark_submit_pyfiles_run_and_resume(spark, tmp_path, spark_submit, sf_dir):
    # materialize a pages table from the driver documents
    from deepie_spark.datagen.pages import pages_from_documents

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pages_dir = str(tmp_path / "pages")
    pages_from_documents(docs).write.parquet(pages_dir)

    zpath = make_pkg_zip(tmp_path)
    out = str(tmp_path / "triples")
    manifest = str(tmp_path / "manifest")

    first = submit(spark_submit, zpath, pages_dir, out, manifest)
    assert not first["skipped"]
    assert first["n_triples"] > 0

    # identical re-submission must resume to a no-op
    second = submit(spark_submit, zpath, pages_dir, out, manifest)
    assert second == {"parts": 0, "n_triples": 0, "skipped": True}

    # the submitted run's output equals the in-process pipeline
    from deepie_spark.plans.pipeline import extract_triples

    want = extract_triples(spark, pages_from_documents(docs)).count()
    got = spark.read.parquet(out).count()
    assert got == want == first["n_triples"]
