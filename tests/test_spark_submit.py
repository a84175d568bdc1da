"""north_rule packaging clause: the engine ships as spark-submit
--py-files modules. This test really packages byzer_retrieval_spark
as a zip, launches `spark-submit --py-files pkg.zip` in a fresh
process with the REPO OFF sys.path, and drives build + query through
the cli entry points — certifying that the package is self-contained
(no repo-relative imports, no driver-side state outside the index
root)."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(sys.modules["pyspark"].__file__)
    if "pyspark" in sys.modules
    else "",
    "bin",
    "spark-submit",
)

_DRIVER = """
import json, sys
from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.plans.query import SearchQuery
from byzer_retrieval_spark.sources.corpus import corpus_df
from pyspark.sql import SparkSession

idx_root = sys.argv[1]
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
src = corpus_df(spark, 120, partitions=4)
eng = RetrievalEngine(spark, idx_root)
m = eng.build(src, cfg=IndexConfig(num_shards=2, hot_term_split_threshold=64), resume=False)
q = SearchQuery(keyword='+import "def return"~1 de*', fields=["content"], limit=5)
rows = eng.search(q).collect()
print("SUBMIT_RESULT " + json.dumps({
    "n_docs": m["n_docs"],
    "hits": len(rows),
    "top_score_pos": rows[0]["_score"] > 0 if rows else None,
}))
"""


@pytest.mark.skipif(
    not (SPARK_SUBMIT and os.path.exists(SPARK_SUBMIT)),
    reason="spark-submit not on PATH",
)
def test_py_files_package_runs_end_to_end(tmp_path):
    zpath = tmp_path / "byzer_retrieval_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "byzer_retrieval_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", str(zpath),
            "--conf", "spark.sql.shuffle.partitions=4",
            str(driver), str(tmp_path / "idx"),
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_RESULT ")]
    assert line, (out.stdout[-2000:], out.stderr[-2000:])
    res = json.loads(line[-1][len("SUBMIT_RESULT "):])
    assert res["n_docs"] == 120 and res["hits"] == 5 and res["top_score_pos"]
