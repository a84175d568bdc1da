"""Extra measurement harness for the optimization round (guide §1).

NOT the graded bench (bench.py is frozen): this isolates the expensive
pieces — build phase timings, ANN build, per-query noop-sink timings —
so optimizations can be attributed to a phase before/after.

Usage:
  python bench_extra.py build      # keyword build + phase timings
  python bench_extra.py vec        # vec corpus build + ANN build timings
  python bench_extra.py queries    # per-query timings on existing index
  python bench_extra.py all
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_FILES (same as bench.py)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(sf_tag.replace("sf", ""))
    except ValueError:
        sf = 0.1
    n_files = int(os.environ.get("BENCH_FILES", str(max(1000, int(500_000 * sf)))))

    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig
    from byzer_retrieval_spark.plans.query import SearchQuery
    from byzer_retrieval_spark.session import get_spark
    from byzer_retrieval_spark.sources.corpus import corpus_df

    shuffle_parts = int(os.environ.get("BENCH_SHUFFLE", "64"))
    num_shards = int(os.environ.get("BENCH_SHARDS", "32"))
    spark = get_spark(
        app_name="bench_extra", master=f"local[{cpus}]",
        shuffle_partitions=shuffle_parts,
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = f"/tmp/bench_extra_{sf_tag}_{cpus}"
    out: dict = {"sf": sf, "files": n_files, "cpus": cpus}
    cfg = IndexConfig(num_shards=num_shards, hot_term_split_threshold=1 << 17)

    if what in ("build", "all", "queries"):
        shutil.rmtree(work, ignore_errors=True)
        corpus_path = os.path.join(work, "corpus.parquet")
        corpus_df(spark, n_files, partitions=shuffle_parts * 2).write.parquet(
            corpus_path
        )
        src = spark.read.parquet(corpus_path)
        eng = RetrievalEngine(spark, os.path.join(work, "idx"))
        spark.sparkContext.setJobDescription("build")
        t0 = time.time()
        m = eng.build(src, cfg=cfg, resume=False, source_desc="bench_extra")
        out["build_sec"] = round(time.time() - t0, 3)
        out["build_phases"] = m.get("phase_timings", {})
        spark.sparkContext.setJobDescription(None)

        if what in ("queries", "all"):
            from bench import BENCH_QUERIES

            qt = {}
            for name, kw in BENCH_QUERIES.items():
                q = SearchQuery(keyword=kw, fields=["content"], limit=10)
                reps = []
                for _ in range(3):
                    spark.sparkContext.setJobDescription(name)
                    tq = time.time()
                    eng.search(q).collect()
                    reps.append(round(time.time() - tq, 3))
                qt[name] = reps
            out["queries"] = qt
            spark.sparkContext.setJobDescription(None)

    if what in ("vec", "all"):
        vwork = os.path.join(work, "vec")
        shutil.rmtree(vwork, ignore_errors=True)
        src_vec = corpus_df(
            spark, n_files, partitions=shuffle_parts * 2, embedding_dim=64
        )
        eng_vec = RetrievalEngine(spark, os.path.join(vwork, "idx_vec"))
        spark.sparkContext.setJobDescription("vec: keyword build")
        t0 = time.time()
        m2 = eng_vec.build(src_vec, cfg=cfg, resume=False)
        out["vec_kw_build_sec"] = round(time.time() - t0, 3)
        out["vec_kw_build_phases"] = m2.get("phase_timings", {})
        spark.sparkContext.setJobDescription("vec: ann build")
        t0 = time.time()
        eng_vec.build_vector_ann("embedding", kind="ivf")
        out["vec_ann_build_sec"] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
