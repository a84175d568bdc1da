"""Benchmark: index-build throughput + BM25 query latency.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

- value        = end-to-end seconds (index build + all headline queries)
- queries      = per-piece seconds (build + each reference-style query)
- extras       = corpus files, files/sec build throughput, query p50

Input scale: the synthetic source-code corpus (FIXTURES.md F1, exactly
the BASELINE.json input_hint shape) generated deterministically per
partition — n_files scales with the SF dir so sf0.1 exercises a corpus
where hot terms ('import', df≈N) have six-figure posting lists and
block-max pruning + salted splits actually matter.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_FILES (override corpus size).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

N_QUERY_REPEATS = 3


def _loadavg() -> list:
    """1/5/15-min load — recorded in the output JSON so host co-tenant
    noise can be adjudicated from the artifact itself (this host swings
    4-8x on identical jobs; see BENCH/BASELINE.md host-noise section)."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []

# reference query set (FIXTURES §F4) re-expressed at bench scale
BENCH_QUERIES = {
    "q_rare_term": "sym_1717_0",          # df=1 (unique per-doc symbol)
    "q_hot_term": "import",               # df≈N → block-max skipping
    "q_multi_or": "def return",
    "q_must_not": "+import -sym_1717_0",
    "q_triple_or": "self class lambda",
    "q_hot_pair": "import return",
    "q_phrase": '"def return"',           # position-join verification
    "q_slop": '"def return"~2 class',     # NEAR window + should term
    "q_prefix": "sym_17* class",          # constant-score expansion
}


def main() -> None:
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

    # the job layout (shards, shuffle partitions) is PINNED so that runs
    # at different core counts execute the IDENTICAL job — that's the
    # two-cluster-size methodology: same plan, more parallelism.
    shuffle_parts = int(os.environ.get("BENCH_SHUFFLE", "64"))
    num_shards = int(os.environ.get("BENCH_SHARDS", "32"))
    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=shuffle_parts
    )
    spark.sparkContext.setLogLevel("ERROR")

    tag = os.environ.get("BENCH_WORKDIR_TAG", "")
    work = f"/tmp/bench_byzer_{sf_tag}_{cpus}" + (f"_{tag}" if tag else "")
    shutil.rmtree(work, ignore_errors=True)
    corpus_path = os.path.join(work, "corpus.parquet")
    # corpus generation is input setup, not benchmarked work
    corpus_df(spark, n_files, partitions=shuffle_parts * 2).write.parquet(corpus_path)
    src = spark.read.parquet(corpus_path)

    load_before = _loadavg()
    timings: dict[str, float] = {}
    eng = RetrievalEngine(spark, os.path.join(work, "idx"))
    cfg = IndexConfig(num_shards=num_shards, hot_term_split_threshold=1 << 17)

    t0 = time.time()
    eng.build(src, cfg=cfg, resume=False, source_desc=f"bench {n_files} files")
    build_sec = time.time() - t0
    timings["build"] = round(build_sec, 3)

    q_times = []
    for name, kw in BENCH_QUERIES.items():
        q = SearchQuery(keyword=kw, fields=["content"], limit=10)
        reps = []
        for _ in range(N_QUERY_REPEATS):
            tq = time.time()
            rows = eng.search(q).collect()
            reps.append(time.time() - tq)
        timings[name] = round(statistics.median(reps), 3)
        q_times.append(statistics.median(reps))

    # batch fan-out throughput: 100 distinct queries in ONE job — the
    # scheduling floor is paid once per batch (operators/batch.py)
    batch_qs = [
        SearchQuery(keyword=f"sym_{i}_0 import", fields=["content"], limit=10)
        for i in range(100)
    ]
    tb = time.time()
    eng.batch_search(batch_qs).collect()
    batch_sec = time.time() - tb
    timings["batch100"] = round(batch_sec, 3)

    # mixed-shape batch (round 4): term/MUST-NOT/prefix/fuzzy/group/
    # phrase/sloppy-phrase/filtered clauses share the ONE-job batch
    # scorer — exercises the constant-score bulk decode, batch-wide
    # fuzzy/phrase memoization, and the exact per-shard top-k cut
    mixed_shapes = [
        lambda i: f"sym_{i}_0 import",
        lambda i: f"+import -sym_{i}_0",
        lambda i: f"sym_{i % 23}* class",
        lambda i: f"impor~1 sym_{i}_0",
        lambda i: f"+(def class) sym_{i}_2",
        lambda i: f'"def return" sym_{i}_0',
        lambda i: f'"import return"~2 sym_{i}_1',
    ]
    mixed_qs = [
        SearchQuery(
            keyword=mixed_shapes[i % len(mixed_shapes)](i),
            fields=["content"],
            filters=(
                {"and": [{"field": "lang", "value": "py"}]}
                if i % 16 == 15
                else {}
            ),
            limit=10,
        )
        for i in range(100)
    ]
    tb = time.time()
    eng.batch_search(mixed_qs).collect()
    mixed_sec = time.time() - tb
    timings["batch100_mixed"] = round(mixed_sec, 3)

    # BENCH_SKIP_VEC: build-scaling harnesses (BENCH/scaling_isoclock)
    # need only the keyword build+query phases — the vector corpus +
    # ANN build at 1-core 1.6M-file levels would multiply their
    # wall-clock without informing the build-throughput metric
    skip_vec = bool(os.environ.get("BENCH_SKIP_VEC"))
    vec_mixed_sec = fvec_sec = None

    # ANN-mixed batch (round 5): 20 vector + 80 keyword queries share
    # ONE job — vector members probe a persisted IVF index via one
    # tagged partition-pruned scan (knn.batch_vector_winners_ann), the
    # keyword members ride the one-job batch scorer. IVF over LSH here:
    # nprobe partition filters touch ~nprobe×queries cluster dirs vs
    # LSH's hundreds of tiny bucket files (measured 2.6× faster probes
    # at this scale). A SEPARATE engine (same corpus + deterministic
    # embeddings) keeps the headline build metric comparable
    # round-over-round.
    if not skip_vec:
        import numpy as np

        vec_idx = os.path.join(work, "idx_vec")
        eng_vec = RetrievalEngine(spark, vec_idx)
        src_vec = corpus_df(
            spark, n_files, partitions=shuffle_parts * 2, embedding_dim=64
        )
        tb = time.time()
        eng_vec.build(src_vec, cfg=cfg, resume=False)
        eng_vec.build_vector_ann("embedding", kind="ivf")  # adaptive sqrt(N) clusters (r5)
        vec_build_sec = time.time() - tb
        timings["vec_build"] = round(vec_build_sec, 3)

        def _qvec(seed: int):
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(64)
            return [float(x) for x in (v / np.linalg.norm(v))]

        vec_qs = []
        for i in range(100):
            if i % 5 == 0:
                vec_qs.append(
                    SearchQuery(
                        vector=_qvec(i), vector_field="embedding", limit=10
                    )
                )
            else:
                vec_qs.append(
                    SearchQuery(
                        keyword=mixed_shapes[i % len(mixed_shapes)](i),
                        fields=["content"],
                        limit=10,
                    )
                )
        eng_vec.batch_search(vec_qs[:5]).collect()  # warm the probe path
        tb = time.time()
        eng_vec.batch_search(vec_qs).collect()
        vec_mixed_sec = time.time() - tb
        timings["batch100_vec_mixed"] = round(vec_mixed_sec, 3)

        # FILTERED vector batch (round 5): the gated shared probe with the
        # per-query can-fill-k contract (knn.batch_vector_winners_ann_
        # filtered) — previously this shape always fell back per query
        fvec_qs = [
            SearchQuery(
                vector=_qvec(1000 + i),
                vector_field="embedding",
                filters={"and": [{"field": "lang", "value": "python"}]},
                limit=10,
            )
            for i in range(100)
        ]
        tb = time.time()
        eng_vec.batch_search(fvec_qs).collect()
        fvec_sec = time.time() - tb
        timings["batch100_vec_filtered"] = round(fvec_sec, 3)

    total = build_sec + sum(q_times)
    out = {
        "metric": "index_build_plus_bm25_query_e2e",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "files": n_files,
        "build_files_per_sec": round(n_files / build_sec, 1),
        "query_p50_sec": round(statistics.median(q_times), 3),
        "batch_queries_per_sec": round(100.0 / batch_sec, 1),
        "batch_mixed_queries_per_sec": round(100.0 / mixed_sec, 1),
        "cpus": cpus,
        "loadavg_before": load_before,
        "loadavg_after": _loadavg(),
    }
    if vec_mixed_sec is not None:
        out["batch_vec_mixed_queries_per_sec"] = round(100.0 / vec_mixed_sec, 1)
    if fvec_sec is not None:
        out["batch_vec_filtered_queries_per_sec"] = round(100.0 / fvec_sec, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
