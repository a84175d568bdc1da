"""Query-side scale evidence (round 4): ONE batch of 1,000 mixed
queries against a 600k-file corpus — batch throughput (q/s) plus
single-query p50 for reference, with /proc/loadavg recorded per the
established host-noise rules (BENCH/BASELINE.md).

The batch is the 100 TB serving story: the per-job scheduling floor is
paid once per batch, so throughput scales with executors. Mixed shapes
exercise every batchable clause kind in ONE job: rare terms, hot+rare
pairs, MUST/NOT, prefixes, fuzzies, groups, filtered queries, and
(round 4) exact + sloppy phrases.

Run: PYTHONPATH=. python BENCH/query_scale.py [n_files] [n_queries]
Optionally reuses an existing index via QS_REUSE=1 (same n_files, same
QS_VECTORS setting). QS_VECTORS=1 makes every 10th query a VECTOR query
against a persisted IVF index (100 vector + 900 keyword at the default
sizes) — the round-5 batched-ANN-probe scale shape.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/query_scale_idx"


def loadavg() -> list:
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def _qvec(seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    v = rng.standard_normal(64)
    return [float(x) for x in (v / np.linalg.norm(v))]


def mixed_queries(n: int, vectors: bool = False):
    from byzer_retrieval_spark.plans.query import SearchQuery

    shapes = [
        lambda i: f"sym_{i}_0 import",                 # rare + hot
        lambda i: f"sym_{i}_1 def return",             # rare + 2 hot
        lambda i: f"+import -sym_{i}_0",               # MUST/NOT
        lambda i: f"sym_{i % 97}* class",              # prefix
        lambda i: f"impor~1 sym_{i}_0",                # fuzzy
        lambda i: f"+(def class) sym_{i}_2",           # group gate
        lambda i: f'"def return" sym_{i}_0',           # phrase (r4 batchable)
        lambda i: f'"import return"~2 sym_{i}_1',      # sloppy phrase
    ]
    out = []
    for i in range(n):
        if vectors and i % 10 == 9:
            out.append(
                SearchQuery(
                    vector=_qvec(i), vector_field="embedding", limit=10
                )
            )
            continue
        kw = shapes[i % len(shapes)](i)
        filters = (
            {"and": [{"field": "lang", "value": "py"}]} if i % 16 == 15 else {}
        )
        out.append(
            SearchQuery(keyword=kw, fields=["content"], filters=filters, limit=10)
        )
    return out


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000

    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig
    from byzer_retrieval_spark.session import get_spark
    from byzer_retrieval_spark.sources.corpus import corpus_df

    cpus = int(os.environ.get("QS_CPUS", "32"))
    spark = get_spark(
        app_name="query_scale",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = RetrievalEngine(spark, WORK + "/idx")

    vectors = bool(os.environ.get("QS_VECTORS"))
    build_sec = None
    if not (os.environ.get("QS_REUSE") and os.path.exists(WORK + "/idx")):
        import shutil

        shutil.rmtree(WORK, ignore_errors=True)
        src = corpus_df(
            spark, n_files, partitions=128,
            embedding_dim=64 if vectors else 0,
        )
        t0 = time.time()
        eng.build(src, cfg=IndexConfig(num_shards=32), resume=False)
        if vectors:
            eng.build_vector_ann("embedding", kind="ivf")  # sqrt(N) clusters
        build_sec = round(time.time() - t0, 1)

    qs = mixed_queries(n_queries, vectors=vectors)
    load0 = loadavg()

    # warm: context open + a small batch (scan caches, JIT)
    eng.batch_search(qs[:8]).collect()

    t0 = time.time()
    rows = eng.batch_search(qs).collect()
    batch_sec = time.time() - t0

    # single-query p50 on a 20-query sample (the per-job floor story)
    singles = []
    for q in qs[:20]:
        t0 = time.time()
        eng.search(q).collect()
        singles.append(time.time() - t0)

    out = {
        "n_files": n_files,
        "n_queries": n_queries,
        "build_sec": build_sec,
        "batch_sec": round(batch_sec, 2),
        "batch_qps": round(n_queries / batch_sec, 1),
        "batch_rows": len(rows),
        "single_p50_sec": round(statistics.median(singles), 3),
        "amortized_ms_per_query": round(1000.0 * batch_sec / n_queries, 1),
        "vectors": vectors,
        "loadavg_before": load0,
        "loadavg_after": loadavg(),
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
