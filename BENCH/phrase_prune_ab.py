"""A/B: phrase-aware block pruning (r3) vs forced-exhaustive scoring.

Builds one large index, then times phrase-bearing queries twice in
SEPARATE subprocesses: BYZER_PRUNE_MIN_BLOCKS=32 (default, pruning on)
vs 10^9 (exhaustive) — the knob is read at import time so executors
see it. The interesting shapes pair a rare/selective term with a
hot-term phrase: pruning should skip the phrase postings outside the
survivor ranges.

Run: PYTHONPATH=. python BENCH/phrase_prune_ab.py [n_files]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/phrase_ab_idx"

QUERIES = {
    "rare_plus_hot_phrase": 'sym_1717_0 "import return"',
    "hot_phrase_plus_terms": '"import return" def if',
    "rare_plus_hot_slop": 'sym_1717_0 "import return"~2',
    "term_only_control": "def return if",
}

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.plans.query import SearchQuery
from byzer_retrieval_spark.session import get_spark

spark = get_spark(app_name="phrase_ab", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
eng = RetrievalEngine(spark, {work!r} + "/idx")
queries = json.loads({queries_json!r})
out = {{}}
for name, kw in queries.items():
    q = SearchQuery(keyword=kw, fields=["content"], limit=10)
    eng.search(q).collect()  # warm (context open, scan cache)
    ts = []
    for _ in range(3):
        t0 = time.time()
        rows = eng.search(q).collect()
        ts.append(time.time() - t0)
    out[name] = {{"sec": round(sorted(ts)[1], 3), "rows": len(rows)}}
print("RESULT " + json.dumps(out))
"""


def run_mode(prune_min: int) -> dict:
    env = dict(os.environ, BYZER_PRUNE_MIN_BLOCKS=str(prune_min), PYTHONPATH=REPO)
    code = _CHILD.format(
        repo=REPO, work=WORK, queries_json=json.dumps(QUERIES)
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=1800, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    build = f"""
import sys, shutil
sys.path.insert(0, {REPO!r})
from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.session import get_spark
from byzer_retrieval_spark.sources.corpus import corpus_df

shutil.rmtree({WORK!r}, ignore_errors=True)
spark = get_spark(app_name="phrase_ab_build", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
src = corpus_df(spark, {n_files}, partitions=128)
import os
eng = RetrievalEngine(spark, {WORK!r} + "/idx")
eng.build(
    src,
    cfg=IndexConfig(num_shards=int(os.environ.get("AB_SHARDS", "32"))),
    resume=False,
)
print("built")
"""
    subprocess.run(
        [sys.executable, "-c", build], env=dict(os.environ, PYTHONPATH=REPO),
        timeout=3600, check=True,
    )
    pruned = run_mode(32)
    exhaustive = run_mode(10**9)
    report = {
        name: {
            "pruned_sec": pruned[name]["sec"],
            "exhaustive_sec": exhaustive[name]["sec"],
            "speedup": round(exhaustive[name]["sec"] / pruned[name]["sec"], 2),
            "rows_equal": pruned[name]["rows"] == exhaustive[name]["rows"],
        }
        for name in QUERIES
    }
    print(json.dumps({"n_files": n_files, "queries": report}, indent=2))


if __name__ == "__main__":
    main()
