"""A/B: phrase-aware block pruning (r3) + conjunctive MUST restriction
(r4) vs forced-exhaustive scoring.

Builds one large index, then times phrase-bearing queries in SEPARATE
subprocesses per mode: BYZER_PRUNE_MIN_BLOCKS=32 (default, θ0 pruning
on) vs 10^9 (exhaustive); BYZER_CONJ_RESTRICT=1 (default) vs 0 for the
MUST-kind queries (θ0 is off for MUST extras either way, so that pair
isolates the round-4 conjunctive restriction). Both knobs resolve on
the driver and ride the scorer closure. The interesting shapes pair a
rare/selective term with a hot-term phrase: pruning should skip the
phrase postings outside the survivor/conjunctive ranges.

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

# MUST-kind shapes (θ0 pruning is OFF for these both ways — the r4
# conjunctive restriction is the only lever): +rare-term next to a hot
# phrase, and a MUST hot phrase next to should terms
MUST_QUERIES = {
    "must_rare_hot_phrase": '+sym_1717_0 "import return"',
    "must_hot_phrase": '+"import return" def if',
    "must_hot_slop": '+"import return"~2 def',
    "must_rare_term_hot_terms": "+sym_1717_0 import return",
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


def run_mode(prune_min: int, conj: int = 1, queries: dict = None) -> dict:
    env = dict(
        os.environ,
        BYZER_PRUNE_MIN_BLOCKS=str(prune_min),
        BYZER_CONJ_RESTRICT=str(conj),
        PYTHONPATH=REPO,
    )
    code = _CHILD.format(
        repo=REPO, work=WORK, queries_json=json.dumps(queries or QUERIES)
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
    conj_on = run_mode(32, conj=1, queries=MUST_QUERIES)
    conj_off = run_mode(32, conj=0, queries=MUST_QUERIES)
    conj_report = {
        name: {
            "conj_sec": conj_on[name]["sec"],
            "no_conj_sec": conj_off[name]["sec"],
            "speedup": round(conj_off[name]["sec"] / conj_on[name]["sec"], 2),
            "rows_equal": conj_on[name]["rows"] == conj_off[name]["rows"],
        }
        for name in MUST_QUERIES
    }
    print(
        json.dumps(
            {
                "n_files": n_files,
                "queries": report,
                "must_conjunctive": conj_report,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
