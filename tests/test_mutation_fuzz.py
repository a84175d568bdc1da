"""Seeded mutation-sequence consistency: a random interleaving of
upsert / delete_by_ids / delete_by_filter / compact, re-querying after
every step against an exact Python model of the engine's Lucene-faithful
semantics:

- deletes and upserts tombstone old rows but df/avgdl keep counting them
  until compact (Lucene keeps deleted docs in segment stats until
  merge), so the model scores over ALL live+tombstoned versions and
  filters results to live ids;
- compact physically drops tombstones and refreshes stats, so the model
  switches to live-only rows.

Set comparison (no top-k cut) so equal-score ties can't flake."""

import random

import pytest

from byzer_retrieval_spark.api import RetrievalEngine
from byzer_retrieval_spark.operators.indexer import IndexConfig
from byzer_retrieval_spark.oracle import BM25Oracle
from byzer_retrieval_spark.plans.query import SearchQuery

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu",
]


def _content(rng):
    return " ".join(rng.choices(VOCAB, k=rng.randint(2, 10)))


class Model:
    """Version history: every build/upsert appends version rows; deletes
    mark versions dead. Stats rows = all versions until compact."""

    def __init__(self):
        self.versions = []          # list of dicts (immutable rows)
        self.live = {}              # _id -> version index

    def put(self, _id, content, lang):
        if _id in self.live:
            self.versions[self.live[_id]]["__dead"] = True
        self.versions.append(
            {"__vkey": f"{len(self.versions)}", "_id": _id,
             "content": content, "lang": lang, "__dead": False}
        )
        self.live[_id] = len(self.versions) - 1

    def delete(self, ids):
        for i in ids:
            if i in self.live:
                self.versions[self.live[i]]["__dead"] = True
                del self.live[i]

    def delete_where(self, pred):
        for i in list(self.live):
            if pred(self.versions[self.live[i]]):
                self.versions[self.live[i]]["__dead"] = True
                del self.live[i]

    def compact(self):
        self.versions = [v for v in self.versions if not v["__dead"]]
        self.live = {v["_id"]: i for i, v in enumerate(self.versions)}

    def expected(self, keyword):
        oracle = BM25Oracle(self.versions, text_field="content", key_field="__vkey")
        hits = oracle.search(keyword, limit=len(self.versions) or 1)
        by_key = {v["__vkey"]: v for v in self.versions}
        live_keys = {self.versions[i]["__vkey"] for i in self.live.values()}
        return {
            (by_key[k]["_id"], round(s, 9)) for k, s in hits if k in live_keys
        }


@pytest.mark.parametrize("seed", [11])
def test_mutation_sequence_consistency(spark, tmp_path, seed):
    rng = random.Random(seed)
    model = Model()
    eng = RetrievalEngine(spark, str(tmp_path / "idx"))

    init = []
    for i in range(50):
        c, lang = _content(rng), rng.choice(["en", "de"])
        model.put(str(i), c, lang)
        init.append({"_id": str(i), "content": c, "lang": lang})
    eng.build(
        spark.createDataFrame(init),
        cfg=IndexConfig(num_shards=3, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )

    def check(step):
        kw = rng.choice(VOCAB) + " " + rng.choice(VOCAB)
        q = SearchQuery(keyword=kw, fields=["content"], limit=500)
        got = {
            (r["_id"], round(r["_score"], 9)) for r in eng.search(q).collect()
        }
        assert got == model.expected(kw), (step, kw)

    check("initial")

    # upsert: 4 existing overwritten + 3 new
    batch = []
    for i in rng.sample(range(50), 4) + [100, 101, 102]:
        c, lang = _content(rng), rng.choice(["en", "de"])
        model.put(str(i), c, lang)
        batch.append({"_id": str(i), "content": c, "lang": lang})
    eng.upsert(spark.createDataFrame(batch))
    check("after-upsert")

    # delete by ids
    dead = [str(i) for i in rng.sample(range(50), 5)]
    model.delete(dead)
    eng.delete_by_ids(dead)
    check("after-delete-ids")

    # delete by stored-field filter
    model.delete_where(lambda v: v["lang"] == "de")
    eng.delete_by_filter({"lang": "de"})
    check("after-delete-filter")

    # compact: stats forget the dead
    model.compact()
    eng.compact()
    check("after-compact")

    # second upsert wave post-compact
    batch = []
    for i in [200, 201]:
        c = _content(rng)
        model.put(str(i), c, "en")
        batch.append({"_id": str(i), "content": c, "lang": "en"})
    eng.upsert(spark.createDataFrame(batch))
    check("after-second-upsert")
