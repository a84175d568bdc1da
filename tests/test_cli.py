"""CLI entry points (spark-submit surface): gen-corpus → build →
query → compact driven through cli.main in-process."""

import json

from byzer_retrieval_spark import cli


def test_cli_roundtrip(spark, tmp_path, capsys):
    corpus = str(tmp_path / "corpus.parquet")
    idx = str(tmp_path / "idx")
    assert cli.main(["gen-corpus", "--out", corpus, "--files", "80", "--partitions", "4"]) == 0
    assert cli.main(["build", "--source", corpus, "--index", idx, "--shards", "2"]) == 0
    capsys.readouterr()
    assert cli.main(["query", "--index", idx, "--keyword", "+import de*", "--k", "5"]) == 0
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(out) <= 5 and all("_score" in r and "_id" in r for r in out)
    scores = [r["_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert cli.main(["compact", "--index", idx]) == 0
