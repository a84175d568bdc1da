"""spark-submit entry points (north_star: ships as --py-files modules).

Package and run on a cluster:

    zip -r byzer_retrieval_spark.zip byzer_retrieval_spark/
    spark-submit --py-files byzer_retrieval_spark.zip \
        --master yarn --deploy-mode cluster \
        -m byzer_retrieval_spark.cli build \
        --source s3://bucket/code_corpus/ --index s3://bucket/indexes/ \
        --db code --table main --shards 4096

Locally (this sandbox):

    python -m byzer_retrieval_spark.cli build --source /tmp/corpus.parquet \
        --index /tmp/idx --shards 8
    python -m byzer_retrieval_spark.cli query --index /tmp/idx \
        --keyword "+import -markdown def" --k 10
    python -m byzer_retrieval_spark.cli gen-corpus --out /tmp/corpus.parquet \
        --files 50000
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="byzer_retrieval_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-corpus", help="deterministic synthetic code corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--files", type=int, default=50000)
    g.add_argument("--partitions", type=int, default=64)

    b = sub.add_parser("build", help="build/resume the inverted index")
    b.add_argument("--source", required=True, help="parquet dir of (repo,path,commit,lang,content)")
    b.add_argument("--index", required=True, help="index root")
    b.add_argument("--db", default="default")
    b.add_argument("--table", default="default")
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--analyzer", default="whitespace", choices=["whitespace", "code"])
    b.add_argument("--no-resume", action="store_true")

    q = sub.add_parser("query", help="BM25 top-k")
    q.add_argument("--index", required=True)
    q.add_argument("--db", default="default")
    q.add_argument("--table", default="default")
    q.add_argument("--keyword", required=True)
    q.add_argument("--fields", default="content")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--slow-path", action="store_true")

    c = sub.add_parser("compact", help="merge-on-read compaction")
    c.add_argument("--index", required=True)
    c.add_argument("--db", default="default")
    c.add_argument("--table", default="default")

    args = p.parse_args(argv)

    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.session import get_spark

    spark = get_spark(app_name=f"byzer-retrieval-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "gen-corpus":
        from byzer_retrieval_spark.sources.corpus import corpus_df

        corpus_df(spark, args.files, args.partitions).write.mode("overwrite").parquet(args.out)
        print(json.dumps({"written": args.out, "files": args.files}))
        return 0

    eng = RetrievalEngine(spark, args.index)
    if args.cmd == "build":
        from byzer_retrieval_spark.operators.indexer import IndexConfig

        src = spark.read.parquet(args.source)
        m = eng.build(
            src,
            args.db,
            args.table,
            cfg=IndexConfig(num_shards=args.shards, analyzer=args.analyzer),
            resume=not args.no_resume,
            source_desc=args.source,
        )
        print(json.dumps(m, default=str))
        return 0
    if args.cmd == "query":
        from byzer_retrieval_spark.plans.query import SearchQuery

        sq = SearchQuery(
            keyword=args.keyword, fields=args.fields.split(","), limit=args.k
        )
        df = (
            eng.search_slow(sq, args.db, args.table)
            if args.slow_path
            else eng.search(sq, args.db, args.table)
        )
        for row in df.collect():
            print(json.dumps(row.asDict(recursive=True), default=str))
        return 0
    if args.cmd == "compact":
        print(json.dumps(eng.compact(args.db, args.table), default=str))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
