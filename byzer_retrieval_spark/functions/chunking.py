"""Context-window chunking: split documents into ~N-token windows with
a fixed stride (overlap) — the sequence-packing front end of an LLM
training pipeline.

One narrow pass, no Python: tokens stay an in-row array, chunk starts
come from F.sequence, each chunk is array_join(slice(...)), and the
one-to-many explode happens JVM-side. At 100 TB this pipelines at scan
speed; the only data growth is the overlap factor window/stride.

Chunk layout: starts at 1, 1+stride, 1+2*stride, ... while start <= n
(so every token is covered and a trailing partial window is emitted;
empty docs produce no chunks). Token definition is the shared ASCII-
whitespace split, ORIGINAL case (chunk text must round-trip content,
unlike the lowercased analysis tokens).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _raw_tokens(col: Column) -> Column:
    from byzer_retrieval_spark.functions.analyzer import _WS_CLASS

    return F.filter(F.split(col, _WS_CLASS + "+"), lambda t: t != "")


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 128,
    stride: int = 96,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_md5) — one row per chunk.

    chunk_md5 (not the text itself) keeps result frames gate-friendly;
    callers that want the text use ``chunk_text_expr`` on the same
    (toks, start) pieces."""
    assert 0 < stride <= window
    toks = _raw_tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.when(
        n > 0, F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_id"),
            F.size(F.slice(toks, s, window)).alias("n_tokens"),
            F.md5(F.array_join(F.slice(toks, s, window), " ")).alias("chunk_md5"),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(chunks).alias("c")
    ).select(
        "id",
        F.col("c.chunk_id").cast("int").alias("chunk_id"),
        F.col("c.n_tokens").cast("int").alias("n_tokens"),
        F.col("c.chunk_md5").alias("chunk_md5"),
    )


def chunk_documents_sql(
    table: str,
    id_col: str,
    text_col: str,
    window: int = 128,
    stride: int = 96,
) -> str:
    """DuckDB twin (same tokens, starts, md5-of-joined-chunk)."""
    from byzer_retrieval_spark.functions.analyzer import _WS_CLASS

    toks = (
        f"list_filter(regexp_split_to_array({text_col}, '{_WS_CLASS}+'), "
        "x -> x <> '')"
    )
    return f"""
WITH t AS (SELECT {id_col} AS id, {toks} AS toks FROM {table}),
s AS (
  SELECT id, toks,
         unnest(range(1, len(toks) + 1, {stride})) AS start,
         generate_subscripts(range(1, len(toks) + 1, {stride}), 1) - 1 AS chunk_id
  FROM t WHERE len(toks) > 0
)
SELECT id, chunk_id::INT AS chunk_id,
       len(list_slice(toks, start, start + {window} - 1))::INT AS n_tokens,
       md5(array_to_string(list_slice(toks, start, start + {window} - 1), ' '))
           AS chunk_md5
FROM s
"""
