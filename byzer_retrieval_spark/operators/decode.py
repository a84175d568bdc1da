"""Posting-block decode: blocks → flat (term, doc_id, tf, dl) postings.

Used by the DataFrame scorer (decode inside ``mapInPandas``, then pure
declarative scoring) and by the WAND scorer (selective in-task decode).
Decoding is numpy over Arrow batches — the Python loop is per 128-doc
block, never per posting.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from byzer_retrieval_spark.functions.encoding import varbyte_decode

FLAT_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("field", StringType(), False),
        StructField("term", StringType(), False),
        StructField("__docid", LongType(), False),
        StructField("tf", IntegerType(), False),
        StructField("dl", IntegerType(), False),
    ]
)


def decode_rows(
    gaps_blobs, tfs_blobs, dls_blobs, first_docs
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode N block rows → (doc_ids, tfs, dls, row_lengths)."""
    docs_out, tfs_out, dls_out, lens = [], [], [], []
    for gaps_b, tfs_b, dls_b, first in zip(gaps_blobs, tfs_blobs, dls_blobs, first_docs):
        gaps = varbyte_decode(gaps_b).astype(np.int64)
        ids = np.cumsum(gaps) + int(first)
        docs_out.append(ids)
        tfs_out.append(varbyte_decode(tfs_b).astype(np.int64))
        dls_out.append(varbyte_decode(dls_b).astype(np.int64))
        lens.append(len(ids))
    if not docs_out:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy(), z.copy()
    return (
        np.concatenate(docs_out),
        np.concatenate(tfs_out),
        np.concatenate(dls_out),
        np.asarray(lens, dtype=np.int64),
    )


def decode_position_deltas(pos_blobs) -> np.ndarray:
    """Concatenate position-DELTA streams of N blocks (token-level;
    per-posting segments are self-contained: absolute first value)."""
    parts = [varbyte_decode(b).astype(np.int64) for b in pos_blobs]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(parts)


def absolute_positions(deltas: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Flat per-token ABSOLUTE positions from delta streams with run
    lengths ``tfs`` (one run per posting; first delta of a run is the
    absolute position). Vectorized run-reset cumsum."""
    if deltas.size == 0:
        return deltas
    starts = np.zeros(tfs.size, dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    c = np.cumsum(deltas)
    base = c[starts] - deltas[starts]  # cumulative sum of all prior runs
    return c - np.repeat(base, tfs)


def flat_postings(blocks_df: DataFrame, with_positions: bool = False) -> DataFrame:
    """Blocks → one row per posting, via Arrow-batched mapInPandas.
    ``with_positions`` adds a per-posting array<int> of term positions
    (phrase verification); off by default so non-phrase queries never
    read the positions column (parquet column pruning)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            docs, tfs, dls, lens = decode_rows(
                pdf["doc_gaps"], pdf["tfs"], pdf["dls"], pdf["first_doc"]
            )
            out = {
                "shard_id": np.repeat(pdf["shard_id"].to_numpy(np.int32), lens),
                "field": np.repeat(pdf["field"].to_numpy(object), lens),
                "term": np.repeat(pdf["term"].to_numpy(object), lens),
                "__docid": docs,
                "tf": tfs.astype(np.int32),
                "dl": dls.astype(np.int32),
            }
            if with_positions:
                abs_pos = absolute_positions(
                    decode_position_deltas(pdf["positions"]), tfs
                ).astype(np.int32)
                # split the flat token stream back into per-posting lists
                out["positions"] = np.split(abs_pos, np.cumsum(tfs)[:-1])
            yield pd.DataFrame(out)

    cols = ["shard_id", "field", "term", "first_doc", "doc_gaps", "tfs", "dls"]
    schema = FLAT_SCHEMA
    if with_positions:
        cols.append("positions")
        schema = StructType(
            FLAT_SCHEMA.fields
            + [StructField("positions", ArrayType(IntegerType()), False)]
        )
    return blocks_df.select(*cols).mapInPandas(gen, schema=schema)
