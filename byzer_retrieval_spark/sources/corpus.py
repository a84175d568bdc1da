"""Deterministic synthetic source-code corpus (FIXTURES.md §F1).

Input-table shape per BASELINE.json input_hint:
    (repo string, path string, commit string, lang string, content string)

Every cell is a PURE FUNCTION of the row index ``i`` (splitmix64-based),
so the corpus is identical no matter how Spark partitions the generating
range — that's what makes per-partition generation scale to bench sizes
(the driver generates each partition's rows inside ``mapInPandas``; no
driver-side materialization, no external data, no RNG state shared
across partitions).

Skew guarantees (FIXTURES §F1): the Zipf slot table gives >=5 keywords
(import, return, def, class, self) df > 0.5·N at every scale —
exercising block-max skipping and salted hot-term splits — and every doc
carries two unique ``sym_{i}_{j}`` identifiers, so >=2N terms have
df == 1 (unique-term queries).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

SEED = 42

# fixed token vocabulary, Zipf-skewed like real code
_VOCAB: List[str] = [
    "import", "return", "def", "class", "self",
    "if", "for", "public", "void", "else",
    "while", "int", "str", "none", "true",
    "false", "try", "except", "raise", "lambda",
    "static", "final", "var", "let", "const",
    "func", "fn", "struct", "impl", "trait",
    "match", "case", "break", "continue", "pass",
    "yield", "async", "await", "with", "assert",
    "print(x)", "x=1;", "f(x):", "{y}", "[i]",
    "->", "==", "!=", "&&", "||",
]

_EXTS = ["py", "java", "scala", "go", "rs", "md"]
_LANGS = {"py": "python", "java": "java", "scala": "scala",
          "go": "go", "rs": "rust", "md": "markdown"}
_PKGS = ["core", "utils", "engine", "index", "query", "store", "net"]
_NAMES = ["main", "worker", "master", "codec", "merge", "scan", "shard"]

_SLOTS = 1024


def _zipf_slot_table() -> np.ndarray:
    """1024 slots over the vocab with weight ∝ 1/(rank+1)."""
    ranks = np.arange(len(_VOCAB), dtype=np.float64)
    w = 1.0 / (ranks + 1.0)
    counts = np.maximum(1, np.round(w / w.sum() * _SLOTS)).astype(np.int64)
    table = np.repeat(np.arange(len(_VOCAB)), counts)
    if table.size < _SLOTS:  # pad with the hottest token
        table = np.concatenate([np.zeros(_SLOTS - table.size, dtype=np.int64), table])
    return table[:_SLOTS]


_SLOT_TABLE = _zipf_slot_table()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (public-domain mixer)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def gen_batch(ids: np.ndarray) -> pd.DataFrame:
    """Rows (repo, path, commit, lang, content) for doc indices ``ids``."""
    import hashlib

    ids = np.ascontiguousarray(ids, dtype=np.int64)
    u = ids.astype(np.uint64)
    h0 = _splitmix64(u * np.uint64(2654435761) + np.uint64(SEED))
    lengths = (30 + (h0 % np.uint64(371))).astype(np.int64)  # 30..400 tokens
    ends = np.cumsum(lengths)
    starts = ends - lengths
    total = int(ends[-1]) if ids.size else 0

    # token draw: slot = splitmix64(doc_key * M + position) % 1024
    doc_key = np.repeat(h0, lengths)
    pos = np.arange(total, dtype=np.uint64) - np.repeat(starts, lengths).astype(np.uint64)
    hv = _splitmix64(doc_key * np.uint64(6364136223846793005) + pos)
    vocab_idx = _SLOT_TABLE[(hv % np.uint64(_SLOTS)).astype(np.int64)]
    vocab_arr = np.array(_VOCAB, dtype=object)
    tokens = vocab_arr[vocab_idx]

    contents = []
    for k in range(ids.size):
        toks = tokens[starts[k] : ends[k]].tolist()
        i = int(ids[k])
        # two unique rare identifiers per doc (df == 1 guarantees)
        toks[3] = f"sym_{i}_0"
        toks[min(10, len(toks) - 1)] = f"sym_{i}_1"
        # newline every 10 tokens → multi-line source-code-ish text
        lines = [" ".join(toks[j : j + 10]) for j in range(0, len(toks), 10)]
        contents.append("\n".join(lines))

    exts = [_EXTS[int(x % np.uint64(len(_EXTS)))] for x in h0]
    repos = [f"org{i % 7}/repo{i % 23}" for i in ids]
    paths = [
        f"src/{_PKGS[int(h % np.uint64(7)) % len(_PKGS)]}/"
        f"{_NAMES[int(h >> np.uint64(8)) % len(_NAMES)]}_{i}.{e}"
        for i, h, e in zip(ids, h0, exts)
    ]
    commits = [
        hashlib.sha1(f"{r}/{p}".encode()).hexdigest()[:12]
        for r, p in zip(repos, paths)
    ]
    langs = [_LANGS[e] for e in exts]
    return pd.DataFrame(
        {"repo": repos, "path": paths, "commit": commits,
         "lang": langs, "content": contents}
    )


def gen_embedding_batch(ids: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic L2-normalized embeddings for doc indices ``ids`` —
    a pure function of (id, column), so any partitioning of the
    generating range yields identical vectors (same contract as
    ``gen_batch``)."""
    u = np.ascontiguousarray(ids, dtype=np.int64).astype(np.uint64)
    cols = np.arange(dim, dtype=np.uint64)
    hv = _splitmix64(
        u[:, None] * np.uint64(0x9E3779B1) + cols[None, :] + np.uint64(SEED)
    )
    x = (hv >> np.uint64(11)).astype(np.float64) / float(1 << 53) * 2.0 - 1.0
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return x.astype(np.float32)


def gen_rows(n: int) -> List[dict]:
    """Small-scale list-of-dicts form for the pytest oracle."""
    return gen_batch(np.arange(n)).to_dict("records")


def corpus_df(spark, n_files: int, partitions: int = 32,
              embedding_dim: int = 0):
    """Distributed corpus: spark.range → per-partition mapInPandas.

    Scale story: generation is embarrassingly parallel and stateless —
    at 10^12 files you raise ``partitions``; no shuffle, no driver data.
    ``embedding_dim`` > 0 appends a deterministic L2-normalized
    ``embedding`` array<float> column (for the ANN bench shapes).
    """
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        StringType,
        StructField,
        StructType,
    )

    fields = [StructField(c, StringType(), False)
              for c in ("repo", "path", "commit", "lang", "content")]
    if embedding_dim > 0:
        fields.append(
            StructField("embedding", ArrayType(FloatType()), False)
        )
    out_schema = StructType(fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                ids = b["id"].to_numpy()
                pdf = gen_batch(ids)
                if embedding_dim > 0:
                    pdf["embedding"] = list(
                        gen_embedding_batch(ids, embedding_dim)
                    )
                yield pdf

    return (
        spark.range(0, n_files, numPartitions=partitions)
        .mapInPandas(gen, schema=out_schema)
    )
