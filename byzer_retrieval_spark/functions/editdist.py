"""Edit distances shared by the fuzzy-query engine path and the
brute-force oracle.

``osa_distance`` is the optimal-string-alignment (restricted Damerau-
Levenshtein) distance: insert / delete / substitute / transpose-
adjacent, each 1 edit, no substring edited twice. This matches Lucene
FuzzyQuery's default ``transpositions=true`` automaton semantics
(reference: the SimpleQueryParser fuzzy operator the reference exposes,
RetrievalWorker.java:339) — a transposition like ``form``→``from``
counts as ONE edit, where classic Levenshtein counts two.
"""

from __future__ import annotations


def osa_distance(a: str, b: str) -> int:
    """Restricted Damerau-Levenshtein (OSA), three-row DP."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    lb = len(b)
    prev2: list = []
    prev = list(range(lb + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j in range(1, lb + 1):
            cb = b[j - 1]
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            if i > 1 and j > 1 and ca == b[j - 2] and a[i - 2] == cb:
                d = min(d, prev2[j - 2] + 1)
            cur.append(d)
        prev2, prev = prev, cur
    return prev[-1]
