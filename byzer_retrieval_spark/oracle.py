"""Brute-force BM25 oracle: pure Python/numpy, no Spark.

This is the correctness anchor (SURVEY §5.2): it re-implements the exact
Lucene 9.8 BM25 formula (k1=1.2, b=0.75 — the reference configures no
Similarity) over in-memory documents, with the same keyword semantics
(implicit OR, +MUST, -MUST_NOT, * match-all — SimpleQueryParser subset,
reference RetrievalWorker.java:321-343), non-scoring filters
(Utils.java:258-304), and deterministic tie-breaking (score desc, then
doc key asc). Both the DataFrame scorer and the block-max WAND scorer
must be rank-identical to this.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Any, Dict, List, Optional, Sequence, Tuple

from byzer_retrieval_spark.functions.analyzer import WHITESPACE, tokenize_py
from byzer_retrieval_spark.functions.bm25 import B, K1, quantize_dl
from byzer_retrieval_spark.plans.query import (
    ParsedKeyword,
    filters_to_predicate,
    parse_keyword,
)

import numpy as np


class BM25Oracle:
    def __init__(
        self,
        rows: Sequence[Dict[str, Any]],
        text_field: str = "content",
        key_field: str = "_id",
        mode: str = WHITESPACE,
        lucene_dl_quantization: bool = False,
    ):
        self.rows = list(rows)
        self.key_field = key_field
        self.mode = mode
        self.toks: List[List[str]] = [
            tokenize_py(r.get(text_field) or "", mode) for r in self.rows
        ]
        self.tf: List[Counter] = [Counter(t) for t in self.toks]
        dls = np.array([len(t) for t in self.toks], dtype=np.int64)
        if lucene_dl_quantization:
            dls = quantize_dl(dls)
        self.dl = dls
        self.n_docs = len(self.rows)
        # avgdl = sumTotalTermFreq / docCount with EXACT totals (§1.3)
        self.avgdl = float(np.sum([len(t) for t in self.toks])) / max(1, self.n_docs)
        self.df: Counter = Counter()
        for t in self.toks:
            self.df.update(set(t))

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def phrase_tf(self, i: int, terms: Sequence[str]) -> int:
        """Exact slop-0 phrase occurrences in doc i (count of start
        positions, like Lucene's ExactPhraseMatcher)."""
        toks = self.toks[i]
        m = len(terms)
        if m == 0 or len(toks) < m:
            return 0
        return sum(
            1
            for s in range(len(toks) - m + 1)
            if all(toks[s + j] == terms[j] for j in range(m))
        )

    def near_tf(self, i: int, terms: Sequence[str], slop: int) -> float:
        """``"a b"~N`` NEAR weight sum in doc i: each anchor position p0
        of terms[0] for which a selection of one PHYSICAL position per
        slot exists — slot 0 = p0, no position reused across slots
        (repeated-term injectivity, Lucene SloppyPhraseMatcher
        advanceRepeats) — with max(pos_j - j) - min(pos_j - j) <= slop
        contributes 1/(L+1), where L is the MINIMAL such width (round 5
        — Lucene sloppyFreq parity; mirrors wand._phrase_match but via
        independent brute-force enumeration so the oracle does not
        share the engine's greedy)."""
        from itertools import product

        toks = self.toks[i]
        pos: Dict[str, List[int]] = {}
        for p, t in enumerate(toks):
            pos.setdefault(t, []).append(p)
        if any(t not in pos for t in terms):
            return 0.0

        def matches_at(p0: int, width: int) -> bool:
            for w in range(p0 - width, p0 + 1):
                cands = [[p0]]
                ok = w <= p0 <= w + width
                for j in range(1, len(terms)):
                    cs = [
                        p
                        for p in pos[terms[j]]
                        if w + j <= p <= w + j + width
                    ]
                    if not cs:
                        ok = False
                        break
                    cands.append(cs)
                if not ok:
                    continue
                for pick in product(*cands):
                    if len(set(pick)) == len(pick):
                        return True
            return False

        total = 0.0
        for p0 in pos[terms[0]]:
            for width in range(slop + 1):
                if matches_at(p0, width):
                    total += 1.0 / (width + 1)
                    break
        return total

    def score_near(
        self, i: int, terms: Sequence[str], slop: int
    ) -> Optional[float]:
        ptf = self.near_tf(i, terms, slop)
        if ptf == 0:
            return None
        idf_sum = sum(self.idf(t) for t in terms)
        dl = float(self.dl[i])
        return idf_sum * (ptf / (ptf + K1 * (1.0 - B + B * dl / self.avgdl)))

    def prefix_match(self, i: int, stem: str) -> bool:
        """PrefixQuery membership: any indexed term starts with stem."""
        return any(t.startswith(stem) for t in self.tf[i])

    def _member_match(self, i: int, m: Tuple) -> bool:
        """+(...) group member match — members may be any clause kind
        (plans/query.ParsedKeyword.any_groups_ext)."""
        if m[0] == "term":
            return self.tf[i].get(m[1], 0) > 0
        if m[0] == "phrase":
            return (
                self.phrase_tf(i, m[1]) if m[2] == 0 else self.near_tf(i, m[1], m[2])
            ) > 0
        if m[0] == "prefix":
            return self.prefix_match(i, m[1])
        return self.fuzzy_match(i, m[1], m[2])

    def _member_score(self, i: int, m: Tuple) -> Optional[float]:
        """A group member's clause score (None = no match): term/phrase
        members score BM25; prefix/fuzzy members constant 1.0."""
        if m[0] == "term":
            return self.score_doc(i, (m[1],))
        if m[0] == "phrase":
            return (
                self.score_phrase(i, m[1])
                if m[2] == 0
                else self.score_near(i, m[1], m[2])
            )
        if m[0] == "prefix":
            return 1.0 if self.prefix_match(i, m[1]) else None
        return 1.0 if self.fuzzy_match(i, m[1], m[2]) else None

    def _bool_group_eval(self, i: int, g: Tuple) -> Tuple[bool, float]:
        """(matched, score) of a nested BooleanQuery group (round 4,
        group-local +/-): all musts, no nots, >= 1 should when no
        musts; score = Σ matching must+should member scores."""
        _, sh, mu, no = g
        if any(self._member_match(i, m) for m in no):
            return False, 0.0
        if mu:
            if not all(self._member_match(i, m) for m in mu):
                return False, 0.0
        elif not any(self._member_match(i, m) for m in sh):
            return False, 0.0
        sc = 0.0
        for m in dict.fromkeys(mu + sh):
            x = self._member_score(i, m)
            if x is not None:
                sc += x
        return True, sc

    def _fuzzy_expansion(
        self, word: str, max_edits: int, max_expansions: int = 50
    ) -> frozenset:
        """The engine's capped dictionary expansion, replicated over
        the oracle's vocabulary: terms within Damerau-Levenshtein (OSA)
        distance, CLOSEST ``max_expansions`` kept (ties by term order)
        — mirrors operators/filtering.expand_fuzzy exactly so engine
        and oracle agree on dense fuzzy neighborhoods."""
        from byzer_retrieval_spark.functions.editdist import osa_distance

        cache = self.__dict__.setdefault("_fz_cache", {})
        key = (word, max_edits, max_expansions)
        if key not in cache:
            cand = sorted(
                (osa_distance(t, word), t)
                for t in self.df
                if abs(len(t) - len(word)) <= max_edits
                and osa_distance(t, word) <= max_edits
            )
            cache[key] = frozenset(t for _, t in cand[:max_expansions])
        return cache[key]

    def fuzzy_match(self, i: int, word: str, max_edits: int) -> bool:
        """FuzzyQuery membership against the CAPPED expansion
        (Damerau-Levenshtein/OSA — Lucene transpositions=true parity;
        50-term cap = Lucene's maxExpansions default)."""
        exp = self._fuzzy_expansion(word, max_edits)
        return any(t in exp for t in self.tf[i])

    def score_phrase(self, i: int, terms: Sequence[str]) -> Optional[float]:
        """PhraseQuery BM25: tf = phrase freq; idf = Σ idf(member) with
        multiplicity (BM25Similarity.idfExplain over the phrase's
        TermStatistics array); length norm as for terms."""
        ptf = self.phrase_tf(i, terms)
        if ptf == 0:
            return None
        idf_sum = sum(self.idf(t) for t in terms)
        dl = float(self.dl[i])
        return idf_sum * (ptf / (ptf + K1 * (1.0 - B + B * dl / self.avgdl)))

    def score_doc(self, i: int, terms: Sequence[str]) -> Optional[float]:
        """Sum of idf*tfnorm over matching scoring terms; None if no match."""
        total, matched = 0.0, False
        for t in dict.fromkeys(terms):
            tf = self.tf[i].get(t, 0)
            if tf == 0:
                continue
            matched = True
            dl = float(self.dl[i])
            total += self.idf(t) * (tf / (tf + K1 * (1.0 - B + B * dl / self.avgdl)))
        return total if matched else None

    def search(
        self,
        keyword: Optional[str],
        filters: Optional[Dict[str, Any]] = None,
        limit: int = 10,
    ) -> List[Tuple[Any, float]]:
        """Top-k (key, score), rank-identical semantics to the engine."""
        parsed: ParsedKeyword = parse_keyword(keyword, self.mode)
        pred = filters_to_predicate(filters or {})
        out: List[Tuple[Any, float]] = []
        for i, row in enumerate(self.rows):
            if not pred(row):
                continue
            if parsed.match_all:
                out.append((row[self.key_field], 1.0))
                continue
            if parsed.empty:
                continue
            # boolean gates (non-scoring semantics of MUST_NOT; MUST both
            # gates and scores) — phrase clauses gate/score like terms
            if any(self.tf[i].get(t, 0) > 0 for t in parsed.must_not):
                continue
            if any(self.phrase_tf(i, p) > 0 for p in parsed.not_phrases):
                continue
            if any(self.near_tf(i, p, s) > 0 for p, s in parsed.not_near_phrases):
                continue
            if parsed.must and not all(self.tf[i].get(t, 0) > 0 for t in parsed.must):
                continue
            if parsed.must_phrases and not all(
                self.phrase_tf(i, p) > 0 for p in parsed.must_phrases
            ):
                continue
            if parsed.must_near_phrases and not all(
                self.near_tf(i, p, s) > 0 for p, s in parsed.must_near_phrases
            ):
                continue
            if any(self.prefix_match(i, p) for p in parsed.not_prefixes):
                continue
            if parsed.must_prefixes and not all(
                self.prefix_match(i, p) for p in parsed.must_prefixes
            ):
                continue
            if any(self.fuzzy_match(i, w, n) for w, n in parsed.not_fuzzies):
                continue
            if parsed.must_fuzzies and not all(
                self.fuzzy_match(i, w, n) for w, n in parsed.must_fuzzies
            ):
                continue
            if parsed.any_groups_ext and not all(
                any(self._member_match(i, m) for m in g)
                for g in parsed.any_groups_ext
            ):
                continue
            # nested boolean groups (group-local +/-)
            g_score, g_matched, veto = 0.0, False, False
            for g in parsed.bool_groups:
                matched, sc = self._bool_group_eval(i, g)
                if g[0] == "not":
                    if matched:
                        veto = True
                        break
                elif g[0] == "must":
                    if not matched:
                        veto = True
                        break
                    g_score += sc
                    g_matched = True
                elif matched:
                    g_score += sc
                    g_matched = True
            if veto:
                continue
            if not (
                parsed.must or parsed.should or parsed.scoring_phrases
                or parsed.scoring_prefixes or parsed.scoring_fuzzies
                or parsed.scoring_nears or parsed.scoring_bool_groups
            ):
                continue  # pure-negative query matches nothing (Lucene)
            s = self.score_doc(i, parsed.scoring_terms)
            p_parts = [self.score_phrase(i, p) for p in parsed.scoring_phrases]
            p_parts += [self.score_near(i, p, sl) for p, sl in parsed.scoring_nears]
            p_score = sum(x for x in p_parts if x is not None)
            # prefix/fuzzy clauses: CONSTANT_SCORE rewrite → 1.0 per match
            x_hits = [self.prefix_match(i, p) for p in parsed.scoring_prefixes]
            x_hits += [self.fuzzy_match(i, w, n) for w, n in parsed.scoring_fuzzies]
            p_score += float(sum(x_hits))
            p_matched = any(x is not None for x in p_parts) or any(x_hits)
            if s is None and not p_matched and not parsed.must and not g_matched:
                continue
            out.append((row[self.key_field], (s or 0.0) + p_score + g_score))
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:limit]

    def filter_rows(
        self,
        filters: Dict[str, Any],
        sorts: Optional[List[Dict[str, str]]] = None,
        limit: Optional[int] = None,
    ) -> List[Dict[str, Any]]:
        """Filter-mode query (no scoring), multi-sort, limit."""
        pred = filters_to_predicate(filters or {})
        rows = [r for r in self.rows if pred(r)]
        for s in reversed(sorts or []):
            for fname, direction in s.items():
                rows.sort(key=lambda r: r.get(fname), reverse=str(direction).lower() == "desc")
        return rows[:limit] if limit is not None else rows


