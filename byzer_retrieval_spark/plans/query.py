"""SearchQuery: the engine's (only) query IR, mirroring the reference.

The reference's whole query language is a JSON ``SearchQuery`` record
(reference: records/SearchQuery.java:18-89):

    {database, table, filters, sorts, keyword?, fields, vector?,
     vectorField?, limit}

- ``filters`` is a nested boolean tree ``{"and":[...]} / {"or":[...]}``
  whose leaves are exact ``{"field": f, "value": v}`` or range
  ``{"field": f, "min": a, "max": b}`` predicates, attached as
  NON-SCORING clauses (reference: Utils.java:258-304, Occur.FILTER at
  Utils.java:303) — filters never affect BM25 scores.
- ``keyword`` is parsed by Lucene's SimpleQueryParser with every field
  weighted 1.0 (reference: RetrievalWorker.java:321-343). Implemented:
  implicit OR of terms, ``+term`` (MUST), ``-term`` (MUST_NOT), ``*``
  match-all (RetrievalWorker.java:336-338), ``"phrase"`` (exact) and
  ``"phrase"~N`` (NEAR), ``stem*`` prefixes, ``word~N`` fuzzies,
  ``a | b`` OR, and ``(...)`` groups — nesting-aware, any member kind,
  with ``+(...)`` as a must-ANY gate, ``-(...)`` De-Morganed into
  NOT clauses, and (round 4) GROUP-LOCAL ``+``/``-`` members compiled
  to nested-BooleanQuery ``bool_groups`` — the full SimpleQueryParser
  surface.
- ``sorts`` ``[{"field": "desc"|"asc"}, ...]`` (reference:
  Utils.java:306-329).

Compilation targets: a Spark ``Column`` for the DataFrame paths and a
plain-Python predicate for the brute-force oracle used in tests.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Dict, List, Optional, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

from byzer_retrieval_spark.functions.analyzer import (
    WHITESPACE,
    _WS_RE,
    tokenize_py,
)

MATCH_ALL = "*"


@dataclass
class SearchQuery:
    database: str = "default"
    table: str = "default"
    keyword: Optional[str] = None
    fields: List[str] = dc_field(default_factory=list)
    filters: Dict[str, Any] = dc_field(default_factory=dict)
    sorts: List[Dict[str, str]] = dc_field(default_factory=list)
    vector: List[float] = dc_field(default_factory=list)
    vector_field: Optional[str] = None
    limit: int = 10

    @classmethod
    def from_json(cls, s: str) -> "List[SearchQuery]":
        raw = json.loads(s)
        if isinstance(raw, dict):
            raw = [raw]
        return [
            cls(
                database=q.get("database", "default"),
                table=q.get("table", "default"),
                keyword=q.get("keyword"),
                fields=list(q.get("fields", [])),
                filters=q.get("filters", {}) or {},
                sorts=list(q.get("sorts", [])),
                vector=list(q.get("vector", [])),
                vector_field=q.get("vectorField"),
                limit=int(q.get("limit", 10)),
            )
            for q in raw
        ]

    def to_json(self) -> str:
        return json.dumps(
            {
                "database": self.database,
                "table": self.table,
                "keyword": self.keyword,
                "fields": self.fields,
                "filters": self.filters,
                "sorts": self.sorts,
                "vector": self.vector,
                "vectorField": self.vector_field,
                "limit": self.limit,
            }
        )


@dataclass(frozen=True)
class ParsedKeyword:
    """SimpleQueryParser subset: OR of SHOULD clauses + MUST / MUST_NOT,
    where a clause is a term or a quoted phrase ("a b", slop 0)."""

    should: Tuple[str, ...]
    must: Tuple[str, ...]
    must_not: Tuple[str, ...]
    match_all: bool = False
    phrases: Tuple[Tuple[str, ...], ...] = ()       # SHOULD phrases
    must_phrases: Tuple[Tuple[str, ...], ...] = ()
    not_phrases: Tuple[Tuple[str, ...], ...] = ()
    prefixes: Tuple[str, ...] = ()                  # SHOULD prefixes
    must_prefixes: Tuple[str, ...] = ()
    not_prefixes: Tuple[str, ...] = ()
    fuzzies: Tuple[Tuple[str, int], ...] = ()       # SHOULD (word, max_edits)
    must_fuzzies: Tuple[Tuple[str, int], ...] = ()
    not_fuzzies: Tuple[Tuple[str, int], ...] = ()
    # +(a b) groups: doc must match AT LEAST ONE member (the group's
    # members also score as ordinary SHOULD clauses — flattening
    # preserves Lucene's nested-BooleanQuery score sum).
    # ``must_any_groups`` is the TERM projection (back-compat surface);
    # ``any_groups_ext`` is canonical: each member is a descriptor
    # ("term", t) | ("phrase", terms, slop) | ("prefix", stem) |
    # ("fuzzy", word, max_edits) — so +("a b" c*) gates correctly on
    # phrase and prefix members too. Nested PLAIN groups flatten into
    # the enclosing group (disjunction of a disjunction); groups with
    # group-local +/- members compile to ``bool_groups`` instead
    # (round 4).
    must_any_groups: Tuple[Tuple[str, ...], ...] = ()
    any_groups_ext: Tuple[Tuple[Tuple, ...], ...] = ()
    # groups with GROUP-LOCAL ``+``/``-`` members (round 4 — the last
    # SimpleQueryParser gap): each entry is (kind, should, must, not_)
    # where kind is the group's top-level sign ('should'|'must'|'not')
    # and the three member tuples hold descriptors as in
    # any_groups_ext. Semantics = Lucene's nested BooleanQuery: the
    # group matches a doc iff all ``must`` members match, no ``not_``
    # member matches, and (when ``must`` is empty) >= 1 ``should``
    # member matches; its score is the sum of matching must+should
    # member scores and is added ONLY for docs the group matches.
    # Executed by the declarative scorer (scorer_df) — the WAND and
    # batch paths route such queries there (rare syntax).
    bool_groups: Tuple[Tuple[str, Tuple[Tuple, ...], Tuple[Tuple, ...], Tuple[Tuple, ...]], ...] = ()
    # ``"a b"~N`` sloppy phrases: ((terms...), slop) per clause.
    # Semantics (round 4 — Lucene SloppyPhraseMatcher minimal-match
    # condition for ANY arity of distinct terms): an anchor position p0
    # of terms[0] matches when a selection of one position per term
    # exists with max(pos_j - j) - min(pos_j - j) <= slop; phrase_tf =
    # count of such anchors, each weighted 1 (Lucene weights
    # 1/(matchLength+1) — documented deviation); repeated terms require
    # >= multiplicity occurrences (necessary-condition gate, lenient
    # beyond — documented).
    near_phrases: Tuple[Tuple[Tuple[str, ...], int], ...] = ()      # SHOULD
    must_near_phrases: Tuple[Tuple[Tuple[str, ...], int], ...] = ()
    not_near_phrases: Tuple[Tuple[Tuple[str, ...], int], ...] = ()

    @property
    def scoring_terms(self) -> Tuple[str, ...]:
        # Lucene sums scores of all matching scoring clauses: MUST and
        # SHOULD both score; MUST_NOT never does.
        return tuple(dict.fromkeys(self.must + self.should))

    @property
    def scoring_phrases(self) -> Tuple[Tuple[str, ...], ...]:
        # MUST phrases score too (like MUST terms)
        return tuple(dict.fromkeys(self.must_phrases + self.phrases))

    @property
    def all_phrases(self) -> Tuple[Tuple[str, ...], ...]:
        return tuple(
            dict.fromkeys(self.must_phrases + self.phrases + self.not_phrases)
        )

    @property
    def scoring_nears(self) -> Tuple[Tuple[Tuple[str, ...], int], ...]:
        return tuple(dict.fromkeys(self.must_near_phrases + self.near_phrases))

    @property
    def all_nears(self) -> Tuple[Tuple[Tuple[str, ...], int], ...]:
        return tuple(
            dict.fromkeys(
                self.must_near_phrases + self.near_phrases + self.not_near_phrases
            )
        )

    @property
    def dedup_should_nears(self) -> Tuple[Tuple[Tuple[str, ...], int], ...]:
        m = set(self.must_near_phrases)
        return tuple(p for p in dict.fromkeys(self.near_phrases) if p not in m)

    @property
    def phrase_terms(self) -> Tuple[str, ...]:
        """Every distinct term appearing in any phrase — exact or
        sloppy (their postings — with positions — must be scanned)."""
        out: List[str] = []
        for p in self.all_phrases:
            out.extend(p)
        for p, _ in self.all_nears:
            out.extend(p)
        return tuple(dict.fromkeys(out))

    @property
    def scoring_prefixes(self) -> Tuple[str, ...]:
        return tuple(dict.fromkeys(self.must_prefixes + self.prefixes))

    @property
    def all_prefixes(self) -> Tuple[str, ...]:
        return tuple(
            dict.fromkeys(self.must_prefixes + self.prefixes + self.not_prefixes)
        )

    # ---- deduped clause lists for the executors -----------------------
    # Lucene's BooleanQuery dedups identical SHOULD clauses and a clause
    # that is both MUST and SHOULD scores once; the engine paths build
    # their specs from these so duplicate clauses never double-count
    # (matching scoring_terms' dict.fromkeys(must + should) semantics).
    @property
    def dedup_should_phrases(self) -> Tuple[Tuple[str, ...], ...]:
        m = set(self.must_phrases)
        return tuple(p for p in dict.fromkeys(self.phrases) if p not in m)

    @property
    def dedup_should_prefixes(self) -> Tuple[str, ...]:
        m = set(self.must_prefixes)
        return tuple(p for p in dict.fromkeys(self.prefixes) if p not in m)

    @property
    def dedup_should_fuzzies(self) -> Tuple[Tuple[str, int], ...]:
        m = set(self.must_fuzzies)
        return tuple(p for p in dict.fromkeys(self.fuzzies) if p not in m)

    @property
    def scoring_fuzzies(self) -> Tuple[Tuple[str, int], ...]:
        return tuple(dict.fromkeys(self.must_fuzzies + self.fuzzies))

    @property
    def all_fuzzies(self) -> Tuple[Tuple[str, int], ...]:
        return tuple(
            dict.fromkeys(self.must_fuzzies + self.fuzzies + self.not_fuzzies)
        )

    @property
    def scoring_bool_groups(self) -> bool:
        """True when some nested-boolean group can contribute matches
        (a 'not'-kind group only excludes; an all-negative group
        matches nothing)."""
        return any(
            kind in ("should", "must") and (sh or mu)
            for kind, sh, mu, _ in self.bool_groups
        )

    @property
    def empty(self) -> bool:
        return not (
            self.should or self.must or self.must_not or self.match_all
            or self.all_phrases or self.all_prefixes or self.all_fuzzies
            or self.must_any_groups or self.all_nears or self.bool_groups
        )


_PHRASE_RE = None  # compiled lazily (module import order)


def _extract_groups(s: str):
    """Split top-level parenthesized groups (nesting-aware, parens
    inside quotes ignored) off ``s``. Returns (remainder, [(sign,
    body)]) where sign is '', '+' or '-'; an unbalanced '(' is left in
    the remainder untouched."""
    out: List[str] = []
    groups: List[Tuple[str, str]] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == '"':
            j = s.find('"', i + 1)
            if j == -1:
                out.append(s[i:])
                break
            out.append(s[i : j + 1])
            i = j + 1
            continue
        is_signed = c in "+-" and i + 1 < n and s[i + 1] == "("
        if c == "(" or is_signed:
            sign = c if is_signed else ""
            j = i + 1 if is_signed else i  # position of '('
            depth, k, end = 0, j, -1
            while k < n:
                ch = s[k]
                if ch == '"':
                    q = s.find('"', k + 1)
                    if q == -1:
                        break
                    k = q + 1
                    continue
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = k
                        break
                k += 1
            if end >= 0:
                groups.append((sign, s[j + 1 : end]))
                out.append(" ")
                i = end + 1
            else:
                out.append(c)
                i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out), groups


def _group_members(
    body: str, mode: str
) -> Tuple[List[Tuple], List[Tuple], List[Tuple]]:
    """Atoms of a group body as (should, must, not_) — descriptors
    ("term", t), ("phrase", toks, slop), ("prefix", stem),
    ("fuzzy", word, n). ``+atom`` / ``-atom`` INSIDE a group are
    GROUP-LOCAL MUST / MUST_NOT (round 4 — Lucene nests a full
    BooleanQuery; any atom kind may carry a sign). Nested PLAIN groups
    flatten into ``should`` (a disjunction of a disjunction is the flat
    disjunction — exact); a nested ``-(...)`` group's atoms land in
    ``not_`` (they must NOT become positive matches — that would
    invert the query); a nested ``+(...)`` flattens as plain (a must
    inside a disjunction is out of scope, documented). Signs on atoms
    of NESTED groups hoist to the ENCLOSING group's buckets (one-level
    sign flattening — documented deviation for deep nesting)."""
    import re as _re

    should: List[Tuple] = []
    musts: List[Tuple] = []
    negs: List[Tuple] = []

    def _bucket(sign: str) -> List[Tuple]:
        return musts if sign == "+" else negs if sign == "-" else should

    def on_ph(m: "_re.Match") -> str:
        sign = m.group(1)
        toks = tuple(tokenize_py(m.group(2), mode))
        slop = int(m.group(3) or 0)
        if len(toks) == 1:
            _bucket(sign).append(("term", toks[0]))
        elif toks:
            _bucket(sign).append(("phrase", toks, slop))
        return " "

    rest = _re.sub(r'([+-]?)"([^"]*)"(?:~(\d+))?', on_ph, body)
    rest, inner = _extract_groups(rest)
    for sign, b in inner:
        sub_sh, sub_mu, sub_no = _group_members(b, mode)
        if sign == "-":
            # NOT(sub-disjunction): every positive atom becomes a NOT;
            # double negation inside stays out of scope → also NOT
            # (conservative: never promotes an excluded atom to a match)
            negs.extend(sub_sh + sub_mu + sub_no)
        else:
            should.extend(sub_sh)
            musts.extend(sub_mu)
            negs.extend(sub_no)
    fuzzy_re = _re.compile(r"^(.+?)~(\d*)$")
    for raw in (t for t in _WS_RE.split(rest) if t and t != "|"):
        bucket = should
        if raw[0] in "+-" and len(raw) > 1:
            bucket, raw = _bucket(raw[0]), raw[1:]
        fz = fuzzy_re.match(raw)
        if fz:
            stem = tokenize_py(fz.group(1), mode)
            if len(stem) == 1:
                bucket.append(("fuzzy", stem[0], int(fz.group(2) or 2)))
                continue
        if raw.endswith("*") and len(raw) > 1:
            stem = tokenize_py(raw[:-1], mode)
            if len(stem) == 1:
                bucket.append(("prefix", stem[0]))
                continue
        for tok in tokenize_py(raw, mode):
            bucket.append(("term", tok))
    return should, musts, negs


def parse_keyword(keyword: Optional[str], mode: str = WHITESPACE) -> ParsedKeyword:
    """Parse the keyword string; terms are run through the same analyzer
    as the index (the reference parses with the same WhitespaceAnalyzer
    it indexes with, RetrievalWorker.java:339). Quoted segments become
    phrase clauses (Lucene SimpleQueryParser ``"..."`` syntax,
    RetrievalWorker.java:339-341); a one-token phrase degrades to a term
    (as Lucene's PhraseQuery rewrite does)."""
    import re as _re

    if keyword is None or keyword.strip() == "":
        return ParsedKeyword((), (), ())
    if keyword.strip() == MATCH_ALL:
        return ParsedKeyword((), (), (), match_all=True)
    should: List[str] = []
    must: List[str] = []
    must_not: List[str] = []
    p_should: List[Tuple[str, ...]] = []
    p_must: List[Tuple[str, ...]] = []
    p_not: List[Tuple[str, ...]] = []
    n_should: List[Tuple[Tuple[str, ...], int]] = []
    n_must: List[Tuple[Tuple[str, ...], int]] = []
    n_not: List[Tuple[Tuple[str, ...], int]] = []
    x_should: List[str] = []
    x_must: List[str] = []
    x_not: List[str] = []
    z_should: List[Tuple[str, int]] = []
    z_must: List[Tuple[str, int]] = []
    z_not: List[Tuple[str, int]] = []

    # ---- groups first: (a b) / +(a b) / -(a b), balanced + quote-aware
    # Lucene nests a BooleanQuery per group; because the outer query is
    # a disjunction-of-clauses sum, FLATTENING member clauses into the
    # SHOULD buckets preserves scores exactly. The new semantic is the
    # gate: +(...) requires >= 1 member (must-ANY, any member kind);
    # -(...) = NOT(m1 OR m2) = -m1 -m2. Groups may contain terms,
    # phrases (with slop), prefixes, fuzzies, and nested PLAIN groups.
    any_groups: List[Tuple[str, ...]] = []
    groups_ext: List[Tuple[Tuple, ...]] = []
    bgroups: List[Tuple[str, Tuple, Tuple, Tuple]] = []
    rest0, sgroups = _extract_groups(keyword)

    def _route_members(ms: List[Tuple], t_b, p_b, nr_b, x_b, z_b) -> None:
        for m in ms:
            if m[0] == "term":
                t_b.append(m[1])
            elif m[0] == "phrase":
                (nr_b.append((m[1], m[2])) if m[2] > 0 else p_b.append(m[1]))
            elif m[0] == "prefix":
                x_b.append(m[1])
            else:
                z_b.append((m[1], m[2]))

    for sign, body in sgroups:
        g_sh, g_mu, g_no = _group_members(body, mode)
        if g_mu or g_no:
            # group-local +/- present (round 4): the group is a
            # self-contained nested BooleanQuery — its members do NOT
            # flatten into the top-level buckets (membership and score
            # are conditional on the whole group matching). Executed by
            # the declarative scorer; WAND/batch route there.
            kind = "must" if sign == "+" else ("not" if sign == "-" else "should")
            bgroups.append((kind, tuple(g_sh), tuple(g_mu), tuple(g_no)))
            continue
        members, negs = g_sh, g_no  # sign-free group: exact flattening
        if sign == "-":
            # -(...) = NOT(any member) — De Morgan; nested negs too
            _route_members(members + negs, must_not, p_not, n_not, x_not, z_not)
            continue
        # positive members score as ordinary SHOULD clauses
        _route_members(members, should, p_should, n_should, x_should, z_should)
        if sign == "+" and members:
            if all(m[0] == "term" for m in members):
                # the back-compat term projection lists ONLY all-term
                # groups — a partial (or empty) projection of a group
                # with phrase/prefix/fuzzy members would read as an
                # unsatisfiable/stricter gate to legacy consumers
                any_groups.append(tuple(m[1] for m in members))
            groups_ext.append(tuple(members))

    def on_phrase(m: "_re.Match") -> str:
        prefix, body, slop_s = m.group(1), m.group(2), m.group(3)
        toks = tuple(tokenize_py(body, mode))
        slop = int(slop_s) if slop_s else 0
        if not toks:
            return " "
        t_bucket, p_bucket, n_bucket = should, p_should, n_should
        if prefix == "+":
            t_bucket, p_bucket, n_bucket = must, p_must, n_must
        elif prefix == "-":
            t_bucket, p_bucket, n_bucket = must_not, p_not, n_not
        if len(toks) == 1:
            t_bucket.append(toks[0])
        elif slop > 0:
            # `"a b"~N`: sloppy phrase (Lucene SimpleQueryParser NEAR)
            n_bucket.append((toks, slop))
        else:
            p_bucket.append(toks)
        return " "

    rest = _re.sub(r'([+-]?)"([^"]*)"(?:~(\d+))?', on_phrase, rest0)

    # `a | b`: SimpleQueryParser's OR operator — with implicit-OR
    # semantics a standalone | is a no-op separator
    rest = _re.sub(r"(?:^|(?<=\s))\|(?=\s|$)", " ", rest)

    # split with the SAME whitespace class the analyzers use (not
    # Python's Unicode str.split), so query-side segmentation can never
    # disagree with index-side tokenization
    _FUZZY_RE = _re.compile(r"^(.+?)~(\d*)$")
    for raw in (t for t in _WS_RE.split(rest) if t):
        bucket, xbucket, zbucket = should, x_should, z_should
        if raw.startswith("+") and len(raw) > 1:
            bucket, xbucket, zbucket, raw = must, x_must, z_must, raw[1:]
        elif raw.startswith("-") and len(raw) > 1:
            bucket, xbucket, zbucket, raw = must_not, x_not, z_not, raw[1:]
        # `foo~N` / `foo~` → fuzzy clause (SimpleQueryParser FuzzyQuery,
        # default maxEdits 2); `foo*` → prefix clause (PrefixQuery) —
        # the analyzer runs on the stem in both cases
        fz = _FUZZY_RE.match(raw)
        if fz:
            stem = tokenize_py(fz.group(1), mode)
            if len(stem) == 1:
                zbucket.append((stem[0], int(fz.group(2) or 2)))
                continue
        if raw.endswith("*") and len(raw) > 1:
            stem = tokenize_py(raw[:-1], mode)
            if len(stem) == 1:
                xbucket.append(stem[0])
                continue
        for tok in tokenize_py(raw, mode):
            bucket.append(tok)
    return ParsedKeyword(
        tuple(should), tuple(must), tuple(must_not),
        phrases=tuple(p_should),
        must_phrases=tuple(p_must),
        not_phrases=tuple(p_not),
        prefixes=tuple(x_should),
        must_prefixes=tuple(x_must),
        not_prefixes=tuple(x_not),
        fuzzies=tuple(z_should),
        must_fuzzies=tuple(z_must),
        not_fuzzies=tuple(z_not),
        must_any_groups=tuple(any_groups),
        any_groups_ext=tuple(groups_ext),
        bool_groups=tuple(bgroups),
        near_phrases=tuple(n_should),
        must_near_phrases=tuple(n_must),
        not_near_phrases=tuple(n_not),
    )


# ---------------------------------------------------------------------
# Filter tree compilation
# ---------------------------------------------------------------------

def _leaf_to_column(leaf: Dict[str, Any]) -> Column:
    f = leaf["field"]
    if "value" in leaf:
        return F.col(f) == F.lit(leaf["value"])
    has_min, has_max = "min" in leaf, "max" in leaf
    if has_min and has_max:
        # inclusive both ends (Lucene newRangeQuery semantics)
        return F.col(f).between(F.lit(leaf["min"]), F.lit(leaf["max"]))
    # reference quirk: a one-sided range collapses to EXACT match on the
    # present bound (SchemaUtils.java:177-181 + Utils.java:286-291)
    if has_min:
        return F.col(f) == F.lit(leaf["min"])
    if has_max:
        return F.col(f) == F.lit(leaf["max"])
    raise ValueError(f"filter leaf needs value or min/max: {leaf!r}")


def filters_to_column(
    tree: Dict[str, Any],
    leaf_fn: Callable[[Dict[str, Any]], Column] = _leaf_to_column,
) -> Optional[Column]:
    """Nested {"and":[...]} / {"or":[...]} → one Column (non-scoring).

    ``leaf_fn`` lets callers substitute leaf compilation — used by
    operators/filtering.py to route analyzed-field leaves through a
    postings-membership flag column instead of direct equality.
    """
    if not tree:
        return None
    if "and" in tree:
        cols = [filters_to_column(t, leaf_fn) if ("and" in t or "or" in t)
                else leaf_fn(t) for t in tree["and"]]
        out = cols[0]
        for c in cols[1:]:
            out = out & c
        return out
    if "or" in tree:
        cols = [filters_to_column(t, leaf_fn) if ("and" in t or "or" in t)
                else leaf_fn(t) for t in tree["or"]]
        out = cols[0]
        for c in cols[1:]:
            out = out | c
        return out
    return leaf_fn(tree)


def filter_leaves(tree: Dict[str, Any]) -> List[Dict[str, Any]]:
    """All leaf dicts of a filter tree, in-order."""
    if not tree:
        return []
    if "and" in tree or "or" in tree:
        out: List[Dict[str, Any]] = []
        for t in tree.get("and", []) + tree.get("or", []):
            out.extend(filter_leaves(t))
        return out
    return [tree]


def _leaf_to_predicate(leaf: Dict[str, Any]) -> Callable[[Dict[str, Any]], bool]:
    f = leaf["field"]
    if "value" in leaf:
        v = leaf["value"]
        return lambda row: row.get(f) == v
    has_min, has_max = "min" in leaf, "max" in leaf
    if has_min and has_max:
        lo, hi = leaf["min"], leaf["max"]
        return lambda row: row.get(f) is not None and lo <= row[f] <= hi
    if has_min:
        v = leaf["min"]
        return lambda row: row.get(f) == v
    if has_max:
        v = leaf["max"]
        return lambda row: row.get(f) == v
    raise ValueError(f"filter leaf needs value or min/max: {leaf!r}")


def filters_to_predicate(tree: Dict[str, Any]) -> Callable[[Dict[str, Any]], bool]:
    """Same tree → pure-Python predicate (brute-force oracle path)."""
    if not tree:
        return lambda row: True
    if "and" in tree:
        preds = [filters_to_predicate(t) if ("and" in t or "or" in t)
                 else _leaf_to_predicate(t) for t in tree["and"]]
        return lambda row: all(p(row) for p in preds)
    if "or" in tree:
        preds = [filters_to_predicate(t) if ("and" in t or "or" in t)
                 else _leaf_to_predicate(t) for t in tree["or"]]
        return lambda row: any(p(row) for p in preds)
    return _leaf_to_predicate(tree)


def sorts_to_columns(sorts: List[Dict[str, str]]) -> List[Column]:
    """[{"mtime":"desc"},{"_id":"asc"}] → orderBy columns (asc default,
    matching the reference comparator, RetrievalMaster.java:225-247).
    ("mtime", "desc") tuple/list entries are accepted as a convenience
    — previously they raised a bare AttributeError."""
    cols: List[Column] = []
    for s in sorts:
        if isinstance(s, (tuple, list)):
            if not 1 <= len(s) <= 2:
                raise ValueError(f"sort entry needs (field[, dir]): {s!r}")
            items = [(s[0], s[1] if len(s) == 2 else "asc")]
        elif isinstance(s, str):
            items = [(s, "asc")]
        else:
            items = list(s.items())
        for fname, direction in items:
            c = F.col(fname)
            cols.append(c.desc() if str(direction).lower() == "desc" else c.asc())
    return cols
