"""Query AST mirroring the reference Query::op surface
(`xapian-core/include/xapian/query.h:76-275`).

`describe()` follows the reference's Query description format so the parser
golden tests from `api_queryparser.cc` can be ported directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    def describe(self) -> str:
        raise NotImplementedError

    def __str__(self) -> str:
        return f"Query({self.describe()})"

    # -- Query introspection (query.h:560-660) -----------------------------

    def get_type(self) -> str:
        """Query::get_type: the node's operator name (LEAF_TERM for a
        plain term, OP_* otherwise — lowercased class name here, same
        information)."""
        return type(self).__name__.lower()

    def get_num_subqueries(self) -> int:
        """Query::get_num_subqueries."""
        if hasattr(self, "subs"):
            return len(self.subs)
        if hasattr(self, "left"):
            return 2
        if hasattr(self, "sub"):
            return 1
        return 0

    def get_subquery(self, n: int) -> "Node":
        """Query::get_subquery."""
        if hasattr(self, "subs"):
            return self.subs[n]
        if hasattr(self, "left"):
            return (self.left, self.right)[n]
        if hasattr(self, "sub") and n == 0:
            return self.sub
        raise IndexError(n)

    def get_length(self) -> int:
        """Query::get_length: total wqf over the query's terms — the
        query_length the k3/wqf weight components normalize by."""
        return sum(t.wqf for t in leaf_terms(self))

    def get_terms(self) -> list[str]:
        """Query::get_terms_begin/_end: terms in position order, with
        duplicates (get_unique_terms_begin dedups — use set())."""
        return [t.term for t in leaf_terms(self)]

    def get_unique_terms(self) -> list[str]:
        """Query::get_unique_terms_begin/_end (sorted, deduped)."""
        return sorted({t.term for t in leaf_terms(self)})

    def empty(self) -> bool:
        """Query::empty — true only for MatchNothing, like the reference's
        default-constructed Query."""
        return isinstance(self, MatchNothing)

    def serialise(self) -> str:
        """Query::serialise: portable round-trip.  The reference emits a
        private binary format; JSON over the dataclass tree carries the
        same state (documented divergence), unserialise() restores it."""
        import json

        def enc(n: "Node"):
            d = {"op": type(n).__name__}
            import dataclasses

            if dataclasses.is_dataclass(n):
                for f in dataclasses.fields(n):
                    v = getattr(n, f.name)
                    if isinstance(v, Node):
                        v = enc(v)
                    elif isinstance(v, tuple) and v and isinstance(
                        v[0], Node
                    ):
                        v = [enc(s) for s in v]
                    elif isinstance(v, tuple):
                        v = list(v)
                    d[f.name] = v
            return d

        return json.dumps(enc(self), sort_keys=True)

    @staticmethod
    def unserialise(s: str) -> "Node":
        import dataclasses
        import json
        import sys

        mod = sys.modules[__name__]

        def dec(d):
            cls = getattr(mod, d.pop("op"))
            kw = {}
            for f in dataclasses.fields(cls):
                if f.name not in d:
                    continue
                v = d[f.name]
                if isinstance(v, dict) and "op" in v:
                    v = dec(v)
                elif isinstance(v, list) and v and isinstance(v[0], dict) \
                        and "op" in v[0]:
                    v = tuple(dec(x) for x in v)
                elif isinstance(v, list):
                    v = tuple(v)
                kw[f.name] = v
            return cls(**kw)

        return dec(json.loads(s))


@dataclass(frozen=True)
class MatchAll(Node):
    def describe(self) -> str:
        return "<alldocuments>"


@dataclass(frozen=True)
class MatchNothing(Node):
    def describe(self) -> str:
        return ""


@dataclass(frozen=True)
class Term(Node):
    term: str
    pos: int = 0  # query position (0 = none)
    wqf: int = 1

    def describe(self) -> str:
        s = self.term
        if self.wqf != 1:
            s += f"#{self.wqf}"
        if self.pos:
            s += f"@{self.pos}"
        return s


def _infix(op_name: str, subs: tuple[Node, ...]) -> str:
    return "(" + f" {op_name} ".join(s.describe() for s in subs) + ")"


@dataclass(frozen=True)
class And(Node):
    subs: tuple[Node, ...]

    def describe(self) -> str:
        return _infix("AND", self.subs)


@dataclass(frozen=True)
class Or(Node):
    subs: tuple[Node, ...]

    def describe(self) -> str:
        return _infix("OR", self.subs)


@dataclass(frozen=True)
class AndNot(Node):
    left: Node
    right: Node

    def describe(self) -> str:
        return f"({self.left.describe()} AND_NOT {self.right.describe()})"


@dataclass(frozen=True)
class AndMaybe(Node):
    left: Node
    right: Node

    def describe(self) -> str:
        return f"({self.left.describe()} AND_MAYBE {self.right.describe()})"


@dataclass(frozen=True)
class Xor(Node):
    subs: tuple[Node, ...]

    def describe(self) -> str:
        return _infix("XOR", self.subs)


@dataclass(frozen=True)
class Filter(Node):
    """OP_FILTER: docs matching all; only `left` contributes weight
    (query.h:118-126)."""

    left: Node
    right: Node

    def describe(self) -> str:
        return f"({self.left.describe()} FILTER {self.right.describe()})"


@dataclass(frozen=True)
class Max(Node):
    subs: tuple[Node, ...]

    def describe(self) -> str:
        return _infix("MAX", self.subs)


@dataclass(frozen=True)
class Synonym(Node):
    subs: tuple[Node, ...]

    def describe(self) -> str:
        return _infix("SYNONYM", self.subs)


@dataclass(frozen=True)
class ScaleWeight(Node):
    factor: float
    sub: Node

    def describe(self) -> str:
        return f"{self.factor} * {self.sub.describe()}"


@dataclass(frozen=True)
class Phrase(Node):
    """OP_PHRASE: terms in order within `window` positions; exact phrase when
    window == len(subs)."""

    subs: tuple[Node, ...]
    window: int

    def describe(self) -> str:
        return "(" + f" PHRASE {self.window} ".join(s.describe() for s in self.subs) + ")"


@dataclass(frozen=True)
class Near(Node):
    """OP_NEAR: terms within `window`, any order, distinct positions."""

    subs: tuple[Node, ...]
    window: int

    def describe(self) -> str:
        return "(" + f" NEAR {self.window} ".join(s.describe() for s in self.subs) + ")"


@dataclass(frozen=True)
class ValueWeightSource(Node):
    """ExternalPostList / ValueWeightPostingSource
    (externalpostlist.cc, api/postingsource.cc): matches every doc whose
    value column is non-null, weighted by that column (x scale).  Spark
    values are real typed columns, so no sortable_serialise round-trip."""

    field: str
    scale: float = 1.0

    def describe(self) -> str:
        return f"VALUE_WEIGHT {self.field} * {self.scale}"


@dataclass(frozen=True)
class DecreasingValueWeightSource(ValueWeightSource):
    """DecreasingValueWeightPostingSource (api/decvalwtsource.cc): same
    matches and weights as ValueWeightSource, plus the caller's promise
    that within docid range [range_start, range_end] (range_end 0 = to the
    end) weights are non-increasing by docid.  The promise is purely an
    early-termination licence (decvalwtsource.cc:94-100); the planner uses
    it to prune the in-range scan to the first k docids for top-k."""

    range_start: int = 0
    range_end: int = 0

    def describe(self) -> str:
        return (
            f"DECREASING_VALUE_WEIGHT {self.field} * {self.scale} "
            f"[{self.range_start}, {self.range_end or 'inf'}]"
        )


@dataclass(frozen=True)
class FixedWeightSource(Node):
    """FixedWeightPostingSource (api/postingsource.cc:406-458): matches
    EVERY document (it walks the all-docs postlist) with a constant weight
    — the reference's way to graft a flat boost onto a query via
    OP_AND_MAYBE etc.  maxweight == the fixed weight."""

    weight: float = 1.0

    def describe(self) -> str:
        return f"FIXED_WEIGHT {self.weight}"


@dataclass(frozen=True)
class ValueMapSource(Node):
    """ValueMapPostingSource (api/postingsource.cc:296-395): matches every
    doc whose value column is non-null (ValuePostingSource semantics),
    weighted by mapping[value] or default_weight when the value is not in
    the map; maxweight = max(map values, default)."""

    field: str
    mapping: tuple[tuple[str, float], ...] = ()
    default_weight: float = 0.0

    def describe(self) -> str:
        return (
            f"VALUE_MAP {self.field} ({len(self.mapping)} keys, "
            f"default {self.default_weight})"
        )


@dataclass(frozen=True)
class EliteSet(Node):
    """OP_ELITE_SET: keep the set_size best subqueries by maxweight, then
    OR them (query.h:166-213; selection queryinternal.cc:433-439, default
    set_size 10 at query.h:194).  Expanded at plan time using term stats;
    ties broken by term string for determinism (the reference's
    nth_element is unstable — documented divergence)."""

    subs: tuple[Node, ...]
    set_size: int = 10

    def describe(self) -> str:
        return (
            "(" + f" ELITE_SET {self.set_size} ".join(
                s.describe() for s in self.subs
            ) + ")"
        )


@dataclass(frozen=True)
class EditDistance(Node):
    """OP_EDIT_DISTANCE: expand to dictionary terms within edit distance
    (queryinternal.cc:2005-2059, editdistance.cc).  Our distance is plain
    Levenshtein (Spark/DuckDB builtin) — the reference counts
    transpositions as 1 (documented divergence)."""

    pattern: str
    max_edit: int = 2
    combiner: str = "synonym"
    prefix: str = ""

    def describe(self) -> str:
        return f"EDIT_DISTANCE {self.pattern}~{self.max_edit}"


@dataclass(frozen=True)
class Wildcard(Node):
    pattern: str  # head before '*'
    limit: int = 0
    most_frequent: bool = False
    # limit policy when > limit terms match (queryinternal.cc:213-267):
    # "error" (WILDCARD_LIMIT_ERROR, the default), "first"
    # (WILDCARD_LIMIT_FIRST: keep the N sort-order-first terms), or
    # most_frequent=True (WILDCARD_LIMIT_MOST_FREQUENT)
    limit_mode: str = "error"
    combiner: str = "synonym"  # reference default: OP_SYNONYM
    # glob-style patterns (query.h:327-339, WILDCARD_PATTERN_MULTI/SINGLE,
    # Xapian 1.5): '*' matches any run, '?' exactly one char, anywhere in
    # the word.  When either is set, `pattern` is the full glob (no
    # implicit trailing '*').
    multi: bool = False
    single: bool = False

    def describe(self) -> str:
        if self.multi or self.single:
            return f"WILDCARD GLOB {self.pattern}"
        return f"WILDCARD SYNONYM {self.pattern}"


@dataclass(frozen=True)
class ValueRange(Node):
    """OP_VALUE_RANGE over a typed doc column (never weighted,
    query.h:152-156)."""

    field: str
    lo: object = None
    hi: object = None

    def describe(self) -> str:
        return f"VALUE_RANGE {self.field} {self.lo} {self.hi}"


def leaf_terms(node: Node) -> list[Term]:
    """All Term leaves, in-order (for single-scan planning + wqf counting)."""
    out: list[Term] = []

    def walk(nd: Node) -> None:
        if isinstance(nd, Term):
            out.append(nd)
        elif isinstance(nd, (And, Or, Xor, Max, Synonym, Phrase, Near)):
            for s in nd.subs:
                walk(s)
        elif isinstance(nd, (AndNot, AndMaybe, Filter)):
            walk(nd.left)
            walk(nd.right)
        elif isinstance(nd, ScaleWeight):
            walk(nd.sub)
        # MatchAll/MatchNothing/Wildcard/ValueRange: no Term leaves here
        # (wildcards are expanded before planning).

    walk(node)
    return out
