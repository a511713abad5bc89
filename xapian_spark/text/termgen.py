"""Driver-side TermGenerator / Document facade.

Bindings-level parity with the reference's indexing nouns
(`xapian-core/include/xapian/termgenerator.h`, `document.h`): users of the
reference build documents by hand with `TermGenerator::index_text` /
`Document::add_posting`; this module gives them the same verbs over the
SAME tokenizer the distributed build path uses (`tokenizer.invert_doc`),
so a hand-built Document and a DataFrame-built index always agree.

The facade is a convenience for single-document / driver-side work (tests,
small tools, incremental feeds); bulk indexing stays the Arrow-vectorized
`index.builder.build_index` path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from xapian_spark.text.tokenizer import invert_doc


@dataclass
class Document:
    """xapian::Document (document.h:41-148): opaque data blob + terms
    (wdf + positions) + typed values."""

    data: str = ""
    # term -> [wdf, sorted positions]
    _terms: dict = field(default_factory=dict)
    values: dict = field(default_factory=dict)  # slot/column -> value

    def set_data(self, data: str) -> None:
        self.data = data

    def get_data(self) -> str:
        return self.data

    def add_posting(self, term: str, pos: int, wdf_inc: int = 1) -> None:
        """document.h:124-136: add a positional occurrence.  Positions
        stay sorted via bisect (O(log n) membership + O(n) insert — the
        common ascending-append case inserts at the end) instead of a
        full sort per call, which made hot terms quadratic."""
        import bisect

        ent = self._terms.setdefault(term, [0, []])
        ent[0] += wdf_inc
        i = bisect.bisect_left(ent[1], pos)
        if i == len(ent[1]) or ent[1][i] != pos:
            ent[1].insert(i, pos)

    def add_term(self, term: str, wdf_inc: int = 1) -> None:
        """document.h:138-148: add/boost a term without a position
        (boolean terms use wdf_inc=0)."""
        ent = self._terms.setdefault(term, [0, []])
        ent[0] += wdf_inc

    def add_boolean_term(self, term: str) -> None:
        """document.h:150-158: add_term with wdf_inc 0 — filter terms
        never contribute to term weighting."""
        self.add_term(term, 0)

    def remove_posting(self, term: str, pos: int, wdf_dec: int = 1) -> None:
        ent = self._terms.get(term)
        if not ent or pos not in ent[1]:
            raise ValueError(f"no such posting: {term!r}@{pos}")
        ent[1].remove(pos)
        ent[0] = max(0, ent[0] - wdf_dec)

    def remove_postings(self, term: str, pos_first: int, pos_last: int,
                        wdf_dec: int = 1) -> int:
        """document.h:186-210: remove the postings in [pos_first,
        pos_last]; returns how many were removed."""
        ent = self._terms.get(term)
        if not ent:
            raise ValueError(f"no such term: {term!r}")
        keep = [p for p in ent[1] if not (pos_first <= p <= pos_last)]
        removed = len(ent[1]) - len(keep)
        ent[1] = keep
        ent[0] = max(0, ent[0] - wdf_dec * removed)
        return removed

    def remove_term(self, term: str) -> None:
        if term not in self._terms:
            raise ValueError(f"no such term: {term!r}")
        del self._terms[term]

    def clear_terms(self) -> None:
        """document.h:212-218."""
        self._terms.clear()

    def add_value(self, slot: str, value) -> None:
        self.values[slot] = value

    def get_value(self, slot: str):
        return self.values.get(slot)

    def remove_value(self, slot: str) -> None:
        """document.h:86-92: removing is storing an absent value."""
        self.values.pop(slot, None)

    def clear_values(self) -> None:
        """document.h:94-100."""
        self.values.clear()

    def values_count(self) -> int:
        return len(self.values)

    def termlist_count(self) -> int:
        return len(self._terms)

    def serialise(self) -> str:
        """document.h:250-262: portable serialization.  The reference
        emits a private binary format; JSON carries the same state and is
        debuggable — documented divergence, unserialise() round-trips."""
        import json

        return json.dumps({
            "data": self.data,
            "terms": {
                t: [w, list(ps)] for t, (w, ps) in self._terms.items()
            },
            "values": self.values,
        }, sort_keys=True)

    @classmethod
    def unserialise(cls, s: str) -> "Document":
        import json

        d = json.loads(s)
        doc = cls(data=d["data"])
        for t, (w, ps) in d["terms"].items():
            doc._terms[t] = [int(w), [int(p) for p in ps]]
        doc.values.update(d["values"])
        return doc

    def termlist(self) -> list[tuple[str, int, list[int]]]:
        """Sorted (term, wdf, positions) — the termlist B-tree row."""
        return sorted(
            (t, w, list(ps)) for t, (w, ps) in self._terms.items()
        )

    def get_doclength(self) -> int:
        return sum(w for _, (w, _) in self._terms.items())

    def get_unique_terms(self) -> int:
        return len(self._terms)


class TermGenerator:
    """xapian::TermGenerator (termgenerator.h; internals
    termgenerator_internal.cc:281-364): tokenize text into the current
    Document, with stemming strategies, stopper modes, field prefixes, a
    query-wide position counter, and inter-field position gaps."""

    def __init__(self, mode: str = "xapian"):
        self._doc = Document()
        self._mode = mode
        self._stemmer = None
        self._strategy = "some"  # STEM_SOME, the reference default
        self._stopwords: frozenset[str] | None = None
        self._stop_mode = "all"  # STOP_ALL default when a stopper is set
        self._termpos = 0
        self._max_word_length = 64  # the glass 64-byte key cap
        self._word_breaks = False

    # -- configuration (termgenerator.h setters) --------------------------

    def set_document(self, doc: Document) -> None:
        self._doc = doc

    def get_document(self) -> Document:
        return self._doc

    def set_stemmer(self, stemmer) -> None:
        self._stemmer = stemmer

    def set_stemming_strategy(self, strategy: str) -> None:
        """"none" | "some" | "some_full_pos" | "all" | "all_z" — the
        STEM_* enum (termgenerator.h:139-152)."""
        if strategy not in ("none", "some", "some_full_pos", "all", "all_z"):
            raise ValueError(strategy)
        self._strategy = strategy

    def set_stopper(self, stopwords, mode: str = "all") -> None:
        """stopper + strategy ("none"|"all"|"stemmed", the STOP_* enum,
        termgenerator.h:155-163)."""
        self._stopwords = frozenset(stopwords) if stopwords else None
        self.set_stopper_strategy(mode)

    def set_stopper_strategy(self, mode: str) -> None:
        if mode not in ("none", "all", "stemmed"):
            raise ValueError(mode)
        self._stop_mode = mode

    def set_flags(self, flags: set | frozenset = frozenset()) -> None:
        """TermGenerator::set_flags (termgenerator.h:117-137): supported
        flags are "ngrams" (FLAG_NGRAMS — CJK/unbroken-script n-gram
        indexing, on by default in this engine's "xapian" mode and off in
        "simple"), "cjk_ngram" (the pre-1.5 alias), and "word_breaks"
        (FLAG_WORD_BREAKS, queryparser.h:637 — unbroken-script runs
        segmented by UAX#29 word-boundary rules instead of n-grams; see
        text/wordbreak.py).  FLAG_SPELLING is accepted and ignored: every
        indexed term is spelling-correctable here (documented divergence,
        see Database.get_spelling_suggestion).
        """
        known = {"ngrams", "cjk_ngram", "spelling", "word_breaks"}
        bad = set(flags) - known
        if bad:
            raise ValueError(f"unknown TermGenerator flags: {sorted(bad)}")
        if "ngrams" in flags or "cjk_ngram" in flags:
            self._mode = "xapian"
        self._word_breaks = "word_breaks" in flags

    def set_max_word_length(self, max_word_length: int) -> None:
        """TermGenerator::set_max_word_length (termgenerator.h:216-230):
        words longer than this are not indexed.  The tokenizer's built-in
        cap is the reference's 64-byte glass key limit; only tightening it
        is supported (loosening would exceed the term-table contract)."""
        if max_word_length > 64:
            raise ValueError(
                "max_word_length above the 64-byte term cap is unsupported"
            )
        self._max_word_length = int(max_word_length)

    def get_termpos(self) -> int:
        return self._termpos

    def set_termpos(self, termpos: int) -> None:
        self._termpos = termpos

    def increase_termpos(self, delta: int = 100) -> None:
        """termgenerator.h:205-214: leave a gap between fields so phrases
        never match across them."""
        self._termpos += delta

    # -- indexing ----------------------------------------------------------

    def _invert(self, text: str):
        entries, doclen = invert_doc(
            text,
            mode=self._mode,
            stopwords=self._stopwords,
            stemmer=self._stemmer,
            strategy=self._strategy if self._stemmer else "none",
            stop_mode=self._stop_mode,
            word_breaks=self._word_breaks,
        )
        if self._max_word_length < 64:
            entries = [
                e for e in entries if len(e[0]) <= self._max_word_length
            ]
        return entries, doclen

    @staticmethod
    def _prefixed(term: str, prefix: str) -> str:
        # stemmed forms are Z + prefix + stem (Term::make_term,
        # queryparser.lemony:328-340); raw tokens are folded to lowercase
        # so a leading literal 'Z' cannot occur
        if term.startswith("Z"):
            return "Z" + prefix + term[1:]
        return prefix + term

    def index_text(
        self, text: str, wdf_inc: int = 1, prefix: str = ""
    ) -> None:
        """termgenerator.h:178-189: tokenize into the current document;
        positions continue from the generator's position counter."""
        entries, _doclen = self._invert(text)
        base = self._termpos
        maxpos = 0
        for term, wdf, positions in entries:
            t = self._prefixed(term, prefix) if prefix else term
            if positions:
                maxpos = max(maxpos, positions[-1])
                for p in positions:
                    self._doc.add_posting(t, base + p, 0)
            self._doc.add_term(t, wdf * wdf_inc)
        self._termpos = base + maxpos

    def index_text_without_positions(
        self, text: str, wdf_inc: int = 1, prefix: str = ""
    ) -> None:
        """termgenerator.h:191-199: like index_text but stores no
        positional information and does not advance the position
        counter."""
        entries, _doclen = self._invert(text)
        for term, wdf, _positions in entries:
            t = self._prefixed(term, prefix) if prefix else term
            self._doc.add_term(t, wdf * wdf_inc)
