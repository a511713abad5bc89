"""Driver-side QueryParser: the reference's query language over our AST.

Port of the QueryParser surface (`xapian-core/queryparser/queryparser.lemony`,
lexer modes :1029-1630, grammar :2096-2531; golden expectations modeled on
`tests/api_queryparser.cc:43-806`), re-expressed as a recursive-descent
parser — queries are tiny, so the parser runs on the driver and emits the
Query AST that the Planner turns into a DataFrame DAG.

Supported syntax (defaults: FLAG_PHRASE|FLAG_BOOLEAN|FLAG_LOVEHATE +
wildcard + ranges; default op OR, queryparser_internal.h:87):

  a b               -> default_op(a, b)
  a AND b, OR, XOR, NOT, AND NOT    (keywords must be ALL-CAPS,
                                     queryparser.lemony:1389-1428)
  (grouping)
  +term -term       -> loved terms AND'd; hated AND_NOT'd
                       (queryparser.lemony:2271-2340)
  "a b c"           -> OP_PHRASE window = n terms (:2397-2452)
  a-b, a.b          -> phrased compound (:1363,2455-2468; api_queryparser
                       "simple-example" -> (simple@1 PHRASE 2 example@2))
  a NEAR/n b        -> OP_NEAR, window default 10, +1 per extra term
                       (:1977-1981)
  a ADJ/n b         -> ordered NEAR = windowed OP_PHRASE (:1983-1991)
  field:term        -> probabilistic prefix (add_prefix) or boolean prefix
                       (add_boolean_prefix -> OP_FILTER), queryparser.h:799+
  wild*             -> OP_WILDCARD (:1234-1247)
  field:lo..hi      -> RangeProcessor -> OP_VALUE_RANGE (:2236-2247)

Stemming defaults to STEM_NONE (code corpus); terms are lowercased by the
same Unicode folding as the index tokenizer, so parser terms and index
terms always agree.  With a `stemmer` set, free probabilistic terms become
`Z`-prefixed stems (Term::make_term, queryparser.lemony:328-340) UNLESS
they need positions (inside quotes / compounds / NEAR / ADJ) or were
capitalized in the raw query — both reference behaviors
(queryparser.lemony:171-173 need_positions drops stemming).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from xapian_spark.query import ast
from xapian_spark.text.tokenizer import (
    _scan_tokens,
    ngram_tokens,
    parse_terms,
    should_stem,
)

_KEYWORDS = {"AND", "OR", "NOT", "XOR", "NEAR", "ADJ"}

_TOKEN_RE = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<quoted>"[^"]*"?) |
    (?P<love>(?<![^\s("])\+(?=\S)) | (?P<hate>(?<![^\s("])-(?=\S)) |
    (?P<word>[^\s()"]+)
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str


@dataclass(frozen=True)
class _NegOnly:
    """Internal marker: a prob clause consisting only of hated terms
    ("AND -lager") — consumed by the enclosing AND as an AND_NOT."""

    node: ast.Node


@dataclass
class QueryParser:
    """Configure like the reference: prefix maps + default op."""

    default_op: str = "or"  # "or" | "and"
    prefixes: dict[str, str] = field(default_factory=dict)  # probabilistic
    boolean_prefixes: dict[str, str] = field(default_factory=dict)
    range_fields: dict[str, str] = field(default_factory=dict)  # field->column
    # RangeProcessor chain (valuerangeproc.cc; add_rangeprocessor): tried
    # in order on any `lo..hi` token; first processor whose marker matches
    # wins (Date/NumberRangeProcessor in rangeproc.py)
    rangeprocs: list = field(default_factory=list)
    # FieldProcessor map (queryparser.h FieldProcessor): field -> callable
    # receiving the raw text after `field:`, returning an ast Node
    field_processors: dict = field(default_factory=dict)
    stopwords: frozenset[str] | None = None
    # synonym dictionary (the synonym table of glass_spelling's sibling
    # glass_synonym B-tree): term -> synonyms; used by `~term` syntax and,
    # when auto_synonyms=True, by every plain term
    # (FLAG_SYNONYM/FLAG_AUTO_SYNONYMS, queryparser.h:577-590)
    synonyms: dict[str, tuple[str, ...]] = field(default_factory=dict)
    # database-backed synonym table (FLAG_SYNONYM over the glass synonym
    # B-tree): any object with get_synonyms(term) -> list[str] — a
    # Database / InvertedIndex.  Consulted after the static dict.
    synonym_source: object = None
    auto_synonyms: bool = False
    # FLAG_AUTO_MULTIWORD_SYNONYMS (queryparser.h:590; queryparser.lemony:
    # 1749-1831 TermGroup::as_group): while parsing a run of consecutive
    # free probabilistic words, greedily match the longest span whose
    # space-joined folded names form a multi-word synonym key ("sun tan")
    # and wrap the span in OP_SYNONYM(default-op(original terms), synonym
    # terms).  Implies single-term auto synonyms for non-matched words
    # (MASK_ENABLE_AUTO_SYNONYMS, queryparser.lemony:434-441).
    auto_multiword_synonyms: bool = False
    # FLAG_NO_POSITIONS (queryparser.h:716): don't use positional info —
    # PHRASE/NEAR/ADJ groups (quoted phrases, phrased compounds, NEAR/ADJ
    # joins) degrade to OP_AND over the same (still unstemmed) terms
    # (Terms::as_opwindow_query with window = size_t(-1),
    # queryparser.lemony:1895-1941), for querying an index built without
    # positional data.  The reference also degrades a positional DEFAULT
    # op to OP_AND (State ctor, queryparser.lemony:224-228); our default
    # op is only ever or/and, so that clause has nothing to do here.
    no_positions: bool = False
    # query-time stemming (STEM_SOME when set): free terms -> Z+prefix+stem
    stemmer: object = None
    # CJK/unbroken-script n-gram queries (FLAG_NGRAMS): a run becomes an
    # AND over its unigrams+bigrams at ONE position (queryparser.lemony:
    # 589-597; api_queryparser qp_default_prefix1 CJK goldens).  Divergence
    # by design: defaults ON to match the indexer's default.
    ngrams: bool = True
    # FLAG_WORD_BREAKS (queryparser.h:637; queryparser.lemony:574-586): a
    # run becomes an AND over its UAX#29 word segments at ONE position
    # (see text/wordbreak.py).  Takes precedence over ngrams, like the
    # reference's ICU path; must match the flag the index was built with.
    word_breaks: bool = False
    # FLAG_PARTIAL (queryparser.h:528-556): treat the final word of the
    # query as a partially-typed term — OR of a most-frequent-limited
    # wildcard over the prefix and the word as normally parsed — for
    # stable incremental (search-as-you-type) results.  Like the
    # reference, it only fires when the query string ends at the word (no
    # trailing whitespace) and the word is a plain probabilistic term (not
    # quoted/phrased/compound, not a boolean filter prefix, not a range).
    partial: bool = False
    min_partial_prefix_len: int = 2  # queryparser_internal.h:115
    max_partial_expansion: int = 100  # queryparser_internal.h:103
    # FLAG_PURE_NOT (queryparser.h:529-535): allow a NOT with no left
    # operand — "NOT x" becomes (0 * <alldocuments> AND_NOT x), golden
    # api_queryparser.cc:1717-1724.  Off by default (the alldocs scan is
    # potentially expensive, same rationale as the reference); without the
    # flag the negated clause is dropped (this parser degrades instead of
    # raising, see test_empty_and_garbage).
    pure_not: bool = False
    # FLAG_BOOLEAN_ANY_CASE (queryparser.h:511): recognise boolean
    # operators in any case ("and"/"And"/"AND"), not just ALL-CAPS.
    boolean_any_case: bool = False
    # FLAG_WILDCARD_MULTI / FLAG_WILDCARD_SINGLE (queryparser.h:8192/16384,
    # Xapian 1.5): glob-style '*' (any run) / '?' (one char) anywhere in a
    # word; when either is on, plain FLAG_WILDCARD trailing-'*' handling is
    # subsumed by the glob path (the reference ignores FLAG_WILDCARD then).
    wildcard_multi: bool = False
    wildcard_single: bool = False

    # FLAG_ACCUMULATE (queryparser.h:705): keep stoplist/unstem data
    # across parse_query calls (multi-field query forms) instead of
    # resetting per parse.
    accumulate: bool = False
    # set_max_expansion (queryparser.h:823-851): cap how many dictionary
    # terms a wildcard may expand to (0 = unlimited, the reference
    # default), with the WILDCARD_LIMIT_* policy on overflow.
    max_wildcard_expansion: int = 0
    wildcard_limit_mode: str = "error"
    # set_min_wildcard_prefix (queryparser.h:852-881): a wildcard whose
    # fixed initial portion is shorter than this raises (the reference
    # throws Xapian::QueryParserError); the partial-term analogue is
    # min_partial_prefix_len above.
    min_wildcard_prefix_len: int = 0
    # query-time stemming strategy (QueryParser::set_stemming_strategy,
    # queryparser.h:448-480): None means STEM_SOME when a stemmer is set
    # (the reference default once set_stemmer is called), STEM_NONE
    # otherwise.  "all" stems every term with no Z prefix; "all_z" adds
    # the Z prefix; "some_full_pos" stems even position-carrying terms
    # (for indexes built with the matching TermGenerator strategy).
    stem_strategy: str | None = None

    def __post_init__(self):
        self._pos = 0  # query-wide term position counter
        self._partial_idx = None  # token index of the PARTIAL_TERM, if any
        self._partial_now = False
        self._stoplist: list[str] = []  # queryparser_internal.h:90
        self._unstem: list[tuple[str, str]] = []  # :91 (term, unstemmed)

    def get_stoplist(self) -> list[str]:
        """QueryParser::stoplist_begin/end (queryparser.h:1058): the words
        of the last parse that were dropped as stopwords, in query order."""
        return list(self._stoplist)

    def unstem(self, term: str) -> list[str]:
        """QueryParser::unstem_begin(term) (queryparser.h:1066): the raw
        query words that produced `term` in the last parse (a stemmed
        Z-term can come from several distinct surface forms)."""
        return [raw for t, raw in self._unstem if t == term]

    # -- reference-named configuration setters (queryparser.h) ------------

    def add_prefix(self, fname: str, prefix: str) -> None:
        """QueryParser::add_prefix (queryparser.h:900-940): map `fname:`
        to a probabilistic term prefix."""
        self.prefixes[fname] = prefix

    def add_boolean_prefix(self, fname: str, prefix: str,
                           grouping: str | None = None) -> None:
        """QueryParser::add_boolean_prefix: map `fname:` to a boolean
        filter term prefix (same-prefix terms OR, distinct prefixes AND —
        _field_node's filter grouping; `grouping` is accepted for
        signature parity, the prefix itself is the group key)."""
        self.boolean_prefixes[fname] = prefix

    def set_default_op(self, op: str) -> None:
        """QueryParser::set_default_op — "or" | "and"."""
        if op not in ("or", "and"):
            raise ValueError(op)
        self.default_op = op

    def get_default_op(self) -> str:
        return self.default_op

    def set_stemmer(self, stemmer) -> None:
        """QueryParser::set_stemmer."""
        self.stemmer = stemmer

    def set_stemming_strategy(self, strategy: str) -> None:
        """QueryParser::set_stemming_strategy — "none" | "some" |
        "some_full_pos" | "all" | "all_z" (the STEM_* enum)."""
        if strategy not in ("none", "some", "some_full_pos", "all",
                            "all_z"):
            raise ValueError(strategy)
        self.stem_strategy = strategy

    def set_stopper(self, stopwords) -> None:
        """QueryParser::set_stopper — any iterable of stopwords (the
        reference's Stopper functor reduced to its decision set)."""
        self.stopwords = frozenset(stopwords) if stopwords else None

    def set_database(self, db) -> None:
        """QueryParser::set_database (queryparser.h:816-822): the database
        consulted for synonyms (and, in get_corrected_query_string, for
        spelling)."""
        self.synonym_source = db

    def set_max_expansion(self, max_expansion: int,
                          max_type: str = "error",
                          flags: tuple = ("wildcard",)) -> None:
        """QueryParser::set_max_expansion (queryparser.h:823-851): cap
        wildcard ("wildcard" in flags) and/or FLAG_PARTIAL ("partial" in
        flags) expansion; max_type is "error" | "first" |
        "most_frequent" (WILDCARD_LIMIT_*)."""
        if max_type not in ("error", "first", "most_frequent"):
            raise ValueError(max_type)
        if "wildcard" in flags:
            self.max_wildcard_expansion = int(max_expansion)
            self.wildcard_limit_mode = max_type
        if "partial" in flags:
            self.max_partial_expansion = int(max_expansion)

    def set_min_wildcard_prefix(self, min_prefix_len: int,
                                flags: tuple = ("wildcard", "partial")
                                ) -> None:
        """QueryParser::set_min_wildcard_prefix (queryparser.h:852-881)."""
        if "wildcard" in flags:
            self.min_wildcard_prefix_len = int(min_prefix_len)
        if "partial" in flags:
            self.min_partial_prefix_len = int(min_prefix_len)

    def add_rangeprocessor(self, proc) -> None:
        """QueryParser::add_rangeprocessor (queryparser.h:1070-1090)."""
        self.rangeprocs.append(proc)

    def get_corrected_query_string(self, s: str, index) -> str:
        """QueryParser::get_corrected_query_string (queryparser.h:1079):
        the query string with each unknown term replaced by its best
        spelling suggestion; empty string when nothing was corrected
        (reference convention).

        Only tokens that would parse as plain probabilistic terms are
        corrected: boolean keywords (AND/OR/...), `field:` syntax, ranges,
        wildcard/fuzzy suffixes, and anything inside double quotes are
        preserved verbatim, like the reference (queryparser.lemony keeps
        operator and phrase tokens out of the spelling pass)."""
        from xapian_spark.query.expand import suggest_spelling

        corrected = []
        changed = False
        in_quotes = False
        for tok in s.split(" "):
            quote_count = tok.count('"')
            entering = in_quotes or quote_count > 0
            if quote_count % 2 == 1:
                in_quotes = not in_quotes
            low = tok.lower()
            is_kw = tok in _KEYWORDS or (
                # FLAG_BOOLEAN_ANY_CASE treats 'and'/'And' as operators,
                # so the spelling pass must skip them too
                self.boolean_any_case and tok.upper() in _KEYWORDS
            )
            if (
                not entering
                and not is_kw
                and re.fullmatch(r"[a-z0-9_]+", low)
            ):
                sug = suggest_spelling(index, low)
                if sug is not None:
                    corrected.append(sug)
                    changed = True
                    continue
            corrected.append(tok)
        return " ".join(corrected) if changed else ""

    def add_field_processor(self, fname: str, fn) -> None:
        """QueryParser::add_prefix(field, FieldProcessor) overload
        (queryparser.h:840-870; include/xapian/queryparser.h
        FieldProcessor): `field:text` is handed verbatim to fn, which
        returns a query Node (or None for MatchNothing)."""
        self.field_processors[fname] = fn

    # -- lexer ---------------------------------------------------------------

    def _lex(self, s: str) -> list[_Tok]:
        toks: list[_Tok] = []
        for m in _TOKEN_RE.finditer(s):
            kind = m.lastgroup
            text = m.group()
            if kind == "word":
                cmp = text.upper() if self.boolean_any_case else text
                if cmp in _KEYWORDS or re.fullmatch(
                    r"(NEAR|ADJ)/\d+", cmp
                ):
                    toks.append(_Tok("op", cmp))
                    continue
            toks.append(_Tok(kind, text))
        return toks

    # -- term helpers --------------------------------------------------------

    def _next_pos(self) -> int:
        self._pos += 1
        return self._pos

    def _terms_of(
        self, text: str, prefix: str = "", positional: bool = False
    ) -> list[ast.Term]:
        """Tokenize a word/compound into positional Term leaves using the
        SAME folding as the index tokenizer.  Non-positional single terms
        are stemmed to Z-terms when a stemmer is configured (STEM_SOME,
        Term::make_term queryparser.lemony:328-340); capitalized raw words
        stay unstemmed (reference behavior)."""
        raw_terms = parse_terms(text)
        strat = (
            "none" if self.stemmer is None
            else (self.stem_strategy or "some")
        )
        stem_ok = (
            strat in ("some", "some_full_pos")
            # some: only single non-positional words (compounds become
            # phrases); some_full_pos: position-carrying terms stem too
            and (
                strat == "some_full_pos"
                or (not positional and len(raw_terms) == 1)
            )
            and not (text and text[0].isupper())
        )
        out = []
        for t in raw_terms:
            if self.stopwords and t in self.stopwords:
                self._stoplist.append(t)  # add_to_stoplist (lemony:235-237)
                self._next_pos()
                continue
            if strat in ("all", "all_z"):
                # STEM_ALL / STEM_ALL_Z: every term stemmed, Z prefix only
                # for all_z (queryparser.h:448-480)
                term = (
                    ("Z" if strat == "all_z" else "")
                    + prefix + self.stemmer(t)
                )
            elif stem_ok and should_stem(t):
                term = "Z" + prefix + self.stemmer(t)
            else:
                term = prefix + t
            self._unstem.append((term, t))  # add_to_unstem (lemony:239-241)
            out.append(ast.Term(term, pos=self._next_pos()))
        return out

    def _synonym_node(self, term: ast.Term, raw: str | None = None) -> ast.Node:
        """OP_SYNONYM expansion of a single term.  Like the reference's
        Term::get_query_with_synonyms (queryparser.lemony:398-429), the
        UNSTEMMED prefixed form is tried as the key first, then the
        final (possibly Z-stemmed) term — qp_synonym1 golden: "search"
        with keys {search->find, Zsearch->Zfind} expands via "search"."""
        syns = ()
        if raw is not None and raw != term.term:
            syns = self._lookup_synonyms(raw)
        if not syns:
            syns = self._lookup_synonyms(term.term)
        if not syns:
            return term
        return ast.Synonym((term,) + tuple(ast.Term(s) for s in syns))

    def _lookup_synonyms(self, key: str) -> tuple[str, ...]:
        """Synonyms for a key (single term or space-joined multi-word)
        from the static dict, then the database-backed table."""
        syns = tuple(self.synonyms.get(key, ()))
        if not syns and self.synonym_source is not None:
            syns = tuple(self.synonym_source.get_synonyms(key))
        return syns

    def _opwindow(self, cls, subs: tuple, window: int) -> ast.Node:
        """Positional combiner constructor: Phrase/Near normally, but
        under FLAG_NO_POSITIONS the group degrades to OP_AND over the
        same terms (Terms::as_opwindow_query sets window = size_t(-1) ->
        op = OP_AND, queryparser.lemony:1895-1905,1936-1941)."""
        if self.no_positions:
            return ast.And(tuple(subs))
        return cls(tuple(subs), window)

    def _plain_word_name(self, text: str) -> str | None:
        """The folded single-term name of a free word token eligible for
        the multi-word synonym walk, else None.  Field-qualified (with a
        REGISTERED field), wildcard, fuzzy, explicit-synonym, range and
        compound tokens are not plain TermGroup members — the reference's
        lexer routes those to other productions before TermGroup::as_group
        ever sees them."""
        if any(c in text for c in "*?~") or ".." in text:
            return None
        m = re.match(r"^([A-Za-z_][\w]*):", text)
        if m:
            f = m.group(1).lower()
            if (
                f in self.prefixes
                or f in self.boolean_prefixes
                or f in self.range_fields
                or f in self.field_processors
            ):
                return None
        raw = parse_terms(text)
        if len(raw) != 1:
            return None
        return raw[0]

    def _multiword_node(self, toks, i: int):
        """FLAG_AUTO_MULTIWORD_SYNONYMS walk (TermGroup::as_group,
        queryparser.lemony:1749-1831): greedily match the LONGEST run of
        consecutive plain free-text words starting at token i whose
        space-joined folded names are a synonym key; the span becomes
        OP_SYNONYM(default-op(original terms), synonym terms) — original
        first, like the single-term path — with the originals stemmed and
        positioned exactly as if parsed individually (qp_synonym2 golden:
        "sun tan" -> ((Zsun@1 OR Ztan@2) SYNONYM bathe@1)).  Returns
        (node, next_i), or (None, i) when no key matches here.

        Documented divergence: the reference records a match as soon as
        any synonym KEY has the span as a PREFIX (lemony:1760-1767 sets
        longest_match before the exact-size check), which can emit an
        OP_SYNONYM with no synonyms for a prefix-only match; we require
        an exact key with at least one synonym — the behavior the
        reference's own qp_synonym2 goldens exercise."""
        names: list[str] = []
        j = i
        while j < len(toks) and toks[j].kind == "word":
            if j == self._partial_idx:
                break  # the PARTIAL_TERM goes through its own production
            if (
                j + 1 < len(toks)
                and toks[j + 1].kind == "op"
                and toks[j + 1].text.startswith(("NEAR", "ADJ"))
            ):
                break  # captured by the positional group, not TermGroup
            name = self._plain_word_name(toks[j].text)
            if name is None:
                break
            names.append(name)
            j += 1
        if len(names) < 2:
            return None, i
        for m in range(len(names), 1, -1):
            syns = self._lookup_synonyms(" ".join(names[:m]))
            if not syns:
                continue
            # originals: plain get_query() per word (stemming + stopwords
            # + positions as usual; NO single-term synonym expansion,
            # lemony:1802-1810 uses get_query, not the _with_synonyms
            # variant), combined by the default op
            sub_terms: list[ast.Term] = []
            for k in range(m):
                sub_terms.extend(self._terms_of(toks[i + k].text))
            cls = ast.And if self.default_op == "and" else ast.Or
            orig: ast.Node | None
            if not sub_terms:  # every original was a stopword
                orig = None
            elif len(sub_terms) == 1:
                orig = sub_terms[0]
            else:
                orig = cls(tuple(sub_terms))
            syn_terms = tuple(ast.Term(s) for s in syns)
            if orig is None:
                node = (
                    ast.Synonym(syn_terms)
                    if len(syn_terms) > 1
                    else syn_terms[0]
                )
            else:
                node = ast.Synonym((orig,) + syn_terms)
            return node, i + m
        return None, i

    def _check_wildcard_prefix(self, fixed: str) -> None:
        """set_min_wildcard_prefix contract (queryparser.h:852-881): a
        wildcard whose fixed initial portion is shorter than the minimum
        raises (the reference throws Xapian::QueryParserError)."""
        if len(fixed) < self.min_wildcard_prefix_len:
            raise ValueError(
                f"wildcard fixed prefix {fixed!r} is shorter than the "
                f"configured minimum ({self.min_wildcard_prefix_len})"
            )

    def _word_node(
        self, text: str, prefix: str = "", positional: bool = False
    ) -> ast.Node:
        """One word token -> Term / Phrase (compound) / Wildcard /
        EditDistance / Synonym; under FLAG_PARTIAL the final word also
        ORs in its prefix expansion (Term::as_partial_query,
        queryparser.lemony:541-564)."""
        if self._partial_now and not positional:
            self._partial_now = False
            node = self._word_node(text, prefix, positional)
            root = parse_terms(text)
            if not root:
                return node
            wc = ast.Wildcard(
                prefix + root[0],
                limit=self.max_partial_expansion,
                most_frequent=True,  # WILDCARD_LIMIT_MOST_FREQUENT default
                combiner="synonym",
            )
            if isinstance(node, ast.MatchNothing):
                return wc
            return ast.Or((wc, node))
        if (self.wildcard_multi and "*" in text) or (
            self.wildcard_single and "?" in text
        ):
            # glob wildcard (FLAG_WILDCARD_MULTI/SINGLE): the whole word is
            # the pattern, wildcards anywhere
            self._check_wildcard_prefix(re.split(r"[*?]", text, 1)[0])
            return ast.Wildcard(
                prefix + text.lower(), combiner="or",
                multi=self.wildcard_multi, single=self.wildcard_single,
                limit=self.max_wildcard_expansion,
                limit_mode=self.wildcard_limit_mode,
            )
        if text.endswith("*") and len(text) > 1:
            head = text[:-1].lower()
            self._check_wildcard_prefix(head)
            return ast.Wildcard(
                prefix + head, combiner="or",
                limit=self.max_wildcard_expansion,
                limit_mode=self.wildcard_limit_mode,
            )
        m = re.fullmatch(r"(.+?)~(\d+\.\d+|\d*)", text)
        if m:
            # fuzzy: term~k -> OP_EDIT_DISTANCE (:1497); default k=2.
            # A fractional k scales by the word length (FLAG_FUZZY,
            # queryparser.h:32768: "since~0.2" -> edit distance 1)
            head = m.group(1).lower()
            spec = m.group(2)
            if "." in spec:
                k = int(len(head) * float(spec))
            else:
                k = int(spec) if spec else 2
            return ast.EditDistance(head, k, prefix=prefix)
        explicit_syn = text.startswith("~")
        if explicit_syn:
            text = text[1:]
        if (self.ngrams or self.word_breaks) and not text.isascii():
            scan = list(_scan_tokens(text, ngrams=True))
            if any(k == "run" for k, _ in scan):
                return self._ngram_node(text, scan, prefix)
        raw_terms = parse_terms(text)
        if len(raw_terms) > 1 and not self._phrase_joined(text, raw_terms):
            # terms split by a non-phrase separator (e.g. '#', '+'):
            # default-op combination of independently-stemmed terms, like
            # the reference lexer emitting separate TERM tokens
            subs = []
            for sub_raw in self._token_spans(text, raw_terms):
                subs.extend(
                    self._terms_of(sub_raw, prefix, positional=positional)
                )
            if not subs:
                return ast.MatchNothing()
            if len(subs) == 1:
                return subs[0]
            cls = ast.And if self.default_op == "and" else ast.Or
            return cls(tuple(subs))
        terms = self._terms_of(text, prefix, positional=positional)
        if not terms:
            return ast.MatchNothing()
        if len(terms) == 1:
            if (
                explicit_syn
                or self.auto_synonyms
                or self.auto_multiword_synonyms
            ):
                # unstemmed-key lookup only when the single surviving term
                # unambiguously IS the single raw word — a stopword-dropped
                # compound ("the-dog" -> terms [dog]) must not look up the
                # dropped word's name
                raw = (
                    prefix + raw_terms[0] if len(raw_terms) == 1 else None
                )
                return self._synonym_node(terms[0], raw=raw)
            return terms[0]
        # phrased compound: window = number of terms (:2455-2468)
        return self._opwindow(ast.Phrase, tuple(terms), len(terms))

    def _ngram_node(self, text: str, scan, prefix: str) -> ast.Node:
        """Token containing unbroken-script runs: each run -> AND of its
        unigrams+bigrams, ALL at one position (queryparser.lemony:589-597:
        Query(prefix + gram, 1, pos) per gram, OP_AND); word fragments
        keep normal stemming; fragments combine by the default op
        (golden: "h众ello" -> (Zh@1 OR 众@2 OR Zello@3))."""
        subs: list[ast.Node] = []
        # a leading capital suppresses stemming for the word fragments
        # (the scanner folds case, so approximate the reference's per-word
        # caps check with the raw token's first char)
        caps = bool(text and text[0].isupper())
        for kind, val in scan:
            if kind == "w":
                stem_ok = (
                    self.stemmer is not None and not caps and should_stem(val)
                )
                if self.stopwords and val in self.stopwords:
                    self._next_pos()
                    continue
                if stem_ok:
                    subs.append(
                        ast.Term("Z" + prefix + self.stemmer(val),
                                 pos=self._next_pos())
                    )
                else:
                    subs.append(ast.Term(prefix + val, pos=self._next_pos()))
            else:
                pos = self._next_pos()
                if self.word_breaks:
                    # FLAG_WORD_BREAKS: AND of the run's UAX#29 word
                    # segments, all at one position (lemony:574-586)
                    from xapian_spark.text.wordbreak import word_tokens

                    grams = [
                        ast.Term(prefix + seg, pos=pos)
                        for seg in word_tokens("".join(val))
                    ]
                else:
                    grams = [
                        ast.Term(prefix + g, pos=pos)
                        for g, _uni in ngram_tokens(val)
                    ]
                if not grams:
                    continue
                subs.append(grams[0] if len(grams) == 1
                            else ast.And(tuple(grams)))
        if not subs:
            return ast.MatchNothing()
        if len(subs) == 1:
            return subs[0]
        cls = ast.And if self.default_op == "and" else ast.Or
        return cls(tuple(subs))

    _PHRASE_JOINERS = frozenset("-.:,/\\'")

    def _spans(self, text: str, raw_terms: list[str]):
        """Byte spans of each term in the (lowercased) raw text; None when
        a term can't be located (acronym folding etc.)."""
        low = text.lower()
        out, pos = [], 0
        for t in raw_terms:
            i = low.find(t, pos)
            if i < 0:
                return None
            out.append((i, i + len(t)))
            pos = i + len(t)
        return out

    def _token_spans(self, text: str, raw_terms: list[str]) -> list[str]:
        spans = self._spans(text, raw_terms)
        if spans is None:
            return [text]
        return [text[a:b] for a, b in spans]

    def _phrase_joined(self, text: str, raw_terms: list[str]) -> bool:
        """True when every inter-term separator is a phrase generator
        ('-', '.', ':', ... — queryparser.lemony:2455-2468); separators
        like '#' or '+' split into independent terms instead."""
        spans = self._spans(text, raw_terms)
        if spans is None:
            return True  # conservative: keep the phrase behavior
        for (_, e), (s2, _) in zip(spans, spans[1:]):
            gap = text[e:s2]
            if any(ch not in self._PHRASE_JOINERS for ch in gap):
                return False
        return True

    def _field_node(self, fname: str, rest: str):
        """-> (node, filter_group) where filter_group is a non-None key when
        the node is an unweighted filter (boolean prefix / value range) that
        must attach via OP_FILTER: same-group terms OR together, distinct
        groups AND (the reference's filter grouping, queryparser.lemony
        boolean-prefix handling)."""
        if fname in self.field_processors:
            node = self.field_processors[fname](rest)
            return (node if node is not None else ast.MatchNothing()), None
        if fname in self.range_fields and ".." in rest:
            lo, hi = rest.split("..", 1)
            col = self.range_fields[fname]
            conv = lambda x: float(x) if re.fullmatch(r"-?\d+(\.\d+)?", x) else x  # noqa: E731
            node = ast.ValueRange(
                col, conv(lo) if lo else None, conv(hi) if hi else None
            )
            return node, f"range:{fname}"
        if fname in self.boolean_prefixes:
            prefix = self.boolean_prefixes[fname]
            return ast.Term(prefix + rest.lower()), f"bool:{prefix}"
        if fname in self.prefixes:
            return self._word_node(rest, prefix=self.prefixes[fname]), None
        return None, None

    # -- grammar -------------------------------------------------------------

    def _find_partial_token(self, s: str, toks: list[_Tok]) -> int | None:
        """PARTIAL_TERM eligibility (queryparser.lemony:1513-1528): the
        final token, only when the raw string ends right at it, it is a
        plain word (single term after folding, no wildcard/fuzzy/range
        syntax, no boolean-filter or processor field), and the word has at
        least min_partial_prefix_len characters."""
        if not (self.partial and s and not s[-1].isspace() and toks):
            return None
        tok = toks[-1]
        if tok.kind != "word":
            return None
        text = tok.text
        if text.endswith("*") or text.startswith("~"):
            return None
        if (self.wildcard_multi and "*" in text) or (
            self.wildcard_single and "?" in text
        ):
            return None
        if re.search(r"~(\d+\.\d+|\d*)$", text) or ".." in text:
            return None
        word = text
        m = re.match(r"^([A-Za-z_][\w]*):(.+)$", text)
        if m:
            f = m.group(1).lower()
            if (
                f in self.boolean_prefixes
                or f in self.range_fields
                or f in self.field_processors
            ):
                return None
            if f in self.prefixes:
                word = m.group(2)
        if len(word) < self.min_partial_prefix_len:
            return None
        if len(parse_terms(word)) != 1:  # compounds phrase-generate
            return None
        return len(toks) - 1

    def parse_query(self, s: str) -> ast.Node:
        self._pos = 0
        if not self.accumulate:  # FLAG_ACCUMULATE keeps them across calls
            self._stoplist = []
            self._unstem = []
        toks = self._lex(s)
        self._partial_idx = self._find_partial_token(s, toks)
        node, i = self._parse_or(toks, 0)
        if isinstance(node, _NegOnly):
            node = None  # pure "-term" query matches nothing
        if node is None:
            return ast.MatchNothing()
        return node

    def _parse_or(self, toks, i):
        left, i = self._parse_xor(toks, i)
        if isinstance(left, _NegOnly):
            left = None  # hate-only clause outside an AND matches nothing
        while i < len(toks) and toks[i].kind == "op" and toks[i].text == "OR":
            right, i = self._parse_xor(toks, i + 1)
            if isinstance(right, _NegOnly):
                right = None
            if left is None or right is None:
                left = left or right
                continue
            if isinstance(left, ast.Or):
                left = ast.Or(left.subs + (right,))
            else:
                left = ast.Or((left, right))
        return left, i

    def _parse_xor(self, toks, i):
        left, i = self._parse_and(toks, i)
        while i < len(toks) and toks[i].kind == "op" and toks[i].text == "XOR":
            if isinstance(left, _NegOnly):
                left = None
            right, i = self._parse_and(toks, i + 1)
            if isinstance(right, _NegOnly):
                right = None
            if left is None or right is None:
                left = left or right
                continue
            if isinstance(left, ast.Xor):
                left = ast.Xor(left.subs + (right,))
            else:
                left = ast.Xor((left, right))
        return left, i

    def _parse_and(self, toks, i):
        left, i = self._parse_prob(toks, i)
        while i < len(toks) and toks[i].kind == "op" and toks[i].text in (
            "AND", "NOT",
        ):
            if isinstance(left, _NegOnly):
                left = None
            op = toks[i].text
            i += 1
            negate = op == "NOT"
            if op == "AND" and i < len(toks) and toks[i].kind == "op" and \
                    toks[i].text == "NOT":
                negate = True
                i += 1
            right, i = self._parse_prob(toks, i)
            if isinstance(right, _NegOnly):
                negate, right = True, right.node
            if left is None and negate and right is not None:
                # "NOT x" with nothing to subtract from: FLAG_PURE_NOT
                # matches everything-but-x at weight 0
                # (api_queryparser.cc:1718: 0 * <alldocuments> AND_NOT x);
                # without the flag the clause degrades to nothing matched
                left = (
                    ast.AndNot(
                        ast.ScaleWeight(0.0, ast.MatchAll()), right
                    )
                    if self.pure_not
                    else None
                )
                continue
            if left is None or right is None:
                left = left or right
                continue
            if negate:
                left = ast.AndNot(left, right)
            elif isinstance(left, ast.And):
                left = ast.And(left.subs + (right,))
            else:
                left = ast.And((left, right))
        return left, i

    def _parse_prob(self, toks, i):
        """A run of primaries joined by the default op, with love/hate and
        NEAR/ADJ handling (the 'prob' production, :2249-2340)."""
        loved: list[ast.Node] = []
        hated: list[ast.Node] = []
        normal: list[ast.Node] = []
        filters: dict[str, list[ast.Node]] = {}
        while i < len(toks):
            t = toks[i]
            if t.kind == "op" and t.text in ("AND", "OR", "XOR", "NOT"):
                break
            if t.kind == "rparen":
                break
            if t.kind == "op" and t.text.startswith(("NEAR", "ADJ")):
                # positional join of previous primary and next primary
                if not normal:
                    i += 1
                    continue
                parts = t.text.split("/")
                ordered = parts[0] == "ADJ"
                left = normal.pop()
                sub, i2, _ = self._parse_primary(toks, i + 1, positional=True)
                if sub is None:
                    i = i2
                    continue
                i = i2
                subs = []
                for nd in (left, sub):
                    if isinstance(nd, (ast.Near, ast.Phrase)):
                        subs.extend(nd.subs)
                    else:
                        subs.append(nd)
                n = len(subs)
                if len(parts) == 2:
                    window = int(parts[1]) + (n - 2)
                else:
                    window = 10 + (n - 2)  # :1977-1991
                cls = ast.Phrase if ordered else ast.Near
                normal.append(self._opwindow(cls, tuple(subs), window))
                continue
            if t.kind == "love":
                sub, i, fg = self._parse_primary(toks, i + 1)
                if sub is not None:
                    (filters.setdefault(fg, []) if fg else loved).append(sub)
                continue
            if t.kind == "hate":
                sub, i, _ = self._parse_primary(toks, i + 1)
                if sub is not None:
                    hated.append(sub)
                continue
            next_positional = (
                i + 1 < len(toks)
                and toks[i + 1].kind == "op"
                and toks[i + 1].text.startswith(("NEAR", "ADJ"))
            )
            if (
                self.auto_multiword_synonyms
                and t.kind == "word"
                and not next_positional
            ):
                node, ni = self._multiword_node(toks, i)
                if node is not None:
                    normal.append(node)
                    i = ni
                    continue
            sub, i, fg = self._parse_primary(
                toks, i, positional=next_positional
            )
            if sub is not None:
                if fg:
                    filters.setdefault(fg, []).append(sub)
                else:
                    normal.append(sub)
        # combine (queryparser.lemony:2271-2340): loves AND'd; normals by
        # default op; hates AND_NOT'd off the result; boolean-prefix terms
        # and ranges attach as OP_FILTER (same group OR, groups AND)
        normal = [n for n in normal if not isinstance(n, ast.MatchNothing)]
        if self.default_op == "and":
            base = ast.And(tuple(normal)) if len(normal) > 1 else (
                normal[0] if normal else None
            )
        else:
            base = ast.Or(tuple(normal)) if len(normal) > 1 else (
                normal[0] if normal else None
            )
        if loved:
            love = ast.And(tuple(loved)) if len(loved) > 1 else loved[0]
            base = love if base is None else ast.AndMaybe(love, base)
        if filters:
            groups = [
                (ast.Or(tuple(g)) if len(g) > 1 else g[0])
                for _, g in sorted(filters.items())
            ]
            filt = ast.And(tuple(groups)) if len(groups) > 1 else groups[0]
            base = filt if base is None else ast.Filter(base, filt)
        if hated:
            hate = ast.Or(tuple(hated)) if len(hated) > 1 else hated[0]
            if base is not None:
                base = ast.AndNot(base, hate)
            else:
                # "A AND -C": the hate attaches to the LEFT of the AND
                # (queryparser.lemony love/hate in boolean context)
                base = _NegOnly(hate)
        return base, i

    def _parse_primary(self, toks, i, positional=False):
        """-> (node, next_i, filter_group|None)."""
        if i >= len(toks):
            return None, i, None
        self._partial_now = i == self._partial_idx
        t = toks[i]
        if t.kind == "lparen":
            node, i = self._parse_or(toks, i + 1)
            if isinstance(node, _NegOnly):
                node = None
            if i < len(toks) and toks[i].kind == "rparen":
                i += 1
            return node, i, None
        if t.kind == "quoted":
            inner = t.text.strip('"')
            terms = self._terms_of(inner, positional=True)
            if not terms:
                return None, i + 1, None
            if len(terms) == 1:
                return terms[0], i + 1, None
            return self._opwindow(
                ast.Phrase, tuple(terms), len(terms)
            ), i + 1, None
        if t.kind == "word" or (t.kind == "op"):
            text = t.text
            range_unclaimed = False
            if ".." in text and self.rangeprocs:
                b, e = text.split("..", 1)
                for rp in self.rangeprocs:
                    node = rp.check_range(b, e)
                    if node is not None:
                        # ranges are unweighted filters; group by slot so
                        # same-slot ranges OR, distinct slots AND
                        # (queryparser grouping, :2236-2247)
                        return node, i + 1, f"range:{node.field}"
                # no processor claimed it — fall through to the field-
                # qualifier handling (a registered field: prefix like
                # n_chars:120..360 must keep working), then raise
                range_unclaimed = True
            mq = re.match(r"^([A-Za-z_][\w]*):$", text)
            if (
                mq
                and i + 1 < len(toks)
                and toks[i + 1].kind == "quoted"
                and mq.group(1).lower() in self.prefixes
            ):
                # field:"quoted phrase" (api_queryparser.cc:63-79): quoted
                # content prefixed, positional (unstemmed)
                prefix = self.prefixes[mq.group(1).lower()]
                inner = toks[i + 1].text.strip('"')
                terms = self._terms_of(inner, prefix, positional=True)
                if not terms:
                    return None, i + 2, None
                if len(terms) == 1:
                    return terms[0], i + 2, None
                return self._opwindow(
                    ast.Phrase, tuple(terms), len(terms)
                ), i + 2, None
            m = re.match(r"^([A-Za-z_][\w]*):(.+)$", text)
            if m:
                node, fg = self._field_node(m.group(1).lower(), m.group(2))
                if node is not None:
                    return node, i + 1, fg
                # unknown field: index the whole token as words
            if range_unclaimed:
                # a lo..hi token no processor or field qualifier claimed:
                # "Unknown range operation" (api_queryparser.cc
                # qp_daterange1/2 expect a parse error)
                raise ValueError(f"Unknown range operation: {text!r}")
            return self._word_node(text, positional=positional), i + 1, None
        return None, i + 1, None

    # -- free text (the wand/batch serving path) ----------------------------

    def parse_free_text(self, s: str) -> list[ast.Term]:
        """Plain term list with wqf via repetition — the default-op-OR
        free-text query shape used by the WAND serving path."""
        self._pos = 0
        return self._terms_of(s)
