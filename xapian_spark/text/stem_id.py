"""Indonesian Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Indonesian
algorithm (the same one the reference compiles from
`xapian-core/languages/indonesian.sbl`, after the "Porter Stemmer for
Bahasa Indonesia" paper with the sbl's documented amendments), validated
against the full public Snowball test vocabulary
(xapian-data/stemming/indonesian).

State: `measure` = vowel count, decremented per removed affix; `prefix`
encodes which first/second-order prefix was removed and gates which
suffixes may be removed afterwards.
"""

from __future__ import annotations

from functools import lru_cache

_V = frozenset("aeiou")


def _remove_suffix(w: str, prefix: int, measure: int):
    """kan/an/i with prefix-dependent ROUTINE conditions: in Snowball,
    a routine attached to an among string that fails makes the among
    RETRY the other strings (unlike action conditions) — so a blocked
    'kan' falls back to 'an'.  -> (w, measure, ok)."""
    if w.endswith("kan") and prefix != 3 and prefix != 2:
        return w[:-3], measure - 1, True
    if w.endswith("an") and prefix != 1:
        return w[:-2], measure - 1, True
    if w.endswith("i") and prefix <= 2 and not w[:-1].endswith("s"):
        return w[:-1], measure - 1, True
    return w, measure, False


def _first_order(w: str, measure: int):
    """-> (w, measure, prefix, ok, replaced); longest pattern wins.

    `replaced` is True for the `<- 's'`/`<- 'p'` rewrite actions: in
    Snowball the cursor then sits AFTER the substituted char, so the
    later second-order-prefix among (which matches at the cursor) can
    never fire — its patterns all start with consonants while the char
    at the cursor is the vowel that licensed the rewrite."""
    for pat in ("meng", "meny", "peng", "peny", "men", "mem", "pen",
                "pem", "ter", "di", "ke", "me"):
        if w.startswith(pat):
            rest = w[len(pat):]
            if pat in ("di", "meng", "men", "me", "ter"):
                return rest, measure - 1, 1, True, False
            if pat in ("ke", "peng", "pen"):
                return rest, measure - 1, 3, True, False
            if pat == "meny":
                if rest[:1] in _V:
                    return "s" + rest, measure - 1, 1, True, True
                continue  # VOWEL routine failed: among retries 'men'/'me'
            if pat == "peny":
                if rest[:1] in _V:
                    return "s" + rest, measure - 1, 3, True, True
                continue
            if pat == "mem":
                if rest[:1] in _V:
                    return "p" + rest, measure - 1, 1, True, True
                return rest, measure - 1, 1, True, False
            if pat == "pem":
                if rest[:1] in _V:
                    return "p" + rest, measure - 1, 3, True, True
                return rest, measure - 1, 3, True, False
    return w, measure, 0, False, False


def _longest_prefix_order(pats):
    return sorted(pats, key=len, reverse=True)


def _second_order(w: str, measure: int):
    """-> (w, measure, prefix, ok)."""
    for pat in _longest_prefix_order(
        ("per", "pe", "pelajar", "ber", "belajar", "be")
    ):
        if w.startswith(pat):
            rest = w[len(pat):]
            if pat == "pelajar":
                return "ajar" + rest, measure - 1, 0, True
            if pat == "belajar":
                return "ajar" + rest, measure - 1, 4, True
            if pat in ("per", "pe"):
                return rest, measure - 1, 2, True
            if pat == "ber":
                return rest, measure - 1, 4, True
            # 'be' KER: non-vowel then 'er' must follow; KER is a
            # routine, so failure retries other (shorter) strings
            if (
                rest[:1] and rest[0] not in _V and rest[1:3] == "er"
            ):
                return rest, measure - 1, 4, True
            continue
    return w, measure, 0, False


@lru_cache(maxsize=1 << 17)
def stem_id(word: str) -> str:
    w = word
    measure = sum(c in _V for c in w)
    if measure <= 2:
        return w
    # particles (kah/lah/pun), then possessive pronouns (nya > ku/mu)
    if w.endswith(("kah", "lah", "pun")):
        w = w[:-3]
        measure -= 1
    if measure <= 2:
        return w
    if w.endswith("nya"):
        w = w[:-3]
        measure -= 1
    elif w.endswith(("ku", "mu")):
        w = w[:-2]
        measure -= 1
    if measure <= 2:
        return w

    w1, m1, prefix, ok, replaced = _first_order(w, measure)
    if ok:
        w, measure = w1, m1
        # second-order prefix only runs if a suffix was removed first,
        # and never after a rewrite action (cursor position, see above)
        if measure > 2:
            w2, m2, sok = _remove_suffix(w, prefix, measure)
            if sok:
                w, measure = w2, m2
                if measure > 2 and not replaced:
                    w3, m3, _, ok3 = _second_order(w, measure)
                    if ok3:
                        w, measure = w3, m3
        return w
    # no first-order prefix
    w2, m2, prefix2, ok2 = _second_order(w, measure)
    if ok2:
        w, measure, prefix = w2, m2, prefix2
    if measure > 2:
        w3, m3, sok = _remove_suffix(w, prefix if ok2 else 0, measure)
        if sok:
            w, measure = w3, m3
    return w
