"""Positional match predicates (OP_PHRASE / OP_NEAR post-filters).

Semantics re-derived from the reference matchers:

- PHRASE (`xapian-core/matcher/phrasepostlist.cc:66-103`): exists strictly
  increasing positions p_0 < p_1 < ... < p_{n-1}, p_i from term i's position
  list, with span max-min < window.  The reference greedily takes the minimal
  next position per term and advances the base on window overflow; we do the
  same (greedy-minimal is optimal for fixed base).
- NEAR (`xapian-core/matcher/nearpostlist.cc:75-160`): exists *distinct*
  positions, one per term, any order, with span max-min < window.  Duplicate
  positions (same term twice) must resolve to distinct slots — a system of
  distinct representatives; we run tiny augmenting-path matching per
  candidate window.

These run only on docs that already match the AND of the terms — the same
shape as the reference's SelectPostList::test_doc post-filtering
(`xapian-core/matcher/selectpostlist.cc`).  They execute as Arrow-batched
pandas UDFs over the per-term position arrays.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right


def phrase_match(poslists: list[list[int]], window: int) -> bool:
    if any(not pl for pl in poslists):
        return False
    n = len(poslists)
    if n == 1:
        return True
    base_list = poslists[0]
    bi = 0
    while bi < len(base_list):
        base = base_list[bi]
        pos = base
        b = base + n
        ok = True
        for i in range(1, n):
            pl = poslists[i]
            j = bisect_right(pl, pos)
            if j == len(pl):
                return False  # no position beyond pos for term i: no base works
            pos = pl[j]
            b = pos + (n - i)
            if b - base > window:
                ok = False
                break
        if ok:
            return True
        # advance base to the first position >= b - window (> base)
        bi = bisect_left(base_list, b - window, bi + 1)
    return False


def _sdr_exists(cands: list[list[int]]) -> bool:
    """Distinct-representative matching (Hopcroft-Karp unnecessary at n<=8)."""
    match: dict[int, int] = {}

    def augment(i: int, seen: set[int]) -> bool:
        for p in cands[i]:
            if p in seen:
                continue
            seen.add(p)
            if p not in match or augment(match[p], seen):
                match[p] = i
                return True
        return False

    order = sorted(range(len(cands)), key=lambda i: len(cands[i]))
    for i in order:
        if not augment(i, set()):
            return False
    return True


def near_match(poslists: list[list[int]], window: int) -> bool:
    if any(not pl for pl in poslists):
        return False
    n = len(poslists)
    if n == 1:
        return True
    all_pos = sorted({p for pl in poslists for p in pl})
    for lo in all_pos:
        hi = lo + window - 1  # span < window
        cands = []
        feasible = True
        for pl in poslists:
            a = bisect_left(pl, lo)
            b = bisect_right(pl, hi)
            if a == b:
                feasible = False
                break
            cands.append(pl[a:b])
        if feasible and _sdr_exists(cands):
            return True
    return False
