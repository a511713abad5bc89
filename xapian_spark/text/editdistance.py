"""Transposition-aware edit distance (restricted Damerau-Levenshtein).

The reference computes edit distance with transpositions counted as a
single edit (api/editdistance.cc — a Berghel-Roach diagonal algorithm whose
is_transposed() check makes it the "optimal string alignment" distance).
Here a plain O(len1*len2) DP with the transposition recurrence — it only
runs over dictionary terms that already passed a cheap JVM levenshtein
prefilter, so the Python cost is bounded by the candidate set, not the
dictionary.

Relation used for the prefilter: a transposition can be simulated by two
substitutions, so levenshtein(a, b) <= 2 * osa(a, b); filtering the
dictionary to levenshtein <= 2*k keeps every term with osa <= k.
"""

from __future__ import annotations


def osa_distance(a: str, b: str) -> int:
    """Restricted Damerau-Levenshtein (optimal string alignment): edits are
    insert, delete, substitute, and transpose-adjacent, with no substring
    edited twice.  Matches the reference's transposition semantics
    (editdistance.cc:108-128): teh -> the is ONE edit."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2: list[int] = []
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ai == b[j - 1] else 1
            d = min(prev[j] + 1,        # delete
                    cur[j - 1] + 1,     # insert
                    prev[j - 1] + cost)  # substitute
            if (
                i > 1 and j > 1
                and ai == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d = min(d, prev2[j - 2] + 1)  # transpose
            cur[j] = d
        prev2, prev = prev, cur
    return prev[lb]
