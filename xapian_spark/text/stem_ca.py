"""Catalan Snowball stemmer, pure Python.

From-scratch implementation of the published Snowball Catalan algorithm
(the same algorithm the reference compiles from
`xapian-core/languages/catalan.sbl`, by Israel Olalla).

SPEC-DERIVED: xapian-data/stemming ships no Catalan test vocabulary
(verified — only COPYING/README), so like tamil this cannot be
byte-validated against a public golden corpus; the implementation follows
the .sbl semantics exactly (suffix tables machine-extracted from the
stringdef escapes) and is covered by hand-checked smoke tests.

Structure (catalan.sbl:41-200): mark_regions computes the standard R1/R2;
then backwards (no RV limit):
  do attached_pronoun                      -- R1 delete
  do (standard_suffix or verb_suffix)      -- grouped R1/R2 delete/replace
  do residual_suffix                       -- R1 delete / iqu -> ic
finally a forward `cleaning` pass folds accented vowels to plain ones and
the middle-dot (l·l) to '.'.  Per Snowball among semantics the longest
matching suffix wins across ALL groups and a failing R1/R2 condition
fails the routine without retrying shorter suffixes.
"""

from __future__ import annotations

from functools import lru_cache

# v = aeiou + accented variants (catalan.sbl:39).  NB: i-grave (ì) is
# stringdef'd in the .sbl but deliberately ABSENT from v — an upstream
# quirk we reproduce exactly.
_V = frozenset("aeiouáàéèíïóòúü")

# (suffixes, action) groups, machine-extracted from catalan.sbl.
# Actions: ("del", region) deletes in region; ("rep", region, s) replaces
# the suffix with s when the cut point lies in region (1 = R1, 2 = R2).

_ATTACHED_PRONOUN = (
    (
        (
            "'s", "'hi", "'ho", "'l", "'ls", '-ls', '-la', '-les', '-li',
            'vos', 'se', 'nos', '-nos', '-us', 'us', "'n", "'ns", '-n',
            '-ns', "'m", '-me', '-m', '-te', "'t", 'li', 'lo', 'los', 'me',
            'sela', 'selo', 'selas', 'selos', 'le', 'la', 'las', 'les',
            'ens', 'ho', 'hi',
        ),
        ('del', 1),
    ),
)

_STANDARD_SUFFIX = (
    (
        (
            'ar', 'atge', 'formes', 'icte', 'ictes', 'ell', 'ells', 'ella',
            'és', 'ès', 'esc', 'essa', 'et', 'ets', 'eta', 'eres', 'eries',
            'ers', 'ina', 'ines', 'able', 'ls', 'ió', 'itat', 'itats',
            'itzar', 'iva', 'ives', 'ivisme', 'ius', 'fer', 'ment', 'amen',
            'ament', 'aments', 'ments', 'ot', 'sfera', 'al', 'als', 'era',
            'ana', 'iste', 'aire', 'eria', 'esa', 'eses', 'esos', 'or',
            'ícia', 'ícies', 'icis', 'ici', 'íci', 'ícis', 'ària', 'àries',
            'alla', 'ció', 'cions', 'nça', 'nces', 'ó', 'dor', 'all', 'il',
            'ístic', 'enc', 'enca', 'ís', 'issa', 'issos', 'íssem',
            'íssiu', 'issem', 'isseu', 'ísseu', 'ós', 'osa', 'dora',
            'dores', 'dors', 'adura', 'ble', 'bles', 'ívol', 'ívola',
            'dís', 'egar', 'ejar', 'ificar', 'itar', 'ables', 'adors',
            'idores', 'idors', 'adora', 'ació', 'doras', 'dur', 'dures',
            'allengües', 'ant', 'ants', 'ancia', 'ancies', 'atòria',
            'atòries', 'tori', 'toris', 'ats', 'ions', 'ota', 'isam',
            'ors', 'ora', 'ores', 'isament', 'bilitat', 'bilitats',
            'ivitat', 'ivitats', 'ari', 'aris', 'ionisme', 'ionista',
            'ionistes', 'ialista', 'ialistes', 'ialisme', 'ialismes',
            'ud', 'uts', 'uds', 'encia', 'encies', 'ència', 'ències',
            'ïtat', 'ïtats', 'atiu', 'atius', 'atives', 'ativa',
            'ativitat', 'ativitats', 'ible', 'ibles', 'assa', 'asses',
            'assos', 'ent', 'ents', 'íssim', 'íssima', 'íssims',
            'íssimes', 'ìssem', 'ìsseu', 'ìssin', 'ims', 'ima', 'imes',
            'isme', 'ista', 'ismes', 'istes', 'inia', 'inies', 'íinia',
            'ínies', 'ita', 'ites', 'triu', 'trius', 'oses', 'osos',
            'ient', 'otes', 'ots',
        ),
        ('del', 1),
    ),
    (('acions', 'ada', 'ades'), ('del', 2)),
    (
        (
            'logía', 'logíes', 'logia', 'logies', 'logi', 'logis',
            'lógica', 'lógics', 'lógiques',
        ),
        ('rep', 2, 'log'),
    ),
    (('ic', 'ica', 'ics', 'iques'), ('rep', 2, 'ic')),
    (
        ('quíssim', 'quíssims', 'quíssimes', 'quíssima'),
        ('rep', 1, 'c'),
    ),
)

_VERB_SUFFIX = (
    (
        (
            'ador', 'adora', 'adors', 'adores', 're', 'ie', 'ent', 'ents',
            'udes', 'arà', 'eren', 'ará', 'arían', 'arías', 'arán',
            'arás', 'aríais', 'aria', 'arian', 'arien', 'aries', 'aràs',
            'aría', 'aréis', 'aríamos', 'aremos', 'ara', 'aré', 'arés',
            'erían', 'erías', 'erán', 'erás', 'eríais', 'ería', 'eréis',
            'eríamos', 'eremos', 'erá', 'eré', 'er', 'erau', 'erass',
            'irían', 'irías', 'irán', 'irás', 'iríais', 'iría', 'iréis',
            'iríamos', 'iremos', 'irá', 'iré', 'írem', 'íreu', 'íeu',
            'ia', 'ies', 'íem', 'ìeu', 'ien', 'at', 'ut', 'uda', 'ava',
            'aves', 'avem', 'ávem', 'àvem', 'àveu', 'áveu', 'aven', 'au',
            'ats', 'asseu', 'esseu', 'eresseu', 'àsseu', 'àssem',
            'àssim', 'àssiu', 'essen', 'esses', 'assen', 'asses',
            'assim', 'assiu', 'éssen', 'ésseu', 'éssim', 'éssiu',
            'éssem', 'í', 'ares', 'àrem', 'àreu', 'àren', 'aríem',
            'aríeu', 'areu', 'aren', 'ant', 'ïm', 'ïu', 'és', 'ïen',
            'en', 'es', 'em', 'am', 'ams', 'ïa', 'ïes', 'dre', 'eix',
            'eixer', 'tzar', 'eixes', 'ides', 'ïdes', 'it', 'ït', 'ïda',
            'aba', 'ada', 'ades', 'ida', 'ía', 'iera', 'ad', 'ed',
            'its', 'id', 'ids', 'ase', 'iese', 'aste', 'iste', 'an',
            'aban', 'ían', 'aran', 'ieran', 'asen', 'iesen', 'aron',
            'ieron', 'ado', 'ido', 'iendo', 'ió', 'ar', 'ir', 'as',
            'ieu', 'ii', 'io', 'ià', 'ess', 'essin', 'essis', 'ass',
            'assin', 'assis', 'essim', 'èssim', 'èssiu', 'abas', 'adas',
            'idas', 'ías', 'aras', 'ieras', 'ases', 'ieses', 'ís',
            'áis', 'abais', 'íais', 'arais', 'ierais', 'aseis',
            'ieseis', 'asteis', 'isteis', 'ados', 'idos', 'amos',
            'ábamos', 'íamos', 'imos', 'ques', 'áramos', 'iéramos',
            'iésemos', 'ásemos', 'ira', 'iran', 'irem', 'iren', 'ires',
            'ireu', 'iria', 'irien', 'iries', 'irà', 'iràs', 'irè',
            'irìem', 'irìeu', 'isquen', 'iguem', 'igueu', 'esqui',
            'esquin', 'esquis', 'eixi', 'eixin', 'eixis', 'eixen',
            'eixo', 'isin', 'isis', 'esques', 'sis', 'sin', 'int',
            'iríem', 'iríeu', 'isc', 'atges', 'esca', 'esquen', 'issen',
            'isses', 'issin', 'issis', 'isca', 'issiu', 'issim', 'ïsc',
            'ïsca', 'ïssin', 'íssiu', 'íssim', 'ïssis', 'ïguem',
            'ïgueu', 'ïra', 'ïren', 'ïres', 'ïsquen', 'ïsques', 'ïssen',
            'ïsses', 'ïxo', 'ïxen', 'ïxes', 'ïx', 'ixo', 'ixen', 'ixes',
            'ix', 'ixa', 'inin', 'inis', 'ini', 'ineu', 'itza', 'itzi',
            'itzeu', 'itzis', 'itzo', 'itz', 'itzà', 'arem', 'in', 'às',
            'iï', 'iïn', 'iïs',
        ),
        ('del', 1),
    ),
    (('ando',), ('del', 2)),
)

_RESIDUAL_SUFFIX = (
    (
        (
            'os', 'a', 'o', 'á', 'à', 'í', 'ó', 'e', 'é', 'eu', 'iu',
            'is', 'i', 'ir', 's', 'ì', 'itz', 'ï', 'ïn', 'ïs', 'it',
        ),
        ('del', 1),
    ),
    (('iqu',), ('rep', 1, 'ic')),
)

# cleaning (catalan.sbl:52-68): accent folding + middle-dot -> '.'
_CLEAN = str.maketrans(
    "áàéèíìóòúüï·", "aaeeiioouui."
)


def _among(w: str, groups) -> tuple[str, tuple] | None:
    """Longest suffix of w across every group; -> (suffix, action)."""
    best = None
    for sufs, action in groups:
        for s in sufs:
            if w.endswith(s) and (best is None or len(s) > len(best[0])):
                best = (s, action)
    return best


def _apply(w: str, groups, p1: int, p2: int) -> str | None:
    """Run one backwardmode among routine; None = routine failed."""
    m = _among(w, groups)
    if m is None:
        return None
    suf, action = m
    cut = len(w) - len(suf)
    region = p1 if action[1] == 1 else p2
    if cut < region:
        return None  # condition fails -> whole among fails, no retry
    if action[0] == 'del':
        return w[:cut]
    return w[:cut] + action[2]


@lru_cache(maxsize=1 << 16)
def stem_ca(word: str) -> str:
    w = word
    n = len(w)

    # -- mark_regions (catalan.sbl:41-50): standard R1/R2 -----------------
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _V:      # gopast v
        i += 1
    if i < n:
        i += 1
        while i < n and w[i] in _V:      # gopast non-v
            i += 1
        if i < n:
            p1 = i + 1
            j = p1
            while j < n and w[j] not in _V:
                j += 1
            if j < n:
                j += 1
                while j < n and w[j] in _V:
                    j += 1
                if j < n:
                    p2 = j + 1

    # -- backwards (catalan.sbl:192-198) ----------------------------------
    r = _apply(w, _ATTACHED_PRONOUN, p1, p2)
    if r is not None:
        w = r
    r = _apply(w, _STANDARD_SUFFIX, p1, p2)
    if r is None:  # `or`: only try verb_suffix when standard_suffix fails
        r = _apply(w, _VERB_SUFFIX, p1, p2)
    if r is not None:
        w = r
    r = _apply(w, _RESIDUAL_SUFFIX, p1, p2)
    if r is not None:
        w = r

    # -- cleaning (forward) ------------------------------------------------
    return w.translate(_CLEAN)
