"""Snowball stemmers: french / german / spanish / russian / italian /
dutch / danish / norwegian / swedish / portuguese / romanian.

The reference's ``StemmerTokenFilterFactory.java`` maps these language
names to Lucene ``SnowballFilter`` over the corresponding
``org.tartarus.snowball.ext.*Stemmer`` (french :176-177, german
:190-191, spanish :263-264, russian :257-258), and
``SnowballTokenFilterFactory.java`` / ``SnowballAnalyzerProvider.java``
expose the same stemmers as the ``snowball`` filter / analyzer
(italian :219, dutch :139).

These implementations follow the PUBLISHED per-language algorithm
specifications from the Snowball project (M.F. Porter, "Snowball: A
language for stemming algorithms", 2001; snowballstem.org algorithm
descriptions) — written from the prose specifications, not translated
from any generated code.  Each stemmer expects (and defensively
applies) lowercase input, matching the reference chains which place a
lowercase filter before the stemmer.

Version note: the Snowball project has revised some algorithms over the
years (e.g. French gained ``ë``/``ï`` handling in later revisions).
These implement the long-standing classic specifications; outputs are
pinned by hand-traced vocabularies in ``tests/test_snowball.py``
(traced step-by-step against the published algorithm text, since no
reference stemmer binary is available in this environment).
"""

from __future__ import annotations

__all__ = ["french_stem", "german_stem", "spanish_stem", "russian_stem",
           "italian_stem", "dutch_stem", "danish_stem", "norwegian_stem",
           "swedish_stem", "portuguese_stem", "romanian_stem"]


def _std_r1r2(word: str, vowels: str) -> tuple:
    """Standard R1/R2: R1 = region after the first non-vowel following
    a vowel; R2 = the same definition applied within R1 (Porter,
    "Defining R1 and R2", snowballstem.org/texts/r1r2.html)."""
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r2 = i + 1
            break
    return r1, r2


# ===================================================================
# German (snowballstem.org/algorithms/german/stemmer.html)
# ===================================================================

_DE_V = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"  # valid s-ending
_DE_ST_END = "bdfghklmnt"  # valid st-ending


def german_stem(word: str) -> str:
    word = word.lower().replace("ß", "ss")
    # u/y between vowels are marked as consonants (upper case)
    ch = list(word)
    for i in range(1, len(ch) - 1):
        if ch[i] in "uy" and ch[i - 1] in _DE_V and ch[i + 1] in _DE_V:
            ch[i] = ch[i].upper()
    word = "".join(ch)
    r1, r2 = _std_r1r2(word, _DE_V)
    # the region before R1 must contain at least 3 letters
    if r1 < 3:
        r1 = 3

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1 — longest of: (a) em ern er  (b) e en es [+niss fixup]
    #                      (c) s after a valid s-ending
    for suf in ("ern", "em", "er", "en", "es", "e", "s"):
        if word.endswith(suf):
            pos = len(word) - len(suf)
            if suf in ("ern", "em", "er"):
                if in_r1(pos):
                    word = word[:pos]
            elif suf in ("en", "es", "e"):
                if in_r1(pos):
                    word = word[:pos]
                    if word.endswith("niss"):
                        word = word[:-1]
            else:  # "s"
                if in_r1(pos) and pos >= 1 and word[pos - 1] in _DE_S_END:
                    word = word[:pos]
            break

    # step 2 — longest of: (a) en er est  (b) st after a valid
    # st-ending itself preceded by at least 3 letters
    for suf in ("est", "en", "er", "st"):
        if word.endswith(suf):
            pos = len(word) - len(suf)
            if suf == "st":
                if in_r1(pos) and pos >= 4 and word[pos - 1] in _DE_ST_END:
                    word = word[:pos]
            else:
                if in_r1(pos):
                    word = word[:pos]
            break

    # step 3 — d-suffixes
    for suf in ("heit", "lich", "keit", "isch", "end", "ung", "ig", "ik"):
        if word.endswith(suf):
            pos = len(word) - len(suf)
            if suf in ("end", "ung"):
                if in_r2(pos):
                    word = word[:pos]
                    if word.endswith("ig") and not word.endswith("eig") and in_r2(
                        len(word) - 2
                    ):
                        word = word[:-2]
            elif suf in ("ig", "ik", "isch"):
                if in_r2(pos) and not (pos >= 1 and word[pos - 1] == "e"):
                    word = word[:pos]
            elif suf in ("lich", "heit"):
                if in_r2(pos):
                    word = word[:pos]
                    for pre in ("er", "en"):
                        if word.endswith(pre) and in_r1(len(word) - 2):
                            word = word[:-2]
                            break
            else:  # keit
                if in_r2(pos):
                    word = word[:pos]
                    for pre in ("lich", "ig"):
                        if word.endswith(pre) and in_r2(len(word) - len(pre)):
                            word = word[: -len(pre)]
                            break
            break

    word = word.replace("U", "u").replace("Y", "y")
    return word.translate(_DE_UNUMLAUT)


_DE_UNUMLAUT = str.maketrans("äöü", "aou")


# ===================================================================
# French (snowballstem.org/algorithms/french/stemmer.html)
# ===================================================================

_FR_V = "aeiouyâàëéêèïîôûù"

# step-1 suffixes, longest first; value = handler group
_FR_STEP1 = [
    ("issements", "issement"), ("issement", "issement"),
    ("atrices", "ateur"), ("amment", "amment"), ("emment", "emment"),
    ("ements", "ement"), ("atrice", "ateur"), ("ateurs", "ateur"),
    ("ations", "ateur"), ("logies", "logie"), ("usions", "usion"),
    ("utions", "usion"), ("ement", "ement"), ("ances", "simple"),
    ("iqUes", "simple"), ("ismes", "simple"), ("ables", "simple"),
    ("istes", "simple"), ("ateur", "ateur"), ("ation", "ateur"),
    ("logie", "logie"), ("usion", "usion"), ("ution", "usion"),
    ("ences", "ence"), ("ments", "ment"), ("euses", "euse"),
    ("ance", "simple"), ("iqUe", "simple"), ("isme", "simple"),
    ("able", "simple"), ("iste", "simple"), ("ence", "ence"),
    ("ités", "ité"), ("ives", "if"), ("eaux", "eaux"), ("euse", "euse"),
    ("ment", "ment"), ("eux", "simple"), ("ité", "ité"), ("ifs", "if"),
    ("ive", "if"), ("aux", "aux"), ("if", "if"),
]

_FR_2A = sorted(
    [
        "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
        "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
        "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
        "issant", "issante", "issantes", "issants", "isse", "issent",
        "isses", "issez", "issiez", "issions", "issons", "it",
    ],
    key=len,
    reverse=True,
)

_FR_2B_DELETE = [
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "iez", "era", "ées", "és", "er",
    "ez", "ée", "é",
]
_FR_2B_E = [
    "assions", "assiez", "assent", "asses", "aIent", "antes", "asse",
    "âmes", "âtes", "ants", "ante", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
]


def french_stem(word: str) -> str:
    word = word.lower()
    ch = list(word)
    n = len(ch)
    # mark non-vowel u/i/y occurrences as consonants (upper case)
    for i in range(n):
        c = ch[i]
        if c in "ui" and 0 < i < n - 1 and ch[i - 1] in _FR_V and ch[i + 1] in _FR_V:
            ch[i] = c.upper()
        elif c == "u" and i > 0 and ch[i - 1] == "q":
            ch[i] = "U"
        elif c == "y" and (
            (i > 0 and ch[i - 1] in _FR_V) or (i < n - 1 and ch[i + 1] in _FR_V)
        ):
            ch[i] = "Y"
    word = "".join(ch)

    n = len(word)
    rv = n
    if n >= 3 and word[0] in _FR_V and word[1] in _FR_V:
        rv = 3
    elif word[:3] in ("par", "col", "tap"):
        rv = 3
    else:
        for i in range(1, n):
            if word[i] in _FR_V:
                rv = i + 1
                break
    r1, r2 = _std_r1r2(word, _FR_V)

    original = word
    found_ment = False

    # ---- step 1: standard suffix removal
    for suf, grp in _FR_STEP1:
        if not word.endswith(suf):
            continue
        pos = len(word) - len(suf)
        if grp == "simple":
            if pos >= r2:
                word = word[:pos]
        elif grp == "ateur":
            if pos >= r2:
                word = word[:pos]
                if word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
        elif grp == "logie":
            if pos >= r2:
                word = word[:pos] + "log"
        elif grp == "usion":
            if pos >= r2:
                word = word[:pos] + "u"
        elif grp == "ence":
            if pos >= r2:
                word = word[:pos] + "ent"
        elif grp == "ement":
            if pos >= rv:
                word = word[:pos]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                elif word.endswith("eus"):
                    if len(word) - 3 >= r2:
                        word = word[:-3]
                    elif len(word) - 3 >= r1:
                        word = word[:-3] + "eux"
                elif word.endswith("abl") and len(word) - 3 >= r2:
                    word = word[:-3]
                elif word.endswith("iqU") and len(word) - 3 >= r2:
                    word = word[:-3]
                elif (
                    word.endswith("ièr") or word.endswith("Ièr")
                ) and len(word) - 3 >= rv:
                    word = word[:-3] + "i"
        elif grp == "ité":
            if pos >= r2:
                word = word[:pos]
                if word.endswith("abil"):
                    if len(word) - 4 >= r2:
                        word = word[:-4]
                    else:
                        word = word[:-4] + "abl"
                elif word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
                elif word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif grp == "if":
            if pos >= r2:
                word = word[:pos]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic"):
                        if len(word) - 2 >= r2:
                            word = word[:-2]
                        else:
                            word = word[:-2] + "iqU"
        elif grp == "eaux":
            word = word[:pos] + "eau"
        elif grp == "aux":
            if pos >= r1:
                word = word[:pos] + "al"
        elif grp == "euse":
            if pos >= r2:
                word = word[:pos]
            elif pos >= r1:
                word = word[:pos] + "eux"
        elif grp == "issement":
            if pos >= r1 and pos >= 1 and word[pos - 1] not in _FR_V:
                word = word[:pos]
        elif grp == "amment":
            found_ment = True
            if pos >= rv:
                word = word[:pos] + "ant"
        elif grp == "emment":
            found_ment = True
            if pos >= rv:
                word = word[:pos] + "ent"
        elif grp == "ment":
            found_ment = True
            if pos >= 1 and word[pos - 1] in _FR_V and pos - 1 >= rv:
                word = word[:pos]
        break

    step1_removed = word != original
    after1 = word

    # ---- steps 2a / 2b: verb suffixes
    did_2 = False
    if not step1_removed or found_ment:
        for suf in _FR_2A:
            if word.endswith(suf):
                pos = len(word) - len(suf)
                if (
                    pos >= rv
                    and pos >= 1
                    and word[pos - 1] not in _FR_V
                    and pos - 1 >= rv
                ):
                    word = word[:pos]
                    did_2 = True
                break
        if not did_2:
            # step 2b — longest across the three groups
            cands = (
                [("ions", "ions")]
                + [(s, "del") for s in _FR_2B_DELETE]
                + [(s, "e") for s in _FR_2B_E]
            )
            cands.sort(key=lambda x: len(x[0]), reverse=True)
            for suf, grp in cands:
                if not word.endswith(suf):
                    continue
                pos = len(word) - len(suf)
                if pos < rv:
                    break
                if grp == "ions":
                    if pos >= r2:
                        word = word[:pos]
                        did_2 = True
                elif grp == "del":
                    word = word[:pos]
                    did_2 = True
                else:
                    word = word[:pos]
                    did_2 = True
                    if word.endswith("e") and len(word) - 1 >= rv:
                        word = word[:-1]
                break

    altered = word != original

    if altered:
        # ---- step 3
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # ---- step 4
        if (
            word.endswith("s")
            and len(word) >= 2
            and word[-2] not in "aiouès"
        ):
            word = word[:-1]
        for suf in ("Ière", "ière", "Ier", "ier", "ion", "ë", "e"):
            if word.endswith(suf):
                pos = len(word) - len(suf)
                if suf == "ion":
                    if pos >= r2 and pos >= 1 and word[pos - 1] in "st" and pos - 1 >= rv:
                        word = word[:pos]
                elif suf in ("ier", "ière", "Ier", "Ière"):
                    if pos >= rv:
                        word = word[:pos] + "i"
                elif suf == "e":
                    if pos >= rv:
                        word = word[:pos]
                else:  # ë
                    if pos >= rv and word.endswith("guë"):
                        word = word[:-1]
                break

    # ---- step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if word.endswith(end):
            word = word[:-1]
            break

    # ---- step 6: un-accent é/è before a final non-vowel run
    k = len(word) - 1
    cnt = 0
    while k >= 0 and word[k] not in _FR_V and word[k] not in "éè":
        k -= 1
        cnt += 1
    if cnt >= 1 and k >= 0 and word[k] in "éè":
        word = word[:k] + "e" + word[k + 1 :]

    return word.replace("I", "i").replace("U", "u").replace("Y", "y")


# ===================================================================
# Spanish (snowballstem.org/algorithms/spanish/stemmer.html)
# ===================================================================

_ES_V = "aeiouáéíóúü"
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")

_ES_PRON = sorted(
    ["me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
     "las", "les", "los", "nos"],
    key=len,
    reverse=True,
)

_ES_STEP1 = [
    # (suffix, group); longest-first ordering built below
    ("amientos", "A"), ("imientos", "A"), ("amiento", "A"), ("imiento", "A"),
    ("aciones", "B"), ("uciones", "D"), ("adoras", "B"), ("adores", "B"),
    ("ancias", "B"), ("logías", "C"), ("encias", "E"), ("amente", "F"),
    ("idades", "H"), ("anzas", "A"), ("ismos", "A"), ("ables", "A"),
    ("ibles", "A"), ("istas", "A"), ("adora", "B"), ("ación", "B"),
    ("antes", "B"), ("ancia", "B"), ("logía", "C"), ("ución", "D"),
    ("encia", "E"), ("mente", "G"), ("anza", "A"), ("icos", "A"),
    ("icas", "A"), ("ismo", "A"), ("able", "A"), ("ible", "A"),
    ("ista", "A"), ("osos", "A"), ("osas", "A"), ("ador", "B"),
    ("ante", "B"), ("idad", "H"), ("ivas", "I"), ("ivos", "I"),
    ("ico", "A"), ("ica", "A"), ("oso", "A"), ("osa", "A"),
    ("iva", "I"), ("ivo", "I"),
]

_ES_2A = sorted(
    ["ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas", "yes",
     "yais", "yamos"],
    key=len,
    reverse=True,
)

_ES_2B_GU = ["en", "es", "éis", "emos"]
_ES_2B = [
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán", "erás",
    "eríais", "ería", "eréis", "eríamos", "eremos", "erá", "eré",
    "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
    "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida", "ía", "ara",
    "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste", "an",
    "aban", "ían", "aran", "ieran", "asen", "iesen", "aron", "ieron",
    "ado", "ido", "ando", "iendo", "ió", "ar", "er", "ir", "as",
    "abas", "adas", "idas", "ías", "aras", "ieras", "ases", "ieses",
    "ís", "áis", "abais", "íais", "arais", "ierais", "aseis", "ieseis",
    "asteis", "isteis", "ados", "idos", "amos", "ábamos", "íamos",
    "imos", "áramos", "iéramos", "iésemos", "ásemos", "o",
]


def spanish_stem(word: str) -> str:
    word = word.lower()
    n = len(word)
    # RV (Spanish-specific definition)
    rv = n
    if n >= 2:
        if word[1] not in _ES_V:
            for i in range(2, n):
                if word[i] in _ES_V:
                    rv = i + 1
                    break
        elif word[0] in _ES_V:
            for i in range(2, n):
                if word[i] not in _ES_V:
                    rv = i + 1
                    break
        else:
            rv = 3 if n > 3 else n
    r1, r2 = _std_r1r2(word, _ES_V)

    # ---- step 0: attached pronoun
    for p in _ES_PRON:
        if word.endswith(p):
            stem = word[: len(word) - len(p)]
            done = False
            for a in ("iéndo", "ándo", "ár", "ér", "ír"):
                if stem.endswith(a) and len(stem) - len(a) >= rv:
                    word = stem.translate(_ES_UNACCENT)
                    done = True
                    break
            if not done:
                for b in ("iendo", "ando", "ar", "er", "ir"):
                    if stem.endswith(b) and len(stem) - len(b) >= rv:
                        word = stem
                        done = True
                        break
            if not done and stem.endswith("yendo") and len(stem) >= 6 and stem[-6] == "u":
                # uyendo: the u need not be in RV
                if len(stem) - 5 >= rv:
                    word = stem
            break

    original = word

    # ---- step 1: standard suffix removal (longest match)
    step1 = sorted(_ES_STEP1, key=lambda x: len(x[0]), reverse=True)
    for suf, grp in step1:
        if not word.endswith(suf):
            continue
        pos = len(word) - len(suf)
        if grp == "A":
            if pos >= r2:
                word = word[:pos]
        elif grp == "B":
            if pos >= r2:
                word = word[:pos]
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif grp == "C":
            if pos >= r2:
                word = word[:pos] + "log"
        elif grp == "D":
            if pos >= r2:
                word = word[:pos] + "u"
        elif grp == "E":
            if pos >= r2:
                word = word[:pos] + "ente"
        elif grp == "F":  # amente
            if pos >= r1:
                word = word[:pos]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif grp == "G":  # mente
            if pos >= r2:
                word = word[:pos]
                for pre in ("ante", "able", "ible"):
                    if word.endswith(pre) and len(word) - 4 >= r2:
                        word = word[:-4]
                        break
        elif grp == "H":  # idad(es)
            if pos >= r2:
                word = word[:pos]
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
        elif grp == "I":  # iva/ivo/ivas/ivos
            if pos >= r2:
                word = word[:pos]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
        break

    # ---- step 2a: verb suffixes beginning y (only if step 1 removed nothing)
    if word == original:
        done2a = False
        for suf in _ES_2A:
            if word.endswith(suf):
                pos = len(word) - len(suf)
                if pos >= rv and pos >= 1 and word[pos - 1] == "u":
                    word = word[:pos]
                    done2a = True
                break
        # ---- step 2b: other verb suffixes
        if not done2a:
            cands = [(s, "gu") for s in _ES_2B_GU] + [(s, "del") for s in _ES_2B]
            cands.sort(key=lambda x: len(x[0]), reverse=True)
            for suf, grp in cands:
                if not word.endswith(suf):
                    continue
                pos = len(word) - len(suf)
                if pos >= rv:
                    word = word[:pos]
                    if grp == "gu" and word.endswith("gu"):
                        # the preceding u is deleted (need not be in RV)
                        word = word[:-1]
                break

    # ---- step 3: residual suffix
    for suf in ("os", "a", "o", "á", "í", "ó", "e", "é"):
        if word.endswith(suf):
            pos = len(word) - len(suf)
            if pos >= rv:
                if suf in ("e", "é"):
                    word = word[:pos]
                    if word.endswith("gu") and len(word) - 1 >= rv:
                        word = word[:-1]
                else:
                    word = word[:pos]
            break

    return word.translate(_ES_UNACCENT)


# ===================================================================
# Russian (snowballstem.org/algorithms/russian/stemmer.html)
# ===================================================================

_RU_V = "аеиоуыэюя"

_RU_PERF_G1 = ["вшись", "вши", "в"]
_RU_PERF_G2 = ["ившись", "ывшись", "ивши", "ывши", "ив", "ыв"]
_RU_ADJ = [
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем",
    "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею",
]
_RU_PART_G1 = ["ем", "нн", "вш", "ющ", "щ"]
_RU_PART_G2 = ["ивш", "ывш", "ующ"]
_RU_VERB_G1 = [
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
    "ет", "ют", "ны", "ть", "ешь", "нно",
]
_RU_VERB_G2 = [
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
    "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю",
]
_RU_NOUN = [
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии",
    "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам",
    "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия",
    "ья", "я",
]


def _ru_match(word: str, rv: int, group1, group2):
    """Longest suffix match within RV; group1 entries require а/я
    immediately before (the а/я must itself be in RV and is kept)."""
    best = None  # (total_matched_len, strip_len)
    for g in group1:
        i = len(word) - len(g)
        if i >= 1 and word.endswith(g) and word[i - 1] in "ая" and i - 1 >= rv:
            if best is None or len(g) + 1 > best[0]:
                best = (len(g) + 1, len(g))
    for g in group2:
        i = len(word) - len(g)
        if i >= 0 and word.endswith(g) and i >= rv:
            if best is None or len(g) > best[0]:
                best = (len(g), len(g))
    if best is None:
        return None
    return word[: len(word) - best[1]]


def russian_stem(word: str) -> str:
    word = word.lower().replace("ё", "е")
    rv = len(word)
    for i, c in enumerate(word):
        if c in _RU_V:
            rv = i + 1
            break
    r1, r2 = _std_r1r2(word, _RU_V)

    # ---- step 1
    new = _ru_match(word, rv, _RU_PERF_G1, _RU_PERF_G2)
    if new is not None:
        word = new
    else:
        # reflexive
        for suf in ("ся", "сь"):
            if word.endswith(suf) and len(word) - 2 >= rv:
                word = word[:-2]
                break
        # adjectival = adjective [optionally preceded by participle]
        new = _ru_match(word, rv, [], _RU_ADJ)
        if new is not None:
            word = new
            new = _ru_match(word, rv, _RU_PART_G1, _RU_PART_G2)
            if new is not None:
                word = new
        else:
            new = _ru_match(word, rv, _RU_VERB_G1, _RU_VERB_G2)
            if new is not None:
                word = new
            else:
                new = _ru_match(word, rv, [], _RU_NOUN)
                if new is not None:
                    word = new

    # ---- step 2: final и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # ---- step 3: derivational (in R2)
    for suf in ("ость", "ост"):
        if word.endswith(suf) and len(word) - len(suf) >= r2:
            word = word[: -len(suf)]
            break

    # ---- step 4
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        matched = False
        for suf in ("ейше", "ейш"):
            if word.endswith(suf) and len(word) - len(suf) >= rv:
                word = word[: -len(suf)]
                matched = True
                break
        if matched and word.endswith("нн") and len(word) - 1 >= rv:
            word = word[:-1]
        elif not matched and word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]
    return word


# ===================================================================
# Italian (snowballstem.org/algorithms/italian/stemmer.html; reference
# surface StemmerTokenFilterFactory.java:219 `italian` ->
# SnowballFilter(ItalianStemmer))
# ===================================================================

_IT_V = "aeiouàèìòù"
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRON = sorted(
    ["ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
     "sene", "gliela", "gliele", "glieli", "glielo", "gliene",
     "mela", "mele", "meli", "melo", "mene",
     "tela", "tele", "teli", "telo", "tene",
     "cela", "cele", "celi", "celo", "cene",
     "vela", "vele", "veli", "velo", "vene"],
    key=len, reverse=True,
)

_IT_STEP1 = [
    # group A: delete if in R2
    *[(s, "A") for s in (
        "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
        "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
        "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
        "ose", "mente", "atrice", "atrici", "ante", "anti",
    )],
    ("azione", "B"), ("azioni", "B"), ("atore", "B"), ("atori", "B"),
    ("logia", "C"), ("logie", "C"),
    ("uzione", "D"), ("uzioni", "D"), ("usione", "D"), ("usioni", "D"),
    ("enza", "E"), ("enze", "E"),
    ("amento", "F"), ("amenti", "F"), ("imento", "F"), ("imenti", "F"),
    ("amente", "G"),
    ("ità", "H"),
    ("ivo", "I"), ("ivi", "I"), ("iva", "I"), ("ive", "I"),
]

_IT_STEP2 = sorted(
    ["ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
     "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
     "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
     "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
     "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
     "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
     "Iamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
     "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti",
     "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
     "isco", "iscono", "issero", "ita", "ite", "iti", "ito", "iva",
     "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute",
     "uti", "uto", "ar", "ir"],
    key=len, reverse=True,
)


def _romance_rv(word: str, vowels: str) -> int:
    """Romance RV (the shared French/Spanish/Italian/Portuguese
    definition): second letter consonant -> after the next vowel;
    first two letters vowels -> after the next consonant; otherwise
    after the third letter."""
    n = len(word)
    rv = n
    if n >= 2:
        if word[1] not in vowels:
            for i in range(2, n):
                if word[i] in vowels:
                    rv = i + 1
                    break
        elif word[0] in vowels:
            for i in range(2, n):
                if word[i] not in vowels:
                    rv = i + 1
                    break
        else:
            rv = 3 if n > 3 else n
    return rv


def italian_stem(word: str) -> str:
    word = word.lower().translate(_IT_ACUTE)
    # mark u after q and u/i between vowels as non-vowels (upper case)
    chars = list(word)
    for i, c in enumerate(chars):
        if c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
        elif c in "ui" and 0 < i < len(chars) - 1 and (
            # an already-marked U/I neighbor is a non-vowel, so the
            # lowercase-only vowel test is exactly the spec's
            chars[i - 1] in _IT_V and chars[i + 1] in _IT_V
        ):
            chars[i] = c.upper()
    word = "".join(chars)
    rv = _romance_rv(word, _IT_V)
    r1, r2 = _std_r1r2(word, _IT_V)

    # ---- step 0: attached pronoun (all tests inside RV)
    for p in _IT_PRON:
        if word.endswith(p):
            stem = word[: len(word) - len(p)]
            for a in ("ando", "endo"):
                if stem.endswith(a) and len(stem) - len(a) >= rv:
                    word = stem
                    break
            else:
                for b in ("ar", "er", "ir"):
                    if stem.endswith(b) and len(stem) - len(b) >= rv:
                        word = stem + "e"
                        break
            break

    original = word

    # ---- step 1: standard suffixes (longest match decides the rule)
    step1 = sorted(_IT_STEP1, key=lambda x: len(x[0]), reverse=True)
    for suf, grp in step1:
        if not word.endswith(suf):
            continue
        pos = len(word) - len(suf)
        if grp == "A":
            if pos >= r2:
                word = word[:pos]
        elif grp == "B":
            if pos >= r2:
                word = word[:pos]
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif grp == "C":
            if pos >= r2:
                word = word[:pos] + "log"
        elif grp == "D":
            if pos >= r2:
                word = word[:pos] + "u"
        elif grp == "E":
            if pos >= r2:
                word = word[:pos] + "ente"
        elif grp == "F":  # amento/amenti/imento/imenti: RV, not R2
            if pos >= rv:
                word = word[:pos]
        elif grp == "G":  # amente
            if pos >= r1:
                word = word[:pos]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "abil"):
                        if word.endswith(pre) and len(word) - len(pre) >= r2:
                            word = word[: -len(pre)]
                            break
        elif grp == "H":  # ità
            if pos >= r2:
                word = word[:pos]
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
        elif grp == "I":  # ivo/ivi/iva/ive
            if pos >= r2:
                word = word[:pos]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic") and len(word) - 2 >= r2:
                        word = word[:-2]
        break

    # ---- step 2: verb suffixes (only if step 1 removed nothing)
    if word == original:
        for suf in _IT_STEP2:
            if word.endswith(suf):
                if len(word) - len(suf) >= rv:
                    word = word[: -len(suf)]
                break

    # ---- step 3a: residual vowel (+ a preceding i), both in RV
    for suf in ("a", "e", "i", "o", "à", "è", "ì", "ò"):
        if word.endswith(suf):
            if len(word) - 1 >= rv:
                word = word[:-1]
                if word.endswith("i") and len(word) - 1 >= rv:
                    word = word[:-1]
            break
    # ---- step 3b: final ch/gh -> c/g in RV
    for suf, rep in (("ch", "c"), ("gh", "g")):
        if word.endswith(suf) and len(word) - 2 >= rv:
            word = word[:-2] + rep
            break

    return word.replace("I", "i").replace("U", "u")


# ===================================================================
# Dutch (snowballstem.org/algorithms/dutch/stemmer.html; reference
# surface StemmerTokenFilterFactory.java:139 `dutch` ->
# SnowballFilter(DutchStemmer))
# ===================================================================

_NL_V = "aeiouyè"
_NL_FOLD = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_undouble(word: str) -> str:
    for dd in ("kk", "dd", "tt"):
        if word.endswith(dd):
            return word[:-1]
    return word


def _nl_valid_en(stem: str) -> bool:
    """Valid en-ending: a non-vowel, and not the string gem."""
    return (
        bool(stem)
        and stem[-1] not in _NL_V
        and not stem.endswith("gem")
    )


def dutch_stem(word: str) -> str:
    word = word.lower().translate(_NL_FOLD)
    # mark initial y, y after a vowel, and i between vowels
    chars = list(word)
    for i, c in enumerate(chars):
        if c == "y" and (i == 0 or chars[i - 1] in _NL_V):
            chars[i] = "Y"
        elif c == "i" and 0 < i < len(chars) - 1 and (
            chars[i - 1] in _NL_V and chars[i + 1] in _NL_V
        ):
            chars[i] = "I"
    word = "".join(chars)
    r1, r2 = _std_r1r2(word, _NL_V)
    r1 = max(r1, 3) if len(word) >= 3 else r1  # >=3 letters before R1

    # ---- step 1: longest among heden / ene / en / se / s
    for suf in ("heden", "ene", "en", "se", "s"):
        if not word.endswith(suf):
            continue
        pos = len(word) - len(suf)
        if suf == "heden":
            if pos >= r1:
                word = word[:pos] + "heid"
        elif suf in ("ene", "en"):
            stem = word[:pos]
            if pos >= r1 and _nl_valid_en(stem):
                word = _nl_undouble(stem)
        else:  # se / s: valid s-ending = non-vowel other than j
            stem = word[:pos]
            if pos >= r1 and stem and stem[-1] not in _NL_V + "j":
                word = stem
        break

    # ---- step 2: final e after a non-vowel
    e_removed = False
    if (
        word.endswith("e")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] not in _NL_V
    ):
        word = _nl_undouble(word[:-1])
        e_removed = True

    # ---- step 3a: heid (not after c), then an en-suffix as in step 1
    if (
        word.endswith("heid")
        and len(word) - 4 >= r2
        and (len(word) < 5 or word[-5] != "c")
    ):
        word = word[:-4]
        if word.endswith("en"):
            stem = word[:-2]
            if len(word) - 2 >= r1 and _nl_valid_en(stem):
                word = _nl_undouble(stem)

    # ---- step 3b: d-suffixes (longest match decides)
    for suf in ("baar", "lijk", "end", "ing", "bar", "ig"):
        if not word.endswith(suf):
            continue
        pos = len(word) - len(suf)
        if suf in ("end", "ing"):
            if pos >= r2:
                word = word[:pos]
                if (
                    word.endswith("ig")
                    and len(word) - 2 >= r2
                    and (len(word) < 3 or word[-3] != "e")
                ):
                    word = word[:-2]
                else:
                    word = _nl_undouble(word)
        elif suf == "ig":
            if pos >= r2 and (pos == 0 or word[pos - 1] != "e"):
                word = word[:pos]
        elif suf == "lijk":
            if pos >= r2:
                word = word[:pos]
                # then repeat step 2
                if (
                    word.endswith("e")
                    and len(word) - 1 >= r1
                    and len(word) >= 2
                    and word[-2] not in _NL_V
                ):
                    word = _nl_undouble(word[:-1])
        elif suf == "baar":
            if pos >= r2:
                word = word[:pos]
        elif suf == "bar":
            if pos >= r2 and e_removed:
                word = word[:pos]
        break

    # ---- step 4: undouble vowel — C + aa/ee/oo/uu + non-I consonant
    if len(word) >= 4:
        c, v1, v2, d = word[-4], word[-3], word[-2], word[-1]
        if (
            c not in _NL_V
            and v1 == v2
            and v1 in "aeou"
            and d not in _NL_V
            and d != "I"
        ):
            word = word[:-2] + word[-1]

    return word.replace("I", "i").replace("Y", "y")


# ===================================================================
# Scandinavian trio: Danish / Norwegian / Swedish
# (snowballstem.org/algorithms/{danish,norwegian,swedish}/stemmer.html;
# reference surface StemmerTokenFilterFactory.java:134 `danish`,
# :230 `norwegian`, :273 `swedish` -> SnowballFilter over the
# corresponding org.tartarus.snowball.ext stemmer)
# ===================================================================
#
# Shared structure: R1 with the Scandinavian minimum — "R1 is adjusted
# so that the region before it contains at least 3 letters".  Suffix
# matching follows snowball `among` semantics: the LONGEST matching
# suffix is selected first and its condition applied; a failed
# condition does NOT fall back to a shorter suffix.  The valid
# s-ending character itself need not be in R1 (only the matched
# suffix is region-limited — `setlimit tomark p1 for ([substring])`).


def _scand_r1(word: str, vowels: str) -> int:
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    return max(r1, 3) if n >= 3 else r1


_DA_V = "aeiouyæåø"
_DA_S_END = "abcdfghjklmnoprtvyzå"
_DA_STEP1 = sorted(
    ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
     "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
     "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
     "hedens", "erens", "ers", "ets", "erets", "et", "eret", "s"],
    key=len, reverse=True,
)
_DA_STEP2 = ("gd", "dt", "gt", "kt")


def danish_stem(word: str) -> str:
    word = word.lower()
    r1 = _scand_r1(word, _DA_V)

    # step 1: longest suffix in R1 (the bare `s` needs a valid
    # s-ending just before it; that char may lie before R1)
    for suf in _DA_STEP1:
        if not word.endswith(suf):
            continue
        pos = len(word) - len(suf)
        if pos >= r1:
            if suf == "s":
                if pos >= 1 and word[pos - 1] in _DA_S_END:
                    word = word[:pos]
            else:
                word = word[:pos]
        break

    def _step2(w: str) -> str:
        if len(w) >= 2 and w[-2:] in _DA_STEP2 and len(w) - 2 >= r1:
            return w[:-1]
        return w

    word = _step2(word)

    # step 3: igst loses st first; then ig/lig/elig/els delete (and
    # step 2 repeats) or løst -> løs — longest match across the groups
    if word.endswith("igst"):
        word = word[:-2]
    for suf in ("elig", "løst", "lig", "els", "ig"):
        if not word.endswith(suf):
            continue
        pos = len(word) - len(suf)
        if suf == "løst":
            if pos >= r1:
                word = word[:-1]
        elif pos >= r1:
            word = word[:pos]
            word = _step2(word)
        break

    # step 4 (undouble): final consonant in R1 equal to its
    # predecessor (the first of the pair may lie before R1 —
    # out_grouping_b within the p1 limit, then eq_v_b)
    if (
        len(word) >= 2
        and word[-1] == word[-2]
        and word[-1] not in _DA_V
        and len(word) - 1 >= r1
    ):
        word = word[:-1]
    return word


_NO_V = "aeiouyæåø"
_NO_S_END = "bcdfghjlmnoprtvyz"
_NO_STEP1 = sorted(
    ["a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
     "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
     "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
     "s", "erte", "ert"],
    key=len, reverse=True,
)
_NO_STEP3 = sorted(
    ["leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
     "slov", "hetslov"],
    key=len, reverse=True,
)


def norwegian_stem(word: str) -> str:
    word = word.lower()
    r1 = _scand_r1(word, _NO_V)

    # step 1: delete group, `s` with valid s-ending (or k not
    # preceded by a vowel), erte/ert -> er
    for suf in _NO_STEP1:
        if not word.endswith(suf):
            continue
        pos = len(word) - len(suf)
        if pos >= r1:
            if suf == "s":
                prev = word[pos - 1] if pos >= 1 else ""
                ok = prev in _NO_S_END or (
                    prev == "k"
                    and (pos < 2 or word[pos - 2] not in _NO_V)
                )
                if ok:
                    word = word[:pos]
            elif suf in ("erte", "ert"):
                word = word[:pos] + "er"
            else:
                word = word[:pos]
        break

    # step 2: dt / vt in R1 -> drop the final letter
    if len(word) >= 2 and word[-2:] in ("dt", "vt") and len(word) - 2 >= r1:
        word = word[:-1]

    # step 3
    for suf in _NO_STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
            break
    return word


_SV_V = "aeiouyäåö"
_SV_S_END = "bcdfghjklmnoprtvy"
_SV_STEP1 = sorted(
    ["a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
     "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
     "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es",
     "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
     "het", "ast", "s"],
    key=len, reverse=True,
)
_SV_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def swedish_stem(word: str) -> str:
    word = word.lower()
    r1 = _scand_r1(word, _SV_V)

    for suf in _SV_STEP1:
        if not word.endswith(suf):
            continue
        pos = len(word) - len(suf)
        if pos >= r1:
            if suf == "s":
                if pos >= 1 and word[pos - 1] in _SV_S_END:
                    word = word[:pos]
            else:
                word = word[:pos]
        break

    if len(word) >= 2 and word[-2:] in _SV_STEP2 and len(word) - 2 >= r1:
        word = word[:-1]

    # step 3: lig/ig/els delete; löst -> lös; fullt -> full
    for suf, act in sorted(
        [("lig", "del"), ("ig", "del"), ("els", "del"),
         ("löst", "t"), ("fullt", "t")],
        key=lambda x: len(x[0]), reverse=True,
    ):
        if not word.endswith(suf):
            continue
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] if act == "del" else word[:-1]
        break
    return word


# ===================================================================
# Portuguese (snowballstem.org/algorithms/portuguese/stemmer.html;
# reference surface StemmerTokenFilterFactory.java:244 `portuguese`
# -> SnowballFilter(PortugueseStemmer))
# ===================================================================

_PT_V = "aeiouáéíóúâêô"

_PT_STEP1 = [
    # (suffix, group) — nasal vowels already rewritten ã->a~, õ->o~
    ("amentos", "A"), ("imentos", "A"), ("uciones", "D"),
    ("amento", "A"), ("imento", "A"), ("adoras", "A"), ("adores", "A"),
    ("aço~es", "A"), ("logías", "C"), ("ências", "E"), ("amente", "F"),
    ("idades", "H"), ("ância", "A"), ("ismos", "A"), ("istas", "A"),
    ("adora", "A"), ("aça~o", "A"), ("antes", "A"), ("logía", "C"),
    ("ución", "D"), ("ência", "E"), ("mente", "G"), ("idade", "H"),
    ("ezas", "A"), ("icos", "A"), ("icas", "A"), ("ismo", "A"),
    ("ável", "A"), ("ível", "A"), ("ista", "A"), ("osos", "A"),
    ("osas", "A"), ("ador", "A"), ("ante", "A"), ("ivas", "I"),
    ("ivos", "I"), ("iras", "J"), ("eza", "A"), ("ico", "A"),
    ("ica", "A"), ("oso", "A"), ("osa", "A"), ("iva", "I"),
    ("ivo", "I"), ("ira", "J"),
]

_PT_STEP2 = sorted(
    ["ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
     "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
     "iste", "ei", "arei", "erei", "irei", "am", "iam", "ariam",
     "eriam", "iriam", "aram", "eram", "iram", "avam", "em", "arem",
     "erem", "irem", "assem", "essem", "issem", "ado", "ido", "ando",
     "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as",
     "adas", "idas", "ias", "arias", "erias", "irias", "arás", "aras",
     "erás", "eras", "irás", "avas", "es", "ardes", "erdes", "irdes",
     "ares", "eres", "ires", "asses", "esses", "isses", "astes",
     "estes", "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis",
     "iríeis", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
     "ásseis", "ésseis", "ísseis", "áveis", "ados", "idos", "ámos",
     "amos", "íamos", "aríamos", "eríamos", "iríamos", "áramos",
     "éramos", "íramos", "ávamos", "emos", "aremos", "eremos",
     "iremos", "ássemos", "êssemos", "íssemos", "imos", "armos",
     "ermos", "irmos", "eu", "iu", "ou", "ira", "iras"],
    key=len, reverse=True,
)


def portuguese_stem(word: str) -> str:
    """Snowball Portuguese.  The published classic table keeps the
    Spanish-orthography oddities ``logía``/``ución`` (noted on the
    algorithm page; they are practically unreachable in Portuguese
    text and later Snowball revisions dropped them)."""
    word = word.lower().replace("ã", "a~").replace("õ", "o~")
    n = len(word)
    # RV (same definition as Spanish)
    rv = n
    if n >= 2:
        if word[1] not in _PT_V:
            for i in range(2, n):
                if word[i] in _PT_V:
                    rv = i + 1
                    break
        elif word[0] in _PT_V:
            for i in range(2, n):
                if word[i] not in _PT_V:
                    rv = i + 1
                    break
        else:
            rv = 3 if n > 3 else n
    r1, r2 = _std_r1r2(word, _PT_V)

    original = word

    # ---- step 1: standard suffix removal (longest match)
    step1 = sorted(_PT_STEP1, key=lambda x: len(x[0]), reverse=True)
    for suf, grp in step1:
        if not word.endswith(suf):
            continue
        pos = len(word) - len(suf)
        if grp == "A":
            if pos >= r2:
                word = word[:pos]
        elif grp == "C":
            if pos >= r2:
                word = word[:pos] + "log"
        elif grp == "D":
            if pos >= r2:
                word = word[:pos] + "u"
        elif grp == "E":
            if pos >= r2:
                word = word[:pos] + "ente"
        elif grp == "F":  # amente
            if pos >= r1:
                word = word[:pos]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif grp == "G":  # mente
            if pos >= r2:
                word = word[:pos]
                for pre in ("ante", "avel", "ível"):
                    if word.endswith(pre) and len(word) - 4 >= r2:
                        word = word[:-4]
                        break
        elif grp == "H":  # idade(s)
            if pos >= r2:
                word = word[:pos]
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
        elif grp == "I":  # iva/ivo(s)
            if pos >= r2:
                word = word[:pos]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif grp == "J":  # ira(s) -> ir when preceded by e, in RV
            if pos >= rv and pos >= 1 and word[pos - 1] == "e":
                word = word[:pos] + "ir"
        break

    step1_changed = word != original

    # ---- step 2: verb suffixes (only if step 1 removed nothing)
    step2_changed = False
    if not step1_changed:
        for suf in _PT_STEP2:
            if word.endswith(suf):
                if len(word) - len(suf) >= rv:
                    word = word[: -len(suf)]
                    step2_changed = True
                break

    # ---- step 3 / step 4
    if step1_changed or step2_changed:
        # final i preceded by c, the i in RV
        if (
            word.endswith("i")
            and len(word) >= 2
            and word[-2] == "c"
            and len(word) - 1 >= rv
        ):
            word = word[:-1]
    else:
        # residual suffix
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if word.endswith(suf):
                if len(word) - len(suf) >= rv:
                    word = word[: -len(suf)]
                break

    # ---- step 5: residual form
    ended_e = False
    for suf in ("e", "é", "ê"):
        if word.endswith(suf):
            if len(word) - 1 >= rv:
                word = word[:-1]
                ended_e = True
                # gu/ci: drop the u/i when it is in RV
                if (
                    word.endswith("gu")
                    and len(word) - 1 >= rv
                ) or (
                    word.endswith("ci")
                    and len(word) - 1 >= rv
                ):
                    word = word[:-1]
            break
    if not ended_e and word.endswith("ç"):
        word = word[:-1] + "c"

    return word.replace("a~", "ã").replace("o~", "õ")


# ===================================================================
# Romanian (snowballstem.org/algorithms/romanian/stemmer.html)
# ===================================================================
# Reference parity: StemmerTokenFilterFactory.java "romanian" ->
# Lucene SnowballFilter(RomanianStemmer).  The spec (and the Lucene
# generated stemmer) uses the cedilla forms s-cedilla/t-cedilla
# (U+015F/U+0163); modern comma-below orthography (U+0219/U+021B) is
# normalized to cedilla on entry.

_RO_V = "aăâeiîou"
_RO_MODERN = str.maketrans("șț", "şţ")

# step 0: plural removal (suffix -> replacement), longest match in R1
_RO_STEP0 = sorted(
    [("ul", ""), ("ului", ""),
     ("aua", "a"),
     ("ea", "e"), ("ele", "e"), ("elor", "e"),
     ("ii", "i"), ("iua", "i"), ("iei", "i"), ("iile", "i"),
     ("iilor", "i"), ("ilor", "i"),
     ("ile", "i"),          # unless preceded by ab (checked inline)
     ("atei", "at"),
     ("aţie", "aţi"), ("aţia", "aţi")],
    key=lambda t: -len(t[0]),
)

# step 1: combining suffixes (repeat until none applies), in R1
_RO_STEP1 = sorted(
    [("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
     ("abilităţi", "abil"),
     ("ibilitate", "ibil"),
     ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
     ("ivităţi", "iv"),
     ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
     ("icităţi", "ic"), ("icator", "ic"), ("icatori", "ic"),
     ("iciv", "ic"), ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"),
     ("icivă", "ic"),
     ("ical", "ic"), ("icala", "ic"), ("icale", "ic"), ("icali", "ic"),
     ("icală", "ic"),
     ("ativ", "at"), ("ativa", "at"), ("ative", "at"), ("ativi", "at"),
     ("ativă", "at"), ("aţiune", "at"), ("atoare", "at"), ("ator", "at"),
     ("atori", "at"), ("ătoare", "at"), ("ător", "at"), ("ători", "at"),
     ("itiv", "it"), ("itiva", "it"), ("itive", "it"), ("itivi", "it"),
     ("itivă", "it"), ("iţiune", "it"), ("itoare", "it"), ("itor", "it"),
     ("itori", "it")],
    key=lambda t: -len(t[0]),
)

# step 2: standard suffixes, in R2
_RO_STEP2_DEL = sorted(
    ["at", "ata", "ată", "ati", "ate",
     "ut", "uta", "ută", "uti", "ute",
     "it", "ita", "ită", "iti", "ite",
     "ic", "ica", "ice", "ici", "ică",
     "abil", "abila", "abile", "abili", "abilă",
     "ibil", "ibila", "ibile", "ibili", "ibilă",
     "oasa", "oasă", "oase", "os", "osi", "oşi",
     "ant", "anta", "ante", "anti", "antă",
     "ator", "atori",
     "itate", "itati", "ităi", "ităţi",
     "iv", "iva", "ive", "ivi", "ivă"],
    key=len, reverse=True,
)
_RO_STEP2_IST = sorted(
    ["ism", "isme", "ist", "ista", "iste", "isti", "istă", "işti"],
    key=len, reverse=True,
)

# step 3: verb suffixes, in RV.  group 1 deletes only when preceded
# (inside RV) by a consonant or by u; group 2 deletes unconditionally.
_RO_VERB_G1 = [
    "are", "ere", "ire", "âre",
    "ind", "ând", "indu", "ându",
    "eze", "ează", "ez", "ezi",
    "ească", "eşti", "eşte", "ăşti", "ăşte", "esc", "ăsc",
    "am", "ai", "au",
    "eam", "eai", "ea", "eaţi", "eau",
    "iam", "iai", "ia", "iaţi", "iau",
    "ui", "aşi", "arăm", "arăţi", "ară",
    "uşi", "urăm", "urăţi", "ură",
    "işi", "irăm", "irăţi", "iră",
    "âi", "âşi", "ârăm", "ârăţi", "âră",
    "asem", "aseşi", "ase", "aserăm", "aserăţi", "aseră",
    "isem", "iseşi", "ise", "iserăm", "iserăţi", "iseră",
    "âsem", "âseşi", "âse", "âserăm", "âserăţi", "âseră",
    "usem", "useşi", "use", "userăm", "userăţi", "useră",
]
_RO_VERB_G2 = [
    "ăm", "aţi", "em", "eţi", "im", "iţi", "âm", "âţi",
    "seşi", "serăm", "serăţi", "seră", "sei", "se",
    "sesem", "seseşi", "sese", "seserăm", "seserăţi", "seseră",
]
_RO_VERB = sorted(
    [(s, 1) for s in _RO_VERB_G1] + [(s, 2) for s in _RO_VERB_G2],
    key=lambda t: -len(t[0]),
)


def romanian_stem(word: str) -> str:
    word = word.lower().translate(_RO_MODERN)
    # prelude: i/u between vowels are marked as consonants
    ch = list(word)
    for i in range(1, len(ch) - 1):
        if ch[i] in "iu" and ch[i - 1] in _RO_V and ch[i + 1] in _RO_V:
            ch[i] = ch[i].upper()
    word = "".join(ch)
    r1, r2 = _std_r1r2(word, _RO_V)
    rv = _romance_rv(word, _RO_V)

    # ---- step 0: plurals
    for suf, rep in _RO_STEP0:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            if suf == "ile" and word.endswith("abile"):
                continue  # "unless preceded by ab"
            word = word[: -len(suf)] + rep
            break

    # ---- step 1: combining suffixes, repeated
    removed_12 = False
    changed = True
    while changed:
        changed = False
        for suf, rep in _RO_STEP1:
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
                removed_12 = True
                changed = True
                break

    # ---- step 2: standard suffixes in R2 (single longest match
    # across all three suffix families)
    best = None  # (suffix, action)
    for suf in _RO_STEP2_DEL:
        if word.endswith(suf) and len(word) - len(suf) >= r2:
            best = (suf, "del")
            break
    for fam, act in ((("iune", "iuni"), "tiune"), (_RO_STEP2_IST, "ist")):
        for suf in fam:
            if (word.endswith(suf) and len(word) - len(suf) >= r2
                    and (best is None or len(suf) > len(best[0]))):
                best = (suf, act)
                break
    if best is not None:
        suf, act = best
        if act == "del":
            word = word[: -len(suf)]
            removed_12 = True
        elif act == "tiune":
            # delete iune/iuni when preceded by ţ, which becomes t
            if word[: -len(suf)].endswith("ţ"):
                word = word[: -len(suf) - 1] + "t"
                removed_12 = True
        else:  # ism family -> ist
            word = word[: -len(suf)] + "ist"
            removed_12 = True

    # ---- step 3: verb suffixes (only when steps 1-2 removed nothing)
    if not removed_12:
        for suf, grp in _RO_VERB:
            if not word.endswith(suf):
                continue
            start = len(word) - len(suf)
            if start < rv:
                continue
            if grp == 1:
                # preceding char must exist inside RV and be a
                # consonant or u (the setlimit-to-RV among condition)
                if start - 1 < rv:
                    continue
                prev = word[start - 1]
                if prev in _RO_V and prev != "u":
                    continue
            word = word[:start]
            break

    # ---- step 4: final vowel
    for suf in ("ie", "a", "e", "i", "ă"):
        if word.endswith(suf) and len(word) - len(suf) >= rv:
            word = word[: -len(suf)]
            break

    return word.replace("I", "i").replace("U", "u")


# --------------------------------------------------------------------------
# Finnish (snowballstem.org/algorithms/finnish/stemmer.html).  Reference
# registers it as stemmer language `finnish` and through the `snowball`
# filter's capitalized name table (StemmerTokenFilterFactory.java:167-168,
# FinnishAnalyzerProvider.java).  Implemented from the published algorithm
# description; every pin in tests/test_snowball.py was hand-traced through
# the steps below (regions, longest-suffix commit, condition lookbehinds).

_FI_V1 = "aeiouyäö"          # vowels incl. y
_FI_V2 = "aeiouäö"           # vowels minus y (the Vi context)
_FI_AEI = "aäei"
_FI_C = "bcdfghjklmnpqrstvwxz"
_FI_PARTICLE_END = _FI_V1 + "nt"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_FI_PARTICLES = ("kin", "kaan", "kään", "ko", "kö",
                 "han", "hän", "pa", "pä", "sti")
_FI_POSS = ("si", "ni", "nsa", "nsä", "mme", "nne", "an", "än", "en")
_FI_CASE = ("han", "hen", "hin", "hon", "hän", "hön",
            "siin", "den", "tten", "seen",
            "a", "ä", "tta", "ttä",
            "ta", "tä", "ssa", "ssä", "sta", "stä",
            "lla", "llä", "lta", "ltä", "lle",
            "na", "nä", "ksi", "ine", "n")
_FI_OTHER = ("mpi", "mpa", "mpä", "mmi", "mma", "mmä",
             "impi", "impa", "impä", "immi", "imma", "immä",
             "eja", "ejä")


def _fi_after_vc(word: str, start: int) -> int:
    """Position after the first non-vowel that follows a vowel, from
    ``start`` (the standard snowball R1/R2 mark)."""
    n = len(word)
    i = start
    while i < n and word[i] not in _FI_V1:
        i += 1
    while i < n and word[i] in _FI_V1:
        i += 1
    return i + 1 if i < n else n


def _fi_longest(word: str, limit: int, sufs) -> str:
    """Longest suffix from ``sufs`` that matches entirely at positions
    >= limit (snowball `setlimit tomark p for ([substring])`: a longer
    suffix crossing the limit cannot match, a shorter in-region one
    can).  Returns None when nothing fits."""
    best = None
    for s in sufs:
        if word.endswith(s) and len(word) - len(s) >= limit:
            if best is None or len(s) > len(best):
                best = s
    return best


def finnish_stem(word: str) -> str:
    """Snowball Finnish.  Step conditions (`particle_end`, the Vi/LONG
    lookbehinds, possessive attachment sets, not-'po') inspect the text
    to the LEFT of the matched suffix without the region limit — the
    among branches run after the `setlimit ... for([substring])` clause
    closes — while tidy rules (a)-(d) sit entirely inside a p1 setlimit
    and the final consonant undouble is unlimited."""
    word = word.lower()
    p1 = _fi_after_vc(word, 0)
    p2 = _fi_after_vc(word, p1)
    ending_removed = False

    # ---- step 1: particles (kin/kaan/ko/han/pa after a particle_end
    # letter; sti in R2)
    suf = _fi_longest(word, p1, _FI_PARTICLES)
    if suf:
        pos = len(word) - len(suf)
        if suf == "sti":
            if pos >= p2:
                word = word[:pos]
        elif pos >= 1 and word[pos - 1] in _FI_PARTICLE_END:
            word = word[:pos]

    # ---- step 2: possessives
    suf = _fi_longest(word, p1, _FI_POSS)
    if suf:
        pre = word[: len(word) - len(suf)]
        if suf == "si":
            if not pre.endswith("k"):
                word = pre
        elif suf == "ni":
            word = pre
            if word.endswith("kse"):
                word = word[:-3] + "ksi"
        elif suf in ("nsa", "nsä", "mme", "nne"):
            word = pre
        elif suf == "an":
            if pre.endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                word = pre
        elif suf == "än":
            if pre.endswith(("tä", "ssä", "stä",
                             "llä", "ltä", "nä")):
                word = pre
        elif suf == "en":
            if pre.endswith(("lle", "ine")):
                word = pre

    # ---- step 3: case endings
    suf = _fi_longest(word, p1, _FI_CASE)
    if suf:
        pre = word[: len(word) - len(suf)]
        delete = False
        if suf in ("han", "hen", "hin", "hon", "hän", "hön"):
            # hXn only after its harmony vowel X
            delete = pre.endswith(suf[1])
        elif suf in ("siin", "den", "tten"):
            # Vi: i preceded by a V2 vowel
            delete = (len(pre) >= 2 and pre[-1] == "i"
                      and pre[-2] in _FI_V2)
        elif suf == "seen":
            delete = pre[-2:] in _FI_LONG
        elif suf in ("a", "ä"):
            # cv: consonant + vowel before the final a/ä
            delete = (len(pre) >= 2 and pre[-1] in _FI_V1
                      and pre[-2] in _FI_C)
        elif suf in ("tta", "ttä"):
            delete = pre.endswith("e")
        elif suf == "n":
            delete = True
            if pre[-2:] in _FI_LONG or pre.endswith("ie"):
                pre = pre[:-1]       # n after a long vowel / ie drags one vowel
        else:
            delete = True
        if delete:
            word = pre
            ending_removed = True

    # ---- step 4: comparatives / other endings, in R2
    suf = _fi_longest(word, p2, _FI_OTHER)
    if suf:
        pos = len(word) - len(suf)
        if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
            if not word[:pos].endswith("po"):
                word = word[:pos]
        else:
            word = word[:pos]

    # ---- step 5: plurals.  i/j only when step 3 removed an ending;
    # otherwise t after a vowel (both inside R1), cascading into an
    # R2 (i)mma removal
    if ending_removed:
        if word and word[-1] in "ij" and len(word) - 1 >= p1:
            word = word[:-1]
    elif (word.endswith("t") and len(word) >= 2
          and word[-2] in _FI_V1 and len(word) - 2 >= p1):
        word = word[:-1]
        suf = _fi_longest(word, p2, ("imma", "mma"))
        if suf == "imma":
            word = word[:-4]
        elif suf == "mma" and not word[:-3].endswith("po"):
            word = word[:-3]

    # ---- step 6: tidy.  (a)-(d) fully inside R1; (e) unlimited.
    if len(word) >= 2 and word[-2:] in _FI_LONG and len(word) - 2 >= p1:
        word = word[:-1]                       # (a) undouble final long vowel
    if (word and word[-1] in _FI_AEI and len(word) >= 2
            and word[-2] in _FI_C and len(word) - 2 >= p1):
        word = word[:-1]                       # (b) a/ä/e/i after a consonant
    if word.endswith(("oj", "uj")) and len(word) - 2 >= p1:
        word = word[:-1]                       # (c) j after o/u
    if word.endswith("jo") and len(word) - 2 >= p1:
        word = word[:-1]                       # (d) o after j
    # (e) undouble the last consonant pair, skipping trailing vowels
    i = len(word)
    while i > 0 and word[i - 1] in _FI_V1:
        i -= 1
    if i >= 2 and word[i - 1] in _FI_C and word[i - 2] == word[i - 1]:
        word = word[: i - 1] + word[i:]
    return word
