"""Snowball stemmer + multilingual analysis chain pins (r4).

Expected stems are hand-traced step-by-step against the PUBLISHED
Snowball algorithm descriptions (snowballstem.org) — the environment
has no reference stemmer binary, so every pin below was derived by
walking the algorithm text (regions R1/R2/RV, longest-suffix match,
per-group conditions) for that word.  Reference surface:
StemmerTokenFilterFactory.java:176,190,257,263 (french/german/
spanish/russian -> Lucene SnowballFilter)."""

import pytest

from opensearch_spark.analysis.chain import Analyzer, make_token_filter
from opensearch_spark.analysis.snowball import (
    french_stem,
    german_stem,
    russian_stem,
    spanish_stem,
)

FR = {
    # step 1 standard suffixes
    "majestueux": "majestu",          # eux in R2
    "majestueusement": "majestu",     # ement in RV -> eus in R2
    "logiquement": "logiqu",          # ement; iqU kept (not in R2)
    "possibilité": "possibil",        # ité in R2
    "nationale": "national",          # step-4 e (unaltered by 1/2)
    "grandement": "grand",            # ement in RV
    "activement": "activ",           # ement -> iv not in R2? traced: activ
    "éléments": "élément",            # ments: preceding vowel not in RV
    "importantes": "import",          # 2b antes (+ no e chain)
    "chantée": "chant",               # 2b ée
    "chanter": "chant",               # 2b er
    "mangeaient": "mang",             # 2b aIent then e-chain
    "continuait": "continu",          # 2b ait
    "finissent": "fin",               # 2a issent after non-vowel in RV
    "finissait": "fin",               # 2a issait
    "abandonnaient": "abandon",       # 2b aIent + step-5 undouble onn
    "conditionnel": "conditionnel",   # nothing applies (nel != ell)
    "agir": "agir",                   # ir not in RV (rv=3)
    "théologie": "théolog",           # logie -> log in R2
    "confusion": "confus",            # usion fails R2; step-4 ion after s in R2
    "eaux": "eau",                    # eaux -> eau unconditionally
    "chevaux": "cheval",              # aux -> al in R1
}

DE = {
    "aufgabe": "aufgab",              # step-1 e in R1
    "kategorien": "kategori",         # step-1 en
    "möglichkeiten": "moglich",       # en, then keit in R2; umlaut folded
    "bedeutung": "bedeut",            # ung in R2
    "bedeutungen": "bedeut",          # en then ung
    "schönheit": "schonheit",         # heit NOT in R2 (r2=9)
    "freundliches": "freundlich",     # es; lich not in R2
    "arbeiten": "arbeit",             # en
    "arbeitete": "arbeitet",          # e (step 1), then nothing
    "kindern": "kind",                # ern
    "häuser": "haus",                 # er + umlaut fold
    "größte": "grosst",               # ß->ss, e; st kept (s not st-ending)
    "wissenschaftlich": "wissenschaft",  # lich in R2
    "fäulnisse": "fäulnis".translate(str.maketrans("äöü", "aou")),  # niss fixup
}

ES = {
    "cantando": "cant",               # 2b ando in RV
    "canciones": "cancion",           # 2b es in RV (gu-chain not hit)
    "importantes": "import",          # step-1 antes (group B) in R2
    "rápidamente": "rapid",           # amente in R1
    "nacionalidad": "nacional",       # idad in R2
    "comiendo": "com",                # 2b iendo
    "trabajadores": "trabaj",         # adores in R2
    "felicidad": "felic",             # idad in R2
    "libros": "libr",                 # step-3 os in RV
    "organización": "organiz",        # ación in R2
    "lógica": "logic",                # step-1 ica in R2? traced: r2=5,pos=3 -> no; step-3 a; unaccent
}

RU = {
    "книга": "книг",                  # noun а
    "книги": "книг",                  # noun и
    "книгами": "книг",                # noun ами
    "красивый": "красив",             # adjective ый
    "красивая": "красив",             # adjective ая
    "бегала": "бега",                 # verb ла after а
    "бегавший": "бега",               # adjective ий then participle вш (after а)
    "важность": "важност",            # noun ь
    "важностью": "важност",           # noun ью
    "предложение": "предложен",       # noun ие
    "делать": "дела",                 # verb ть after а
    "сильнейший": "сильн",            # adj ий then step-4 superlative ейш
}


@pytest.mark.parametrize("word,stem", sorted(FR.items()))
def test_french(word, stem):
    assert french_stem(word) == stem


@pytest.mark.parametrize("word,stem", sorted(DE.items()))
def test_german(word, stem):
    assert german_stem(word) == stem


@pytest.mark.parametrize("word,stem", sorted(ES.items()))
def test_spanish(word, stem):
    assert spanish_stem(word) == stem


@pytest.mark.parametrize("word,stem", sorted(RU.items()))
def test_russian(word, stem):
    assert russian_stem(word) == stem


def test_stemmers_idempotent_on_short_words():
    for fn in (french_stem, german_stem, spanish_stem, russian_stem):
        assert fn("") == ""
        assert fn("a") in ("a", "а")
    assert russian_stem("а") == "а"


def test_stemmer_filter_languages():
    for lang, word, stem in [
        ("french", "chanter", "chant"),
        ("german", "kindern", "kind"),
        ("german2", "kindern", "kind"),
        ("spanish", "libros", "libr"),
        ("russian", "книги", "книг"),
    ]:
        f = make_token_filter({"type": "stemmer", "language": lang})
        assert f(([word], [0])) == ([stem], [0])
    with pytest.raises(ValueError, match="not implemented"):
        make_token_filter({"type": "stemmer", "language": "klingon"})


def test_snowball_filter_alias():
    # SnowballTokenFilterFactory.java: capitalized names, English default
    f = make_token_filter({"type": "snowball", "language": "French"})
    assert f((["chanter"], [0])) == (["chant"], [0])
    f = make_token_filter({"type": "snowball"})
    assert f((["running"], [0])) == (["run"], [0])


# --------------------------------------------------------------- chain zoo


def test_elision_filter():
    f = make_token_filter({"type": "elision"})
    toks, pos = f((["l'élément", "d'abord", "qu'il", "jusqu'ici", "la"],
                   [0, 1, 2, 3, 4]))
    assert toks == ["élément", "abord", "il", "ici", "la"]
    assert pos == [0, 1, 2, 3, 4]
    # custom article set
    f = make_token_filter({"type": "elision", "articles": ["x"]})
    assert f((["x'y", "l'a"], [0, 1]))[0] == ["y", "l'a"]


def test_cjk_width_filter():
    f = make_token_filter("cjk_width")
    assert f((["Ｔｅｓｔ１２３"], [0]))[0] == ["Test123"]
    assert f((["ﾃｽﾄ"], [0]))[0] == ["テスト"]
    # halfwidth voiced mark composes: ﾊﾞｲﾄ -> バイト
    assert f((["ﾊﾞｲﾄ"], [0]))[0] == ["バイト"]
    assert f((["plain"], [0]))[0] == ["plain"]


def test_cjk_bigram_default():
    f = make_token_filter({"type": "cjk_bigram"})
    # han single-char tokens at consecutive positions -> bigrams
    toks, pos = f((["学", "生", "test"], [0, 1, 2]))
    assert toks == ["学生", "test"]
    assert pos == [0, 1]
    # a lone han char stays a unigram
    assert f((["学", "test"], [0, 1]))[0] == ["学", "test"]
    # katakana runs are bigrammed within the run
    assert f((["テスト"], [0]))[0] == ["テス", "スト"]
    # a position gap (e.g. removed stopword) breaks adjacency
    assert f((["学", "生"], [0, 2]))[0] == ["学", "生"]


def test_cjk_bigram_options():
    uni = make_token_filter({"type": "cjk_bigram", "output_unigrams": True})
    toks, pos = uni((["学", "生"], [0, 1]))
    assert toks == ["学", "学生", "生"]
    assert pos == [0, 0, 1]  # bigram shares its first char's position
    ign = make_token_filter(
        {"type": "cjk_bigram", "ignored_scripts": ["katakana"]}
    )
    assert ign((["テスト", "学", "生"], [0, 1, 2]))[0] == ["テスト", "学生"]


def test_asciifolding_non_decomposables():
    f = make_token_filter("asciifolding")
    toks, _ = f((["straße", "œuvre", "høj", "łódź", "þorn", "ﬁn"],
                 [0, 1, 2, 3, 4, 5]))
    assert toks == ["strasse", "oeuvre", "hoj", "lodz", "thorn", "fin"]


def test_named_language_analyzers():
    fr = Analyzer.from_spec("french")
    assert fr("L'élément de la possibilité nationale") == (
        ["élément", "possibil", "national"], [0, 3, 4]
    )
    de = Analyzer.from_spec("german")
    assert de("Die Möglichkeiten der Bedeutungen") == (
        ["moglich", "bedeut"], [1, 3]
    )
    es = Analyzer.from_spec("spanish")
    assert es("las canciones importantes") == (["cancion", "import"], [1, 2])
    ru = Analyzer.from_spec("russian")
    assert ru("красивая книга и предложения") == (
        ["красив", "книг", "предложен"], [0, 1, 3]
    )
    cjk = Analyzer.from_spec("cjk")
    toks, _ = cjk("多くの学生 test")
    assert toks == ["多く", "くの", "の学", "学生", "test"]


# ---------------------------------------------------- italian / dutch (r4 late)

IT = {
    # step 2 verb suffixes in RV
    "abbandonata": "abbandon",        # ata
    "abbandoneranno": "abbandon",     # eranno
    "pronunciare": "pronunc",         # are, then step-3a i
    "mangiare": "mang",               # are + step-3a i
    # step 0 attached pronouns
    "mangiarlo": "mang",              # lo after ar -> +e -> are chain
    "mangiandolo": "mang",            # lo after ando (deletion case)
    # step 1 standard suffixes
    "città": "citt",                  # ità fails R2; step-3a à
    "felicità": "felic",              # ità in R2; ic NOT further removed (R2)
    "generazione": "gener",           # azione in R2
    "comunicazione": "comun",         # azione + preceding ic in R2
    "teologia": "teolog",             # step-3a a then i (logia fails R2)
    "esecuzione": "esecu",            # uzione -> u
    "differenza": "different",        # enza -> ente, then step-3a e
    "cambiamento": "camb",            # amento in RV + step-3a i
    # prelim marking: u after q is a non-vowel
    "quotidiano": "quotid",           # ano + step-3a i; qU mark
}

NL = {
    "lichamelijk": "licham",          # lijk in R2 + repeated step 2 e
    "lichamelijkheden": "licham",     # heden->heid, heid del, lijk, e
    "boeken": "boek",                 # en after valid ending
    "bakken": "bak",                  # en + undouble kk
    "vogels": "vogel",                # s after valid s-ending
    "huizen": "huiz",                 # en
    "gemeen": "gemen",                # en blocked (vowel before); step-4 ee
    "spelen": "spel",                 # en
    "opening": "open",                # ing in R2
    "volledig": "volled",             # ig in R2 not after e
    "openbaar": "open",               # baar in R2
    "zichtbare": "zichtbar",          # step-2 e; bar needs R2 (fails)
    "royaal": "royal",                # Y mark + step-4 aa undouble
    "draaien": "draai",               # I mark protects step-4 (D == I)
}


def test_italian_stemmer():
    from opensearch_spark.analysis.snowball import italian_stem

    for w, s in IT.items():
        assert italian_stem(w) == s, (w, italian_stem(w), s)


def test_dutch_stemmer():
    from opensearch_spark.analysis.snowball import dutch_stem

    for w, s in NL.items():
        assert dutch_stem(w) == s, (w, dutch_stem(w), s)


def test_named_italian_dutch_analyzers():
    it = Analyzer.from_spec("italian")
    # elision strips l'; stopwords drop della; stems survive
    assert it("l'abbandonata della città") == (
        ["abbandon", "citt"], [0, 2]
    )
    nl = Analyzer.from_spec("dutch")
    assert nl("de boeken van het huis") == (["boek", "huis"], [1, 4])
    # stemmer filter direct (StemmerTokenFilterFactory language table)
    f_it = make_token_filter({"type": "stemmer", "language": "italian"})
    assert f_it((["generazione"], [0]))[0] == ["gener"]
    f_nl = make_token_filter({"type": "stemmer", "language": "dutch"})
    assert f_nl((["bakken"], [0]))[0] == ["bak"]


def test_elision_custom_articles_case_sensitive():
    """Analysis.parseArticles: articles_case defaults FALSE for custom
    article sets (case-sensitive); the built-in default set stays
    case-insensitive (FrenchAnalyzer.DEFAULT_ARTICLES ignoreCase)."""
    f = make_token_filter({"type": "elision", "articles": ["x"]})
    assert f((["X'y", "x'y"], [0, 1]))[0] == ["X'y", "y"]
    f = make_token_filter(
        {"type": "elision", "articles": ["x"], "articles_case": True}
    )
    assert f((["X'y", "x'y"], [0, 1]))[0] == ["y", "y"]
    # default set: case-insensitive
    f = make_token_filter({"type": "elision"})
    assert f((["L'avion"], [0]))[0] == ["avion"]


def test_resolve_stopwords_literal_and_mixed():
    """Analysis.resolveNamedWords parity: an unrecognized _name_ is a
    LITERAL word (never split into characters); lists mix named sets
    and literal words element-wise."""
    from opensearch_spark.analysis.analyzer import (
        ENGLISH_STOP_WORDS,
        resolve_stopwords,
    )

    sw = resolve_stopwords("_klingon_")
    assert sw == frozenset({"_klingon_"})  # NOT characters
    mixed = resolve_stopwords(["_english_", "foo"])
    assert "foo" in mixed and ENGLISH_STOP_WORDS <= mixed
    assert resolve_stopwords("_none_") == frozenset()
    assert resolve_stopwords(None) is None


# ------------------------------ r4 late: da / no / sv / pt stemmers

from opensearch_spark.analysis.snowball import (  # noqa: E402
    danish_stem,
    norwegian_stem,
    portuguese_stem,
    swedish_stem,
)

DA = {
    "friskhed": "frisk",          # step 1 'hed' in R1
    "bestemmelse": "bestem",      # e -> els -> undouble mm
    "sikkerhed": "sikker",
    "undervisning": "undervisning",  # no suffix matches
    "kvindens": "kvind",          # step 1 'ens'
    "hans": "han",                # bare s after valid s-ending n
    "løst": "løst",               # suffix before R1 (min-3 rule)
    "venligst": "ven",            # igst -> ig-family 'lig'
}

NO = {
    "mulighetene": "mulig",       # 'hetene'; step-3 'lig' NOT in R1
    "billigere": "billiger",      # only 'e' in the table
    "flertallet": "flertall",     # 'et'
    "servert": "server",          # 'ert' -> 'er'
    "bilens": "bil",              # 'ens'
    "fisks": "fisk",              # s after k NOT preceded by a vowel
    "boks": "boks",               # s after k preceded by a vowel: kept
    "blandt": "bland",            # step 2 'dt' drops the final letter
}

SV = {
    "jackorna": "jack",           # the spec page's own example
    "starkast": "stark",
    "upplöst": "upplös",          # step 3 löst -> lös
    "flickans": "flickan",        # bare s after valid s-ending
    "inledningen": "inledning",
    "kraftfullt": "kraftfull",    # step 3 fullt -> full
    "bakelse": "bak",             # e then els
}

PT = {
    "livros": "livr",             # residual 'os' in RV
    "cantar": "cant",             # verb 'ar'
    "meninas": "menin",           # verb 'as'
    "amoroso": "amor",            # 'oso' in R2
    "felizmente": "feliz",        # 'mente' in R2
    "nacionalização": "nacionaliz",  # nasal rewrite + 'aça~o' in R2
    "felicidade": "felic",        # 'idade' in R2; 'ic' NOT in R2
    "grande": "grand",            # step 5 final e in RV
    "bonita": "bonit",            # residual 'a'
    "lógica": "lógic",            # 'ica' matched but not in R2 -> residual
    "falaram": "fal",             # verb 'aram'
    "comendo": "com",             # verb 'endo'
    "chegue": "cheg",             # step 5 e then gu -> g
}


@pytest.mark.parametrize("word,stem", sorted(DA.items()))
def test_danish(word, stem):
    assert danish_stem(word) == stem


@pytest.mark.parametrize("word,stem", sorted(NO.items()))
def test_norwegian(word, stem):
    assert norwegian_stem(word) == stem


@pytest.mark.parametrize("word,stem", sorted(SV.items()))
def test_swedish(word, stem):
    assert swedish_stem(word) == stem


@pytest.mark.parametrize("word,stem", sorted(PT.items()))
def test_portuguese(word, stem):
    assert portuguese_stem(word) == stem


def test_new_stemmer_filter_languages():
    for lang, word, stem in [
        ("danish", "friskhed", "frisk"),
        ("norwegian", "bilens", "bil"),
        ("swedish", "jackorna", "jack"),
        ("portuguese", "livros", "livr"),
    ]:
        f = make_token_filter({"type": "stemmer", "language": lang})
        assert f(([word], [0])) == ([stem], [0])


def test_named_scandinavian_portuguese_analyzers():
    from opensearch_spark.analysis.chain import Analyzer

    # danish: stopword dropped (position gap kept), stem applied
    assert Analyzer.from_spec("danish")("Friskhed og sikkerhed") == (
        ["frisk", "sikker"], [0, 2]
    )
    assert Analyzer.from_spec("swedish")("jackorna och starkast") == (
        ["jack", "stark"], [0, 2]
    )
    assert Analyzer.from_spec("norwegian")("mulighetene og bilens") == (
        ["mulig", "bil"], [0, 2]
    )
    assert Analyzer.from_spec("portuguese")("os livros de meninas") == (
        ["livr", "menin"], [1, 3]
    )


RO = {
    # step 2: itate in R2 after step-1 no-op
    "abilitate": "abil",
    # step 1 ivitate -> iv (combining), nothing further in R2
    "activitate": "activ",
    # step 0 plural "ile" -> i, then step-4 final i
    "lucrurile": "lucrur",
    # step 0 "ii" -> i, then group-2 verb "eţi" (prelude-marked I kept)
    "băieţii": "băi",
    # group-1 verb suffixes after consonant in RV
    "acţionase": "acţion",   # ase
    "cântând": "cânt",       # ând
    "lucrează": "lucr",      # ează
    "românesc": "român",     # esc
    "copilăria": "copilăr",  # ia
    # step-4 final vowel only
    "frumoasă": "frumoas",
    "merge": "merg",
    "ţări": "ţăr",
    "țări": "ţăr",           # comma-below normalized to cedilla
    # step 2 antă in R2
    "importantă": "import",
    # no rule fires ("al" is not a Romanian suffix)
    "naţional": "naţional",
    # iune NOT in R2 -> only the final e drops
    "naţiune": "naţiun",
    # prelude I marking keeps the doubled i intact; bare plural loses it
    "copiii": "copii",
    "copii": "cop",
}


def test_romanian_vectors():
    from opensearch_spark.analysis.snowball import romanian_stem

    for word, stem in RO.items():
        assert romanian_stem(word) == stem, word


def test_romanian_chain_registration():
    f = make_token_filter({"type": "stemmer", "language": "romanian"})
    toks, pos = f((["lucrurile", "frumoasă"], [0, 1]))
    assert toks == ["lucrur", "frumoas"] and pos == [0, 1]


def test_english_minimal_plural_possessive():
    """Lucene light/minimal English family
    (StemmerTokenFilterFactory.java:146-162;
    EnglishPluralStemFilter.java:105-158 incl. the oes/ches exception
    lists and the tail-compare quirk where a word that is a suffix of
    an exception rule also matches)."""
    from opensearch_spark.analysis.chain import (
        english_minimal_stem,
        english_plural_stem,
        english_possessive,
    )

    # minimal (S-stemmer): -s unless short / -ss / -us
    for w, e in [("dogs", "dog"), ("gas", "ga"), ("class", "class"),
                 ("virus", "virus"), ("as", "as"), ("bees", "bee")]:
        assert english_minimal_stem(w) == e, w
    # plural: the doc examples from the reference javadoc
    for w, e in [("boxes", "box"), ("dresses", "dress"),
                 ("dishes", "dish"), ("watches", "watch"),
                 ("bees", "bee"), ("spies", "spy"), ("pies", "pie"),
                 ("ties", "tie"), ("tomatoes", "tomato"),
                 ("shoes", "shoe"), ("canoes", "canoe"),
                 ("caches", "cache"), ("avalanches", "avalanche"),
                 ("axes", "axe"), ("dogs", "dog"), ("class", "class"),
                 ("hoes", "hoe")]:  # suffix of "shoes" -> exception
        assert english_plural_stem(w) == e, w
    for w, e in [("john's", "john"), ("JAMES'S", "JAMES"),
                 ("it’s", "it"), ("its", "its")]:
        assert english_possessive(w) == e, w


def test_french_minimal():
    from opensearch_spark.analysis.chain import french_minimal_stem

    for w, e in [("chevaux", "cheval"), ("châteaux", "château"),
                 ("hommes", "hom"), ("chanter", "chant"),
                 ("baisse", "bais"), ("petit", "petit"),
                 ("été", "été")]:  # < 6 chars untouched
        assert french_minimal_stem(w) == e, w


def test_light_family_chain_registration():
    for lang, word, stem in [("minimal_english", "dogs", "dog"),
                             ("plural_english", "watches", "watch"),
                             ("possessive_english", "john's", "john"),
                             ("minimal_french", "chevaux", "cheval")]:
        f = make_token_filter({"type": "stemmer", "language": lang})
        toks, _ = f(([word], [0]))
        assert toks == [stem], (lang, word)


# Finnish (r5 session 3) — every pin hand-traced through the published
# steps: regions p1/p2 (after-vowel-consonant marks), longest in-region
# suffix commit per step, unlimited condition lookbehinds, tidy (a)-(d)
# R1-limited, final consonant undouble unlimited.
FI = {
    # case endings + i-plural funnel into the bare stem
    "taloissa": "talo",       # ssa; i_plural
    "taloista": "talo",       # sta; i_plural
    "talon": "talo",          # n
    "talo": "talo",
    # possessives chain into case endings
    "taloni": "talo",         # ni
    "talosi": "talo",         # si (prev o != k)
    "talossaan": "talo",      # poss an after ssa; then ssa
    "taloilleen": "talo",     # poss en after lle; then lle; i_plural
    "taloineen": "talo",      # poss en after ine; then ine; i_plural
    # particles
    "taloissakin": "talo",    # kin after a
    "talossako": "talo",      # ko after a
    "kirkko": "kirko",        # particle ko REJECTED (prev k); tidy undouble kk
    "kirkon": "kirko",        # n; gradation-converged with kirkko
    # R1 empty -> untouched
    "maan": "maan",
    "maa": "maa",
    # n after long vowel drags one vowel; i_plural then fires
    "kaupunkiin": "kaupunk",
    "kaupunki": "kaupunk",    # nominative converges via tidy (b)
    "käsiin": "käs",
    # hXn harmony suffix out of R1 -> only n drops; tidy (b) blocked
    # when the consonant sits left of p1
    "maahan": "maaha",
    "maiden": "maide",
    "miehen": "miehe",
    # seen/tten/tta family converge with the nominative
    "huoneeseen": "huone",    # seen after long ee; tidy (a)
    "huoneitten": "huone",    # tten after Vi; i_plural
    "huonetta": "huone",      # tta after e
    "huone": "huone",
    # possessive ni with the kse -> ksi restore, then ksi case
    "vastaukseni": "vastau",
    # sti in R2 only
    "nopeasti": "nopeast",    # sti starts before p2 -> only tidy (b)
    "tavallisesti": "tavallis",
    # comparative/superlative tails
    "suurempia": "suuremp",   # case a after cv; i_plural
    "suurempi": "suuremp",    # tidy (b)
    "suurimmat": "suurim",    # t_plural; tidy (b) + undouble mm
    "mielenkiintoisimmat": "mielenkiintois",  # t_plural then R2 imma
    "onnellisempi": "onnellis",   # mpi in R2 (not after po)
    "leipopompi": "leipopomp",    # mpi blocked by the po guard
    "kappaleja": "kappal",        # eja in R2
    # possessive si blocked after k
    "maksi": "maks",
    # tidy cascades
    "kirjoja": "kirj",        # (b) a, (c) j after o, (d) o after j
    "tietokoneella": "tietokon",  # lla; tidy (a) then (b)
    "ihminen": "ihmin",
    "järjestelmä": "järjestelm",  # ä in AEI after consonant
    # yy is NOT a long vowel (y outside V2/LONG)
    "hyvyys": "hyvyys",
}


def test_finnish_vectors():
    from opensearch_spark.analysis.snowball import finnish_stem

    for word, stem in FI.items():
        assert finnish_stem(word) == stem, word


def test_finnish_chain_registration():
    f = make_token_filter({"type": "stemmer", "language": "finnish"})
    toks, pos = f((["taloissa", "kaupunkiin"], [0, 1]))
    assert toks == ["talo", "kaupunk"] and pos == [0, 1]


def test_finnish_analyzer_preset():
    toks, pos = Analyzer.from_spec("finnish")("Hän asuu taloissa ja kirkoissa")
    # hän/ja are snowball finnish stopwords; the rest stem with the
    # stop-position gaps kept (talo at 2, kirko at 4)
    # (asuu loses one u to tidy (a): long-vowel undouble in R1)
    assert toks == ["asu", "talo", "kirko"] and pos == [1, 2, 4]


def test_finnish_properties():
    """Hypothesis soak: the stemmer never raises, never grows the
    word (every step deletes or length-preserves: the only rewrite,
    kse -> ksi, is same-length), and is pure lowercase-in/out."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from opensearch_spark.analysis.snowball import finnish_stem

    @given(st.text(max_size=24))
    @settings(max_examples=400, deadline=None)
    def prop(w):
        out = finnish_stem(w)
        assert isinstance(out, str)
        assert len(out) <= len(w.lower())

    prop()
