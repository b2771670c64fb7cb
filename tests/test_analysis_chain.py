"""Analysis chain: char filters, tokenizers, token filters, named analyzers.

Reference semantics per component are cited in
``opensearch_spark/analysis/chain.py``; the Porter fixtures are final
stems from the published Porter (1980) algorithm's canonical
vocabulary/output pairs.
"""

import pytest

from opensearch_spark.analysis import analyzer as std
from opensearch_spark.analysis.chain import (
    Analyzer,
    analyze_api,
    make_char_filter,
    make_token_filter,
    make_tokenizer,
    porter_stem,
)

# ---- Porter stemmer (canonical final stems) ----

PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file", "happy": "happi",
    "sky": "sky", "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_vectors():
    bad = {
        w: (porter_stem(w), want)
        for w, want in PORTER_VECTORS.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


# ---- contract: custom "standard" chain == fast-path analyzer ----

STANDARD_CASES = [
    "The Quick-Brown fox's 3.14 jump over x86_64 rigs",
    "snake_case and camelCase; state-of-the-art!",
    "can't won't don’t  foo.bar 1,000,000",
    "日本語のテキスト and ascii",
    "",
    None,
]


def test_standard_chain_matches_fast_path():
    chain = Analyzer.from_spec("standard")
    for text in STANDARD_CASES:
        assert chain(text) == std.tokenize_with_positions(text)


def test_standard_chain_with_stopwords_matches_fast_path():
    chain = Analyzer.from_spec({"type": "standard", "stopwords": "_english_"})
    for text in STANDARD_CASES:
        assert chain(text) == std.tokenize_with_positions(
            text, std.ENGLISH_STOP_WORDS
        )


# ---- tokenizers ----

def test_whitespace_letter_keyword_pattern():
    assert make_tokenizer("whitespace")("a  b\tc")[0] == ["a", "b", "c"]
    assert make_tokenizer("letter")("ab3cd ef")[0] == ["ab", "cd", "ef"]
    assert make_tokenizer("lowercase")("AB3cd")[0] == ["ab", "cd"]
    assert make_tokenizer("keyword")("one whole value")[0] == [
        "one whole value"
    ]
    assert make_tokenizer({"type": "pattern", "pattern": ","})("a,b,,c")[0] == [
        "a", "b", "c"
    ]
    assert make_tokenizer(
        {"type": "pattern", "pattern": r'"(.*?)"', "group": 1}
    )('x "first" y "second"')[0] == ["first", "second"]


def test_char_group_tokenizer():
    tok = make_tokenizer(
        {"type": "char_group", "tokenize_on_chars": ["whitespace", "-"]}
    )
    assert tok("state-of the-art")[0] == ["state", "of", "the", "art"]


def test_ngram_edge_ngram_tokenizers():
    assert make_tokenizer({"type": "ngram", "min_gram": 2, "max_gram": 3})(
        "abcd"
    )[0] == ["ab", "abc", "bc", "bcd", "cd"]
    assert make_tokenizer(
        {"type": "edge_ngram", "min_gram": 1, "max_gram": 3}
    )("abcd")[0] == ["a", "ab", "abc"]


def test_path_hierarchy_tokenizer():
    toks, pos = make_tokenizer("path_hierarchy")("/usr/local/bin")
    assert toks == ["/usr", "/usr/local", "/usr/local/bin"]
    assert pos == [0, 0, 0]


# ---- char filters ----

def test_char_filters():
    # tags deleted inline (HTMLStripCharFilter): "java<b>script</b>" stays one token
    assert make_char_filter("html_strip")("<b>bold</b> x") == "bold x"
    assert make_char_filter("html_strip")("java<b>script</b>") == "javascript"
    assert make_char_filter(
        {"type": "mapping", "mappings": ["& => and", ":) => happy"]}
    )("a & b :)") == "a and b happy"
    assert make_char_filter(
        {"type": "pattern_replace", "pattern": r"\d+", "replacement": "#"}
    )("a12b345") == "a#b#"


# ---- token filters ----

def _ts(*toks):
    return list(toks), list(range(len(toks)))


def test_stop_preserves_position_gaps():
    f = make_token_filter({"type": "stop", "stopwords": "_english_"})
    toks, pos = f(_ts("the", "quick", "fox"))
    assert toks == ["quick", "fox"]
    assert pos == [1, 2]


def test_asciifolding():
    f = make_token_filter("asciifolding")
    assert f(_ts("café", "naïve", "Ærøskøbing"))[0][:2] == ["cafe", "naive"]


def test_shingle_filter():
    f = make_token_filter({"type": "shingle"})
    toks, pos = f(_ts("quick", "brown", "fox"))
    assert toks == ["quick", "quick brown", "brown", "brown fox", "fox"]
    assert pos == [0, 0, 1, 1, 2]
    f2 = make_token_filter(
        {"type": "shingle", "min_shingle_size": 2, "max_shingle_size": 3,
         "output_unigrams": False}
    )
    assert f2(_ts("a", "b", "c"))[0] == ["a b", "a b c", "b c"]


def test_synonym_filter_equivalence_and_mapping():
    f = make_token_filter(
        {"type": "synonym",
         "synonyms": ["universe, cosmos", "lol => laughing"]}
    )
    toks, pos = f(_ts("the", "universe", "lol"))
    assert toks == ["the", "universe", "cosmos", "laughing"]
    assert pos == [0, 1, 1, 2]


def test_small_filters():
    assert make_token_filter({"type": "truncate", "length": 3})(
        _ts("abcdef")
    )[0] == ["abc"]
    assert make_token_filter({"type": "length", "min": 2, "max": 3})(
        _ts("a", "ab", "abc", "abcd")
    )[0] == ["ab", "abc"]
    assert make_token_filter("unique")(_ts("a", "b", "a"))[0] == ["a", "b"]
    assert make_token_filter("reverse")(_ts("abc"))[0] == ["cba"]
    assert make_token_filter("apostrophe")(_ts("o'brien", "x"))[0] == [
        "o", "x"
    ]
    assert make_token_filter({"type": "edge_ngram", "min_gram": 1,
                              "max_gram": 2})(_ts("fox"))[0] == ["f", "fo"]
    g_toks, g_pos = make_token_filter(
        {"type": "ngram", "min_gram": 2, "max_gram": 2}
    )(_ts("fox", "ox"))
    assert g_toks == ["fo", "ox", "ox"]
    assert g_pos == [0, 0, 1]


# ---- named analyzers + full custom chain + _analyze API ----

def test_named_analyzers():
    assert Analyzer.from_spec("simple").tokens("The 3 Foxes") == [
        "the", "foxes"
    ]
    assert Analyzer.from_spec("whitespace").tokens("The 3 Foxes") == [
        "The", "3", "Foxes"
    ]
    assert Analyzer.from_spec("keyword").tokens("One Value") == ["One Value"]
    assert Analyzer.from_spec("stop").tokens("the quick fox") == [
        "quick", "fox"
    ]


def test_custom_chain_end_to_end():
    an = Analyzer.from_spec(
        {
            "char_filter": [{"type": "html_strip"}],
            "tokenizer": "standard",
            "filter": [
                "lowercase",
                {"type": "stop", "stopwords": "_english_"},
                {"type": "stemmer", "language": "english"},
            ],
        }
    )
    assert an.tokens("<p>The Motoring Conditional Ponies</p>") == [
        "motor", "condit", "poni"
    ]


def test_analyze_api_rows():
    rows = analyze_api("standard", ["Quick Fox", ""])
    assert rows == [
        {"input": 0, "token": "quick", "position": 0},
        {"input": 0, "token": "fox", "position": 1},
    ]


def test_unknown_components_raise():
    with pytest.raises(ValueError):
        make_tokenizer("no_such_tokenizer")
    with pytest.raises(ValueError):
        make_token_filter("no_such_filter")
    with pytest.raises(ValueError):
        make_char_filter("no_such_char_filter")
    with pytest.raises(ValueError):
        make_token_filter({"type": "stemmer", "language": "klingon"})


def test_from_spec_rejects_unknown_keys_on_named_and_custom_specs():
    """A misspelled 'filters' (or a filter list on a named analyzer)
    must raise, not silently degrade to the plain standard analyzer."""
    import pytest

    from opensearch_spark.analysis.chain import Analyzer

    with pytest.raises(ValueError, match="filters"):
        Analyzer.from_spec({"tokenizer": "standard", "filters": [{"type": "shingle"}]})
    with pytest.raises(ValueError, match="filter"):
        Analyzer.from_spec({"type": "standard", "filter": [{"type": "shingle"}]})
    # the supported named shape still works (must not raise)
    toks, _pos = Analyzer.from_spec({"type": "standard", "stopwords": ["a"]})("a b")
    assert toks == ["b"]


def test_annotated_text_tokenizer():
    # AnnotatedTextFieldMapper.java markdownPattern + AnnotationToken
    # semantics: plain text tokens keep sequential positions, each
    # annotation value is injected at its span's first token position
    from opensearch_spark.analysis.chain import Analyzer

    an = Analyzer.from_spec({"tokenizer": {"type": "annotated_text"}})
    toks, poss = an("New mayor is [John Smith](person&John%20Smith) today")
    pairs = sorted(zip(poss, toks))
    # plain: New(0) mayor(1) is(2) John(3) Smith(4) today(5)
    assert (3, "John") in pairs and (4, "Smith") in pairs
    assert (3, "person") in pairs and (3, "John Smith") in pairs
    assert (5, "today") in pairs
    # no annotations -> plain standard tokenization
    toks2, poss2 = an("plain text")
    assert toks2 == ["plain", "text"] and poss2 == [0, 1]
    # key=value pairs are rejected (the reference raises)
    import pytest as _pt

    with _pt.raises(ValueError, match="key=value"):
        an("[x](type=person)")
    # annotation over empty text anchors at an adjoining token ...
    toks3, poss3 = an("a [](tag)b")
    assert ("tag" in toks3) and poss3[toks3.index("tag")] == poss3[toks3.index("b")]
    # ... and is dropped when no token touches its span (the reference's
    # AnnotationToken.intersects admits no token either)
    toks3b, _ = an("a [](tag) b")
    assert "tag" not in toks3b
    # annotation with no token in or after its span is dropped
    toks4, _ = an("a [.](tag)")
    assert "tag" not in toks4


def test_annotated_text_filters_apply_downstream():
    from opensearch_spark.analysis.chain import Analyzer

    an = Analyzer.from_spec(
        {"tokenizer": {"type": "annotated_text"}, "filter": ["lowercase"]}
    )
    toks, poss = an("[Paris](City) is big")
    assert ("paris" in toks) and ("city" in toks)
    assert poss[toks.index("city")] == poss[toks.index("paris")]


# ------------------------ r4 late: chain-zoo completion batch


def test_word_delimiter_splits():
    from opensearch_spark.analysis.chain import make_token_filter

    wd = make_token_filter({"type": "word_delimiter"})
    assert wd((["Wi-Fi", "PowerShot", "SD500", "O'Neil's", "XMLFile"],
               [0, 1, 2, 3, 4])) == (
        ["Wi", "Fi", "Power", "Shot", "SD", "500", "O", "Neil",
         "XML", "File"],
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
    )
    # catenations and originals share the first part's position
    wd = make_token_filter({"type": "word_delimiter", "catenate_words": True})
    assert wd((["Wi-Fi"], [0])) == (["WiFi", "Wi", "Fi"], [0, 0, 1])
    wd = make_token_filter(
        {"type": "word_delimiter", "catenate_all": True,
         "preserve_original": True}
    )
    assert wd((["j2se"], [0])) == (
        ["j2se", "j2se", "j", "2", "se"], [0, 0, 0, 1, 2]
    )
    # option gates
    wd = make_token_filter(
        {"type": "word_delimiter", "split_on_case_change": False}
    )
    assert wd((["PowerShot"], [0]))[0] == ["PowerShot"]
    wd = make_token_filter(
        {"type": "word_delimiter", "split_on_numerics": False}
    )
    assert wd((["SD500"], [0]))[0] == ["SD500"]
    wd = make_token_filter(
        {"type": "word_delimiter", "protected_words": ["Wi-Fi"]}
    )
    assert wd((["Wi-Fi"], [0]))[0] == ["Wi-Fi"]
    wd = make_token_filter(
        {"type": "word_delimiter", "stem_english_possessive": False}
    )
    assert wd((["O'Neil's"], [0]))[0] == ["O", "Neil", "s"]
    # graph variant: identical flat output
    wdg = make_token_filter({"type": "word_delimiter_graph"})
    assert wdg((["Wi-Fi"], [0])) == (["Wi", "Fi"], [0, 1])


def test_keyword_marker_and_stemmer_override_threading():
    """Lucene keyword-attribute semantics: markers protect tokens from
    stemmers built AFTER them; a marker after the stemmer has no
    effect.  stemmer_override rewrites and protects its outputs."""
    from opensearch_spark.analysis.chain import Analyzer

    before = Analyzer.from_spec({
        "tokenizer": "whitespace",
        "filter": [
            {"type": "keyword_marker", "keywords": ["running"]},
            {"type": "stemmer", "language": "porter"},
        ],
    })
    assert before("running jumping")[0] == ["running", "jump"]
    after = Analyzer.from_spec({
        "tokenizer": "whitespace",
        "filter": [
            {"type": "stemmer", "language": "porter"},
            {"type": "keyword_marker", "keywords": ["running"]},
        ],
    })
    assert after("running jumping")[0] == ["run", "jump"]
    ci = Analyzer.from_spec({
        "tokenizer": "whitespace",
        "filter": [
            {"type": "keyword_marker", "keywords": ["RUNNING"],
             "ignore_case": True},
            "porter_stem",
        ],
    })
    assert ci("running")[0] == ["running"]
    pat = Analyzer.from_spec({
        "tokenizer": "whitespace",
        "filter": [
            {"type": "keyword_marker", "keywords_pattern": ".*ing"},
            "porter_stem",
        ],
    })
    assert pat("running jumped")[0] == ["running", "jump"]
    ovr = Analyzer.from_spec({
        "tokenizer": "whitespace",
        "filter": [
            {"type": "stemmer_override", "rules": ["running => run"]},
            "porter_stem",
        ],
    })
    assert ovr("running runner")[0] == ["run", "runner"]
    # snowball stemmers honor the marker too
    sb = Analyzer.from_spec({
        "tokenizer": "whitespace",
        "filter": [
            {"type": "keyword_marker", "keywords": ["livros"]},
            {"type": "stemmer", "language": "portuguese"},
        ],
    })
    assert sb("livros meninas")[0] == ["livros", "menin"]


def test_common_grams_modes():
    from opensearch_spark.analysis.chain import make_token_filter

    cg = make_token_filter({"type": "common_grams", "common_words": ["the"]})
    assert cg((["the", "quick", "fox"], [0, 1, 2])) == (
        ["the", "the_quick", "quick", "fox"], [0, 0, 1, 2]
    )
    q = make_token_filter(
        {"type": "common_grams", "common_words": ["the"],
         "query_mode": True}
    )
    assert q((["the", "quick", "fox"], [0, 1, 2])) == (
        ["the_quick", "fox"], [0, 2]
    )
    # a position gap (stopped token) breaks the pair
    assert cg((["the", "fox"], [0, 2])) == (["the", "fox"], [0, 2])


def test_chain_zoo_small_filters():
    from opensearch_spark.analysis.chain import make_token_filter as mtf

    assert mtf({"type": "keep", "keep_words": ["fox"]})(
        (["the", "fox"], [0, 1])
    ) == (["fox"], [1])
    assert mtf({"type": "keep_types", "types": ["<NUM>"]})(
        (["abc", "123"], [0, 1])
    ) == (["123"], [1])
    assert mtf({"type": "keep_types", "types": ["<NUM>"],
                "mode": "exclude"})((["abc", "123"], [0, 1])) == (
        ["abc"], [0]
    )
    assert mtf({"type": "limit", "max_token_count": 2})(
        (["a", "b", "c"], [0, 1, 2])
    ) == (["a", "b"], [0, 1])
    assert mtf("limit")((["a", "b"], [0, 1])) == (["a"], [0])
    assert mtf("decimal_digit")((["٣٤٥", "x১y"], [0, 1]))[0] == [
        "345", "x1y"
    ]
    assert mtf("fingerprint")((["b", "a", "b"], [0, 1, 2])) == (
        ["a b"], [0]
    )
    assert mtf("remove_duplicates")((["a", "a", "a"], [0, 0, 1])) == (
        ["a", "a"], [0, 1]
    )
    assert mtf({"type": "pattern_capture", "patterns": [r"(\d+)"]})(
        (["abc123def45"], [0])
    ) == (["abc123def45", "123", "45"], [0, 0, 0])
    assert mtf("classic")((["U.S.A.", "John's"], [0, 1]))[0] == [
        "USA", "John"
    ]
    assert mtf("scandinavian_normalization")(
        (["aalborg", "fär", "oevre"], [0, 1, 2])
    )[0] == ["ålborg", "fær", "øvre"]
    assert mtf("scandinavian_folding")(
        (["räksmörgås", "aalborg"], [0, 1])
    )[0] == ["raksmorgas", "alborg"]
    assert mtf("delimited_payload")((["token|3.5"], [0]))[0] == ["token"]
    assert mtf("concatenate_graph")((["a", "b"], [0, 1])) == (["a b"], [0])
    assert mtf("flatten_graph")((["x"], [0])) == (["x"], [0])
    assert mtf({"type": "synonym_graph", "synonyms": ["a => b"]})(
        (["a", "c"], [0, 1])
    )[0] == ["b", "c"]
    assert mtf({
        "type": "dictionary_decompounder",
        "word_list": ["dark", "beer", "keller"],
    })((["darkbeer"], [0])) == (
        ["darkbeer", "dark", "beer"], [0, 0, 0]
    )
    assert mtf({
        "type": "dictionary_decompounder",
        "word_list": ["dark", "darkb"],
        "only_longest_match": True,
    })((["darkbeer"], [0]))[0] == ["darkbeer", "darkb"]


def test_pattern_replace_and_multiplexer():
    from opensearch_spark.analysis.chain import make_token_filter as mtf

    f = mtf({"type": "pattern_replace", "pattern": "o", "replacement": "0"})
    assert f((["foo", "boot"], [0, 1]))[0] == ["f00", "b00t"]
    f = mtf({"type": "pattern_replace", "pattern": "o",
             "replacement": "0", "all": False})
    assert f((["foo"], [0]))[0] == ["f0o"]
    m = mtf({"type": "multiplexer", "filters": ["lowercase", "porter_stem"]})
    assert m((["Running"], [0])) == (
        ["Running", "running", "Run"], [0, 0, 0]
    )
    m = mtf({"type": "multiplexer", "filters": ["lowercase"],
             "preserve_original": False})
    assert m((["ABC"], [0])) == (["abc"], [0])


def test_language_normalizers_and_arabic_stem():
    from opensearch_spark.analysis.chain import make_token_filter as mtf

    g = mtf("german_normalization")
    assert g((["schön", "straße", "quelle", "baue", "uebermäßig"],
              [0, 1, 2, 3, 4]))[0] == [
        "schon", "strasse", "quelle", "baue", "ubermassig"
    ]
    a = mtf("arabic_normalization")
    assert a((["أحمد", "مدرسةٌ", "إسلامى"], [0, 1, 2]))[0] == [
        "احمد", "مدرسه", "اسلامي"
    ]
    p = mtf("persian_normalization")
    assert p((["كتابي"], [0]))[0] == ["کتابی"]
    s = mtf("arabic_stem")
    # one prefix strip + all matching suffixes; length guards: the waw
    # of a 3-char word survives, suffixes leave >= 2 chars
    assert s((["والكتاب", "المكتبة", "كتابها", "وله"],
              [0, 1, 2, 3]))[0] == ["كتاب", "مكتب", "كتاب", "ول"]


def test_legacy_stem_aliases_and_german_czech_stems():
    from opensearch_spark.analysis import snowball as sb
    from opensearch_spark.analysis.chain import make_token_filter as mtf

    # french/russian/dutch_stem are exact snowball aliases
    fr = mtf("french_stem")
    assert fr((["continuation"], [0]))[0] == [sb.french_stem("continuation")]
    ru = mtf("russian_stem")
    assert ru((["книгами"], [0]))[0] == [sb.russian_stem("книгами")]
    nl = mtf("dutch_stem")
    assert nl((["lichamelijk"], [0]))[0] == [sb.dutch_stem("lichamelijk")]
    # brazilian_stem serves snowball portuguese (documented deviation)
    br = mtf("brazilian_stem")
    assert br((["meninas"], [0]))[0] == [sb.portuguese_stem("meninas")]
    # german_stem = Caumanns, NOT snowball: declension classes collapse
    de = mtf("german_stem")
    toks = ["tisch", "tische", "tischen", "haus", "hauses",
            "häuser", "häusern", "abschluß"]
    assert de((toks, list(range(len(toks)))))[0] == [
        "tisch", "tisch", "tisch", "hau", "hau", "hau", "hau", "abschluss"
    ]
    # czech_stem: masculine/feminine case classes collapse; fleeting-e
    cz = mtf("czech_stem")
    toks = ["pánové", "páni", "pánů", "žena", "ženou", "matek", "matka"]
    assert cz((toks, list(range(len(toks)))))[0] == [
        "pán", "pán", "pán", "žn", "žn", "matk", "matk"
    ]
    # stemmers honor keyword_marker protection via the chain ctx
    ctx = {"protected": {"tische"}}
    de_kw = mtf("german_stem", ctx)
    assert de_kw((["tische"], [0]))[0] == ["tische"]


def test_remaining_normalizers():
    from opensearch_spark.analysis.chain import make_token_filter as mtf

    sr = mtf("serbian_normalization")
    assert sr((["љубав", "џак", "ђак", "čaša", "šišmiš"],
               [0, 1, 2, 3, 4]))[0] == [
        "ljubav", "dzak", "djak", "casa", "sismis"
    ]
    ckb = mtf("sorani_normalization")
    # kaf->keheh, yeh->farsi yeh, final heh->ae, initial reh->rreh
    assert ckb((["رووداوي", "ماله"], [0, 1]))[0] == ["ڕووداوی", "مالە"]
    hi = mtf("hindi_normalization")
    # nukta folds, long vowels/matras shorten
    assert hi((["ज़िन्दगी", "ऊँचाई"], [0, 1]))[0] == ["जिन्दगि", "उंचाइ"]
    bn = mtf("bengali_normalization")
    assert bn((["ড়"], [0]))[0] == ["ড"]
    ind = mtf("indic_normalization")
    # decomposed ka+nukta composes to the canonical precomposed form
    assert ind((["क़"], [0]))[0] == ["क़"]


def test_delimited_term_freq_and_min_hash():
    from opensearch_spark.analysis.chain import make_token_filter as mtf

    dtf = mtf("delimited_term_freq")
    assert dtf((["foo|3", "bar", "baz|x"], [0, 1, 2])) == (
        ["foo", "foo", "foo", "bar", "baz|x"], [0, 0, 0, 1, 2]
    )
    dtf2 = mtf({"type": "delimited_term_freq", "delimiter": "/"})
    assert dtf2((["a/2"], [0]))[0] == ["a", "a"]
    mh = mtf({"type": "min_hash", "bucket_count": 8, "hash_count": 2})
    sig1 = mh((["the", "quick", "brown", "fox"], [0, 1, 2, 3]))
    sig2 = mh((["the", "quick", "brown", "fox"], [0, 1, 2, 3]))
    assert sig1 == sig2  # deterministic
    assert len(sig1[0]) == 16  # with_rotation fills all 8x2 slots
    # near-identical streams share most signature tokens
    a = set(mh((["w%d" % i for i in range(40)], list(range(40))))[0])
    b = set(mh((["w%d" % i for i in range(39)] + ["zzz"],
                list(range(40))))[0])
    assert len(a & b) >= 12
    assert mh(([], [])) == ([], [])


def test_hyphenation_decompounder():
    import pytest

    from opensearch_spark.analysis.chain import make_token_filter as mtf

    hy = mtf({"type": "hyphenation_decompounder",
              "word_list": ["donau", "schiff"], "min_subword_size": 4})
    assert hy((["donauschiff"], [0]))[0] == ["donauschiff", "donau", "schiff"]
    with pytest.raises(ValueError):
        mtf({"type": "hyphenation_decompounder"})


def test_remaining_tokenizers():
    from opensearch_spark.analysis.chain import make_tokenizer as mtok

    sp = mtok({"type": "simple_pattern", "pattern": "[0-9]{3}"})
    assert sp("fd-786-335-514-x")[0] == ["786", "335", "514"]
    sps = mtok({"type": "simple_pattern_split", "pattern": "_"})
    assert sps("an_underscored_phrase")[0] == ["an", "underscored", "phrase"]
    u = mtok({"type": "uax_url_email"})
    assert u("mail john.smith@example.com or https://ex.com/a?b=1 or www.foo.org")[0] == [
        "mail", "john.smith@example.com", "or", "https://ex.com/a?b=1",
        "or", "www.foo.org"
    ]
    c = mtok({"type": "classic"})
    assert c("I.B.M. bought O'Neil's 2.4GHz wi-fi at AT&T for $2,000 on example.com")[0] == [
        "I.B.M", "bought", "O'Neil's", "2.4GHz", "wi", "fi", "at",
        "AT&T", "for", "2,000", "on", "example.com"
    ]
    th = mtok({"type": "thai"})
    assert th("การที่ได้ mixed ข้อความ")[0] == ["การที่ได้", "mixed", "ข้อความ"]


def test_icu_plugin_analogs():
    from opensearch_spark.analysis.chain import (
        Analyzer,
        make_char_filter,
        make_token_filter as mtf,
        make_tokenizer as mtok,
    )

    n = mtf("icu_normalizer")  # default nfkc_cf
    assert n((["Ｆｕｌｌ", "ﬁnally", "Straße", "Ⅸ"], [0, 1, 2, 3]))[0] == [
        "full", "finally", "strasse", "ix"
    ]
    nfc = mtf({"type": "icu_normalizer", "name": "nfc"})
    assert nfc((["Café"], [0]))[0] == ["Café"]
    f = mtf("icu_folding")
    assert f((["Ångström", "Μάθημα", "أَحْمَد"], [0, 1, 2]))[0] == [
        "angstrom", "μαθημα", "احمد"
    ]
    # unicodeSetFilter keeps the Swedish letters unfolded
    fs = mtf({"type": "icu_folding", "unicode_set_filter": "[^åäöÅÄÖ]"})
    assert fs((["Rådgivaren"], [0]))[0] == ["rådgivaren"]
    tr = mtf({"type": "icu_transform",
              "id": "NFD; [:Nonspacing Mark:] Remove; NFC; Any-Lower"})
    assert tr((["Café"], [0]))[0] == ["cafe"]
    import pytest
    with pytest.raises(ValueError):
        mtf({"type": "icu_transform", "id": "Any-Latin"})
    cf = make_char_filter({"type": "icu_normalizer", "name": "nfkc"})
    assert cf("ﬁｌｅ") == "file"
    coll = mtf({"type": "icu_collation", "strength": "primary"})
    assert coll((["Café", "cafe"], [0, 1]))[0] == ["cafe", "cafe"]
    assert mtok("icu_tokenizer")("Hello 世界")[0] == ["Hello", "世", "界"]
    # the named analyzer wires char_filter -> tokenizer -> folding
    an = Analyzer.from_spec("icu_analyzer")
    assert an("Ｗｉ-Ｆｉ Ångström")[0] == ["wi", "fi", "angstrom"]
