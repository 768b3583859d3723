from cookietts_tpu.text import (
    N_SYMBOLS,
    SYMBOL_TO_ID,
    sequence_to_text,
    symbols,
    text_to_sequence,
)
from cookietts_tpu.text.numbers import (
    normalize_numbers,
    number_to_words,
    number_to_words_ordinal,
)
from cookietts_tpu.text.cleaners import english_cleaners, basic_cleaners


def test_symbol_inventory_layout():
    # layout must match the reference ID space (SURVEY.md §2.1, symbols.py)
    assert symbols[0] == "_"
    assert symbols[1] == "-"
    assert symbols[2] == "!"
    assert "@AA" in SYMBOL_TO_ID and "@ZH" in SYMBOL_TO_ID
    assert N_SYMBOLS == 1 + 1 + 10 + 52 + 84 + 31  # pad+special+punct+letters+arpa+custom
    assert SYMBOL_TO_ID["A"] == 12  # first letter right after punctuation block


def test_text_roundtrip_plain():
    seq = text_to_sequence("Hello, world!", ["basic_cleaners"])
    assert sequence_to_text(seq) == "Hello, world!"


def test_text_arpabet_curly():
    seq = text_to_sequence("Turn {HH AW1 S} street.", ["basic_cleaners"])
    text = sequence_to_text(seq)
    assert "{HH AW1 S}" in text
    # phones map into the @-prefixed region of the symbol table
    assert SYMBOL_TO_ID["@HH"] in seq


def test_pad_symbol_dropped():
    assert text_to_sequence("_a_", ["basic_cleaners"]) == [SYMBOL_TO_ID["a"]]


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234567) == (
        "one million two hundred thirty-four thousand five hundred sixty-seven"
    )


def test_ordinals():
    assert number_to_words_ordinal(1) == "first"
    assert number_to_words_ordinal(2) == "second"
    assert number_to_words_ordinal(3) == "third"
    assert number_to_words_ordinal(12) == "twelfth"
    assert number_to_words_ordinal(20) == "twentieth"
    assert number_to_words_ordinal(21) == "twenty-first"
    assert number_to_words_ordinal(100) == "one hundredth"


def test_normalize_numbers():
    assert normalize_numbers("I have 3 cats") == "I have three cats"
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers("the 2nd time") == "the second time"
    assert normalize_numbers("in 1984") == "in nineteen eighty-four"
    assert normalize_numbers("in 2005") == "in two thousand five"
    assert normalize_numbers("1,000 miles") == "one thousand miles"
    assert normalize_numbers("3.14") == "three point fourteen"


def test_cleaners():
    assert english_cleaners("Dr.  Smith   lives") == "doctor Smith lives"
    assert basic_cleaners("a  b") == "a b"


def test_text_to_sequence_matches_reference():
    """Symbol-ID space + cleaner + {ARPA} codec parity vs the LIVE
    reference text frontend (utils/text/__init__.py:15-40, cleaners.py,
    symbols.py). ``unidecode`` is stubbed as identity (inputs are ASCII;
    the real package only transliterates non-ASCII) and ``inflect`` with
    a sentinel engine (inputs are digit-free — the number grammar has
    its own from-scratch tests; the reference needs the pip package)."""
    import sys
    import types

    if "unidecode" not in sys.modules:
        ud = types.ModuleType("unidecode")
        ud.unidecode = lambda s: s
        sys.modules["unidecode"] = ud
    if "inflect" not in sys.modules:
        inf = types.ModuleType("inflect")

        class _Engine:
            def number_to_words(self, *a, **k):
                raise AssertionError("digit-free inputs only")
        inf.engine = _Engine
        sys.modules["inflect"] = inf

    sys.path.insert(0, "/root/reference")
    try:
        from CookieTTS.utils.text import text_to_sequence as ref_t2s
    finally:
        sys.path.pop(0)

    from cookietts_tpu.text import text_to_sequence

    cases = [
        "Hello, world!",
        "Dr. Smith met Mrs. Jones; they left...",
        "A  b\tc   d.",                       # whitespace collapse
        "I know {AH0 B AW1 T} that.",         # ARPA curly codec
        "{HH AH0 L OW1} there, {W ER1 L D}!",
        "mixed CASE and mis, ters. etc?",
        "quote \"this\" and 'that'.",
    ]
    for s in cases:
        assert text_to_sequence(s, ["english_cleaners"]) == \
            ref_t2s(s, ["english_cleaners"]), s
