"""Words.cpp-faithful tokenization (functions/words.py; reference
Words.cpp:197-457): alternating alnum/punct stream, the merge
exceptions (java++/c#, comma groups, decimal point, one apostrophe),
script breaks with CJK unigrams, and bit-exact word ids
(hash64Lower_utf8, hash.h:139-196)."""

import numpy as np

from open_source_search_engine_ray.functions.gbhash import HASHTAB
from open_source_search_engine_ray.functions.words import (
    word_id,
    word_ids,
    words_tokenize,
)


def alnum(text):
    return [w for w, al in words_tokenize(text) if al]


def test_stream_alternates_and_concats_back():
    t = "hello,  world!! x"
    toks = words_tokenize(t)
    assert "".join(w for w, _ in toks) == t
    assert [x[1] for x in toks] == [True, False, True, False, True]
    assert alnum(t) == ["hello", "world", "x"]
    # punct runs are words themselves (Words.cpp:86)
    assert [w for w, al in toks if not al] == [",  ", "!! "]


def test_plus_and_hash_suffixes():
    # Words.cpp:360-368: java++, A++, C++, A+, c#
    assert alnum("i like java++ and c# too") == ["i", "like", "java++", "and", "c#", "too"]
    assert alnum("grade A+ work") == ["grade", "A+", "work"]
    assert alnum("C++") == ["C++"]
    # '+' followed by alnum does NOT merge
    assert alnum("a+b") == ["a", "b"]
    # '#' followed by alnum does NOT merge
    assert alnum("c#x") == ["c", "x"]


def test_comma_number_groups():
    # Words.cpp:370-385: first comma within 3 digits of start, repeated
    # ,ddd groups not followed by a 4th digit
    assert alnum("1,234,567 items") == ["1,234,567", "items"]
    assert alnum("12,345") == ["12,345"]
    assert alnum("123,456") == ["123,456"]
    # 4 digits before the comma: no group
    assert alnum("1234,567") == ["1234", "567"]
    # group of 4 digits after comma: not a ,ddd group
    assert alnum("1,2345") == ["1", "2345"]
    # non-digit in the head kills it
    assert alnum("a1,234") == ["a1", "234"]


def test_decimal_point():
    assert alnum("pi is 3.14159 ok") == ["pi", "is", "3.14159", "ok"]
    assert alnum("v1.x") == ["v1", "x"]
    assert alnum(".5") == ["5"]  # needs a digit BEFORE the point


def test_single_apostrophe():
    # Words.cpp:399-405: at most ONE apostrophe merges
    assert alnum("we're dave's i'm") == ["we're", "dave's", "i'm"]
    assert alnum("rock'n'roll") == ["rock'n", "roll"]
    assert alnum("ends' x") == ["ends", "x"]  # trailing ' not merged


def test_script_breaks_and_cjk_unigrams():
    # script change breaks words; latin folds into common
    assert alnum("abcγδ x") == ["abc", "γδ", "x"]
    # ideographs tokenize as unigrams (Words.cpp:350-357)
    assert alnum("中文 ok") == ["中", "文", "ok"]
    # latin-1 accents stay inside the word (ucScriptLatin -> common)
    assert alnum("café bar") == ["café", "bar"]


def test_word_ids_bit_exact():
    # hash64Lower_utf8 == XOR of g_hashtab[pos][lowercased utf-8 byte]
    w = "HeLLo"
    h = np.uint64(0)
    for i, b in enumerate(w.lower().encode()):
        h ^= HASHTAB[i & 0xFF, b]
    assert word_id(w) == int(h)
    assert word_id("HELLO") == word_id("hello")
    ids = word_ids("Hello world HELLO")
    assert ids[0] == ids[2] != ids[1]


def test_words_alnum_counts_query(ray_session):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = entrymod.queries()["words_alnum_counts"](sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.execute(entrymod.oracle_sql()["words_alnum_counts"]).df()
    assert (got["n_alnum"].to_numpy() == want["n_alnum"].to_numpy()).all()
    assert (got["n_punct"].to_numpy() == want["n_punct"].to_numpy()).all()
    assert (got["alnum_chars"].to_numpy() == want["alnum_chars"].to_numpy()).all()
