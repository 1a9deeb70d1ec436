from ocr_spark.textproc.boilerplate import (
    block_features,
    extract_main_content,
    is_boilerplate,
)

MAIN = "The quick brown fox jumps over the lazy dog and it is done."
NAV = "item0 https://example.com/a item1 https://example.com/b item2 https://example.com/c"
FOOTER = "© 2024 Example Corp All Rights Reserved"
HEADER = "SECTION FOUR NOW"


def test_main_content_kept():
    assert not is_boilerplate(MAIN)


def test_link_density():
    assert is_boilerplate(NAV)
    assert block_features(NAV)["link_density"] >= 0.25


def test_copyright():
    assert is_boilerplate(FOOTER)
    assert is_boilerplate("Copyright 2020 Someone")
    assert is_boilerplate("(c) 2019 x y z")


def test_short_shouty_header():
    assert is_boilerplate(HEADER)
    # short but sentence-like with stopwords -> kept
    assert not is_boilerplate("It is done.")


def test_extract_main_content_order_preserved():
    text = "\n\n".join([NAV, MAIN, FOOTER, MAIN + " Again the end is near."])
    out = extract_main_content(text)
    assert out == MAIN + "\n\n" + MAIN + " Again the end is near."


def test_empty():
    assert extract_main_content("") == ""
    assert extract_main_content(NAV) == ""


def test_punctuated_stopwords_counted():
    # edge-punctuation must strip before the stopword lookup: 'the,' and
    # 'and,' are stopwords, ratio 0.5 > 0.2 -> NOT boilerplate (rule B3)
    assert block_features("the, and, quick brown")["stopword_ratio"] == 0.5
    assert not is_boilerplate("the, and, quick brown")


def test_oracle_sql_punctuated_stopwords():
    """DuckDB oracle must agree with the Python classifier on blocks whose
    stopwords carry edge punctuation (regression: 3-arg regexp_replace
    treated 'g' as the replacement string, not a global flag)."""
    import hashlib

    import duckdb

    from ocr_spark.functions.textops import _boilerplate_sql

    texts = [
        "the, and, quick brown",            # punctuated stopwords, short
        "the, and, quick brown\n\n" + NAV,  # mixed with boilerplate
        '"it" (is) \'done\' now!?',         # every word edge-punctuated
        MAIN + "\n\n" + FOOTER,
    ]
    con = duckdb.connect()
    values = ", ".join(
        "({i}, '{t}')".format(i=i, t=t.replace("'", "''").replace("\n", "' || chr(10) || '"))
        for i, t in enumerate(texts)
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {values}) t(doc_id, text)"
    )
    rows = {r[0]: r for r in con.execute(_boilerplate_sql()).fetchall()}
    for i, t in enumerate(texts):
        blocks = t.split("\n\n")
        kept = [b for b in blocks if b.strip() and not is_boilerplate(b)]
        doc_id, n_blocks, n_kept, md5 = rows[i]
        assert n_blocks == len(blocks), t
        assert n_kept == len(kept), t
        want_md5 = hashlib.md5("\n\n".join(kept).encode()).hexdigest()
        assert md5 == want_md5, t
