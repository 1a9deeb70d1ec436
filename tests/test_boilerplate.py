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
