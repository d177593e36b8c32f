from lotus_spark.nl_expression import nle2str, parse_cols, parse_cols_sided


def test_parse_single():
    assert parse_cols("{Text} is positive") == ["Text"]


def test_parse_multi_and_dedup():
    assert parse_cols("{a} and {b} vs {a}") == ["a", "b"]


def test_parse_spaces_in_name():
    assert parse_cols("take {Course Name} seriously") == ["Course Name"]


def test_parse_escaped_braces_ignored():
    assert parse_cols("literal {{not a col}} but {col}") == ["col"]


def test_parse_sided():
    left, right, unsided = parse_cols_sided("{a:left} matches {b:right} and {c}")
    assert left == ["a"] and right == ["b"] and unsided == ["c"]


def test_nle2str():
    assert nle2str("{Text} is happy", ["Text"]) == "Text is happy"
    assert nle2str("{a:left} vs {b:right}", ["a", "b"]) == "a vs b"
