"""Tokenizer-expression parity tests, mirroring the reference tokenizer
unit tests (`tokenizer/text_tokenizer_test.go`,
`tokenizer/keyword_tokenizer_test.go`, `tokenizer/path_tokenizer_test.go`)."""

from pyspark.sql import functions as F

from seqspark.tokenize import keyword_tokens, path_tokens, text_tokens


def tok(spark, expr_builder, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr_builder(F.col("v")).alias("t")).collect()[0]["t"]


def test_text_basic_split(spark):
    assert tok(spark, text_tokens, "Hello, World!") == ["hello", "world"]


def test_text_keeps_underscore_and_star(spark):
    assert tok(spark, text_tokens, "a_b c*d") == ["a_b", "c*d"]


def test_text_unicode_letters(spark):
    assert tok(spark, text_tokens, "Привет мир") == ["привет", "мир"]


def test_text_digits(spark):
    assert tok(spark, text_tokens, "err code 500") == ["err", "code", "500"]


def test_text_drops_too_long_tokens(spark):
    long = "x" * 73
    assert tok(spark, text_tokens, f"ok {long} fine") == ["ok", "fine"]


def test_text_empty_value_single_empty_token(spark):
    assert tok(spark, text_tokens, "") == [""]


def test_text_null_is_null(spark):
    assert tok(spark, text_tokens, None) is None


def test_text_over_32kb_skipped(spark):
    big = "word " * 7000  # 35KB
    assert tok(spark, text_tokens, big) == []


def test_keyword_whole_value_folded(spark):
    assert tok(spark, keyword_tokens, "Payment-API") == ["payment-api"]


def test_keyword_too_long_skipped(spark):
    assert tok(spark, keyword_tokens, "x" * 73) == []


def test_keyword_case_sensitive_mode(spark):
    got = tok(spark, lambda c: keyword_tokens(c, case_sensitive=True), "AbC")
    assert got == ["AbC"]


def test_path_prefixes(spark):
    assert tok(spark, path_tokens, "/my/long/path") == [
        "/my",
        "/my/long",
        "/my/long/path",
    ]


def test_path_no_leading_separator(spark):
    assert tok(spark, path_tokens, "a/b") == ["a", "a/b"]


def test_path_trailing_separator(spark):
    assert tok(spark, path_tokens, "/a/") == ["/a", "/a/"]


def test_path_single_component(spark):
    assert tok(spark, path_tokens, "solo") == ["solo"]


def test_path_double_separator(spark):
    assert tok(spark, path_tokens, "a//b") == ["a", "a/", "a//b"]


def test_path_regex_special_separator(spark):
    """F.split takes a Java regex while array_join takes a literal — a
    regex-special separator ('.') must be escaped or the prefixes bear no
    relation to the input."""
    got = tok(spark, lambda c: path_tokens(c, separator="."), "a.b.c")
    assert got == ["a", "a.b", "a.b.c"]


def test_text_partial_indexing_truncates(spark):
    """--partial-indexing for TEXT fields (the reference's
    TestTokenizePartial* vectors): an over-cap value is truncated to the
    field cap and tokenized instead of skipped."""
    from seqspark.tokenize import text_tokens

    long = "abc " + "x" * 64
    got = tok(
        spark,
        lambda c: text_tokens(c, max_field_value_length=32,
                              partial_indexing=True),
        long,
    )
    assert got == ["abc", "x" * 28]  # 32-char cut: 'abc ' + 28 x's
    # default (no partial): skipped entirely
    got = tok(
        spark,
        lambda c: text_tokens(c, max_field_value_length=32),
        long,
    )
    assert got == []
