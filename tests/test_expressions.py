"""Expression compiler tests: dialect -> Spark SQL translation."""

import pytest

from flink_cdc_spark.expressions.compiler import (
    CompileError,
    ExpressionCompiler,
    ExpressionContext,
    compile_expression,
    referenced_columns,
    similar_to_regex,
)
from flink_cdc_spark.expressions.parser import ParseError, parse
from flink_cdc_spark.expressions.projection import parse_projection


def c(text, **ctx_kwargs):
    return compile_expression(text, ExpressionContext(**ctx_kwargs) if ctx_kwargs else None)


# -- parsing ------------------------------------------------------------------


def test_parse_precedence():
    ast = parse("a + b * c")
    assert ast == ("binop", "+", ("col", "a"), ("binop", "*", ("col", "b"), ("col", "c")))


def test_parse_errors():
    with pytest.raises(ParseError):
        parse("a +")
    with pytest.raises(ParseError):
        parse("foo(")
    with pytest.raises(ParseError):
        parse("a b c")


# -- basic rendering ----------------------------------------------------------


def test_arithmetic_and_comparison():
    assert c("a + b * 2") == "(`a` + (`b` * 2))"
    assert c("a <> 3") == "(`a` <> 3)"
    assert c("id > 10 AND order_id > 100") == "((`id` > 10) AND (`order_id` > 100))"


def test_strict_null_comparisons():
    assert c("a = b", strict_nulls=True) == "ifnull((`a` = `b`), false)"
    assert c("a = b") == "(`a` = `b`)"


def test_concat_operator():
    # reference concat stringifies NULL operands as 'null' (specs/string.yaml)
    inner = "concat(coalesce(cast(`a` AS string), 'null'), coalesce(cast(`b` AS string), 'null'))"
    assert c("a || b || 'x'") == (
        f"concat(coalesce(cast({inner} AS string), 'null'), "
        "coalesce(cast('x' AS string), 'null'))"
    )


def test_is_predicates():
    assert c("a IS NULL") == "(`a` IS NULL)"
    assert c("a IS NOT TRUE") == "(`a` IS NOT TRUE)"
    assert c("a IS NOT DISTINCT FROM b") == "(`a` <=> `b`)"
    assert c("a IS DISTINCT FROM b") == "(NOT (`a` <=> `b`))"


def test_between_in():
    assert c("a BETWEEN 1 AND 5") == "(`a` BETWEEN 1 AND 5)"
    assert c("a NOT IN (1, 2, 3)") == "(NOT (`a` IN (1, 2, 3)))"


def test_like_java_regex_semantics():
    # no ESCAPE -> RLIKE (Java regex substring match)
    assert c("s LIKE 'ab+c'") == "(`s` RLIKE 'ab+c')"
    # with ESCAPE -> standard SQL LIKE
    assert c("s LIKE 'a\\%b' ESCAPE '\\'") == "(`s` LIKE 'a\\\\%b' ESCAPE '\\\\')"


def test_similar_to_rewrite():
    assert similar_to_regex("ab%") == "ab.*"
    assert similar_to_regex("a_c") == "a.c"
    assert similar_to_regex("10$.5") == "10\\$\\.5"
    assert c("s SIMILAR TO 'ab%'") == "(`s` RLIKE '^(?:ab.*)$')"


def test_case_forms():
    assert (
        c("CASE WHEN a > 1 THEN 'hi' ELSE 'lo' END")
        == "(CASE WHEN (`a` > 1) THEN 'hi' ELSE 'lo' END)"
    )
    assert c("CASE a WHEN 1 THEN 'x' END") == "(CASE `a` WHEN 1 THEN 'x' END)"
    assert (
        c("CASE a WHEN 1, 2 THEN 'x' ELSE 'y' END")
        == "(CASE WHEN (`a` = 1 OR `a` = 2) THEN 'x' ELSE 'y' END)"
    )


def test_cast_type_names():
    # casts are lenient (try_cast) with Java narrowing for integrals and
    # strict temporal casts (specs/casting.yaml semantics)
    assert "AS tinyint" in c("CAST(a AS BYTE)") and "% 256" in c("CAST(a AS BYTE)")
    assert "% 4294967296" in c("CAST(a AS INTEGER)")
    assert c("CAST(a AS DECIMAL(10, 2))") == "try_cast(`a` AS decimal(10,2))"
    assert c("CAST(a AS STRING)") == "try_cast(`a` AS string)"
    assert c("CAST(a AS TIMESTAMP)") == "CAST(`a` AS timestamp_ntz)"


def test_subscript_one_based():
    assert c("arr[1]") == "try_element_at(`arr`, 1)"
    assert c("m['k']") == "try_element_at(`m`, 'k')"


def test_string_functions():
    assert c("SUBSTRING(s FROM 2 FOR 3)") == "substring(`s`, 2, 3)"
    assert c("POSITION('x' IN s)") == "position('x', `s`)"
    assert c("OVERLAY(s PLACING 'ab' FROM 2)") == "overlay(`s`, 'ab', 2)"
    assert c("TRIM(BOTH FROM s)") == "trim(`s`)"
    assert c("TRIM(LEADING 'x' FROM s)") == "ltrim('x', `s`)"
    assert c("REGEXP_EXTRACT(s, 'a(b)')") == "regexp_extract(`s`, 'a(b)', 0)"
    assert c("TO_BASE64(s)") == "base64(`s`)"
    assert c("FROM_BASE64(s)") == "decode(unbase64(`s`), 'UTF-8')"


def test_temporal_functions_frozen_time():
    ctx = ExpressionContext(epoch_timestamp_sql="timestamp'2026-01-02 03:04:05'")
    comp = ExpressionCompiler(ctx)
    assert comp.compile("NOW()") == "(timestamp'2026-01-02 03:04:05')"
    assert comp.compile("CURRENT_TIMESTAMP") == "(timestamp'2026-01-02 03:04:05')"
    assert comp.compile("CURRENT_DATE") == "CAST(timestamp'2026-01-02 03:04:05' AS DATE)"
    assert comp.compile("UNIX_TIMESTAMP()") == "unix_timestamp(timestamp'2026-01-02 03:04:05')"


def test_temporal_translation():
    assert c("DATE_FORMAT(ts, 'yyyy-MM-dd')") == "date_format(`ts`, 'yyyy-MM-dd')"
    assert c("TIMESTAMPDIFF(DAY, a, b)") == "timestampdiff(DAY, `a`, `b`)"
    assert c("TO_TIMESTAMP('2020-01-01 00:00:00')") == "to_timestamp_ntz('2020-01-01 00:00:00')"
    assert c("DATE_ADD(d, 3)") == "date_add(`d`, 3)"


def test_metadata_bindings():
    ctx = ExpressionContext(
        column_bindings={
            "__table_name__": "`__tbl`",
            "__data_event_type__": "`__op`",
        }
    )
    comp = ExpressionCompiler(ctx)
    assert comp.compile("__table_name__ || '!'") == (
        "concat(coalesce(cast(`__tbl` AS string), 'null'), "
        "coalesce(cast('!' AS string), 'null'))"
    )
    with pytest.raises(CompileError):
        comp.compile("__unknown_meta__")


def test_unknown_column_check():
    ctx = ExpressionContext(known_columns=frozenset({"a", "b"}))
    comp = ExpressionCompiler(ctx)
    assert comp.compile("a + b")
    with pytest.raises(CompileError) as ei:
        comp.compile("a + nope")
    assert "not found" in str(ei.value)


def test_referenced_columns():
    assert referenced_columns("a + b * 2") == {"a", "b"}
    assert referenced_columns("UPPER(name) || __table_name__") == {"name"}
    assert referenced_columns("CASE WHEN x > 1 THEN y ELSE z END") == {"x", "y", "z"}


# -- projection parsing ---------------------------------------------------------


def test_parse_projection_basic():
    cols = parse_projection("id, order_id, UPPER(product_name) as product_name")
    assert [p.output_name for p in cols] == ["id", "order_id", "product_name"]
    assert cols[0].is_passthrough and not cols[2].is_passthrough


def test_parse_projection_wildcard():
    cols = parse_projection(r"\*, UPPER(name) AS uname")
    assert cols[0].is_wildcard
    assert cols[1].output_name == "uname"


def test_parse_projection_implicit_alias():
    cols = parse_projection("a || b identifier_name")
    assert cols[0].output_name == "identifier_name"


def test_parse_projection_computed_requires_alias():
    with pytest.raises(ParseError):
        parse_projection("UPPER(name)")


def test_nested_integer_division_java_semantics():
    """Round-5 fix pin: '/' over integral operands is itself integral, so
    nested divisions apply Java int-div at EVERY level (7/2/2 == 1)."""
    ic = frozenset({"a", "b"})
    assert c("a / b / 2", integral_columns=ic) == "((`a` div `b`) div 2)"
    assert c("7 / 2 / 2", integral_columns=ic) == "((7 div 2) div 2)"
    # negation keeps integrality
    assert c("-a / 2", integral_columns=ic) == "((- `a`) div 2)"
    # a fractional operand anywhere poisons the whole chain to `/`
    assert c("a / 2.0 / 2", integral_columns=ic) == "((`a` / 2.0) / 2)"
    assert c("a / b / 2.0", integral_columns=ic) == "((`a` div `b`) / 2.0)"
