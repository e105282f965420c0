"""Differential property suite for the transform expression compiler.

Random typed expression ASTs in the reference transform dialect are
rendered to dialect text, compiled through
``expressions/compiler.py::compile_expression``, evaluated by Spark over
randomized rows (with NULLs), and compared cell-by-cell against an
INDEPENDENT Python evaluator transcribing the reference's documented
semantics (ArithmeticFunctions.java / SystemFunctionUtils.java /
specs/{arithmetic,comparison,conditional,string}.yaml):

  * Java integer division truncates toward zero (3/2==1, -5/2==-2) and
    % takes the dividend's sign — both differ from Python's floor
    semantics, so a naive transcription genuinely diverges if the
    compiled SQL is wrong;
  * three-valued logic: NULL AND FALSE == FALSE, NULL OR TRUE == TRUE,
    NOT NULL == NULL; comparisons with a NULL operand are NULL;
  * CASE WHEN treats a NULL condition as not-taken;
  * `||` concat renders NULL operands as the string 'null'
    (Objects.toString), never nulling the result;
  * UPPER/LOWER/TRIM propagate NULL; SUBSTR is 1-based.

The r7 (schema algebra), r8 (DDL evolution) and r9 (record coercion)
differential suites each caught real bugs; this one covers the largest
remaining surface — the 1000-line expression compiler — with randomized
structure instead of the fixed 145-case spec corpus.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from flink_cdc_spark.expressions.compiler import (
    ExpressionContext,
    compile_expression,
)

SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

INT_COLS = ("a", "b", "c")
STR_COLS = ("s", "t")
BOOL_COLS = ("p", "q")

CTX = ExpressionContext(
    known_columns=frozenset(INT_COLS + STR_COLS + BOOL_COLS),
    integral_columns=frozenset(INT_COLS),
)


# -- typed AST strategies ---------------------------------------------------
# Nodes are (dialect_text, python_eval(row) -> value). The evaluator is
# built alongside the text so the model can never drift from the sample.


def _java_div(a, b):
    if a is None or b is None:
        return None
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _java_mod(a, b):
    if a is None or b is None:
        return None
    r = abs(a) % abs(b)
    return r if a >= 0 else -r


@st.composite
def int_expr(draw, depth=0):
    if depth >= 3 or draw(st.integers(0, 2)) == 0:
        if draw(st.booleans()):
            col = draw(st.sampled_from(INT_COLS))
            return col, (lambda row, c=col: row[c])
        lit = draw(st.integers(-99, 99))
        text = f"({lit})" if lit < 0 else str(lit)
        return text, (lambda row, v=lit: v)
    op = draw(st.sampled_from(["+", "-", "*", "/", "%"]))
    lt, lf = draw(int_expr(depth=depth + 1))
    if op in ("/", "%"):
        # non-zero literal divisor: the dialect (like Java) raises on /0
        d = draw(st.integers(1, 9)) * (1 if draw(st.booleans()) else -1)
        rt, rf = (f"({d})" if d < 0 else str(d)), (lambda row, v=d: v)
        fn = _java_div if op == "/" else _java_mod
        return f"({lt} {op} {rt})", (
            lambda row, lf=lf, rf=rf, fn=fn: fn(lf(row), rf(row))
        )
    rt, rf = draw(int_expr(depth=depth + 1))
    py = {"+": lambda x, y: x + y, "-": lambda x, y: x - y,
          "*": lambda x, y: x * y}[op]
    return f"({lt} {op} {rt})", (
        lambda row, lf=lf, rf=rf, py=py: None
        if lf(row) is None or rf(row) is None
        else py(lf(row), rf(row))
    )


@st.composite
def bool_expr(draw, depth=0):
    if depth >= 3 or draw(st.integers(0, 2)) == 0:
        kind = draw(st.integers(0, 1))
        if kind == 0:
            col = draw(st.sampled_from(BOOL_COLS))
            return col, (lambda row, c=col: row[c])
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]))
        lt, lf = draw(int_expr(depth=2))
        rt, rf = draw(int_expr(depth=2))
        py = {"<": lambda x, y: x < y, "<=": lambda x, y: x <= y,
              ">": lambda x, y: x > y, ">=": lambda x, y: x >= y,
              "=": lambda x, y: x == y, "<>": lambda x, y: x != y}[op]
        return f"({lt} {op} {rt})", (
            lambda row, lf=lf, rf=rf, py=py: None
            if lf(row) is None or rf(row) is None
            else py(lf(row), rf(row))
        )
    kind = draw(st.sampled_from(["and", "or", "not"]))
    lt, lf = draw(bool_expr(depth=depth + 1))
    if kind == "not":
        return f"(NOT {lt})", (
            lambda row, lf=lf: None if lf(row) is None else not lf(row)
        )
    rt, rf = draw(bool_expr(depth=depth + 1))
    if kind == "and":
        def eval_and(row, lf=lf, rf=rf):
            l, r = lf(row), rf(row)
            if l is False or r is False:
                return False
            if l is None or r is None:
                return None
            return True
        return f"({lt} AND {rt})", eval_and

    def eval_or(row, lf=lf, rf=rf):
        l, r = lf(row), rf(row)
        if l is True or r is True:
            return True
        if l is None or r is None:
            return None
        return False
    return f"({lt} OR {rt})", eval_or


@st.composite
def str_expr(draw, depth=0):
    if depth >= 2 or draw(st.integers(0, 2)) == 0:
        if draw(st.booleans()):
            col = draw(st.sampled_from(STR_COLS))
            return col, (lambda row, c=col: row[c])
        lit = draw(st.text(
            alphabet=st.characters(codec="ascii", min_codepoint=32,
                                   exclude_characters="'\\\""),
            max_size=6))
        return f"'{lit}'", (lambda row, v=lit: v)
    kind = draw(st.sampled_from(["concat", "upper", "lower", "trim", "case"]))
    if kind == "concat":
        lt, lf = draw(str_expr(depth=depth + 1))
        rt, rf = draw(str_expr(depth=depth + 1))
        # reference concat: NULL renders as the literal string 'null'
        return f"({lt} || {rt})", (
            lambda row, lf=lf, rf=rf:
            ("null" if lf(row) is None else str(lf(row)))
            + ("null" if rf(row) is None else str(rf(row)))
        )
    if kind in ("upper", "lower", "trim"):
        it, if_ = draw(str_expr(depth=depth + 1))
        py = {"upper": str.upper, "lower": str.lower,
              "trim": str.strip}[kind]
        return f"{kind.upper()}({it})", (
            lambda row, if_=if_, py=py: None
            if if_(row) is None else py(if_(row))
        )
    # CASE WHEN <bool> THEN <str> ELSE <str> END; NULL condition -> ELSE
    ct_, cf = draw(bool_expr(depth=2))
    tt, tf = draw(str_expr(depth=depth + 1))
    et, ef = draw(str_expr(depth=depth + 1))
    return f"(CASE WHEN {ct_} THEN {tt} ELSE {et} END)", (
        lambda row, cf=cf, tf=tf, ef=ef:
        tf(row) if cf(row) is True else ef(row)
    )


def _rows(draw_ints, draw_strs, draw_bools):
    return [
        {
            "a": draw_ints[i][0], "b": draw_ints[i][1], "c": draw_ints[i][2],
            "s": draw_strs[i][0], "t": draw_strs[i][1],
            "p": draw_bools[i][0], "q": draw_bools[i][1],
        }
        for i in range(len(draw_ints))
    ]


_int_vals = st.one_of(st.none(), st.integers(-999, 999))
_str_vals = st.one_of(st.none(), st.text(
    alphabet=st.characters(codec="ascii", min_codepoint=32,
                           exclude_characters="'\\\""),
    max_size=5))
_bool_vals = st.one_of(st.none(), st.booleans())

rows_strategy = st.integers(3, 8).flatmap(
    lambda n: st.tuples(
        st.lists(st.tuples(_int_vals, _int_vals, _int_vals),
                 min_size=n, max_size=n),
        st.lists(st.tuples(_str_vals, _str_vals), min_size=n, max_size=n),
        st.lists(st.tuples(_bool_vals, _bool_vals), min_size=n, max_size=n),
    )
)


def _run(spark, rows, text, out_type):
    df = spark.createDataFrame(
        [(r["a"], r["b"], r["c"], r["s"], r["t"], r["p"], r["q"])
         for r in rows],
        "a bigint, b bigint, c bigint, s string, t string, "
        "p boolean, q boolean",
    )
    sql = compile_expression(text, CTX)
    return [r["out"] for r in
            df.selectExpr(f"cast(({sql}) as {out_type}) AS out").collect()]


@SETTINGS
@given(st.data())
def test_int_expressions_match_java_model(spark, data):
    text, ev = data.draw(int_expr())
    ints, strs, bools = data.draw(rows_strategy)
    rows = _rows(ints, strs, bools)
    got = _run(spark, rows, text, "bigint")
    expect = [ev(r) for r in rows]
    assert got == expect, f"expr {text}: {got} != {expect}"


@SETTINGS
@given(st.data())
def test_bool_expressions_match_3vl_model(spark, data):
    text, ev = data.draw(bool_expr())
    ints, strs, bools = data.draw(rows_strategy)
    rows = _rows(ints, strs, bools)
    got = _run(spark, rows, text, "boolean")
    expect = [ev(r) for r in rows]
    assert got == expect, f"expr {text}: {got} != {expect}"


@SETTINGS
@given(st.data())
def test_str_expressions_match_reference_model(spark, data):
    text, ev = data.draw(str_expr())
    ints, strs, bools = data.draw(rows_strategy)
    rows = _rows(ints, strs, bools)
    got = _run(spark, rows, text, "string")
    expect = [ev(r) for r in rows]
    assert got == expect, f"expr {text}: {got} != {expect}"
