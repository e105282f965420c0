"""Differential test for the dialect decimal storage semantics
(expressions/compiler.py compile_stored): the compiled Spark SQL must
reproduce, value-for-value, a pure-Python model of the reference's
pipeline — Java BigDecimal natural-scale computation (divide truncates at
the lhs scale, ROUND is HALF_UP), Calcite declared-type derivation with
the 19-digit precision clamp, and the storage boundary's unscaled-long
reinterpretation (p<=18: value kept, reinterpreted at the declared scale;
p=19: NULL when digits exceed the precision after the serializer
round-trip). 200 seeded random rows per expression."""

import decimal
import random

from pyspark.sql import functions as F, types as T

from flink_cdc_spark.expressions.compiler import (
    ExpressionCompiler,
    ExpressionContext,
)

D = decimal.Decimal
DEC_MAX = 19


# ---------------------------------------------------------------------------
# pure-Python model of the reference semantics
# ---------------------------------------------------------------------------


def _digits(u: int) -> int:
    return len(str(abs(u))) if u else 1


def _derive(op, lt, rt):
    # operand types pass through Calcite's type factory first, which
    # clamps precision to 19 (a DECIMAL(20,2) column derives as (19,2))
    (p1, s1), (p2, s2) = (min(lt[0], DEC_MAX), lt[1]), (min(rt[0], DEC_MAX), rt[1])
    if op in "+-":
        s = max(s1, s2)
        return (min(max(p1 - s1, p2 - s2) + s + 1, DEC_MAX), s)
    if op == "*":
        return (min(p1 + p2, DEC_MAX), s1 + s2)
    int_digits = p1 - s1 + s2
    s = max(6, s1 + p2 + 1)
    p = int_digits + s
    if p > DEC_MAX:
        p, s = DEC_MAX, max(DEC_MAX - int_digits, 0)
    return (p, s)


def _store(e_java: D, s_java: int, declared) -> D | None:
    p_d, s_d = declared
    u = int(e_java.scaleb(s_java))
    if p_d > 18 and _digits(u) > p_d:
        return None
    return D(u).scaleb(-s_d)


def model_binop(op, l: D, r: D, lt, rt):
    if l is None or r is None:
        return None
    declared = _derive(op, lt, rt)
    s1, s2 = lt[1], rt[1]
    if op == "+":
        e, s_j = l + r, max(s1, s2)
    elif op == "-":
        e, s_j = l - r, max(s1, s2)
    elif op == "*":
        e, s_j = l * r, s1 + s2
    else:  # Java divide: lhs scale, RoundingMode.DOWN
        s_j = s1
        e = (l / r).quantize(D(1).scaleb(-s1), rounding=decimal.ROUND_DOWN)
    return _store(e, s_j, declared)


def model_round(l: D, lt, r: int):
    if l is None:
        return None
    p, s = lt
    declared = (p, s) if r >= s else (min(p - s + r + 1, DEC_MAX), r)
    e = l.quantize(D(1).scaleb(-r), rounding=decimal.ROUND_HALF_UP)
    return _store(e, r, declared)


def model_abs(l: D, lt):
    if l is None:
        return None
    return _store(abs(l), lt[1], (min(lt[0], DEC_MAX), lt[1]))


# ---------------------------------------------------------------------------
# the differential run
# ---------------------------------------------------------------------------

A_T, B_T = (20, 2), (10, 0)  # column types: a DECIMAL(20,2), b DECIMAL(10,0)

CASES = [
    ("a + CAST(1 AS DECIMAL(1,0))", lambda a, b: model_binop("+", a, D(1), A_T, (1, 0))),
    ("a - CAST(7 AS DECIMAL(1,0))", lambda a, b: model_binop("-", a, D(7), A_T, (1, 0))),
    ("a * CAST(3 AS DECIMAL(1,0))", lambda a, b: model_binop("*", a, D(3), A_T, (1, 0))),
    ("a / CAST(3 AS DECIMAL(1,0))", lambda a, b: model_binop("/", a, D(3), A_T, (1, 0))),
    ("b / CAST(7 AS DECIMAL(1,0))", lambda a, b: model_binop("/", b, D(7), B_T, (1, 0))),
    ("b + CAST(99 AS DECIMAL(2,0))", lambda a, b: model_binop("+", b, D(99), B_T, (2, 0))),
    ("ROUND(a, 1)", lambda a, b: model_round(a, A_T, 1)),
    ("ROUND(b, 1)", lambda a, b: model_round(b, B_T, 1)),
    ("ABS(a)", lambda a, b: model_abs(a, A_T)),
]


def _rand_decimal(rng, p, s):
    if rng.random() < 0.05:
        return None
    # bias toward the precision boundary where the overflow rules bite
    digits = rng.choice([p, p, p - 1, rng.randint(1, p)])
    u = rng.randint(0, 10**digits - 1) * rng.choice([1, -1])
    return D(u).scaleb(-s)


def test_decimal_storage_semantics_match_reference_model(spark):
    rng = random.Random(20260813)
    rows = [
        (i, _rand_decimal(rng, *A_T), _rand_decimal(rng, *B_T))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("i", T.IntegerType()),
                T.StructField("a", T.DecimalType(*A_T)),
                T.StructField("b", T.DecimalType(*B_T)),
            ]
        ),
    )
    comp = ExpressionCompiler(
        ExpressionContext(decimal_columns={"a": A_T, "b": B_T})
    )
    cols = [F.col("i")]
    for idx, (expr_text, _) in enumerate(CASES):
        cols.append(F.expr(comp.compile_stored(expr_text)).alias(f"c{idx}"))
    got = {r["i"]: r for r in df.select(*cols).collect()}

    mismatches = []
    for i, a, b in rows:
        for idx, (expr_text, model) in enumerate(CASES):
            want = model(a, b)
            have = got[i][f"c{idx}"]
            have_d = D(str(have)) if have is not None else None
            ok = (
                (want is None and have_d is None)
                or (want is not None and have_d is not None and want == have_d)
            )
            if not ok:
                mismatches.append((expr_text, a, b, want, have_d))
    assert not mismatches, mismatches[:5]
