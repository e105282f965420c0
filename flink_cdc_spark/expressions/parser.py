"""Pratt parser for the Flink-CDC transform expression dialect -> AST.

Grammar per the reference's Calcite operator table
(runtime/parser/metadata/TransformSqlOperatorTable.java:91-713) and the
function doc (docs/content/docs/core-concept/transform.md:111-279):
scalar expressions with AND/OR/NOT, comparison and IS-predicates,
[NOT] BETWEEN / LIKE / SIMILAR TO / IN, CASE (both forms), CAST,
function calls (incl. SUBSTRING FROM/FOR, OVERLAY PLACING, POSITION IN,
TRIM spec), 1-based subscript access, and || concatenation.

AST = nested tuples, first element is the node kind:
    ('lit_num', text) ('lit_str', s) ('lit_bool', b) ('lit_null',)
    ('col', name) ('star',)
    ('binop', op, l, r)      arithmetic / comparison / concat
    ('and', l, r) ('or', l, r) ('not', e) ('neg', e)
    ('is', e, what, negated)       what: 'NULL'|'TRUE'|'FALSE'|'UNKNOWN'
    ('is_distinct', l, r, negated)
    ('between', e, lo, hi, negated)
    ('like', e, pat, esc_or_None, negated)
    ('similar', e, pat, esc_or_None, negated)
    ('in', e, [items], negated)
    ('case_when', [(cond, res), ...], else_or_None)
    ('case_value', value, [([v1, v2...], res), ...], else_or_None)
    ('cast', e, type_text)
    ('call', name_upper, [args])
    ('subscript', e, index_expr)
"""

from __future__ import annotations

from .lexer import Token, tokenize


class ParseError(ValueError):
    pass


# binding powers
_BP = {
    "OR": 10,
    "AND": 20,
    "NOT_PREFIX": 25,
    "COMPARISON": 30,  # = <> > >= < <= IS, BETWEEN, LIKE, IN, SIMILAR
    "||": 40,
    "+": 50,
    "-": 50,
    "*": 60,
    "/": 60,
    "%": 60,
    "UNARY": 70,
    "SUBSCRIPT": 80,
}


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.tokens = tokenize(text)
        self.i = 0

    # -- token helpers --------------------------------------------------------
    def peek(self, offset: int = 0) -> Token:
        return self.tokens[min(self.i + offset, len(self.tokens) - 1)]

    def next(self) -> Token:
        t = self.tokens[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, value=None) -> Token:
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise ParseError(
                f"Expected {value or kind} but got {t.value!r} at {t.pos} in {self.text!r}"
            )
        return t

    def accept(self, kind: str, value=None) -> bool:
        t = self.peek()
        if t.kind == kind and (value is None or t.value == value):
            self.i += 1
            return True
        return False

    def at_keyword(self, *words) -> bool:
        t = self.peek()
        return t.kind == "KEYWORD" and t.value in words

    # -- entry points ----------------------------------------------------------
    def parse_expression(self):
        e = self.parse_expr(0)
        return e

    def parse_full(self):
        e = self.parse_expr(0)
        if self.peek().kind != "EOF":
            t = self.peek()
            raise ParseError(f"Unexpected trailing {t.value!r} at {t.pos} in {self.text!r}")
        return e

    # -- Pratt core -------------------------------------------------------------
    def parse_expr(self, min_bp: int):
        left = self.parse_prefix()
        while True:
            t = self.peek()
            if t.kind == "EOF":
                return left
            # postfix subscript
            if t.kind == "OP" and t.value == "[" and _BP["SUBSCRIPT"] >= min_bp:
                self.next()
                idx = self.parse_expr(0)
                self.expect("OP", "]")
                left = ("subscript", left, idx)
                continue
            # boolean connectives
            if t.kind == "KEYWORD" and t.value == "OR":
                if _BP["OR"] < min_bp:
                    return left
                self.next()
                left = ("or", left, self.parse_expr(_BP["OR"] + 1))
                continue
            if t.kind == "KEYWORD" and t.value == "AND":
                if _BP["AND"] < min_bp:
                    return left
                self.next()
                left = ("and", left, self.parse_expr(_BP["AND"] + 1))
                continue
            # IS / BETWEEN / LIKE / SIMILAR / IN (optionally NOT-prefixed)
            if t.kind == "KEYWORD" and t.value in ("IS", "BETWEEN", "LIKE", "SIMILAR", "IN", "NOT"):
                if _BP["COMPARISON"] < min_bp:
                    return left
                left = self.parse_predicate_suffix(left)
                continue
            # binary ops
            if t.kind == "OP" and t.value in ("=", "<>", "!=", ">", ">=", "<", "<="):
                if _BP["COMPARISON"] < min_bp:
                    return left
                self.next()
                op = "<>" if t.value == "!=" else t.value
                left = ("binop", op, left, self.parse_expr(_BP["COMPARISON"] + 1))
                continue
            if t.kind == "OP" and t.value == "||":
                if _BP["||"] < min_bp:
                    return left
                self.next()
                left = ("binop", "||", left, self.parse_expr(_BP["||"] + 1))
                continue
            if t.kind == "OP" and t.value in ("+", "-", "*", "/", "%"):
                bp = _BP[t.value]
                if bp < min_bp:
                    return left
                self.next()
                left = ("binop", t.value, left, self.parse_expr(bp + 1))
                continue
            return left

    def parse_predicate_suffix(self, left):
        if self.accept("KEYWORD", "IS"):
            negated = bool(self.accept("KEYWORD", "NOT"))
            if self.accept("KEYWORD", "NULL"):
                return ("is", left, "NULL", negated)
            if self.accept("KEYWORD", "TRUE"):
                return ("is", left, "TRUE", negated)
            if self.accept("KEYWORD", "FALSE"):
                return ("is", left, "FALSE", negated)
            if self.accept("KEYWORD", "UNKNOWN"):
                return ("is", left, "UNKNOWN", negated)
            if self.accept("KEYWORD", "DISTINCT"):
                self.expect("KEYWORD", "FROM")
                right = self.parse_expr(_BP["COMPARISON"] + 1)
                return ("is_distinct", left, right, negated)
            t = self.peek()
            raise ParseError(f"Unexpected token after IS: {t.value!r} in {self.text!r}")
        negated = bool(self.accept("KEYWORD", "NOT"))
        if self.accept("KEYWORD", "BETWEEN"):
            lo = self.parse_expr(_BP["COMPARISON"] + 1)
            self.expect("KEYWORD", "AND")
            hi = self.parse_expr(_BP["COMPARISON"] + 1)
            return ("between", left, lo, hi, negated)
        if self.accept("KEYWORD", "LIKE"):
            pat = self.parse_expr(_BP["COMPARISON"] + 1)
            esc = None
            if self.accept("KEYWORD", "ESCAPE"):
                esc = self.parse_expr(_BP["COMPARISON"] + 1)
            return ("like", left, pat, esc, negated)
        if self.accept("KEYWORD", "SIMILAR"):
            self.expect("KEYWORD", "TO")
            pat = self.parse_expr(_BP["COMPARISON"] + 1)
            esc = None
            if self.accept("KEYWORD", "ESCAPE"):
                esc = self.parse_expr(_BP["COMPARISON"] + 1)
            return ("similar", left, pat, esc, negated)
        if self.accept("KEYWORD", "IN"):
            self.expect("OP", "(")
            items = [self.parse_expr(0)]
            while self.accept("OP", ","):
                items.append(self.parse_expr(0))
            self.expect("OP", ")")
            return ("in", left, items, negated)
        t = self.peek()
        raise ParseError(f"Expected predicate after NOT, got {t.value!r} in {self.text!r}")

    # -- prefix ------------------------------------------------------------------
    def parse_prefix(self):
        t = self.next()
        if t.kind == "NUMBER":
            return ("lit_num", t.value)
        if t.kind == "STRING":
            return ("lit_str", t.value)
        if t.kind == "KEYWORD":
            if t.value == "NULL":
                return ("lit_null",)
            if t.value == "TRUE":
                return ("lit_bool", True)
            if t.value == "FALSE":
                return ("lit_bool", False)
            if t.value == "NOT":
                return ("not", self.parse_expr(_BP["NOT_PREFIX"]))
            if t.value == "CASE":
                return self.parse_case()
            if t.value == "CAST":
                return self.parse_cast()
            if t.value in ("SUBSTRING", "OVERLAY", "POSITION", "TRIM"):
                return self.parse_special_function(t.value)
            # keywords usable as niladic function-ish identifiers are not in
            # KEYWORDS; anything else is unexpected
            raise ParseError(f"Unexpected keyword {t.value} at {t.pos} in {self.text!r}")
        if t.kind == "OP":
            if t.value == "(":
                e = self.parse_expr(0)
                self.expect("OP", ")")
                return e
            if t.value == "-":
                return ("neg", self.parse_expr(_BP["UNARY"]))
            if t.value == "+":
                return self.parse_expr(_BP["UNARY"])
            if t.value == "*":
                return ("star",)
            raise ParseError(f"Unexpected operator {t.value!r} at {t.pos} in {self.text!r}")
        if t.kind == "IDENT":
            # function call?
            if self.peek().kind == "OP" and self.peek().value == "(":
                self.next()
                args = []
                if not (self.peek().kind == "OP" and self.peek().value == ")"):
                    args.append(self.parse_expr(0))
                    while self.accept("OP", ","):
                        args.append(self.parse_expr(0))
                self.expect("OP", ")")
                return ("call", t.value.upper(), args)
            return ("col", t.value)
        raise ParseError(f"Unexpected token {t.value!r} at {t.pos} in {self.text!r}")

    def parse_case(self):
        if self.at_keyword("WHEN"):
            whens = []
            while self.accept("KEYWORD", "WHEN"):
                cond = self.parse_expr(0)
                self.expect("KEYWORD", "THEN")
                whens.append((cond, self.parse_expr(0)))
            else_e = self.parse_expr(0) if self.accept("KEYWORD", "ELSE") else None
            self.expect("KEYWORD", "END")
            return ("case_when", whens, else_e)
        value = self.parse_expr(0)
        whens = []
        while self.accept("KEYWORD", "WHEN"):
            vals = [self.parse_expr(0)]
            while self.accept("OP", ","):
                vals.append(self.parse_expr(0))
            self.expect("KEYWORD", "THEN")
            whens.append((vals, self.parse_expr(0)))
        else_e = self.parse_expr(0) if self.accept("KEYWORD", "ELSE") else None
        self.expect("KEYWORD", "END")
        return ("case_value", value, whens, else_e)

    def parse_cast(self):
        self.expect("OP", "(")
        e = self.parse_expr(0)
        self.expect("KEYWORD", "AS")
        type_text = self.parse_type_text()
        self.expect("OP", ")")
        return ("cast", e, type_text)

    def parse_type_text(self) -> str:
        """Consume a type name with optional (args) / <args> and NOT NULL."""
        parts = []
        t = self.next()
        if t.kind not in ("IDENT", "KEYWORD"):
            raise ParseError(f"Expected type name, got {t.value!r} in {self.text!r}")
        parts.append(t.value)
        if self.peek().kind == "OP" and self.peek().value == "(":
            self.next()
            parts.append("(")
            depth = 1
            while depth:
                t = self.next()
                if t.kind == "EOF":
                    raise ParseError(f"Unterminated type args in {self.text!r}")
                if t.kind == "OP" and t.value == "(":
                    depth += 1
                if t.kind == "OP" and t.value == ")":
                    depth -= 1
                    if depth == 0:
                        break
                parts.append(t.value)
            parts.append(")")
        if self.at_keyword("NOT"):
            save = self.i
            self.next()
            if self.accept("KEYWORD", "NULL"):
                parts.append(" NOT NULL")
            else:
                self.i = save
        return "".join(parts)

    def parse_special_function(self, name: str):
        """SQL special syntaxes: SUBSTRING(x FROM i [FOR n]),
        OVERLAY(x PLACING y FROM i [FOR n]), POSITION(x IN y [FROM i]),
        TRIM([BOTH|LEADING|TRAILING] [chars] FROM x). All also accept the
        plain comma-call form."""
        self.expect("OP", "(")
        if name == "TRIM":
            spec = "BOTH"
            if self.at_keyword("BOTH", "LEADING", "TRAILING"):
                spec = self.next().value
            if self.at_keyword("FROM"):
                self.next()
                e = self.parse_expr(0)
                self.expect("OP", ")")
                return ("call", "TRIM_SPEC", [("lit_str", spec), ("lit_str", " "), e])
            first = self.parse_expr(0)
            if self.accept("KEYWORD", "FROM"):
                e = self.parse_expr(0)
                self.expect("OP", ")")
                return ("call", "TRIM_SPEC", [("lit_str", spec), first, e])
            args = [first]
            while self.accept("OP", ","):
                args.append(self.parse_expr(0))
            self.expect("OP", ")")
            return ("call", "TRIM", args)
        if name == "POSITION":
            needle = self.parse_expr(_BP["COMPARISON"] + 1)
            if self.accept("KEYWORD", "IN"):
                hay = self.parse_expr(0)
                start = None
                if self.accept("KEYWORD", "FROM"):
                    start = self.parse_expr(0)
                self.expect("OP", ")")
                args = [needle, hay] + ([start] if start else [])
                return ("call", "POSITION", args)
            args = [needle]
            while self.accept("OP", ","):
                args.append(self.parse_expr(0))
            self.expect("OP", ")")
            return ("call", "POSITION", args)
        if name == "OVERLAY":
            s1 = self.parse_expr(0)
            if self.accept("KEYWORD", "PLACING"):
                s2 = self.parse_expr(0)
                self.expect("KEYWORD", "FROM")
                start = self.parse_expr(0)
                length = None
                if self.accept("KEYWORD", "FOR"):
                    length = self.parse_expr(0)
                self.expect("OP", ")")
                args = [s1, s2, start] + ([length] if length else [])
                return ("call", "OVERLAY", args)
            args = [s1]
            while self.accept("OP", ","):
                args.append(self.parse_expr(0))
            self.expect("OP", ")")
            return ("call", "OVERLAY", args)
        if name == "SUBSTRING":
            s = self.parse_expr(0)
            if self.accept("KEYWORD", "FROM"):
                start = self.parse_expr(0)
                length = None
                if self.accept("KEYWORD", "FOR"):
                    length = self.parse_expr(0)
                self.expect("OP", ")")
                args = [s, start] + ([length] if length else [])
                return ("call", "SUBSTRING", args)
            args = [s]
            while self.accept("OP", ","):
                args.append(self.parse_expr(0))
            self.expect("OP", ")")
            return ("call", "SUBSTRING", args)
        raise ParseError(f"Unhandled special function {name}")


def parse(text: str):
    return Parser(text).parse_full()
