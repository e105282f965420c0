"""Projection-clause parsing: "col, expr AS alias, *" -> ProjectionColumn list.

Analog of the reference's TransformParser projection handling
(runtime/parser/TransformParser.java) including the wildcard semantics of
PreTransform/PostTransform (transform.md:301-313): `*` (written `\\*` at
clause start in YAML) expands to all upstream physical columns in order; an
explicitly projected column with the same name as an upstream column
replaces it in place.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .lexer import tokenize
from .parser import ParseError, Parser


@dataclass(frozen=True)
class ProjectionColumn:
    output_name: str  # column name in the output schema
    expression_ast: tuple  # AST from parser.parse
    expression_text: str  # original dialect text (for error messages)
    is_wildcard: bool = False  # the bare *
    is_passthrough: bool = False  # bare column reference without alias


def parse_projection(projection: str) -> list:
    """Split a projection clause on top-level commas and parse each item."""
    if projection is None:
        return []
    text = projection.strip()
    if text.startswith("\\*"):  # YAML-escaped leading wildcard
        text = text[1:]
    items = _split_top_level_commas(text)
    out = []
    for item in items:
        item = item.strip()
        if item.startswith("\\*"):
            item = item[1:]
        if item == "*":
            out.append(ProjectionColumn("*", ("star",), "*", is_wildcard=True))
            continue
        expr_text, alias = _split_alias(item)
        p = Parser(expr_text)
        ast = p.parse_full()
        if alias is None:
            if ast[0] == "col":
                out.append(ProjectionColumn(ast[1], ast, expr_text, is_passthrough=True))
            else:
                raise ParseError(
                    f"Projection item {item!r} needs an alias (AS name) because it "
                    "is a computed expression"
                )
        else:
            out.append(ProjectionColumn(alias, ast, expr_text))
    return out


def _split_top_level_commas(text: str) -> list:
    """Comma split that respects (), [], and '...' nesting."""
    parts = []
    depth = 0
    cur = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            cur.append(text[i : j + 1])
            i = j + 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur))
    return [p for p in (s.strip() for s in parts) if p]


def _split_alias(item: str):
    """Split 'expr AS alias' or 'expr alias' (implicit alias) forms.

    The implicit form is only recognized when the tail is a single
    identifier token and the head parses as a complete expression."""
    tokens = tokenize(item)
    # find a top-level AS
    depth = 0
    for idx, t in enumerate(tokens):
        if t.kind == "OP" and t.value in ("(", "["):
            depth += 1
        elif t.kind == "OP" and t.value in (")", "]"):
            depth -= 1
        elif t.kind == "KEYWORD" and t.value == "AS" and depth == 0:
            expr_text = item[: t.pos].strip()
            alias_tokens = tokens[idx + 1 :]
            if len(alias_tokens) != 2 or alias_tokens[0].kind != "IDENT":
                raise ParseError(f"Expected a single alias identifier after AS in {item!r}")
            return expr_text, alias_tokens[0].value
    # implicit alias: ... ident (EOF), where ident isn't part of the expression
    if (
        len(tokens) >= 3
        and tokens[-2].kind == "IDENT"
        and tokens[-3].kind in ("IDENT", "NUMBER", "STRING")
        or (len(tokens) >= 3 and tokens[-2].kind == "IDENT" and tokens[-3].kind == "OP"
            and tokens[-3].value in (")", "]"))
    ):
        expr_text = item[: tokens[-2].pos].strip()
        try:
            Parser(expr_text).parse_full()
            return expr_text, tokens[-2].value
        except ParseError:
            pass
    return item, None
