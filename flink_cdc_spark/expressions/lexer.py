"""Tokenizer for the Flink-CDC transform expression dialect.

The dialect is the SQL expression subset accepted by the reference's
Calcite parser (runtime/parser/TransformParser.java) — scalar expressions
over column identifiers, with function calls, CASE/CAST/BETWEEN/LIKE/IN
constructs. This lexer feeds the Pratt parser in parser.py.
"""

from __future__ import annotations

from dataclasses import dataclass

KEYWORDS = {
    "AND",
    "OR",
    "NOT",
    "IS",
    "NULL",
    "TRUE",
    "FALSE",
    "UNKNOWN",
    "BETWEEN",
    "LIKE",
    "SIMILAR",
    "TO",
    "ESCAPE",
    "IN",
    "CASE",
    "WHEN",
    "THEN",
    "ELSE",
    "END",
    "CAST",
    "AS",
    "DISTINCT",
    "FROM",
    "FOR",
    "PLACING",
    "OVERLAY",
    "POSITION",
    "SUBSTRING",
    "TRIM",
    "BOTH",
    "LEADING",
    "TRAILING",
    "INTERVAL",
}


@dataclass
class Token:
    kind: str  # IDENT | NUMBER | STRING | OP | KEYWORD | EOF
    value: str
    pos: int


class LexError(ValueError):
    pass


_TWO_CHAR_OPS = {"<>", "<=", ">=", "!=", "||"}
_ONE_CHAR_OPS = set("+-*/%(),.[]<>=")


def tokenize(text: str) -> list:
    tokens = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        # string literal (single quotes, '' escapes a quote)
        if ch == "'":
            j = i + 1
            buf = []
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(text[j])
                j += 1
            if j >= n:
                raise LexError(f"Unterminated string literal at {i} in {text!r}")
            tokens.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        # backquoted identifier
        if ch == "`":
            j = text.find("`", i + 1)
            if j < 0:
                raise LexError(f"Unterminated quoted identifier at {i} in {text!r}")
            tokens.append(Token("IDENT", text[i + 1 : j], i))
            i = j + 1
            continue
        # number
        if ch.isdigit() or (ch == "." and i + 1 < n and text[i + 1].isdigit()):
            j = i
            seen_dot = False
            seen_exp = False
            while j < n:
                c = text[j]
                if c.isdigit():
                    j += 1
                elif c == "." and not seen_dot and not seen_exp:
                    seen_dot = True
                    j += 1
                elif c in "eE" and not seen_exp and j > i:
                    seen_exp = True
                    j += 1
                    if j < n and text[j] in "+-":
                        j += 1
                else:
                    break
            tokens.append(Token("NUMBER", text[i:j], i))
            i = j
            continue
        # identifier / keyword
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j]
            if word.upper() in KEYWORDS:
                tokens.append(Token("KEYWORD", word.upper(), i))
            else:
                tokens.append(Token("IDENT", word, i))
            i = j
            continue
        # operators
        if text[i : i + 2] in _TWO_CHAR_OPS:
            tokens.append(Token("OP", text[i : i + 2], i))
            i += 2
            continue
        if ch in _ONE_CHAR_OPS:
            tokens.append(Token("OP", ch, i))
            i += 1
            continue
        if ch == "*":
            tokens.append(Token("OP", "*", i))
            i += 1
            continue
        raise LexError(f"Unexpected character {ch!r} at {i} in {text!r}")
    tokens.append(Token("EOF", "", n))
    return tokens
