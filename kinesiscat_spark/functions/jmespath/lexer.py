"""JMESPath lexer (public grammar, jmespath.org/specification.html).

Token inventory matches the spec's grammar terminals; see SURVEY §2.2 for
the reference's equivalent (`jp/lexer.go:52-84`). Implementation is an
ordinary hand-rolled scanner — no code derived from the reference.
"""

from __future__ import annotations

import json
import string
from dataclasses import dataclass
from typing import Iterator

from kinesiscat_spark.functions.jmespath.errors import LexerError

# Token types
EOF = "eof"
IDENTIFIER = "unquoted_identifier"
QUOTED_IDENTIFIER = "quoted_identifier"
RAW_STRING = "raw_string"  # 'literal string'
LITERAL = "literal"  # `json`
NUMBER = "number"
DOT = "dot"
STAR = "star"
COMMA = "comma"
COLON = "colon"
AT = "current"
AMPERSAND = "expref"
PIPE = "pipe"
OR = "or"
AND = "and"
NOT = "not"
LPAREN = "lparen"
RPAREN = "rparen"
LBRACE = "lbrace"
RBRACE = "rbrace"
LBRACKET = "lbracket"
RBRACKET = "rbracket"
FLATTEN = "flatten"  # []
FILTER = "filter"  # [?
EQ = "eq"
NE = "ne"
LT = "lt"
LTE = "lte"
GT = "gt"
GTE = "gte"

_IDENT_START = set(string.ascii_letters + "_")
_IDENT_REST = set(string.ascii_letters + string.digits + "_")
_DIGITS = set(string.digits)

_SIMPLE = {
    ".": DOT,
    "*": STAR,
    ",": COMMA,
    ":": COLON,
    "@": AT,
    "(": LPAREN,
    ")": RPAREN,
    "{": LBRACE,
    "}": RBRACE,
}


@dataclass
class Token:
    type: str
    value: object
    start: int
    end: int


class Lexer:
    def __init__(self, expression: str):
        if not isinstance(expression, str):
            raise LexerError("expression must be a string")
        self.expr = expression
        self.pos = 0
        self.n = len(expression)

    def _peek(self) -> str:
        return self.expr[self.pos] if self.pos < self.n else ""

    def _next(self) -> str:
        ch = self.expr[self.pos]
        self.pos += 1
        return ch

    def tokenize(self) -> list[Token]:
        return list(self._tokens()) + [Token(EOF, "", self.n, self.n)]

    def _tokens(self) -> Iterator[Token]:
        while self.pos < self.n:
            start = self.pos
            ch = self._next()
            if ch in " \t\n\r":
                continue
            if ch in _SIMPLE:
                yield Token(_SIMPLE[ch], ch, start, self.pos)
            elif ch in _IDENT_START:
                while self._peek() in _IDENT_REST:
                    self.pos += 1
                yield Token(IDENTIFIER, self.expr[start : self.pos], start, self.pos)
            elif ch in _DIGITS or ch == "-":
                yield self._number(start, ch)
            elif ch == "[":
                nxt = self._peek()
                if nxt == "]":
                    self.pos += 1
                    yield Token(FLATTEN, "[]", start, self.pos)
                elif nxt == "?":
                    self.pos += 1
                    yield Token(FILTER, "[?", start, self.pos)
                else:
                    yield Token(LBRACKET, "[", start, self.pos)
            elif ch == "]":
                yield Token(RBRACKET, "]", start, self.pos)
            elif ch == '"':
                yield self._quoted_identifier(start)
            elif ch == "'":
                yield self._raw_string(start)
            elif ch == "`":
                yield self._json_literal(start)
            elif ch == "|":
                if self._peek() == "|":
                    self.pos += 1
                    yield Token(OR, "||", start, self.pos)
                else:
                    yield Token(PIPE, "|", start, self.pos)
            elif ch == "&":
                if self._peek() == "&":
                    self.pos += 1
                    yield Token(AND, "&&", start, self.pos)
                else:
                    yield Token(AMPERSAND, "&", start, self.pos)
            elif ch == "=":
                if self._peek() == "=":
                    self.pos += 1
                    yield Token(EQ, "==", start, self.pos)
                else:
                    raise LexerError("'=' must be '=='", start, self.expr)
            elif ch == "!":
                if self._peek() == "=":
                    self.pos += 1
                    yield Token(NE, "!=", start, self.pos)
                else:
                    yield Token(NOT, "!", start, self.pos)
            elif ch == "<":
                if self._peek() == "=":
                    self.pos += 1
                    yield Token(LTE, "<=", start, self.pos)
                else:
                    yield Token(LT, "<", start, self.pos)
            elif ch == ">":
                if self._peek() == "=":
                    self.pos += 1
                    yield Token(GTE, ">=", start, self.pos)
                else:
                    yield Token(GT, ">", start, self.pos)
            else:
                raise LexerError(f"unexpected character {ch!r}", start, self.expr)

    def _number(self, start: int, first: str) -> Token:
        if first == "-" and self._peek() not in _DIGITS:
            raise LexerError("'-' must begin a number", start, self.expr)
        while self._peek() in _DIGITS:
            self.pos += 1
        text = self.expr[start : self.pos]
        return Token(NUMBER, int(text), start, self.pos)

    def _quoted_identifier(self, start: int) -> Token:
        # JSON-string semantics for the identifier body.
        while True:
            ch = self._peek()
            if ch == "":
                raise LexerError("unterminated quoted identifier", start, self.expr)
            self.pos += 1
            if ch == "\\":
                if self._peek() == "":
                    raise LexerError("unterminated escape", start, self.expr)
                self.pos += 1
            elif ch == '"':
                break
        raw = self.expr[start : self.pos]
        try:
            value = json.loads(raw)
        except ValueError as e:
            raise LexerError(f"invalid quoted identifier {raw}: {e}", start, self.expr)
        if not isinstance(value, str):
            raise LexerError("quoted identifier must be a string", start, self.expr)
        return Token(QUOTED_IDENTIFIER, value, start, self.pos)

    def _raw_string(self, start: int) -> Token:
        out = []
        while True:
            ch = self._peek()
            if ch == "":
                raise LexerError("unterminated raw string", start, self.expr)
            self.pos += 1
            if ch == "\\":
                nxt = self._peek()
                if nxt == "'":
                    out.append("'")
                    self.pos += 1
                elif nxt == "\\":
                    out.append("\\")
                    self.pos += 1
                else:
                    # Per spec: backslash before anything else stays literal.
                    out.append("\\")
            elif ch == "'":
                break
            else:
                out.append(ch)
        return Token(RAW_STRING, "".join(out), start, self.pos)

    def _json_literal(self, start: int) -> Token:
        body = []
        while True:
            ch = self._peek()
            if ch == "":
                raise LexerError("unterminated literal", start, self.expr)
            self.pos += 1
            if ch == "\\" and self._peek() == "`":
                body.append("`")
                self.pos += 1
            elif ch == "`":
                break
            else:
                body.append(ch)
        text = "".join(body).strip()
        try:
            value = json.loads(text)
        except ValueError:
            # Legacy JMESPath allows unquoted literal strings: `foo` == `"foo"`.
            try:
                value = json.loads('"' + text.replace('"', '\\"') + '"')
            except ValueError as e:
                raise LexerError(f"invalid literal {text!r}: {e}", start, self.expr)
        return Token(LITERAL, value, start, self.pos)


def tokenize(expression: str) -> list[Token]:
    return Lexer(expression).tokenize()
