"""JMESPath Pratt parser → AST (public grammar, jmespath.org/specification.html).

Same grammar/precedence surface as the reference's parser (SURVEY §2.2:
pipe 1 < or 2 < and 3 < comparators 5 < flatten 9 < star 20 < filter 21 <
dot 40 < not 45 < lparen 60; `jp/parser.go:80-109`), implemented as an
ordinary top-down operator-precedence parser. AST is a generic
(type, value, children) node — the three consumers (Python evaluator,
Column compiler, pretty printer) dispatch on ``node.type``.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from kinesiscat_spark.functions.jmespath import lexer as L
from kinesiscat_spark.functions.jmespath.errors import (
    IncompleteExpressionError,
    ParseError,
)


@dataclass(frozen=True)
class Node:
    type: str
    children: tuple = ()
    value: object = None

    def __repr__(self) -> str:  # compact debug form
        v = f"={self.value!r}" if self.value is not None else ""
        c = f"({', '.join(map(repr, self.children))})" if self.children else ""
        return f"{self.type}{v}{c}"


def _n(type_: str, *children: Node, value: object = None) -> Node:
    return Node(type_, tuple(children), value)


IDENTITY = _n("identity")

BINDING_POWER = {
    L.EOF: 0,
    L.IDENTIFIER: 0,
    L.QUOTED_IDENTIFIER: 0,
    L.RAW_STRING: 0,
    L.LITERAL: 0,
    L.NUMBER: 0,
    L.AT: 0,
    L.AMPERSAND: 0,
    L.RBRACKET: 0,
    L.RBRACE: 0,
    L.RPAREN: 0,
    L.COMMA: 0,
    L.COLON: 0,
    L.PIPE: 1,
    L.OR: 2,
    L.AND: 3,
    L.EQ: 5,
    L.NE: 5,
    L.LT: 5,
    L.LTE: 5,
    L.GT: 5,
    L.GTE: 5,
    L.FLATTEN: 9,
    L.STAR: 20,
    L.FILTER: 21,
    L.DOT: 40,
    L.NOT: 45,
    L.LBRACE: 50,
    L.LBRACKET: 55,
    L.LPAREN: 60,
}

_COMPARATORS = {L.EQ: "==", L.NE: "!=", L.LT: "<", L.LTE: "<=", L.GT: ">", L.GTE: ">="}

# Projections stop when the next token binds looser than a projection.
_PROJECTION_STOP = 10


class Parser:
    def __init__(self, expression: str):
        self.expression = expression
        self.tokens = L.tokenize(expression)
        self.pos = 0

    # token helpers -------------------------------------------------------
    @property
    def _current(self) -> L.Token:
        return self.tokens[self.pos]

    def _advance(self) -> L.Token:
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def _expect(self, type_: str) -> L.Token:
        tok = self._advance()
        if tok.type != type_:
            if tok.type == L.EOF:
                raise IncompleteExpressionError(
                    f"expected {type_} but reached end of expression",
                    tok,
                    self.expression,
                )
            raise ParseError(f"expected {type_}, got {tok.type}", tok, self.expression)
        return tok

    # entry ---------------------------------------------------------------
    def parse(self) -> Node:
        ast = self._expression(0)
        if self._current.type != L.EOF:
            raise ParseError(
                f"unexpected token {self._current.type} after expression",
                self._current,
                self.expression,
            )
        return ast

    def _expression(self, rbp: int) -> Node:
        left = self._nud(self._advance())
        while rbp < BINDING_POWER.get(self._current.type, 0):
            left = self._led(self._advance(), left)
        return left

    # prefix --------------------------------------------------------------
    def _nud(self, tok: L.Token) -> Node:
        t = tok.type
        if t == L.IDENTIFIER:
            if self._current.type == L.LPAREN:
                return self._function_call(tok.value)
            return _n("field", value=tok.value)
        if t == L.QUOTED_IDENTIFIER:
            if self._current.type == L.LPAREN:
                raise ParseError(
                    "quoted identifier cannot be a function name", tok, self.expression
                )
            return _n("field", value=tok.value)
        if t == L.RAW_STRING:
            return _n("literal", value=tok.value)
        if t == L.LITERAL:
            return _n("literal", value=tok.value)
        if t == L.AT:
            return IDENTITY
        if t == L.AMPERSAND:
            return _n("expref", self._expression(0))
        if t == L.NOT:
            return _n("not_expression", self._expression(BINDING_POWER[L.NOT]))
        if t == L.LPAREN:
            inner = self._expression(0)
            self._expect(L.RPAREN)
            return inner
        if t == L.STAR:
            # bare `*` — object-value projection off the current node
            return self._value_projection(IDENTITY)
        if t == L.FLATTEN:
            return self._projection(_n("flatten", IDENTITY))
        if t == L.FILTER:
            return self._filter_projection(IDENTITY)
        if t == L.LBRACE:
            return self._multiselect_dict()
        if t == L.LBRACKET:
            return self._nud_lbracket()
        raise ParseError(f"unexpected token {t}", tok, self.expression)

    def _nud_lbracket(self) -> Node:
        # `[0]`, `[1:3]`, `[*]` on the current node, or a multiselect list.
        t = self._current.type
        if t in (L.NUMBER, L.COLON):
            return self._index_or_slice(IDENTITY)
        if t == L.STAR and self.tokens[self.pos + 1].type == L.RBRACKET:
            self._advance()
            self._advance()
            return self._projection(IDENTITY)
        return self._multiselect_list()

    # infix ---------------------------------------------------------------
    def _led(self, tok: L.Token, left: Node) -> Node:
        t = tok.type
        if t == L.DOT:
            if self._current.type == L.STAR:
                self._advance()
                return self._value_projection(left)
            right = self._parse_dot_rhs(BINDING_POWER[L.DOT])
            return _n("subexpression", left, right)
        if t == L.PIPE:
            return _n("pipe", left, self._expression(BINDING_POWER[L.PIPE]))
        if t == L.OR:
            return _n("or_expression", left, self._expression(BINDING_POWER[L.OR]))
        if t == L.AND:
            return _n("and_expression", left, self._expression(BINDING_POWER[L.AND]))
        if t in _COMPARATORS:
            right = self._expression(BINDING_POWER[t])
            return _n("comparator", left, right, value=_COMPARATORS[t])
        if t == L.FLATTEN:
            return self._projection(_n("flatten", left))
        if t == L.FILTER:
            return self._filter_projection(left)
        if t == L.LBRACKET:
            tt = self._current.type
            if tt in (L.NUMBER, L.COLON):
                return self._index_or_slice(left)
            if tt == L.STAR and self.tokens[self.pos + 1].type == L.RBRACKET:
                self._advance()
                self._advance()
                return self._projection(left)
            raise ParseError(
                "expected number, ':' or '*' in index expression",
                self._current,
                self.expression,
            )
        if t == L.LPAREN:
            raise ParseError(
                "function call target must be an unquoted identifier",
                tok,
                self.expression,
            )
        raise ParseError(f"unexpected token {t}", tok, self.expression)

    # components ----------------------------------------------------------
    def _projection(self, left: Node) -> Node:
        """`left[*]` / `left[]` — array projection with parsed RHS."""
        return _n("projection", left, self._parse_projection_rhs(BINDING_POWER[L.STAR]))

    def _value_projection(self, left: Node) -> Node:
        """`left.*` — projection over an object's values."""
        return _n(
            "value_projection", left, self._parse_projection_rhs(BINDING_POWER[L.STAR])
        )

    def _filter_projection(self, left: Node) -> Node:
        condition = self._expression(0)
        self._expect(L.RBRACKET)
        rhs = self._parse_projection_rhs(BINDING_POWER[L.FILTER])
        return _n("filter_projection", left, rhs, condition)

    def _parse_projection_rhs(self, rbp: int) -> Node:
        t = self._current.type
        if BINDING_POWER.get(t, 0) < _PROJECTION_STOP:
            return IDENTITY
        if t == L.LBRACKET or t == L.FILTER:
            return self._expression(rbp)
        if t == L.DOT:
            self._advance()
            return self._parse_dot_rhs(rbp)
        raise ParseError(
            f"unexpected token {t} after projection", self._current, self.expression
        )

    def _parse_dot_rhs(self, rbp: int) -> Node:
        t = self._current.type
        if t in (L.IDENTIFIER, L.QUOTED_IDENTIFIER, L.STAR):
            return self._expression(rbp)
        if t == L.LBRACKET:
            self._advance()
            return self._multiselect_list()
        if t == L.LBRACE:
            self._advance()
            return self._multiselect_dict()
        raise ParseError(
            f"expected identifier, '*', '[' or '{{' after '.', got {t}",
            self._current,
            self.expression,
        )

    def _index_or_slice(self, left: Node) -> Node:
        # parts: up to three optional numbers separated by colons
        parts: list[int | None] = [None, None, None]
        idx = 0
        saw_colon = False
        while True:
            t = self._current.type
            if t == L.RBRACKET:
                self._advance()
                break
            if t == L.COLON:
                saw_colon = True
                idx += 1
                if idx > 2:
                    raise ParseError("too many colons in slice", self._current, self.expression)
                self._advance()
            elif t == L.NUMBER:
                parts[idx] = self._advance().value
            else:
                raise ParseError(
                    f"unexpected token {t} in index expression",
                    self._current,
                    self.expression,
                )
        if not saw_colon:
            index = _n("index", value=parts[0])
            if left is IDENTITY:
                return index
            return _n("index_expression", left, index)
        # Slices are projections: `a[1:3].b` maps b over the slice result.
        slice_node = _n("slice", value=tuple(parts))
        sliced = slice_node if left is IDENTITY else _n("index_expression", left, slice_node)
        return _n(
            "projection", sliced, self._parse_projection_rhs(BINDING_POWER[L.STAR])
        )

    def _multiselect_list(self) -> Node:
        children = []
        while True:
            children.append(self._expression(0))
            t = self._advance()
            if t.type == L.RBRACKET:
                break
            if t.type != L.COMMA:
                raise ParseError("expected ',' or ']'", t, self.expression)
        return _n("multiselect_list", *children)

    def _multiselect_dict(self) -> Node:
        pairs = []
        while True:
            key_tok = self._advance()
            if key_tok.type not in (L.IDENTIFIER, L.QUOTED_IDENTIFIER):
                raise ParseError("expected identifier key", key_tok, self.expression)
            self._expect(L.COLON)
            pairs.append(_n("keyval", self._expression(0), value=key_tok.value))
            t = self._advance()
            if t.type == L.RBRACE:
                break
            if t.type != L.COMMA:
                raise ParseError("expected ',' or '}'", t, self.expression)
        return _n("multiselect_dict", *pairs)

    def _function_call(self, name: str) -> Node:
        self._expect(L.LPAREN)
        args = []
        if self._current.type == L.RPAREN:
            self._advance()
        else:
            while True:
                args.append(self._expression(0))
                t = self._advance()
                if t.type == L.RPAREN:
                    break
                if t.type != L.COMMA:
                    raise ParseError("expected ',' or ')'", t, self.expression)
        return _n("function_call", *args, value=name)


def parse(expression: str) -> Node:
    return Parser(expression).parse()
