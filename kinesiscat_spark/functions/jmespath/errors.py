"""JMESPath error types (public spec error taxonomy).

The compliance corpus distinguishes syntax errors (lex/parse time),
invalid-type / invalid-arity / unknown-function errors (runtime), and
invalid-value errors (e.g. slice step of 0). Reference behavior:
missing keys and type-mismatched accesses are ``null``, never errors
(`/root/reference/vendor/github.com/jmespath/go-jmespath/interpreter.go:78-83`),
while function misuse raises (`jp/functions.go:326-402`).
"""

from __future__ import annotations


class JMESPathError(ValueError):
    """Base class for all JMESPath errors."""


class LexerError(JMESPathError):
    def __init__(self, message: str, position: int = -1, expression: str = ""):
        super().__init__(message)
        self.position = position
        self.expression = expression


class ParseError(JMESPathError):
    def __init__(self, message: str, token=None, expression: str = ""):
        super().__init__(message)
        self.token = token
        self.expression = expression


class IncompleteExpressionError(ParseError):
    pass


class InvalidTypeError(JMESPathError):
    """A function received an argument of the wrong type."""


class InvalidArityError(JMESPathError):
    """A function received the wrong number of arguments."""


class UnknownFunctionError(JMESPathError):
    """Call to a function not in the (closed) function table."""


class InvalidValueError(JMESPathError):
    """A structurally-valid but semantically-invalid value (slice step 0)."""


class NotColumnCompilable(JMESPathError):
    """Raised by the native Column compiler when the expression needs the
    dynamic (pandas UDF) evaluation path."""
