"""SQL lexer.  Handles identifiers (bare and double-quoted), numeric and
string literals (single-quoted, '' escape), operators, line (`--`) and block
(`/* */`) comments."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

from heavydb_tpu.errors import ParserError

# token kinds
IDENT = "IDENT"
QIDENT = "QIDENT"
NUMBER = "NUMBER"
STRING = "STRING"
OP = "OP"
EOF = "EOF"

_OPERATORS = [
    "<>",
    "!=",
    ">=",
    "<=",
    "||",
    "::",
    "(",
    ")",
    ",",
    ";",
    "+",
    "-",
    "*",
    "/",
    "%",
    "=",
    "<",
    ">",
    ".",
    "[",
    "]",
    "{",
    "}",
]


@dataclass
class Token:
    kind: str
    value: str
    pos: int

    @property
    def upper(self) -> str:
        return self.value.upper()


def tokenize(sql: str) -> List[Token]:
    toks: List[Token] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "/" and i + 1 < n and sql[i + 1] == "*":
            j = sql.find("*/", i + 2)
            if j < 0:
                raise ParserError("unterminated block comment")
            i = j + 2
            continue
        if c == "'":
            j = i + 1
            buf = []
            while True:
                if j >= n:
                    raise ParserError("unterminated string literal")
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            toks.append(Token(STRING, "".join(buf), i))
            i = j + 1
            continue
        if c == '"':
            j = sql.find('"', i + 1)
            if j < 0:
                raise ParserError("unterminated quoted identifier")
            toks.append(Token(QIDENT, sql[i + 1 : j], i))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            seen_dot = False
            seen_exp = False
            while j < n:
                ch = sql[j]
                if ch.isdigit():
                    j += 1
                elif ch == "." and not seen_dot and not seen_exp:
                    seen_dot = True
                    j += 1
                elif ch in "eE" and not seen_exp and j + 1 < n and (
                    sql[j + 1].isdigit()
                    or (sql[j + 1] in "+-" and j + 2 < n and sql[j + 2].isdigit())
                ):
                    seen_exp = True
                    j += 2 if sql[j + 1] in "+-" else 1
                else:
                    break
            toks.append(Token(NUMBER, sql[i:j], i))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] in "_$"):
                j += 1
            toks.append(Token(IDENT, sql[i:j], i))
            i = j
            continue
        for op in _OPERATORS:
            if sql.startswith(op, i):
                toks.append(Token(OP, op, i))
                i += len(op)
                break
        else:
            raise ParserError(f"unexpected character {c!r} at position {i}")
    toks.append(Token(EOF, "", n))
    return toks
