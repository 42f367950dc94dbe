"""seq-ql lexer.

Token rules mirror the reference lexer (`parser/seqql.go:127-297`):

- a *simple token* is a run of unicode letters/digits/``_``/``.``;
- ``*`` outside quotes lexes as the wildcard sentinel (U+E000);
- ``'...'`` and ``"..."`` are quoted tokens with Go-style escapes, where an
  unescaped ``*`` *inside* quotes is still a wildcard and ``\\*`` is a literal
  asterisk (`parser/seqql.go:276-292`);
- backtick strings are raw: escapes ignored, ``*`` stays a literal char;
- ``# ...`` comments are skipped to end of line (`parser/seqql.go:159-168`);
- any other rune is its own single-rune token.
"""

from __future__ import annotations

from .ast import WILDCARD


def is_token_rune(ch: str) -> bool:
    """Reference `parser/seqql.go:216-218`."""
    return ch == "_" or ch == "." or ch.isalpha() or ch.isdigit()


_SIMPLE_ESCAPES = {
    "a": "\a",
    "b": "\b",
    "f": "\f",
    "n": "\n",
    "r": "\r",
    "t": "\t",
    "v": "\v",
    "\\": "\\",
    "'": "'",
    '"': '"',
}


class UnquoteError(ValueError):
    pass


def _unquote_char(s: str, quote: str) -> tuple[str, str]:
    """One escape step: returns (decoded_char, tail).

    Mirrors reference `parser/seqql.go:276-292` (``unquoteChar``): ``\\*`` is a
    literal asterisk, bare ``*`` is a wildcard, everything else follows
    Go ``strconv.UnquoteChar``.
    """
    if s.startswith("\\*"):
        return "*", s[2:]
    if s.startswith("*"):
        return WILDCARD, s[1:]
    if s[0] != "\\":
        if s[0] == quote:
            raise UnquoteError("unescaped quote")
        return s[0], s[1:]
    if len(s) < 2:
        raise UnquoteError("trailing backslash")
    c = s[1]
    if c in _SIMPLE_ESCAPES:
        if c in "'\"" and c != quote:
            # Go permits \' only in '-quotes and \" only in "-quotes.
            raise UnquoteError(f"invalid escape \\{c}")
        return _SIMPLE_ESCAPES[c], s[2:]
    if c == "x":
        if len(s) < 4:
            raise UnquoteError("short \\x escape")
        return chr(int(s[2:4], 16)), s[4:]
    if c == "u":
        if len(s) < 6:
            raise UnquoteError("short \\u escape")
        return chr(int(s[2:6], 16)), s[6:]
    if c == "U":
        if len(s) < 10:
            raise UnquoteError("short \\U escape")
        return chr(int(s[2:10], 16)), s[10:]
    if c in "01234567":
        if len(s) < 4:
            raise UnquoteError("short octal escape")
        return chr(int(s[1:4], 8)), s[4:]
    raise UnquoteError(f"unknown escape \\{c}")


def unquote_prefix(q: str) -> tuple[str, str]:
    """Unquote a leading quoted token, returning (token, remainder).

    Mirrors reference `parser/seqql.go:220-268` including its
    skip-invalid-escape behavior (an undecodable escape contributes a
    literal backslash and advances one byte).
    """
    if len(q) < 2:
        raise UnquoteError("too short")
    quote = q[0]
    if quote not in "'\"":
        raise UnquoteError("not a quote")
    out: list[str] = []
    s = q[1:]
    while s and s[0] != quote:
        try:
            ch, s2 = _unquote_char(s, quote)
        except (UnquoteError, ValueError):
            out.append("\\")
            s = s[1:]
            continue
        out.append(ch)
        s = s2
    if not s:
        raise UnquoteError("unterminated quoted token")
    return "".join(out), s[1:]


class Lexer:
    """Pull-based lexer; ``next()`` advances to the following token."""

    def __init__(self, q: str):
        self.q = q
        self.token = ""
        self.token_quoted = False
        self.raw_string = False
        self.space_skipped = False
        self.next()

    def is_keyword(self, kw: str) -> bool:
        if self.token_quoted:
            return False
        return self.token.lower() == kw.lower()

    def is_keywords(self, *kws: str) -> bool:
        return any(self.is_keyword(k) for k in kws)

    def is_end(self) -> bool:
        return self.q == "" and self.token == "" and not self.token_quoted

    def is_raw_string(self) -> bool:
        return self.raw_string and self.token_quoted

    def next(self) -> None:
        self.token = ""
        self.token_quoted = False
        self.raw_string = False
        self.space_skipped = False

        while True:
            if not self.q:
                return
            ch = self.q[0]
            if ch.isspace():
                while self.q and self.q[0].isspace():
                    self.q = self.q[1:]
                    self.space_skipped = True
                continue
            if ch == "#":
                nl = self.q.find("\n")
                self.q = "" if nl == -1 else self.q[nl + 1 :]
                continue
            break

        ch = self.q[0]

        # Simple token: run of letter/digit/_/.
        n = 0
        while n < len(self.q) and is_token_rune(self.q[n]):
            n += 1
        if n > 0:
            self.token, self.q = self.q[:n], self.q[n:]
            return

        if ch == "*":
            self.token = WILDCARD
            self.q = self.q[1:]
            return

        if ch in "'\"":
            try:
                self.token, self.q = unquote_prefix(self.q)
                self.token_quoted = True
            except UnquoteError:
                self.token, self.q = self.q[:1], self.q[1:]
            return

        if ch == "`":
            end = self.q.find("`", 1)
            if end == -1:
                self.token, self.q = self.q[:1], self.q[1:]
                return
            self.token = self.q[1:end]
            self.q = self.q[end + 1 :]
            self.token_quoted = True
            self.raw_string = True
            return

        # Any other rune is its own token.
        self.token, self.q = self.q[:1], self.q[1:]
