"""Protobuf text-format codec (prototxt), written from scratch.

The reference manipulates prototxt through generated caffe_pb2 bindings
(lib/builder.py:126-138). We instead parse the text format directly into
plain nested dicts — the grammar is tiny:

    message   := (field)*
    field     := ident ':' scalar | ident '{' message '}' | ident '<' ... '>'
    scalar    := number | 'true' | 'false' | quoted-string | enum-ident

Repeated fields accumulate into lists. This is enough for every Caffe
prototxt in the wild (including the reference's temp/*.prototxt) without a
protoc dependency.
"""
from __future__ import annotations

from typing import Any, Iterator

Msg = dict[str, Any]  # values: scalar | Msg | list[scalar | Msg]


# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

def _tokens(text: str) -> Iterator[str]:
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in " \t\r\n,":
            i += 1
        elif ch == "#":
            while i < n and text[i] != "\n":
                i += 1
        elif ch in "{}:<>":
            yield ch
            i += 1
        elif ch in "\"'":
            q = ch
            j = i + 1
            out = []
            while j < n and text[j] != q:
                if text[j] == "\\" and j + 1 < n:
                    out.append(text[j + 1])
                    j += 2
                else:
                    out.append(text[j])
                    j += 1
            yield '"' + "".join(out)
            i = j + 1
        else:
            j = i
            while j < n and text[j] not in " \t\r\n,{}:<>#\"'":
                j += 1
            yield text[i:j]
            i = j


def _scalar(tok: str) -> Any:
    if tok.startswith('"'):
        return tok[1:]
    if tok == "true":
        return True
    if tok == "false":
        return False
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return tok  # enum identifier (e.g. MAX, LMDB)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def parse(text: str) -> Msg:
    toks = list(_tokens(text))
    msg, pos = _parse_msg(toks, 0, None)
    return msg


def _parse_msg(toks: list[str], pos: int, close: str | None) -> tuple[Msg, int]:
    msg: Msg = {}
    while pos < len(toks):
        t = toks[pos]
        if close is not None and t == close:
            return msg, pos + 1
        name = t
        pos += 1
        if pos < len(toks) and toks[pos] == ":":
            pos += 1
            if toks[pos] in ("{", "<"):  # allowed: `field: { ... }`
                sub, pos = _parse_msg(toks, pos + 1,
                                      "}" if toks[pos] == "{" else ">")
                _add(msg, name, sub)
            else:
                _add(msg, name, _scalar(toks[pos]))
                pos += 1
        elif pos < len(toks) and toks[pos] in ("{", "<"):
            sub, pos = _parse_msg(toks, pos + 1,
                                  "}" if toks[pos] == "{" else ">")
            _add(msg, name, sub)
        else:
            raise ValueError(f"parse error near token {pos}: {toks[pos-1:pos+2]}")
    if close is not None:
        raise ValueError(f"unterminated message (expected {close!r})")
    return msg, pos


def _add(msg: Msg, name: str, value: Any) -> None:
    if name in msg:
        cur = msg[name]
        if isinstance(cur, list):
            cur.append(value)
        else:
            msg[name] = [cur, value]
    else:
        msg[name] = value


def as_list(value: Any) -> list:
    """Normalise a maybe-repeated field to a list."""
    if value is None:
        return []
    return value if isinstance(value, list) else [value]


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def dump(msg: Msg, indent: int = 0) -> str:
    out: list[str] = []
    pad = "  " * indent
    for key, value in msg.items():
        for v in (value if isinstance(value, list) else [value]):
            if isinstance(v, dict):
                out.append(f"{pad}{key} {{")
                out.append(dump(v, indent + 1))
                out.append(f"{pad}}}")
            elif isinstance(v, bool):
                out.append(f"{pad}{key}: {'true' if v else 'false'}")
            elif isinstance(v, str):
                # enum identifiers (ALL-CAPS convention) are unquoted
                if v and (v.isupper() or v[0].isdigit() and False):
                    out.append(f"{pad}{key}: {v}")
                else:
                    out.append(f'{pad}{key}: "{v}"')
            else:
                out.append(f"{pad}{key}: {v}")
    return "\n".join(out)
