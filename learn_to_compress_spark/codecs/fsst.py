"""FSST — Fast Static Symbol Table string compression.

Implemented from the published algorithm (Boncz/Neumann/Leis, VLDB 2020) —
the reference only wraps the upstream library (``headers/string/fsst_string.h:17-62``,
``thirdparty/fsst/``). Semantics:

* symbol table of up to 255 symbols, each 1–8 bytes; code 255 is the escape
  marker (next byte is a literal);
* table built iteratively on a sample: parse with the current table
  (greedy longest match), count symbol and adjacent-pair frequencies,
  keep the top symbols by gain = frequency × length;
* encoding replaces greedy-longest-match symbol occurrences by their
  1-byte code; bytes not covered by any symbol are escaped (2 bytes).

Rows are compressed independently (one compiled-regex pass each — the call
overhead is negligible next to the matching work) and BOTH offset columns
are kept, int-codec-compressed like ``experiments/example_fsst.cpp:86-107``:
uncompressed-domain ends for the vectorized full-chunk decode, and
compressed-domain ends for per-string random access
(``headers/string/fsst_string.h:67-77`` — decode ONLY the requested rows'
compressed spans). Decoding the concatenation equals concatenating per-row
decodes because the code stream is stateless (escape pairs are local), so
full decode stays one pass.

Serialized symbol table: ``n_sym:u8 | (len:u8, bytes)*``.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
SAMPLE_BYTES = 16 * 1024
GENERATIONS = 5


def _compile(symbols: list[bytes]) -> tuple[re.Pattern, dict[bytes, bytes]]:
    ordered = sorted(symbols, key=len, reverse=True)
    pat = re.compile(
        b"(?:" + b"|".join(map(re.escape, ordered)) + b")|(?s:.)"
        if ordered
        else b"(?s:.)"
    )
    code_of = {s: bytes([i]) for i, s in enumerate(symbols)}
    return pat, code_of


def train(sample: bytes) -> list[bytes]:
    """Build the symbol table on a sample (greedy gain, GENERATIONS rounds)."""
    sample = sample[:SAMPLE_BYTES]
    symbols: list[bytes] = []
    for _ in range(GENERATIONS):
        pat, _ = _compile(symbols)
        toks = pat.findall(sample)
        counts = Counter(toks)
        gains: Counter = Counter()
        for s, f in counts.items():
            gains[s] += f * len(s)
        for (a, b), f in Counter(zip(toks, toks[1:])).items():
            cand = (a + b)[:MAX_SYMBOL_LEN]
            gains[cand] += f * len(cand)
        symbols = [s for s, _ in gains.most_common(MAX_SYMBOLS)]
    return symbols


def compress(data: bytes, symbols: list[bytes]) -> bytes:
    pat, code_of = _compile(symbols)

    def repl(m: re.Match) -> bytes:
        g = m.group(0)
        c = code_of.get(g)
        return c if c is not None else b"\xff" + g

    return pat.sub(repl, data)


def compress_rows(blob: bytes, ends: np.ndarray, symbols: list[bytes]):
    """Compress each row's span independently → (compressed blob,
    compressed-domain ends). Matches never span row boundaries, so any row
    can be decoded from its compressed span alone."""
    pat, code_of = _compile(symbols)

    def repl(m: re.Match) -> bytes:
        g = m.group(0)
        c = code_of.get(g)
        return c if c is not None else b"\xff" + g

    parts = []
    comp_ends = np.empty(len(ends), dtype=np.int64)
    start = 0
    total = 0
    for i, end in enumerate(ends):
        piece = pat.sub(repl, blob[start:end])
        parts.append(piece)
        total += len(piece)
        comp_ends[i] = total
        start = end
    return b"".join(parts), comp_ends


def _decode_tables(symbols: list[bytes]):
    mat = np.zeros((256, MAX_SYMBOL_LEN), dtype=np.uint8)
    lens = np.zeros(256, dtype=np.int64)
    for i, s in enumerate(symbols):
        mat[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    return mat, lens


def decompress(codes: bytes, symbols: list[bytes]) -> bytes:
    """Vectorized decode: gather each code's padded symbol row, mask by
    length, flatten. Escapes handled by splitting on the escape byte."""
    mat, lens = _decode_tables(symbols)

    def translate(seg: bytes) -> bytes:
        if not seg:
            return b""
        c = np.frombuffer(seg, np.uint8)
        rows = mat[c]
        mask = np.arange(MAX_SYMBOL_LEN) < lens[c][:, None]
        return rows[mask].tobytes()

    out = []
    i = 0
    while True:
        j = codes.find(b"\xff", i)
        if j < 0:
            out.append(translate(codes[i:]))
            break
        out.append(translate(codes[i:j]))
        out.append(codes[j + 1 : j + 2])
        i = j + 2
    return b"".join(out)


def serialize_table(symbols: list[bytes]) -> bytes:
    parts = [bytes([len(symbols)])]
    for s in symbols:
        parts.append(bytes([len(s)]))
        parts.append(s)
    return b"".join(parts)


def deserialize_table(buf: bytes, off: int = 0) -> tuple[list[bytes], int]:
    n = buf[off]
    off += 1
    symbols = []
    for _ in range(n):
        ln = buf[off]
        off += 1
        symbols.append(bytes(buf[off : off + ln]))
        off += ln
    return symbols, off
