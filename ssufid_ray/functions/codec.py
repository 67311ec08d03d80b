"""Compressed-XHR payload codec (S10): a pure-Python implementation of the
public lz-string algorithm's UTF-16 variant (pieroxy's LZString /
the lz-str crate the reference study plugin uses,
/root/reference/plugins/study/src/lib.rs:23-63 compress_to_utf16 /
decompress_from_utf16).

The algorithm is an LZ78-family coder over UTF-16 code units with a
bit-packed token stream: tokens 0/1 introduce a literal (8- or 16-bit code
unit), token 2 ends the stream, larger tokens index the phrase dictionary;
the token width grows by one bit each time the dictionary doubles. The
UTF-16 container packs 15 bits per output char, offset by 32 so every
output char is a valid (printable-range) BMP code unit, and appends one
space.

Both the synthetic corpus generator AND the engine call this module, so the
study-board replay exercises real lz-string semantics end to end.
"""

from __future__ import annotations

import json
from array import array
from typing import Any

# bit-reversal table for 15-bit container chars: the stream packs bits
# MSB-first per char while tokens are assembled LSB-first, so reversing
# each char's bits turns the whole stream into one little-endian bignum
# whose k-th bit is the k-th consumed bit — token reads become
# (B >> pos) & mask instead of a per-bit Python loop. Built lazily: most
# crawl workers never touch a compressed board, and the table cost would
# otherwise land on every worker's first-task import path.
_REV15: list[int] | None = None
_REV15_NP = None  # numpy copy, same lifetime


def _rev15() -> list[int]:
    global _REV15
    if _REV15 is None:
        import numpy as np

        v = np.arange(1 << 15, dtype=np.uint16)
        r = np.zeros(1 << 15, dtype=np.uint16)
        for j in range(15):
            r |= (((v >> (14 - j)) & 1) << j).astype(np.uint16)
        _REV15 = r.tolist()
    return _REV15


def _to_units(s: str) -> list[int]:
    """UTF-16 code units of s (JS charCodeAt semantics, surrogates split)."""
    a = array("H")
    a.frombytes(s.encode("utf-16-le"))
    return a.tolist()


def _from_units(units: list[int]) -> str:
    return array("H", units).tobytes().decode("utf-16-le", errors="strict")


def _compress(units: list[int], bits_per_char: int) -> list[int]:
    """Core LZString._compress over code units; returns output char codes
    (before the container offset is applied). Token bits accumulate
    LSB-first into one bignum; the container chars are cut at the end
    (bit-reversed per char — see _REV15). Byte-identical to the per-bit
    reference loop (pinned by the golden vectors in tests)."""
    # Every dictionary string is (prefix string + one unit), so the
    # dictionary is a TRIE keyed (prefix_code, unit): O(1) per input unit
    # instead of hashing ever-growing tuples. `to_create` tracks single
    # units whose literal introduction is still pending (the reference's
    # dictionaryToCreate only ever holds single-char strings).
    node: dict[tuple[int, int], int] = {}  # (prefix code | -1, unit) -> code
    to_create: set[int] = set()
    w_code = -1  # -1 = empty w
    w_unit = -1  # the single unit when w_depth == 1
    w_depth = 0
    enlarge_in = 2
    dict_size = 3
    num_bits = 2
    out_bytes = bytearray()
    buf = 0
    nbuf = 0
    acc_bits = 0

    def push_bits(value: int, nbits: int) -> None:
        # stream bits LSB-first into a byte buffer (O(1) per push; a
        # growing bignum accumulator is O(stream) per push)
        nonlocal buf, nbuf, acc_bits
        buf |= (value & ((1 << nbits) - 1)) << nbuf
        nbuf += nbits
        acc_bits += nbits
        while nbuf >= 8:
            out_bytes.append(buf & 0xFF)
            buf >>= 8
            nbuf -= 8

    def output_w() -> None:
        nonlocal enlarge_in, num_bits
        if w_depth == 1 and w_unit in to_create:
            if w_unit < 256:
                push_bits(0, num_bits)
                push_bits(w_unit, 8)
            else:
                push_bits(1, num_bits)
                push_bits(w_unit, 16)
            enlarge_in -= 1
            if enlarge_in == 0:
                enlarge_in = 1 << num_bits
                num_bits += 1
            to_create.discard(w_unit)
        else:
            push_bits(w_code, num_bits)
        enlarge_in -= 1
        if enlarge_in == 0:
            enlarge_in = 1 << num_bits
            num_bits += 1

    for u in units:
        root = (-1, u)
        if root not in node:
            node[root] = dict_size
            dict_size += 1
            to_create.add(u)
        ext = (w_code, u)
        if w_depth == 0:
            # empty w: wc == c, always in the dictionary by now
            w_code = node[root]
            w_unit = u
            w_depth = 1
        elif ext in node:
            w_code = node[ext]
            w_depth += 1
        else:
            output_w()
            node[ext] = dict_size
            dict_size += 1
            w_code = node[root]
            w_unit = u
            w_depth = 1

    if w_depth:
        output_w()

    push_bits(2, num_bits)  # end-of-stream token
    if nbuf:
        out_bytes.append(buf & 0xFF)
    out_bytes += b"\x00\x00\x00"  # slack for 4-byte window reads
    # flush: complete the current char with zero bits; an exact char
    # boundary still emits one extra all-zero char (reference flush loop)
    nchars = acc_bits // bits_per_char + 1
    mask = (1 << bits_per_char) - 1
    ob = bytes(out_bytes)
    chunks = []
    for i in range(nchars):
        p = bits_per_char * i
        b = p >> 3
        chunks.append((int.from_bytes(ob[b:b + 4], "little") >> (p & 7)) & mask)
    if bits_per_char == 15:
        rev = _rev15()
        return [rev[c] for c in chunks]
    out = []
    for chunk in chunks:
        v = 0
        for j in range(bits_per_char):
            if chunk & (1 << j):
                v |= 1 << (bits_per_char - 1 - j)
        out.append(v)
    return out


def _bitstream_words(data: list[int], bits_per_char: int) -> list[int]:
    """Container chars -> 64-bit little-endian words whose bit k is the
    k-th consumed token bit (per-char bit reversal folded in). The 15-bit
    path is fully vectorized (numpy bit explode + packbits); token reads
    then cost two word lookups + shifts, no per-read allocation."""
    import numpy as np

    global _REV15_NP
    if bits_per_char == 15:
        if _REV15_NP is None:
            _REV15_NP = np.asarray(_rev15(), dtype=np.uint16)
        # int64 + mask BEFORE the narrow cast: corrupt input can hold
        # negative values (char code below the container offset), which a
        # direct uint16 cast rejects on numpy >= 2 instead of wrapping —
        # that would escape the None-on-corrupt contract as OverflowError
        rev = _REV15_NP[(np.asarray(data, dtype=np.int64) & 0x7FFF
                         ).astype(np.uint16)]
        bits = ((rev[:, None] >> np.arange(15, dtype=np.uint16)) & 1
                ).astype(np.uint8).reshape(-1)
        packed = np.packbits(bits, bitorder="little").tobytes()
    else:
        buf = 0
        nbuf = 0
        bb = bytearray()
        for c in data:
            v = 0
            for j in range(bits_per_char):
                if c & (1 << (bits_per_char - 1 - j)):
                    v |= 1 << j
            buf |= v << nbuf
            nbuf += bits_per_char
            while nbuf >= 8:
                bb.append(buf & 0xFF)
                buf >>= 8
                nbuf -= 8
        if nbuf:
            bb.append(buf & 0xFF)
        packed = bytes(bb)
    pad = (-len(packed)) % 8 + 16  # slack: reads touch words[i] and [i+1]
    return np.frombuffer(packed + b"\x00" * pad,
                         dtype="<u8").tolist()


def _decompress(data: list[int], reset_value: int) -> list[int] | None:
    """Core LZString._decompress; data are container char codes with the
    offset already removed. Returns code units, or None on corrupt input.

    The stream becomes 64-bit little-endian words (bit k = k-th consumed
    bit, via per-char bit reversal) so every token read is two word
    lookups + shift + mask instead of a per-bit loop; dictionary entries
    are (offset, length) slices of the output held in two parallel int
    lists (no tuple churn). ~60x a per-bit reference loop on real
    payloads; byte-identical (golden vectors + property roundtrip)."""
    if not data:
        return []
    bits_per_char = reset_value.bit_length()  # 16384 -> 15
    words = _bitstream_words(data, bits_per_char)
    total_bits = bits_per_char * len(data)
    enlarge_in = 4
    num_bits = 3
    mask = (1 << num_bits) - 1
    p = 0  # bit cursor

    def read_bits(nbits: int) -> int:
        # cold path (literal payloads + the first token); the hot per-token
        # code read is inlined in the loop below
        nonlocal p
        i, r = p >> 6, p & 63
        p += nbits
        return ((words[i] >> r) | (words[i + 1] << (64 - r))) & (
            (1 << nbits) - 1)

    first = read_bits(2)
    if first == 0:
        u = read_bits(8)
    elif first == 1:
        u = read_bits(16)
    elif first == 2:
        return []
    else:
        return None
    result: list[int] = [u]
    # Every dictionary string is a substring of the decoded output, so
    # entries are (offset, length) slices of `result` — new entries cost
    # O(1) to record instead of O(len) tuple concatenation. Literals whose
    # first emission is still pending carry offset (-unit - 1), length 0.
    doff = [0, 0, 0, 0]
    dlen = [0, 0, 0, 1]
    dict_size = 4
    w_len = 1
    res_append = result.append
    res_extend = result.extend
    off_append = doff.append
    len_append = dlen.append

    while True:
        if p > total_bits:
            return None  # ran off the stream: corrupt input
        i = p >> 6
        r = p & 63
        v = words[i] >> r
        if r + num_bits > 64:  # rare: the read straddles a word boundary
            v |= words[i + 1] << (64 - r)
        code = v & mask
        p += num_bits
        if code < 3:
            if code == 2:
                return result
            off_append(-read_bits(8 if code == 0 else 16) - 1)
            len_append(0)
            dict_size += 1
            code = dict_size - 1
            enlarge_in -= 1
            if enlarge_in == 0:
                enlarge_in = 1 << num_bits
                num_bits += 1
                mask = (1 << num_bits) - 1
        n = len(result)
        if code < dict_size:
            ln = dlen[code]
            if ln == 0:  # pending literal: first emission fixes its slice
                res_append(-doff[code] - 1)
                doff[code] = n
                dlen[code] = 1
                e_len = 1
            else:
                off = doff[code]
                res_extend(result[off:off + ln])
                e_len = ln
        elif code == dict_size:
            # w + w[0]: w's latest emission ends exactly at n
            res_extend(result[n - w_len:n])
            res_append(result[n - w_len])
            e_len = w_len + 1
        else:
            return None
        # new entry = w + entry[0] == result[n - w_len : n + 1]
        off_append(n - w_len)
        len_append(w_len + 1)
        dict_size += 1
        enlarge_in -= 1
        w_len = e_len
        if enlarge_in == 0:
            enlarge_in = 1 << num_bits
            num_bits += 1
            mask = (1 << num_bits) - 1


def compress_to_utf16(s: str) -> str:
    """lz-string compressToUTF16: 15 bits per char, +32 offset, trailing
    space (keeps every output char a printable-safe BMP unit)."""
    codes = _compress(_to_units(s), 15)
    return "".join(chr(c + 32) for c in codes) + " "


def decompress_from_utf16(s: str) -> str | None:
    """lz-string decompressFromUTF16; None on corrupt input."""
    if s == "":
        return None
    units = _decompress([ord(ch) - 32 for ch in s], 16384)
    if units is None:
        return None
    try:
        return _from_units(units)
    except UnicodeDecodeError:
        return None


def encode_payload(obj: Any) -> bytes:
    """JSON -> lz-string-UTF16 -> UTF-8 bytes (the page-store body form)."""
    return compress_to_utf16(
        json.dumps(obj, ensure_ascii=False, sort_keys=True)).encode("utf-8")


def decode_payload(blob: bytes) -> Any:
    s = decompress_from_utf16(blob.decode("utf-8"))
    if s is None:
        raise ValueError("corrupt lz-string payload")
    return json.loads(s)
