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
from typing import Any


def _to_units(s: str) -> list[int]:
    """UTF-16 code units of s (JS charCodeAt semantics, surrogates split)."""
    b = s.encode("utf-16-le")
    return [int.from_bytes(b[i:i + 2], "little") for i in range(0, len(b), 2)]


def _from_units(units: list[int]) -> str:
    return b"".join(u.to_bytes(2, "little") for u in units).decode(
        "utf-16-le", errors="strict")


def _compress(units: list[int], bits_per_char: int) -> list[int]:
    """Core LZString._compress over code units; returns output char codes
    (before the container offset is applied)."""
    dictionary: dict[tuple, int] = {}
    to_create: set[tuple] = set()
    w: tuple = ()
    enlarge_in = 2
    dict_size = 3
    num_bits = 2
    data: list[int] = []
    val = 0
    position = 0

    def push_bits(value: int, nbits: int) -> None:
        nonlocal val, position
        for _ in range(nbits):
            val = (val << 1) | (value & 1)
            if position == bits_per_char - 1:
                position = 0
                data.append(val)
                val = 0
            else:
                position += 1
            value >>= 1

    def output_w(w: tuple) -> None:
        nonlocal enlarge_in, num_bits
        if w in to_create:
            if w[0] < 256:
                push_bits(0, num_bits)
                push_bits(w[0], 8)
            else:
                push_bits(1, num_bits)
                push_bits(w[0], 16)
            enlarge_in -= 1
            if enlarge_in == 0:
                enlarge_in = 1 << num_bits
                num_bits += 1
            to_create.discard(w)
        else:
            push_bits(dictionary[w], num_bits)
        enlarge_in -= 1
        if enlarge_in == 0:
            enlarge_in = 1 << num_bits
            num_bits += 1

    for u in units:
        c = (u,)
        if c not in dictionary:
            dictionary[c] = dict_size
            dict_size += 1
            to_create.add(c)
        wc = w + c
        if wc in dictionary:
            w = wc
        else:
            output_w(w)
            dictionary[wc] = dict_size
            dict_size += 1
            w = c

    if w:
        output_w(w)

    push_bits(2, num_bits)  # end-of-stream token
    while True:  # flush
        val <<= 1
        if position == bits_per_char - 1:
            data.append(val)
            break
        position += 1
    return data


def _decompress(data: list[int], reset_value: int) -> list[int] | None:
    """Core LZString._decompress; data are container char codes with the
    offset already removed. Returns code units, or None on corrupt input."""
    if not data:
        return []
    dictionary: list[tuple] = [(0,), (1,), (2,)]
    enlarge_in = 4
    dict_size = 4
    num_bits = 3
    pos = [data[0], reset_value, 1]  # val, position, index

    def read_bits(nbits: int) -> int | None:
        bits = 0
        power = 1
        for _ in range(nbits):
            resb = pos[0] & pos[1]
            pos[1] >>= 1
            if pos[1] == 0:
                pos[1] = reset_value
                if pos[2] >= len(data):
                    pos[0] = 0
                else:
                    pos[0] = data[pos[2]]
                pos[2] += 1
            if resb:
                bits |= power
            power <<= 1
        return bits

    first = read_bits(2)
    if first == 0:
        c = (read_bits(8),)
    elif first == 1:
        c = (read_bits(16),)
    elif first == 2:
        return []
    else:
        return None
    dictionary.append(c)
    w = c
    result: list[int] = list(c)

    while True:
        if pos[2] > len(data):
            return None
        code = read_bits(num_bits)
        if code == 0:
            dictionary.append((read_bits(8),))
            dict_size += 1
            code = dict_size - 1
            enlarge_in -= 1
        elif code == 1:
            dictionary.append((read_bits(16),))
            dict_size += 1
            code = dict_size - 1
            enlarge_in -= 1
        elif code == 2:
            return result
        if enlarge_in == 0:
            enlarge_in = 1 << num_bits
            num_bits += 1
        if code < len(dictionary):
            entry = dictionary[code]
        elif code == dict_size:
            entry = w + (w[0],)
        else:
            return None
        result.extend(entry)
        dictionary.append(w + (entry[0],))
        dict_size += 1
        enlarge_in -= 1
        w = entry
        if enlarge_in == 0:
            enlarge_in = 1 << num_bits
            num_bits += 1


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
