"""CCITT Group 4 (ITU-T T.6) two-dimensional bilevel coding — the fax
compression scanned-document TIFFs carry (Compression 4).

Implemented from the public ITU-T Recommendations T.4 (run-length
code tables: terminating 0..63, make-up 64..1728 per color, extended
make-up 1792..2560 shared) and T.6 (the 2-D vertical/horizontal/pass
mode layer).  Same publishability class as the CAVLC tables h264.py
transcribed; the transcription is self-checked structurally (both
color trees prefix-free with identical Kraft sums, pinned by
tests/test_ccitt.py) and externally pinned on the widely published
codewords (V/H/P mode codes, the short white/black runs, the 64/1728
make-ups).

Scope (the TIFF baseline G4 subset):
- T.6 coding with an all-white imaginary reference line per strip,
  modes V0 / VR1-3 / VL1-3 / Horizontal / Pass;
- T.4 run tables incl. extended make-ups to 2560 (chained make-ups
  legal);
- optional trailing EOFB tolerated, never required;
- NOT implemented (quarantine): T.6 uncompressed mode (T6Options
  bit 1 — nothing mainstream writes it), T.4/G3 streams
  (Compression 2/3 — the EOL-framed 1-D/mixed layer).

The TIFF seam (strip walk, FillOrder, photometric) lives in
tiff.py:_decode_tiff_g4."""

from __future__ import annotations

from reindexer_spark.codecs import MediaFormatError

# ---------------------------------------------------------------------------
# T.4 code tables (white/black terminating + make-up, shared extended)
# ---------------------------------------------------------------------------

WHITE_CODES: dict[int, str] = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}

BLACK_CODES: dict[int, str] = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101",
    1152: "0000001110110", 1216: "0000001110111",
    1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101",
    1536: "0000001011010", 1600: "0000001011011",
    1664: "0000001100100", 1728: "0000001100101",
}

# extended make-ups 1792..2560 are COLOR-SHARED (T.4 Table 3)
EXT_MAKEUP: dict[int, str] = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 2-D mode codes
MODE_V0 = "1"
MODE_VR = {1: "011", 2: "000011", 3: "0000011"}
MODE_VL = {1: "010", 2: "000010", 3: "0000010"}
MODE_H = "001"
MODE_P = "0001"
EOL = "000000000001"  # EOFB = EOL + EOL


def _decode_map(codes: dict[int, str]) -> dict[tuple[int, int], int]:
    out: dict[tuple[int, int], int] = {}
    for run, bits in codes.items():
        out[(len(bits), int(bits, 2))] = run
    for run, bits in EXT_MAKEUP.items():
        out[(len(bits), int(bits, 2))] = run
    return out


_WHITE_MAP = _decode_map(WHITE_CODES)
_BLACK_MAP = _decode_map(BLACK_CODES)
_MODE_MAP: dict[tuple[int, int], str] = {
    (1, 1): "v0",
    (3, 0b011): "vr1", (6, 0b000011): "vr2", (7, 0b0000011): "vr3",
    (3, 0b010): "vl1", (6, 0b000010): "vl2", (7, 0b0000010): "vl3",
    (3, 0b001): "h", (4, 0b0001): "p",
    (12, 1): "eol",
}

_REV8 = bytes(int(f"{b:08b}"[::-1], 2) for b in range(256))


class _Bits:
    """MSB-first bit reader over the (FillOrder-normalized) bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def take(self, table, what: str):
        """Walk one prefix code from ``table`` (max 13 bits used by
        any T.4/T.6 code, 12 for EOL)."""
        code = 0
        d = self.data
        p = self.pos
        for length in range(1, 15):
            if p >= self.nbits:
                raise MediaFormatError(f"truncated CCITT {what} stream")
            code = (code << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
            got = table.get((length, code))
            if got is not None:
                self.pos = p
                return got
        raise MediaFormatError(f"invalid CCITT {what} code")


def _read_run(r: _Bits, white: bool) -> int:
    """One full run: make-up chain (each < 64-multiple contributes)
    terminated by a 0..63 terminating code of the same color."""
    table = _WHITE_MAP if white else _BLACK_MAP
    total = 0
    for _hop in range(16):  # >= 2560*16 pixels: nothing real
        run = r.take(table, "white run" if white else "black run")
        total += run
        if run < 64:
            return total
    raise MediaFormatError("CCITT make-up chain implausibly long")


def _decode_2d_row(r: _Bits, ref: list, width: int) -> list:
    """One T.6/T.4-2-D coded line against the reference transitions
    → the line's changing-element positions (shared by G4 and the
    2-D lines of G3)."""
    cur: list[int] = []
    a0 = -1
    color = 0  # 0 = white
    while a0 < width:
        # b1: first changing element of ref STRICTLY right of a0
        # whose transition color is opposite to a0's color — with
        # the parity convention that's the first index of
        # parity == color at position > a0
        i = 0
        n_ref = len(ref)
        while i < n_ref and (ref[i] <= a0 or (i & 1) != color):
            i += 1
        b1 = ref[i] if i < n_ref else width
        b2 = ref[i + 1] if i + 1 < n_ref else width
        mode = r.take(_MODE_MAP, "mode")
        if mode == "eol":
            # EOFB (EOL pair) ends the strip early only when the
            # picture is complete; mid-picture it's malformed
            raise MediaFormatError(
                "unexpected EOL in CCITT G4 stream"
            )
        if mode == "p":
            if b2 <= a0:  # malformed ref state: no forward progress
                raise MediaFormatError("CCITT pass mode stalls")
            a0 = b2
            continue
        if mode == "h":
            start = a0 if a0 > 0 else 0
            r1 = _read_run(r, color == 0)
            r2 = _read_run(r, color != 0)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > width or a1 > width:
                raise MediaFormatError(
                    "CCITT horizontal runs overrun the row"
                )
            if a2 <= a0 and a0 >= 0:  # zero-run stall
                raise MediaFormatError(
                    "CCITT horizontal mode stalls"
                )
            cur.append(a1)
            cur.append(a2)
            a0 = a2
            continue
        # vertical family
        if mode == "v0":
            a1 = b1
        elif mode.startswith("vr"):
            a1 = b1 + int(mode[2])
        else:
            a1 = b1 - int(mode[2])
        if a1 < 0 or a1 > width or (cur and a1 < cur[-1]):
            raise MediaFormatError(
                "CCITT vertical mode outside the row"
            )
        if a1 <= a0 and a0 >= 0:  # no forward progress
            raise MediaFormatError("CCITT vertical mode stalls")
        cur.append(a1)
        color ^= 1
        a0 = a1
    if a0 > width:
        raise MediaFormatError("CCITT row overruns its width")
    return cur


def _paint_row(out: bytearray, base: int, cur: list, width: int) -> None:
    """Transitions → pixels (odd spans are black; a trailing odd
    transition blacks to the row edge)."""
    for j in range(0, len(cur) - (len(cur) & 1), 2):
        s = cur[j]
        e = cur[j + 1]
        for x in range(s, e):
            out[base + x] = 1
    if len(cur) & 1:
        for x in range(cur[-1], width):
            out[base + x] = 1


def g4_decode(
    data: bytes, width: int, height: int, fillorder: int = 1
) -> bytearray:
    """T.6 stream → row-major bilevel pixels (1 = black).  The
    reference line starts all white each call (the TIFF per-strip
    contract).  Tolerates a trailing EOFB and pad bits."""
    if width <= 0 or height <= 0:
        raise MediaFormatError("CCITT dimensions out of range")
    if fillorder == 2:
        data = data.translate(_REV8)
    elif fillorder != 1:
        raise MediaFormatError("CCITT FillOrder outside 1/2")
    r = _Bits(data)
    out = bytearray(width * height)
    # reference line as changing-element positions; even index =
    # white→black transition.  Sentinels keep b1/b2 lookups total.
    ref = [width, width]
    for row in range(height):
        cur = _decode_2d_row(r, ref, width)
        _paint_row(out, row * width, cur, width)
        ref = cur + [width, width]
    return out


class _BitW:
    def __init__(self) -> None:
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, bits: str) -> None:
        for c in bits:
            self.acc = (self.acc << 1) | (c == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc << (8 - self.n))
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _run_bits(run: int, white: bool) -> str:
    """T.4 encoding of one run: make-ups (largest-first) + the
    terminating code."""
    table = WHITE_CODES if white else BLACK_CODES
    bits = ""
    while run >= 2560 + 64:
        bits += EXT_MAKEUP[2560]
        run -= 2560
    if run >= 64:
        mk = (run // 64) * 64
        bits += EXT_MAKEUP[mk] if mk >= 1792 else table[mk]
        run -= mk
    return bits + table[run]


def _transitions(bits, base: int, width: int) -> list[int]:
    t = []
    prev = 0
    for x in range(width):
        v = bits[base + x]
        if v != prev:
            t.append(x)
            prev = v
    return t


def g4_encode(
    bits, width: int, height: int, fillorder: int = 1,
    with_eofb: bool = False,
) -> bytes:
    """Row-major bilevel pixels (1 = black) → a T.6 stream (the
    encoder half of the closed loop; mode choice follows the
    standard b2<a1 → Pass, |a1-b1|<=3 → Vertical, else Horizontal
    rule)."""
    if len(bits) != width * height:
        raise MediaFormatError("CCITT pixel count mismatch")
    w = _BitW()
    ref = [width, width]
    for row in range(height):
        cur = _transitions(bits, row * width, width)
        curs = cur + [width, width]
        a0 = -1
        color = 0
        ci = 0  # index of the next transition (= a1 candidate)
        while a0 < width:
            a1 = curs[ci] if ci < len(curs) else width
            i = 0
            n_ref = len(ref)
            while i < n_ref and (ref[i] <= a0 or (i & 1) != color):
                i += 1
            b1 = ref[i] if i < n_ref else width
            b2 = ref[i + 1] if i + 1 < n_ref else width
            if b2 < a1:
                w.put(MODE_P)
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                if d == 0:
                    w.put(MODE_V0)
                elif d > 0:
                    w.put(MODE_VR[d])
                else:
                    w.put(MODE_VL[-d])
                a0 = a1
                color ^= 1
                ci += 1
                continue
            # horizontal: two runs from max(a0, 0)
            start = a0 if a0 > 0 else 0
            a2 = curs[ci + 1] if ci + 1 < len(curs) else width
            w.put(MODE_H)
            w.put(_run_bits(a1 - start, color == 0))
            w.put(_run_bits(a2 - a1, color != 0))
            a0 = a2
            ci += 2
        ref = cur + [width, width]
    if with_eofb:
        w.put(EOL + EOL)
    out = w.finish()
    if fillorder == 2:
        out = out.translate(_REV8)
    return out


# ---------------------------------------------------------------------------
# Modified Huffman (T.4 1-D) — TIFF Compression 2 "CCITT RLE"
# ---------------------------------------------------------------------------
# The 1-D layer under G3: each row is an alternating white/black run
# sequence (starting white — a row that begins black leads with a
# zero-length white run) over the SAME T.4 tables, with no EOL codes;
# per TIFF 6.0 §10 each row starts on a byte boundary.  Compression 3
# proper (EOL-framed G3 with optional 2-D lines) stays quarantined by
# name in tiff.py.


def mh_decode(
    data: bytes, width: int, height: int, fillorder: int = 1
) -> bytearray:
    """TIFF Compression-2 stream → row-major bilevel pixels (1 =
    black)."""
    if width <= 0 or height <= 0:
        raise MediaFormatError("CCITT dimensions out of range")
    if fillorder == 2:
        data = data.translate(_REV8)
    elif fillorder != 1:
        raise MediaFormatError("CCITT FillOrder outside 1/2")
    r = _Bits(data)
    out = bytearray(width * height)
    for row in range(height):
        # TIFF 6.0 §10: every row begins on a byte boundary
        r.pos = (r.pos + 7) & ~7
        x = 0
        white = True
        base = row * width
        while x < width:
            run = _read_run(r, white)
            if x + run > width:
                raise MediaFormatError("MH run overruns the row")
            if not white:
                for i in range(x, x + run):
                    out[base + i] = 1
            x += run
            white = not white
    return out


def mh_encode(
    bits, width: int, height: int, fillorder: int = 1
) -> bytes:
    """Row-major bilevel pixels (1 = black) → a TIFF Compression-2
    stream (byte-aligned rows)."""
    if len(bits) != width * height:
        raise MediaFormatError("CCITT pixel count mismatch")
    w = _BitW()
    for row in range(height):
        # byte-align the row start
        if w.n:
            w.put("0" * (8 - w.n))
        x = 0
        white = True
        base = row * width
        while x < width:
            run = 0
            want = 0 if white else 1
            while x + run < width and bits[base + x + run] == want:
                run += 1
            w.put(_run_bits(run, white))
            x += run
            white = not white
    out = w.finish()
    if fillorder == 2:
        out = out.translate(_REV8)
    return out


# ---------------------------------------------------------------------------
# Group 3 proper (ITU-T T.4) — TIFF Compression 3
# ---------------------------------------------------------------------------
# The EOL-framed layer: every coded line is preceded by an EOL
# (000000000001), optionally padded with fill zeros; under
# T4Options bit 0 ("2-D") each EOL carries a 1-bit mode tag
# (1 = the next line is 1-D MH, 0 = 2-D coded against the previous
# line with the same vertical/horizontal/pass modes as T.6).  A
# trailing RTC (six EOLs) is tolerated, never required — the TIFF
# strip byte count bounds the data.


def _expect_eol(r: _Bits, first: bool = False) -> bool:
    """Consume fill zeros + one EOL.  Returns False when the stream
    ends cleanly at a row boundary with no further EOL (TIFF streams
    may omit the RTC); raises mid-stream desync."""
    zeros = 0
    d = r.data
    p = r.pos
    n = r.nbits
    while True:
        if p >= n:
            if first or zeros:
                raise MediaFormatError("truncated CCITT G3 stream")
            return False
        bit = (d[p >> 3] >> (7 - (p & 7))) & 1
        p += 1
        if bit == 0:
            zeros += 1
            continue
        if zeros >= 11:
            r.pos = p
            return True
        raise MediaFormatError("CCITT G3 line sync lost")


def g3_decode(
    data: bytes, width: int, height: int, two_d: bool = False,
    fillorder: int = 1,
) -> bytearray:
    """T.4 (Group 3) stream → row-major bilevel pixels (1 = black).
    ``two_d`` mirrors T4Options bit 0: EOLs then carry the 1-bit
    1-D/2-D mode tag."""
    if width <= 0 or height <= 0:
        raise MediaFormatError("CCITT dimensions out of range")
    if fillorder == 2:
        data = data.translate(_REV8)
    elif fillorder != 1:
        raise MediaFormatError("CCITT FillOrder outside 1/2")
    r = _Bits(data)
    out = bytearray(width * height)
    if not _expect_eol(r, first=True):
        raise MediaFormatError("CCITT G3 stream lacks the first EOL")
    ref = [width, width]
    for row in range(height):
        one_d = True
        if two_d:
            if r.pos >= r.nbits:
                raise MediaFormatError("truncated CCITT G3 stream")
            one_d = bool(
                (r.data[r.pos >> 3] >> (7 - (r.pos & 7))) & 1
            )
            r.pos += 1
        if one_d:
            # MH line, collected as CHANGING-ELEMENT positions so it
            # can serve as the next 2-D line's reference
            cur: list[int] = []
            x = 0
            white = True
            while x < width:
                run = _read_run(r, white)
                if x + run > width:
                    raise MediaFormatError("MH run overruns the row")
                x += run
                if x < width:
                    cur.append(x)
                white = not white
        else:
            cur = _decode_2d_row(r, ref, width)
        _paint_row(out, row * width, cur, width)
        ref = cur + [width, width]
        if row + 1 < height:
            if not _expect_eol(r):
                raise MediaFormatError(
                    "CCITT G3 stream ends before the picture"
                )
    return out


def g3_encode(
    bits, width: int, height: int, two_d: bool = False,
    k_factor: int = 4, fillorder: int = 1,
) -> bytes:
    """Row-major bilevel pixels (1 = black) → a T.4 Group-3 stream:
    EOL before every line; under ``two_d``, every ``k_factor``-th
    line is coded 1-D (the K-factor resync discipline) and the rest
    2-D against the previous line."""
    if len(bits) != width * height:
        raise MediaFormatError("CCITT pixel count mismatch")
    w = _BitW()
    ref = [width, width]
    for row in range(height):
        base = row * width
        cur = _transitions(bits, base, width)
        one_d = not two_d or (row % max(1, k_factor) == 0)
        w.put(EOL)
        if two_d:
            w.put("1" if one_d else "0")
        if one_d:
            x = 0
            white = True
            while x < width:
                run = 0
                want = 0 if white else 1
                while x + run < width and bits[base + x + run] == want:
                    run += 1
                w.put(_run_bits(run, white))
                x += run
                white = not white
        else:
            curs = cur + [width, width]
            a0 = -1
            color = 0
            ci = 0
            while a0 < width:
                a1 = curs[ci] if ci < len(curs) else width
                i = 0
                n_ref = len(ref)
                while i < n_ref and (ref[i] <= a0 or (i & 1) != color):
                    i += 1
                b1 = ref[i] if i < n_ref else width
                b2 = ref[i + 1] if i + 1 < n_ref else width
                if b2 < a1:
                    w.put(MODE_P)
                    a0 = b2
                    continue
                d = a1 - b1
                if -3 <= d <= 3:
                    if d == 0:
                        w.put(MODE_V0)
                    elif d > 0:
                        w.put(MODE_VR[d])
                    else:
                        w.put(MODE_VL[-d])
                    a0 = a1
                    color ^= 1
                    ci += 1
                    continue
                start = a0 if a0 > 0 else 0
                a2 = curs[ci + 1] if ci + 1 < len(curs) else width
                w.put(MODE_H)
                w.put(_run_bits(a1 - start, color == 0))
                w.put(_run_bits(a2 - a1, color != 0))
                a0 = a2
                ci += 2
        ref = cur + [width, width]
    out = w.finish()
    if fillorder == 2:
        out = out.translate(_REV8)
    return out
