"""A/B byte-identity harness for the JPEG decoders (round 14).

Usage (from the repo root):
    python tools/jpeg_ab.py ref   # on COMMITTED code: save references
    <edit the decoder>
    python tools/jpeg_ab.py cmp   # byte-compare 160 streams, exit 1 on drift

Corpus: house 4:4:4 at all qualities/sizes/restart intervals,
hand-rolled grayscale / 4:2:0 / 4:2:2 / 4:4:0 / restart streams (the
sampling shapes the house encoder cannot emit), and 48 progressive
streams.  References land in /tmp/jpeg_ref.pkl.  This is the
byte-identity contract every JPEG hot-path change must pass — the
oracle gates then re-prove it against DuckDB-recomputed hashes.
"""
import hashlib
import pickle
import struct
import sys

import numpy as np

from reindexer_spark import codecs as C
from reindexer_spark.codecs import (
    _BitWriter, _DCT, _ZIGZAG, _canonical_codes, _encode_block,
    _quality_tables, _seg, _dht,
)
from reindexer_spark.codecs import (
    _HUFF_DC_LUMA, _HUFF_AC_LUMA, _HUFF_DC_CHROMA, _HUFF_AC_CHROMA,
)


def px(n, tag):
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(tag + str(i).encode()).digest()
        i += 1
    return bytes(out[:n])


def gradient(w, h):
    a = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            a[y, x] = ((x * 255) // max(1, w - 1), (y * 255) // max(1, h - 1), 128)
    return a.tobytes()


def _fdct_quant(plane, qt):
    """plane (8-multiple dims, float64, level-shifted NOT yet) ->
    (bh,bw,64) zigzag quantized int blocks, mirroring _forward_blocks."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    out = np.zeros((bh, bw, 64), np.int64)
    q = qt.reshape(8, 8)
    for by in range(bh):
        for bx in range(bw):
            blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coef = _DCT @ blk @ _DCT.T * 4.0
            qq = np.round(coef / q).astype(np.int64)
            out[by, bx] = qq.reshape(64)[np.argsort(_ZIGZAG)] if False else qq.reshape(64)[_ZIGZAG_INV]
    return out


_ZIGZAG_INV = np.asarray(C._ZIGZAG)  # natural->? we need zigzag order list


def make_custom(width, height, rgb, quality, samplings, ncomp=3, restart=0):
    """Hand-rolled encoder supporting grayscale and subsampling.
    samplings: list of (h,v) per component."""
    a = np.frombuffer(rgb, np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [y, cb, cr][:ncomp]
    qy, qc = _quality_tables(quality)
    hmax = max(s[0] for s in samplings[:ncomp])
    vmax = max(s[1] for s in samplings[:ncomp])
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    comp_blocks = []
    for ci in range(ncomp):
        hs, vs = samplings[ci]
        # subsample by box averaging then pad to mcu grid
        p = planes[ci]
        if hs != hmax or vs != vmax:
            fh, fv = hmax // hs, vmax // vs
            ph = (height + fv - 1) // fv
            pw = (width + fh - 1) // fh
            pp = np.zeros((ph, pw))
            for yy in range(ph):
                for xx in range(pw):
                    pp[yy, xx] = p[yy * fv:(yy + 1) * fv, xx * fh:(xx + 1) * fh].mean()
            p = pp
        th, tw = mcuy * vs * 8, mcux * hs * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        qt = qy if ci == 0 else qc
        comp_blocks.append(_fdct_quant(p, qt))
    # headers
    out = bytearray(b"\xff\xd8")
    dqt = bytes([0]) + bytes(int(v) for v in qy[_ZIGZAG_ORDER])
    out += _seg(0xDB, dqt)
    if ncomp == 3:
        out += _seg(0xDB, bytes([1]) + bytes(int(v) for v in qc[_ZIGZAG_ORDER]))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samplings[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _dht(0, 0, _HUFF_DC_LUMA)
    out += _dht(1, 0, _HUFF_AC_LUMA)
    if ncomp == 3:
        out += _dht(0, 1, _HUFF_DC_CHROMA)
        out += _dht(1, 1, _HUFF_AC_CHROMA)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    dc_l = _canonical_codes(*_HUFF_DC_LUMA)
    ac_l = _canonical_codes(*_HUFF_AC_LUMA)
    dc_c = _canonical_codes(*_HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*_HUFF_AC_CHROMA)
    w = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu and mcu % restart == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = samplings[ci]
                for by in range(vs):
                    for bx in range(hs):
                        preds[ci] = _encode_block(
                            w, comp_blocks[ci][my * vs + by, mx * hs + bx],
                            preds[ci],
                            dc_l if ci == 0 else dc_c,
                            ac_l if ci == 0 else ac_c,
                        )
            mcu += 1
    w.flush()
    out += w.out + b"\xff\xd9"
    return bytes(out)


_ZIGZAG_ORDER = None  # zigzag-ordered index into natural table


def corpus():
    global _ZIGZAG_ORDER, _ZIGZAG_INV
    # _ZIGZAG maps zigzag position -> natural index (inv[_ZIGZAG] = vals)
    _ZIGZAG_ORDER = np.asarray(C._ZIGZAG)
    _ZIGZAG_INV = np.asarray(C._ZIGZAG)
    items = []
    sizes = [(8, 8), (16, 16), (31, 24), (40, 24), (96, 64), (97, 65), (129, 33)]
    for (w, h) in sizes:
        noise = px(w * h * 3, b"n%d" % w)
        grad = gradient(w, h)
        for q in (10, 50, 75, 95):
            items.append(("house", C.encode_jpeg_baseline(w, h, noise, q)))
            items.append(("house", C.encode_jpeg_baseline(w, h, grad, q)))
        for ri in (1, 2, 7):
            items.append(("house-rst", C.encode_jpeg_baseline(w, h, noise, 80, restart_interval=ri)))
        # custom: grayscale, 4:2:0, 4:2:2 (2x1), 1x2, mixed
        items.append(("gray", make_custom(w, h, noise, 75, [(1, 1)], ncomp=1)))
        items.append(("420", make_custom(w, h, noise, 75, [(2, 2), (1, 1), (1, 1)])))
        items.append(("422", make_custom(w, h, grad, 85, [(2, 1), (1, 1), (1, 1)])))
        items.append(("440", make_custom(w, h, noise, 60, [(1, 2), (1, 1), (1, 1)])))
        items.append(("420-rst", make_custom(w, h, grad, 75, [(2, 2), (1, 1), (1, 1)], restart=3)))
    # progressive house streams (shared _planes_to_rgb / recon path)
    for (w, h) in [(16, 16), (40, 24), (96, 64), (97, 65), (129, 33), (8, 8)]:
        for q in (10, 50, 75, 95):
            items.append(("prog", C.encode_jpeg_progressive(w, h, px(w * h * 3, b"p%d" % q), q)))
            items.append(("prog-g", C.encode_jpeg_progressive(w, h, gradient(w, h), q)))
    return items


def main():
    mode = sys.argv[1]
    items = corpus()
    if mode == "ref":
        ref = []
        for kind, payload in items:
            try:
                out = C.decode_jpeg_baseline(payload)
                ref.append((kind, hashlib.sha256(payload).hexdigest(), out[0], out[1], hashlib.sha256(out[2]).hexdigest()))
            except C.MediaFormatError as e:
                ref.append((kind, hashlib.sha256(payload).hexdigest(), "ERR", str(e), None))
        with open("/tmp/jpeg_ref.pkl", "wb") as fh:
            pickle.dump(ref, fh)
        print(f"saved {len(ref)} reference outputs")
        errs = [r for r in ref if r[2] == "ERR"]
        print(f"errors in corpus: {len(errs)}", errs[:3])
    else:
        with open("/tmp/jpeg_ref.pkl", "rb") as fh:
            ref = pickle.load(fh)
        bad = 0
        for (kind, payload), r in zip(items, ref):
            ph = hashlib.sha256(payload).hexdigest()
            assert ph == r[1], f"corpus drift {kind}"
            try:
                out = C.decode_jpeg_baseline(payload)
                got = (kind, ph, out[0], out[1], hashlib.sha256(out[2]).hexdigest())
            except C.MediaFormatError as e:
                got = (kind, ph, "ERR", str(e), None)
            if got != r:
                bad += 1
                print("MISMATCH", kind, "ref:", r[2:], "got:", got[2:])
        print(f"{len(ref) - bad}/{len(ref)} byte-identical")
        sys.exit(1 if bad else 0)


main()
