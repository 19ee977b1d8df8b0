"""Standalone prototype harness for the JPEG baseline entropy-loop
rewrite (round-16 throughput ask).  Times candidate inner-loop shapes
against the CURRENT safe-zone loop on the bench's own noise fixture,
decoding the same coefficient stream and asserting identical output.
Not imported by the package — a measurement tool only."""

import hashlib
import time
import array
import sys

sys.path.insert(0, "/root/repo")
from reindexer_spark import codecs as C


def px(n, tag):
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(tag + str(i).encode()).digest()
        i += 1
    return bytes(out[:n])


W, H = 96, 64
PAYLOAD = C.encode_jpeg_baseline(W, H, px(W * H * 3, b"i"), 85)


def setup():
    """Parse headers exactly like _decode_jpeg_impl up to SOS."""
    import struct

    payload = PAYLOAD
    pos = 2
    qtabs = {}
    htabs = {}
    comps = []
    width = height = 0
    scan_comps = []
    import numpy as np

    while pos + 4 <= len(payload):
        marker = payload[pos + 1]
        length = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                tq = body[i] & 0xF
                vals = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qtabs[tq] = vals
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htabs[(tc, th)] = C._huff_decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):
            height, width = struct.unpack(">HH", body[1:5])
            nf = body[5]
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker == 0xDA:
            ns = body[0]
            for c in range(ns):
                cs, tabs = body[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan_comps.append({**comp, "dc": tabs >> 4, "ac": tabs & 0xF})
            pos = pos + 2 + length
            break
        pos = pos + 2 + length
    segments, ended_by_rst, _ = C._jpeg_scan_segments(payload, pos)
    return scan_comps, htabs, segments[0], width, height


SCAN, HTABS, DATA, WIDTH, HEIGHT = setup()
MCUS_X = (WIDTH + 7) // 8
MCUS_Y = (HEIGHT + 7) // 8
N_MCU = MCUS_X * MCUS_Y


def loop_current():
    """Replica of today's safe-zone loop (slice-assign into coefs)."""
    comp_state = []
    for c in SCAN:
        dc_tab = HTABS[(0, c["dc"])]
        ac_tab = HTABS[(1, c["ac"])]
        coefs = array.array("q")
        comp_state.append(
            (c, coefs, C._dc_fast_lut(dc_tab), C._ac_mega_lut(ac_tab))
        )
    ac_mega_map = [HTABS[(1, c["ac"])].map for c in SCAN]
    words = C._jpeg_words48(DATA)
    dpos = 0
    acc = 0
    nbits = 0
    preds = [0, 0, 0]
    Z64 = array.array("q", [0] * 64)
    for _ in range(N_MCU):
        for ci, (c, coefs, dc_fast, ac_mega) in enumerate(comp_state):
            pred = preds[ci]
            coefs.extend(Z64)
            base = len(coefs) - 64
            if nbits < 16:
                acc = ((acc << 48) | words[dpos // 6]) & 0xFFFFFFFFFFFFFFFF
                dpos += 6
                nbits += 48
            e = dc_fast[(acc >> (nbits - 16)) & 0xFFFF]
            nbits -= e[0]
            pred += e[1]
            coefs[base] = pred
            preds[ci] = pred
            ac_map = ac_mega_map[ci]
            k = 1
            while k < 64:
                if nbits < 16:
                    acc = ((acc << 48) | words[dpos // 6]) & 0xFFFFFFFFFFFFFFFF
                    dpos += 6
                    nbits += 48
                e = ac_mega[(acc >> (nbits - 16)) & 0xFFFF]
                if e is not None:
                    t, ka, zs, term, pref = e
                    if k + ka < 64:
                        nbits -= t
                        if ka:
                            bk = base + k
                            coefs[bk : bk + ka] = zs
                            k += ka
                        if term:
                            break
                        continue
                    stopped = False
                    for pk, pc, pz, pv in pref:
                        nk = k + pk
                        if nk >= 64:
                            L = 64 - k
                            if L:
                                coefs[base + k : base + 64] = pz[:L]
                            nbits -= pc
                            k = 64
                            stopped = True
                            break
                    if stopped:
                        break
                    nbits -= t
                    if term:
                        break
                    continue
                if nbits < 32:
                    acc = ((acc << 48) | words[dpos // 6]) & 0xFFFFFFFFFFFFFFFFFFFF
                    dpos += 6
                    nbits += 48
                window = (acc >> (nbits - 16)) & 0xFFFF
                rs = -1
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | ((window >> (16 - length)) & 1)
                    sym = ac_map.get((length, code))
                    if sym is not None:
                        rs = sym
                        nbits -= length
                        break
                if rs < 0:
                    raise RuntimeError("bad code")
                if rs == 0x00:
                    break
                if rs == 0xF0:
                    k += 16
                    continue
                k += rs >> 4
                ssss = rs & 0xF
                if k > 63:
                    raise RuntimeError("range")
                nbits -= ssss
                v = (acc >> nbits) & ((1 << ssss) - 1)
                coefs[base + k] = v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1
                k += 1
                continue
    return [cs[1] for cs in comp_state]


_PADS = [array.array("q", [0] * n) for n in range(65)]


def loop_append():
    """Variant A: append-only pieces, no slice assignment, pad at EOB."""
    comp_state = []
    for c in SCAN:
        dc_tab = HTABS[(0, c["dc"])]
        ac_tab = HTABS[(1, c["ac"])]
        comp_state.append(
            ([], C._dc_fast_lut(dc_tab), C._ac_mega_lut(ac_tab))
        )
    ac_mega_map = [HTABS[(1, c["ac"])].map for c in SCAN]
    words = C._jpeg_words48(DATA)
    wi = 0
    acc = 0
    nbits = 0
    preds = [0, 0, 0]
    pads = _PADS
    for _ in range(N_MCU):
        for ci, (parts, dc_fast, ac_mega) in enumerate(comp_state):
            ap = parts.append
            if nbits < 16:
                acc = ((acc << 48) | words[wi]) & 0xFFFFFFFFFFFFFFFF
                wi += 1
                nbits += 48
            e = dc_fast[(acc >> (nbits - 16)) & 0xFFFF]
            nbits -= e[0]
            pred = preds[ci] + e[1]
            preds[ci] = pred
            ap(array.array("q", (pred,)))
            ac_map = ac_mega_map[ci]
            k = 1
            while True:
                if nbits < 16:
                    acc = ((acc << 48) | words[wi]) & 0xFFFFFFFFFFFFFFFF
                    wi += 1
                    nbits += 48
                e = ac_mega[(acc >> (nbits - 16)) & 0xFFFF]
                if e is not None:
                    t, ka, zs, term, pref = e
                    nk = k + ka
                    if nk < 64:
                        nbits -= t
                        if ka:
                            ap(zs)
                            k = nk
                        if term:
                            ap(pads[64 - k])
                            break
                        continue
                    stopped = False
                    for pk, pc, pz, pv in pref:
                        if k + pk >= 64:
                            L = 64 - k
                            if L:
                                ap(pz[:L])
                            nbits -= pc
                            stopped = True
                            break
                    if stopped:
                        break
                    nbits -= t
                    if term:
                        ap(pads[64 - nk])
                        break
                    k = nk
                    continue
                slow = True
                if nbits < 32:
                    acc = ((acc << 48) | words[wi]) & 0xFFFFFFFFFFFFFFFFFFFF
                    wi += 1
                    nbits += 48
                window = (acc >> (nbits - 16)) & 0xFFFF
                rs = -1
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | ((window >> (16 - length)) & 1)
                    sym = ac_map.get((length, code))
                    if sym is not None:
                        rs = sym
                        nbits -= length
                        break
                if rs < 0:
                    raise RuntimeError("bad code")
                if rs == 0x00:
                    ap(pads[64 - k])
                    break
                if rs == 0xF0:
                    ap(pads[16])
                    k += 16
                    continue
                run = rs >> 4
                ssss = rs & 0xF
                nk = k + run
                if nk > 63:
                    raise RuntimeError("range")
                nbits -= ssss
                v = (acc >> nbits) & ((1 << ssss) - 1)
                val = v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1
                pc = pads[run] + array.array("q", (val,))
                ap(pc)
                k = nk + 1
                if k >= 64:
                    break
                continue
    return [cs[0] for cs in comp_state]


def loop_append_small():
    """Variant B: append-only + single-digit (<2^30) accumulator with
    16-bit refills from a precomputed word list."""
    comp_state = []
    for c in SCAN:
        dc_tab = HTABS[(0, c["dc"])]
        ac_tab = HTABS[(1, c["ac"])]
        comp_state.append(
            ([], C._dc_fast_lut(dc_tab), C._ac_mega_lut(ac_tab))
        )
    import numpy as np

    d = DATA + b"\x00" * ((-len(DATA)) % 2 + 4)
    ac_mega_map = [HTABS[(1, c["ac"])].map for c in SCAN]
    data = DATA + b"\x00" * 8
    wi = 0
    acc = 0
    nbits = 0
    preds = [0, 0, 0]
    pads = _PADS
    for _ in range(N_MCU):
        for ci, (parts, dc_fast, ac_mega) in enumerate(comp_state):
            ap = parts.append
            while nbits < 16:
                acc = ((acc << 8) | data[wi]) & 0x7FFFFF
                wi += 1
                nbits += 8
            e = dc_fast[(acc >> (nbits - 16)) & 0xFFFF]
            nbits -= e[0]
            pred = preds[ci] + e[1]
            preds[ci] = pred
            ap(array.array("q", (pred,)))
            ac_map = ac_mega_map[ci]
            k = 1
            while True:
                while nbits < 16:
                    acc = ((acc << 8) | data[wi]) & 0x7FFFFF
                    wi += 1
                    nbits += 8
                e = ac_mega[(acc >> (nbits - 16)) & 0xFFFF]
                if e is not None:
                    t, ka, zs, term, pref = e
                    nk = k + ka
                    if nk < 64:
                        nbits -= t
                        if ka:
                            ap(zs)
                            k = nk
                        if term:
                            ap(pads[64 - k])
                            break
                        continue
                    stopped = False
                    for pk, pc, pz, pv in pref:
                        if k + pk >= 64:
                            L = 64 - k
                            if L:
                                ap(pz[:L])
                            nbits -= pc
                            stopped = True
                            break
                    if stopped:
                        break
                    nbits -= t
                    if term:
                        ap(pads[64 - nk])
                        break
                    k = nk
                    continue
                slow = True
                while nbits < 27:
                    acc = (acc << 8) | data[wi]
                    wi += 1
                    nbits += 8
                acc &= (1 << nbits) - 1
                window = (acc >> (nbits - 16)) & 0xFFFF
                rs = -1
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | ((window >> (16 - length)) & 1)
                    sym = ac_map.get((length, code))
                    if sym is not None:
                        rs = sym
                        nbits -= length
                        break
                if rs < 0:
                    raise RuntimeError("bad code")
                if rs == 0x00:
                    ap(pads[64 - k])
                    break
                if rs == 0xF0:
                    ap(pads[16])
                    k += 16
                    continue
                run = rs >> 4
                ssss = rs & 0xF
                nk = k + run
                if nk > 63:
                    raise RuntimeError("range")
                nbits -= ssss
                v = (acc >> nbits) & ((1 << ssss) - 1)
                val = v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1
                pc = pads[run] + array.array("q", (val,))
                ap(pc)
                k = nk + 1
                if k >= 64:
                    break
                continue
    return [cs[0] for cs in comp_state]



def loop_append2():
    """Variant C: append-only + hoisted bound appends + DC kept in a
    plain int list (no per-block array alloc) + double-lookup unroll."""
    comp_state = []
    for ci, c in enumerate(SCAN):
        dc_tab = HTABS[(0, c["dc"])]
        ac_tab = HTABS[(1, c["ac"])]
        parts = []
        dcs = []
        comp_state.append(
            (
                parts,
                parts.append,
                dcs.append,
                C._dc_fast_lut(dc_tab),
                C._ac_mega_lut(ac_tab),
                ac_tab.map,
                ci,
                dcs,
            )
        )
    words = C._jpeg_words48(DATA)
    wi = 0
    acc = 0
    nbits = 0
    preds = [0, 0, 0]
    pads = _PADS
    for _ in range(N_MCU):
        for parts, ap, dcap, dc_fast, ac_mega, ac_map, ci, dcs in comp_state:
            if nbits < 16:
                acc = ((acc << 48) | words[wi]) & 0xFFFFFFFFFFFFFFFF
                wi += 1
                nbits += 48
            e = dc_fast[(acc >> (nbits - 16)) & 0xFFFF]
            nbits -= e[0]
            pred = preds[ci] + e[1]
            preds[ci] = pred
            dcap(pred)
            k = 1
            while True:
                if nbits < 16:
                    acc = ((acc << 48) | words[wi]) & 0xFFFFFFFFFFFFFFFF
                    wi += 1
                    nbits += 48
                e = ac_mega[(acc >> (nbits - 16)) & 0xFFFF]
                if e is not None:
                    t, ka, zs, term, pref = e
                    nk = k + ka
                    if nk < 64:
                        nbits -= t
                        if ka:
                            ap(zs)
                            k = nk
                        if term:
                            ap(pads[64 - k])
                            break
                        # unrolled second resolution in the same
                        # iteration: halves while/continue overhead
                        if nbits < 16:
                            acc = ((acc << 48) | words[wi]) & 0xFFFFFFFFFFFFFFFF
                            wi += 1
                            nbits += 48
                        e = ac_mega[(acc >> (nbits - 16)) & 0xFFFF]
                        if e is None:
                            pass
                        else:
                            t, ka, zs, term, pref = e
                            nk = k + ka
                            if nk < 64:
                                nbits -= t
                                if ka:
                                    ap(zs)
                                    k = nk
                                if term:
                                    ap(pads[64 - k])
                                    break
                                continue
                            stopped = False
                            for pk, pc, pz, pv in pref:
                                if k + pk >= 64:
                                    L = 64 - k
                                    if L:
                                        ap(pz[:L])
                                    nbits -= pc
                                    stopped = True
                                    break
                            if stopped:
                                break
                            nbits -= t
                            if term:
                                ap(pads[64 - nk])
                                break
                            k = nk
                        continue
                    stopped = False
                    for pk, pc, pz, pv in pref:
                        if k + pk >= 64:
                            L = 64 - k
                            if L:
                                ap(pz[:L])
                            nbits -= pc
                            stopped = True
                            break
                    if stopped:
                        break
                    nbits -= t
                    if term:
                        ap(pads[64 - nk])
                        break
                    k = nk
                    continue
                if nbits < 32:
                    acc = ((acc << 48) | words[wi]) & 0xFFFFFFFFFFFFFFFFFFFF
                    wi += 1
                    nbits += 48
                window = (acc >> (nbits - 16)) & 0xFFFF
                rs = -1
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | ((window >> (16 - length)) & 1)
                    sym = ac_map.get((length, code))
                    if sym is not None:
                        rs = sym
                        nbits -= length
                        break
                if rs < 0:
                    raise RuntimeError("bad code")
                if rs == 0x00:
                    ap(pads[64 - k])
                    break
                if rs == 0xF0:
                    ap(pads[16])
                    k += 16
                    continue
                run = rs >> 4
                ssss = rs & 0xF
                nk = k + run
                if nk > 63:
                    raise RuntimeError("range")
                nbits -= ssss
                v = (acc >> nbits) & ((1 << ssss) - 1)
                val = v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1
                pc2 = pads[run] + array.array("q", (val,))
                ap(pc2)
                k = nk + 1
                if k >= 64:
                    break
                continue
    return [(cs[0], cs[7]) for cs in comp_state]


def check_equal_dc(a_coefs, b):
    for ca, (pb, dcs) in zip(a_coefs, b):
        joined = array.array("q")
        for di, d in enumerate(dcs):
            joined.append(d)
        # interleave: parts hold 63 AC per block
        acs = array.array("q")
        for p in pb:
            acs.extend(p)
        assert len(acs) == 63 * len(dcs), (len(acs), len(dcs))
        out = array.array("q")
        for bi, d in enumerate(dcs):
            out.append(d)
            out.extend(acs[bi * 63 : bi * 63 + 63])
        assert ca == out, "MISMATCH C"


def check_equal(a_coefs, b_parts):
    for ca, pb in zip(a_coefs, b_parts):
        joined = array.array("q")
        for p in pb:
            joined.extend(p)
        assert ca == joined, "MISMATCH"


def bench(fn, secs=1.0):
    fn()
    reps = 0
    t0 = time.perf_counter()
    while True:
        fn()
        reps += 1
        dt = time.perf_counter() - t0
        if dt >= secs:
            return len(PAYLOAD) * reps / dt / 1e6


if __name__ == "__main__":
    ref = loop_current()
    check_equal(ref, loop_append())
    check_equal(ref, loop_append_small())
    check_equal_dc(ref, loop_append2())
    print("equal OK")
    for name, fn in [
        ("current", loop_current),
        ("append", loop_append),
        ("append_small", loop_append_small),
        ("append2", loop_append2),
    ]:
        print(f"{name}: {bench(fn):.2f} MB/s (entropy loop only)")

# ---- Variant D: bytes pieces + b"".join assembly (round-16) ----
import numpy as _np

_MB_CACHE: dict = {}


def mega_bytes(ac_mega):
    key = id(ac_mega)
    hit = _MB_CACHE.get(key)
    if hit is not None:
        return hit
    out = [None] * 65536
    memo = {}
    for i, e in enumerate(ac_mega):
        if e is None:
            continue
        t, ka, zs, term, pref = e
        k2 = id(e)
        ent = memo.get(k2)
        if ent is None:
            zb = _np.asarray(zs, dtype="<i8").tobytes() if ka else b""
            prefb = tuple(
                (pk, pc, _np.asarray(pz, dtype="<i8").tobytes(), pv)
                for pk, pc, pz, pv in pref
            )
            ent = (t, ka, zb, term, prefb)
            memo[k2] = ent
        out[i] = ent
    _MB_CACHE[key] = out
    return out


PADS_B = [b"\x00" * (8 * n) for n in range(65)]


def loop_bytes():
    comp_state = []
    for ci, c in enumerate(SCAN):
        dc_tab = HTABS[(0, c["dc"])]
        ac_tab = HTABS[(1, c["ac"])]
        parts = []
        dcs = []
        comp_state.append(
            (parts, parts.append, dcs.append, C._dc_fast_lut(dc_tab),
             mega_bytes(C._ac_mega_lut(ac_tab)), ac_tab.map, ci, dcs)
        )
    words = C._jpeg_words48(DATA)
    wi = 0
    acc = 0
    nbits = 0
    preds = [0, 0, 0]
    pads = PADS_B
    for _ in range(N_MCU):
        for parts, ap, dcap, dc_fast, ac_mega, ac_map, ci, dcs in comp_state:
            if nbits < 16:
                acc = ((acc << 48) | words[wi]) & 0xFFFFFFFFFFFFFFFF
                wi += 1
                nbits += 48
            e = dc_fast[(acc >> (nbits - 16)) & 0xFFFF]
            nbits -= e[0]
            pred = preds[ci] + e[1]
            preds[ci] = pred
            dcap(pred)
            k = 1
            while True:
                if nbits < 16:
                    acc = ((acc << 48) | words[wi]) & 0xFFFFFFFFFFFFFFFF
                    wi += 1
                    nbits += 48
                e = ac_mega[(acc >> (nbits - 16)) & 0xFFFF]
                if e is not None:
                    t, ka, zs, term, pref = e
                    nk = k + ka
                    if nk < 64:
                        nbits -= t
                        if ka:
                            ap(zs)
                            k = nk
                        if term:
                            ap(pads[64 - k])
                            break
                        if nbits < 16:
                            acc = ((acc << 48) | words[wi]) & 0xFFFFFFFFFFFFFFFF
                            wi += 1
                            nbits += 48
                        e = ac_mega[(acc >> (nbits - 16)) & 0xFFFF]
                        if e is not None:
                            t, ka, zs, term, pref = e
                            nk = k + ka
                            if nk < 64:
                                nbits -= t
                                if ka:
                                    ap(zs)
                                    k = nk
                                if term:
                                    ap(pads[64 - k])
                                    break
                                continue
                            stopped = False
                            for pk, pc, pz, pv in pref:
                                if k + pk >= 64:
                                    L = 64 - k
                                    if L:
                                        ap(pz[: 8 * L])
                                    nbits -= pc
                                    stopped = True
                                    break
                            if stopped:
                                break
                            nbits -= t
                            if term:
                                ap(pads[64 - nk])
                                break
                            k = nk
                        continue
                    stopped = False
                    for pk, pc, pz, pv in pref:
                        if k + pk >= 64:
                            L = 64 - k
                            if L:
                                ap(pz[: 8 * L])
                            nbits -= pc
                            stopped = True
                            break
                    if stopped:
                        break
                    nbits -= t
                    if term:
                        ap(pads[64 - nk])
                        break
                    k = nk
                    continue
                if nbits < 32:
                    acc = ((acc << 48) | words[wi]) & 0xFFFFFFFFFFFFFFFFFFFF
                    wi += 1
                    nbits += 48
                window = (acc >> (nbits - 16)) & 0xFFFF
                rs = -1
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | ((window >> (16 - length)) & 1)
                    sym = ac_map.get((length, code))
                    if sym is not None:
                        rs = sym
                        nbits -= length
                        break
                if rs < 0:
                    raise RuntimeError("bad code")
                if rs == 0x00:
                    ap(pads[64 - k])
                    break
                if rs == 0xF0:
                    ap(pads[16])
                    k += 16
                    continue
                run = rs >> 4
                ssss = rs & 0xF
                nk = k + run
                if nk > 63:
                    raise RuntimeError("range")
                nbits -= ssss
                v = (acc >> nbits) & ((1 << ssss) - 1)
                val = v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1
                ap(pads[run] + val.to_bytes(8, "little", signed=True))
                k = nk + 1
                if k >= 64:
                    break
                continue
    out = []
    for parts, ap, dcap, dc_fast, ac_mega, ac_map, ci, dcs in comp_state:
        acs = _np.frombuffer(b"".join(parts), dtype="<i8").reshape(-1, 63)
        full = _np.empty((len(dcs), 64), dtype=_np.int64)
        full[:, 0] = dcs
        full[:, 1:] = acs
        out.append(full)
    return out


def cur_full():
    r = loop_current()
    return [_np.asarray(x).reshape(-1, 64) for x in r]

# ---- Variant E: fused DC+AC block-start LUT + junk-free acc ----
_FUSED_CACHE: dict = {}


def fused_lut(dc_tab, ac_tab):
    """window(16b) -> (total_bits, dc_diff, ka, zs_bytes, term) | None
    for a BLOCK START: DC symbol+magnitude folded with as many complete
    AC ops as fit in the remaining window bits (capped so k=1+ka can
    never reach 64 -- no rollback path needed)."""
    key = (dc_tab.key, ac_tab.key)
    hit = _FUSED_CACHE.get(key)
    if hit is not None:
        return hit
    dc_fast = C._dc_fast_lut(dc_tab)
    ac_base = C._ac_fast_lut(ac_tab)
    lut = [None] * 65536
    memo = {}
    for w in range(65536):
        d = dc_fast[w]
        if d is None:
            continue
        t0, diff = d
        total = t0
        r = 16 - t0
        cumk = 0
        zs = []
        term = 0
        cur = (w & ((1 << r) - 1)) << (16 - r) if r else 0
        while r:
            e = ac_base[cur]
            if e is None or e[0] > r:
                break
            t, ka, val = e
            if ka < 0:  # EOB
                total += t
                term = 1
                break
            adv = (ka + 1) if val is not None else 16
            if cumk + adv > 62:
                break
            total += t
            r -= t
            if val is not None:
                zs.extend((0,) * ka)
                zs.append(val)
            else:
                zs.extend((0,) * 16)
            cumk += adv
            cur = (w & ((1 << r) - 1)) << (16 - r) if r else 0
        ent_key = (total, diff, cumk, tuple(zs), term)
        ent = memo.get(ent_key)
        if ent is None:
            ent = (
                total,
                diff,
                cumk,
                _np.asarray(zs, dtype="<i8").tobytes() if zs else b"",
                term,
            )
            memo[ent_key] = ent
        lut[w] = ent
    _FUSED_CACHE[key] = lut
    return lut


def loop_fused():
    comp_state = []
    for ci, c in enumerate(SCAN):
        dc_tab = HTABS[(0, c["dc"])]
        ac_tab = HTABS[(1, c["ac"])]
        parts = []
        dcs = []
        comp_state.append(
            (parts.append, dcs.append, fused_lut(dc_tab, ac_tab),
             mega_bytes(C._ac_mega_lut(ac_tab)), ac_tab.map, ci,
             dc_tab.map, parts, dcs)
        )
    words = C._jpeg_words48(DATA)
    wi = 0
    acc = 0
    nbits = 0
    preds = [0, 0, 0]
    pads = PADS_B
    for _ in range(N_MCU):
        for ap, dcap, fused, ac_mega, ac_map, ci, dc_map, parts, dcs in comp_state:
            if nbits < 16:
                acc = ((acc & 0xFFFF) << 48) | words[wi]
                wi += 1
                nbits += 48
            e = fused[(acc >> (nbits - 16)) & 0xFFFF]
            if e is not None:
                t, diff, ka, zs, term = e
                nbits -= t
                pred = preds[ci] + diff
                preds[ci] = pred
                dcap(pred)
                if term:
                    ap(zs)
                    ap(pads[63 - ka])
                    continue
                ap(zs)
                k = 1 + ka
            else:
                # careful DC (rare: DC code+magnitude > 16 bits)
                if nbits < 32:
                    acc = ((acc & 0xFFFFFFFF) << 48) | words[wi]
                    wi += 1
                    nbits += 48
                window = (acc >> (nbits - 16)) & 0xFFFF
                s = -1
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | ((window >> (16 - length)) & 1)
                    sym = dc_map.get((length, code))
                    if sym is not None:
                        s = sym
                        nbits -= length
                        break
                if s < 0 or s > 15:
                    raise RuntimeError("bad DC")
                diff = 0
                if s:
                    nbits -= s
                    v = (acc >> nbits) & ((1 << s) - 1)
                    diff = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                pred = preds[ci] + diff
                preds[ci] = pred
                dcap(pred)
                k = 1
            while True:
                if nbits < 16:
                    acc = ((acc & 0xFFFF) << 48) | words[wi]
                    wi += 1
                    nbits += 48
                e = ac_mega[(acc >> (nbits - 16)) & 0xFFFF]
                if e is not None:
                    t, ka, zs, term, pref = e
                    nk = k + ka
                    if nk < 64:
                        nbits -= t
                        if ka:
                            ap(zs)
                            k = nk
                        if term:
                            ap(pads[64 - k])
                            break
                        if nbits < 16:
                            acc = ((acc & 0xFFFF) << 48) | words[wi]
                            wi += 1
                            nbits += 48
                        e = ac_mega[(acc >> (nbits - 16)) & 0xFFFF]
                        if e is not None:
                            t, ka, zs, term, pref = e
                            nk = k + ka
                            if nk < 64:
                                nbits -= t
                                if ka:
                                    ap(zs)
                                    k = nk
                                if term:
                                    ap(pads[64 - k])
                                    break
                                continue
                            stopped = False
                            for pk, pc, pz, pv in pref:
                                if k + pk >= 64:
                                    L = 64 - k
                                    if L:
                                        ap(pz[: 8 * L])
                                    nbits -= pc
                                    stopped = True
                                    break
                            if stopped:
                                break
                            nbits -= t
                            if term:
                                ap(pads[64 - nk])
                                break
                            k = nk
                        continue
                    stopped = False
                    for pk, pc, pz, pv in pref:
                        if k + pk >= 64:
                            L = 64 - k
                            if L:
                                ap(pz[: 8 * L])
                            nbits -= pc
                            stopped = True
                            break
                    if stopped:
                        break
                    nbits -= t
                    if term:
                        ap(pads[64 - nk])
                        break
                    k = nk
                    continue
                if nbits < 32:
                    acc = ((acc & 0xFFFFFFFF) << 48) | words[wi]
                    wi += 1
                    nbits += 48
                window = (acc >> (nbits - 16)) & 0xFFFF
                rs = -1
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | ((window >> (16 - length)) & 1)
                    sym = ac_map.get((length, code))
                    if sym is not None:
                        rs = sym
                        nbits -= length
                        break
                if rs < 0:
                    raise RuntimeError("bad code")
                if rs == 0x00:
                    ap(pads[64 - k])
                    break
                if rs == 0xF0:
                    ap(pads[16])
                    k += 16
                    continue
                run = rs >> 4
                ssss = rs & 0xF
                nk = k + run
                if nk > 63:
                    raise RuntimeError("range")
                nbits -= ssss
                v = (acc >> nbits) & ((1 << ssss) - 1)
                val = v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1
                ap(pads[run] + val.to_bytes(8, "little", signed=True))
                k = nk + 1
                if k >= 64:
                    break
                continue
    out = []
    for ap, dcap, fused, ac_mega, ac_map, ci, dc_map, parts, dcs in comp_state:
        acs = _np.frombuffer(b"".join(parts), dtype="<i8").reshape(-1, 63)
        full = _np.empty((len(dcs), 64), dtype=_np.int64)
        full[:, 0] = dcs
        full[:, 1:] = acs
        out.append(full)
    return out
