"""Minimal pure-stdlib baseline JPEG codec (ITU-T T.81 / JFIF, public spec).

The sandbox has no PIL/libav; like functions/png.py this makes the media
decode path REAL for the dominant real-corpus image format instead of
stubbed. Scope: baseline sequential DCT (SOF0) AND progressive DCT
(SOF2, T.81 Annex G: spectral selection, successive approximation with
DC/AC refinement and EOB runs), Huffman entropy coding, 8-bit samples;
decode supports 1-component greyscale and 3-component YCbCr at 4:4:4 or
2x2 (4:2:0) subsampling plus restart intervals. Encoders: baseline
greyscale (encode_jpeg_gray, the driver-oracle fixture), baseline 4:4:4
colour, and a 5-scan progressive encoder (encode_jpeg_progressive) used
to pin progressive==baseline pixel equality on arbitrary images; the
all-ones quantization default makes constant 8x8 blocks decode EXACTLY
— the property the driver oracles pin. Arithmetic coding and
hierarchical/lossless modes stay out of scope (rare in crawled
corpora; rejected explicitly).

This is a correctness-first codec: the Huffman bitstream walk is
per-image Python (inherently sequential), the DCT/IDCT and dequantization
are numpy matrix ops. Throughput at scale comes from batching images per
Arrow batch in operators/multimodal.py, not from this codec.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index k of the scan -> (row, col) in the 8x8 block (T.81
# Figure 5); built programmatically to avoid a 64-literal table
def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        d = range(s + 1)
        idx = [(s - j, j) for j in d] if s % 2 else [(j, s - j) for j in d]
        order.extend((r, c) for r, c in idx if r < 8 and c < 8)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZZ = _zigzag_order()

# standard Huffman tables (T.81 Annex K.3) — (bits[1..16], values)
_STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 1-D DCT-II basis (orthonormal JPEG scaling): C[k, n] used for both FDCT
# (C @ block @ C.T) and IDCT (C.T @ coef @ C)
def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n[:, None]
    c = np.cos((2 * n[None, :] + 1) * k * np.pi / 16.0) * 0.5
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


# ------------------------------------------------------------- encoding

def _huff_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} per T.81 Annex C."""
    codes = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def encode_jpeg_gray(
    arr: np.ndarray, quant: np.ndarray | None = None, restart_interval: int = 0
) -> bytes:
    """uint8 (H, W) greyscale -> baseline JFIF bytes, H and W multiples of
    8. quant is an 8x8 table (natural order), default all-ones — constant
    8x8 blocks then roundtrip exactly through decode_jpeg.
    restart_interval > 0 emits DRI + RSTn markers every that-many MCUs
    with a DC-predictor reset (T.81 E.1.2)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    if h % 8 or w % 8:
        raise ValueError("encoder requires multiples of 8")
    q = np.ones((8, 8), dtype=np.int64) if quant is None else np.asarray(quant, np.int64)

    dc_codes = _huff_codes(*_STD_DC_LUM)
    ac_codes = _huff_codes(*_STD_AC_LUM)
    bw = _BitWriter()
    prev_dc = 0
    ri = int(restart_interval)
    n_rst = 0
    blocks = a.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    for m, blk in enumerate(blocks):
        if ri and m and m % ri == 0:
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            prev_dc = 0
        f = _C @ (blk.astype(np.float64) - 128.0) @ _C.T
        coef = np.round(f / q).astype(np.int64).ravel()[_ZZ]
        # DC difference
        size, amp = _magnitude(int(coef[0]) - prev_dc)
        prev_dc = int(coef[0])
        code, length = dc_codes[size]
        bw.write(code, length)
        if size:
            bw.write(amp, size)
        # AC run-length
        run = 0
        last_nz = max((k for k in range(1, 64) if coef[k]), default=0)
        for k in range(1, last_nz + 1):
            v = int(coef[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            size, amp = _magnitude(v)
            code, length = ac_codes[(run << 4) | size]
            bw.write(code, length)
            bw.write(amp, size)
            run = 0
        if last_nz != 63:
            code, length = ac_codes[0x00]  # EOB
            bw.write(code, length)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(int(v) for v in q.ravel()[_ZZ]))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUM[0]) + bytes(_STD_DC_LUM[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUM[0]) + bytes(_STD_AC_LUM[1]))
    if ri:
        out += seg(0xDD, struct.pack(">H", ri))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes(bw.buf) + b"\xff\xd9"  # EOI
    return out


# ------------------------------------------------------------- decoding

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise ValueError("unexpected end of entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError("marker inside entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def align(self):
        self.nbits = 0
        self.acc = 0


def _huff_lookup(bits, values):
    """(bits, values) -> dict {(length, code): symbol} for the bit walk."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 array: (H, W) for greyscale, (H, W, 3)
    RGB for YCbCr. Supports 4:4:4 and 2x2 (4:2:0) subsampling and restart
    intervals; progressive/arithmetic raise ValueError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    coefs = None  # progressive coefficient store, lazily initialized
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                b += 1
                if pq:
                    vals = np.frombuffer(body[b : b + 128], dtype=">u2").astype(np.int64)
                    b += 128
                else:
                    vals = np.frombuffer(body[b : b + 64], dtype=np.uint8).astype(np.int64)
                    b += 64
                nat = np.empty(64, np.int64)
                nat[_ZZ] = vals
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                values = list(body[b + 17 : b + 17 + n])
                huff[(tc, th)] = _huff_lookup(bits, values)
                b += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError("only 8-bit samples supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline or progressive Huffman DCT supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"cs": cs, "td": tables >> 4, "ta": tables & 0xF})
            if not frame.get("progressive"):
                return _decode_scan(data, pos, frame, scan, qt, huff, restart_interval)
            # progressive (T.81 G.2): accumulate coefficients scan by scan
            if coefs is None:
                coefs = _init_coef_store(frame)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            pos = _decode_progressive_scan(
                data, pos, frame, scan, huff, restart_interval, coefs,
                ss, se, ahal >> 4, ahal & 0xF,
            )
    if frame is not None and frame.get("progressive") and coefs is not None:
        return _reconstruct_progressive(frame, coefs, qt)
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["cs"]]
        c["td"], c["ta"] = s["td"], s["ta"]
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in comps
    }
    br = _BitReader(data)
    br.pos = pos
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align()
                # skip the RSTn marker
                while br.pos + 1 < len(data) and not (
                    data[br.pos] == 0xFF and 0xD0 <= data[br.pos + 1] <= 0xD7
                ):
                    br.pos += 1
                br.pos += 2
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                q = qt[c["tq"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        coef = np.zeros(64, np.int64)
                        size = _read_symbol(br, huff[(0, c["td"])])
                        diff = _extend(br.read(size), size) if size else 0
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, huff[(1, c["ta"])])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            coef[k] = _extend(br.read(s), s)
                            k += 1
                        nat = np.zeros(64, np.int64)
                        nat[_ZZ] = coef
                        block = _C.T @ (nat.reshape(8, 8) * q) @ _C + 128.0
                        py0 = (my * c["v"] + v) * 8
                        px0 = (mx * c["h"] + hh) * 8
                        planes[c["id"]][py0 : py0 + 8, px0 : px0 + 8] = block
            mcu_count += 1

    return _planes_to_image(planes, frame, hmax, vmax)


def _planes_to_image(planes, frame, hmax, vmax) -> np.ndarray:
    """Component planes -> uint8 image: greyscale clip, or chroma
    upsample + JFIF YCbCr -> RGB."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    if len(comps) == 1:
        out = np.clip(np.round(planes[comps[0]["id"]][:h, :w]), 0, 255)
        return out.astype(np.uint8)
    # upsample chroma to luma resolution and convert YCbCr -> RGB (JFIF)
    y = planes[comps[0]["id"]]
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[: y.shape[0], : y.shape[1]])
    Y, Cb, Cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = Y + 1.402 * Cr
    g = Y - 0.344136 * Cb - 0.714136 * Cr
    b = Y + 1.772 * Cb
    rgb = np.stack([r, g, b], axis=2)[:h, :w]
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------- progressive (T.81 G)

def _frame_grid(frame):
    """(hmax, vmax, mcux, mcuy) for a frame."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _comp_block_dims(frame, c):
    """Blocks-wide/high of a component for NON-interleaved scans: from
    the component's true sample dimensions (T.81 A.1.1 / G.2), not the
    MCU-padded grid."""
    hmax, vmax, _, _ = _frame_grid(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _init_coef_store(frame):
    """Per-component zigzag coefficient grids, MCU-padded so interleaved
    DC scans can write every (dummy-included) block."""
    _, _, mcux, mcuy = _frame_grid(frame)
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
        for c in frame["comps"]
    }


def _skip_rst(br, data):
    """Byte-align and step over an RSTn marker (T.81 E.1.2)."""
    br.align()
    p = br.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7
    ):
        p += 1
    br.pos = p + 2


def _decode_progressive_scan(
    data, pos, frame, scan, huff, restart_interval, coefs, ss, se, ah, al
):
    """One progressive scan (T.81 G.2): DC first/refine (interleaved or
    single-component), AC first/refine with EOB runs (single-component
    by spec). Mutates `coefs`; returns the byte offset of the next
    marker."""
    comps_by_id = {c["id"]: c for c in frame["comps"]}
    br = _BitReader(data)
    br.pos = pos
    p1, m1 = 1 << al, -1 << al

    if ss == 0:  # ---- DC scan (Se must be 0)
        if se != 0:
            raise ValueError("DC progressive scan must have Se=0")
        hmax, vmax, mcux, mcuy = _frame_grid(frame)
        members = [(comps_by_id[s["cs"]], s) for s in scan]
        pred = {s["cs"]: 0 for s in scan}
        if len(members) == 1:
            c, s = members[0]
            bw_, bh_ = _comp_block_dims(frame, c)
            units = [(c, s, bx, by) for by in range(bh_) for bx in range(bw_)]
            per_unit = 1
        else:
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    for c, s in members:
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                units.append(
                                    (c, s, mx * c["h"] + hh, my * c["v"] + v)
                                )
            per_unit = sum(c["h"] * c["v"] for c, _ in members)
        n_units = 0
        for i, (c, s, bx, by) in enumerate(units):
            if (
                restart_interval
                and n_units
                and i % per_unit == 0
                and (i // per_unit) % restart_interval == 0
            ):
                _skip_rst(br, data)
                pred = {t["cs"]: 0 for t in scan}
            n_units += 1
            blk = coefs[c["id"]][by, bx]
            if ah == 0:  # first pass: diff-coded DC at precision Al
                size = _read_symbol(br, huff[(0, s["td"])])
                diff = _extend(br.read(size), size) if size else 0
                pred[s["cs"]] += diff
                blk[0] = pred[s["cs"]] << al
            else:  # refinement: one raw bit
                if br.read(1):
                    blk[0] |= p1
    else:  # ---- AC scan: exactly one component
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        s = scan[0]
        c = comps_by_id[s["cs"]]
        bw_, bh_ = _comp_block_dims(frame, c)
        grid = coefs[c["id"]]
        eobrun = 0
        nblk = 0
        for by in range(bh_):
            for bx in range(bw_):
                if restart_interval and nblk and nblk % restart_interval == 0:
                    _skip_rst(br, data)
                    eobrun = 0
                nblk += 1
                blk = grid[by, bx]
                if ah == 0:  # -------- AC first pass (G.2.2)
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _read_symbol(br, huff[(1, s["ta"])])
                        r, sz = rs >> 4, rs & 0xF
                        if sz == 0:
                            if r < 15:  # EOBn: run of (1<<r)+bits blocks
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.read(r)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > se:
                            raise ValueError("AC index out of band")
                        blk[k] = _extend(br.read(sz), sz) << al
                        k += 1
                else:  # -------- AC refinement (G.2.3 / correction bits)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _read_symbol(br, huff[(1, s["ta"])])
                            r, sz = rs >> 4, rs & 0xF
                            val = 0
                            if sz == 0:
                                if r < 15:
                                    eobrun = (1 << r) + (br.read(r) if r else 0)
                                    break
                                # r == 15: ZRL — skip 16 zero-history coefs
                            else:
                                if sz != 1:
                                    raise ValueError(
                                        "refinement magnitude must be 1"
                                    )
                                val = p1 if br.read(1) else m1
                            while k <= se:
                                if blk[k] != 0:
                                    if br.read(1) and (blk[k] & p1) == 0:
                                        blk[k] += p1 if blk[k] >= 0 else m1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                blk[k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:  # correction bits ride the EOB run
                            if blk[k] != 0:
                                if br.read(1) and (blk[k] & p1) == 0:
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            k += 1
                        eobrun -= 1

    # advance to the next marker (skip pad bits / fill bytes)
    p = br.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
            0xD0 <= data[p + 1] <= 0xD7
        )
    ):
        p += 1
    return p


def _reconstruct_progressive(frame, coefs, qt):
    """Dequantize + IDCT every accumulated block (vectorized over the
    block grid) and assemble planes like the baseline path."""
    hmax, vmax, _, _ = _frame_grid(frame)
    planes = {}
    for c in frame["comps"]:
        grid = coefs[c["id"]]
        by, bx = grid.shape[0], grid.shape[1]
        nat = np.zeros((by * bx, 64), np.float64)
        nat[:, _ZZ] = grid.reshape(-1, 64)
        q = qt[c["tq"]].reshape(64).astype(np.float64)
        blocks = (nat * q).reshape(-1, 8, 8)
        out = np.einsum("ij,njk,kl->nil", _C.T, blocks, _C) + 128.0
        planes[c["id"]] = (
            out.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
    return _planes_to_image(planes, frame, hmax, vmax)


# ------------------------------------------------- progressive encoding

def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _quant_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """uint8 (H, W) plane -> (by, bx, 64) quantized zigzag coefficients.

    Per-block `_C @ blk @ _C.T`, the SAME operation order as
    encode_jpeg_gray — a vectorized einsum differs at ~1e-15, which
    flips np.round's half-to-even ties and desynchronizes the
    progressive and baseline coefficient streams."""
    h, w = plane.shape
    out = np.empty((h // 8, w // 8, 64), np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            f = _C @ (blk.astype(np.float64) - 128.0) @ _C.T
            out[by, bx] = np.round(f / q).astype(np.int64).ravel()[_ZZ]
    return out


def _rgb_to_ycbcr(rgb: np.ndarray) -> list[np.ndarray]:
    """JFIF RGB -> [Y, Cb, Cr] uint8 planes."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [
        np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)
    ]


def _comp_planes(arr: np.ndarray) -> list[np.ndarray]:
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        return [a]
    if a.ndim == 3 and a.shape[2] == 3:
        return _rgb_to_ycbcr(a)
    raise ValueError("expected (H, W) grey or (H, W, 3) RGB")


# AC table for the progressive encoder: the baseline K.3 table has no
# EOBn symbols (0x10..0xE0), which progressive EOB runs require, so use
# a flat canonical table — 128 symbols at 8 bits + 128 at 9 bits (code
# space 0.75, DHT per-length counts fit one byte, no all-ones code: a
# legal, if unoptimized, Huffman table).
_FLAT_AC = (
    [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _headers(h, w, ncomp, q, sof_marker: int, ac_table=_STD_AC_LUM) -> bytes:
    out = b"\xff\xd8"
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(v) for v in q.ravel()[_ZZ]))
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp))
    out += _seg(sof_marker, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    out += _seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUM[0]) + bytes(_STD_DC_LUM[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_table[0]) + bytes(ac_table[1]))
    return out


def encode_jpeg_color444(arr: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """(H, W) grey or (H, W, 3) RGB -> BASELINE JFIF at 4:4:4, one shared
    quant/Huffman table set — the comparison stream for the progressive
    encoder (same quantized coefficients, different entropy layout)."""
    planes = _comp_planes(arr)
    h, w = planes[0].shape
    if h % 8 or w % 8:
        raise ValueError("encoder requires multiples of 8")
    q = np.ones((8, 8), np.int64) if quant is None else np.asarray(quant, np.int64)
    dc_codes = _huff_codes(*_STD_DC_LUM)
    ac_codes = _huff_codes(*_STD_AC_LUM)
    coefs = [_quant_blocks(p, q) for p in planes]
    bw = _BitWriter()
    pred = [0] * len(planes)
    for by in range(h // 8):
        for bx in range(w // 8):
            for ci, cf in enumerate(coefs):  # MCU = one block per comp
                blk = cf[by, bx]
                size, amp = _magnitude(int(blk[0]) - pred[ci])
                pred[ci] = int(blk[0])
                code, length = dc_codes[size]
                bw.write(code, length)
                if size:
                    bw.write(amp, size)
                run = 0
                last_nz = max((k for k in range(1, 64) if blk[k]), default=0)
                for k in range(1, last_nz + 1):
                    v = int(blk[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_codes[0xF0]
                        bw.write(code, length)
                        run -= 16
                    size, amp = _magnitude(v)
                    code, length = ac_codes[(run << 4) | size]
                    bw.write(code, length)
                    bw.write(amp, size)
                    run = 0
                if last_nz != 63:
                    code, length = ac_codes[0x00]
                    bw.write(code, length)
    bw.flush()
    out = _headers(h, w, len(planes), q, 0xC0)
    ncomp = len(planes)
    sos = bytes([ncomp]) + b"".join(bytes([i + 1, 0x00]) for i in range(ncomp))
    out += _seg(0xDA, sos + bytes([0, 63, 0]))
    return out + bytes(bw.buf) + b"\xff\xd9"


class _ProgWriter:
    """Bit writer with deferred EOB runs + buffered correction bits
    (the refinement-scan bookkeeping of T.81 G.1.2.2-G.1.2.3)."""

    def __init__(self, ac_codes):
        self.bw = _BitWriter()
        self.ac = ac_codes
        self.eobrun = 0
        self.held = []  # correction bits riding the pending EOB run

    def sym(self, s):
        code, length = self.ac[s]
        self.bw.write(code, length)

    def bits(self, seq):
        for b in seq:
            self.bw.write(b, 1)

    def flush_eob(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        self.bits(self.held)
        self.held = []


def encode_jpeg_progressive(
    arr: np.ndarray, quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) grey or (H, W, 3) RGB -> PROGRESSIVE JFIF (SOF2) at 4:4:4.

    Scan script (exercises every T.81 G.2 entropy mode):
      1. DC first, interleaved, Al=1
      2. per-comp AC first, band 1-5, Al=1
      3. per-comp AC first, band 6-63, Al=1   (EOB runs)
      4. DC refinement, interleaved, Ah=1 -> Al=0 (raw bits)
      5. per-comp AC refinement, band 1-63, Ah=1 -> Al=0 (correction bits)

    Decodes to the identical image as encode_jpeg_color444 of the same
    input (same quantized coefficients, reordered bitstream).
    restart_interval > 0 emits a DRI segment and RSTn markers every
    that-many MCUs (DC scans) / blocks (AC scans), resetting the DC
    predictor and EOB run at each — T.81 E.1.2 applied per Annex G."""
    planes = _comp_planes(arr)
    h, w = planes[0].shape
    if h % 8 or w % 8:
        raise ValueError("encoder requires multiples of 8")
    q = np.ones((8, 8), np.int64) if quant is None else np.asarray(quant, np.int64)
    dc_codes = _huff_codes(*_STD_DC_LUM)
    ac_codes = _huff_codes(*_FLAT_AC)  # EOBn symbols need a full table
    coefs = [_quant_blocks(p, q) for p in planes]
    ncomp = len(planes)
    out = _headers(h, w, ncomp, q, 0xC2, ac_table=_FLAT_AC)
    ri = int(restart_interval)
    if ri:
        out += _seg(0xDD, struct.pack(">H", ri))

    def rst_marker(n):
        return bytes([0xFF, 0xD0 + (n % 8)])

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC/AC table 0
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # ---- scan 1: DC first (interleaved), Al=1
    bw = _BitWriter()
    pred = [0] * ncomp
    n_rst = 0
    for m, (by, bx) in enumerate(
        (by, bx) for by in range(h // 8) for bx in range(w // 8)
    ):
        if ri and m and m % ri == 0:
            bw.flush()
            bw.buf += rst_marker(n_rst)
            n_rst += 1
            pred = [0] * ncomp
        for ci, cf in enumerate(coefs):
            t = int(cf[by, bx][0]) >> 1  # point transform (arith shift)
            size, amp = _magnitude(t - pred[ci])
            pred[ci] = t
            code, length = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(amp, size)
    bw.flush()
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, 1) + bytes(bw.buf)

    # ---- scans 2-3: AC first per component, two spectral bands, Al=1
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            pw = _ProgWriter(ac_codes)
            cf = coefs[ci]
            n_rst = 0
            for m, (by, bx) in enumerate(
                (by, bx) for by in range(h // 8) for bx in range(w // 8)
            ):
                if True:
                    if ri and m and m % ri == 0:
                        pw.flush_eob()
                        pw.bw.flush()
                        pw.bw.buf += rst_marker(n_rst)
                        n_rst += 1
                    blk = cf[by, bx]
                    run = 0
                    wrote = False
                    for k in range(ss, se + 1):
                        v = int(blk[k])
                        t = (abs(v) >> 1)
                        if t == 0:
                            run += 1
                            continue
                        pw.flush_eob()
                        while run > 15:
                            pw.sym(0xF0)
                            run -= 16
                        size, _ = _magnitude(t)
                        amp = t if v > 0 else (-t) + (1 << size) - 1
                        pw.sym((run << 4) | size)
                        pw.bw.write(amp, size)
                        run = 0
                        wrote = True
                    if run > 0 or not wrote:
                        pw.eobrun += 1
                        if pw.eobrun == 0x7FFF:
                            pw.flush_eob()
            pw.flush_eob()
            pw.bw.flush()
            out += sos([ci + 1], ss, se, 0, 1) + bytes(pw.bw.buf)

    # ---- scan 4: DC refinement (interleaved), Ah=1 Al=0 — raw bits
    bw = _BitWriter()
    n_rst = 0
    for m, (by, bx) in enumerate(
        (by, bx) for by in range(h // 8) for bx in range(w // 8)
    ):
        if ri and m and m % ri == 0:
            bw.flush()
            bw.buf += rst_marker(n_rst)
            n_rst += 1
        for cf in coefs:
            bw.write(int(cf[by, bx][0]) & 1, 1)
    bw.flush()
    out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    out += bytes(bw.buf)

    # ---- scan 5: AC refinement per component, band 1-63, Ah=1 Al=0
    for ci in range(ncomp):
        pw = _ProgWriter(ac_codes)
        cf = coefs[ci]
        n_rst = 0
        for m, (by, bx) in enumerate(
            (by, bx) for by in range(h // 8) for bx in range(w // 8)
        ):
            if True:
                if ri and m and m % ri == 0:
                    pw.flush_eob()
                    pw.bw.flush()
                    pw.bw.buf += rst_marker(n_rst)
                    n_rst += 1
                blk = cf[by, bx]
                absv = [abs(int(blk[k])) for k in range(1, 64)]
                eobpos = max(
                    (k for k in range(1, 64) if absv[k - 1] == 1), default=0
                )
                r = 0
                br_bits: list[int] = []
                for k in range(1, 64):
                    t = absv[k - 1]
                    if t == 0:
                        r += 1
                        continue
                    # ZRLs must be emitted at the FIRST nonzero once
                    # r > 15 (not deferred to the next newly-significant
                    # coef): the decoder reads the buffered correction
                    # bits interleaved inside each 16-zero span, so a
                    # deferred ZRL would misalign them (T.81 G.1.2.3).
                    while r > 15 and k <= eobpos:
                        pw.flush_eob()
                        pw.sym(0xF0)
                        pw.bits(br_bits)
                        br_bits = []
                        r -= 16
                    if t > 1:  # already significant: correction bit (bit 0)
                        br_bits.append(t & 1)
                        continue
                    pw.flush_eob()
                    pw.sym((r << 4) | 1)
                    pw.bw.write(1 if int(blk[k]) > 0 else 0, 1)
                    pw.bits(br_bits)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    pw.eobrun += 1
                    pw.held.extend(br_bits)
                    if pw.eobrun == 0x7FFF:
                        pw.flush_eob()
        pw.flush_eob()
        pw.bw.flush()
        out += sos([ci + 1], 1, 63, 1, 0) + bytes(pw.bw.buf)

    return out + b"\xff\xd9"
