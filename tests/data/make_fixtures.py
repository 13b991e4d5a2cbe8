"""Generates the checked-in image fixtures (sample.png/.bmp/.ppm).

Encoders here follow the published format specs directly (PNG RFC 2083
chunk layout + all five scanline filters, BMP BITMAPINFOHEADER, netpbm
P6) and are deliberately INDEPENDENT of the engine's decoder
(operators/multimodal.py), so the pixel-equality tests are a real
cross-check, not a round-trip of one implementation.

Pixel pattern (shared with tests/test_operators.py): 7x5 RGB,
px[y, x] = ((x*31+y*7) % 256, (x*5+y*13) % 256, (x*17+y*3) % 256).
"""
import struct
import zlib

import numpy as np


def pattern(w=7, h=5):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 31 + y * 7) % 256, (x * 5 + y * 13) % 256, (x * 17 + y * 3) % 256],
        axis=2,
    ).astype(np.uint8)


def encode_png(px):
    h, w, _ = px.shape
    bpp = 3

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = b""
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        ftype = y % 5  # exercise every filter type
        out = np.zeros(w * bpp, dtype=np.int32)
        for i in range(w * bpp):
            a = int(line[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (int(line[i]) - pred) & 0xFF
        raw += bytes([ftype]) + out.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_bmp(px):
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (stride - len(row))
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def encode_ppm(px):
    h, w, _ = px.shape
    return (
        b"P6\n# fixture comment\n" + f"{w} {h}\n255\n".encode() + px.tobytes()
    )




# ----------------------------------------------------------------- JPEG
# Baseline JPEG encoder + an independent expected-decode computation.
# The engine's decoder (operators/multimodal.py::_decode_jpeg) is a
# marker/Huffman/IDCT implementation with a vectorized matrix IDCT; the
# expected pixels here come from the ENCODER-SIDE quantized
# coefficients through a literal quadruple-loop IDCT, so the equality
# test cross-checks two independent implementations of the decode spec
# (dequant -> IDCT -> clip(round(x+128)); replicate-upsample;
# BT.601 YCbCr->RGB with clip(round)). Table VALUES (quant + Huffman)
# are written into DQT/DHT and read back by any decoder, so correctness
# never depends on them being the spec's example tables.

_QT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
_QT_CHR = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _jzigzag():
    out = []
    for s in range(15):
        ys = list(range(max(0, s - 7), min(s, 7) + 1))
        for y in (ys if s % 2 else reversed(ys)):
            out.append(y * 8 + (s - y))
    return np.array(out, dtype=np.int64)


def _huff_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            codes[vals[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return codes


class _JBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)

    def raw_marker(self, b2):
        self.pad()
        self.out += bytes([0xFF, b2])


def _fdct_mat():
    u = np.arange(8, dtype=np.float64)
    M = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2.0
    M[0] *= 1.0 / np.sqrt(2.0)
    return M


def _idct_loop(coef):
    """Literal T.81 A.3.3 IDCT quadruple loop — deliberately NOT the
    decoder's matrix form."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                for v in range(8):
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def _pad_to(plane, ph, pw):
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(px, subsample="444", restart=0, gray=False):
    """-> (jpeg_bytes, expected_rgb uint8): baseline JFIF encode of
    ``px`` plus the spec-expected decode of what was written."""
    zz = _jzigzag()
    h, w = px.shape[:2]
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    Y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    Cb = np.clip(np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128), 0, 255)
    Cr = np.clip(np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128), 0, 255)
    if gray:
        comps = [(1, 1, 1, 0, Y, _QT_LUM)]
    elif subsample == "420":
        def _sub(p):
            pp = _pad_to(p, (h + 1) // 2 * 2, (w + 1) // 2 * 2)
            return np.round(
                (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
            )
        comps = [
            (1, 2, 2, 0, Y, _QT_LUM),
            (2, 1, 1, 1, _sub(Cb), _QT_CHR),
            (3, 1, 1, 1, _sub(Cr), _QT_CHR),
        ]
    else:  # 4:4:4
        comps = [
            (1, 1, 1, 0, Y, _QT_LUM),
            (2, 1, 1, 1, Cb, _QT_CHR),
            (3, 1, 1, 1, Cr, _QT_CHR),
        ]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    M = _fdct_mat()

    dc_codes = {0: _huff_codes(*_DC_LUM), 1: _huff_codes(*_DC_CHR)}
    ac_codes = {0: _huff_codes(*_AC_LUM), 1: _huff_codes(*_AC_CHR)}

    # quantize every block, remember coefficients for the expected image
    qblocks = {}  # cid -> {(byidx, bxidx): natural 8x8 int coeffs}
    padded = {}
    for cid, ch, cv, tid, plane, q in comps:
        pp = _pad_to(plane, mcuy * cv * 8, mcux * ch * 8)
        padded[cid] = pp
        blocks = {}
        for byi in range(mcuy * cv):
            for bxi in range(mcux * ch):
                blk = pp[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8]
                S = M @ (blk - 128.0) @ M.T
                blocks[(byi, bxi)] = np.round(S / q).astype(np.int64)
        qblocks[cid] = blocks

    # entropy-encode in MCU order
    bw = _JBitWriter()
    preds = {c[0]: 0 for c in comps}
    nrst = 0
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            bw.raw_marker(0xD0 + (nrst % 8))
            nrst += 1
            preds = {c[0]: 0 for c in comps}
        my, mx = divmod(mcu, mcux)
        for cid, ch, cv, tid, _plane, q in comps:
            dct, act = dc_codes[tid], ac_codes[tid]
            for byy in range(cv):
                for bxx in range(ch):
                    coefn = qblocks[cid][(my * cv + byy, mx * ch + bxx)]
                    zzc = coefn.reshape(-1)[zz]
                    diff = int(zzc[0]) - preds[cid]
                    preds[cid] = int(zzc[0])
                    t = int(abs(diff)).bit_length()
                    c, l = dct[t]
                    bw.write(c, l)
                    if t:
                        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
                    run = 0
                    last_nz = int(np.max(np.nonzero(zzc)[0])) if np.any(zzc[1:]) else 0
                    for k in range(1, 64):
                        v = int(zzc[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, l = act[0xF0]
                            bw.write(c, l)
                            run -= 16
                        s = int(abs(v)).bit_length()
                        c, l = act[(run << 4) | s]
                        bw.write(c, l)
                        bw.write(v if v > 0 else v + (1 << s) - 1, s)
                        run = 0
                    if last_nz < 63:
                        c, l = act[0x00]
                        bw.write(c, l)
    bw.pad()
    entropy = bytes(bw.out)

    # headers
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qts = {0: _QT_LUM}
    if not gray:
        qts[1] = _QT_CHR
    for tq, q in qts.items():
        out += seg(0xDB, bytes([tq]) + bytes(int(x) for x in q.reshape(-1)[zz]))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tid, _p, _q in comps:
        sof += bytes([cid, (ch << 4) | cv, 0 if tid == 0 else 1])
    out += seg(0xC0, sof)
    hts = [(0, 0, _DC_LUM), (1, 0, _AC_LUM)]
    if not gray:
        hts += [(0, 1, _DC_CHR), (1, 1, _AC_CHR)]
    for tc, th, (bits, vals) in hts:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for cid, _ch, _cv, tid, _p, _q in comps:
        sos += bytes([cid, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy + b"\xff\xd9"

    # expected decode: loop-IDCT of the quantized coefficients
    exp_planes = []
    for cid, ch, cv, _tid, _p, q in comps:
        pp = np.zeros((mcuy * cv * 8, mcux * ch * 8))
        for (byi, bxi), coefn in qblocks[cid].items():
            blk = _idct_loop((coefn * q).astype(np.float64))
            pp[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8] = np.clip(
                np.round(blk + 128.0), 0, 255
            )
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        pp = pp[:chh, :cw]
        pp = np.repeat(np.repeat(pp, vmax // cv, axis=0), hmax // ch, axis=1)
        exp_planes.append(pp[:h, :w])
    if gray:
        gpx = exp_planes[0].astype(np.uint8)
        expected = np.repeat(gpx[:, :, None], 3, axis=2)
    else:
        Yd, Cbd, Crd = exp_planes
        rr = Yd + 1.402 * (Crd - 128.0)
        gg = Yd - 0.344136 * (Cbd - 128.0) - 0.714136 * (Crd - 128.0)
        bb = Yd + 1.772 * (Cbd - 128.0)
        expected = np.clip(
            np.round(np.stack([rr, gg, bb], axis=2)), 0, 255
        ).astype(np.uint8)
    return out, expected


if __name__ == "__main__":
    import pathlib

    d = pathlib.Path(__file__).parent
    px = pattern()
    (d / "sample.png").write_bytes(encode_png(px))
    (d / "sample.bmp").write_bytes(encode_bmp(px))
    (d / "sample.ppm").write_bytes(encode_ppm(px))
    jpx = pattern(17, 13)
    for name, kw in (
        ("444", dict(subsample="444")),
        ("420", dict(subsample="420", restart=2)),
        ("gray", dict(gray=True)),
    ):
        data, expected = encode_jpeg(jpx, **kw)
        (d / f"sample_{name}.jpg").write_bytes(data)
        np.save(d / f"sample_{name}_expected.npy", expected)
    print("wrote", sorted(p.name for p in d.glob("sample*")))
