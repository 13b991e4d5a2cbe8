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


if __name__ == "__main__":
    import pathlib

    d = pathlib.Path(__file__).parent
    px = pattern()
    (d / "sample.png").write_bytes(encode_png(px))
    (d / "sample.bmp").write_bytes(encode_bmp(px))
    (d / "sample.ppm").write_bytes(encode_ppm(px))
    print("wrote", [p.name for p in d.glob("sample.*")])
