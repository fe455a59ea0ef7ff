#!/usr/bin/env python3
"""Generate VP8L (lossless WebP) test fixtures with the SYSTEM libwebp
(an independent, canonical implementation) via ctypes — the same
"another encoder's output" device the JPEG/PNG/GIF specs use ImageIO
for. For each deterministic raster family we write:

  src/test/resources/webp/<name>.webp   libwebp's lossless encoding
  src/test/resources/webp/<name>.rgba   the raw input RGBA (lossless ⇒
                                        the decoder must reproduce it
                                        byte-exactly)

Also cross-checks: libwebp's own decoder must round-trip every stream
byte-exactly before we commit it as a fixture.

Usage: python3 scripts/gen_webp_fixtures.py [--check-own DIR]
  --check-own DIR  additionally decode every *.webp in DIR with libwebp
                   and compare against the matching *.rgba — the dev
                   loop that validates OUR OWN Scala VP8L encoder
                   against the canonical decoder.
"""
import ctypes
import os
import sys

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_void_p)]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "webp")


def encode(rgba: bytes, w: int, h: int) -> bytes:
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n > 0, "libwebp encode failed"
    return ctypes.string_at(out, n)


def decode(data: bytes):
    ww, hh = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(ww), ctypes.byref(hh))
    assert p, "libwebp decode failed"
    return ctypes.string_at(p, ww.value * hh.value * 4), ww.value, hh.value


def px_gray(doc, x, y):
    v = (31 * doc + 7 * x + 13 * y) % 256
    return (v, v, v, 255)


def px_color(doc, x, y):
    # the MediaCodec color closed form family (bounded-slope waves)
    return ((29 * doc + 5 * x + 11 * y) % 256,
            (17 * doc + 3 * x + 7 * y) % 256,
            (23 * doc + 9 * x + 2 * y) % 256, 255)


def px_pal4(doc, x, y):
    i = (x + y + doc) % 4
    pal = [(10, 200, 30, 255), (250, 60, 0, 255),
           (0, 0, 0, 128), (90, 90, 255, 255)]
    return pal[int(i)]


def px_pal150(doc, x, y):
    i = (7 * x + 13 * y + doc) % 150
    return ((i * 5) % 256, (i * 11) % 256, (i * 17) % 256, 255)


_seed = [123456789]


def px_rand(doc, x, y):
    s = _seed[0]
    s ^= (s << 13) & 0xffffffff
    s ^= s >> 17
    s ^= (s << 5) & 0xffffffff
    _seed[0] = s
    # alpha floored at 8: libwebp's lossless encoder "cleans" RGB under
    # FULLY transparent pixels (exact=0 default), which would break the
    # input==decode identity the fixtures pin
    return (s & 0xff, (s >> 8) & 0xff, (s >> 16) & 0xff,
            255 if (s >> 24) & 1 else max(8, (s >> 24) & 0xff))


def px_tile(doc, x, y):
    return px_color(doc, x % 7, y % 3)


def px_const(doc, x, y):
    return (42, 137, 250, 200)


def px_grad(doc, x, y):
    return ((x * 3 + y) % 256, (x + y * 5) % 256,
            (x * 2 + y * 2) % 256, 255)


def px_mixed(doc, x, y):
    # quadrants with sharply different statistics — drives libwebp's
    # histogram clustering into MULTIPLE entropy groups (meta tiling)
    if x < 160 and y < 120:
        return px_grad(doc, x, y)
    if x >= 160 and y < 120:
        return px_rand(doc, x, y)
    if x < 160:
        return px_tile(doc, x, y)
    return px_color(doc, x, y)


FAMILIES = [
    ("gray", px_gray), ("color", px_color), ("pal4", px_pal4),
    ("pal150", px_pal150), ("rand", px_rand), ("tile", px_tile),
    ("const", px_const), ("grad", px_grad),
]
SIZES = [(1, 1), (3, 2), (17, 9), (64, 48), (200, 131)]
EXTRA = [("mixed", px_mixed, 320, 240)]


def raster(f, doc, w, h):
    b = bytearray()
    for y in range(h):
        for x in range(w):
            b += bytes(f(doc, x, y))
    return bytes(b)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--check-own":
        ok = True
        for fn in sorted(os.listdir(sys.argv[2])):
            if not fn.endswith(".webp"):
                continue
            data = open(os.path.join(sys.argv[2], fn), "rb").read()
            exp = open(os.path.join(sys.argv[2],
                                    fn[:-5] + ".rgba"), "rb").read()
            got, w, h = decode(data)
            m = "OK " if got == exp else "MISMATCH"
            if got != exp:
                ok = False
                d = next(i for i in range(min(len(got), len(exp)))
                         if got[i] != exp[i])
                m += f" first diff at byte {d}: got {got[d]} want {exp[d]}"
            print(f"[check-own] {fn}: {w}x{h} {m}")
        sys.exit(0 if ok else 1)

    os.makedirs(OUT, exist_ok=True)
    jobs = [(n, f, w, h) for n, f in FAMILIES for (w, h) in SIZES]
    jobs += [(n, f, w, h) for n, f, w, h in EXTRA]
    for name, f, w, h in jobs:
        doc = 7
        _seed[0] = 123456789 + w * 1000 + h  # deterministic per fixture
        rgba = raster(f, doc, w, h)
        data = encode(rgba, w, h)
        back, ww, hh = decode(data)
        assert (back, ww, hh) == (rgba, w, h), f"{name}_{w}x{h} roundtrip"
        base = os.path.join(OUT, f"{name}_{w}x{h}")
        open(base + ".webp", "wb").write(data)
        open(base + ".rgba", "wb").write(rgba)
        print(f"wrote {name}_{w}x{h}: {len(data)} bytes webp")


if __name__ == "__main__":
    main()
