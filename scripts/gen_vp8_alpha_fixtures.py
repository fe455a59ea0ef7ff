#!/usr/bin/env python3
"""ALPH (WebP alpha plane) fixtures, libwebp-arbitrated.

Two families:
 - natural: WebPEncodeRGBA with alpha-varying rasters → VP8X+ALPH+VP8
   containers whose ALPH payload is VP8L-compressed (compression=1).
   Alpha is LOSSLESS at default settings (asserted), so the truth is
   the input closed form itself.
 - handmux_f{0..3}: the SAME VP8 color chunk re-muxed with a
   hand-built ALPH using compression=0 (raw) and filtering method f —
   libwebp's encoder picks filter 0 on these corpora, so the three
   predictor unfilters would otherwise stay untested. Every hand-muxed
   stream is DECODED BY LIBWEBP before commit (it arbitrates our mux
   and the filter semantics), and its alpha must round-trip exactly.

Writes <name>.webp plus <name>.alpha (the exact expected alpha plane).
The color planes of these fixtures are covered by the main vp8 pack;
this pack pins the alpha path.
"""
import ctypes
import ctypes.util
import os

lib = ctypes.CDLL(ctypes.util.find_library("webp") or "libwebp.so.7")
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_float,
                               ctypes.POINTER(ctypes.c_void_p)]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "vp8")
MAIN = os.path.join(os.path.dirname(__file__), "..",
                    "src", "main", "resources", "vp8")


def alpha_mix(x, y):
    return (x * 7 + y * 13) % 256


def alpha_blocky(x, y):
    return 255 if ((x // 8) + (y // 8)) % 2 == 0 else 64


PATTERNS = {"mix": alpha_mix, "blocky": alpha_blocky}
SIZES = [(32, 32), (37, 21)]


def rgb(x, y):
    return (x * 3 % 256, y * 5 % 256, (x + y) * 2 % 256)


def encode(rgba, w, h, q=75.0):
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGBA(bytes(rgba), w, h, w * 4, q, ctypes.byref(out))
    assert n > 0
    return ctypes.string_at(out, n)


def decode_rgba(data):
    ww, hh = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(ww), ctypes.byref(hh))
    assert p, "libwebp decode failed"
    return ctypes.string_at(p, ww.value * hh.value * 4), ww.value, hh.value


def chunks(data):
    i = 12
    while i + 8 <= len(data):
        cc = data[i:i + 4]
        sz = int.from_bytes(data[i + 4:i + 8], "little")
        yield cc, data[i + 8:i + 8 + sz]
        i += 8 + sz + (sz & 1)


def mux(w, h, alph_payload, vp8_payload):
    def chunk(cc, payload):
        b = cc + len(payload).to_bytes(4, "little") + payload
        if len(payload) & 1:
            b += b"\x00"
        return b
    vp8x = bytes([0x10 | 0x00, 0, 0, 0]) + \
        (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    body = chunk(b"VP8X", vp8x) + chunk(b"ALPH", alph_payload) + \
        chunk(b"VP8 ", vp8_payload)
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body


def filt(plane, w, h, method):
    """Apply alpha filtering (encoder side): store diff = value - predict."""
    out = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            a = plane[y * w + x - 1] if x > 0 else None      # left
            b = plane[(y - 1) * w + x] if y > 0 else None    # above
            c = plane[(y - 1) * w + x - 1] if (x > 0 and y > 0) else None
            if method == 1:   # horizontal: left; first col: above; origin: 0
                p = a if a is not None else (b if b is not None else 0)
            elif method == 2: # vertical: above; first row: left; origin: 0
                p = b if b is not None else (a if a is not None else 0)
            elif method == 3: # gradient: clip(a+b-c); borders fall back
                if a is not None and b is not None:
                    p = max(0, min(255, a + b - c))
                elif a is not None:
                    p = a
                elif b is not None:
                    p = b
                else:
                    p = 0
            else:
                p = 0
            out[y * w + x] = (plane[y * w + x] - p) & 0xff
    return bytes(out)


def main():
    os.makedirs(OUT, exist_ok=True)
    os.makedirs(MAIN, exist_ok=True)
    written = []
    for pname, pf in PATTERNS.items():
        for (w, h) in SIZES:
            rgba = bytearray()
            alpha = bytearray()
            for y in range(h):
                for x in range(w):
                    r, g, b = rgb(x, y)
                    a = pf(x, y)
                    rgba += bytes((r, g, b, a))
                    alpha.append(a)
            webp = encode(rgba, w, h)
            cs = dict(chunks(webp))
            assert b"ALPH" in cs and b"VP8 " in cs, "expected alpha container"
            hdr = cs[b"ALPH"][0]
            assert (hdr >> 4) & 3 == 0, "unexpected preprocessing"
            dec, dw, dh = decode_rgba(webp)
            assert (dw, dh) == (w, h)
            assert all(dec[4 * k + 3] == alpha[k] for k in range(w * h)), \
                "libwebp alpha not lossless"
            name = f"alpha_{pname}_{w}x{h}"
            open(os.path.join(OUT, name + ".webp"), "wb").write(webp)
            open(os.path.join(OUT, name + ".alpha"), "wb").write(bytes(alpha))
            written.append(name)
            # hand-muxed raw-compression variants exercising every filter
            for f in range(4):
                payload = bytes([f << 2]) + filt(alpha, w, h, f)  # comp=0
                hm = mux(w, h, payload, cs[b"VP8 "])
                dec2, dw2, dh2 = decode_rgba(hm)
                assert (dw2, dh2) == (w, h)
                assert all(dec2[4 * k + 3] == alpha[k] for k in range(w * h)), \
                    f"filter {f}: libwebp disagrees with our filter semantics"
                # color planes must match the natural container's decode
                assert dec2[:3] == dec[:3]
                nm = f"alpha_{pname}_{w}x{h}_raw_f{f}"
                open(os.path.join(OUT, nm + ".webp"), "wb").write(hm)
                open(os.path.join(OUT, nm + ".alpha"), "wb").write(bytes(alpha))
                written.append(nm)
    print(f"[ok] wrote {len(written)} alpha fixtures: {written[:4]} ...")
    # embedded pack for the registered row: the four natural containers
    # + one raw-filter variant per filter (mix 32x32)
    import shutil
    pack = [f"alpha_{p}_{w}x{h}" for p in PATTERNS for (w, h) in SIZES] + \
        [f"alpha_mix_32x32_raw_f{f}" for f in range(4)]
    for n in pack:
        shutil.copy(os.path.join(OUT, n + ".webp"), MAIN)
        shutil.copy(os.path.join(OUT, n + ".alpha"), MAIN)
    print(f"[ok] embedded pack of {len(pack)} in src/main/resources/vp8")


if __name__ == "__main__":
    main()
