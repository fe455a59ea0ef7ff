#!/usr/bin/env python3
"""Generate LOSSY VP8 (still WebP) test fixtures with the SYSTEM
libwebp via ctypes — the gen_webp_fixtures.py device for the lossy
half: libwebp is a real, canonical second implementation of RFC 6386.
For each (content family × size × quality) we write:

  src/test/resources/vp8/<name>.webp  libwebp's lossy VP8 encoding
  src/test/resources/vp8/<name>.yuv   libwebp's OWN decode of that
                                      stream: Y plane (w*h) then U then
                                      V (((w+1)//2)*((h+1)//2) each),
                                      tightly packed

VP8 decode is bit-exact by spec (RFC 6386 fully determines the
reconstruction incl. the loop filter), so our Scala decoder must match
these YUV planes PER SAMPLE — no tolerance band. Comparing in YUV
space (WebPDecodeYUV) deliberately stops before libwebp's fancy
upsampler/RGB conversion, which is implementation-defined and NOT part
of the RFC contract.

Quality range matters: q5 drives high quantizer indices (exercising
the strong loop filter and the quantizer table tails), q95 drives
dense coefficients (all token categories); default config enables
segments and the normal filter.
"""
import ctypes
import ctypes.util
import math
import os

lib = ctypes.CDLL(ctypes.util.find_library("webp") or "libwebp.so.7")
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "vp8")


def encode_lossy(rgba: bytes, w: int, h: int, q: float) -> bytes:
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, q, ctypes.byref(out))
    assert n > 0, "libwebp lossy encode failed"
    return ctypes.string_at(out, n)


def decode_yuv(data: bytes):
    ww, hh = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_ubyte)()
    vp = ctypes.POINTER(ctypes.c_ubyte)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    yp = lib.WebPDecodeYUV(data, len(data), ctypes.byref(ww), ctypes.byref(hh),
                           ctypes.byref(up), ctypes.byref(vp),
                           ctypes.byref(stride), ctypes.byref(uv_stride))
    assert yp, "libwebp YUV decode failed"
    w, h = ww.value, hh.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = bytearray()
    for r in range(h):
        y += ctypes.string_at(ctypes.addressof(yp.contents) + r * stride.value, w)
    u = bytearray()
    v = bytearray()
    for r in range(ch):
        u += ctypes.string_at(ctypes.addressof(up.contents) + r * uv_stride.value, cw)
        v += ctypes.string_at(ctypes.addressof(vp.contents) + r * uv_stride.value, cw)
    return bytes(y), bytes(u), bytes(v), w, h


# ---- deterministic content families (RGBA) --------------------------------

def px_flat(x, y):
    return (90, 140, 190, 255)


def px_gradient(x, y):
    return (x * 3 % 256, y * 5 % 256, (x + y) * 2 % 256, 255)


def px_sine(x, y):
    r = int(127 + 120 * math.sin(x * 0.21) * math.cos(y * 0.17))
    g = int(127 + 120 * math.sin((x + y) * 0.11))
    b = int(127 + 120 * math.cos(x * 0.07 - y * 0.13))
    return (r, g, b, 255)


def px_checker(x, y):
    on = ((x // 4) + (y // 4)) % 2 == 0
    return (250, 250, 250, 255) if on else (5, 5, 5, 255)


_seed = [42]


def px_rand(x, y):
    _seed[0] = (1103515245 * _seed[0] + 12345) % (1 << 31)
    r = _seed[0] >> 16
    return (r % 256, (r // 256) % 256, (r // 65536) % 256, 255)


def px_blocks(x, y):
    i = (x // 8 + 3 * (y // 8)) % 5
    pal = [(200, 30, 30), (30, 200, 30), (30, 30, 200), (200, 200, 30), (20, 20, 20)]
    return pal[i] + (255,)


def raster(f, w, h):
    _seed[0] = 42
    b = bytearray()
    for y in range(h):
        for x in range(w):
            b += bytes(f(x, y))
    return bytes(b)


FAMILIES = {
    "flat": px_flat, "grad": px_gradient, "sine": px_sine,
    "check": px_checker, "rand": px_rand, "blocks": px_blocks,
}
SIZES = [(16, 16), (32, 32), (17, 9), (37, 21), (48, 80), (128, 96)]
QUALITIES = [5, 25, 50, 75, 95]


def main():
    os.makedirs(OUT, exist_ok=True)
    count = 0
    for fam, f in FAMILIES.items():
        for (w, h) in SIZES:
            # full quality sweep on two canonical sizes, spot qualities
            # elsewhere (fixture-count economy; every family still sees
            # low/mid/high q somewhere)
            qs = QUALITIES if (w, h) in [(32, 32), (37, 21)] else [25, 75]
            for q in qs:
                rgba = raster(f, w, h)
                webp = encode_lossy(rgba, w, h, q)
                assert webp[12:16] == b"VP8 ", f"{fam}: expected lossy VP8 chunk"
                y, u, v, dw, dh = decode_yuv(webp)
                assert (dw, dh) == (w, h)
                name = f"{fam}_{w}x{h}_q{q}"
                with open(os.path.join(OUT, name + ".webp"), "wb") as fh:
                    fh.write(webp)
                with open(os.path.join(OUT, name + ".yuv"), "wb") as fh:
                    fh.write(y + u + v)
                count += 1
    print(f"[ok] wrote {count} lossy VP8 fixtures to {os.path.normpath(OUT)}")


if __name__ == "__main__":
    main()


# ---- hand-assembled skip-flag stream (libwebp-arbitrated) -----------------
# libwebp's encoder never enables mb_no_coeff_skip on these corpora, so
# the per-MB skip decode path needs a hand-built stream: one 16x16 MB,
# skip=1, DC modes, loop filter level 0. The RFC §7 bool ENCODER below
# writes it; libwebp's decoder validates and decodes it — the truth
# sidecar comes from libwebp exactly like every other fixture.

class BoolEnc:
    def __init__(self):
        self.range = 255
        self.bottom = 0
        self.bitcount = 24
        self.out = bytearray()

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put(self, prob, bit):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xffffffff
            self.bitcount -= 1
            if self.bitcount == 0:
                self.out.append((self.bottom >> 24) & 0xff)
                self.bottom &= 0xffffff
                self.bitcount = 8

    def lit(self, n, v):
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def flush(self):
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xffffffff
            self.bitcount -= 1
            if self.bitcount == 0:
                self.out.append((self.bottom >> 24) & 0xff)
                self.bottom &= 0xffffff
                self.bitcount = 8
        return bytes(self.out)


def coeff_update_probs():
    """CoeffsUpdateProba straight from the shared object — the same
    two-copy-block location derive_vp8_tables.py pins."""
    import ctypes.util
    so = ctypes.util.find_library("webp") or "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
    if not os.path.exists(so):
        so = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
    data = open(so, "rb").read()
    anchor = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
    p0 = data.find(anchor) - 33
    start = p0 - 28 - 900 - 1056
    return data[start:start + 1056]


def gen_skip_fixture():
    upd = coeff_update_probs()
    e = BoolEnc()
    e.put(128, 0)          # color space
    e.put(128, 0)          # clamping
    e.put(128, 0)          # segmentation off
    e.put(128, 0)          # filter type bit
    e.lit(6, 0)            # filter level 0
    e.lit(3, 0)            # sharpness
    e.put(128, 0)          # lf adjustments off
    e.lit(2, 0)            # 1 token partition
    e.lit(7, 20)           # y_ac_qi
    for _ in range(5):
        e.put(128, 0)      # no quant deltas
    e.put(128, 0)          # refresh entropy
    for i in range(1056):
        e.put(upd[i], 0)   # no token prob updates
    e.put(128, 1)          # mb_no_coeff_skip ENABLED
    e.lit(8, 200)          # skip prob
    # one MB: skip=1, ymode=DC, uvmode=DC
    e.put(200, 1)          # skip
    e.put(145, 1)          # ymode: not B_PRED
    e.put(156, 0)
    e.put(163, 0)          # -> DC
    e.put(142, 0)          # uv -> DC
    part1 = e.flush()
    tag = (0 | (0 << 1) | (1 << 4) | (len(part1) << 5))
    frame = bytes([tag & 0xff, (tag >> 8) & 0xff, (tag >> 16) & 0xff,
                   0x9d, 0x01, 0x2a, 16, 0, 16, 0]) + part1 + b"\x00\x00"
    webp = b"RIFF" + (4 + 8 + len(frame) + (len(frame) & 1)).to_bytes(4, "little") + \
        b"WEBP" + b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        webp += b"\x00"
    y, u, v, w, h = decode_yuv(webp)   # libwebp arbitrates the stream
    assert (w, h) == (16, 16)
    open(os.path.join(OUT, "skip_16x16_q50.webp"), "wb").write(webp)
    open(os.path.join(OUT, "skip_16x16_q50.yuv"), "wb").write(y + u + v)
    print(f"[ok] skip_16x16_q50 ({len(webp)} bytes), libwebp-validated; "
          f"Y[0]={y[0]} U[0]={u[0]}")


def coeff_probs0():
    """CoeffsProba0 from the shared object (same block as update probs)."""
    import ctypes.util
    so = ctypes.util.find_library("webp") or "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
    if not os.path.exists(so):
        so = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
    data = open(so, "rb").read()
    anchor = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
    p0 = data.find(anchor) - 33
    return data[p0:p0 + 1056]


def gen_multipart_fixture():
    """16x32 (two MB rows), TWO token partitions (numParts=2), no skip:
    every MB decodes 25 empty blocks (immediate EOB) from the partition
    its row selects — exercising the partition-size walk and per-row
    partition routing libwebp's simple API never emits (1 partition).
    libwebp validates and decodes the stream."""
    upd = coeff_update_probs()
    probs = coeff_probs0()
    kbands = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]

    def p0(typ, first):
        band = kbands[first]
        return probs[((typ * 8 + band) * 3 + 0) * 11 + 0]

    e = BoolEnc()
    e.put(128, 0)          # color space
    e.put(128, 0)          # clamping
    e.put(128, 0)          # segmentation off
    e.put(128, 0)          # filter type bit
    e.lit(6, 0)            # filter level 0
    e.lit(3, 0)            # sharpness
    e.put(128, 0)          # lf adjustments off
    e.lit(2, 1)            # TWO token partitions
    e.lit(7, 20)           # y_ac_qi
    for _ in range(5):
        e.put(128, 0)      # no quant deltas
    e.put(128, 0)          # refresh entropy
    for i in range(1056):
        e.put(upd[i], 0)   # no prob updates
    e.put(128, 0)          # mb_no_coeff_skip DISABLED -> all MBs decode
    for _ in range(2):     # two MBs: ymode DC, uv DC
        e.put(145, 1)
        e.put(156, 0)
        e.put(163, 0)
        e.put(142, 0)
    part1 = e.flush()

    def empty_mb_partition():
        t = BoolEnc()
        t.put(p0(1, 0), 0)             # Y2: EOB
        for _ in range(16):
            t.put(p0(0, 1), 0)         # Y blocks (first coeff 1): EOB
        for _ in range(8):
            t.put(p0(2, 0), 0)         # U+V blocks: EOB
        return t.flush()

    partA = empty_mb_partition()       # MB row 0
    partB = empty_mb_partition()       # MB row 1
    tag = (0 | (0 << 1) | (1 << 4) | (len(part1) << 5))
    frame = bytes([tag & 0xff, (tag >> 8) & 0xff, (tag >> 16) & 0xff,
                   0x9d, 0x01, 0x2a, 16, 0, 32, 0]) + part1 + \
        len(partA).to_bytes(3, "little") + partA + partB
    webp = b"RIFF" + (4 + 8 + len(frame) + (len(frame) & 1)).to_bytes(4, "little") + \
        b"WEBP" + b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        webp += b"\x00"
    y, u, v, w, h = decode_yuv(webp)
    assert (w, h) == (16, 32)
    open(os.path.join(OUT, "multipart_16x32_q50.webp"), "wb").write(webp)
    open(os.path.join(OUT, "multipart_16x32_q50.yuv"), "wb").write(y + u + v)
    print(f"[ok] multipart_16x32_q50 ({len(webp)} bytes), libwebp-validated; "
          f"Y[0]={y[0]}")


if __name__ == "__main__" and "--skip-only" in __import__("sys").argv:
    gen_skip_fixture()
    gen_multipart_fixture()


# ---- hand-assembled SIMPLE-loop-filter streams (libwebp-arbitrated) -------
# libwebp's encoder ALWAYS selects the normal filter, so the simple-filter
# decode path (§15.4) is unreachable from encoded corpora — exactly the
# gap that let the mbLim+4/subLim+4 threshold bug ship (ADVICE r17).
# These streams set the header filter-type bit with a nonzero level and
# carry hand-built DCT coefficients (the full token tree incl. the cat1-6
# extra-bit categories, per-block nonzero contexts and the after-zero
# EOB-skip rule) so block/MB edges land on MANY step magnitudes,
# including near-threshold ones where a 4-too-large limit diverges.
# libwebp decodes each stream for the truth sidecar, same as every
# other fixture. The _v2 variant sets frame-tag version=2 to pin that
# the filter choice follows the HEADER BIT, not the version (libwebp
# ignores the version bits; RFC §9.1/libvpx would map v2 to no filter —
# the two references disagree and the declared oracle is libwebp).

# coefficient token tree paths as (probIndex, bit) pairs (RFC §13.2)
_PATHS = {
    "EOB":   [(0, 0)],
    "ZERO":  [(0, 1), (1, 0)],
    "ONE":   [(0, 1), (1, 1), (2, 0)],
    "TWO":   [(0, 1), (1, 1), (2, 1), (3, 0), (4, 0)],
    "THREE": [(0, 1), (1, 1), (2, 1), (3, 0), (4, 1), (5, 0)],
    "FOUR":  [(0, 1), (1, 1), (2, 1), (3, 0), (4, 1), (5, 1)],
    "CAT1":  [(0, 1), (1, 1), (2, 1), (3, 1), (6, 0), (7, 0)],
    "CAT2":  [(0, 1), (1, 1), (2, 1), (3, 1), (6, 0), (7, 1)],
    "CAT3":  [(0, 1), (1, 1), (2, 1), (3, 1), (6, 1), (8, 0), (9, 0)],
    "CAT4":  [(0, 1), (1, 1), (2, 1), (3, 1), (6, 1), (8, 0), (9, 1)],
    "CAT5":  [(0, 1), (1, 1), (2, 1), (3, 1), (6, 1), (8, 1), (10, 0)],
    "CAT6":  [(0, 1), (1, 1), (2, 1), (3, 1), (6, 1), (8, 1), (10, 1)],
}
_CATS = {
    "CAT1": ([159], 5),
    "CAT2": ([165, 145], 7),
    "CAT3": ([173, 148, 140], 11),
    "CAT4": ([176, 155, 140, 135], 19),
    "CAT5": ([180, 157, 141, 134, 130], 35),
    "CAT6": ([254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129], 67),
}
_KBANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]


def _token_for(a):
    if a == 0:
        return "ZERO"
    if a <= 4:
        return ["ONE", "TWO", "THREE", "FOUR"][a - 1]
    for t in ["CAT1", "CAT2", "CAT3", "CAT4", "CAT5", "CAT6"]:
        probs, base = _CATS[t]
        if a < base + (1 << len(probs)) or t == "CAT6":
            if a >= base:
                return t
    raise AssertionError(a)


def _encode_block(e, probs, typ, coeffs, first, ctx0):
    """Token-encode one 4x4 block (coeffs in SCAN order, 16 entries).
    Returns True iff the block carries any nonzero coefficient."""
    last = max((i for i in range(16) if coeffs[i] != 0), default=-1)
    assert last < 0 or coeffs[last] != 0
    n, ctx, prev_zero = first, ctx0, False
    while n < 16:
        band = _KBANDS[n]
        p = probs[((typ * 8 + band) * 3 + ctx) * 11:]
        if n > last:
            assert not prev_zero, "EOB may not follow a ZERO token"
            for (pi, bit) in _PATHS["EOB"]:
                e.put(p[pi], bit)
            break
        v = coeffs[n]
        a = abs(v)
        tok = _token_for(a)
        path = _PATHS[tok][1:] if prev_zero else _PATHS[tok]
        for (pi, bit) in path:
            e.put(p[pi], bit)
        if tok in _CATS:
            cps, base = _CATS[tok]
            resid = a - base
            assert 0 <= resid < (1 << len(cps))
            for i, cp in enumerate(cps):
                e.put(cp, (resid >> (len(cps) - 1 - i)) & 1)
        if a != 0:
            e.put(128, 1 if v < 0 else 0)
        prev_zero = (a == 0)
        ctx = 0 if a == 0 else (1 if a == 1 else 2)
        n += 1
    return last >= first


def _ac(v, pos=1):
    c = [0] * 16
    c[pos] = v
    return c


def gen_simplef_fixture(name, mb_cols, mb_rows, level, sharpness,
                        y2_dc, y_acs, version=0, y_ac_qi=10):
    """One simple-filter keyframe: mb_cols x mb_rows DC-mode MBs.
    y2_dc[mb] is the MB's Y2 DC coefficient; y_acs[mb][blk] the AC
    (scan pos 1) of Y block blk. U/V are all-EOB (the simple filter is
    Y-only). Nonzero contexts are tracked across blocks AND MBs."""
    upd = coeff_update_probs()
    probs = coeff_probs0()
    w, h = mb_cols * 16, mb_rows * 16
    e = BoolEnc()
    e.put(128, 0)          # color space
    e.put(128, 0)          # clamping
    e.put(128, 0)          # segmentation off
    e.put(128, 1)          # filter type bit: SIMPLE
    e.lit(6, level)
    e.lit(3, sharpness)
    e.put(128, 0)          # lf adjustments off
    e.lit(2, 0)            # 1 token partition
    e.lit(7, y_ac_qi)
    for _ in range(5):
        e.put(128, 0)      # no quant deltas
    e.put(128, 0)          # refresh entropy
    for i in range(1056):
        e.put(upd[i], 0)   # no token prob updates
    e.put(128, 0)          # mb_no_coeff_skip DISABLED
    for _ in range(mb_cols * mb_rows):
        e.put(145, 1)      # ymode: DC
        e.put(156, 0)
        e.put(163, 0)
        e.put(142, 0)      # uvmode: DC
    part1 = e.flush()

    t = BoolEnc()
    # nonzero-context state: above[] persists across MB rows, left
    # resets per MB row (RFC §13.4)
    ab_y2 = [0] * mb_cols
    ab_y = [[0] * 4 for _ in range(mb_cols)]   # bottom-row Y flags
    ab_u = [[0] * 2 for _ in range(mb_cols)]
    ab_v = [[0] * 2 for _ in range(mb_cols)]
    for my in range(mb_rows):
        lf_y2 = 0
        lf_y = [0] * 4                          # right-col Y flags
        lf_u = [0] * 2
        lf_v = [0] * 2
        for mx in range(mb_cols):
            mb = my * mb_cols + mx
            # Y2 (typ 1, first=0)
            ctx = (lf_y2 if mx > 0 else 0) + (ab_y2[mx] if my > 0 else 0)
            y2c = [0] * 16
            y2c[0] = y2_dc[mb]
            nzy2 = _encode_block(t, probs, 1, y2c, 0, ctx)
            lf_y2 = ab_y2[mx] = int(nzy2)
            # 16 Y blocks (typ 0, first=1), raster within the MB
            nz = [[0] * 4 for _ in range(4)]
            for r in range(4):
                for c in range(4):
                    lnz = nz[r][c - 1] if c > 0 else \
                        (lf_y[r] if mx > 0 else 0)
                    anz = nz[r - 1][c] if r > 0 else \
                        (ab_y[mx][c] if my > 0 else 0)
                    coeffs = _ac(y_acs[mb][r * 4 + c])
                    nz[r][c] = int(_encode_block(
                        t, probs, 0, coeffs, 1, lnz + anz))
            for r in range(4):
                lf_y[r] = nz[r][3]
            ab_y[mx] = [nz[3][c] for c in range(4)]
            # U then V (typ 2, first=0): all EOB
            for plane, lf_c, ab_c in ((0, lf_u, ab_u), (1, lf_v, ab_v)):
                cnz = [[0] * 2 for _ in range(2)]
                for r in range(2):
                    for c in range(2):
                        lnz = cnz[r][c - 1] if c > 0 else \
                            (lf_c[r] if mx > 0 else 0)
                        anz = cnz[r - 1][c] if r > 0 else \
                            (ab_c[mx][c] if my > 0 else 0)
                        cnz[r][c] = int(_encode_block(
                            t, probs, 2, [0] * 16, 0, lnz + anz))
                for r in range(2):
                    lf_c[r] = cnz[r][1]
                ab_c[mx] = [cnz[1][c] for c in range(2)]
    part2 = t.flush()

    tag = (0 | (version << 1) | (1 << 4) | (len(part1) << 5))
    frame = bytes([tag & 0xff, (tag >> 8) & 0xff, (tag >> 16) & 0xff,
                   0x9d, 0x01, 0x2a, w & 0xff, w >> 8, h & 0xff, h >> 8]) + \
        part1 + part2
    webp = b"RIFF" + (4 + 8 + len(frame) + (len(frame) & 1)).to_bytes(4, "little") + \
        b"WEBP" + b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        webp += b"\x00"
    y, u, v, dw, dh = decode_yuv(webp)   # libwebp arbitrates the stream
    assert (dw, dh) == (w, h)
    open(os.path.join(OUT, name + ".webp"), "wb").write(webp)
    open(os.path.join(OUT, name + ".yuv"), "wb").write(y + u + v)
    print(f"[ok] {name} ({len(webp)} bytes), libwebp-validated; "
          f"distinct Y values: {len(set(y))}")


def gen_simplef_fixtures():
    # single MB, level 4, sharpness 0 (subLim=12): inner-edge steps of
    # many magnitudes; the +4 bug filters masks in (12,16] that the
    # correct limit leaves alone
    acs16 = [2, -3, 5, -8, 1, -2, 4, -6, 9, -12, 3, -1, 7, -5, 10, -4]
    gen_simplef_fixture("simplef_16x16_lv4", 1, 1, 4, 0,
                        y2_dc=[7], y_acs=[acs16])
    # 2x2 MBs, level 10 (mbLim=34/subLim=30): exercises the mbX>0 and
    # mbY>0 simple MB-edge paths with per-MB DC offsets + varied ACs
    accs = [
        [1, -2, 3, -5, 2, -1, 4, -3, 6, -8, 2, -2, 5, -4, 7, -6],
        [-2, 4, -6, 9, -3, 2, -5, 7, -11, 14, -4, 3, -8, 6, -12, 10],
        [3, -5, 8, -12, 4, -3, 6, -9, 13, -17, 5, -4, 10, -7, 15, -11],
        [0, 1, -1, 2, 0, -2, 3, 0, -3, 4, 0, -4, 5, -5, 6, -6],
    ]
    gen_simplef_fixture("simplef_32x32_lv10", 2, 2, 10, 0,
                        y2_dc=[0, 13, -9, 30], y_acs=accs)
    # level 20 + sharpness 3 (interior capped at 6): the
    # sharpness-reduction path under the simple filter
    gen_simplef_fixture("simplef_32x32_lv20s3", 2, 2, 20, 3,
                        y2_dc=[5, -20, 35, -8], y_acs=accs)
    # version=2 frame tag, same payload as lv4: libwebp still applies
    # the simple filter (version bits ignored) — pins the oracle choice
    gen_simplef_fixture("simplef_v2_16x16_lv4", 1, 1, 4, 0,
                        y2_dc=[7], y_acs=[acs16], version=2)


if __name__ == "__main__" and "--simplef-only" in __import__("sys").argv:
    gen_simplef_fixtures()
