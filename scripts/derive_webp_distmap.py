#!/usr/bin/env python3
"""Derive VP8L's 120-entry 2D distance map EMPIRICALLY from the system
libwebp decoder (the canonical implementation of the public spec):
for each plane code c in 1..120, hand-assemble a minimal VP8L stream
that paints every pixel with a position-unique color and then emits ONE
length-1 backward reference with distance code c; whatever pixel
libwebp copies reveals the (dx, dy) the code maps to.

Prints the table as Scala source for WebpDecode.DistMap.
"""
import ctypes

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]


class Bw:
    """LSB-first bit writer (VP8L convention)."""

    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def put_code(self, code, length):
        # prefix codes are written MSB-of-code first
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def canonical(lengths):
    """symbol -> (code, len) canonical assignment (by len, then symbol)."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= (l - prev_len)
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


def write_cl_coded(bw, lens, alphabet):
    """Write a 'normal' prefix code: code-length code + code lengths."""
    # choose a CL alphabet covering the distinct lengths + zero-runs
    used = sorted(set(l for l in lens if l > 0))
    cl_syms = list(used)
    if 0 in lens:
        cl_syms += [0, 18]
    # CL code lengths: give every used CL symbol the same length L with
    # padding via Kraft: pick L = ceil(log2(n)) and pad by assigning
    # some symbols shorter codes; simplest complete assignment: use
    # lengths from a Huffman over equal weights -> balanced tree with
    # sizes 2^k; handle n in {1,2,3,4}
    n = len(set(cl_syms))
    syms = sorted(set(cl_syms))
    if n == 1:
        cl_lens = {syms[0]: 1}  # degenerate: decoder reads 0 bits? use 2 syms
        # avoid: add 18 as dummy
        syms = sorted(set(syms + [18]))
        n = 2
    if n == 2:
        cl_lens = {syms[0]: 1, syms[1]: 1}
    elif n == 3:
        cl_lens = {syms[0]: 1, syms[1]: 2, syms[2]: 2}
    elif n == 4:
        cl_lens = {s: 2 for s in syms}
    else:
        raise AssertionError(f"too many CL symbols {syms}")
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
    num_cl = max(order.index(s) for s in cl_lens) + 1
    num_cl = max(num_cl, 4)
    bw.put(0, 1)             # normal (not simple)
    bw.put(num_cl - 4, 4)
    for i in range(num_cl):
        bw.put(cl_lens.get(order[i], 0), 3)
    bw.put(0, 1)             # no max_symbol cut
    cl_codes = canonical([cl_lens.get(s, 0) for s in range(19)])
    i = 0
    while i < alphabet:
        l = lens[i] if i < len(lens) else 0
        if l > 0:
            c, cl = cl_codes[l]
            bw.put_code(c, cl)
            i += 1
        else:
            run = 0
            while i + run < alphabet and (lens[i + run] if i + run < len(lens) else 0) == 0:
                run += 1
            while run > 0:
                r = min(run, 138)
                if r < 11:
                    # short zero runs: emit literal zeros
                    c, cl = cl_codes[0]
                    for _ in range(r):
                        bw.put_code(c, cl)
                else:
                    c, cl = cl_codes[18]
                    bw.put_code(c, cl)
                    bw.put(r - 11, 7)
                i += r
                run -= r


def build_stream(w, h, ops):
    """ops: list of ('lit', r, g, b, a) or ('ref', plane_code).
    green: lens(g)=?: we use literal green value 1 and symbol 256
    (length code 0 -> length 1); red/blue: all-256 len-8; alpha: simple
    single-symbol 255; distance: all 40 at lens 5/6 (24x5 + 16x6)."""
    bw = Bw()
    bw.put(0x2f, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta prefix codes
    # green code: symbols {1, 256} len 1 each
    glens = [0] * 280
    glens[1] = 1
    glens[256] = 1
    write_cl_coded(bw, glens, 280)
    gcodes = canonical(glens)
    # red, blue: all 256 at len 8
    rblens = [8] * 256
    for _ in range(2):
        write_cl_coded(bw, rblens, 256)
    rbcodes = canonical(rblens)
    # alpha: simple code, 1 symbol = 255 (8-bit form)
    bw.put(1, 1)  # simple
    bw.put(0, 1)  # num_symbols = 1
    bw.put(1, 1)  # first symbol in 8 bits
    bw.put(255, 8)
    # distance: 40 symbols, 24 at len 5 + 16 at len 6 (complete)
    dlens = [5] * 24 + [6] * 16
    write_cl_coded(bw, dlens, 40)
    dcodes = canonical(dlens)

    for op in ops:
        if op[0] == 'lit':
            _, r, g, b, a = op
            c, l = gcodes[g]
            bw.put_code(c, l)
            c, l = rbcodes[r]
            bw.put_code(c, l)
            c, l = rbcodes[b]
            bw.put_code(c, l)
            # alpha: 0 bits (single-symbol code)
        else:
            _, plane = op
            # length 1 => length prefix code 0 (green symbol 256)
            c, l = gcodes[256]
            bw.put_code(c, l)
            # distance prefix for value `plane`
            if plane < 5:
                pc, extra, nbits = plane - 1, 0, 0
            else:
                # value = offset + extra + 1 with offset=(2+(pc&1))<<eb
                pc = None
                for cand in range(4, 40):
                    eb = (cand - 2) >> 1
                    off = (2 + (cand & 1)) << eb
                    if off + 1 <= plane <= off + (1 << eb):
                        pc, extra, nbits = cand, plane - off - 1, eb
                        break
            c, l = dcodes[pc]
            bw.put_code(c, l)
            if nbits:
                bw.put(extra, nbits)
    payload = bw.bytes()
    riff = bytearray()
    riff += b"RIFF"
    sz = 4 + 8 + len(payload) + (len(payload) & 1)
    riff += sz.to_bytes(4, "little")
    riff += b"WEBPVP8L"
    riff += len(payload).to_bytes(4, "little")
    riff += payload
    if len(payload) & 1:
        riff += b"\x00"
    return bytes(riff)


def decode(data):
    ww, hh = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(ww), ctypes.byref(hh))
    assert p, "libwebp decode failed"
    return ctypes.string_at(p, ww.value * hh.value * 4), ww.value, hh.value


def build_pred_stream(w, h, tile_bits, modes, residual):
    """VP8L stream WITH a predictor transform: tile image carries
    `modes` (cycling), main image carries `residual` literals. The
    canonical decoder's output becomes the fixture ground truth —
    pinning ALL 14 predictor modes incl. edge rules, which libwebp's
    own encoder only partially exercises."""
    bw = Bw()
    bw.put(0x2f, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    # one transform: predictor
    bw.put(1, 1)
    bw.put(0, 2)             # type 0 = predictor
    bw.put(tile_bits - 2, 3)
    tw = (w + (1 << tile_bits) - 1) >> tile_bits
    th = (h + (1 << tile_bits) - 1) >> tile_bits
    # tile sub-image: its own image stream -> cache bit first, then the
    # 5 prefix codes; literal ARGB pixels with green = mode
    #   green code: all 256 len 8; red/blue/alpha: simple single 0/0/255
    bw.put(0, 1)  # sub-image: no color cache
    rblens = [8] * 256
    glens = [8] * 256 + [0] * 24
    write_cl_coded(bw, glens, 280)
    gcodes = canonical(glens)

    def simple1(sym):
        bw.put(1, 1)
        bw.put(0, 1)
        bw.put(1, 1)
        bw.put(sym, 8)
    simple1(0)    # red
    simple1(0)    # blue
    simple1(255)  # alpha
    simple1(0)    # distance (unused)
    for i in range(tw * th):
        c, l = gcodes[modes[i % len(modes)]]
        bw.put_code(c, l)
    bw.put(0, 1)  # no more transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta
    # main image: literal residuals, all four channels coded len-8
    write_cl_coded(bw, glens, 280)
    write_cl_coded(bw, rblens, 256)
    write_cl_coded(bw, rblens, 256)
    write_cl_coded(bw, rblens, 256)
    simple1(0)    # distance (unused)
    rbcodes = canonical(rblens)
    for (r, g, b, a) in residual:
        c, l = gcodes[g]
        bw.put_code(c, l)
        c, l = rbcodes[r]
        bw.put_code(c, l)
        c, l = rbcodes[b]
        bw.put_code(c, l)
        c, l = rbcodes[a]
        bw.put_code(c, l)
    payload = bw.bytes()
    riff = bytearray()
    riff += b"RIFF"
    sz = 4 + 8 + len(payload) + (len(payload) & 1)
    riff += sz.to_bytes(4, "little")
    riff += b"WEBPVP8L"
    riff += len(payload).to_bytes(4, "little")
    riff += payload
    if len(payload) & 1:
        riff += b"\x00"
    return bytes(riff)


def gen_pred_fixture():
    import os
    w, h, tile_bits = 37, 21, 2  # odd dims: partial edge tiles
    modes = list(range(14))
    s = [987654321]

    def rnd():
        x = s[0]
        x ^= (x << 13) & 0xffffffff
        x ^= x >> 17
        x ^= (x << 5) & 0xffffffff
        s[0] = x
        return x
    residual = []
    for _ in range(w * h):
        x = rnd()
        residual.append((x & 0x3f, (x >> 8) & 0x3f, (x >> 16) & 0x3f,
                         (x >> 24) & 0x3f))
    data = build_pred_stream(w, h, tile_bits, modes, residual)
    rgba, ww, hh = decode(data)
    assert (ww, hh) == (w, h)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "webp")
    base = os.path.join(out, f"predmodes_{w}x{h}")
    open(base + ".webp", "wb").write(data)
    open(base + ".rgba", "wb").write(rgba)
    print(f"wrote predmodes_{w}x{h}: {len(data)} bytes "
          f"(ground truth = libwebp decode)")


def main():
    import sys as _sys
    if len(_sys.argv) > 1 and _sys.argv[1] == "--gen-pred":
        gen_pred_fixture()
        return
    w, h = 32, 10
    table = []
    for plane in range(1, 121):
        # paint rows 0..8 fully + 16 pixels of row 9 with unique colors,
        # then one len-1 backref at (16, 9)
        ops = []
        npix = 9 * w + 16
        for i in range(npix):
            x, y = i % w, i // w
            ops.append(('lit', x, 1, y, 255))
        ops.append(('ref', plane))
        # fill the remainder with literals
        for i in range(npix + 1, w * h):
            x, y = i % w, i // w
            ops.append(('lit', x, 1, y, 255))
        data = build_stream(w, h, ops)
        rgba, ww, hh = decode(data)
        assert (ww, hh) == (w, h)
        # the backref pixel:
        o = (9 * w + 16) * 4
        sx, sy = rgba[o], rgba[o + 2]
        dx, dy = 16 - sx, 9 - sy
        # linear check: dist = dy*w + dx must match a 2D map entry
        table.append((dx, dy))
    # sanity: every plane>120-equivalent linear distance of code 1..120
    for i, (dx, dy) in enumerate(table):
        print(f"({dx}, {dy})", end=",\n" if i % 8 == 7 else " ")
    # quick self-check: codes must be unique as distances
    print("\nunique:", len(set(table)) == 120)


if __name__ == "__main__":
    main()
