#!/usr/bin/env python3
"""Animated-WebP-with-LOSSY-frames fixtures (r17 verdict #1) plus the
uniform-chroma ARGB sweep that behaviorally pins the YUV->ARGB kernel.

Two packs, both written to src/test/resources/vp8:

1. ARGB kernel sweep — single-MB hand-assembled VP8 stills whose chroma
   planes are UNIFORM (one chroma DC per 4x4 block, same value across
   the MB). With a constant chroma plane libwebp's implementation-
   defined fancy upsampler is the IDENTITY, so WebPDecodeRGBA's output
   isolates the per-(y,u,v) fixed-point conversion kernel — exactly
   what Vp8Decode.yuvToArgb must reproduce per sample. Files:
   <name>.webp / .yuv (WebPDecodeYUV truth) / .argb (WebPDecodeRGBA
   truth, raw RGBA bytes).

2. Animated containers (VP8X+ANIM+ANMF) whose ANMF payloads are lossy
   VP8 (hand-assembled, libwebp-arbitrated), VP8+ALPH (raw-compression
   alpha with a predictor filter), and VP8L (libwebp-encoded) — the
   mixed-frame realism case the VP8L-only decodeAnim rejected. Truth:
   each frame's pixels come from libwebp's STILL decode of that
   payload (WebPDecodeRGBA on a minimal muxed still), and the
   dispose/blend composition is replayed by an INDEPENDENT Python
   compositor implementing the container spec's src-over-dst formula.
   libwebp.so.7 itself cannot arbitrate the composition (animation
   demux lives in libwebpdemux, absent here) — the same evidence
   standard as the VP8L animation and GIF work. Files:
   <name>.webp / <name>.canvases (concatenated per-frame RGBA
   canvases, frame-major).

Uniform-chroma frames also keep the per-frame truth upsampler-exact;
luma may vary freely (luma is full-resolution, no upsampling).
"""
import os
import sys
import ctypes
import ctypes.util

sys.path.insert(0, os.path.dirname(__file__))
from gen_vp8_fixtures import (  # noqa: E402
    BoolEnc, coeff_update_probs, coeff_probs0, _encode_block, _ac,
    decode_yuv, OUT, lib)

lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_void_p)]


def decode_rgba(data):
    ww, hh = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(ww), ctypes.byref(hh))
    assert p, "libwebp RGBA decode failed"
    n = ww.value * hh.value * 4
    return ctypes.string_at(p, n), ww.value, hh.value


# ---------------------------------------------------------------- VP8 builder

def build_vp8_frame(mb_cols, mb_rows, level, sharpness, simple,
                    y2_dc, y_acs, uv_dc=None, version=0, y_ac_qi=10,
                    lf_delta=None, bpred=frozenset()):
    """Hand-assemble one VP8 keyframe BITSTREAM (no RIFF) of DC-mode
    MBs: per-MB Y2 DC, per-Y-block AC (scan pos 1), and per-MB chroma
    DCs (same value on all four 4x4 sub-blocks of a plane -> the
    plane reconstructs UNIFORM within the MB). Nonzero contexts are
    tracked across blocks and MBs; the generalization of
    gen_vp8_fixtures' simplef builder that the anim pack needs."""
    upd = coeff_update_probs()
    probs = coeff_probs0()
    if uv_dc is None:
        uv_dc = [(0, 0)] * (mb_cols * mb_rows)
    w, h = mb_cols * 16, mb_rows * 16
    e = BoolEnc()
    e.put(128, 0)          # color space
    e.put(128, 0)          # clamping
    e.put(128, 0)          # segmentation off
    e.put(128, 1 if simple else 0)  # filter type bit
    e.lit(6, level)
    e.lit(3, sharpness)
    if lf_delta is None:
        e.put(128, 0)      # lf adjustments off
    else:
        ref0, mode0 = lf_delta
        e.put(128, 1)      # lf adjustments ENABLED
        e.put(128, 1)      # update delta values
        for d in (ref0, 0, 0, 0, mode0, 0, 0, 0):  # 4 ref + 4 mode
            if d == 0:
                e.put(128, 0)
            else:
                e.put(128, 1)
                e.lit(6, abs(d))
                e.put(128, 1 if d < 0 else 0)  # sign
    e.lit(2, 0)            # 1 token partition
    e.lit(7, y_ac_qi)
    for _ in range(5):
        e.put(128, 0)      # no quant deltas
    e.put(128, 0)          # refresh entropy
    for i in range(1056):
        e.put(upd[i], 0)   # no token prob updates
    e.put(128, 0)          # mb_no_coeff_skip DISABLED
    for mb in range(mb_cols * mb_rows):
        if mb in bpred:
            e.put(145, 0)  # ymode: B_PRED
            # 16 submodes, all B_DC_PRED: with every neighbor submode
            # (incl. the implied border) B_DC, the context is always
            # kf_bmode_prob[0][0] whose first tree prob is 231
            for _ in range(16):
                e.put(231, 0)
        else:
            e.put(145, 1)  # ymode: DC
            e.put(156, 0)
            e.put(163, 0)
        e.put(142, 0)      # uvmode: DC
    part1 = e.flush()

    t = BoolEnc()
    ab_y2 = [0] * mb_cols
    ab_y = [[0] * 4 for _ in range(mb_cols)]
    ab_u = [[0] * 2 for _ in range(mb_cols)]
    ab_v = [[0] * 2 for _ in range(mb_cols)]
    for my in range(mb_rows):
        lf_y2 = 0
        lf_y = [0] * 4
        lf_u = [0] * 2
        lf_v = [0] * 2
        for mx in range(mb_cols):
            mb = my * mb_cols + mx
            is_bpred = mb in bpred
            if is_bpred:
                # B_PRED MB: no Y2 block; neighbor Y2 nonzero contexts
                # are PRESERVED, not updated (single-MB fixtures only,
                # so no later MB ever reads them here)
                assert mb_cols * mb_rows == 1, \
                    "bpred supported only in single-MB fixtures"
            else:
                ctx = (lf_y2 if mx > 0 else 0) + (ab_y2[mx] if my > 0 else 0)
                y2c = [0] * 16
                y2c[0] = y2_dc[mb]
                nzy2 = _encode_block(t, probs, 1, y2c, 0, ctx)
                lf_y2 = ab_y2[mx] = int(nzy2)
            ytyp, yfirst = (3, 0) if is_bpred else (0, 1)
            nz = [[0] * 4 for _ in range(4)]
            for r in range(4):
                for c in range(4):
                    lnz = nz[r][c - 1] if c > 0 else (lf_y[r] if mx > 0 else 0)
                    anz = nz[r - 1][c] if r > 0 else \
                        (ab_y[mx][c] if my > 0 else 0)
                    coeffs = _ac(y_acs[mb][r * 4 + c],
                                 pos=0 if is_bpred else 1)
                    nz[r][c] = int(_encode_block(
                        t, probs, ytyp, coeffs, yfirst, lnz + anz))
            for r in range(4):
                lf_y[r] = nz[r][3]
            ab_y[mx] = [nz[3][c] for c in range(4)]
            for plane, lf_c, ab_c in ((0, lf_u, ab_u), (1, lf_v, ab_v)):
                dc = uv_dc[mb][plane]
                cc = [0] * 16
                cc[0] = dc
                cnz = [[0] * 2 for _ in range(2)]
                for r in range(2):
                    for c in range(2):
                        lnz = cnz[r][c - 1] if c > 0 else \
                            (lf_c[r] if mx > 0 else 0)
                        anz = cnz[r - 1][c] if r > 0 else \
                            (ab_c[mx][c] if my > 0 else 0)
                        cnz[r][c] = int(_encode_block(
                            t, probs, 2, cc, 0, lnz + anz))
                for r in range(2):
                    lf_c[r] = cnz[r][1]
                ab_c[mx] = [cnz[1][c] for c in range(2)]
    part2 = t.flush()

    tag = (0 | (version << 1) | (1 << 4) | (len(part1) << 5))
    return bytes([tag & 0xff, (tag >> 8) & 0xff, (tag >> 16) & 0xff,
                  0x9d, 0x01, 0x2a, w & 0xff, w >> 8, h & 0xff, h >> 8]) + \
        part1 + part2


def chunk(cc, payload):
    b = cc + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        b += b"\x00"
    return b


def riff(body):
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body


def mux_still(vp8_frame, alph=None, w=None, h=None):
    """Bare VP8 still, or VP8X+ALPH+VP8 when an alpha payload rides."""
    if alph is None:
        return riff(chunk(b"VP8 ", vp8_frame))
    vp8x = bytes([0x10, 0, 0, 0]) + \
        (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    return riff(chunk(b"VP8X", vp8x) + chunk(b"ALPH", alph) +
                chunk(b"VP8 ", vp8_frame))


# -------------------------------------------------------- ARGB kernel sweep

def gen_argb_sweep():
    acs = [2, -3, 5, -8, 1, -2, 4, -6, 9, -12, 3, -1, 7, -5, 10, -4]
    # (u_dc, v_dc) spread across the chroma range so every kernel term
    # (the +26149v, -6419u-13320v, +33050u coefficients and both clip
    # directions) is exercised at several operating points
    sweep = [(0, 0), (-60, 0), (0, -60), (40, 40), (-40, 60), (80, -80),
             (25, -25), (-80, 80)]
    for (du, dv) in sweep:
        name = f"argb_16x16_u{du}_v{dv}".replace("-", "m")
        frame = build_vp8_frame(1, 1, 0, 0, False, y2_dc=[7], y_acs=[acs],
                                uv_dc=[(du, dv)])
        webp = mux_still(frame)
        y, u, v, w, h = decode_yuv(webp)
        assert (w, h) == (16, 16)
        assert len(set(u)) == 1 and len(set(v)) == 1, \
            f"{name}: chroma not uniform (upsampler would differ)"
        rgba, rw, rh = decode_rgba(webp)
        assert (rw, rh) == (16, 16)
        open(os.path.join(OUT, name + ".webp"), "wb").write(webp)
        open(os.path.join(OUT, name + ".yuv"), "wb").write(y + u + v)
        open(os.path.join(OUT, name + ".argb"), "wb").write(rgba)
        print(f"[ok] {name}: u={u[0]} v={v[0]} distinctY={len(set(y))}")


# ------------------------------------------------------------- anim fixtures

def alph_raw(alpha_plane, w, h, method):
    """Raw-compression ALPH payload with predictor filter `method`
    (store residuals; the decoder's unfilter reconstructs)."""
    out = bytearray([method << 2])  # preproc 0, filter, compression 0
    rec = [[0] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            a = rec[y][x - 1] if x > 0 else None
            b = rec[y - 1][x] if y > 0 else None
            if method == 0:
                pred = 0
            elif method == 1:
                pred = a if a is not None else (b if b is not None else 0)
            elif method == 2:
                pred = b if b is not None else (a if a is not None else 0)
            else:
                if a is not None and b is not None:
                    c = rec[y - 1][x - 1]
                    pred = max(0, min(255, a + b - c))
                elif a is not None:
                    pred = a
                elif b is not None:
                    pred = b
                else:
                    pred = 0
            val = alpha_plane[y * w + x]
            rec[y][x] = val
            out.append((val - pred) & 0xff)
    return bytes(out)


def encode_vp8l(rgba, w, h):
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n > 0, "libwebp lossless encode failed"
    data = ctypes.string_at(out, n)
    # extract the VP8L chunk payload from the still container
    pos = 12
    while pos + 8 <= len(data):
        cc = data[pos:pos + 4]
        sz = int.from_bytes(data[pos + 4:pos + 8], "little")
        if cc == b"VP8L":
            return data[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    raise AssertionError("no VP8L chunk in lossless encode")


def blend_px(s, d):
    sr, sg, sb, sa = s
    if sa == 255:
        return s
    if sa == 0:
        return d
    dr, dg, db, da = d
    ao = sa + da * (255 - sa) // 255
    if ao == 0:
        return (0, 0, 0, 0)

    def ch(cs, cd):
        return (cs * sa + cd * da * (255 - sa) // 255) // ao
    return (ch(sr, dr), ch(sg, dg), ch(sb, db), ao)


def compose(frames, cw, ch, bg):
    """Independent replay of the container-spec composition: canvas
    starts transparent, per frame BLEND or OVERWRITE the rect, snapshot,
    then dispose-to-background if flagged."""
    canvas = [(0, 0, 0, 0)] * (cw * ch)
    outs = []
    for f in frames:
        fw, fh = f["w"], f["h"]
        for yy in range(fh):
            for xx in range(fw):
                s = f["rgba"][yy * fw + xx]
                ci = (f["y"] + yy) * cw + (f["x"] + xx)
                canvas[ci] = blend_px(s, canvas[ci]) if f["blend"] else s
        outs.append(bytes(b for p in canvas for b in p))
        if f["dispose"]:
            for yy in range(fh):
                for xx in range(fw):
                    canvas[(f["y"] + yy) * cw + (f["x"] + xx)] = bg
    return outs


def anmf(f):
    flags = (0 if f["blend"] else 2) | (1 if f["dispose"] else 0)
    hdr = (f["x"] // 2).to_bytes(3, "little") + \
        (f["y"] // 2).to_bytes(3, "little") + \
        (f["w"] - 1).to_bytes(3, "little") + \
        (f["h"] - 1).to_bytes(3, "little") + \
        (40).to_bytes(3, "little") + bytes([flags])
    body = hdr
    if f.get("alph") is not None:
        body += chunk(b"ALPH", f["alph"])
    body += chunk(f["cc"], f["payload"])
    return chunk(b"ANMF", body)


def mux_anim(cw, ch, bg_rgba, loops, frames):
    vp8x = bytes([0x02, 0, 0, 0]) + \
        (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    # ANIM background stored B,G,R,A
    anim = bytes([bg_rgba[2], bg_rgba[1], bg_rgba[0], bg_rgba[3]]) + \
        loops.to_bytes(2, "little")
    body = chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim)
    for f in frames:
        body += anmf(f)
    return riff(body)


def frame_truth(f):
    """Per-frame RGBA truth from libwebp's STILL decode of the payload."""
    if f["cc"] == b"VP8L":
        still = riff(chunk(b"VP8L", f["payload"]))
    else:
        still = mux_still(f["payload"], f.get("alph"), f["w"], f["h"])
        # lossy frames MUST reconstruct a UNIFORM chroma plane — with
        # any chroma variation libwebp's fancy upsampler and the
        # decoder's declared point upsampling legitimately diverge
        # near transitions, and the truth stops isolating the
        # composition. (Chroma DC on the FIRST MB only: DC prediction
        # propagates it to every other MB.)
        _, u, v, _, _ = decode_yuv(still)
        assert len(set(u)) == 1 and len(set(v)) == 1, \
            "lossy anim frame chroma not uniform"
    rgba, w, h = decode_rgba(still)
    assert (w, h) == (f["w"], f["h"]), f"frame truth dims {w}x{h}"
    f["rgba"] = [tuple(rgba[i:i + 4]) for i in range(0, len(rgba), 4)]


def vp8l_pattern(w, h, seed):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            a = (0, 128, 255)[(x + y + seed) % 3]
            px += bytes(((x * 37 + seed) % 256, (y * 53) % 256,
                         (x * y + seed) % 256, a))
    return bytes(px)


def gen_anim_fixtures():
    acsA = [2, -3, 5, -8, 1, -2, 4, -6, 9, -12, 3, -1, 7, -5, 10, -4]
    acsB = [0, 1, -1, 2, 0, -2, 3, 0, -3, 4, 0, -4, 5, -5, 6, -6]
    accs4 = [acsA, acsB, acsA, acsB]

    def vp8_16(y2, acs, uv, **kw):
        return build_vp8_frame(1, 1, 4, 0, True, [y2], [acs], [uv], **kw)

    def vp8_32(y2s, uvs, **kw):
        return build_vp8_frame(2, 2, 4, 0, True, y2s, accs4, uvs, **kw)

    variants = []
    # v0: opaque VP8 frames, rect offsets, dispose-to-bg, opaque bg color
    variants.append(dict(
        name="animv0_32x32_f3", cw=32, ch=32, bg=(10, 20, 30, 255),
        frames=[
            dict(cc=b"VP8 ", payload=vp8_32([7, -5, 12, 0],
                 [(-40, 30), (0, 0), (0, 0), (0, 0)]),
                 x=0, y=0, w=32, h=32, blend=False, dispose=False),
            dict(cc=b"VP8 ", payload=vp8_16(20, acsA, (-60, 0)),
                 x=8, y=8, w=16, h=16, blend=True, dispose=True),
            dict(cc=b"VP8 ", payload=vp8_16(-9, acsB, (0, 40)),
                 x=16, y=0, w=16, h=16, blend=False, dispose=False),
        ]))
    # v1: VP8+ALPH gradient alpha blended over an opaque VP8 base —
    # fractional src-over-dst arithmetic
    grad_alpha = [x * 255 // 31 for y in range(32) for x in range(32)]
    variants.append(dict(
        name="animv1_32x32_f2", cw=32, ch=32, bg=(0, 0, 0, 0),
        frames=[
            dict(cc=b"VP8 ", payload=vp8_32([10, 10, 10, 10],
                 [(30, -30), (0, 0), (0, 0), (0, 0)]),
                 x=0, y=0, w=32, h=32, blend=False, dispose=False),
            dict(cc=b"VP8 ", payload=vp8_32([-15, 5, 0, 25],
                 [(-50, 50), (0, 0), (0, 0), (0, 0)]),
                 alph=alph_raw(grad_alpha, 32, 32, 2),
                 x=0, y=0, w=32, h=32, blend=True, dispose=False),
        ]))
    # v2: mixed VP8L + VP8 frames, transparency in the VP8L pixels,
    # dispose + blend interplay
    variants.append(dict(
        name="animv2_32x32_f4", cw=32, ch=32, bg=(0, 0, 0, 0),
        frames=[
            dict(cc=b"VP8L", payload=encode_vp8l(vp8l_pattern(32, 32, 1),
                 32, 32), x=0, y=0, w=32, h=32, blend=False, dispose=False),
            dict(cc=b"VP8 ", payload=vp8_16(14, acsA, (45, -10)),
                 x=8, y=8, w=16, h=16, blend=True, dispose=True),
            dict(cc=b"VP8L", payload=encode_vp8l(vp8l_pattern(8, 8, 5),
                 8, 8), x=16, y=16, w=8, h=8, blend=True, dispose=False),
            dict(cc=b"VP8 ", payload=vp8_16(-20, acsB, (0, 0)),
                 x=0, y=0, w=16, h=16, blend=False, dispose=False),
        ]))
    # v3: 16x16 canvas, simple-filter VP8 frames incl. a version=2
    # stream (filter follows the header bit, not the version)
    variants.append(dict(
        name="animv3_16x16_f2", cw=16, ch=16, bg=(200, 100, 50, 255),
        frames=[
            dict(cc=b"VP8 ", payload=vp8_16(7, acsA, (20, 20), version=2),
                 x=0, y=0, w=16, h=16, blend=False, dispose=True),
            dict(cc=b"VP8 ", payload=vp8_16(-12, acsB, (-35, 15)),
                 x=0, y=0, w=16, h=16, blend=True, dispose=False),
        ]))

    # the registered row (mm_webp_anim_lossy_decode) loads the pack off
    # the MAIN classpath; the spec reads the test copy
    main_out = os.path.join(os.path.dirname(OUT), "..", "..",
                            "main", "resources", "vp8")
    os.makedirs(main_out, exist_ok=True)
    for v in variants:
        for f in v["frames"]:
            frame_truth(f)
        canvases = compose(v["frames"], v["cw"], v["ch"], v["bg"])
        webp = mux_anim(v["cw"], v["ch"], v["bg"], 0, v["frames"])
        for d in (OUT, main_out):
            open(os.path.join(d, v["name"] + ".webp"), "wb").write(webp)
            open(os.path.join(d, v["name"] + ".canvases"), "wb").write(
                b"".join(canvases))
        print(f"[ok] {v['name']}: {len(v['frames'])} frames, "
              f"{len(webp)} bytes, canvases {sum(len(c) for c in canvases)}")


def gen_normalf_v2():
    """version=2 stream with the NORMAL-filter header bit and a nonzero
    level: pins the remaining version-override corner (a v1/v2-forces-
    simple rule would filter this stream wrongly; libwebp follows the
    header bit — normal — and arbitrates)."""
    acs = [2, -3, 5, -8, 1, -2, 4, -6, 9, -12, 3, -1, 7, -5, 10, -4]
    frame = build_vp8_frame(1, 1, 16, 0, False, y2_dc=[7], y_acs=[acs],
                            uv_dc=[(20, -20)], version=2)
    webp = mux_still(frame)
    y, u, v, w, h = decode_yuv(webp)
    assert (w, h) == (16, 16)
    name = "normalf_v2_16x16_lv16"
    open(os.path.join(OUT, name + ".webp"), "wb").write(webp)
    open(os.path.join(OUT, name + ".yuv"), "wb").write(y + u + v)
    print(f"[ok] {name}: distinctY={len(set(y))}")


def gen_lfdelta_fixtures():
    """Loop-filter delta fixtures (no encoded corpus enables the LF
    adjustment section): a DC-mode stream whose refLfDelta[INTRA]
    shifts every MB's level, and a B_PRED stream that ALSO takes the
    modeLfDelta[0] add (the only mode delta keyframes can hit).
    libwebp arbitrates both."""
    acs = [2, -3, 5, -8, 1, -2, 4, -6, 9, -12, 3, -1, 7, -5, 10, -4]
    for name, kw in (
        ("lfdelta_16x16_lv20", dict(lf_delta=(-6, 0))),
        ("lfdelta_bpred_16x16_lv12", dict(lf_delta=(4, -5),
                                          bpred=frozenset([0]))),
    ):
        level = 20 if "lv20" in name else 12
        frame = build_vp8_frame(1, 1, level, 0, False, y2_dc=[7],
                                y_acs=[acs], uv_dc=[(15, -15)], **kw)
        webp = mux_still(frame)
        y, u, v, w, h = decode_yuv(webp)
        assert (w, h) == (16, 16)
        open(os.path.join(OUT, name + ".webp"), "wb").write(webp)
        open(os.path.join(OUT, name + ".yuv"), "wb").write(y + u + v)
        print(f"[ok] {name}: distinctY={len(set(y))}")


if __name__ == "__main__":
    gen_argb_sweep()
    gen_anim_fixtures()
    gen_normalf_v2()
    gen_lfdelta_fixtures()
