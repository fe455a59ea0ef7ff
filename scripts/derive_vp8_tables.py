#!/usr/bin/env python3
"""Derive the VP8 (RFC 6386) decoder data tables BEHAVIORALLY from the
system libwebp shared object — the same evidence device as
derive_webp_distmap.py: rather than transcribing the spec's tables from
recall (the class of risk that script caught twice for the VP8L 2D
distance map), locate them in the canonical implementation's read-only
data and validate end-to-end by fixture decode equality (Vp8Spec).

Tables extracted:
  kDcTable[128]                  uint8 DC quantizer lookup (RFC §14.1)
  kAcTable[128]                  uint16 AC quantizer lookup (§14.1)
  kBands[16]                     coefficient→band map (§13.3)
  CoeffsProba0[4][8][3][11]      default token probabilities (§13.5)
  CoeffsUpdateProba[4][8][3][11] prob-update flag probabilities (§13.4)
  kBModesProba[10][10][9]        keyframe intra4 mode probs (§11.5)

Location evidence (all re-checked on every run):
  - the quantizer tables are the ONLY monotone 128-runs of their shape
    in the binary (dc: bytes with the 10,10 plateau ending 157; ac:
    uint16 ending 284);
  - kBands sits immediately after kDcTable (16 bytes, values ≤ 7);
  - the probability tables form ONE contiguous block
    [update | bmode | 28-byte pad | proba0] present TWICE in the
    binary (decoder + encoder compilation units); the two copies agree
    on exactly 3040 = 1056+900+28+1056 bytes and diverge at the
    block's end — the strongest length/boundary oracle available
    without running the code;
  - every probability byte is nonzero (probabilities are 1..255) and
    the update table is majority-255 (sparse updates), as the spec
    shapes demand.
Final arbiter: Vp8Spec decodes libwebp-encoded fixtures and pins
per-sample YUV equality against libwebp's own decode — a single wrong
byte desynchronizes the boolean decoder and fails every fixture.

Emits src/main/scala/graft/ops/Vp8Tables.scala.
"""
import ctypes.util
import os
import struct

SO = ctypes.util.find_library("webp") or "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
if not os.path.exists(SO):
    SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
data = open(SO, "rb").read()
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "scala", "graft", "ops", "Vp8Tables.scala")


def all_hits(pat):
    out, p = [], data.find(pat)
    while p >= 0:
        out.append(p)
        p = data.find(pat, p + 1)
    return out


# --- quantizer tables ----------------------------------------------------
dc_hits = {}
for off in range(len(data) - 128):
    if data[off:off + 8] != bytes([4, 5, 6, 7, 8, 9, 10, 10]):
        continue
    vals = tuple(data[off:off + 128])
    if vals[127] >= 100 and all(vals[i] <= vals[i + 1] for i in range(127)):
        dc_hits.setdefault(vals, []).append(off)
assert len(dc_hits) == 1, f"expected ONE dc-table shape, got {len(dc_hits)}"
dc, dc_offs = next(iter(dc_hits.items()))
dc_off = dc_offs[0]

ac_hits = {}
for off in range(len(data) - 256):
    if data[off] != 4 or data[off + 1] != 0:
        continue
    vals = struct.unpack_from("<128H", data, off)
    if (vals[0] == 4 and 200 < vals[127] < 1000 and
            all(vals[i] <= vals[i + 1] for i in range(127))):
        ac_hits[vals] = off
assert len(ac_hits) == 1, f"expected ONE ac-table shape, got {len(ac_hits)}"
ac, ac_off = next(iter(ac_hits.items()))
print(f"[ok] kDcTable @0x{dc_off:x} ends {dc[127]}; kAcTable @0x{ac_off:x} ends {ac[127]}")

# --- kBands and kZigzag: the 16 bytes after each kDcTable copy -----------
# the decoder unit follows its copy with the coefficient→band map, the
# encoder unit with the zigzag scan order — classify by shape
bands = zigzag = None
for off in dc_offs:
    t = list(data[off + 128:off + 144])
    if t[:4] == [0, 1, 2, 3] and max(t) == 7 and t[15] == 7:
        bands = t
    elif t[:4] == [0, 1, 4, 8] and sorted(t) == list(range(16)):
        zigzag = t
assert bands is not None, f"kBands not found after any dc copy {dc_offs}"
assert zigzag is not None, f"kZigzag not found after any dc copy {dc_offs}"
print(f"[ok] kBands: {bands}")
print(f"[ok] kZigzag: {zigzag}")

# --- the contiguous probability block ------------------------------------
# anchor: CoeffsProba0's (type 0, band 1, ctx 0) row — the table's first
# 33 bytes are the unused-band 128s, so the block's proba0 segment
# starts 33 bytes before the anchor.
anchor = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
hits = all_hits(anchor)
assert len(hits) == 2, f"expected 2 CoeffsProba0 copies, got {hits}"
P0, UPD, BM, PAD = 1056, 1056, 900, 28
p0_start = hits[0] - 33
blk_start = p0_start - PAD - BM - UPD
blk2 = hits[1] - 33 - PAD - BM - UPD
blk_len = UPD + BM + PAD + P0  # 3040
i = 0
while data[blk_start + i] == data[blk2 + i]:
    i += 1
assert i == blk_len, f"copy divergence at {i}, expected {blk_len}"
upd = data[blk_start:blk_start + UPD]
bmode = data[blk_start + UPD:blk_start + UPD + BM]
pad = data[blk_start + UPD + BM:blk_start + UPD + BM + PAD]
proba0 = data[p0_start:p0_start + P0]
print(f"[ok] prob block @0x{blk_start:x}, copies diverge at {i} (== {blk_len})")

sanity = {
    "CoeffsProba0 all in 1..255": all(1 <= b <= 255 for b in proba0),
    "CoeffsProba0 leads with 3 unused-band 128-rows":
        all(b == 128 for b in proba0[:33]),
    "CoeffsUpdateProba all in 1..255": all(1 <= b <= 255 for b in upd),
    "CoeffsUpdateProba majority-255": sum(b == 255 for b in upd) > UPD // 2,
    "kBModesProba all in 1..255": all(1 <= b <= 255 for b in bmode),
    "kBModesProba (DC,DC) row": list(bmode[:9]) ==
        [231, 120, 48, 89, 115, 113, 120, 152, 112],
    "pad is zero": all(b == 0 for b in pad),
}
for k, v in sanity.items():
    print(f"[{'ok' if v else 'FAIL'}] {k}")
assert all(sanity.values())


def scala_ints(name, vals, per=16):
    body = ",\n    ".join(
        ", ".join(str(v) for v in vals[i:i + per]) for i in range(0, len(vals), per))
    return f"  val {name}: Array[Int] = Array(\n    {body})\n\n"


with open(OUT, "w") as f:
    f.write(f"""package graft.ops

/** VP8 (RFC 6386) decoder data tables, derived BEHAVIORALLY from the
  * system libwebp shared object by scripts/derive_vp8_tables.py — the
  * derive_webp_distmap.py device: located in the canonical
  * implementation's read-only data ({os.path.basename(SO)}) via
  * structural scans, a two-copy divergence length oracle for the
  * contiguous probability block, and shape invariants; validated
  * end-to-end by Vp8Spec's per-sample YUV equality against libwebp's
  * own decode (one wrong byte desynchronizes the boolean decoder and
  * fails every fixture). GENERATED — do not edit; re-run the script.
  *
  * Layouts (RFC 6386):
  *  - dcQ/acQ: quantizer index 0..127 → level (§14.1)
  *  - bands: coefficient position 0..15 → probability band (§13.3)
  *  - zigzag: scan order, coefficient index → raster position (§13.3)
  *  - coeffsProba0: [plane 4][band 8][ctx 3][prob 11] flattened (§13.5)
  *  - coeffsUpdateProba: same shape, §13.4 update-flag probabilities
  *  - bModesProba: [above 10][left 10][prob 9] flattened (§11.5)
  */
object Vp8Tables {{
""")
    f.write(scala_ints("dcQ", list(dc)))
    f.write(scala_ints("acQ", list(ac)))
    f.write(scala_ints("bands", bands))
    f.write(scala_ints("zigzag", zigzag))
    f.write(scala_ints("coeffsProba0", list(proba0)))
    f.write(scala_ints("coeffsUpdateProba", list(upd)))
    f.write(scala_ints("bModesProba", list(bmode)))
    f.write("}\n")
print(f"[ok] wrote {os.path.normpath(OUT)}")
