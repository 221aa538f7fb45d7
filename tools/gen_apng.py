#!/usr/bin/env python3
"""APNG fixtures: container + frames written by an independent python
encoder (the gen_png.py machinery: forward filtering, chunking),
goldens composited per the public APNG spec by this script — the
Scala decoder's frame layer reuses its PNG core (pinned separately by
the conformance sweep) and its compositing layer is pinned here
against this independent implementation. Frame alphas in the
over-blend fixture stay in {0,255} so blending is exact.

Writes src/test/resources/png_ref/apng_*.png and .px
(.px = le16 w, h, nframes, then per frame le32 delay_ms + RGBA
canvas). Deterministic.
"""
import os, random, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "png_ref")

def chunk(tag, data):
    return (struct.pack(">I", len(data)) + tag + data +
            struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

def paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c

def filter_row(ft, raw, prior, bpp):
    out = bytearray(len(raw))
    for i in range(len(raw)):
        left = raw[i - bpp] if i >= bpp else 0
        up = prior[i] if prior else 0
        ul = (prior[i - bpp] if i >= bpp else 0) if prior else 0
        if ft == 0:
            v = raw[i]
        elif ft == 1:
            v = raw[i] - left
        elif ft == 2:
            v = raw[i] - up
        elif ft == 3:
            v = raw[i] - (left + up) // 2
        else:
            v = raw[i] - paeth(left, up, ul)
        out[i] = v & 0xFF
    return bytes(out)

def encode_idat(fw, fh, rgba):
    """RGBA8 rows -> zlib stream with cycled filters."""
    stream = bytearray()
    prior = None
    for y in range(fh):
        raw = bytes(rgba[(y * fw + x) * 4 + ch]
                    for x in range(fw) for ch in range(4))
        ft = y % 5
        stream.append(ft)
        stream += filter_row(ft, raw, prior, 4)
        prior = raw
    return zlib.compress(bytes(stream), 6)

def frame_pixels(fw, fh, seed, holes=False):
    r = random.Random(seed)
    px = bytearray()
    for y in range(fh):
        for x in range(fw):
            px += bytes([(x * 7 + seed) % 256, (y * 11 + seed) % 256,
                         (x + y + seed * 3) % 256,
                         0 if holes and (x + y) % 3 == 0 else 255])
    return bytes(px)

W, H = 40, 26
# frames: (fx, fy, fw, fh, delay_ms, dispose, blend, rgba)
frames = [
    (0, 0, W, H, 50, 0, 0, frame_pixels(W, H, 1)),          # full, source
    (4, 3, 18, 12, 70, 2, 1, frame_pixels(18, 12, 2, True)), # over + DISPOSE PREVIOUS
    (20, 10, 14, 9, 90, 1, 0, frame_pixels(14, 9, 3)),       # source + DISPOSE BACKGROUND
    (2, 2, 30, 20, 110, 0, 1, frame_pixels(30, 20, 4, True)),# over, no dispose
]

seq = 0
def next_seq():
    global seq
    s = seq
    seq += 1
    return s

out = b"\x89PNG\r\n\x1a\n"
out += chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 6, 0, 0, 0))
out += chunk(b"acTL", struct.pack(">II", len(frames), 3))
for i, (fx, fy, fw, fh, delay, disp, blend, rgba) in enumerate(frames):
    out += chunk(b"fcTL", struct.pack(">IIIIIHHBB", next_seq(), fw, fh,
                                      fx, fy, delay, 1000, disp, blend))
    z = encode_idat(fw, fh, rgba)
    if i == 0:
        half = max(1, len(z) // 2)  # split: decoders must concatenate
        out += chunk(b"IDAT", z[:half]) + chunk(b"IDAT", z[half:])
    else:
        out += chunk(b"fdAT", struct.pack(">I", next_seq()) + z)
out += chunk(b"IEND", b"")
with open(os.path.join(OUT, "apng_mixed.png"), "wb") as f:
    f.write(out)

# independent composite per the APNG spec
canvas = bytearray(W * H * 4)
golden = []
for (fx, fy, fw, fh, delay, disp, blend, rgba) in frames:
    before = bytes(canvas) if disp == 2 else None
    for y in range(fh):
        for x in range(fw):
            s = (y * fw + x) * 4
            d = ((fy + y) * W + fx + x) * 4
            fa = rgba[s + 3]
            if blend == 0 or fa == 255:
                canvas[d:d + 4] = rgba[s:s + 4]
            elif fa == 0:
                pass
            else:
                raise AssertionError("fixture alpha must be 0/255")
    golden.append((delay, bytes(canvas)))
    if disp == 1:  # background: clear rect to transparent
        for y in range(fh):
            for x in range(fw):
                d = ((fy + y) * W + fx + x) * 4
                canvas[d:d + 4] = b"\x00\x00\x00\x00"
    elif disp == 2:  # previous: revert rect
        for y in range(fh):
            for x in range(fw):
                d = ((fy + y) * W + fx + x) * 4
                canvas[d:d + 4] = before[d:d + 4]

with open(os.path.join(OUT, "apng_mixed.px"), "wb") as f:
    f.write(struct.pack("<HHH", W, H, len(golden)))
    for delay, pixels in golden:
        f.write(struct.pack("<I", delay))
        f.write(pixels)

print("apng_mixed.png", os.path.getsize(os.path.join(OUT, "apng_mixed.png")),
      "frames", len(golden), "dur", sum(g[0] for g in golden))

# ---- negative fixtures (decoder must refuse with None) ---------------

def encode_pal_idat(fw, fh, idx):
    """Palette-index rows (1 byte/px), filter 0, zlib."""
    stream = bytearray()
    for y in range(fh):
        stream.append(0)
        stream += bytes(idx[y * fw:(y + 1) * fw])
    return zlib.compress(bytes(stream), 6)

# 1) Palette APNG WITH tRNS (color-keyed transparency): the Scala
#    frame decoder expands palettes to opaque RGB, so compositing
#    would silently paint transparent pixels — must refuse.
PW, PH = 8, 6
plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])   # 3 entries
trns = bytes([0])                                  # entry 0 transparent
idx0 = bytes((x + y) % 3 for y in range(PH) for x in range(PW))
idx1 = bytes((x * y) % 3 for y in range(PH) for x in range(PW))
seq = 0
out = b"\x89PNG\r\n\x1a\n"
out += chunk(b"IHDR", struct.pack(">IIBBBBB", PW, PH, 8, 3, 0, 0, 0))
out += chunk(b"acTL", struct.pack(">II", 2, 0))
out += chunk(b"PLTE", plte)
out += chunk(b"tRNS", trns)
out += chunk(b"fcTL", struct.pack(">IIIIIHHBB", next_seq(), PW, PH,
                                  0, 0, 40, 1000, 0, 0))
out += chunk(b"IDAT", encode_pal_idat(PW, PH, idx0))
out += chunk(b"fcTL", struct.pack(">IIIIIHHBB", next_seq(), PW, PH,
                                  0, 0, 40, 1000, 0, 1))
out += chunk(b"fdAT", struct.pack(">I", next_seq()) +
             encode_pal_idat(PW, PH, idx1))
out += chunk(b"IEND", b"")
with open(os.path.join(OUT, "apng_pal_trns.png"), "wb") as f:
    f.write(out)
print("apng_pal_trns.png", len(out))

# 2) Default-image fcTL NOT covering the canvas: IDAT scanlines are
#    filtered at the canvas width; a narrower rewrap "decodes" to
#    garbage rows if the stream is long enough — must refuse.
seq = 0
out = b"\x89PNG\r\n\x1a\n"
out += chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 6, 0, 0, 0))
out += chunk(b"acTL", struct.pack(">II", 1, 0))
out += chunk(b"fcTL", struct.pack(">IIIIIHHBB", next_seq(), W - 2, H - 2,
                                  0, 0, 40, 1000, 0, 0))
out += chunk(b"IDAT", encode_idat(W, H, frame_pixels(W, H, 9)))
out += chunk(b"IEND", b"")
with open(os.path.join(OUT, "apng_bad_default_fctl.png"), "wb") as f:
    f.write(out)
print("apng_bad_default_fctl.png", len(out))
