#!/usr/bin/env python3
"""Generate GIF fixtures with the SYSTEM giflib (the format's reference
implementation) for GifSpec's independent reference-file pins — the
same discipline as the libwebp/libtiff/zlib fixture sets (it exists
because spec-side encoders can only prove SELF-consistency; a shared
transcription error round-trips green while every real file fails —
exactly what happened with the VP8L code-length order in r10).

Writes src/test/resources/gif_ref/:
  <name>.gif  -- giflib-encoded
  <name>.px   -- ground truth: le16 w, h, nframes, then per frame
                 le32 delay_ms + w*h*3 RGB bytes of the COMPOSITED
                 canvas per GIF89a (python composite implemented
                 independently from the spec).
Deterministic (fixed seed).
"""
import ctypes, os, random, struct
from ctypes import (POINTER, byref, c_bool, c_char_p, c_int, c_ubyte,
                    c_void_p)

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "gif_ref")
os.makedirs(OUT, exist_ok=True)

g = ctypes.CDLL("libgif.so.7")
g.EGifOpenFileName.restype = c_void_p
g.EGifOpenFileName.argtypes = [c_char_p, c_bool, POINTER(c_int)]
g.GifMakeMapObject.restype = c_void_p
g.GifMakeMapObject.argtypes = [c_int, c_void_p]
g.EGifPutScreenDesc.argtypes = [c_void_p, c_int, c_int, c_int, c_int,
                                c_void_p]
g.EGifPutImageDesc.argtypes = [c_void_p, c_int, c_int, c_int, c_int,
                               c_bool, c_void_p]
g.EGifPutLine.argtypes = [c_void_p, c_void_p, c_int]
g.EGifPutExtension.argtypes = [c_void_p, c_int, c_int, c_void_p]
g.EGifCloseFile.argtypes = [c_void_p, POINTER(c_int)]
# giflib >= 5: set the version so GCE extensions write GIF89a
try:
    g.EGifSetGifVersion.argtypes = [c_void_p, c_bool]
    HAVE_VER = True
except AttributeError:
    HAVE_VER = False

INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]

def interlaced_order(h):
    rows = []
    for start, step in INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows

def make_cmap(colors):
    # pad to a power of two as giflib requires
    n = 2
    while n < len(colors):
        n *= 2
    padded = list(colors) + [(0, 0, 0)] * (n - len(colors))
    buf = (c_ubyte * (3 * n))()
    for i, (r_, g_, b_) in enumerate(padded):
        buf[3 * i], buf[3 * i + 1], buf[3 * i + 2] = r_, g_, b_
    return g.GifMakeMapObject(n, buf), n

def write_gif(name, w, h, frames, colors, interlace=False):
    """frames: list of (left, top, fw, fh, idx_rows, delay_ms,
    disposal, transparent_idx_or_None, local_colors_or_None)."""
    path = os.path.join(OUT, name + ".gif")
    err = c_int(0)
    f = g.EGifOpenFileName(path.encode(), False, byref(err))
    assert f, (name, err.value)
    if HAVE_VER:
        g.EGifSetGifVersion(f, True)  # GIF89a
    cmap, n = make_cmap(colors)
    assert g.EGifPutScreenDesc(f, w, h, 8, 0, cmap) == 1, name
    for (left, top, fw, fh, rows, delay, disp, trans, lcolors) in frames:
        if len(frames) > 1 or trans is not None:
            flag = 1 if trans is not None else 0
            packed = (disp << 2) | flag
            d = delay // 10  # GIF delay is centiseconds
            ext = bytes([packed, d & 0xFF, (d >> 8) & 0xFF,
                         trans if trans is not None else 0])
            assert g.EGifPutExtension(f, 0xF9, 4, ext) == 1, name
        lmap = None
        if lcolors is not None:
            lmap, _ = make_cmap(lcolors)
        assert g.EGifPutImageDesc(f, left, top, fw, fh, interlace,
                                  lmap) == 1, name
        order = interlaced_order(fh) if interlace else range(fh)
        for y in order:
            line = (c_ubyte * fw)(*rows[y])
            assert g.EGifPutLine(f, line, fw) == 1, (name, y)
    assert g.EGifCloseFile(f, byref(err)) == 1, (name, err.value)
    return path

def composite(w, h, frames, colors):
    """Independent GIF89a compositing: canvas starts as frame-1 area
    (we always start with a full-canvas frame); disposal 1 leaves the
    canvas; transparent pixels keep the existing canvas."""
    canvas = [[(0, 0, 0)] * w for _ in range(h)]
    out = []
    for (left, top, fw, fh, rows, delay, disp, trans, lcolors) in frames:
        pal = lcolors if lcolors is not None else colors
        for y in range(fh):
            for x in range(fw):
                idx = rows[y][x]
                if trans is not None and idx == trans:
                    continue
                canvas[top + y][left + x] = pal[idx]
        out.append((delay, [px for row in canvas for px in row]))
        # disposal 1 (or 0): leave in place — nothing to do
        assert disp in (0, 1)
    return out

def golden(name, w, h, frames_rgb):
    with open(os.path.join(OUT, name + ".px"), "wb") as fh:
        fh.write(struct.pack("<HHH", w, h, len(frames_rgb)))
        for delay, pixels in frames_rgb:
            fh.write(struct.pack("<I", delay))
            fh.write(bytes(c for px in pixels for c in px))

rnd = random.Random(4242)

def gen_colors(n):
    return [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
            for _ in range(n)]

# 1. gradient-ish still, 64 colors, sequential
w, h = 37, 29
colors = gen_colors(64)
rows = [[(x * 3 + y * 5) % 64 for x in range(w)] for y in range(h)]
fr = [(0, 0, w, h, rows, 0, 0, None, None)]
write_gif("grad64", w, h, fr, colors)
golden("grad64", w, h, composite(w, h, fr, colors))

# 2. noise, 256 colors, INTERLACED
w, h = 33, 21
colors = gen_colors(256)
rows = [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
fr = [(0, 0, w, h, rows, 0, 0, None, None)]
write_gif("noise_i", w, h, fr, colors, interlace=True)
golden("noise_i", w, h, composite(w, h, fr, colors))

# 3. tiny palette (4 colors -> 2-bit min code size)
w, h = 25, 17
colors = gen_colors(4)
rows = [[(x // 3 + y // 2) % 4 for x in range(w)] for y in range(h)]
fr = [(0, 0, w, h, rows, 0, 0, None, None)]
write_gif("pal4", w, h, fr, colors)
golden("pal4", w, h, composite(w, h, fr, colors))

# 4. animation: full frame, sub-rect with LOCAL palette, transparent
#    overlay — disposal 1 throughout
w, h = 30, 22
colors = gen_colors(32)
f1 = [[(x + y) % 32 for x in range(w)] for y in range(h)]
local = gen_colors(16)
f2 = [[(x * 2 + y) % 16 for x in range(10)] for y in range(8)]
f3 = [[(3 if (x + y) % 3 == 0 else 7) for x in range(12)]
      for y in range(9)]  # index 7 = transparent
frames = [
    (0, 0, w, h, f1, 40, 1, None, None),
    (5, 4, 10, 8, f2, 60, 1, None, local),
    (12, 10, 12, 9, f3, 80, 1, 7, None),
]
write_gif("anim", w, h, frames, colors)
golden("anim", w, h, composite(w, h, frames, colors))

for n in sorted(os.listdir(OUT)):
    print(n, os.path.getsize(os.path.join(OUT, n)))
