#!/usr/bin/env python3
"""Independent PNG conformance fixtures: every valid IHDR shape the
spec defines (15 colorType x bitDepth combos), each non-interlaced AND
Adam7, with per-row CYCLED filter types (0..4) and the IDAT stream
split across two chunks. The writer here (pass extraction, bit
packing, forward filtering, chunking) is an independent python
implementation of the encoder side — zero shared code with the Scala
decoder — so these pins prove the decoder against the spec rather
than against its own test encoder (the VP8L lesson; same discipline
as gif_ref/webp_ref/fax).

Writes src/test/resources/png_ref/conf_<type><depth><i>.png and .px
(.px = le16 w, h, out_channels, then the EXPECTED 8-bit decoder
output under the documented conventions: sub-byte gray scaled to the
8-bit range, 16-bit high byte, palette to RGB, gray+alpha to RGBA).
Deterministic (fixed seed).
"""
import os, random, struct, zlib

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "png_ref")
os.makedirs(OUT, exist_ok=True)

PASSES = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]

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

def pack_row(samples, depth):
    """samples: flat ints for one row; returns packed bytes."""
    if depth == 8:
        return bytes(samples)
    if depth == 16:
        return b"".join(struct.pack(">H", s) for s in samples)
    out = bytearray()
    acc = 0
    nbits = 0
    for s in samples:
        acc = (acc << depth) | s
        nbits += depth
        if nbits == 8:
            out.append(acc)
            acc = 0
            nbits = 0
    if nbits:
        out.append(acc << (8 - nbits))
    return bytes(out)

def write_png(name, w, h, ctype, depth, interlace, pix, palette=None):
    """pix[y][x] = tuple of raw samples (at the file depth)."""
    nsamp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = max(1, nsamp * depth // 8)
    stream = bytearray()
    grids = ([(0, 0, 1, 1)] if interlace == 0 else PASSES)
    ftc = 0
    for (x0, y0, dx, dy) in grids:
        rows = list(range(y0, h, dy))
        cols = list(range(x0, w, dx))
        if not rows or not cols:
            continue
        prior = None
        for y in rows:
            flat = [s for x in cols for s in pix[y][x]]
            raw = pack_row(flat, depth)
            ft = ftc % 5
            ftc += 1
            stream.append(ft)
            stream += filter_row(ft, raw, prior, bpp)
            prior = raw
    z = zlib.compress(bytes(stream), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(c for rgb in palette for c in rgb))
    # split the zlib stream across two IDATs (decoders must concat)
    half = max(1, len(z) // 2)
    out += chunk(b"IDAT", z[:half]) + chunk(b"IDAT", z[half:])
    out += chunk(b"IEND", b"")
    with open(os.path.join(OUT, name + ".png"), "wb") as f:
        f.write(out)

def golden(name, w, h, ch, data):
    with open(os.path.join(OUT, name + ".px"), "wb") as f:
        f.write(struct.pack("<HHH", w, h, ch))
        f.write(bytes(data))

SCALE = {1: 255, 2: 85, 4: 17, 8: 1}
rnd = random.Random(777)

def gen(ctype, depth, interlace):
    w, h = 13, 11  # odd dims stress Adam7 pass geometry
    name = f"conf_t{ctype}d{depth}i{interlace}"
    maxv = (1 << depth) - 1
    nsamp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    pix = [[tuple(rnd.randint(0, maxv) for _ in range(nsamp))
            for _ in range(w)] for _ in range(h)]
    palette = None
    if ctype == 3:
        palette = [(rnd.randrange(256), rnd.randrange(256),
                    rnd.randrange(256)) for _ in range(maxv + 1)]
    write_png(name, w, h, ctype, depth, interlace, pix, palette)
    # expected output per the decoder's documented conventions
    out = []
    for y in range(h):
        for x in range(w):
            s = pix[y][x]
            if ctype == 0:
                v = (s[0] >> 8) if depth == 16 else s[0] * SCALE[depth]
                out.append(v)
            elif ctype == 3:
                out.extend(palette[s[0]])
            elif ctype == 2:
                out.extend((v >> 8) if depth == 16 else v for v in s)
            elif ctype == 4:
                gv = (s[0] >> 8) if depth == 16 else s[0]
                av = (s[1] >> 8) if depth == 16 else s[1]
                out.extend((gv, gv, gv, av))
            else:  # 6
                out.extend((v >> 8) if depth == 16 else v for v in s)
    ch = {0: 1, 2: 3, 3: 3, 4: 4, 6: 4}[ctype]
    golden(name, w, h, ch, out)
    return name

COMBOS = ([(0, d) for d in (1, 2, 4, 8, 16)] +
          [(3, d) for d in (1, 2, 4, 8)] +
          [(2, d) for d in (8, 16)] +
          [(4, d) for d in (8, 16)] +
          [(6, d) for d in (8, 16)])
names = [gen(c, d, i) for (c, d) in COMBOS for i in (0, 1)]
print(f"{len(names)} fixtures:", " ".join(names[:6]), "...")
