#!/usr/bin/env python3
"""Generate JPEG-in-TIFF fixtures with the SYSTEM libtiff (the format's
reference implementation) + its libjpeg, for TiffSpec's independent
reference-file pins (same discipline as the fax/ and tiff_ref/ sets).

Writes to src/test/resources/tiffjpeg/:
  <name>.tif  -- libtiff-written, compression 7 (new-style JPEG)
  <name>.rgb  -- libtiff's own decoded pixels: le16 w, le16 h, le16 ch,
                 then w*h*ch bytes (the tiff_ref golden layout)
plus one hand-built old-style (compression 6) container reusing a
libtiff-encoded full interchange stream, and its golden.

Deterministic: fixed seed, fixed quality settings.
"""
import ctypes, os, struct, random

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "tiffjpeg")
os.makedirs(OUT, exist_ok=True)

t = ctypes.CDLL("libtiff.so.6")
t.TIFFOpen.restype = ctypes.c_void_p
t.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
t.TIFFClose.argtypes = [ctypes.c_void_p]
t.TIFFWriteScanline.restype = ctypes.c_int
t.TIFFWriteScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_uint32, ctypes.c_uint16]
t.TIFFReadScanline.restype = ctypes.c_int
t.TIFFReadScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_uint32, ctypes.c_uint16]
t.TIFFWriteEncodedTile.restype = ctypes.c_long
t.TIFFWriteEncodedTile.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                   ctypes.c_void_p, ctypes.c_long]
t.TIFFScanlineSize.restype = ctypes.c_long
t.TIFFScanlineSize.argtypes = [ctypes.c_void_p]
# varargs: declare the fixed prefix so the TIFF* isn't truncated to int
t.TIFFSetField.restype = ctypes.c_int
t.TIFFSetField.argtypes = [ctypes.c_void_p, ctypes.c_uint32]

TAG = dict(WIDTH=256, LENGTH=257, BITSPERSAMPLE=258, COMPRESSION=259,
           PHOTOMETRIC=262, SAMPLESPERPIXEL=277, ROWSPERSTRIP=278,
           PLANARCONFIG=284, TILEWIDTH=322, TILELENGTH=323,
           JPEGQUALITY=65537, JPEGCOLORMODE=65538, JPEGTABLESMODE=65539,
           YCBCRSUBSAMPLING=530)
COMPRESSION_JPEG = 7
PHOTO = dict(MINISBLACK=1, RGB=2, YCBCR=6)
JPEGCOLORMODE_RGB = 1

def setf(tif, tag, *vals):
    args = []
    for v in vals:
        args.append(ctypes.c_int(v))
    t.TIFFSetField(tif, ctypes.c_uint32(tag), *args)

def gen_pixels(w, h, ch, seed):
    rnd = random.Random(seed)
    px = bytearray(w * h * ch)
    for y in range(h):
        for x in range(w):
            for c in range(ch):
                # smooth gradient + blocks + mild noise: JPEG-friendly
                # but not trivial
                v = (x * 3 + y * 2 + c * 40) % 256
                if (x // 8 + y // 8) % 2 == 0:
                    v = (v + 60) % 256
                v = max(0, min(255, v + rnd.randint(-6, 6)))
                px[(y * w + x) * ch + c] = v
    return bytes(px)

def write_tiff(name, w, h, ch, photometric, seed, rows_per_strip=None,
               tile=None, tablesmode=None, quality=85, subsampling=None):
    path = os.path.join(OUT, name + ".tif")
    px = gen_pixels(w, h, ch, seed)
    tif = t.TIFFOpen(path.encode(), b"w")
    assert tif, name
    setf(tif, TAG["WIDTH"], w)
    setf(tif, TAG["LENGTH"], h)
    setf(tif, TAG["BITSPERSAMPLE"], 8)
    setf(tif, TAG["SAMPLESPERPIXEL"], ch)
    setf(tif, TAG["PLANARCONFIG"], 1)
    setf(tif, TAG["COMPRESSION"], COMPRESSION_JPEG)
    setf(tif, TAG["PHOTOMETRIC"], photometric)
    setf(tif, TAG["JPEGQUALITY"], quality)
    if photometric == PHOTO["YCBCR"]:
        setf(tif, TAG["JPEGCOLORMODE"], JPEGCOLORMODE_RGB)
        if subsampling:
            setf(tif, TAG["YCBCRSUBSAMPLING"], subsampling[0],
                 subsampling[1])
    if tablesmode is not None:
        setf(tif, TAG["JPEGTABLESMODE"], tablesmode)
    if tile:
        tw, th = tile
        setf(tif, TAG["TILEWIDTH"], tw)
        setf(tif, TAG["TILELENGTH"], th)
        tiles_across = (w + tw - 1) // tw
        tiles_down = (h + th - 1) // th
        for ty in range(tiles_down):
            for tx in range(tiles_across):
                buf = bytearray(tw * th * ch)
                for r in range(th):
                    for cdx in range(tw):
                        sx, sy = tx * tw + cdx, ty * th + r
                        # clamp-pad edge tiles (content irrelevant
                        # outside the visible region)
                        sx, sy = min(sx, w - 1), min(sy, h - 1)
                        for cc in range(ch):
                            buf[(r * tw + cdx) * ch + cc] = \
                                px[(sy * w + sx) * ch + cc]
                idx = ty * tiles_across + tx
                n = t.TIFFWriteEncodedTile(
                    tif, idx, (ctypes.c_char * len(buf))
                    .from_buffer(buf), len(buf))
                assert n > 0, (name, idx)
    else:
        setf(tif, TAG["ROWSPERSTRIP"], rows_per_strip or h)
        for y in range(h):
            row = (ctypes.c_char * (w * ch)) \
                .from_buffer(bytearray(px[y * w * ch:(y + 1) * w * ch]))
            assert t.TIFFWriteScanline(tif, row, y, 0) == 1, (name, y)
    t.TIFFClose(tif)
    return path

def read_back(path, w, h, ch, ycbcr, tile=None):
    """libtiff's own decode (through its libjpeg) -> golden bytes."""
    tif = t.TIFFOpen(path.encode(), b"r")
    assert tif, path
    if ycbcr:
        setf(tif, TAG["JPEGCOLORMODE"], JPEGCOLORMODE_RGB)
    out = bytearray(w * h * ch)
    if tile:
        tw, th = tile
        t.TIFFReadEncodedTile.restype = ctypes.c_long
        t.TIFFReadEncodedTile.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p,
            ctypes.c_long]
        tiles_across = (w + tw - 1) // tw
        tiles_down = (h + th - 1) // th
        buf = (ctypes.c_char * (tw * th * ch))()
        for ty in range(tiles_down):
            for tx in range(tiles_across):
                idx = ty * tiles_across + tx
                n = t.TIFFReadEncodedTile(tif, idx, buf, len(buf))
                assert n > 0, (path, idx)
                vis_w = min(tw, w - tx * tw)
                vis_h = min(th, h - ty * th)
                for r in range(vis_h):
                    dst = ((ty * th + r) * w + tx * tw) * ch
                    src = r * tw * ch
                    out[dst:dst + vis_w * ch] = \
                        buf.raw[src:src + vis_w * ch]
    else:
        sls = t.TIFFScanlineSize(tif)
        assert sls >= w * ch, (path, sls, w * ch)
        buf = (ctypes.c_char * sls)()
        for y in range(h):
            assert t.TIFFReadScanline(tif, buf, y, 0) == 1, (path, y)
            out[y * w * ch:(y + 1) * w * ch] = buf.raw[:w * ch]
    t.TIFFClose(tif)
    return bytes(out)

def golden(name, w, h, ch, data):
    with open(os.path.join(OUT, name + ".rgb"), "wb") as f:
        f.write(struct.pack("<HHH", w, h, ch))
        f.write(data)

FIXTURES = [
    # name, w, h, ch, photometric, strips/tile, tablesmode, subsampling
    ("gray_strips", 45, 37, 1, "MINISBLACK",
     dict(rows_per_strip=16), None, None),
    ("ycbcr_420_strips", 51, 43, 3, "YCBCR",
     dict(rows_per_strip=16), None, (2, 2)),
    ("ycbcr_422_strips", 40, 33, 3, "YCBCR",
     dict(rows_per_strip=16), None, (2, 1)),
    ("ycbcr_444_onestrip", 33, 29, 3, "YCBCR",
     dict(rows_per_strip=64), None, (1, 1)),
    ("rgb_strips", 37, 31, 3, "RGB", dict(rows_per_strip=8), None, None),
    ("ycbcr_tiles", 50, 41, 3, "YCBCR", dict(tile=(32, 32)), None, (2, 2)),
    ("gray_tiles", 47, 35, 1, "MINISBLACK", dict(tile=(16, 16)), None,
     None),
    ("notables_strips", 44, 30, 3, "YCBCR",
     dict(rows_per_strip=16), 0, (2, 2)),
]

for i, (name, w, h, ch, photo, layout, tmode, sub) in enumerate(FIXTURES):
    path = write_tiff(name, w, h, ch, PHOTO[photo], seed=1000 + i,
                      tablesmode=tmode, subsampling=sub, **layout)
    data = read_back(path, w, h, ch, photo == "YCBCR",
                     tile=layout.get("tile"))
    golden(name, w, h, ch, data)
    print(f"{name}: {w}x{h}x{ch} tif={os.path.getsize(path)}B")

# ---- old-style (compression 6) container ------------------------------
# libtiff refuses to WRITE compression 6, and the only layout real
# old-style writers produced that is decodable in practice is the full
# interchange stream behind JPEGInterchangeFormat (513/514). Build that
# container by hand around a complete JIF stream produced by libtiff
# itself: a single-strip JPEGTABLESMODE=0 file's strip IS a full
# SOI..EOI stream with inline tables.
src_name = "oldstyle_src"
w, h, ch = 38, 27, 3
path = write_tiff(src_name, w, h, ch, PHOTO["YCBCR"], seed=2000,
                  rows_per_strip=64, tablesmode=0, subsampling=(2, 2))
gold = read_back(path, w, h, ch, True)

# extract the single strip (tags 273/279) from the new-style file
raw = open(path, "rb").read()
le16 = lambda o: struct.unpack_from("<H", raw, o)[0]
le32 = lambda o: struct.unpack_from("<I", raw, o)[0]
assert raw[:4] == b"II*\0"
ifd = le32(4)
n = le16(ifd)
strip_off = strip_len = None
for i in range(n):
    e = ifd + 2 + i * 12
    tag_id, typ, cnt = le16(e), le16(e + 2), le32(e + 4)
    if tag_id == 273:
        assert cnt == 1
        strip_off = le32(e + 8)
    if tag_id == 279:
        assert cnt == 1
        strip_len = le32(e + 8)
jif = raw[strip_off:strip_off + strip_len]
assert jif[:2] == b"\xff\xd8" and jif[-2:] == b"\xff\xd9", "not a JIF"

def build_oldstyle(jif, w, h, ch):
    entries = []  # (tag, type, count, value)
    header = 8
    ifd_off = header
    n_entries = 9
    data_off = ifd_off + 2 + n_entries * 12 + 4
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
        (259, 3, 1, 6),            # old-style JPEG
        (262, 3, 1, 6),            # YCbCr
        (277, 3, 1, ch),
        (278, 3, 1, h),
        (513, 4, 1, data_off),     # JPEGInterchangeFormat
        (514, 4, 1, len(jif)),     # JPEGInterchangeFormatLength
    ]
    out = bytearray()
    out += b"II*\0" + struct.pack("<I", ifd_off)
    out += struct.pack("<H", n_entries)
    for tag_id, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag_id, typ, cnt)
        out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # next IFD
    assert len(out) == data_off
    out += jif
    return bytes(out)

with open(os.path.join(OUT, "oldstyle_jif.tif"), "wb") as f:
    f.write(build_oldstyle(jif, w, h, ch))
golden("oldstyle_jif", w, h, ch, gold)
os.remove(path)                       # source container not needed
print(f"oldstyle_jif: {w}x{h}x{ch} jif={len(jif)}B")
print("done")
