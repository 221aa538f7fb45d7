#!/usr/bin/env python3
"""Animated-WebP fixtures: frame payloads encoded by the SYSTEM
libwebp (the format's reference implementation), container assembled
per the public WebP container spec (VP8X + ANIM + ANMF), goldens
composited in python from libwebp's OWN decode of each frame — so the
Scala decoder's payload layer is pinned against the reference encoder
and its compositing layer against an independent implementation of
the spec. Frame alphas are kept in {0, 255} so blending semantics are
exact (no rounding ambiguity in the golden).

Writes src/test/resources/webp_ref/anim_*.webp and .px
(.px = le16 w, h, nframes, then per frame le32 duration_ms + RGBA
canvas). Deterministic (fixed seed).
"""
import ctypes, os, random, struct
from ctypes import (POINTER, byref, c_char_p, c_float, c_int, c_size_t,
                    c_ubyte, c_void_p)

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "webp_ref")
os.makedirs(OUT, exist_ok=True)

w_ = ctypes.CDLL("libwebp.so.7")
w_.WebPEncodeRGBA.restype = c_size_t
w_.WebPEncodeRGBA.argtypes = [c_void_p, c_int, c_int, c_int, c_float,
                              POINTER(c_void_p)]
w_.WebPEncodeLosslessRGBA.restype = c_size_t
w_.WebPEncodeLosslessRGBA.argtypes = [c_void_p, c_int, c_int, c_int,
                                      POINTER(c_void_p)]
w_.WebPDecodeRGBA.restype = ctypes.POINTER(c_ubyte)
w_.WebPDecodeRGBA.argtypes = [c_void_p, c_size_t, POINTER(c_int),
                              POINTER(c_int)]
w_.WebPFree.argtypes = [c_void_p]

def encode(rgba, fw, fh, lossless, quality=80.0):
    buf = (c_ubyte * len(rgba)).from_buffer_copy(rgba)
    out = c_void_p()
    if lossless:
        n = w_.WebPEncodeLosslessRGBA(buf, fw, fh, fw * 4, byref(out))
    else:
        n = w_.WebPEncodeRGBA(buf, fw, fh, fw * 4, quality, byref(out))
    assert n > 0
    data = ctypes.string_at(out, n)
    w_.WebPFree(out)
    return data

def ref_decode(webp_file):
    pw, ph = c_int(), c_int()
    buf = (c_ubyte * len(webp_file)).from_buffer_copy(webp_file)
    ptr = w_.WebPDecodeRGBA(buf, len(webp_file), byref(pw), byref(ph))
    assert ptr
    data = ctypes.string_at(ptr, pw.value * ph.value * 4)
    w_.WebPFree(ptr)
    return pw.value, ph.value, data

def chunks_of(webp_file):
    """(tag, payload) list from a simple/extended WebP container."""
    out = []
    p = 12
    while p + 8 <= len(webp_file):
        tag = webp_file[p:p + 4]
        sz = struct.unpack_from("<I", webp_file, p + 4)[0]
        out.append((tag, webp_file[p + 8:p + 8 + sz]))
        p += 8 + sz + (sz & 1)
    return out

def chunk(tag, payload):
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad

def le24(v):
    return struct.pack("<I", v)[:3]

def assemble(w, h, bg_bgra, loops, frames):
    """frames: (fx, fy, fw, fh, dur_ms, no_blend, dispose_bg,
    payload_chunks)."""
    body = chunk(b"VP8X", bytes([0x02, 0, 0, 0]) + le24(w - 1) +
                 le24(h - 1))
    body += chunk(b"ANIM", struct.pack("<IH", bg_bgra, loops))
    for (fx, fy, fw, fh, dur, nb, db, payload) in frames:
        flags = (0x02 if nb else 0) | (0x01 if db else 0)
        hdr = (le24(fx // 2) + le24(fy // 2) + le24(fw - 1) +
               le24(fh - 1) + le24(dur) + bytes([flags]))
        body += chunk(b"ANMF", hdr + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body

rnd = random.Random(99)

def frame_pixels(fw, fh, seed, alpha_holes=False):
    r = random.Random(seed)
    px = bytearray()
    for y in range(fh):
        for x in range(fw):
            base = (x * 5 + y * 7 + seed) % 200
            px += bytes([base + r.randint(0, 40),
                         (base * 2) % 255, (255 - base) % 255,
                         0 if alpha_holes and (x + y) % 3 == 0 else 255])
    return bytes(px)

def build(name, W, H, frames_spec, BG, loops=2):
    webp = assemble(W, H, BG, loops, [f[:8] for f in frames_spec])
    with open(os.path.join(OUT, name + ".webp"), "wb") as fh:
        fh.write(webp)
    canvas = bytearray(W * H * 4)  # transparent
    golden_frames = []
    for (fx, fy, fw, fh, dur, nb, db, _pl, rgba) in frames_spec:
        for y in range(fh):
            for x in range(fw):
                s = (y * fw + x) * 4
                d = ((fy + y) * W + fx + x) * 4
                fa = rgba[s + 3]
                if nb or fa == 255:
                    canvas[d:d + 4] = rgba[s:s + 4]
                elif fa == 0:
                    pass  # keep canvas
                else:
                    raise AssertionError("fixture alpha must be 0/255")
        golden_frames.append((dur, bytes(canvas)))
        if db:
            b, g2, r_, a = (BG & 0xFF), (BG >> 8) & 0xFF, \
                (BG >> 16) & 0xFF, (BG >> 24) & 0xFF
            for y in range(fh):
                for x in range(fw):
                    d = ((fy + y) * W + fx + x) * 4
                    canvas[d:d + 4] = bytes([r_, g2, b, a])
    with open(os.path.join(OUT, name + ".px"), "wb") as fh:
        fh.write(struct.pack("<HHH", W, H, len(golden_frames)))
        for dur, pixels in golden_frames:
            fh.write(struct.pack("<I", dur))
            fh.write(pixels)
    print(name, os.path.getsize(os.path.join(OUT, name + ".webp")),
          "frames", len(golden_frames))

W, H = 48, 32
# frame 1: full-canvas lossy (opaque), no-blend
f1 = frame_pixels(W, H, 1)
e1 = encode(f1, W, H, lossless=False)
d1w, d1h, r1 = ref_decode(e1)
# frame 2: sub-rect lossless with alpha holes, alpha-blend (exact for
# 0/255 alphas), disposal none
fw2, fh2 = 20, 14
f2 = frame_pixels(fw2, fh2, 2, alpha_holes=True)
e2 = encode(f2, fw2, fh2, lossless=True)
d2w, d2h, r2 = ref_decode(e2)
# frame 3: sub-rect lossy opaque, no-blend, DISPOSE to background
fw3, fh3 = 16, 10
f3 = frame_pixels(fw3, fh3, 3)
e3 = encode(f3, fw3, fh3, lossless=False)
d3w, d3h, r3 = ref_decode(e3)
# frame 4: full-canvas lossless opaque after the disposal
f4 = frame_pixels(W, H, 4)
e4 = encode(f4, W, H, lossless=True)
d4w, d4h, r4 = ref_decode(e4)
assert (d1w, d1h, d2w, d2h) == (W, H, fw2, fh2)
assert (d3w, d3h, d4w, d4h) == (fw3, fh3, W, H)

def payload(enc_file, want):
    got = dict(chunks_of(enc_file))
    assert want in got, (want, list(got))
    return chunk(want, got[want])

BG = 0x80604020  # BGRA

# anim_lossless: all-VP8L frames — VP8L decode is bit-exact RGBA on
# both sides, so the container walk + compositing pin is EXACT.
l1 = encode(f1, W, H, lossless=True)
_, _, rl1 = ref_decode(l1)
l3 = encode(f3, fw3, fh3, lossless=True)
_, _, rl3 = ref_decode(l3)
build("anim_lossless", W, H, [
    (0, 0, W, H, 40, True, False, payload(l1, b"VP8L"), rl1),
    (6, 4, fw2, fh2, 60, False, False, payload(e2, b"VP8L"), r2),
    (24, 18, fw3, fh3, 80, True, True, payload(l3, b"VP8L"), rl3),
    (0, 0, W, H, 100, True, False, payload(e4, b"VP8L"), r4),
], BG)

# anim_mixed: lossy VP8 frames in ANMF — our YUV->RGB conversion
# differs from libwebp's (fancy upsampling), so the golden compare is
# a TOLERANCE pin; the lossless frame keeps exact coverage of the
# blend path.
build("anim_mixed", W, H, [
    (0, 0, W, H, 40, True, False, payload(e1, b"VP8 "), r1),
    (6, 4, fw2, fh2, 60, False, False, payload(e2, b"VP8L"), r2),
    (24, 18, fw3, fh3, 80, True, True, payload(e3, b"VP8 "), r3),
    (0, 0, W, H, 100, True, False, payload(e4, b"VP8L"), r4),
], BG)
