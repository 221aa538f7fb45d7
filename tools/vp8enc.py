"""Minimal VP8 key-frame encoder (dev tool): bool coder + headers +
B_PRED modes + coefficient tokens, default probs, no segmentation,
configurable filter level. Output wrapped in a RIFF/WebP container."""
import struct

class BoolEnc:
    def __init__(self):
        self.range = 255; self.bottom = 0; self.bit_count = 24
        self.out = bytearray()
    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0; i -= 1
        self.out[i] += 1
    def put(self, prob, bit):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split; self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31): self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
    def literal(self, n, v):
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)
    def flush(self):
        for _ in range(32):
            self.put(128, 0)
        return bytes(self.out)

def tree_path(tree, value):
    """DFS the RFC tree array; return [(prob_index, bit), ...]."""
    def walk(i, path):
        for b in (0, 1):
            t = tree[i + b]
            p2 = path + [(i >> 1, b)]
            if t <= 0:
                if -t == value: return p2
            else:
                r = walk(t, p2)
                if r: return r
        return None
    return walk(0, [])

KF_YMODE_TREE = [-4, 2, 4, 6, 0, -1, -2, -3]
KF_YMODE_PROBS = [145, 156, 163, 128]
UV_TREE = [0, 2, -1, 4, -2, -3]
KF_UV_PROBS = [142, 114, 183]
BMODE_TREE = [0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, -6, 14, -7, 16, -8, -9]
BANDS = [0,1,2,3,6,4,5,6,6,6,6,6,6,6,6,7]
ZIGZAG = [0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15]
CAT_PROBS = [None, [159], [165,145], [173,148,140], [176,155,140,135],
             [180,157,141,134,130], [254,254,243,230,196,177,153,140,133,130,129]]
CAT_BASE = [None, 5, 7, 11, 19, 35, 67]

def load_tables():
    data = open("/usr/lib/x86_64-linux-gnu/libwebp.so.7","rb").read()
    coeff = list(data[0x5aa60:0x5aa60+1056])
    bmode = list(data[0x5a6c0:0x5a6c0+900])
    dc = list(data[0x5a200:0x5a200+128])
    ac = [struct.unpack("<H", data[0x5a100+2*k:0x5a100+2*k+2])[0] for k in range(128)]
    return coeff, bmode, dc, ac
COEFF, BMODE_P, DC_Q, AC_Q = load_tables()

def put_tree(e, tree, probs, value, poff=0):
    for pi, b in tree_path(tree, value):
        e.put(probs[poff + pi] if isinstance(probs, list) else probs[poff + pi], b)

def encode_coeffs(e, typ, ctx0, first, levels):
    """levels: 16 ints in ZIGZAG order (levels[n] = coeff at scan pos n).
    Returns nz flag."""
    n = first
    ctx = ctx0
    # find last nonzero
    last = -1
    for i in range(first, 16):
        if levels[i] != 0: last = i
    while n <= last:
        p = ((typ * 8 + BANDS[n]) * 3 + ctx) * 11
        v = levels[n]
        e.put(COEFF[p], 1)  # not EOB
        if v == 0:
            e.put(COEFF[p + 1], 0)
            ctx = 0
            n += 1
            continue
        e.put(COEFF[p + 1], 1)
        a = abs(v)
        if a == 1:
            e.put(COEFF[p + 2], 0)
            ctx = 1
        else:
            e.put(COEFF[p + 2], 1)
            ctx = 2
            if a <= 4:
                e.put(COEFF[p + 3], 0)
                if a == 2: e.put(COEFF[p + 4], 0)
                else:
                    e.put(COEFF[p + 4], 1)
                    e.put(COEFF[p + 5], a - 3)
            elif a <= 10:
                e.put(COEFF[p + 3], 1)
                e.put(COEFF[p + 6], 0)
                if a <= 6:
                    e.put(COEFF[p + 7], 0)
                    e.put(159, a - 5)
                else:
                    e.put(COEFF[p + 7], 1)
                    e.put(165, (a - 7) >> 1)
                    e.put(145, (a - 7) & 1)
            else:
                cat = 3 if a <= 18 else 4 if a <= 34 else 5 if a <= 66 else 6
                e.put(COEFF[p + 3], 1)
                e.put(COEFF[p + 6], 1)
                bit1 = (cat - 3) >> 1
                bit0 = (cat - 3) & 1
                e.put(COEFF[p + 8], bit1)
                e.put(COEFF[p + 9 + bit1], bit0)
                extra = a - CAT_BASE[cat]
                probs = CAT_PROBS[cat]
                for i in range(len(probs) - 1, -1, -1):
                    e.put(probs[len(probs) - 1 - i], (extra >> i) & 1)
        e.put(128, 1 if v < 0 else 0)
        n += 1
    if n < 16:
        p = ((typ * 8 + BANDS[n]) * 3 + ctx) * 11
        e.put(COEFF[p], 0)  # EOB
    return last >= first

def make_frame(mb_w, mb_h, mbs, filter_level=0, qi=20, simple=False,
               nparts=1, skip_prob=None, lf_deltas=None, sharpness=0):
    """mbs: list of dicts per MB raster order:
       {ymode: 0-4, bmodes: [16], uvmode: 0-3,
        y: [16][16 levels], y2: [16 levels] or None, u: [4][16], v: [4][16]}"""
    w, h = mb_w * 16, mb_h * 16
    e = BoolEnc()
    e.put(128, 0); e.put(128, 0)       # color space, clamping
    e.put(128, 0)                      # segmentation off
    e.put(128, 1 if simple else 0)     # filter type
    e.literal(6, filter_level)
    e.literal(3, sharpness)
    if lf_deltas is None:
        e.put(128, 0)                  # lf delta off
    else:
        ref, mode = lf_deltas
        e.put(128, 1); e.put(128, 1)   # enabled + update
        for d in ref + mode:
            if d == 0: e.put(128, 0)
            else:
                e.put(128, 1); e.literal(6, abs(d)); e.put(128, 1 if d < 0 else 0)
    e.literal(2, {1:0, 2:1, 4:2, 8:3}[nparts])
    e.literal(7, qi)                   # y_ac_qi
    for _ in range(5): e.put(128, 0)   # no quant deltas
    e.put(128, 0)                      # refresh entropy (n/a)
    for k in range(1056):              # no prob updates
        e.put(open_upd[k] if False else UPD[k], 0)
    if skip_prob is None:
        e.put(128, 0)                  # mb_no_coeff_skip = 0
    else:
        e.put(128, 1); e.literal(8, skip_prob)
    # per-MB modes
    above_sub = [[0]*4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_sub = [0]*4
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            ym = mb["ymode"]
            if skip_prob is not None:
                allz = all(all(v == 0 for v in blk) for blk in
                           mb["y"] + mb["u"] + mb["v"]) and \
                       (ym == 4 or all(v == 0 for v in mb["y2"]))
                mb["_skip"] = allz
                e.put(skip_prob, 1 if allz else 0)
            else:
                mb["_skip"] = False
            put_tree(e, KF_YMODE_TREE, KF_YMODE_PROBS, ym)
            if ym == 4:
                for sb in range(16):
                    sx, sy = sb & 3, sb >> 2
                    above = mb["bmodes"][sb - 4] if sy > 0 else above_sub[mx][sx]
                    left = mb["bmodes"][sb - 1] if sx > 0 else left_sub[sy]
                    m = mb["bmodes"][sb]
                    put_tree(e, BMODE_TREE, BMODE_P, m, (above * 10 + left) * 9)
                    if sy == 3: above_sub[mx][sx] = m
                    if sx == 3: left_sub[sy] = m
            else:
                sub = {0:0, 1:2, 2:3, 3:1}[ym]
                for j in range(4):
                    above_sub[mx][j] = sub
                    left_sub[j] = sub
            put_tree(e, UV_TREE, KF_UV_PROBS, mb["uvmode"])
    part0 = e.flush()
    # token partitions (rows round-robin)
    tps = [BoolEnc() for _ in range(nparts)]
    t = tps[0]
    nzY = [[False]*(mb_w*4), [False]*4]   # above, left
    nzU = [[False]*(mb_w*2), [False]*2]
    nzV = [[False]*(mb_w*2), [False]*2]
    nzY2 = [[False]*mb_w, [False]]
    for my in range(mb_h):
        t = tps[my % nparts]
        nzY[1] = [False]*4; nzU[1] = [False]*2; nzV[1] = [False]*2; nzY2[1] = [False]
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            ym = mb["ymode"]
            has_y2 = ym != 4
            if mb["_skip"]:
                nzY[1] = [False]*4; nzU[1] = [False]*2; nzV[1] = [False]*2
                for j in range(4): nzY[0][mx*4+j] = False
                for j in range(2): nzU[0][mx*2+j] = False; nzV[0][mx*2+j] = False
                if has_y2: nzY2[1][0] = nzY2[0][mx] = False
                continue
            if has_y2:
                ctx = int(nzY2[1][0]) + int(nzY2[0][mx])
                nz = encode_coeffs(t, 1, ctx, 0, mb["y2"] or [0]*16)
                nzY2[1][0] = nzY2[0][mx] = nz
            typ = 0 if has_y2 else 3
            first = 1 if has_y2 else 0
            nzbuf = [False]*16
            for sb in range(16):
                sx, sy = sb & 3, sb >> 2
                lf = nzY[1][sy] if sx == 0 else nzbuf[sb-1]
                af = nzY[0][mx*4+sx] if sy == 0 else nzbuf[sb-4]
                nz = encode_coeffs(t, typ, int(lf)+int(af), first, mb["y"][sb])
                nzbuf[sb] = nz
                if sx == 3: nzY[1][sy] = nz
                if sy == 3: nzY[0][mx*4+sx] = nz
            for pl, (nzP, key) in enumerate([(nzU, "u"), (nzV, "v")]):
                nzc = [False]*4
                for cb in range(4):
                    cx, cy = cb & 1, cb >> 1
                    lf = nzP[1][cy] if cx == 0 else nzc[cb-1]
                    af = nzP[0][mx*2+cx] if cy == 0 else nzc[cb-2]
                    nz = encode_coeffs(t, 2, int(lf)+int(af), 0, mb[key][cb])
                    nzc[cb] = nz
                    if cx == 1: nzP[1][cy] = nz
                    if cy == 1: nzP[0][mx*2+cx] = nz
    parts = [tp.flush() for tp in tps]
    part1 = b"".join(struct.pack("<I", len(p))[:3] for p in parts[:-1]) + b"".join(parts)
    tag = (len(part0) << 5) | (0 << 4) | (0 << 1) | 0
    tag |= (1 << 4)  # show_frame
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF,
                 0x9D, 0x01, 0x2A,
                 w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F])
    frame = hdr + part0 + part1
    # RIFF wrap
    vp8 = b"VP8 " + struct.pack("<I", len(frame)) + frame + (b"\x00" if len(frame) & 1 else b"")
    riff = b"WEBP" + vp8
    return b"RIFF" + struct.pack("<I", len(riff)) + riff

def load_upd():
    data = open("/usr/lib/x86_64-linux-gnu/libwebp.so.7","rb").read()
    return list(data[0x5a2a0:0x5a2a0+1056])
UPD = load_upd()
