"""Pure-numpy baseline JPEG codec (stdlib-only, no PIL/libjpeg).

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr at
any power-of-two sampling factors (4:4:4, 4:2:2, 4:2:0, 4:1:1 — the
full web-camera spread), standard huffman entropy coding, optional
restart intervals.  Chroma upsampling is spec-legal box replication
(documented deviation: libjpeg's default "fancy" upsampler
interpolates; pixel stats differ by <1 level on smooth data).
Progressive (SOF2), arithmetic coding and 12-bit precision raise
``NotImplementedError`` honestly — the goal is the real wire format
for the common web-image case, not a full libjpeg.

Encoder: the fixture-side twin (grayscale / 4:4:4 / 4:2:0, ITU T.81
Annex K quantization + huffman tables), so tests and the synthetic
media generator can produce REAL JPEG bytes deterministically.

Reference for parity targets: the reference ingests attachments via
Tika (``ingest-attachment`` plugin) and treats media as opaque binary
with typed metadata — this codec backs the multimodal feature-extract
path (ops/multimodal.py) the way PNG/BMP/GIF/WAV already are.

Implements ITU-T T.81 (public specification): marker structure §B,
huffman code generation §C, decode procedure §F.2, and the JFIF
YCbCr<->RGB transform.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU T.81 Annex K quantization tables (quality ~50)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K huffman specs: (bits[1..16], values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_mat() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: forward = C @ X @ C.T,
    inverse = C.T @ S @ C (T.81 §A.3.3)."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0)
    c *= np.sqrt(2.0 / 8.0)
    c[0] /= np.sqrt(2.0)
    return c


_C = _dct_mat()


def _huff_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length), canonical generation (T.81 §C.2)."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, c): s for s, (c, ln) in _huff_codes(bits, vals).items()}


# ------------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s


def _cat_bits(v: int) -> Tuple[int, int]:
    """Amplitude category + appended bits (T.81 §F.1.2.1)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_blocks(
    w: _BitWriter,
    comp_blocks: List[List[List[np.ndarray]]],
    quants: List[np.ndarray],
    dc_tabs: List[Dict[int, Tuple[int, int]]],
    ac_tabs: List[Dict[int, Tuple[int, int]]],
    n_mcu: int,
) -> None:
    """``comp_blocks[ci][m]`` = the list of component ci's DCT blocks
    for MCU m in raster order (one block for 1x1 sampling, four for
    the 2x2 luma of a 4:2:0 stream)."""
    preds = [0] * len(comp_blocks)
    zz = ZIGZAG
    for m in range(n_mcu):
        for ci, blocks in enumerate(comp_blocks):
            for blk in blocks[m]:
                _encode_one_block(
                    w, blk, quants[ci], dc_tabs[ci], ac_tabs[ci], preds, ci, zz
                )


def _encode_one_block(
    w: _BitWriter,
    blk: np.ndarray,
    quant: np.ndarray,
    dc_tab: Dict[int, Tuple[int, int]],
    ac_tab: Dict[int, Tuple[int, int]],
    preds: List[int],
    ci: int,
    zz: np.ndarray,
) -> None:
    q = (blk / quant).round().astype(np.int64)
    seq = q.reshape(64)[zz]
    dc = int(seq[0])
    diff = dc - preds[ci]
    preds[ci] = dc
    s, bits = _cat_bits(diff)
    code, ln = dc_tab[s]
    w.put(code, ln)
    if s:
        w.put(bits, s)
    run = 0
    last_nz = int(np.nonzero(seq[1:])[0][-1]) + 1 if seq[1:].any() else 0
    for i in range(1, last_nz + 1):
        v = int(seq[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s, bits = _cat_bits(v)
        code, ln = ac_tab[(run << 4) | s]
        w.put(code, ln)
        w.put(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.put(code, ln)


def _mcu_blocks(
    plane: np.ndarray, mcuy: int, mcux: int, hi: int, vi: int
) -> List[List[np.ndarray]]:
    """Pad (edge-replicate) to the MCU grid and split into per-MCU
    lists of level-shifted 8x8 DCT blocks, T.81 interleave order:
    MCU (my, mx) carries the component's hi*vi blocks raster-major."""
    th, tw = mcuy * vi * 8, mcux * hi * 8
    h0, w0 = plane.shape
    p = np.pad(
        plane, ((0, th - h0), (0, tw - w0)), mode="edge"
    ).astype(np.float64) - 128.0
    out = []
    for my in range(mcuy):
        for mx in range(mcux):
            blks = []
            for byy in range(vi):
                for bxx in range(hi):
                    y0 = (my * vi + byy) * 8
                    x0 = (mx * hi + bxx) * 8
                    blks.append(_C @ p[y0 : y0 + 8, x0 : x0 + 8] @ _C.T)
            out.append(blks)
    return out


def _box_downsample2(p: np.ndarray) -> np.ndarray:
    """2x2 box-mean chroma downsample (pad odd dims edge-replicate)."""
    h0, w0 = p.shape
    p = np.pad(p, ((0, h0 % 2), (0, w0 % 2)), mode="edge")
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_baseline_jpeg(rgb: np.ndarray, subsampling: str = "4:4:4") -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (or (h, w) grayscale) as a
    baseline JFIF JPEG with the Annex K tables.  ``subsampling`` is
    ``"4:4:4"`` (every component 1x1) or ``"4:2:0"`` (2x2 luma MCUs
    with 2x2 box-mean-downsampled chroma — the dominant web format);
    grayscale ignores it (single component)."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    gray = rgb.ndim == 2
    h, wd = rgb.shape[:2]
    if gray:
        planes = [rgb.astype(np.float64)]
    else:
        r = rgb[..., 0].astype(np.float64)
        g = rgb[..., 1].astype(np.float64)
        b = rgb[..., 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    planes = [np.clip(p, 0, 255) for p in planes]
    nc = len(planes)
    if subsampling == "4:2:0" and nc == 3:
        samps = [(2, 2), (1, 1), (1, 1)]
        planes = [planes[0], _box_downsample2(planes[1]), _box_downsample2(planes[2])]
    else:
        samps = [(1, 1)] * nc
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (wd + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    quants = [QUANT_LUMA] + [QUANT_CHROMA] * (nc - 1)
    comp_blocks = [
        _mcu_blocks(p, mcuy, mcux, hi, vi) for p, (hi, vi) in zip(planes, samps)
    ]
    dc_enc = [_huff_codes(*_DC_LUMA)] + [_huff_codes(*_DC_CHROMA)] * (nc - 1)
    ac_enc = [_huff_codes(*_AC_LUMA)] + [_huff_codes(*_AC_CHROMA)] * (nc - 1)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate([QUANT_LUMA] + ([QUANT_CHROMA] if nc > 1 else [])):
        out += _seg(0xDB, bytes([tq]) + bytes(int(x) for x in q.reshape(64)[ZIGZAG]))
    sof = bytearray([8]) + h.to_bytes(2, "big") + wd.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += _seg(0xC0, bytes(sof))
    for tc_th, spec in (
        ((0, 0), _DC_LUMA),
        ((1, 0), _AC_LUMA),
    ) + ((((0, 1), _DC_CHROMA), ((1, 1), _AC_CHROMA)) if nc > 1 else ()):
        tc, th = tc_th
        out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(spec[0]) + bytes(spec[1]))
    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, bytes(sos))
    w = _BitWriter()
    _encode_blocks(w, comp_blocks, quants, dc_enc, ac_enc, mcux * mcuy)
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader with FF00 de-stuffing; stops at any
    non-stuffed marker (restart handling is the caller's job)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError("unexpected marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_and_skip_restart(self) -> None:
        self.acc, self.n = 0, 0
        if self.d[self.pos] == 0xFF and 0xD0 <= self.d[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _decode_symbol(r: _BitReader, tab: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bit()
        s = tab.get((ln, code))
        if s is not None:
            return s
    raise ValueError("invalid huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes (grayscale or YCbCr at 1/2/4
    sampling factors, interleaved scan) to an (h, w, 3) uint8 RGB
    array.  Raises ``NotImplementedError`` for progressive,
    arithmetic-coded, or 12-bit streams."""
    d = bytes(data)
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quants: Dict[int, np.ndarray] = {}
    dc_tabs: Dict[int, Dict[Tuple[int, int], int]] = {}
    ac_tabs: Dict[int, Dict[Tuple[int, int], int]] = {}
    comps: List[Tuple[int, int, int, int]] = []  # (id, h_i, v_i, tq)
    h = wd = 0
    restart = 0
    scan: List[Tuple[int, int, int]] = []  # (comp_idx, dc_id, ac_id)
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError("marker expected")
        m = d[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:  # EOI
            break
        ln = int.from_bytes(d[pos : pos + 2], "big")
        body = d[pos + 2 : pos + ln]
        if m == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    body[bp + 1 : bp + 65], dtype=np.uint8
                ).astype(np.int64)
                quants[tq] = tbl.reshape(8, 8)
                bp += 65
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0) is supported, got SOF marker {m:#x}"
            )
        elif m == 0xC0:  # SOF0
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            wd = int.from_bytes(body[3:5], "big")
            nc = body[5]
            for ci in range(nc):
                cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                hi, vi = samp >> 4, samp & 0xF
                if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi} unsupported"
                    )
                comps.append((cid, hi, vi, tq))
        elif m == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0xF
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + nv])
                (ac_tabs if tc else dc_tabs)[th] = _huff_decoder(bits, vals)
                bp += 17 + nv
        elif m == 0xDD:  # DRI
            restart = int.from_bytes(body[:2], "big")
        elif m == 0xDA:  # SOS
            ns = body[0]
            for si in range(ns):
                cid, tabs = body[1 + si * 2], body[2 + si * 2]
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan.append((idx, tabs >> 4, tabs & 0xF))
            pos += ln
            break
        pos += ln
    if not comps or not scan:
        raise ValueError("JPEG stream missing SOF/SOS")

    nc = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (wd + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), np.float64) for c in comps
    ]
    preds = [0] * nc
    r = _BitReader(d, pos)
    mcus_done = 0
    n_mcu = mcux * mcuy
    zz = ZIGZAG
    while mcus_done < n_mcu:
        my, mx = divmod(mcus_done, mcux)
        try:
            for ci, dcid, acid in scan:
                _, chi, cvi, ctq = comps[ci]
                for byy in range(cvi):
                    for bxx in range(chi):
                        seq = np.zeros(64, np.int64)
                        s = _decode_symbol(r, dc_tabs[dcid])
                        diff = _extend(r.bits(s), s) if s else 0
                        preds[ci] += diff
                        seq[0] = preds[ci]
                        i = 1
                        while i < 64:
                            sym = _decode_symbol(r, ac_tabs[acid])
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                i += 16
                                continue
                            run, size = sym >> 4, sym & 0xF
                            i += run
                            if i > 63:
                                raise ValueError("AC run overflows block")
                            seq[i] = _extend(r.bits(size), size)
                            i += 1
                        coeff = np.zeros(64, np.float64)
                        coeff[zz] = seq * quants[ctq].reshape(64)[zz]
                        blk = _C.T @ coeff.reshape(8, 8) @ _C + 128.0
                        y0 = (my * cvi + byy) * 8
                        x0 = (mx * chi + bxx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
        except _RestartMarker:
            raise ValueError("restart marker misaligned with interval")
        mcus_done += 1
        if restart and mcus_done % restart == 0 and mcus_done < n_mcu:
            r.align_and_skip_restart()
            preds = [0] * nc
    # crop each plane to its nominal dims, then box-replicate upsample
    # to full resolution (documented deviation: libjpeg's default
    # "fancy" upsampler interpolates; replication is the spec-legal
    # simple upsampler, pixel stats differ by <1 level on smooth data)
    full = []
    for ci, (_, chi, cvi, _tq) in enumerate(comps):
        cw = (wd * chi + hmax - 1) // hmax
        ch = (h * cvi + vmax - 1) // vmax
        p = planes[ci][:ch, :cw]
        if chi != hmax or cvi != vmax:
            p = np.repeat(np.repeat(p, vmax // cvi, axis=0), hmax // chi, axis=1)
        full.append(p[:h, :wd])
    planes = full
    if nc == 1:
        y = np.clip(planes[0], 0, 255)
        return np.repeat(y[..., None], 3, axis=2).astype(np.uint8)
    y, cb, cr = planes
    rr = y + 1.402 * (cr - 128.0)
    gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bb = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([rr, gg, bb], axis=2), 0, 255).astype(np.uint8)
