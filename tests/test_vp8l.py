"""VP8L (lossless WebP) codec: hand-built byte vectors pin the
decoder independently of the encoder (bit order, header layout,
channel read order, simple-code semantics — the places where a
mirrored encoder/decoder misunderstanding could otherwise round-trip
invisibly), property round trips cover every transform/cache/LZ77
branch, and structured sweeps pin the fail-closed contract."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_orders_spark.multimodal.vp8l import (
    _DIST_MAP,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
)


class _HandBits:
    """An LSB-first bit assembler written independently of the module's
    writer, so a shared bug cannot hide."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n):  # LSB first
            self.bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _simple_code(hb: _HandBits, symbols: list[int]) -> None:
    """Spec simple-code form: [1][nsym-1][is8bit][sym0]([sym1])."""
    hb.put(1, 1)
    hb.put(len(symbols) - 1, 1)
    if symbols[0] < 2:
        hb.put(0, 1)
        hb.put(symbols[0], 1)
    else:
        hb.put(1, 1)
        hb.put(symbols[0], 8)
    if len(symbols) == 2:
        hb.put(symbols[1], 8)


def test_hand_built_1x1_simple_codes():
    """Bytes assembled bit-by-bit from the spec: 1x1 image, five
    single-symbol simple codes, zero data bits. Pins the LSB-first
    stream order, the 14+14+1+3 header, the code transmission order
    (green, red, blue, alpha, distance), and the channel packing."""
    hb = _HandBits()
    hb.put(0, 14)  # width - 1
    hb.put(0, 14)  # height - 1
    hb.put(0, 1)  # alpha hint
    hb.put(0, 3)  # version
    hb.put(0, 1)  # no transform
    hb.put(0, 1)  # no color cache
    hb.put(0, 1)  # no meta prefix
    _simple_code(hb, [0x42])  # green
    _simple_code(hb, [0x13])  # red
    _simple_code(hb, [0xA7])  # blue
    _simple_code(hb, [0xFF])  # alpha
    hb.put(1, 1)  # dist: simple
    hb.put(0, 1)  # one symbol
    hb.put(0, 1)  # 1-bit symbol
    hb.put(0, 1)  # symbol 0
    payload = bytes([0x2F]) + hb.bytes()
    out = decode_vp8l(payload)
    assert out.shape == (1, 1, 3)
    assert tuple(out[0, 0]) == (0x13, 0x42, 0xA7)  # (R, G, B)


def test_hand_built_two_symbol_code_order():
    """2x1 image whose green code has TWO simple-code symbols: the
    spec maps the FIRST-READ symbol to bit 0 (transmission order, not
    canonical sort) — the one place the simple form differs from the
    canonical build."""
    hb = _HandBits()
    hb.put(1, 14)  # width 2
    hb.put(0, 14)  # height 1
    hb.put(0, 4 + 3)  # alpha, version, no transform/cache/meta
    _simple_code(hb, [200, 100])  # green: bit 0 -> 200, bit 1 -> 100
    _simple_code(hb, [10])  # red
    _simple_code(hb, [20])  # blue
    _simple_code(hb, [255])  # alpha
    hb.put(1, 1)
    hb.put(0, 1)
    hb.put(0, 1)
    hb.put(0, 1)  # dist: single symbol 0
    # data: pixel0 green bit 1 (-> 100), pixel1 green bit 0 (-> 200)
    hb.put(1, 1)
    hb.put(0, 1)
    out = decode_vp8l(bytes([0x2F]) + hb.bytes())
    assert [tuple(px) for px in out[0]] == [(10, 100, 20), (10, 200, 20)]


def test_hand_built_subtract_green():
    """1x1 with the SUBTRACT_GREEN transform bit set: stored
    (r=10, g=100, b=250) must decode to (110, 100, 94) — pins the
    transform-present bit, the 2-bit type, and the mod-256 inverse."""
    hb = _HandBits()
    hb.put(0, 14)
    hb.put(0, 14)
    hb.put(0, 4)
    hb.put(1, 1)  # transform present
    hb.put(2, 2)  # SUBTRACT_GREEN
    hb.put(0, 1)  # transforms done
    hb.put(0, 1)  # no cache
    hb.put(0, 1)  # no meta
    _simple_code(hb, [100])  # green
    _simple_code(hb, [10])  # red
    _simple_code(hb, [250])  # blue
    _simple_code(hb, [255])  # alpha
    hb.put(1, 1)
    hb.put(0, 1)
    hb.put(0, 1)
    hb.put(0, 1)
    out = decode_vp8l(bytes([0x2F]) + hb.bytes())
    assert tuple(out[0, 0]) == ((10 + 100) % 256, 100, (250 + 100) % 256)


def test_distance_map_canonical_head():
    """The 2D distance map's closest entries, straight from the spec
    table: code 1 = one row up, code 2 = one pixel left."""
    assert _DIST_MAP[0] == (0, 1)
    assert _DIST_MAP[1] == (1, 0)
    assert _DIST_MAP[2] == (1, 1)
    assert _DIST_MAP[3] == (-1, 1)
    assert _DIST_MAP[4] == (0, 2)
    assert len(set(_DIST_MAP)) == 120


def _rand_img(seed: int, h: int = 11, w: int = 13) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"subtract_green": True},
        {"cache_bits": 6},
        {"use_runs": True},
        {"cache_bits": 4, "use_runs": True, "subtract_green": True},
        {"fixed_cte": (35, 210, 17)},
        {"fixed_cte": (255, 128, 1), "subtract_green": True},
    ],
)
def test_roundtrip_branches(kw):
    img = _rand_img(7)
    assert np.array_equal(decode_webp(encode_webp_lossless(img, **kw)), img)


@pytest.mark.parametrize("mode", range(14))
def test_roundtrip_all_predictor_modes(mode):
    img = (np.random.RandomState(3).randint(0, 256, (9, 11, 3)).cumsum(axis=1) % 256).astype(
        np.uint8
    )
    assert np.array_equal(decode_webp(encode_webp_lossless(img, fixed_predictor=mode)), img)


@pytest.mark.parametrize("ncol", [2, 3, 11, 16, 17, 40, 250])
def test_roundtrip_palette_bundling(ncol):
    rng = np.random.RandomState(ncol)
    cols = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
    img = cols[rng.randint(0, ncol, (10, 23))]
    assert np.array_equal(decode_webp(encode_webp_lossless(img, palette=True)), img)


def test_roundtrip_odd_dims_and_flat_runs():
    for h, w in [(1, 1), (1, 7), (7, 1), (5, 5)]:
        img = _rand_img(h * 16 + w, h, w)
        assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)
    flat = np.full((16, 16, 3), 200, dtype=np.uint8)
    data = encode_webp_lossless(flat, use_runs=True)
    assert len(data) < 120  # the backrefs actually engaged
    assert np.array_equal(decode_webp(data), flat)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), h=st.integers(1, 12), w=st.integers(1, 12))
def test_roundtrip_property(seed, h, w):
    img = _rand_img(seed, h, w)
    assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)


def test_honest_gates():
    # lossy VP8 chunk
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + (4).to_bytes(4, "little") + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(lossy)
    # animation
    anim = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPANIM" + (4).to_bytes(4, "little") + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="animation"):
        decode_webp(anim)


def test_vp8x_wrapped_vp8l_decodes():
    """A VP8X extended container whose image chunk is VP8L must decode
    natively (the VP8X metadata chunk is skipped, not gated)."""
    img = _rand_img(5)
    simple = encode_webp_lossless(img)
    vp8l_chunk = simple[12:]  # "VP8L" + size + payload(+pad)
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + b"\x00" * 10
    body = b"WEBP" + vp8x + vp8l_chunk
    data = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert np.array_equal(decode_webp(data), img)


def test_fail_closed():
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"\x00" * 16)
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x00" * 8)
    # bomb: 16384x16384 header (all-ones dims) from a few bytes
    hb = _HandBits()
    hb.put(16383, 14)
    hb.put(16383, 14)
    hb.put(0, 4)
    with pytest.raises(ValueError, match="cap"):
        decode_vp8l(bytes([0x2F]) + hb.bytes() + b"\x00" * 8)


def test_truncation_sweep_fail_closed():
    """ADVICE-r8 contract, applied to the new codec from day one:
    EVERY prefix of a valid stream must stay inside the controlled
    exception set (ValueError/NotImplementedError), never decode to a
    full image with entropy data missing."""
    img = _rand_img(9, 6, 8)
    for kw in ({}, {"cache_bits": 4, "use_runs": True}, {"palette": True, "fixed_predictor": None}):
        if kw.get("palette"):
            cols = np.random.RandomState(1).randint(0, 256, (7, 3), dtype=np.uint8)
            img2 = cols[np.random.RandomState(2).randint(0, 7, (6, 8))]
        else:
            img2 = img
        good = encode_webp_lossless(img2, **kw)
        full = decode_webp(good)
        for n in range(len(good)):
            try:
                out = decode_webp(good[:n])
            except (ValueError, NotImplementedError):
                continue
            # only an even-padding cut may still decode completely
            assert n >= len(good) - 1, f"prefix {n}/{len(good)} decoded"
            assert np.array_equal(out, full)


@settings(max_examples=120, deadline=None)
@given(idx=st.integers(0, 4095), val=st.integers(0, 255))
def test_single_byte_mutations_fail_controlled(idx, val):
    """Bit-rot fuzz: a mutated stream may decode to different pixels,
    but must never escape the controlled exception set or hang."""
    img = _rand_img(11, 8, 9)
    data = bytearray(encode_webp_lossless(img, cache_bits=4, use_runs=True))
    idx %= len(data)
    if data[idx] == val:
        val = (val + 1) & 0xFF
    data[idx] = val
    try:
        out = decode_webp(bytes(data))
        assert out.dtype == np.uint8 and out.ndim == 3
    except (ValueError, NotImplementedError):
        pass


def test_router_integration():
    """codecs.decode_image routes lossless WebP natively now."""
    from etl_orders_spark.multimodal.codecs import decode_image, sniff_format

    img = _rand_img(21)
    data = encode_webp_lossless(img)
    assert sniff_format(data) == "webp"
    assert np.array_equal(decode_image(data), img)
