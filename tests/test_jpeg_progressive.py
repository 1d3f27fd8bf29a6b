"""Progressive JPEG (SOF2) tests (multimodal/jpeg.py, round 10).

Strategy mirrors the baseline suite: hand-built byte vectors pin the
DECODER against T.81 G.1.2 independent of our encoder (per-scan
headers, DC successive approximation, AC EOB-run symbols, refinement
correction bits), and property tests pin the operative exact law —
a COMPLETE progressive scan script transmits the identical quantized
coefficients as the baseline encoding, so progressive decode must
equal baseline decode bit for bit for ANY input, ANY quant table,
ANY subsampling, with or without restart markers.
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_orders_spark.multimodal.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _idct_reference(coeff: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 IDCT, straight double loop — independent of _A."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coeff[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


# ---------------------------------------------------------------------------
# hand-built byte vectors (decoder independent of encoder)
# ---------------------------------------------------------------------------


def _bits_to_bytes(bits: str) -> bytes:
    bits += "1" * (-len(bits) % 8)
    return int(bits, 2).to_bytes(len(bits) // 8, "big")


def _hand_prog(w: int, scans: list[tuple[int, int, int, int, str]]) -> bytes:
    """Minimal 8-tall grayscale SOF2 stream with identity quant and
    hand-sized DHTs: DC symbols 0..11 at code length 4 (code ==
    symbol); AC symbols [EOB0=0x00, 0x01, EOB1=0x10, ZRL=0xF0] at
    code length 3 (codes 000, 001, 010, 011). Each scan entry is
    (Ss, Se, Ah, Al, entropy-bit-string)."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb\x00\x43\x00" + b"\x01" * 64
    out += b"\xff\xc2\x00\x0b\x08\x00\x08" + w.to_bytes(2, "big") + b"\x01\x01\x11\x00"
    dc_bits = bytes([0, 0, 0, 12] + [0] * 12)
    out += b"\xff\xc4" + (2 + 1 + 16 + 12).to_bytes(2, "big") + b"\x00" + dc_bits
    out += bytes(range(12))
    ac_vals = bytes([0x00, 0x01, 0x10, 0xF0])
    ac_bits = bytes([0, 0, 4] + [0] * 13)
    out += b"\xff\xc4" + (2 + 1 + 16 + 4).to_bytes(2, "big") + b"\x10" + ac_bits
    out += ac_vals
    for ss, se, ah, al, bits in scans:
        out += b"\xff\xda\x00\x08\x01\x01\x00" + bytes([ss, se, (ah << 4) | al])
        out += _bits_to_bytes(bits)
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_dc_successive_approximation():
    """DC 16 sent as two scans: first pass diff 16>>1 = 8 (category 4
    = code '0100', magnitude '1000'), refinement raw bit 0. Flat
    round(16/8) + 128 = 130."""
    img = decode_jpeg(
        _hand_prog(
            8,
            [
                (0, 0, 0, 1, "0100" + "1000"),
                (0, 0, 1, 0, "0"),
                (1, 63, 0, 0, "000"),  # AC scan: EOB0
            ],
        )
    )
    assert img.shape == (8, 8, 3)
    assert (img == 130).all()


def test_hand_ac_eob_run_spans_blocks():
    """Two blocks, AC scan = one EOB1 symbol ('010') + 1 extra bit 0
    -> EOBRUN covers both blocks. DC scans give flats 130 and 131."""
    dc_bits = "0101" + "10000"  # block 1: diff 16, category 5
    dc_bits += "0100" + "1000"  # block 2: diff +8 -> DC 24
    img = decode_jpeg(
        _hand_prog(
            16,
            [
                (0, 0, 0, 0, dc_bits),
                (1, 63, 0, 0, "010" + "0"),
            ],
        )
    )
    assert (img[:, :8] == 130).all()
    assert (img[:, 8:] == 131).all()


def test_hand_ac_refinement_correction_and_new_bit():
    """AC first scan at Al=1 plants k=1 as +2 (sent magnitude 1); the
    refinement scan then (a) corrects k=1 to +3 via a correction bit
    and (b) introduces k=2 as -1 (symbol 0x01 = '001', sign bit 0,
    then the buffered correction bit), closing with EOB0. Pixels must
    match the independent double-loop IDCT of (DC=0, k1=+3, k2=-1)."""
    img = decode_jpeg(
        _hand_prog(
            8,
            [
                (0, 0, 0, 0, "0000"),  # DC first: diff 0
                (1, 63, 0, 1, "001" + "1" + "000"),  # k=1 <- +1<<1; EOB0
                # refine: symbol 0x01 (r=0, new significant), sign '0'
                # (negative), correction bit '1' for k=1, EOB0
                (1, 63, 1, 0, "001" + "0" + "1" + "000"),
            ],
        )
    )
    coeff = np.zeros((8, 8))
    for k, v in ((1, 3.0), (2, -1.0)):
        pos = int(ZIGZAG[k])
        coeff[pos // 8, pos % 8] = v
    expect = np.clip(np.round(_idct_reference(coeff) + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(img[:, :, 0], expect)


def test_hand_partial_stream_renders_coarse():
    """A progressive stream that ends (with EOI) after only the DC
    first scan is legal and renders the coarse image — libjpeg
    behavior; truncation WITHOUT EOI still fails closed."""
    img = decode_jpeg(_hand_prog(8, [(0, 0, 0, 1, "0100" + "1000")]))
    assert (img == 130).all()  # (8<<1) / 8 + 128


# ---------------------------------------------------------------------------
# exact law: progressive == baseline for complete scan scripts
# ---------------------------------------------------------------------------


def test_progressive_equals_baseline_matrix():
    rng = np.random.default_rng(42)
    for h, w in [(8, 8), (16, 24), (17, 23), (9, 33), (31, 47)]:
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        for ri in (0, 2):
            assert np.array_equal(
                decode_jpeg(encode_jpeg(g, restart_interval=ri)),
                decode_jpeg(encode_jpeg_progressive(g, restart_interval=ri)),
            ), ("gray", h, w, ri)
        c = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in ("444", "422", "420"):
            for ri in (0, 3):
                assert np.array_equal(
                    decode_jpeg(encode_jpeg(c, subsampling=sub, restart_interval=ri)),
                    decode_jpeg(
                        encode_jpeg_progressive(c, subsampling=sub, restart_interval=ri)
                    ),
                ), ("color", h, w, sub, ri)


def test_progressive_equals_baseline_real_quant():
    """The exact law is NOT an all-ones-quant artifact: any quant
    table yields identical quantized coefficients on both paths."""
    rng = np.random.default_rng(7)
    q = (np.arange(1, 65), np.arange(2, 66))
    c = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(c, quant=q, subsampling="420")),
        decode_jpeg(encode_jpeg_progressive(c, quant=q, subsampling="420")),
    )


def test_custom_scan_scripts():
    """Coverage-equivalent scripts all land on the baseline decode:
    no successive approximation, deep SA chains, and narrow bands."""
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(g))
    for sc in (
        [((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 0)],
        [((0,), 0, 0, 0, 3), ((0,), 0, 0, 3, 2), ((0,), 0, 0, 2, 1),
         ((0,), 0, 0, 1, 0), ((0,), 1, 63, 0, 0)],
        [((0,), 0, 0, 0, 0)] + [((0,), k, k, 0, 0) for k in range(1, 64)],
        [((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 2), ((0,), 1, 63, 2, 1),
         ((0,), 1, 63, 1, 0)],
    ):
        got = decode_jpeg(encode_jpeg_progressive(g, scans=sc))
        assert np.array_equal(base, got), sc


def test_block_constant_fixture_law_progressive():
    """The lane's exactness law holds through the progressive path:
    all-ones quant + block-constant pixels decode to exactly the law
    (pure EOB-run AC scans exercise cross-block EOBRUN hard)."""
    v = (np.arange(12, dtype=np.int64).reshape(3, 4) * 19 + 5) % 256
    y = np.repeat(np.repeat(v, 8, 0), 8, 1).astype(np.uint8)
    img = decode_jpeg(encode_jpeg_progressive(y))
    assert np.array_equal(img[:, :, 0], y)


def test_fail_closed_progressive():
    with pytest.raises(ValueError, match="Ah"):
        decode_jpeg(_hand_prog(8, [(0, 0, 3, 0, "0000")]))  # Ah != Al+1
    with pytest.raises(ValueError, match="non-interleaved"):
        # forge a 1-component AC scan header claiming ns=2
        raw = bytearray(_hand_prog(8, [(1, 63, 0, 0, "000")]))
        i = raw.find(b"\xff\xda")
        forged = raw[:i] + bytes(
            [0xFF, 0xDA, 0x00, 0x0A, 0x02, 0x01, 0x00, 0x01, 0x00, 0x01, 0x3F, 0x00]
        ) + raw[i + 10:]
        decode_jpeg(bytes(forged))
    # torn mid-scan (no EOI): fail closed
    full = encode_jpeg_progressive(np.full((8, 8), 77, np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(full[: len(full) - 6])


def test_fixture_bytes_decode_to_law():
    """jpeg_progressive_media_bytes shapes decode to the shared lane
    law (the same pixels gen_jpeg_media's ids produce)."""
    from etl_orders_spark.multimodal.schemas import (
        jpeg_media_bytes,
        jpeg_progressive_media_bytes,
    )

    for mid in range(3500, 3508):
        pbytes, w, h = jpeg_progressive_media_bytes(mid)
        assert pbytes[3] == 0xE0 and b"\xff\xc2" in pbytes  # SOF2 stream
        bbytes, wb, hb = jpeg_media_bytes(mid)
        assert (w, h) == (wb, hb)
        assert np.array_equal(decode_jpeg(pbytes), decode_jpeg(bbytes))


def test_fill_bytes_and_stray_rst_between_scans():
    """T.81 B.1.1.2: markers may be preceded by runs of 0xFF fill
    bytes, and stray RSTn between scans are skipped — a conforming
    padded stream must decode identically, not quarantine as
    'unexpected marker 0xFFFF' (ADVICE r10)."""
    clean = _hand_prog(
        8,
        [
            (0, 0, 0, 1, "0100" + "1000"),
            (0, 0, 1, 0, "0"),
            (1, 63, 0, 0, "000"),
        ],
    )
    base = decode_jpeg(clean)
    # pad every marker (SOS runs and EOI) with 0xFF fill bytes
    padded = clean.replace(b"\xff\xda", b"\xff\xff\xff\xda")
    padded = padded[:-2] + b"\xff\xff\xff" + padded[-2:]
    assert np.array_equal(decode_jpeg(padded), base)
    # stray RST0 between the last scan and EOI
    stray = clean[:-2] + b"\xff\xd0" + clean[-2:]
    assert np.array_equal(decode_jpeg(stray), base)


def test_fill_bytes_before_header_segments():
    """Fill bytes ahead of header markers (DQT/SOF) also decode."""
    clean = encode_jpeg_progressive(np.full((8, 8), 77, np.uint8))
    padded = clean.replace(b"\xff\xdb", b"\xff\xff\xdb", 1)
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(clean))


def test_scan_ordering_fail_closed():
    """T.81 G.1.1.1.1 ordering is enforced, not silently decoded to
    wrong pixels (ADVICE r10): a band's first scan must have Ah=0,
    refinements must chain Ah = previous Al, a first pass arrives
    once, and AC scans wait for the component's DC scan."""
    with pytest.raises(ValueError, match="AC scan before"):
        decode_jpeg(_hand_prog(8, [(1, 63, 0, 0, "000")]))
    with pytest.raises(ValueError, match="does not chain"):
        # refinement as the very first DC scan
        decode_jpeg(_hand_prog(8, [(0, 0, 1, 0, "0")]))
    with pytest.raises(ValueError, match="does not chain"):
        # first pass at Al=2, refinement claims Ah=1 (skips a level)
        decode_jpeg(
            _hand_prog(8, [(0, 0, 0, 2, "0100" + "1000"), (0, 0, 1, 0, "0")])
        )
    with pytest.raises(ValueError, match="duplicate first pass"):
        decode_jpeg(
            _hand_prog(8, [(0, 0, 0, 0, "0000"), (0, 0, 0, 0, "0000")])
        )
    with pytest.raises(ValueError, match="duplicate first pass"):
        # overlapping AC first passes (1..63 then 5..10 again)
        decode_jpeg(
            _hand_prog(
                8,
                [(0, 0, 0, 0, "0000"), (1, 63, 0, 0, "000"), (5, 10, 0, 0, "000")],
            )
        )
