"""Baseline JPEG codec validation (operators/jpeg.py): exact transform
and entropy layers, bounded end-to-end loss."""

from __future__ import annotations

import numpy as np
import pytest

from iconic_data_science_spark.operators.jpeg import (
    QUANT_CHROMA,
    QUANT_LUMA,
    _BitReader,
    _BitWriter,
    _build_fixed_table,
    _canonical_decode_map,
    _magnitude,
    decode_jpeg,
    dct2,
    encode_jpeg,
    idct2,
)


def test_dct_is_orthonormal():
    rng = np.random.RandomState(5)
    b = rng.uniform(-128, 127, (8, 8))
    assert abs(idct2(dct2(b)) - b).max() < 1e-9
    # Parseval: energy preserved
    assert abs((dct2(b) ** 2).sum() - (b**2).sum()) < 1e-6


def test_huffman_and_bitstream_roundtrip_exact():
    rng = np.random.RandomState(9)
    symbols = set(rng.randint(0, 256, 40).tolist())
    bits, vals, codes = _build_fixed_table(symbols)
    decode = _canonical_decode_map(bits, vals)
    stream = rng.choice(sorted(symbols), 500).tolist()
    bw = _BitWriter()
    for s in stream:
        code, ln = codes[s]
        bw.put(code, ln)
    data = bw.flush()
    br = _BitReader(data)

    def read_symbol():
        code, length = 0, 0
        while True:
            code = (code << 1) | br.bit()
            length += 1
            if (length, code) in decode:
                return decode[(length, code)]

    assert [read_symbol() for _ in stream] == stream


def test_magnitude_category_extend_inverse():
    from iconic_data_science_spark.operators.jpeg import _extend

    for v in list(range(-300, 301)) + [1023, -1023]:
        s, bits = _magnitude(v)
        assert _extend(bits, s) == v


def test_unit_quant_roundtrip_is_rounding_only():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
    ones = np.ones((8, 8), np.int32)
    back = decode_jpeg(encode_jpeg(px, ones, ones))
    err = np.abs(back.astype(int) - px.astype(int))
    assert err.max() <= 3 and err.mean() < 1.0


def test_default_quant_psnr_and_compression():
    yy, xx = np.mgrid[0:64, 0:80]
    smooth = np.stack([(yy * 2 + xx) % 256, (xx * 3) % 256, (yy * 3) % 256], axis=-1).astype(
        np.uint8
    )
    buf = encode_jpeg(smooth)
    back = decode_jpeg(buf)
    mse = ((back.astype(float) - smooth.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / mse) > 35  # visually lossless band
    assert len(buf) < smooth.size // 5  # genuinely compressing


def test_non_multiple_of_8_and_flat():
    ones = np.ones((8, 8), np.int32)
    flat = np.full((13, 9, 3), 77, np.uint8)
    back = decode_jpeg(encode_jpeg(flat, ones, ones))
    assert back.shape == (13, 9, 3)
    assert np.abs(back.astype(int) - 77).max() == 0


def test_decoder_rejects_non_baseline():
    px = np.zeros((8, 8, 3), np.uint8)
    buf = bytearray(encode_jpeg(px))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(buf))


def test_deterministic_bytes():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    assert encode_jpeg(px) == encode_jpeg(px)
    assert (decode_jpeg(encode_jpeg(px)) == decode_jpeg(encode_jpeg(px))).all()
