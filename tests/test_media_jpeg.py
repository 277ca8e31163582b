"""Pure-stdlib baseline JPEG codec (functions/jpeg.py).

The solid-block (DC-only) paths are INTEGER-exact and replayed by the
media_decode_jpeg SQL oracle; these tests additionally cover what the
oracle cannot see: general AC-bearing blocks against an independent
IDCT, the 4:4:4 color-conversion closed form, entropy-layer stress
(ZRL runs, max categories, EOB-less blocks), and the reject ladder
(progressive, truncation, marker desync)."""

import math

import numpy as np
import pytest

from upgini_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg,
    decoded_solid_level,
    encode_baseline,
    encode_jpeg_blockgrid_gray,
    encode_jpeg_blockgrid_gray420,
    encode_jpeg_gray,
    parse_jpeg,
    solid_dc_q,
)


def _independent_idct(coefs_nat):
    """Direct 4-loop IDCT (T.81 A.3.3) — written independently of the
    decoder's basis-matrix product on purpose."""
    out = np.empty((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
                    cv = 1.0 / math.sqrt(2.0) if v == 0 else 1.0
                    s += (
                        cu * cv * coefs_nat[v * 8 + u]
                        * math.cos((2 * x + 1) * u * math.pi / 16.0)
                        * math.cos((2 * y + 1) * v * math.pi / 16.0)
                    )
            out[y, x] = s / 4.0 + 128.0
    return np.clip(np.floor(out + 0.5), 0, 255)


def test_solid_blockgrid_gray_closed_form():
    for i in (0, 7, 128, 255, 311):
        for q0 in (3, 5, 8, 12, 16):
            for w, h, dri in ((6, 5, 0), (16, 13, 2), (13, 9, 3)):
                def lv(bx, by):
                    return (i + 37 * bx + 53 * by) % 256

                got_w, got_h, rgb = parse_jpeg(
                    encode_jpeg_blockgrid_gray(w, h, lv, q0, dri=dri)
                )
                assert (got_w, got_h) == (w, h)
                exp = np.array([
                    [decoded_solid_level(lv(x // 8, y // 8), q0)
                     for x in range(w)] for y in range(h)
                ])
                assert (rgb[0].astype(int) == exp).all()
                assert (rgb[1] == rgb[0]).all() and (rgb[2] == rgb[0]).all()


def test_solid_blockgrid_420_closed_form():
    """4:2:0 interleave: 2x2 luma blocks per MCU + neutral chroma ->
    RGB == decoded luma exactly; partial edge MCUs crop correctly."""
    for i in (1, 99, 254):
        for q0 in (3, 8, 16):
            for w, h, dri in ((6, 5, 0), (18, 15, 0), (33, 17, 2)):
                def lv(bx, by):
                    return (3 * i + 41 * bx + 59 * by) % 256

                got_w, got_h, rgb = parse_jpeg(
                    encode_jpeg_blockgrid_gray420(w, h, lv, q0, dri=dri)
                )
                assert (got_w, got_h) == (w, h)
                exp = np.array([
                    [decoded_solid_level(lv(x // 8, y // 8), q0)
                     for x in range(w)] for y in range(h)
                ])
                for p in rgb:
                    assert (p.astype(int) == exp).all()


def test_color_conversion_closed_form_444():
    """Solid 4:4:4 color: each plane is DC-only (integer-exact), so the
    YCbCr->RGB rounding is the ONLY float step and has a closed form."""
    qy, qc = 8, 12
    for y_lv, cb_lv, cr_lv in ((90, 60, 200), (10, 240, 30), (200, 128, 50)):
        comps = []
        for cid, lv, q0 in ((1, y_lv, qy), (2, cb_lv, qc), (3, cr_lv, qc)):
            comps.append({
                "id": cid, "h": 1, "v": 1, "qtab": [q0] + [16] * 63,
                "qtab_id": 0 if cid == 1 else 1, "blocks":
                    [[[solid_dc_q(lv, q0)] + [0] * 63 for _ in range(2)]
                     for _ in range(2)],
            })
        w, h, rgb = parse_jpeg(encode_baseline(11, 10, comps))
        yd = decoded_solid_level(y_lv, qy)
        cbd = decoded_solid_level(cb_lv, qc) - 128
        crd = decoded_solid_level(cr_lv, qc) - 128
        exp_r = min(255, max(0, math.floor(yd + 1.402 * crd + 0.5)))
        exp_g = min(255, max(0, math.floor(
            yd - 0.344136 * cbd - 0.714136 * crd + 0.5)))
        exp_b = min(255, max(0, math.floor(yd + 1.772 * cbd + 0.5)))
        assert (w, h) == (11, 10)
        assert (rgb[0] == exp_r).all()
        assert (rgb[1] == exp_g).all()
        assert (rgb[2] == exp_b).all()


def test_entropy_layer_against_independent_idct():
    """AC-bearing blocks through the full Huffman loop: ZRL runs, the
    EOB-less block (last AC nonzero), max DC category, negative coefs.
    Decoded pixels must match an independently-written IDCT within the
    standard +/-1 conformance tolerance (two float orderings)."""
    rng = np.random.RandomState(42)
    qtab = [4] + [6] * 63
    blocks = []
    # block 0: dense random ACs; block 1: ZRL stress (zeros then a tail
    # coef); block 2: EOB-less (coef at zigzag 63); block 3: big DC.
    b0 = [int(rng.randint(-40, 40)) for _ in range(64)]
    b1z = [5] + [0] * 63
    b1z[40] = -3                      # zigzag index 40 -> 17 leading zeros
    b2 = [-7] + [0] * 63
    b2[63] = 2                        # forces run past ZRL + no EOB
    b3 = [solid_dc_q(255, 4)] + [int(rng.randint(-10, 10)) for _ in range(63)]
    for zz in (b0, b1z, b2, b3):
        blocks.append(list(zz))
    grid = [blocks[:2], blocks[2:]]
    comp = {"id": 1, "h": 1, "v": 1, "qtab": qtab, "qtab_id": 0,
            "blocks": grid}
    w, h, rgb = parse_jpeg(encode_baseline(16, 16, [comp]))
    assert (w, h) == (16, 16)
    for bi, zz in enumerate(blocks):
        nat = [0] * 64
        for k in range(64):
            nat[ZIGZAG[k]] = zz[k] * qtab[k]
        exp = _independent_idct(nat)
        by, bx = divmod(bi, 2)
        got = rgb[0][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float)
        assert np.abs(got - exp).max() <= 1.0


def test_gradient_round_trip_near_lossless():
    rng = np.random.RandomState(7)
    img = np.round(rng.rand(21, 30) * 255)
    w, h, rgb = parse_jpeg(encode_jpeg_gray(img, q0=1, ac_q=1, dri=2))
    assert (w, h) == (30, 21)
    assert np.abs(rgb[0].astype(float) - img).max() <= 1.0


def test_reject_ladder():
    good = encode_jpeg_blockgrid_gray(10, 7, lambda bx, by: 100, 8)
    # progressive: flip SOF0 marker to SOF2
    prog = bytearray(good)
    prog[prog.index(b"\xff\xc0")+1] = 0xC2
    with pytest.raises(ValueError):
        parse_jpeg(bytes(prog))
    # truncated entropy stream
    with pytest.raises(ValueError):
        parse_jpeg(good[:-12])
    # missing restart marker: encode with dri then strip the RST byte pair
    with_rst = encode_jpeg_blockgrid_gray(24, 8, lambda bx, by: 50, 8, dri=1)
    idx = with_rst.find(b"\xff\xd0")
    assert idx > 0
    broken = with_rst[:idx] + with_rst[idx + 2:]
    with pytest.raises(ValueError):
        parse_jpeg(broken)
    # not a jpeg at all
    with pytest.raises(ValueError):
        parse_jpeg(b"\x89PNG\r\n\x1a\n")


def test_16bit_dqt_parses():
    """Pq=1 (16-bit) quant tables are legal baseline-adjacent streams;
    the parser must consume 128 bytes and still decode."""
    import struct

    good = encode_jpeg_blockgrid_gray(8, 8, lambda bx, by: 77, 8)
    # rebuild DQT as 16-bit: find the 8-bit DQT and swap it
    i = good.index(b"\xff\xdb")
    qtab = list(good[i + 5:i + 5 + 64])
    seg = bytes([0x10]) + b"".join(struct.pack(">H", q) for q in qtab)
    new_dqt = b"\xff\xdb" + struct.pack(">H", 2 + len(seg)) + seg
    rebuilt = good[:i] + new_dqt + good[i + 4 + 65:]
    w, h, rgb = parse_jpeg(rebuilt)
    assert (rgb[0] == decoded_solid_level(77, 8)).all()


def test_decode_media_jpeg_e2e(spark):
    """The Arrow kernel path: synthetic fixtures -> decode_media, every
    decoded field equals the closed form of the id."""
    from upgini_spark.functions.multimodal import (
        decode_media,
        synthetic_jpeg_media,
    )

    rows = decode_media(synthetic_jpeg_media(spark, 60)).collect()
    assert len(rows) == 60
    for r in rows:
        i = int(r.media_id[1:])
        q0 = [3, 5, 8, 12, 16][i % 5]
        assert r.format == "jpeg"
        if i % 2 == 0:
            w, h = 6 + i % 11, 5 + i % 9

            def lv(bx, by, i=i):
                return (i + 37 * bx + 53 * by) % 256
        else:
            w, h = 6 + i % 13, 5 + i % 11

            def lv(bx, by, i=i):
                return (3 * i + 41 * bx + 59 * by) % 256
        assert (r.width, r.height) == (w, h)
        s = sum(
            decoded_solid_level(lv(x // 8, y // 8), q0)
            for x in range(w) for y in range(h)
        )
        mean = s / (w * h) / 255.0
        assert r.features[0] == pytest.approx(mean, abs=0)
        assert r.features[1] == r.features[0] == r.features[2]
