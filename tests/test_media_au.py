"""Sun/NeXT .au mu-law decode (multimodal._decode_au).

The media_decode_au oracle replays the G.711 expansion bit-for-bit on
the Spark path; these tests cover the table itself (ITU-T G.711 spot
values), header variants, and the reject ladder."""

import math
import struct

import pytest

from upgini_spark.functions.multimodal import (
    _ALAW_TABLE,
    _ULAW_TABLE,
    _alaw_to_linear,
    _decode_au,
    _ulaw_to_linear,
)


def _au(data, offset=24, size=None, enc=1, rate=8000, ch=1):
    if size is None:
        size = len(data)
    return (
        b".snd" + struct.pack(">IIIII", offset, size, enc, rate, ch)
        + b"\x00" * (offset - 24) + data
    )


def test_ulaw_table_spot_values():
    # G.711 anchor points: 0xFF -> 0 (positive silence), 0x7F -> 0
    # (negative silence), 0x00 -> -32124 (max negative), 0x80 -> +32124
    assert _ulaw_to_linear(0xFF) == 0
    assert _ulaw_to_linear(0x7F) == 0
    assert _ulaw_to_linear(0x00) == -32124
    assert _ulaw_to_linear(0x80) == 32124
    # table is odd-symmetric: code u and u^0x80 differ only in sign
    for u in range(256):
        assert _ulaw_to_linear(u) == -_ulaw_to_linear(u ^ 0x80)
    assert _ULAW_TABLE == [_ulaw_to_linear(u) for u in range(256)]
    # strictly monotone within each sign half (decoded magnitudes)
    mags = [_ulaw_to_linear(u) for u in range(0x80, 0x100)]  # positive half
    assert all(mags[i] > mags[i + 1] for i in range(len(mags) - 1))


def test_alaw_table_spot_values():
    # G.711 A-law anchors: 0xD5 (= 0x80^0x55) -> +8 (positive silence),
    # 0x55 -> -8, 0xAA (= 0xFF^0x55) -> +32256 (max), 0x2A -> -32256
    assert _alaw_to_linear(0xD5) == 8
    assert _alaw_to_linear(0x55) == -8
    assert _alaw_to_linear(0xAA) == 32256
    assert _alaw_to_linear(0x2A) == -32256
    # sign symmetry: flipping bit 7 of the CODE negates the sample
    for u in range(256):
        assert _alaw_to_linear(u) == -_alaw_to_linear(u ^ 0x80)
    assert _ALAW_TABLE == [_alaw_to_linear(u) for u in range(256)]
    # A-law has no zero output: minimum magnitude is 8
    assert min(abs(s) for s in _ALAW_TABLE) == 8


def test_decode_au_alaw_encoding():
    data = bytes((13 * 7 + 7 * j) % 256 for j in range(200))
    rate, ch, dur, feats = _decode_au(_au(data, enc=27))
    samples = [_ALAW_TABLE[b] for b in data]
    k = len(samples)
    assert feats[0] == math.sqrt(sum(s * s for s in samples) / k) / 32768.0
    assert feats[2] == max(abs(s) for s in samples) / 32768.0
    # same payload decodes DIFFERENTLY under mu-law
    assert _decode_au(_au(data, enc=1))[3] != feats


def test_decode_au_closed_form():
    data = bytes((13 * 5 + 7 * j) % 256 for j in range(200))
    rate, ch, dur, feats = _decode_au(_au(data))
    assert (rate, ch, dur) == (8000, 1, 25)
    samples = [_ULAW_TABLE[b] for b in data]
    k = len(samples)
    assert feats[0] == math.sqrt(sum(s * s for s in samples) / k) / 32768.0
    assert feats[1] == sum(abs(s) for s in samples) / k / 32768.0
    assert feats[2] == max(abs(s) for s in samples) / 32768.0


def test_decode_au_header_variants():
    data = bytes(range(100))
    # annotation padding: data offset 32
    rate, ch, dur, feats = _decode_au(_au(data, offset=32))
    _, _, _, base = _decode_au(_au(data))
    assert feats == base
    # unknown-length sentinel reads to EOF
    _, _, _, feats2 = _decode_au(_au(data, size=0xFFFFFFFF))
    assert feats2 == base
    # explicit size shorter than payload truncates
    _, _, dur3, feats3 = _decode_au(_au(data, size=50) + b"junk-ignored")
    assert feats3 != base and dur3 == _decode_au(_au(data[:50]))[2]


def test_decode_au_reject_ladder():
    data = bytes(range(64))
    with pytest.raises(ValueError):
        _decode_au(_au(data, enc=3))        # 16-bit PCM: unsupported
    with pytest.raises(ValueError):
        _decode_au(_au(data)[:40])          # truncated vs declared size
    with pytest.raises(ValueError):
        # header claims offset 4096 but the stream is only 88 bytes
        bad = b".snd" + struct.pack(">IIIII", 4096, len(data), 1, 8000, 1) + data
        _decode_au(bad)
    with pytest.raises(ValueError):
        _decode_au(b"RIFFxxxx" + data)      # wrong magic
    with pytest.raises(ValueError):
        _decode_au(_au(data, rate=0))


def test_decode_media_au_e2e(spark):
    from upgini_spark.functions.multimodal import (
        decode_media,
        synthetic_au_media,
    )

    rows = decode_media(synthetic_au_media(spark, 40)).collect()
    assert len(rows) == 40
    for r in rows:
        i = int(r.media_id[1:])
        n = 160 + (i % 5) * 40
        assert r.format == "au"
        assert (r.sample_rate, r.n_channels) == (8000, 1)
        assert r.duration_ms == n // 8
        tbl = _ALAW_TABLE if i % 2 == 1 else _ULAW_TABLE
        samples = [tbl[(13 * i + 7 * j) % 256] for j in range(n)]
        assert r.features[0] == pytest.approx(
            math.sqrt(sum(s * s for s in samples) / n) / 32768.0, abs=0
        )
