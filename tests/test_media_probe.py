"""MP4 container / MP3 frame-header probes (multimodal._probe_mp4/_probe_mp3).

The media_probe_* oracles gate the happy paths closed-form; these tests
cover the parser branches the oracle can't see (reject ladders, box
variants, ID3 edge cases) plus the Arrow e2e path."""

import struct

import pytest

from upgini_spark.functions.multimodal import (
    _encode_mp3,
    _encode_mp4,
    _probe_mp3,
    _probe_mp4,
)


def test_mp4_probe_variants():
    # 64-bit mdat + mvhd v1 + extra audio track, all at once
    c = _encode_mp4(90000, 600, 640, 480, 44100, 2, extra_audio=True,
                    mvhd_v1=True, mdat_bytes=33, largesize_mdat=True)
    assert _probe_mp4(c) == (150000, 640, 480, 44100, 2, [1.0, 2.0])


def test_mp4_reject_ladder():
    good = _encode_mp4(1000, 600, 320, 240, 8000, 1)
    # box size larger than remaining bytes
    bad = bytearray(good)
    moov_at = good.index(b"moov") - 4
    struct.pack_into(">I", bad, moov_at, len(good))  # moov overruns EOF
    with pytest.raises(ValueError):
        _probe_mp4(bytes(bad))
    # no moov at all
    with pytest.raises(ValueError):
        _probe_mp4(good[:good.index(b"moov") - 4])
    # zero mvhd timescale
    with pytest.raises(ValueError):
        _probe_mp4(_encode_mp4(1000, 0, 320, 240, 8000, 1))
    # box size smaller than its header
    tiny = bytearray(good)
    struct.pack_into(">I", tiny, moov_at, 4)
    with pytest.raises(ValueError):
        _probe_mp4(bytes(tiny))


def test_mp3_probe_id3_and_padding():
    c = _encode_mp3(5, 9, 0, mono=False, id3_size=77,
                    pad_fn=lambda j: j % 2)
    dur, rate, ch, feats = _probe_mp3(c)
    assert (rate, ch) == (44100, 2)
    assert feats == [5.0, 128.0]
    assert dur == int(5 * 1152 * 1000 / 44100)


def test_mp3_reject_ladder():
    good = _encode_mp3(3, 5, 1, mono=True)
    with pytest.raises(ValueError):
        _probe_mp3(good[:-10])                      # truncated last frame
    # free-format bitrate (index 0)
    with pytest.raises(ValueError):
        _probe_mp3(bytes([0xFF, 0xFB, 0x00, 0xC0]) + bytes(100))
    # reserved sample-rate index
    with pytest.raises(ValueError):
        _probe_mp3(bytes([0xFF, 0xFB, 0x5C, 0xC0]) + bytes(100))
    # MPEG2 (version bits 10) rejected by the MPEG1-only walker
    with pytest.raises(ValueError):
        _probe_mp3(bytes([0xFF, 0xF3, 0x50, 0xC0]) + bytes(100))
    # ID3 with a non-syncsafe size byte
    with pytest.raises(ValueError):
        _probe_mp3(b"ID3\x03\x00\x00\x00\x00\x00\x80" + good)
    # desync: junk between frames
    with pytest.raises(ValueError):
        _probe_mp3(good + b"\x00junk")


def test_decode_media_probe_e2e(spark):
    from upgini_spark.functions.multimodal import (
        decode_media,
        synthetic_mp3_media,
        synthetic_mp4_media,
    )

    mp4 = decode_media(synthetic_mp4_media(spark, 24)).collect()
    assert all(r.format == "mp4" for r in mp4)
    for r in mp4:
        i = int(r.media_id[1:])
        ts = [600, 1000, 90000, 44100, 24][i % 5]
        assert r.duration_ms == int((i * 37) % 100000 * 1000 / ts)
        assert r.width == 16 * (1 + i % 40)
        assert r.features == [1.0, 2.0 if i % 6 == 0 else 1.0]
    mp3 = decode_media(synthetic_mp3_media(spark, 24)).collect()
    assert all(r.format == "mp3" for r in mp3)
    for r in mp3:
        i = int(r.media_id[1:])
        assert r.features[0] == float(3 + i % 7)
        assert r.n_channels == (1 if i % 2 == 1 else 2)
