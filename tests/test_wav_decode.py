"""RIFF/WAVE parser unit pins: golden hand-assembled buffers (so the
parser is checked against the spec, not against the stdlib encoder it
round-trips with in the driver entity), chunk-walk robustness, and the
corrupt->NULL contract."""

import struct

from datavault4dbt_spark.llm.multimodal import (_riff_parse, _wav_encode,
                                                _wav_params)


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) % 2 else b"")


def _fmt(audio_format=1, ch=2, rate=16000, bits=16) -> bytes:
    block = ch * bits // 8
    return struct.pack("<HHIIHH", audio_format, ch, rate,
                       rate * block, block, bits)


def _wav(chunks: list) -> bytes:
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_golden_canonical_pcm():
    # 16 kHz stereo 16-bit, 5 frames -> 20 data bytes
    buf = _wav([_chunk(b"fmt ", _fmt()), _chunk(b"data", b"\x00" * 20)])
    assert _riff_parse(buf) == (16000, 2, 16, 5, 0)
    # a longer file with a non-zero duration: 8 kHz mono, 4000 frames
    buf = _wav([_chunk(b"fmt ", _fmt(ch=1, rate=8000)),
                _chunk(b"data", b"\x00" * 8000)])
    assert _riff_parse(buf) == (8000, 1, 16, 4000, 500)


def test_chunk_walk_handles_extra_and_reordered_chunks():
    # LIST metadata before fmt, data before fmt, odd-size chunk padding
    odd = _chunk(b"junk", b"\x01\x02\x03")          # size 3 -> padded
    buf = _wav([_chunk(b"LIST", b"INFOxxxx"), odd,
                _chunk(b"data", b"\x00" * 12),
                _chunk(b"fmt ", _fmt(ch=1, rate=22050))])
    assert _riff_parse(buf) == (22050, 1, 16, 6, 0)


def test_corrupt_payloads_yield_nulls():
    none = (None,) * 5
    assert _riff_parse(None) == none
    assert _riff_parse(b"") == none
    assert _riff_parse(b"RIFF\x00\x00\x00\x00WAV") == none      # short
    assert _riff_parse(b"FORM\x00\x00\x00\x00WAVEfmt ") == none  # magic
    assert _riff_parse(_wav([_chunk(b"fmt ", _fmt(audio_format=3)),
                             _chunk(b"data", b"\x00" * 8)])) == none
    # fmt present but no data chunk
    assert _riff_parse(_wav([_chunk(b"fmt ", _fmt())])) == none
    # truncated utf-8 text (the driver entity's corrupt branch shape)
    assert _riff_parse("not a wav at all".encode()) == none


def test_encoder_parser_roundtrip_matches_params():
    for doc_id in (0, 1, 2, 3, 7, 100, 479, 12345):
        rate, ch, frames = _wav_params(doc_id)
        buf = _wav_encode(doc_id)
        assert len(buf) == 44 + frames * ch * 2
        assert _riff_parse(buf) == (rate, ch, 16, frames,
                                    frames * 1000 // rate)
