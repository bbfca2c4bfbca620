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


def test_sub_byte_bits_per_sample_yields_nulls_not_zerodiv():
    # r11 advice: a valid RIFF/WAVE+fmt whose fmt declares 1..7 (or any
    # non-byte-multiple) bits_per_sample made ch*(bits//8) == 0 and the
    # parser raised ZeroDivisionError, breaking the never-raise
    # contract. Structured fuzz over the whole sub-byte/misaligned
    # range; random-bytes fuzz can't reach this branch (valid magics).
    none = (None,) * 5
    for bits in (1, 2, 3, 4, 5, 6, 7, 9, 12, 17, 24 + 1):
        buf = _wav([_chunk(b"fmt ", struct.pack(
                        "<HHIIHH", 1, 1, 8000, 8000, 1, bits)),
                    _chunk(b"data", b"\x00" * 16)])
        assert _riff_parse(buf) == none, bits
    # byte-aligned widths other than 16 still parse (8/24/32-bit PCM)
    for bits in (8, 24, 32):
        buf = _wav([_chunk(b"fmt ", struct.pack(
                        "<HHIIHH", 1, 1, 8000, 8000 * bits // 8,
                        bits // 8, bits)),
                    _chunk(b"data", b"\x00" * 48)])
        frames = 48 // (bits // 8)
        assert _riff_parse(buf) == (8000, 1, bits, frames,
                                    frames * 1000 // 8000)


def test_encoder_parser_roundtrip_matches_params():
    for doc_id in (0, 1, 2, 3, 7, 100, 479, 12345):
        rate, ch, frames = _wav_params(doc_id)
        buf = _wav_encode(doc_id)
        assert len(buf) == 44 + frames * ch * 2
        assert _riff_parse(buf) == (rate, ch, 16, frames,
                                    frames * 1000 // rate)


def test_parser_never_raises_on_arbitrary_bytes():
    """Robustness fuzz: at 100 TB every byte soup appears; the parser's
    contract is NULL features, never an exception (hypothesis when
    available, seeded random otherwise)."""
    try:
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=300, deadline=None)
        @given(st.binary(max_size=200))
        def check(buf):
            out = _riff_parse(buf)
            assert isinstance(out, tuple) and len(out) == 5
            # a random buffer that parses must carry sane positive fields
            if out[0] is not None:
                assert all(v is not None and v >= 0 for v in out)

        check()
    except ImportError:
        import random
        rng = random.Random(11)
        for _ in range(300):
            buf = bytes(rng.randrange(256)
                        for _ in range(rng.randrange(200)))
            out = _riff_parse(buf)
            assert isinstance(out, tuple) and len(out) == 5


def test_parser_rejects_riff_with_lying_chunk_sizes():
    """Chunk sizes larger than the remaining buffer must not read out
    of bounds or loop: the truncated fmt body fails the >=16 check."""
    buf = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
           + b"fmt " + struct.pack("<I", 4096) + b"\x01\x00\x02\x00")
    assert _riff_parse(buf) == (None,) * 5


def test_truncated_data_chunk_clamps_to_present_bytes():
    """A data chunk declaring more bytes than the buffer holds counts
    only the frames actually present (truncated-download contract)."""
    buf = _wav([_chunk(b"fmt ", _fmt(ch=1, rate=8000))])
    # declare 4000 data bytes but append only 8: mono 16-bit is 2
    # bytes per frame, so exactly 4 decodable frames are present
    buf += b"data" + struct.pack("<I", 4000) + b"\x00" * 8
    assert _riff_parse(buf) == (8000, 1, 16, 4, 0)


def test_pcm16_sample_decode_and_stats():
    import numpy as np

    from datavault4dbt_spark.llm.multimodal import (_riff_pcm16,
                                                    _pcm16_stats)

    # golden: 4 mono 16-bit samples [100, -200, 300, -32768]
    data = struct.pack("<4h", 100, -200, 300, -32768)
    buf = _wav([_chunk(b"fmt ", _fmt(ch=1, rate=8000)),
                _chunk(b"data", data)])
    a = _riff_pcm16(buf)
    assert list(a) == [100, -200, 300, -32768]
    n, peak, clipped, sabs, ssq, zc = _pcm16_stats(a)
    assert (n, peak, clipped) == (4, 32768, 1)
    assert sabs == 100 + 200 + 300 + 32768
    assert ssq == 100**2 + 200**2 + 300**2 + 32768**2
    assert zc == 3          # +,-,+,- alternates at every step

    # odd data length truncates to whole samples
    buf = _wav([_chunk(b"fmt ", _fmt(ch=1, rate=8000)),
                _chunk(b"data", data + b"\x7f")])
    assert list(_riff_pcm16(buf)) == [100, -200, 300, -32768]

    # non-16-bit PCM refuses sample decode (header parse still works)
    buf8 = _wav([_chunk(b"fmt ", _fmt(ch=1, rate=8000, bits=8)),
                 _chunk(b"data", b"\x80\x7f")])
    assert _riff_pcm16(buf8) is None
    assert _riff_pcm16(b"junk") is None
    assert isinstance(a, np.ndarray)


def test_ulaw_expansion_matches_audioop_exhaustively():
    """The hand-rolled G.711 table must equal stdlib audioop.ulaw2lin
    (an independent implementation) for ALL 256 byte values; golden
    spot values pin the spec if audioop is ever absent."""
    from datavault4dbt_spark.llm.multimodal import _ulaw_table

    table = _ulaw_table()
    # golden spec points: 0xFF/0x7F are zero, 0x00 is the negative
    # extreme (-8031 << 2), 0x80 the positive extreme
    assert table[0xFF] == 0 and table[0x7F] == 0
    assert table[0x00] == -32124 and table[0x80] == 32124
    try:
        import audioop

        ref = audioop.ulaw2lin(bytes(range(256)), 2)
        want = struct.unpack("<256h", ref)
        assert list(table) == list(want)
    except ImportError:
        pass   # golden points above still pin the formula


def test_ulaw_container_decode_and_stats():
    import numpy as np

    from datavault4dbt_spark.llm.multimodal import (
        _riff_ulaw, _ulaw_encode, _ulaw_params, _ulaw_byte,
        _ulaw_table, _ulaw_stats)

    for doc_id in (1, 2, 3, 9, 100, 399):
        ch, frames = _ulaw_params(doc_id)
        buf = _ulaw_encode(doc_id)
        u = _riff_ulaw(buf)
        assert u is not None and u.size == frames * ch
        assert list(u) == [_ulaw_byte(doc_id, k) for k in range(u.size)]
        n, peak, silent, sabs, ssq, zc = _ulaw_stats(u, _ulaw_table())
        assert n == u.size and 0 <= peak <= 32124
        assert sabs >= peak and ssq >= peak * peak
        assert 0 <= zc < n and silent >= 0

    # a linear-PCM WAV must be refused (format gate inverted)
    pcm = _wav([_chunk(b"fmt ", _fmt(ch=1, rate=8000)),
                _chunk(b"data", b"\x00" * 8)])
    assert _riff_ulaw(pcm) is None
    assert _riff_ulaw(b"not riff") is None
    assert isinstance(_ulaw_table(), np.ndarray)


# ------------------------------------------------------------ PNG pins --

def test_png_roundtrip_and_crc_gate():
    import zlib

    from datavault4dbt_spark.llm.multimodal import (
        _png_encode, _png_decode, _png_bitflip, _png_dims, _PNG_SIG)

    for doc_id in (1, 2, 3, 11, 22, 100, 477):
        buf = _png_encode(doc_id)
        w, h, ct = _png_dims(doc_id)
        assert buf[:8] == _PNG_SIG
        assert _png_decode(buf) == (w, h, 8, ct, "true")
        # golden spec check independent of the parser: the IHDR body
        # CRC recomputed from raw slices matches the stored field
        size = int.from_bytes(buf[8:12], "big")
        stored = int.from_bytes(buf[12 + 4 + size:16 + 4 + size], "big")
        assert zlib.crc32(buf[12:12 + 4 + size]) == stored
        # one flipped bit inside IDAT: header parses, decode_ok false
        assert _png_decode(_png_bitflip(buf)) == (w, h, 8, ct, "false")


def test_png_corrupt_and_structural_failures():
    from datavault4dbt_spark.llm.multimodal import (_png_encode,
                                                    _png_decode, _PNG_SIG)

    none = (None,) * 5
    assert _png_decode(None) == none
    assert _png_decode(b"plain text") == none
    assert _png_decode(_PNG_SIG) == none                 # sig only
    buf = _png_encode(4)
    # corrupt the IHDR CRC itself: the header cannot be trusted
    assert _png_decode(buf[:29] + bytes([buf[29] ^ 0xFF])
                       + buf[30:]) == none
    # truncation mid-IDAT: structural failure after a valid IHDR ->
    # header fields with decode_ok false
    out = _png_decode(buf[:len(buf) - 20])
    assert out[:2] == _png_decode(buf)[:2] and out[4] == "false"


def test_png_decode_never_raises_on_arbitrary_bytes():
    from datavault4dbt_spark.llm.multimodal import _png_decode, _PNG_SIG

    import random
    rng = random.Random(13)
    for _ in range(300):
        buf = bytes(rng.randrange(256) for _ in range(rng.randrange(120)))
        out = _png_decode(_PNG_SIG + buf if rng.random() < 0.5 else buf)
        assert isinstance(out, tuple) and len(out) == 5
