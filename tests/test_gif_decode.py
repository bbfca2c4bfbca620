"""GIF/LZW codec unit pins: golden hand-packed code streams (so the
decompressor is checked against the spec's bit layout, not against the
compressor it round-trips with in the driver entity), container-walk
robustness, the truncated-stream recovery contract, the 4096-entry
dictionary reset, and the corrupt->NULL contract."""

import random
import struct

from datavault4dbt_spark.llm.multimodal import (
    _gif_delay, _gif_encode, _gif_interlace_rows, _gif_lzw_decode,
    _gif_lzw_encode, _gif_params, _gif_parse, _gif_pixel,
    _gif_truncate)


def _pack_lsb(codes_widths) -> bytes:
    """Independent LSB-first packer for golden streams (deliberately a
    different implementation from the library's _BitPacker)."""
    bits = []
    for code, width in codes_widths:
        bits.extend((code >> j) & 1 for j in range(width))
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i:i + 8]):
            byte |= bit << j
        out.append(byte)
    return bytes(out)


def test_golden_literal_stream():
    # mcs=2: clear=4, eoi=5, first codes 3 bits. Stream: clear, the
    # four literals 0..3, eoi — decodes to [0, 1, 2, 3]. Widths: the
    # decoder adds entries 6, 7, 8 while reading codes 1, 2, 3; the
    # add that makes next_code 8 grows the width, so 3 is read at 4
    # bits and so is eoi.
    data = _pack_lsb([(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)])
    assert _gif_lzw_decode(data, 2, 4) == [0, 1, 2, 3]


def test_golden_kwkwk_case():
    # The KwKwK special case: code equals next_code (not yet in the
    # table). clear, 1, then code 6 == next_code -> entry built from
    # prev + its own first symbol = (1, 1). Decodes to [1, 1, 1].
    data = _pack_lsb([(4, 3), (1, 3), (6, 3), (5, 3)])
    assert _gif_lzw_decode(data, 2, 3) == [1, 1, 1]


def test_golden_mid_stream_clear():
    # clear, 0, 1, clear, 2, 3, eoi: the mid-stream clear resets the
    # table and width bookkeeping.
    data = _pack_lsb([(4, 3), (0, 3), (1, 3), (4, 3), (2, 3), (3, 3),
                      (5, 3)])
    assert _gif_lzw_decode(data, 2, 4) == [0, 1, 2, 3]


def test_decode_rejects_bad_codes():
    # a code beyond next_code is structurally invalid
    data = _pack_lsb([(4, 3), (0, 3), (7, 3), (5, 3)])
    assert _gif_lzw_decode(data, 2, 8) is None
    # missing EOI (stream ends mid-code)
    data = _pack_lsb([(4, 3), (0, 3)])
    assert _gif_lzw_decode(data, 2, 8) is None
    # output longer than the declared pixel count
    data = _pack_lsb([(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)])
    assert _gif_lzw_decode(data, 2, 3) is None


def test_lzw_roundtrip_forces_dictionary_reset():
    # >4096 table entries: the compressor must emit a mid-stream clear
    # and the decompressor must rebuild from scratch
    rng = random.Random(7)
    seq = [rng.randrange(4) for _ in range(120_000)]
    enc = _gif_lzw_encode(seq, 2)
    assert _gif_lzw_decode(enc, 2, len(seq)) == seq


def test_lzw_eoi_on_power_of_two_boundary():
    # regression: when the decoder's final table add lands exactly on
    # a power of two it reads EOI one bit wider than the last data
    # code — the encoder must mirror that growth (doc 97's frame 0)
    seq = [_gif_pixel(97, 0, k) for k in range(20)]
    enc = _gif_lzw_encode(seq, 2)
    assert _gif_lzw_decode(enc, 2, 20) == seq


def test_container_roundtrip_matches_id_derived_params():
    for i in (0, 1, 2, 3, 5, 11, 97, 541, 12345):
        w, h, nf = _gif_params(i)
        frames, ok = _gif_parse(_gif_encode(i))
        assert ok and len(frames) == nf
        for fid, delay, npx, sidx, n0, wsum in frames:
            assert npx == w * h
            assert delay == _gif_delay(i, fid)
            assert sidx == sum(_gif_pixel(i, fid, k) for k in range(npx))
            assert n0 == sum(1 for k in range(npx)
                             if _gif_pixel(i, fid, k) == 0)
            # order-sensitive: only correct (deinterlaced) logical
            # order reproduces the weighted census
            assert wsum == sum(k * _gif_pixel(i, fid, k)
                               for k in range(npx))


def test_truncation_recovers_all_but_last_frame():
    for i in (1, 2, 97, 541):
        _, _, nf = _gif_params(i)
        frames, ok = _gif_parse(_gif_truncate(_gif_encode(i)))
        assert not ok and len(frames) == nf - 1


def test_corrupt_payloads_yield_nulls():
    assert _gif_parse(None) == (None, None)
    assert _gif_parse(b"") == (None, None)
    assert _gif_parse(b"GIF89") == (None, None)
    assert _gif_parse("plain utf-8 text".encode()) == (None, None)
    # valid magic, garbage body: parses as GIF, fails structurally
    frames, ok = _gif_parse(b"GIF89a" + b"\xff" * 40)
    assert frames == [] and ok is False


def test_header_only_gif_reports_failure_not_crash():
    # header + LSD + GCT but no blocks at all -> missing trailer
    buf = _gif_encode(1)[:13 + 12]
    frames, ok = _gif_parse(buf)
    assert frames == [] and ok is False


def test_parser_never_raises_on_arbitrary_bytes():
    for t in range(2000):
        rng = random.Random(t)
        b = bytes(rng.randrange(256) for _ in range(rng.randrange(96)))
        _gif_parse(b)
        _gif_parse(b"GIF89a" + b)
    # structured fuzz: valid prefix, then bit flips inside the body
    base = _gif_encode(9)
    for pos in range(13, len(base), 3):
        mut = base[:pos] + bytes([base[pos] ^ 0x10]) + base[pos + 1:]
        frames, ok = _gif_parse(mut)  # may fail, must not raise
        if ok:
            # a surviving flip may only touch dead bytes (palette RGB,
            # GCE fields we ignore beyond delay) — census stays bounded
            for _, _, npx, sidx, n0, _w in frames:
                assert 0 <= n0 <= npx and 0 <= sidx <= 3 * npx


def test_sub_block_framing_spans_255_bytes():
    # one frame large enough that its LZW stream spans multiple
    # sub-blocks (255-byte framing is GIF's data transport)
    w, h = 60, 50
    rng = random.Random(3)          # high-entropy: patterned pixels
    pixels = [rng.randrange(4) for _ in range(w * h)]  # compress < 255B
    buf = bytearray(b"GIF89a")
    buf += struct.pack("<HHBBB", w, h, 0x80 | 0x20 | 0x01, 0, 0)
    for c in range(4):
        buf += bytes((c, c, c))
    buf += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _gif_lzw_encode(pixels, 2)
    assert len(lzw) > 255          # the test premise: multi-sub-block
    buf += bytes((2,))
    for i in range(0, len(lzw), 255):
        part = lzw[i:i + 255]
        buf += bytes((len(part),)) + part
    buf += b"\x00\x3B"
    frames, ok = _gif_parse(bytes(buf))
    assert ok and len(frames) == 1
    fid, delay, npx, sidx, n0, wsum = frames[0]
    assert (npx, sidx) == (w * h, sum(pixels))
    assert wsum == sum(k * v for k, v in enumerate(pixels))


def test_interlace_row_order_matches_spec():
    # GIF89a appendix E: pass 1 every 8th row from 0, pass 2 every 8th
    # from 4, pass 3 every 4th from 2, pass 4 every 2nd from 1
    assert _gif_interlace_rows(8) == [0, 4, 2, 6, 1, 3, 5, 7]
    assert _gif_interlace_rows(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert _gif_interlace_rows(3) == [0, 2, 1]
    assert _gif_interlace_rows(1) == [0]


def test_interlaced_frame_deinterlaces_to_logical_order():
    # odd ids encode interlaced; the parse must return the LOGICAL
    # census — build the transmission order independently and check
    # they differ (so the test cannot pass via a no-op deinterlace)
    i = 1
    w, h, _ = _gif_params(i)
    pix = [_gif_pixel(i, 0, k) for k in range(w * h)]
    tx = [pix[r * w + c] for r in _gif_interlace_rows(h)
          for c in range(w)]
    assert tx != pix                    # the premise: order changed
    frames, ok = _gif_parse(_gif_encode(i))
    assert ok
    _, _, _, _, _, wsum = frames[0]
    assert wsum == sum(k * v for k, v in enumerate(pix))
    assert wsum != sum(k * v for k, v in enumerate(tx))
