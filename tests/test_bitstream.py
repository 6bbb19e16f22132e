"""Unit tests for the bitstream layer (Annex-B demux, RBSP, BitReader)."""

import pytest

from h264decode_tpu.bitstream.annexb import (
    insert_emulation_prevention,
    iter_nalus,
    split_nalus,
    strip_emulation_prevention,
    to_annexb,
)
from h264decode_tpu.bitstream.bitreader import BitReader, BitReaderError


class TestAnnexB:
    def test_split_4byte_start_codes(self):
        data = b"\x00\x00\x00\x01\x67\xaa" + b"\x00\x00\x00\x01\x68\xbb\xcc"
        assert split_nalus(data) == [b"\x67\xaa", b"\x68\xbb\xcc"]

    def test_split_3byte_start_codes(self):
        data = b"\x00\x00\x01\x67\xaa" + b"\x00\x00\x01\x68\xbb"
        assert split_nalus(data) == [b"\x67\xaa", b"\x68\xbb"]

    def test_split_mixed_start_codes(self):
        data = b"\x00\x00\x00\x01\x67\xaa\x00\x00\x01\x68\xbb"
        assert split_nalus(data) == [b"\x67\xaa", b"\x68\xbb"]

    def test_leading_garbage_skipped(self):
        data = b"\xde\xad\x00\x00\x00\x01\x67\xaa"
        assert split_nalus(data) == [b"\x67\xaa"]

    def test_no_start_code(self):
        assert split_nalus(b"\x01\x02\x03") == []

    def test_trailing_zeros_stripped(self):
        data = b"\x00\x00\x01\x67\xaa\x00\x00\x00\x00\x01\x68"
        assert split_nalus(data) == [b"\x67\xaa", b"\x68"]

    def test_roundtrip(self):
        nalus = [b"\x67\x01\x02", b"\x68\x03"]
        assert split_nalus(to_annexb(nalus)) == nalus


class TestEmulationPrevention:
    def test_strip_basic(self):
        assert strip_emulation_prevention(b"\x00\x00\x03\x01") == b"\x00\x00\x01"

    def test_strip_multiple(self):
        raw = b"\x00\x00\x03\x00\x00\x03\x02"
        assert strip_emulation_prevention(raw) == b"\x00\x00\x00\x00\x02"

    def test_strip_noop(self):
        assert strip_emulation_prevention(b"\x01\x02\x03") == b"\x01\x02\x03"

    def test_insert_strip_roundtrip(self):
        for rbsp in [
            b"\x00\x00\x00\x00",
            b"\x00\x00\x01\x00\x00\x02\x00\x00\x03",
            b"\xff\x00\x00\x00\xff",
            bytes(range(256)) + b"\x00\x00\x00",
        ]:
            assert strip_emulation_prevention(insert_emulation_prevention(rbsp)) == rbsp

    def test_insert_guards_all_small_bytes(self):
        # 00 00 00, 00 00 01, 00 00 02, 00 00 03 all need escaping
        for b in range(4):
            rbsp = b"\x00\x00" + bytes([b])
            esc = insert_emulation_prevention(rbsp)
            assert esc == b"\x00\x00\x03" + bytes([b])


class TestBitReader:
    def test_u(self):
        r = BitReader(b"\xb4\x1f")  # 1011 0100 0001 1111
        assert r.u(1) == 1
        assert r.u(3) == 0b011
        assert r.u(4) == 0b0100
        assert r.u(8) == 0x1F

    def test_u_past_end_raises(self):
        r = BitReader(b"\xff")
        r.u(8)
        with pytest.raises(BitReaderError):
            r.u(1)

    def test_peek_does_not_consume(self):
        r = BitReader(b"\xa5")
        assert r.peek(4) == 0xA
        assert r.u(4) == 0xA
        assert r.peek(4) == 0x5

    def test_ue_small_values(self):
        # codewords: 0->1, 1->010, 2->011, 3->00100, 4->00101, 5->00110, 6->00111
        bits = "1" + "010" + "011" + "00100" + "00101" + "00110" + "00111"
        data = int(bits + "0" * (8 - len(bits) % 8), 2).to_bytes(
            (len(bits) + 7) // 8, "big"
        )
        r = BitReader(data)
        for expect in range(7):
            assert r.ue() == expect

    def test_ue_large_value(self):
        # ue for 2^16-1 = 65535: 16 zeros, 1, 16-bit (65536-1... ) k+1 = 0x10000
        k = 65535
        code = format(k + 1, "b")
        bits = "0" * (len(code) - 1) + code
        padded = bits + "1" * (8 - len(bits) % 8 if len(bits) % 8 else 0)
        data = int(padded, 2).to_bytes(len(padded) // 8, "big")
        r = BitReader(data)
        assert r.ue() == k

    def test_se_mapping(self):
        # spec 9.1.1: k=0->0, 1->1, 2->-1, 3->2, 4->-2, 5->3 ...
        # This is the exact mapping the reference gets wrong for odd k
        # (h264/bit_reader.go:158-161).
        expected = [0, 1, -1, 2, -2, 3, -3, 4, -4]
        for k, want in enumerate(expected):
            code = format(k + 1, "b")
            bits = "0" * (len(code) - 1) + code
            pad = (8 - len(bits) % 8) % 8
            data = int(bits + "1" * pad if pad else bits, 2).to_bytes(
                (len(bits) + pad) // 8, "big"
            )
            assert BitReader(data).se() == want, f"k={k}"

    def test_te_max1(self):
        r = BitReader(b"\x40")  # bits 0 1
        assert r.te(1) == 1  # !bit
        assert r.te(1) == 0

    def test_te_larger(self):
        r = BitReader(b"\x40")  # 010 -> ue=1
        assert r.te(5) == 1

    def test_more_rbsp_data_nondestructive(self):
        # one byte 0x80 = stop bit only at pos 0
        r = BitReader(b"\xa0")  # 1010 0000: data bit, then stop bit at pos 2
        pos = r.pos
        assert r.more_rbsp_data()
        assert r.pos == pos  # non-destructive, unlike reference bit_reader.go:199
        r.u(1)
        assert r.more_rbsp_data()
        r.u(1)
        assert not r.more_rbsp_data()

    def test_rbsp_trailing_bits(self):
        r = BitReader(b"\x80")
        r.rbsp_trailing_bits()
        assert r.byte_aligned()

    def test_align(self):
        r = BitReader(b"\xff\xff")
        r.u(3)
        r.align()
        assert r.pos == 8
