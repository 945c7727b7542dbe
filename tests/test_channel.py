"""Blake2sChannel exact-Rust tests
(ports of reference test/channel/channel_exact_rust_tests.test.ts)."""
from tstwo_tpu.channel.blake2s import Blake2sChannel
from tstwo_tpu.channel.logging import LoggingChannel


def test_channel_time():
    ch = Blake2sChannel()
    assert (ch.channel_time.n_challenges, ch.channel_time.n_sent) == (0, 0)
    ch.draw_random_bytes()
    assert (ch.channel_time.n_challenges, ch.channel_time.n_sent) == (0, 1)
    ch.draw_felts(9)
    assert (ch.channel_time.n_challenges, ch.channel_time.n_sent) == (0, 6)


def test_draw_random_bytes_differ():
    ch = Blake2sChannel()
    assert ch.draw_random_bytes() != ch.draw_random_bytes()


def test_draw_felt_differ():
    ch = Blake2sChannel()
    assert ch.draw_felt() != ch.draw_felt()


def test_draw_felts_unique():
    ch = Blake2sChannel()
    felts = ch.draw_felts(5) + ch.draw_felts(4)
    assert len({f.to_ints() for f in felts}) == len(felts)


def test_mix_felts_changes_digest():
    from tstwo_tpu.fields import M31, QM31

    ch = Blake2sChannel()
    before = ch.digest
    ch.mix_felts([QM31.from_base(M31.from_int(1923782 + i)) for i in range(2)])
    assert ch.digest != before


def test_mix_u64_exact_rust_digest():
    ch = Blake2sChannel()
    ch.mix_u64(0x1111222233334444)
    ch2 = Blake2sChannel()
    ch2.mix_u32s([0x33334444, 0x11112222])
    assert ch.digest == ch2.digest
    expected = bytes([
        0xbc, 0x9e, 0x3f, 0xc1, 0xd2, 0x4e, 0x88, 0x97, 0x95, 0x6d, 0x33,
        0x59, 0x32, 0x73, 0x97, 0x24, 0x9d, 0x6b, 0xca, 0xcd, 0x22, 0x4d,
        0x92, 0x74, 0x04, 0xe7, 0xba, 0x4a, 0x77, 0xdc, 0x6e, 0xce,
    ])
    assert ch.digest == expected


def test_mix_u32s_exact_rust_digest():
    ch = Blake2sChannel()
    ch.mix_u32s([1, 2, 3, 4, 5, 6, 7, 8, 9])
    expected = bytes([
        0x70, 0x91, 0x76, 0x83, 0x57, 0xbb, 0x1b, 0xb3, 0x34, 0x6f, 0xda,
        0xb6, 0xb3, 0x57, 0xd7, 0xfa, 0x46, 0xb8, 0xfb, 0xe3, 0x2c, 0x2e,
        0x43, 0x24, 0xa0, 0xff, 0xc2, 0x94, 0xcb, 0xf9, 0xa1, 0xc7,
    ])
    assert ch.digest == expected


def test_trailing_zeros():
    ch = Blake2sChannel()
    assert ch.trailing_zeros() == 128  # all-zero digest
    ch.digest = b"\x02" + b"\x00" * 31
    assert ch.trailing_zeros() == 1
    ch.digest = b"\x00\x01" + b"\x00" * 30
    assert ch.trailing_zeros() == 8


def test_logging_channel_transcript():
    ch = LoggingChannel(Blake2sChannel())
    ch.mix_u64(7)
    f = ch.draw_felt()
    inner = Blake2sChannel()
    inner.mix_u64(7)
    assert f == inner.draw_felt()
    assert [e["op"] for e in ch.log] == ["mix_u64", "draw_felt"]
