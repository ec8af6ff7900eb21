"""MP4 sample-table writer/parser (mediaprobe.mp4_write_sampled /
mp4_samples): offsets, dts runs, chunk mapping, stss semantics, and
the constant mdat base the driver oracle pins."""

from __future__ import annotations

import pytest

from mechaml_spark import mediaprobe as mp


DELTAS = [500, 500, 500, 1000, 1000, 1000]
SIZES = [16, 17, 18, 19, 20, 21]


def _fixture(sync=(1, 4)):
    return mp.mp4_write_sampled(
        64, 48, DELTAS, SIZES, [2, 3, 1],
        sync=list(sync) if sync is not None else None,
    )


def test_expansion_matches_closed_form():
    got = mp.mp4_samples(_fixture())
    assert got["timescale"] == 30000
    base = got["samples"][0][0]
    acc_off, acc_dts = 0, 0
    for i, (o, s, d, k) in enumerate(got["samples"]):
        assert o == base + acc_off
        assert s == SIZES[i]
        assert d == acc_dts
        assert k == (i in (0, 3))
        acc_off += SIZES[i]
        acc_dts += DELTAS[i]


def test_oracle_base_constant_680():
    # the driver oracle states mdat payload base = 680 for the query
    # fixture shape (6 samples, chunks [2,3,1], 2 stts runs, 2 sync
    # entries); this is the pin — if the writer layout changes, update
    # BOTH this test and the mp4_samples oracle.
    for did in (0, 7, 123):
        d1 = 400 + (did % 5) * 20
        d2 = 900 + (did % 3) * 100
        sizes = [16 + (did + i) % 9 for i in range(6)]
        data = mp.mp4_write_sampled(
            64, 48, [d1] * 3 + [d2] * 3, sizes, [2, 3, 1], sync=[1, 4]
        )
        got = mp.mp4_samples(data)
        assert got["samples"][0][0] == 680, did
        # mdat payload really does start there
        assert data[676:680] == b"mdat"


def test_sample_bytes_addressable():
    data = _fixture()
    got = mp.mp4_samples(data)
    # the (offset, size) ranges tile the mdat payload exactly
    o0 = got["samples"][0][0]
    end = got["samples"][-1][0] + got["samples"][-1][1]
    assert end - o0 == sum(SIZES) == len(data) - o0
    for o, s, _, _ in got["samples"]:
        assert len(data[o : o + s]) == s


def test_no_stss_means_all_sync():
    got = mp.mp4_samples(_fixture(sync=None))
    assert all(k for _, _, _, k in got["samples"])


def test_chunk_gaps_respected():
    # chunks need not be contiguous: the parser must trust stco, not
    # assume tiling.  Write with [3,3] chunking then move the second
    # chunk's offset by patching stco directly.
    import struct

    data = bytearray(
        mp.mp4_write_sampled(8, 8, DELTAS, SIZES, [3, 3], sync=[1])
    )
    i = bytes(data).index(b"stco")
    n = struct.unpack_from(">I", data, i + 8)[0]
    assert n == 2
    (second,) = struct.unpack_from(">I", data, i + 16)
    struct.pack_into(">I", data, i + 16, second + 40)
    got = mp.mp4_samples(bytes(data))
    assert got["samples"][3][0] == second + 40
    assert got["samples"][2][0] + 18 + 40 == got["samples"][3][0]


def test_non_bmff_returns_none():
    assert mp.mp4_samples(b"\x89PNG\r\n\x1a\n") is None
    assert mp.mp4_samples(b"") is None


def test_inconsistent_tables_raise_on_write():
    with pytest.raises(ValueError):
        mp.mp4_write_sampled(8, 8, DELTAS, SIZES, [2, 2])


def test_random_tables_roundtrip():
    # randomized writer->parser round trip over arbitrary chunkings,
    # delta runs, and keyframe sets — the expansion must equal the
    # directly-computed layout every time
    import random

    rng = random.Random(20260820)
    for _ in range(60):
        n = rng.randrange(1, 40)
        sizes = [rng.randrange(1, 300) for _ in range(n)]
        deltas = []
        while len(deltas) < n:
            run = min(n - len(deltas), rng.randrange(1, 6))
            deltas += [rng.choice([256, 512, 1001, 3003])] * run
        spc = []
        left = n
        while left:
            c = min(left, rng.randrange(1, 7))
            spc.append(c)
            left -= c
        sync = sorted(rng.sample(range(1, n + 1), rng.randrange(0, n + 1)))
        data = mp.mp4_write_sampled(
            32, 32, deltas, sizes, spc, sync=sync or None
        )
        got = mp.mp4_samples(data)
        assert got["timescale"] == 30000
        assert len(got["samples"]) == n
        base = got["samples"][0][0]
        off, dts = 0, 0
        for i, (o, s, d, k) in enumerate(got["samples"]):
            assert (o, s, d) == (base + off, sizes[i], dts), i
            want_key = (i + 1) in sync if sync else True
            assert k == want_key, i
            off += sizes[i]
            dts += deltas[i]
        # the byte ranges really address the mdat payload
        assert base + off == len(data)
