"""MP3 Layer III side-info + scalefactor decode (sources/media.py) —
the bitstream layers between the header probe and the gated spectral
stage. No Spark session needed: pure byte-format tests."""

from __future__ import annotations

import pytest

from xarray_dataaccessor_spark.sources.media import (
    mp3_decode,
    mp3_probe,
    mp3_scalefactors,
    mp3_side_info,
    write_mp3_frames,
    write_mp3_sideinfo_frames,
)

def _fit(vals, comp):
    """Clip planted values into the slen widths of the compress code."""
    from xarray_dataaccessor_spark.sources.media import _MP3_SLEN

    s1, s2 = _MP3_SLEN[comp]
    return [
        v % (1 << (s1 if b < 11 else s2)) if (s1 if b < 11 else s2) else 0
        for b, v in enumerate(vals)
    ]


def _spec(sf_g0, sf_g1, scfsi=(0, 0, 0, 0), mdb=0, comp=(14, 14)):
    return {
        "scalefacs": [list(sf_g0), list(sf_g1)],
        "scfsi": list(scfsi),
        "main_data_begin": mdb,
        "scalefac_compress": list(comp),
    }


def test_side_info_fields_round_trip():
    g0 = _fit([b * 3 for b in range(21)], 14)
    g1 = _fit([b * 5 + 1 for b in range(21)], 14)
    data = write_mp3_sideinfo_frames([_spec(g0, g1)])
    frames = mp3_side_info(data)
    assert len(frames) == 1
    fr = frames[0]
    assert fr["channels"] == 1
    assert fr["main_data_begin"] == 0
    assert fr["scfsi"] == [[0, 0, 0, 0]]
    for gr in range(2):
        g = fr["granules"][gr][0]
        assert g["global_gain"] == 210
        assert g["scalefac_compress"] == 14
        assert g["window_switching"] == 0 and g["block_type"] == 0
        # part2_3_length covers exactly the scalefactor bits: 11*4+10*2
        assert g["part2_3_length"] == 11 * 4 + 10 * 2


def test_scalefactors_decode_planted_values():
    g0 = _fit([b * 3 for b in range(21)], 14)
    g1 = _fit([b * 7 + 2 for b in range(21)], 14)
    data = write_mp3_sideinfo_frames([_spec(g0, g1)])
    out = mp3_scalefactors(data)
    assert len(out) == 1
    assert out[0]["scalefacs"][0][0] == g0
    assert out[0]["scalefacs"][1][0] == g1
    assert out[0]["part2_bits"][0][0] == 11 * 4 + 10 * 2


def test_scfsi_shares_band_groups_from_granule_0():
    g0 = _fit([b + 1 for b in range(21)], 10)
    # granule 1 writes only the unshared groups; shared bands must come
    # back as granule 0's values
    g1 = _fit([b * 2 + 3 for b in range(21)], 10)
    scfsi = (1, 0, 1, 0)  # share bands 0-5 and 11-15
    data = write_mp3_sideinfo_frames(
        [_spec(g0, g1, scfsi=scfsi, comp=(10, 10))]
    )
    out = mp3_scalefactors(data)
    got1 = out[0]["scalefacs"][1][0]
    for b in range(21):
        shared = (0 <= b <= 5) or (11 <= b <= 15)
        assert got1[b] == (g0[b] if shared else g1[b]), b


def test_bit_reservoir_reaches_into_previous_frame():
    """main_data_begin > 0: frame 2's scalefactors begin in frame 1's
    dead space — decoding must assemble the reservoir."""
    a0 = _fit([b for b in range(21)], 14)
    a1 = _fit([b + 5 for b in range(21)], 14)
    b0 = _fit([15 - (b % 16) for b in range(21)], 14)
    b1 = _fit([3 * b for b in range(21)], 14)
    frames = [
        _spec(a0, a1),
        _spec(b0, b1, mdb=7),  # 7 payload bytes hosted by frame 1
    ]
    data = write_mp3_sideinfo_frames(frames)
    si = mp3_side_info(data)
    assert si[1]["main_data_begin"] == 7
    out = mp3_scalefactors(data)
    assert len(out) == 2
    assert out[1]["scalefacs"][0][0] == b0
    assert out[1]["scalefacs"][1][0] == b1


def test_reservoir_underrun_is_skipped_or_raises():
    """A first frame that claims reservoir data that does not exist
    must raise (truncated stream), not decode garbage."""
    g = _fit([1] * 21, 14)
    with pytest.raises(ValueError, match="reach back"):
        write_mp3_sideinfo_frames([_spec(g, g, mdb=5)])
    # hand-build the same abuse the writer refuses: patch the
    # main_data_begin bits of a valid single-frame stream
    data = bytearray(write_mp3_sideinfo_frames([_spec(g, g)]))
    data[4] = 0x00 | (5 >> 1)  # 9-bit mdb=5: 4 high bits in byte 4
    data[5] = ((5 & 1) << 7) | (data[5] & 0x7F)
    with pytest.raises(ValueError, match="reservoir underrun"):
        mp3_scalefactors(bytes(data))


def test_zero_compress_means_zero_bits():
    g = [0] * 21
    data = write_mp3_sideinfo_frames([_spec(g, g, comp=(0, 0))])
    out = mp3_scalefactors(data)
    assert out[0]["part2_bits"] == [[0], [0]]
    assert out[0]["scalefacs"][0][0] == [0] * 21


def test_probe_agrees_with_side_info_walk():
    g = _fit([2] * 21, 14)
    data = write_mp3_sideinfo_frames([_spec(g, g)] * 5)
    assert mp3_probe(data)["n_frames"] == 5
    assert len(mp3_side_info(data)) == 5


def test_plain_header_fixtures_still_parse():
    """write_mp3_frames zero-fills everything after the header — that
    decodes as all-zero side info (mdb=0, compress=0) and must not
    crash the scalefactor layer."""
    data = write_mp3_frames(4, kbps=128, rate=44100)
    # stereo frames from the old writer: side info parses (32 bytes)
    frames = mp3_side_info(data)
    assert len(frames) == 4 and frames[0]["channels"] == 2
    out = mp3_scalefactors(data)
    assert out[0]["scalefacs"][0][0] == [0] * 21


def test_spectral_decode_gates_outside_the_slice():
    # intensity stereo stays gated (round 10 widened mono-only to
    # stereo/dual/MS); zero-filled stereo frames now decode as silence
    data = bytearray(write_mp3_frames(2))
    data[3] = (1 << 6) | (1 << 4)  # joint stereo, intensity bit on
    with pytest.raises(NotImplementedError, match="intensity"):
        mp3_decode(bytes(data))
    pcm, _ = mp3_decode(
        write_mp3_frames(2), allow_nonconforming_window=True
    )
    assert len(pcm) == 2 * 1152 * 2 and all(v == 0.0 for v in pcm)


def test_mp3_decode_planted_tone():
    """Requantize -> IMDCT -> synthesis on a count1-table-B tone: the
    dominant output frequency is the planted line's center and the
    amplitude scales exactly with global_gain (the linearity pin —
    prototype-independent, unlike the absolute level)."""
    import math

    from xarray_dataaccessor_spark.sources.media import (
        mp3_spectra, write_mp3_tone_frames,
    )

    line = 40
    data = write_mp3_tone_frames(line, n_frames=6)
    sp = mp3_spectra(data)
    assert len(sp) == 6
    assert sp[0]["xr"][0][line] == 1.0
    assert sum(1 for v in sp[0]["xr"][0] if v) == 1

    pcm, rate = mp3_decode(data, allow_nonconforming_window=True)
    assert rate == 44100 and len(pcm) == 6 * 1152
    # drop the filterbank warm-up, analyze the steady state
    steady = pcm[2 * 1152 :]
    n = len(steady)

    def power_at(freq):
        c = round(freq * n / rate)
        re = sum(s * math.cos(2 * math.pi * c * i / n)
                 for i, s in enumerate(steady))
        im = sum(s * math.sin(2 * math.pi * c * i / n)
                 for i, s in enumerate(steady))
        return re * re + im * im

    # a CONSTANT MDCT line (both granules) is a critically-sampled
    # two-sided excitation: its images land at the subband edge +- the
    # in-band offset (sb*rate/64 +- k*rate/1152), not at a single bin —
    # assert the energy sits exactly there and nowhere else
    sb, k = line // 18, line % 18
    edge = sb * rate / 64.0
    off = k * rate / 1152.0
    pair = power_at(edge - off) + power_at(edge + off)
    assert pair > 0
    # Parseval-ish concentration: the image pair carries the signal
    for stray in (edge - 3 * off, edge + 2.7 * off, edge / 2, 2 * edge):
        if 20 < stray < rate / 2:
            assert power_at(stray) < 0.02 * pair, stray
    rms = math.sqrt(sum(s * s for s in steady) / n)
    assert rms > 0
    # +4 in global_gain is exactly one doubling of the requantizer gain
    pcm2, _ = mp3_decode(write_mp3_tone_frames(line, n_frames=6,
                                               global_gain=214),
                         allow_nonconforming_window=True)
    steady2 = pcm2[2 * 1152 :]
    rms2 = math.sqrt(sum(s * s for s in steady2) / n)
    assert abs(rms2 / rms - 2.0) < 1e-9


def test_mp3_decode_silence_and_determinism():
    from xarray_dataaccessor_spark.sources.media import (
        write_mp3_tone_frames,
    )

    tone = write_mp3_tone_frames(12, n_frames=3)
    a, _ = mp3_decode(tone, allow_nonconforming_window=True)
    b, _ = mp3_decode(tone, allow_nonconforming_window=True)
    assert a == b  # pure-Python pipeline, bit-stable
    # zero spectral bits decode as silence through the whole chain
    import xarray_dataaccessor_spark.sources.media as M

    g = [0] * 21
    sil = M.write_mp3_sideinfo_frames(
        [{"scalefacs": [g, g], "scalefac_compress": [0, 0]}]
    )
    # sideinfo fixture is mono? it writes mono frames (3<<6)
    pcm, _ = mp3_decode(sil, allow_nonconforming_window=True)
    assert all(s == 0.0 for s in pcm)


def test_writer_rejects_wide_scalefactor():
    g = [99] + [0] * 20
    with pytest.raises(ValueError, match="too wide"):
        write_mp3_sideinfo_frames([_spec(g, g, comp=(0, 0))])


def test_mp3_stereo_tone_decode_and_gain_linearity():
    """Round-10 stereo widening: independent L/R tones land on their own
    channels with no cross-talk, and +4 global_gain doubles exactly."""
    import math

    from xarray_dataaccessor_spark.sources.media import (
        mp3_spectra, write_mp3_stereo_tone_frames,
    )

    ll, lr = 40, 52
    data = write_mp3_stereo_tone_frames(ll, lr, n_frames=6)
    sp = mp3_spectra(data)
    assert sp[0]["nch"] == 2
    # xr order is gr0L gr0R gr1L gr1R
    assert sp[0]["xr"][0][ll] == 1.0 and sp[0]["xr"][1][lr] == 1.0
    assert sp[0]["xr"][0][lr] == 0.0 and sp[0]["xr"][1][ll] == 0.0

    pcm, rate = mp3_decode(data, allow_nonconforming_window=True)
    assert rate == 44100 and len(pcm) == 6 * 1152 * 2
    left = pcm[0::2][2 * 1152 :]
    right = pcm[1::2][2 * 1152 :]
    n = len(left)

    def power_at(sig, freq):
        c = round(freq * n / rate)
        re = sum(s * math.cos(2 * math.pi * c * i / n)
                 for i, s in enumerate(sig))
        im = sum(s * math.sin(2 * math.pi * c * i / n)
                 for i, s in enumerate(sig))
        return re * re + im * im

    def pair(sig, line):
        sb, k = line // 18, line % 18
        edge, off = sb * rate / 64.0, k * rate / 1152.0
        return power_at(sig, edge - off) + power_at(sig, edge + off)

    # each channel carries its own tone...
    assert pair(left, ll) > 0 and pair(right, lr) > 0
    # ...and essentially none of the other's (filterbank states are
    # fully separate; residual is numeric noise)
    assert pair(left, lr) < 1e-3 * pair(left, ll)
    assert pair(right, ll) < 1e-3 * pair(right, lr)
    # +4 in the LEFT global_gain doubles left RMS exactly, right unchanged
    pcm2, _ = mp3_decode(
        write_mp3_stereo_tone_frames(ll, lr, n_frames=6, gain_l=214),
        allow_nonconforming_window=True,
    )
    l2 = pcm2[0::2][2 * 1152 :]
    r2 = pcm2[1::2][2 * 1152 :]
    rms = lambda s: math.sqrt(sum(v * v for v in s) / len(s))  # noqa: E731
    assert abs(rms(l2) / rms(left) - 2.0) < 1e-9
    assert r2 == right


def test_mp3_ms_stereo_matrixing():
    """MS joint stereo: a mid-only tone decodes to L == R (sample
    exact), each 1/sqrt(2) of the dual-mono decode (linearity through
    the whole filterbank)."""
    import math

    from xarray_dataaccessor_spark.sources.media import (
        write_mp3_stereo_tone_frames, write_mp3_tone_frames,
    )

    line = 40
    ms = write_mp3_stereo_tone_frames(line, -1, n_frames=4, ms=True)
    pcm, _ = mp3_decode(ms, allow_nonconforming_window=True)
    left, right = pcm[0::2], pcm[1::2]
    assert left == right  # zero side channel -> identical channels
    mono, _ = mp3_decode(
        write_mp3_tone_frames(line, n_frames=4),
        allow_nonconforming_window=True,
    )
    isq = 1.0 / math.sqrt(2.0)
    assert len(mono) == len(left)
    for a, b in zip(left, mono):
        assert abs(a - b * isq) <= 1e-12 * max(1.0, abs(b))
