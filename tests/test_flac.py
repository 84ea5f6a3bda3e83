"""Pure FLAC codec (sources/flac.py).

FLAC is lossless, so every round trip asserts exact equality; the CRC
polynomials and zigzag Rice coding are pinned independently, and the
STREAMINFO MD5 (computed over the decoded PCM) keeps encoder and
decoder honest against a shared framing bug.
"""

from __future__ import annotations

import numpy as np
import pytest

from xarray_dataaccessor_spark.sources.flac import (
    _Bits,
    _BitsW,
    _rice_read,
    _rice_write,
    crc8,
    crc16,
    parse_flac,
    write_flac,
)


def test_crc_polynomials_known_vectors():
    # CRC-8 poly 0x07 and CRC-16/BUYPASS poly 0x8005 (init 0, no
    # reflection) published check values for "123456789"
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0 and crc16(b"") == 0


def test_rice_roundtrip_all_ks():
    for k in range(0, 12):
        bw = _BitsW()
        vals = list(range(-40, 41)) + [1000, -1000]
        for v in vals:
            _rice_write(bw, v, k)
        bw.align()
        bits = _Bits(bytes(bw.out))
        got = [_rice_read(bits, k) for _ in vals]
        assert got == vals, k


def test_mono_sine_lossless():
    t = np.arange(5000)
    mono = (10000 * np.sin(t / 50.0)).astype(np.int64)
    sr, dec = parse_flac(write_flac(mono, 16000, 16))
    assert sr == 16000
    assert np.array_equal(dec[:, 0], mono)


@pytest.mark.parametrize("mid_side", [False, True])
def test_stereo_lossless(mid_side):
    t = np.arange(3000)
    left = (12000 * np.sin(t / 30.0)).astype(np.int64)
    right = (9000 * np.cos(t / 44.0)).astype(np.int64)
    st = np.stack([left, right], axis=1)
    sr, dec = parse_flac(write_flac(st, 44100, 16, mid_side=mid_side))
    assert sr == 44100
    assert np.array_equal(dec, st)


@pytest.mark.parametrize("bps,lim", [(8, 127), (16, 32000), (24, 5_000_000)])
def test_bit_depths_and_noise(bps, lim):
    rng = np.random.default_rng(bps)
    x = rng.integers(-lim, lim, 4097).astype(np.int64)  # odd tail block
    sr, dec = parse_flac(write_flac(x, 8000, bps))
    assert np.array_equal(dec[:, 0], x)


def test_corruption_detected():
    x = (1000 * np.sin(np.arange(2000) / 20.0)).astype(np.int64)
    raw = bytearray(write_flac(x, 16000, 16))
    raw[-10] ^= 0x01  # flip a bit in the last frame body
    with pytest.raises(ValueError, match="CRC|MD5"):
        parse_flac(bytes(raw))
    with pytest.raises(ValueError, match="fLaC"):
        parse_flac(b"RIFFxxxx")


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        n=st.integers(1, 3000),
        seed=st.integers(0, 10_000),
        stereo=st.booleans(),
        ms=st.booleans(),
        smooth=st.booleans(),
        block=st.sampled_from([256, 1024, 4096]),
    )
    def rt(n, seed, stereo, ms, smooth, block):
        rng = np.random.default_rng(seed)
        if smooth:
            x = (8000 * np.sin(np.arange(n) / rng.uniform(5, 60))).astype(np.int64)
        else:
            x = rng.integers(-30000, 30000, n).astype(np.int64)
        if stereo:
            x = np.stack([x, np.roll(x, 1)], axis=1)
        sr, dec = parse_flac(
            write_flac(x, 16000, 16, block_size=block, mid_side=stereo and ms)
        )
        want = x if x.ndim == 2 else x[:, None]
        assert np.array_equal(dec, want)

    rt()


def test_spark_distributed_flac_resample(spark):
    """Real FLAC payloads through the Arrow-batched resample_audio path,
    closures shipped by value."""
    from xarray_dataaccessor_spark.operators.multimodal import resample_audio

    t = np.arange(8000)
    wave = (9000 * np.sin(t / 40.0)).astype(np.int64)
    rows = [(i, bytearray(write_flac(wave, 32000, 16))) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in resample_audio(df, rate=16000, codec="flac").collect()}
    assert set(out) == {0, 1, 2, 3}
    for r in out.values():
        assert r["n_samples_in"] == 8000
        assert r["n_samples_out"] == 4000  # 32k -> 16k halves the samples


# ---------------------------------------------------------------------------
# decoder-path coverage via encoder knobs: LPC subframes, left/side and
# right/side decorrelation, multi-partition Rice, escape-coded residuals
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["indep", "mid", "left", "right"])
def test_all_channel_decorrelations(mode):
    t = np.arange(6000)
    st = np.stack(
        [(12000 * np.sin(t / 30.0)).astype(np.int64),
         (9000 * np.cos(t / 44.0)).astype(np.int64)], axis=1
    )
    sr, dec = parse_flac(write_flac(st, 44100, 16, stereo_mode=mode))
    assert np.array_equal(dec, st), mode


@pytest.mark.parametrize("order", [1, 2, 8, 16, 32])
def test_lpc_subframes(order):
    t = np.arange(5000)
    x = (12000 * np.sin(t / 30.0) + 2000 * np.sin(t / 7.0)).astype(np.int64)
    sr, dec = parse_flac(write_flac(x, 16000, 16, lpc_order=order))
    assert np.array_equal(dec[:, 0], x), order


@pytest.mark.parametrize("po", [1, 2, 4, 6])
def test_rice_partitions(po):
    x = (10000 * np.sin(np.arange(4096) / 25.0)).astype(np.int64)
    sr, dec = parse_flac(
        write_flac(x, 16000, 16, partition_order=po, block_size=1024)
    )
    assert np.array_equal(dec[:, 0], x), po


def test_escape_coded_residuals():
    rng = np.random.default_rng(7)
    big = rng.integers(-4_000_000, 4_000_000, 2048).astype(np.int64)
    sr, dec = parse_flac(write_flac(big, 8000, 24, partition_order=2))
    assert np.array_equal(dec[:, 0], big)


def test_combined_lpc_partitions_side_stereo_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    @settings(max_examples=12, deadline=None)
    @given(
        seed=st_.integers(0, 1000),
        mode=st_.sampled_from(["indep", "mid", "left", "right"]),
        lpc=st_.sampled_from([0, 4, 8]),
        po=st_.sampled_from([0, 2]),
        n=st_.integers(100, 2500),
    )
    def rt(seed, mode, lpc, po, n):
        rng = np.random.default_rng(seed)
        t = np.arange(n)
        base = (8000 * np.sin(t / rng.uniform(10, 60))).astype(np.int64)
        x = np.stack([base, base + rng.integers(-50, 50, n)], axis=1)
        sr, dec = parse_flac(
            write_flac(x, 16000, 16, stereo_mode=mode, lpc_order=lpc,
                       partition_order=po, block_size=1024)
        )
        assert np.array_equal(dec, x)

    rt()


def test_audio_spectrogram_finds_tone_frequency(spark):
    """A pure tone's dominant_hz must land on the true frequency (within
    one FFT bin) through the full FLAC decode -> STFT path."""
    from xarray_dataaccessor_spark.operators.multimodal import audio_spectrogram

    sr = 16000
    for hz in (500.0, 2000.0):
        t = np.arange(16000)
        wave = (12000 * np.sin(2 * np.pi * hz * t / sr)).astype(np.int64)
        df = spark.createDataFrame(
            [(1, bytearray(write_flac(wave, sr, 16)))],
            "doc_id bigint, payload binary",
        )
        row = audio_spectrogram(df, codec="flac").collect()[0]
        assert row["sample_rate"] == sr
        bin_hz = sr / 256
        assert abs(row["dominant_hz"] - hz) <= bin_hz, hz
        assert len(row["log_band_energy"]) == 8
        # energy concentrates in the band containing the tone
        band = int(hz / (sr / 2) * 8)
        assert int(np.argmax(row["log_band_energy"])) == band


def test_wasted_bits_roundtrip():
    """Samples sharing trailing zero bits exercise the wasted-bits
    subframe header (shift signalled, samples stored narrowed)."""
    x = ((np.arange(3000) % 97) * 16).astype(np.int64)
    sr, dec = parse_flac(write_flac(x, 16000, 16))
    assert np.array_equal(dec[:, 0], x)
    st = np.stack([x, ((np.arange(3000) % 53) * 8).astype(np.int64)], axis=1)
    for mode in ("indep", "mid", "left", "right"):
        sr, dec = parse_flac(
            write_flac(st, 16000, 16, stereo_mode=mode, lpc_order=4,
                       partition_order=2, block_size=1024)
        )
        assert np.array_equal(dec, st), mode
