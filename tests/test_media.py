"""Pure media decoders (sources/media.py) and their wiring into the
multimodal operators: WAV round-trip cross-checked against the stdlib
``wave`` module, netpbm/BMP/Y4M round-trips, exact area resize, and
Spark end-to-end drives of the real codecs."""

from __future__ import annotations

import io
import wave as stdlib_wave

import numpy as np
import pytest

from xarray_dataaccessor_spark.sources.media import (
    parse_bmp,
    parse_netpbm,
    parse_wav,
    parse_y4m,
    write_bmp,
    write_netpbm,
    write_wav,
    write_y4m,
)


def test_wav_roundtrip_and_stdlib_crosscheck():
    rng = np.random.default_rng(5)
    samples = np.clip(rng.standard_normal(2000) * 0.3, -1, 1)
    data = write_wav(samples, rate=8000)
    # our writer must be a valid WAV per the stdlib reader
    with stdlib_wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        raw = w.readframes(w.getnframes())
    std = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
    rate, chans = parse_wav(data)
    assert rate == 8000 and chans.shape == (2000, 1)
    assert np.allclose(chans[:, 0], std)
    assert np.max(np.abs(chans[:, 0] - samples)) <= 1.0 / 32768.0


def test_wav_stereo_and_gates():
    stereo = np.stack([np.linspace(-0.5, 0.5, 100), np.zeros(100)], axis=1)
    rate, chans = parse_wav(write_wav(stereo, rate=44100))
    assert rate == 44100 and chans.shape == (100, 2)
    with pytest.raises(ValueError, match="RIFF"):
        parse_wav(b"nope")
    # compressed tag gates
    bad = bytearray(write_wav(np.zeros(10), 8000))
    bad[20:22] = (85).to_bytes(2, "little")  # MP3 tag
    with pytest.raises(NotImplementedError, match="compressed"):
        parse_wav(bytes(bad))


def test_netpbm_roundtrips():
    gray = (np.arange(48).reshape(6, 8) * 5).astype("u1")
    for binary in (True, False):
        assert np.array_equal(parse_netpbm(write_netpbm(gray, binary)), gray)
    rgb = np.arange(6 * 8 * 3).reshape(6, 8, 3).astype("u1")
    assert np.array_equal(parse_netpbm(write_netpbm(rgb)), rgb)
    wide = (np.arange(12).reshape(3, 4) * 300).astype("u2")  # 16-bit
    assert np.array_equal(parse_netpbm(write_netpbm(wide)), wide)


def test_bmp_roundtrip_and_gates():
    rgb = np.arange(5 * 7 * 3).reshape(5, 7, 3).astype("u1")
    assert np.array_equal(parse_bmp(write_bmp(rgb)), rgb)
    bad = bytearray(write_bmp(rgb))
    bad[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        parse_bmp(bytes(bad))


def test_bmp_short_palette():
    """8-bit BMP with biClrUsed=16 stores only 16 palette entries —
    spec-conforming, previously crashed the fixed 256-entry read."""
    import struct

    h, w, n_pal = 3, 5, 16
    row_bytes = (w + 3) & ~3
    idx = (np.arange(h * w).reshape(h, w) % n_pal).astype("u1")
    # gray palette: entry i -> (i*16, i*16, i*16, 0) stored as BGRA
    pal = b"".join(struct.pack("<BBBB", i * 16, i * 16, i * 16, 0) for i in range(n_pal))
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        body += idx[r].tobytes() + b"\x00" * (row_bytes - w)
    pix_off = 14 + 40 + len(pal)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 2835, 2835, n_pal, 0
    )
    head = struct.pack("<2sIHHI", b"BM", pix_off + len(body), 0, 0, pix_off)
    out = parse_bmp(head + info + pal + bytes(body))
    assert np.array_equal(out, idx * 16)  # gray palette collapses to values


def test_y4m_roundtrip():
    frames = [np.full((4, 6), v, dtype="u1") for v in (10, 20, 30)]
    fps, got = parse_y4m(write_y4m(frames, fps=25))
    assert fps == 25.0 and len(got) == 3
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)


def test_area_resize_exact():
    from xarray_dataaccessor_spark.operators.multimodal import _resize_area

    img = np.arange(36, dtype="float64").reshape(6, 6)
    out = _resize_area(img, 3, 3)
    want = img.reshape(3, 2, 3, 2).mean(axis=(1, 3))
    assert np.allclose(out, want)
    # non-divisible shape still partitions every source cell exactly once
    img2 = np.arange(35, dtype="float64").reshape(5, 7)
    out2 = _resize_area(img2, 2, 3)
    assert out2.shape == (2, 3)
    # total mass conservation: sum(mean * area) == sum(img)
    total = 0.0
    ys = (np.arange(2 + 1) * 5) // 2
    xs = (np.arange(3 + 1) * 7) // 3
    for i in range(2):
        for j in range(3):
            total += out2[i, j] * (ys[i + 1] - ys[i]) * (xs[j + 1] - xs[j])
    assert abs(total - img2.sum()) < 1e-9


def test_spark_real_codecs_end_to_end(spark):
    from pyspark.sql import functions as F

    from xarray_dataaccessor_spark.operators.multimodal import (
        decode_image,
        resample_audio,
        sample_frames,
    )

    rng = np.random.default_rng(11)
    img_payload = write_bmp((rng.integers(0, 255, (16, 16, 3))).astype("u1"))
    pbm_payload = write_netpbm((rng.integers(0, 255, (12, 10))).astype("u1"))
    wav_payload = write_wav(np.sin(np.arange(4410) / 10.0) * 0.5, rate=44100)
    y4m_payload = write_y4m(
        [np.full((8, 8), v, dtype="u1") for v in range(50)], fps=25
    )

    df = spark.createDataFrame(
        [(1, bytearray(img_payload))], "doc_id bigint, payload binary"
    )
    out = decode_image(df, out_size=(4, 4), codec="bmp").collect()
    assert len(out) == 1 and len(out[0]["pixels"]) == 16
    # luma mean matches the driver-side decode
    want = parse_bmp(img_payload).astype("float64") @ np.array([0.299, 0.587, 0.114])
    assert out[0]["mean_pixel"] == pytest.approx(float(want.mean()))

    dfp = spark.createDataFrame(
        [(2, bytearray(pbm_payload))], "doc_id bigint, payload binary"
    )
    outp = decode_image(dfp, out_size=(4, 5), codec="netpbm").collect()
    assert outp[0]["height"] == 4 and outp[0]["width"] == 5

    dfa = spark.createDataFrame(
        [(3, bytearray(wav_payload))], "doc_id bigint, payload binary"
    )
    outa = resample_audio(dfa, rate=16000, codec="wav").collect()[0]
    assert outa["n_samples_in"] == 4410
    assert outa["n_samples_out"] == round(4410 * 16000 / 44100)

    dfv = spark.createDataFrame(
        [(4, bytearray(y4m_payload))], "doc_id bigint, payload binary"
    )
    outv = sample_frames(dfv, every_ms=1000, codec="y4m").collect()
    # 50 frames at 25 fps = 2 s of video -> samples at t=0 and t=1
    assert [r["frame_idx"] for r in outv] == [0, 25]
    assert outv[0]["mean_luma"] == 0.0 and outv[1]["mean_luma"] == 25.0

    # compressed codecs still gate loudly
    with pytest.raises(NotImplementedError):
        decode_image(df, codec="pil")


def test_media_roundtrip_properties():
    """Hypothesis round-trips, same discipline as the NetCDF/GeoTIFF/Zarr
    readers (test_reader_properties.py): any samples/raster survive the
    write->parse cycle within format precision."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=500),
        ch=st.integers(min_value=1, max_value=3),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def wav_rt(n, ch, rate, seed):
        rng = np.random.default_rng(seed)
        s = np.clip(rng.standard_normal((n, ch)) * 0.4, -1, 1)
        got_rate, got = parse_wav(write_wav(s, rate))
        assert got_rate == rate and got.shape == (n, ch)
        assert np.max(np.abs(got - s)) <= 1.0 / 32768.0

    wav_rt()

    @settings(max_examples=50, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=24),
        w=st.integers(min_value=1, max_value=24),
        color=st.booleans(),
        wide=st.booleans(),
        binary=st.booleans(),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def pnm_rt(h, w, color, wide, binary, seed):
        rng = np.random.default_rng(seed)
        hi, dt = (65535, "u2") if wide else (255, "u1")
        shape = (h, w, 3) if color else (h, w)
        img = rng.integers(0, hi + 1, shape).astype(dt)
        assert np.array_equal(parse_netpbm(write_netpbm(img, binary)), img)

    pnm_rt()

    @settings(max_examples=50, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=20),
        w=st.integers(min_value=1, max_value=20),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def bmp_rt(h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3)).astype("u1")
        assert np.array_equal(parse_bmp(write_bmp(img)), img)

    bmp_rt()

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(min_value=2, max_value=16).map(lambda v: v * 2),
        w=st.integers(min_value=2, max_value=16).map(lambda v: v * 2),
        n=st.integers(min_value=1, max_value=8),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def y4m_rt(h, w, n, seed):
        rng = np.random.default_rng(seed)
        frames = [rng.integers(0, 256, (h, w)).astype("u1") for _ in range(n)]
        fps, got = parse_y4m(write_y4m(frames))
        assert len(got) == n
        for a, b in zip(frames, got):
            assert np.array_equal(a, b)

    y4m_rt()


def _unfilter_reference(raw, h, stride, bpp):
    """Independent scalar PNG unfilter written directly from spec §9
    prose — guards the vectorized decoder against a matched encode/
    decode bug (a round-trip alone cannot catch a formula both sides
    share)."""
    out, prev = [], [0] * stride
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = list(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        cur = [0] * stride
        for i in range(stride):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                rec = line[i]
            elif ft == 1:
                rec = line[i] + a
            elif ft == 2:
                rec = line[i] + b
            elif ft == 3:
                rec = line[i] + (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec = line[i] + pred
            cur[i] = rec % 256
        out.append(cur)
        prev = cur
    return out


def test_png_all_filters_roundtrip_and_spec_reference():
    import zlib

    from xarray_dataaccessor_spark.sources.media import parse_png, write_png

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (9, 7, 3)).astype("u1")
    for ft in range(5):
        data = write_png(img, filter_type=ft)
        assert np.array_equal(parse_png(data), img), ft
        # cross-check the decoder against the independent scalar
        # reference on the actual compressed stream
        import struct as _st

        pos, idat = 8, []
        while pos + 8 <= len(data):
            size = _st.unpack_from(">I", data, pos)[0]
            if data[pos + 4 : pos + 8] == b"IDAT":
                idat.append(data[pos + 8 : pos + 8 + size])
            pos += 12 + size
        raw = zlib.decompress(b"".join(idat))
        ref = np.array(_unfilter_reference(raw, 9, 21, 3), dtype="u1").reshape(9, 7, 3)
        assert np.array_equal(ref, img), ft


def test_png_color_types_and_gates():
    from xarray_dataaccessor_spark.sources.media import parse_png, write_png

    rng = np.random.default_rng(4)
    gray = rng.integers(0, 256, (5, 6)).astype("u1")
    assert np.array_equal(parse_png(write_png(gray, 4)), gray)
    rgba = rng.integers(0, 256, (4, 4, 4)).astype("u1")
    assert np.array_equal(parse_png(write_png(rgba, 2)), rgba)
    with pytest.raises(ValueError, match="PNG"):
        parse_png(b"garbage")


def test_png_adam7_interlace_roundtrip():
    from xarray_dataaccessor_spark.sources.media import parse_png, write_png

    rng = np.random.default_rng(13)
    for shape in [(9, 7, 3), (5, 11), (1, 1), (8, 8, 4), (3, 17), (16, 2)]:
        img = rng.integers(0, 256, shape).astype("u1")
        for ft in (0, 1, 2, 3, 4):
            got = parse_png(write_png(img, filter_type=ft, interlace=True))
            assert np.array_equal(got, img), (shape, ft)


def test_png_spark_decode(spark):
    from xarray_dataaccessor_spark.operators.multimodal import decode_image
    from xarray_dataaccessor_spark.sources.media import parse_png, write_png

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 12, 3)).astype("u1")
    payload = write_png(img, filter_type=4)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id bigint, payload binary"
    )
    out = decode_image(df, out_size=(4, 4), codec="png").collect()[0]
    want = parse_png(payload).astype("float64") @ np.array([0.299, 0.587, 0.114])
    assert out["mean_pixel"] == pytest.approx(float(want.mean()))


def test_gif_animated_roundtrip_and_compositing():
    from xarray_dataaccessor_spark.sources.media import parse_gif, write_gif

    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (16, 3)).astype("u1")
    frames = [pal[rng.integers(0, 16, (10, 12))] for _ in range(4)]
    delays, got = parse_gif(write_gif(frames, [40, 40, 100, 40]))
    assert delays == [40, 40, 100, 40]
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)
    with pytest.raises(ValueError, match="GIF"):
        parse_gif(b"nope")


def test_gif_lzw_property():
    """Hypothesis: any index stream round-trips LZW, including the KwKwK
    case and 12-bit dictionary growth."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xarray_dataaccessor_spark.sources.media import _lzw_decode, _lzw_encode

    @settings(max_examples=100, deadline=None)
    @given(
        idx=st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=600),
    )
    def run(idx):
        assert _lzw_decode(_lzw_encode(idx, 4), 4) == idx

    run()


def test_gif_spark_frame_sampling(spark):
    from xarray_dataaccessor_spark.operators.multimodal import (
        decode_image,
        sample_frames,
    )
    from xarray_dataaccessor_spark.sources.media import write_gif

    pal = np.array([[v, v, v] for v in range(0, 160, 10)], dtype="u1")
    frames = [np.full((6, 6, 3), pal[i], dtype="u1") for i in range(10)]
    payload = write_gif(frames, [500] * 10)  # 10 frames x 0.5 s
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id bigint, payload binary"
    )
    out = sample_frames(df, every_ms=1000, codec="gif").collect()
    # 0.5 s frames, 1 s grid -> frames 0, 2, 4, 6, 8
    assert [r["frame_idx"] for r in out] == [0, 2, 4, 6, 8]
    assert [round(r["mean_luma"]) for r in out] == [0, 20, 40, 60, 80]

    img = decode_image(df, out_size=(3, 3), codec="gif").collect()[0]
    assert img["mean_pixel"] == pytest.approx(0.0)  # first frame is black


def test_gif_gce_scope_is_one_image():
    """A Graphic Control Extension applies only to the next image: a
    frame without its own GCE gets delay 0 and no transparency."""
    import struct as _st

    from xarray_dataaccessor_spark.sources.media import parse_gif, write_gif

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype="u1")
    frames = [pal[np.zeros((3, 3), dtype=int)], pal[np.ones((3, 3), dtype=int)]]
    data = bytearray(write_gif(frames, [250, 250]))
    # strip the SECOND frame's GCE (8 bytes: 21 f9 04 .. .. .. .. 00)
    idx = data.find(b"\x21\xf9", data.find(b"\x21\xf9") + 1)
    del data[idx : idx + 8]
    delays, got = parse_gif(bytes(data))
    assert delays == [250, 0]
    assert np.array_equal(got[1], frames[1])


def test_gif_interlaced_roundtrip():
    from xarray_dataaccessor_spark.sources.media import parse_gif, write_gif

    rng = np.random.default_rng(2)
    for h, w in ((13, 7), (16, 5), (1, 4), (9, 3)):
        img = (rng.integers(0, 6, (h, w, 1)) * 40).astype("u1").repeat(3, axis=2)
        frames = parse_gif(write_gif([img], interlace=True))[1]
        assert np.array_equal(frames[0], img), (h, w)
        # non-interlaced stays identical too
        assert np.array_equal(parse_gif(write_gif([img]))[1][0], img)


def test_gif_corruption_fuzz_bounded():
    """Seeded bit-flip sweep over a valid GIF: every corruption must
    raise a normal error or decode (a corrupt LZW minimum-code-size used
    to allocate a 2^255-entry table; frame data now also stops at the
    declared frame size)."""
    import random

    from xarray_dataaccessor_spark.sources.media import parse_gif, write_gif

    rng0 = np.random.default_rng(0)
    img = (rng0.integers(0, 6, (16, 16, 1)) * 40).astype("u1").repeat(3, axis=2)
    base = write_gif([img])
    rng = random.Random(0)
    for _ in range(150):
        buf = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        try:
            parse_gif(bytes(buf))
        except (ValueError, IndexError, KeyError, NotImplementedError, OverflowError):
            pass
    with pytest.raises(ValueError, match="minimum code size"):
        from xarray_dataaccessor_spark.sources.media import _lzw_decode

        _lzw_decode(b"\x00\x01", 200)


def test_image_probe_rgb_tiff_multivalued_bits():
    """ADVICE r5: an RGB TIFF stores BitsPerSample as count=3 SHORTs whose
    value field is an OFFSET in classic TIFF; SamplesPerPixel (tag 277)
    carries the channel count. Hand-crafted little-endian classic TIFF."""
    import struct

    from xarray_dataaccessor_spark.sources.media import image_probe

    def entry(tag, ftype, count, value):
        return struct.pack("<HHII", tag, ftype, count, value)

    # IFD at offset 8 with 5 entries; BitsPerSample array after the IFD
    n_entries = 5
    ifd_off = 8
    bits_off = ifd_off + 2 + n_entries * 12 + 4
    ifd = struct.pack("<H", n_entries)
    ifd += entry(256, 3, 1, 31)        # ImageWidth
    ifd += entry(257, 3, 1, 17)        # ImageLength
    ifd += entry(258, 3, 3, bits_off)  # BitsPerSample -> offset (3 SHORTs)
    ifd += entry(277, 3, 1, 3)         # SamplesPerPixel
    ifd += entry(259, 3, 1, 1)         # Compression = none
    ifd += struct.pack("<I", 0)        # next IFD
    data = (b"II*\x00" + struct.pack("<I", ifd_off) + ifd
            + struct.pack("<HHH", 8, 8, 8))
    p = image_probe(data)
    assert p == {"fmt": "tiff", "width": 31, "height": 17,
                 "bit_depth": 8, "n_channels": 3}


def test_image_probe_single_band_tiff_via_writer():
    """Single-band float GeoTIFF from our own writer still probes as one
    channel with the declared bit depth."""
    import os
    import tempfile

    from xarray_dataaccessor_spark.sources.geotiff import write_geotiff
    from xarray_dataaccessor_spark.sources.media import image_probe

    arr = np.arange(12, dtype="f4").reshape(3, 4)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "a.tif")
        write_geotiff(path, arr, 0.0, 0.0, (1.0, 1.0))
        with open(path, "rb") as fh:
            p = image_probe(fh.read())
    assert (p["fmt"], p["width"], p["height"], p["n_channels"]) == (
        "tiff", 4, 3, 1)


# ---------------------------------------------------------------------------
# H.264 / MP4 probes (round 8)
# ---------------------------------------------------------------------------
def test_h264_probe_baseline():
    from xarray_dataaccessor_spark.sources.media import (
        h264_probe,
        write_h264_annexb,
    )

    p = h264_probe(write_h264_annexb(5, 64, 48))
    assert p["fmt"] == "h264" and p["profile_idc"] == 66
    assert (p["width"], p["height"]) == (64, 48)
    assert p["n_pictures"] == 5
    assert p["nal_counts"] == {"sps": 1, "pps": 1, "idr": 1, "slice": 4}


def test_h264_probe_high_profile_with_cropping():
    from xarray_dataaccessor_spark.sources.media import (
        h264_probe,
        write_h264_annexb,
    )

    # 1920x1088 coded, bottom-crop 4 chroma units (8 luma rows) -> 1080
    p = h264_probe(
        write_h264_annexb(3, 1920, 1088, profile_idc=100, crop=(0, 0, 0, 4))
    )
    assert (p["width"], p["height"]) == (1920, 1080)
    assert p["profile_idc"] == 100 and p["chroma_format_idc"] == 1
    assert p["n_pictures"] == 3


def test_h264_emulation_prevention_round_trip():
    from xarray_dataaccessor_spark.sources.media import (
        _ebsp_to_rbsp,
        _rbsp_to_ebsp,
    )

    for rbsp in (b"\x00\x00\x01\x02\x00\x00\x00\x03", b"\x00" * 6,
                 b"ab\x00\x00\x02cd", b""):
        assert _ebsp_to_rbsp(_rbsp_to_ebsp(rbsp)) == rbsp
        # and the escaped form never contains a start-code prefix
        esc = _rbsp_to_ebsp(rbsp)
        assert b"\x00\x00\x01" not in esc and b"\x00\x00\x00" not in esc


def test_h264_probe_rejects_garbage():
    from xarray_dataaccessor_spark.sources.media import h264_probe

    with pytest.raises(ValueError, match="start codes"):
        h264_probe(b"\xff" * 64)
    with pytest.raises(ValueError, match="SPS"):
        h264_probe(b"\x00\x00\x01" + bytes([0x61]) + b"\x12" * 8)


def test_mp4_probe_avc_track():
    from xarray_dataaccessor_spark.sources.media import (
        mp4_probe,
        write_mp4_avc,
    )

    m = mp4_probe(write_mp4_avc(128, 96, duration_ms=3500))
    assert m["brand"] == "isom" and m["duration_ms"] == 3500
    t = m["tracks"][0]
    assert t["codec"] == "avc1"
    assert (t["width"], t["height"]) == (128, 96)
    assert (t["sps"]["width"], t["sps"]["height"]) == (128, 96)


def test_mp4_probe_rejects_non_bmff():
    from xarray_dataaccessor_spark.sources.media import mp4_probe

    with pytest.raises(ValueError, match="ftyp"):
        mp4_probe(b"RIFF" + b"\x00" * 64)


def test_aac_adts_probe():
    from xarray_dataaccessor_spark.sources.media import (
        aac_adts_probe,
        write_adts_frames,
    )

    p = aac_adts_probe(write_adts_frames(20, rate=48000, channels=2))
    assert p["fmt"] == "aac" and p["n_frames"] == 20
    assert p["sample_rate"] == 48000 and p["channels"] == 2
    assert p["duration_ms"] == round(20 * 1024 * 1000 / 48000)
    mono = aac_adts_probe(write_adts_frames(5, rate=22050, channels=1))
    assert mono["channels"] == 1 and mono["sample_rate"] == 22050
    with pytest.raises(ValueError, match="ADTS"):
        aac_adts_probe(b"\x12" * 100)


def test_webm_probe():
    from xarray_dataaccessor_spark.sources.media import (
        webm_probe,
        write_webm,
    )

    p = webm_probe(write_webm(1280, 720, duration_ms=4200, codec="V_VP9"))
    assert p["doctype"] == "webm" and p["duration_ms"] == 4200
    assert p["tracks"][0] == {"type": "video", "codec": "V_VP9",
                              "width": 1280, "height": 720}
    with pytest.raises(ValueError, match="EBML"):
        webm_probe(b"\x00" * 32)
    # truncated element must raise, not loop or overrun
    good = write_webm()
    with pytest.raises(ValueError, match="EBML"):
        webm_probe(good[: len(good) // 2])


def test_ogg_opus_probe():
    from xarray_dataaccessor_spark.sources.media import (
        ogg_probe,
        write_ogg_opus,
    )

    p = ogg_probe(write_ogg_opus(duration_ms=3000, channels=1,
                                 input_rate=16000, pre_skip=100))
    assert p["codec"] == "opus" and p["channels"] == 1
    assert p["sample_rate"] == 16000  # the informational input rate
    assert p["duration_ms"] == 3000   # granules still run at 48 kHz
    with pytest.raises(ValueError, match="OggS"):
        ogg_probe(b"\x00" * 32)


# ---------------------------------------------------------------------------
# H.264 PPS + slice-type walk (round 10)
# ---------------------------------------------------------------------------
def test_h264_pps_and_slice_type_walk():
    from xarray_dataaccessor_spark.sources.media import (
        h264_probe, write_h264_annexb,
    )

    p = h264_probe(write_h264_annexb(n_frames=7))
    # fixture cadence: I at pictures 0, 3, 6 — P elsewhere
    assert p["slice_type_counts"] == {"I": 3, "P": 4}
    assert p["n_i_slices"] == 3 and p["n_pictures"] == 7
    assert p["keyframe_ratio"] == 3 / 7
    # PPS fields (the fixture PPS is CAVLC, qp 26, no weighted pred)
    assert p["entropy_coding"] == "cavlc"
    assert p["pic_init_qp"] == 26
    assert p["weighted_pred"] is False


def test_h264_pps_fmo_gate_and_slice_range():
    import pytest

    from xarray_dataaccessor_spark.sources.media import (
        _parse_h264_pps, _parse_h264_slice_prefix, _MsbBitsW,
    )

    def ue_bits(w, v):
        n = v + 1
        lz = n.bit_length() - 1
        w.write(0, lz)
        w.write(n, lz + 1)

    # FMO: num_slice_groups_minus1 = 1 -> gated
    w = _MsbBitsW()
    ue_bits(w, 0); ue_bits(w, 0)      # pps_id, sps_id
    w.write(0, 1); w.write(0, 1)      # cavlc, no pic_order
    ue_bits(w, 1)                     # num_slice_groups_minus1 = 1
    with pytest.raises(NotImplementedError, match="FMO"):
        _parse_h264_pps(w.bytes())
    # slice_type out of range rejected
    w2 = _MsbBitsW()
    ue_bits(w2, 0)                    # first_mb
    ue_bits(w2, 12)                   # slice_type 12 > 9
    w2.write(1, 1)
    with pytest.raises(ValueError, match="slice_type"):
        _parse_h264_slice_prefix(w2.bytes())
    # all-slices-same variant decodes to the base type
    w3 = _MsbBitsW()
    ue_bits(w3, 0)
    ue_bits(w3, 6)                    # 6 -> B, all_slices_same
    w3.write(1, 1)
    sl = _parse_h264_slice_prefix(w3.bytes())
    assert sl["slice_type"] == "B" and sl["all_slices_same"]
