"""Real BMP/WAV codec path: decode, features, resize, frames, probe.

Pure-stdlib decoders (operators/media_codecs.py) + the sniffing
dispatch in operators/multimodal.py. The fake path stays pinned for
non-BMP/WAV payloads.
"""

import io
import math
import struct
import wave

import pytest
from pyspark.sql import functions as F

from gluestick_ts_spark.operators.media_codecs import (
    bmp_decode,
    bmp_encode,
    bmp_features,
    bmp_resize,
    sniff_format,
    wav_decode,
    wav_features,
    wav_frames,
)
from gluestick_ts_spark.operators.multimodal import (
    attach_media_metadata,
    extract_media_features,
    fake_decode_features,
    probe_media_metadata,
    real_decode_features,
    resize_media,
    sample_frames,
)


def make_bmp(width=4, height=2, color=(255, 0, 0)):
    return bmp_encode(width, height, [color] * (width * height))


def make_wav(freq=440.0, seconds=0.05, rate=8000, amp=0.5):
    n = int(rate * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            struct.pack(
                f"<{n}h",
                *[int(amp * 32767 * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)],
            )
        )
    return buf.getvalue()


def test_sniff_format():
    assert sniff_format(make_bmp()) == "bmp"
    assert sniff_format(make_wav()) == "wav"
    assert sniff_format(b"plain text payload") is None
    assert sniff_format(None) is None
    assert sniff_format(b"BM") is None  # too short


def test_bmp_roundtrip_and_features():
    # encode -> decode roundtrip preserves pixels
    pixels = [(r * 40 % 256, r * 7 % 256, 200) for r in range(12)]
    payload = bmp_encode(4, 3, pixels)
    w, h, got = bmp_decode(payload)
    assert (w, h) == (4, 3)
    assert got == pixels

    # pure-red image: real channel statistics, not byte stats
    red = make_bmp(4, 2, (255, 0, 0))
    feats = bmp_features(red, 8)
    assert feats[0] == pytest.approx(1.0)      # mean r / 255
    assert feats[1] == 0.0 and feats[2] == 0.0  # g, b
    assert feats[3] == pytest.approx(0.299)     # luma of pure red
    assert feats[4] == pytest.approx(0.0)       # uniform -> zero stddev
    assert feats[5] == pytest.approx(4 / 4096.0)
    assert feats[6] == pytest.approx(2 / 4096.0)
    # the labeled fake gives a DIFFERENT answer (byte histogram)
    assert fake_decode_features(red, 8) != feats


def test_bmp_decode_rejects_garbage():
    with pytest.raises(ValueError):
        bmp_decode(b"BM" + b"\x00" * 60)  # degenerate dims
    with pytest.raises(ValueError):
        bmp_decode(make_bmp()[:30])  # truncated header
    # RLE-compressed flag -> unsupported
    bad = bytearray(make_bmp())
    struct.pack_into("<I", bad, 30, 1)
    with pytest.raises(ValueError):
        bmp_decode(bytes(bad))


def test_bmp_resize_real():
    # 2x2 checkerboard upscaled to 4x4: nearest-neighbor quadrants
    px = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    payload = bmp_encode(2, 2, px)
    out = bmp_resize(payload, 4, 4)
    w, h, got = bmp_decode(out)
    assert (w, h) == (4, 4)
    assert got[0] == (255, 0, 0) and got[3] == (0, 255, 0)
    assert got[12] == (0, 0, 255) and got[15] == (255, 255, 255)


def test_wav_decode_and_features():
    payload = make_wav(freq=440.0, seconds=0.05, rate=8000, amp=0.5)
    rate, nch, nframes, samples = wav_decode(payload)
    assert (rate, nch, nframes) == (8000, 1, 400)
    # sine at amplitude 0.5: RMS = amp/sqrt(2), mean|x| = 2*amp/pi
    feats = wav_features(payload, 8)
    assert feats[0] == pytest.approx(0.5 / math.sqrt(2), rel=0.02)
    assert feats[1] == pytest.approx(2 * 0.5 / math.pi, rel=0.02)
    assert feats[2] == pytest.approx(0.5, rel=0.02)
    # 440 Hz sine -> 2*440 zero crossings/s -> zcr = 880/8000
    assert feats[3] == pytest.approx(880 / 8000, rel=0.05)
    assert feats[5] == pytest.approx(8000 / 48000.0)
    with pytest.raises(ValueError):
        wav_decode(b"RIFF\x00\x00\x00\x00WAVEjunk")


def test_wav_frames_are_valid_wavs():
    payload = make_wav(seconds=0.1, rate=8000)
    frames = wav_frames(payload, 4)
    assert len(frames) == 4
    total = 0
    for fr in frames:
        rate, nch, nframes, _ = wav_decode(fr)  # each frame decodable
        assert (rate, nch) == (8000, 1)
        total += nframes
    assert total == 800  # no samples lost


def test_real_decode_features_dispatch():
    bmp, wav_p, other = make_bmp(), make_wav(), b"not media at all"
    assert real_decode_features(bmp, 8) == bmp_features(bmp, 8)
    assert real_decode_features(wav_p, 8) == wav_features(wav_p, 8)
    assert real_decode_features(other, 8) == fake_decode_features(other, 8)
    # sniffs as BMP but truncated -> falls back to fake, never raises
    broken = bmp[:40]
    assert real_decode_features(broken, 8) == fake_decode_features(broken, 8)


def test_decode_provenance_labels(spark):
    """In a mixed corpus real and fake feature vectors are numerically
    indistinguishable — the `decoder` column is the audit trail. BMP and
    WAV payloads must report their real decode, everything else `fake`,
    a caller-supplied decoder `custom`."""
    from gluestick_ts_spark.operators.multimodal import (
        decode_features_with_provenance,
        resize_media,
        sample_frames,
    )

    bmp, wav_p, other = make_bmp(), make_wav(), b"not media at all"
    assert decode_features_with_provenance(bmp, 8)[1] == "bmp"
    assert decode_features_with_provenance(wav_p, 8)[1] == "wav"
    assert decode_features_with_provenance(other, 8)[1] == "fake"
    assert decode_features_with_provenance(bmp[:40], 8)[1] == "fake"  # truncated

    df = spark.createDataFrame(
        [(1, bmp), (2, wav_p), (3, other)], "id long, content binary"
    )
    out = {r.id: r.decoder for r in extract_media_features(df, n_features=8).collect()}
    assert out == {1: "bmp", 2: "wav", 3: "fake"}

    custom = extract_media_features(df, decode_fn=lambda b: [0.0], n_features=1)
    assert {r.decoder for r in custom.collect()} == {"custom"}

    no_prov = extract_media_features(df, n_features=8, provenance_col=None)
    assert "decoder" not in no_prov.columns

    rz = {
        r.id: r.resizer
        for r in resize_media(df, width=2, height=2, provenance_col="resizer").collect()
    }
    assert rz == {1: "bmp", 2: "fake", 3: "fake"}

    fr = sample_frames(df, n_frames=2, provenance_col="sampler").collect()
    labels = {(r.id, r.sampler) for r in fr}
    assert labels == {(1, "fake"), (2, "wav"), (3, "fake")}


def test_spark_pipeline_mixed_formats(spark):
    """End-to-end over mapInPandas: a mixed BMP/WAV/other corpus gets
    real features for real formats, fake for the rest, in one job."""
    rows = [
        (1, make_bmp(4, 2, (255, 0, 0))),
        (2, make_wav()),
        (3, b"opaque blob payload"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    df = attach_media_metadata(df, media_type="unknown", fmt="bin")
    out = {r.id: r for r in extract_media_features(df, n_features=8).collect()}
    assert out[1].features[0] == pytest.approx(1.0)  # red BMP, real decode
    assert out[2].features[0] == pytest.approx(0.5 / math.sqrt(2), rel=0.02)
    assert list(out[3].features) == pytest.approx(
        fake_decode_features(b"opaque blob payload", 8)
    )

    # probe fills real metadata per format; opaque rows keep theirs
    probed = {r.id: r.media_meta for r in probe_media_metadata(df).collect()}
    assert probed[1].asDict()["format"] == "bmp"
    assert (probed[1].width, probed[1].height) == (4, 2)
    assert probed[2].asDict()["format"] == "wav"
    assert probed[2].duration_ms == 50
    assert probed[3].asDict()["format"] == "bin"

    # real BMP resize through the DataFrame op: output is a valid BMP
    resized = {r.id: r for r in resize_media(df, width=2, height=2).collect()}
    w, h, _ = bmp_decode(bytes(resized[1].content))
    assert (w, h) == (2, 2)
    assert resized[1].media_meta.width == 2

    # WAV frame sampling through the DataFrame op: valid sub-WAVs
    wav_only = spark.createDataFrame([(2, make_wav())], "id long, content binary")
    frames = sample_frames(wav_only, n_frames=3).collect()
    assert len(frames) == 3
    for r in frames:
        rate, _, _, _ = wav_decode(bytes(r.frame))
        assert rate == 8000


def _rand_pixels(w, h, seed=7):
    import random
    rng = random.Random(seed)
    return [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]


def test_png_roundtrip_and_sniff():
    from gluestick_ts_spark.operators.media_codecs import (
        png_decode, png_encode, sniff_format)

    px = _rand_pixels(6, 4)
    b = png_encode(6, 4, px)
    assert sniff_format(b) == "png"
    assert png_decode(b) == (6, 4, px)


def test_png_decode_all_filter_types():
    """Decode scanlines filtered with Sub/Up/Average/Paeth built by an
    independent forward-filter implementation (the spec's equations),
    so un-filtering is verified against ground truth, not against our
    own encoder (which always emits filter 0)."""
    import struct
    import zlib

    from gluestick_ts_spark.operators.media_codecs import _paeth, png_decode

    w, h, ch = 5, 4, 3
    px = _rand_pixels(w, h, seed=13)
    rows = [
        b"".join(bytes(px[r * w + c]) for c in range(w)) for r in range(h)
    ]
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for r, ftype in zip(range(h), (1, 2, 3, 4)):
        line = rows[r]
        raw.append(ftype)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, ul)
            raw.append((line[i] - pred) & 0xFF)
        prev = line

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert png_decode(payload) == (w, h, px)


def test_png_gray_and_rgba_decode():
    import struct
    import zlib

    from gluestick_ts_spark.operators.media_codecs import png_decode

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    def make(color, ch, body_px):
        raw = bytearray()
        w = 2
        for r in range(2):
            raw.append(0)
            raw += bytes(body_px[r * w * ch : (r + 1) * w * ch])
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    gray = make(0, 1, [10, 20, 30, 40])
    assert png_decode(gray) == (
        2, 2, [(10, 10, 10), (20, 20, 20), (30, 30, 30), (40, 40, 40)])
    rgba = make(6, 4, [1, 2, 3, 255, 4, 5, 6, 0, 7, 8, 9, 128, 10, 11, 12, 64])
    assert png_decode(rgba) == (2, 2, [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)])


def test_png_resize_and_dispatch_labels():
    from gluestick_ts_spark.operators.media_codecs import (
        png_decode, png_encode, png_resize)
    from gluestick_ts_spark.operators.multimodal import decode_features_with_provenance

    px = _rand_pixels(8, 8)
    b = png_encode(8, 8, px)
    small = png_resize(b, 4, 4)
    w, h, spx = png_decode(small)
    assert (w, h) == (4, 4)
    assert spx[0] == px[0]  # nearest-neighbor keeps the top-left texel
    feats, label = decode_features_with_provenance(b, 8)
    assert label == "png"
    assert abs(feats[5] * 4096 - 8) < 1e-9  # real width flowed through


# -- JPEG (round 10) ----------------------------------------------------------

def _grad16():
    return [
        ((x * 255) // 15, (y * 255) // 15, ((x + y) * 255) // 30)
        for y in range(16)
        for x in range(16)
    ]


def test_jpeg_roundtrip_and_sniff():
    """Baseline JPEG encode -> decode round-trips within quantization
    error on smooth images, for 4:4:4, 4:2:0, grayscale, odd
    dimensions, and restart markers; sniff_format recognizes it."""
    from gluestick_ts_spark.operators.media_codecs import (
        jpeg_decode,
        jpeg_encode,
        sniff_format,
    )

    def mae(a, b):
        return sum(
            abs(x - y) for pa, pb in zip(a, b) for x, y in zip(pa, pb)
        ) / (3 * len(a))

    px = _grad16()
    for kwargs, tol in [
        ({}, 3),
        ({"subsampling": "420"}, 6),
        ({"restart_interval": 1}, 3),
        ({"subsampling": "420", "restart_interval": 2}, 6),
    ]:
        enc = jpeg_encode(16, 16, px, **kwargs)
        assert sniff_format(enc) == "jpeg"
        w, h, dec = jpeg_decode(enc)
        assert (w, h) == (16, 16)
        assert mae(px, dec) < tol, (kwargs, mae(px, dec))
    # grayscale: compare against the luma image (chroma drops by design)
    gray = [( (299*r + 587*g + 114*b) // 1000,) * 3 for r, g, b in px]
    enc = jpeg_encode(16, 16, px, grayscale=True)
    w, h, dec = jpeg_decode(enc)
    assert all(r == g == b for r, g, b in dec)
    assert mae(gray, dec) < 4, mae(gray, dec)
    # odd dimensions (edge-replicated padding blocks)
    podd = [((x * 37) % 256, (y * 59) % 256, 77) for y in range(13) for x in range(17)]
    for sub in ("444", "420"):
        w, h, dec = jpeg_decode(jpeg_encode(17, 13, podd, subsampling=sub))
        assert (w, h) == (17, 13) and len(dec) == 17 * 13


def test_jpeg_decode_pinned_fixture():
    """The decode is a PLATFORM-EXACT pure function of the bytes
    (fixed-point integer IDCT, embedded basis table): both the encoded
    stream and the decoded pixel plane are pinned by digest, so any
    codec drift — however small — fails here before it can silently
    move the literal-embedded dhash oracles."""
    import hashlib

    from gluestick_ts_spark.operators.media_codecs import jpeg_decode, jpeg_encode

    px = _grad16()
    enc = jpeg_encode(16, 16, px)
    assert hashlib.md5(enc).hexdigest() == "155a63b7c071d2db20c493600a41f7f3"
    w, h, dec = jpeg_decode(enc)
    flat = bytes(v for p in dec for v in p)
    assert hashlib.md5(flat).hexdigest() == "1b910e6ccb0959f9e53812b46ae75891"
    enc420 = jpeg_encode(16, 16, px, subsampling="420", restart_interval=1)
    assert hashlib.md5(enc420).hexdigest() == "cb826e58c3301a374cf12f0827c6d9d4"
    flat2 = bytes(v for p in jpeg_decode(enc420)[2] for v in p)
    assert hashlib.md5(flat2).hexdigest() == "30df79741fc4b34dda46d994cbca34b8"


def test_jpeg_features_resize_and_errors():
    """jpeg_features shares the pixel-statistics contract; jpeg_resize
    emits a valid decodable JPEG at the target size; out-of-scope and
    malformed payloads raise ValueError (callers fall to the fake
    path)."""
    import pytest

    from gluestick_ts_spark.operators.media_codecs import (
        bmp_encode,
        jpeg_decode,
        jpeg_encode,
        jpeg_features,
        jpeg_resize,
        sniff_format,
    )

    enc = jpeg_encode(16, 16, _grad16())
    feats = jpeg_features(enc, 8)
    assert len(feats) == 8 and 0.0 < feats[3] < 1.0  # luma mean plausible
    small = jpeg_resize(enc, 4, 4)
    assert sniff_format(small) == "jpeg"
    w, h, _ = jpeg_decode(small)
    assert (w, h) == (4, 4)
    with pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8\xff\xe0 truncated")
    with pytest.raises(ValueError):
        jpeg_decode(bmp_encode(2, 2, [(0, 0, 0)] * 4))
    # a BASELINE stream whose SOF marker is forged to SOF2 is a corrupt
    # progressive file (its interleaved Ss=0..Se=63 scan is illegal in
    # progressive mode) — refuse, never return garbage
    prog = bytearray(jpeg_encode(16, 16, _grad16()))
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        jpeg_decode(bytes(prog))
    # round-10 review fixes: truncated-inside-a-segment payloads raise
    # ValueError (not struct.error), forged huge headers refuse before
    # allocating, and a non-interleaved multi-scan SOS refuses instead
    # of silently returning color-shifted pixels
    import struct as _struct

    whole = jpeg_encode(16, 16, _grad16())
    with pytest.raises(ValueError):
        jpeg_decode(whole[: whole.find(b"\xff\xc0") + 5])
    bomb = (b"\xff\xd8\xff\xc0" + _struct.pack(">H", 11) + bytes([8])
            + _struct.pack(">HH", 30000, 30000) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="too large|capacity"):
        jpeg_decode(bomb)
    multi = bytearray(whole)
    sos = multi.find(b"\xff\xda")
    # rewrite SOS to claim a single-component scan of the 3-comp frame
    multi[sos + 4] = 1
    with pytest.raises(ValueError, match="non-interleaved"):
        jpeg_decode(bytes(multi[: sos + 2 + 8]) + b"\x00\x3f\x00")


def test_jpeg_progressive_decodes_identical_to_baseline():
    """Round 11: a progressive (SOF2) stream decodes to EXACTLY the
    pixels of its baseline twin — the encoder quantizes once and the
    scan script (DC first/refine at Al=1->0, spectral-band AC first
    scans with EOBRUN, AC refinement) transmits the same coefficients.
    Pinned digests: progressive streams are platform-exact pure
    functions too, and their decode digests EQUAL the baseline decode
    pins, so any progressive-path drift fails loudly here."""
    import hashlib

    import pytest

    from gluestick_ts_spark.operators.media_codecs import jpeg_decode, jpeg_encode

    px = _grad16()
    prog = jpeg_encode(16, 16, px, progressive=True)
    assert hashlib.md5(prog).hexdigest() == "25872b19b100c6213dcb11938582d29a"
    w, h, dec = jpeg_decode(prog)
    assert (w, h) == (16, 16)
    flat = bytes(v for p in dec for v in p)
    # == test_jpeg_decode_pinned_fixture's BASELINE decode digest
    assert hashlib.md5(flat).hexdigest() == "1b910e6ccb0959f9e53812b46ae75891"
    assert dec == jpeg_decode(jpeg_encode(16, 16, px))[2]

    # subsampling + restart markers ride the progressive scans too
    prog420 = jpeg_encode(
        16, 16, px, subsampling="420", restart_interval=1, progressive=True
    )
    assert hashlib.md5(prog420).hexdigest() == "b99c3c025dc79cc6c005d78fa6404d0d"
    flat2 = bytes(v for p in jpeg_decode(prog420)[2] for v in p)
    assert hashlib.md5(flat2).hexdigest() == "30df79741fc4b34dda46d994cbca34b8"

    # grayscale + odd dims (edge-replicated padding blocks, 5-scan script)
    podd = [((x * 37) % 256, (x * 37) % 256, (x * 37) % 256)
            for _y in range(13) for x in range(17)]
    for gray in (False, True):
        pb = jpeg_decode(jpeg_encode(17, 13, podd, grayscale=gray))
        pp = jpeg_decode(jpeg_encode(17, 13, podd, grayscale=gray, progressive=True))
        assert pb == pp

    # truncated-anywhere progressive payloads honor the ok-or-ValueError
    # contract (never a task-killing raw exception; a cut between scans
    # legally decodes from the scans received — the format's feature)
    for cut in (len(prog) // 4, len(prog) // 2, len(prog) - 3):
        try:
            jpeg_decode(prog[:cut] + b"\xff\xd9")
        except ValueError:
            pass


def test_jpeg_progressive_cross_block_eob_runs():
    """The encoder emits TRUE cross-block EOB runs (the libjpeg
    protocol real crawl streams use), not one EOB per block — and the
    decoder walks them: (1) an 8-block all-zero tail costs ONE
    (r<<4)-coded run symbol; (2) refinement correction bits buffer
    ACROSS the covered blocks and replay positionally."""
    from gluestick_ts_spark.operators.jpeg_codec import (
        _ENC_AC_PROG_BITS,
        _ENC_AC_PROG_VALUES,
        _BitReader,
        _BitWriter,
        _EobState,
        _build_huff,
        _dec_ac_first,
        _dec_ac_refine,
        _enc_ac_first_block,
        _enc_ac_refine_block,
        _flush_eobrun,
    )

    table = _build_huff(_ENC_AC_PROG_BITS, _ENC_AC_PROG_VALUES)

    # (1) first scan: block 0 has one coefficient, blocks 1..8 all zero
    blocks = [[0] * 64 for _ in range(9)]
    blocks[0][5] = 12
    w = _BitWriter()
    st = _EobState()
    for b in blocks:
        _enc_ac_first_block(w, b, 1, 63, 0, st)
    _flush_eobrun(w, st)
    w.flush()
    # _BitReader expects an UNSTUFFED entropy segment; the writer
    # byte-stuffs 0xFF -> 0xFF00, so unstuff like the real scan path
    data = bytes(w.out).replace(b"\xff\x00", b"\xff")
    rd = _BitReader(data)
    out = [[0] * 64 for _ in range(9)]
    eobrun = 0
    for b in out:
        eobrun = _dec_ac_first(rd, table, b, 1, 63, 0, eobrun)
    assert out == blocks
    # one (run,size) symbol + amplitude + ONE multi-block EOBRUN symbol
    # — nine per-block EOBs would cost ~9 more bytes
    assert len(data) <= 4, (len(data), data.hex())

    # (2) two-scan successive approximation with refinement corrections
    # buffered through a multi-block EOB run: block 1 carries ONLY a
    # correction (|2| -> bit 0) and block 3 only zeros, so both join
    # the run; block 2 goes newly significant mid-run, flushing it
    final = [[0] * 64 for _ in range(4)]
    final[0][1], final[0][9] = 5, -3
    final[1][7] = 2          # correction-only block inside the run
    final[2][4] = -1         # newly significant at Al=0
    w1, s1 = _BitWriter(), _EobState()
    for b in final:
        _enc_ac_first_block(w1, b, 1, 63, 1, s1)  # first scan at Al=1
    _flush_eobrun(w1, s1)
    w1.flush()
    w2, s2 = _BitWriter(), _EobState()
    for b in final:
        _enc_ac_refine_block(w2, b, 1, 63, 0, s2)  # refine to Al=0
    _flush_eobrun(w2, s2)
    w2.flush()
    rec = [[0] * 64 for _ in range(4)]
    unstuff = lambda ba: bytes(ba).replace(b"\xff\x00", b"\xff")  # noqa: E731
    rd1, eob1 = _BitReader(unstuff(w1.out)), 0
    for b in rec:
        eob1 = _dec_ac_first(rd1, table, b, 1, 63, 1, eob1)
    rd2, eob2 = _BitReader(unstuff(w2.out)), 0
    for b in rec:
        eob2 = _dec_ac_refine(rd2, table, b, 1, 63, 0, eob2)
    assert rec == final


def test_jpeg_progressive_corruption_never_escapes_valueerror():
    """The Arrow-boundary safety contract on the NEW progressive paths:
    a seeded battery of single-byte corruptions over a valid
    progressive stream must either still decode or raise ValueError —
    never a raw struct/Index/numpy error that would kill a whole Spark
    task on one corrupt crawl payload."""
    import random

    import pytest

    from gluestick_ts_spark.operators.media_codecs import jpeg_decode, jpeg_encode

    prog = jpeg_encode(
        16, 16, _grad16(), subsampling="420", restart_interval=1,
        progressive=True, exif_orientation=6,
    )
    rng = random.Random(11)
    outcomes = {"ok": 0, "valueerror": 0}
    for _ in range(300):
        b = bytearray(prog)
        i = rng.randrange(2, len(b))  # keep the SOI magic intact
        b[i] ^= 1 << rng.randrange(8)
        try:
            jpeg_decode(bytes(b))
            outcomes["ok"] += 1
        except ValueError:
            outcomes["valueerror"] += 1
        # anything else propagates and fails the test
    assert outcomes["ok"] + outcomes["valueerror"] == 300
    # truncations at every 37th byte: same ok-or-ValueError contract.
    # (A progressive stream truncated between scans legitimately
    # decodes from the scans already received — the format's defining
    # feature; header/mid-segment truncations raise.)
    raised = 0
    for cut in range(4, len(prog), 37):
        try:
            jpeg_decode(prog[:cut])
        except ValueError:
            raised += 1
    assert raised > 0  # header-region cuts must refuse
    with pytest.raises(ValueError):
        jpeg_decode(prog[:16])  # inside the APP headers


def test_jpeg_exif_orientation_normalizes_upright():
    """Round 11: the decoded pixel plane is normalized by the EXIF
    orientation tag — all 8 orientations of the same source decode to
    upright dims with only lossy-bound error vs the upright twin (a
    rotated phone re-upload must hash WITH its original, not apart).
    Malformed EXIF bodies are ignored (orientation is a hint)."""
    import numpy as np

    from gluestick_ts_spark.operators.media_codecs import jpeg_decode, jpeg_encode

    w, h = 12, 8
    px = [((x * 31) % 256, (y * 41) % 256, (x + y * 3) % 256)
          for y in range(h) for x in range(w)]
    arr = np.array(
        jpeg_decode(jpeg_encode(w, h, px))[2], dtype=np.int64
    ).reshape(h, w, 3)
    # stored = the inverse transform of each orientation (what a camera
    # writes), so the decoder's normalization must return the upright
    inv = {
        1: lambda a: a,
        2: lambda a: a[:, ::-1],
        3: lambda a: a[::-1, ::-1],
        4: lambda a: a[::-1, :],
        5: lambda a: a.transpose(1, 0, 2),
        6: lambda a: np.rot90(a, 1),
        7: lambda a: np.rot90(a.transpose(1, 0, 2), 2),
        8: lambda a: np.rot90(a, -1),
    }
    for o, f in inv.items():
        stored = np.ascontiguousarray(f(arr))
        sh, sw = stored.shape[0], stored.shape[1]
        pay = jpeg_encode(
            sw, sh,
            [tuple(p) for p in stored.reshape(sh * sw, 3).tolist()],
            exif_orientation=o,
        )
        dw, dh, dec = jpeg_decode(pay)
        assert (dw, dh) == (w, h), (o, dw, dh)
        err = np.abs(
            np.array(dec, dtype=np.int64).reshape(dh, dw, 3) - arr
        ).max()
        assert err <= 10, (o, err)  # double-quantization lossy bound

    # progressive + EXIF compose
    stored = np.ascontiguousarray(np.rot90(arr, 1))
    sh, sw = stored.shape[0], stored.shape[1]
    pay = jpeg_encode(
        sw, sh,
        [tuple(p) for p in stored.reshape(sh * sw, 3).tolist()],
        exif_orientation=6, progressive=True,
    )
    dw, dh, dec = jpeg_decode(pay)
    assert (dw, dh) == (w, h)
    err = np.abs(np.array(dec, dtype=np.int64).reshape(dh, dw, 3) - arr).max()
    assert err <= 10, err

    # malformed EXIF bodies are ignored, not fatal
    base = bytearray(jpeg_encode(w, h, px, exif_orientation=3))
    app1 = base.find(b"\xff\xe1")
    base[app1 + 10 : app1 + 14] = b"\xff\xff\xff\xff"  # corrupt IFD offset
    dw, dh, _ = jpeg_decode(bytes(base))
    assert (dw, dh) == (w, h)


def test_avi_mjpeg_roundtrip_probe_sampler_and_errors():
    """Round 11: MJPEG-in-AVI — REAL video. Deterministic container
    writer (digest-pinned), header-only probe, frame decode equal to
    standalone JPEG decode of the same pixels (baseline AND progressive
    MJPEG), bounded sampling, the ValueError-only corruption contract."""
    import hashlib
    import random

    import pytest

    from gluestick_ts_spark.operators.media_codecs import (
        avi_decode_frames,
        avi_encode,
        avi_frames,
        avi_probe,
        jpeg_decode,
        jpeg_encode,
        sniff_format,
    )

    def frame(i):
        return [((i * 31 + x * 29) % 256, (i * 7 + y * 43) % 256,
                 (x * y + i) % 256) for y in range(8) for x in range(8)]

    frames = [frame(i) for i in range(3)]
    avi = avi_encode(8, 8, frames, fps=5)
    assert hashlib.md5(avi).hexdigest() == "f6a3a6ff1b6d2bd08627bb887a6ead5b"
    assert sniff_format(avi) == "avi"
    assert avi_probe(avi) == (8, 8, 3, 5)

    w, h, dec = avi_decode_frames(avi)
    assert (w, h, len(dec)) == (8, 8, 3)
    for i in range(3):
        assert dec[i] == jpeg_decode(jpeg_encode(8, 8, frames[i]))[2], i
    # bounded decode: parsing stops after max_frames
    assert avi_decode_frames(avi, max_frames=2)[2] == dec[:2]
    # the sampler is a pure demux: embedded standalone JPEGs
    fs = avi_frames(avi, 2)
    assert len(fs) == 2 and all(f[:3] == b"\xff\xd8\xff" for f in fs)
    assert jpeg_decode(fs[1])[2] == dec[1]
    # progressive MJPEG rides the SOF2 decoder
    assert avi_decode_frames(
        avi_encode(8, 8, frames, fps=5, progressive=True)
    )[2] == dec

    # error contract: non-AVI RIFFs, garbage, header truncation
    for bad in (b"RIFF1234AVI ", b"RIFFxxxxWAVEdata", b"", avi[:40]):
        with pytest.raises(ValueError):
            avi_decode_frames(bad)
    with pytest.raises(ValueError):
        avi_frames(avi, 0)
    # seeded single-byte corruption battery: decode-or-ValueError only
    rng = random.Random(7)
    for _ in range(200):
        b = bytearray(avi)
        b[rng.randrange(4, len(b))] ^= 1 << rng.randrange(8)
        try:
            avi_decode_frames(bytes(b))
        except ValueError:
            pass


def test_avi_spark_pipeline_probe_features_frames(spark):
    """The Spark-side video path end-to-end: the metadata probe fills
    media_type='video' + real dims/duration from the container headers,
    the feature extractor labels decoder='avi' (first-frame pixel
    stats), and sample_frames emits REAL decodable JPEG frames labeled
    'avi' — the byte-chunk fake no longer touches MJPEG video."""
    from pyspark.sql import functions as F

    from gluestick_ts_spark.operators.media_codecs import (
        avi_encode,
        jpeg_decode,
    )
    from gluestick_ts_spark.operators.multimodal import (
        attach_media_metadata,
        extract_media_features,
        probe_media_metadata,
        sample_frames,
    )

    def frame(i):
        return [((i * 31 + x * 29) % 256, (i * 7 + y * 43) % 256,
                 (x * y + i) % 256) for y in range(8) for x in range(8)]

    avi = avi_encode(8, 8, [frame(0), frame(1)], fps=4)
    df = spark.createDataFrame([(1, avi), (2, b"not media")],
                               "doc_id long, content binary")
    meta = {
        r.doc_id: r.media_meta
        for r in probe_media_metadata(
            attach_media_metadata(df, media_type="video", fmt="bin")
        ).collect()
    }
    assert meta[1]["media_type"] == "video" and meta[1]["format"] == "avi"
    assert (meta[1]["width"], meta[1]["height"]) == (8, 8)
    assert meta[1]["duration_ms"] == 2 * 1000 // 4
    assert meta[2]["format"] == "bin"  # unsniffable keeps caller metadata

    feats = {
        r.doc_id: r.decoder
        for r in extract_media_features(df, n_features=8).collect()
    }
    assert feats == {1: "avi", 2: "fake"}

    rows = sample_frames(
        df, n_frames=2, provenance_col="sampler"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.sampler for r in by_doc[1]] == ["avi", "avi"]
    w, h, px = jpeg_decode(by_doc[1][1].frame)
    assert (w, h) == (8, 8) and len(px) == 64
    assert all(r.sampler == "fake" for r in by_doc[2])


# -- GIF (round 10) -----------------------------------------------------------

def test_gif_roundtrip_lossless_and_sniff():
    """GIF encode -> decode is LOSSLESS (palette format), including
    streams long enough to force LZW code-width growth and CLEAR
    resets; sniff_format recognizes both versions; >256 colors and
    malformed payloads raise."""
    import pytest

    from gluestick_ts_spark.operators.media_codecs import (
        gif_decode,
        gif_encode,
        sniff_format,
    )

    colors = [(i * 37 % 256, i * 59 % 256, i * 83 % 256) for i in range(256)]
    px = [colors[(x * 7 + y * 13) % 256] for y in range(80) for x in range(100)]
    enc = gif_encode(100, 80, px)
    assert sniff_format(enc) == "gif"
    assert gif_decode(enc) == (100, 80, px)  # bit-exact, 8000 px > 4094 codes
    small = gif_encode(3, 2, [(0, 0, 0)] * 5 + [(255, 255, 255)])
    assert gif_decode(small)[2][-1] == (255, 255, 255)
    with pytest.raises(ValueError, match="256 colors"):
        gif_encode(17, 17, [(i % 256, i // 256, 0) for i in range(289)])
    with pytest.raises(ValueError):
        gif_decode(b"GIF89a truncated")
    with pytest.raises(ValueError):
        gif_decode(b"not a gif at all!")


def test_gif_decoder_real_world_shapes():
    """The decoder paths real crawl GIFs hit beyond our encoder's
    output: INTERLACED row order, a skipped 89a extension block, and a
    frame composed at a (left, top) offset with a LOCAL color table
    over the global background."""
    import struct

    from gluestick_ts_spark.operators.media_codecs import gif_decode, gif_encode

    # interlaced: permute rows into the four-pass storage order, then
    # flip the interlace bit — the decoder must undo the permutation
    w, h = 8, 16
    px = [((y * 16) % 256, x * 31 % 256, 7) for y in range(h) for x in range(w)]
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    storage = [px[r * w + c] for r in order for c in range(w)]
    enc = bytearray(gif_encode(w, h, storage))
    table_size = 2 << (enc[10] & 0x07)
    desc = 13 + 3 * table_size  # image descriptor offset
    assert enc[desc] == 0x2C
    enc[desc + 9] |= 0x40  # interlace flag
    dw, dh, dec = gif_decode(bytes(enc))
    assert (dw, dh) == (w, h) and dec == px

    # extension skipping + offset frame + local palette: hand-assemble
    header = b"GIF89a" + struct.pack("<HH", 4, 4)
    header += bytes([0x80, 0, 0])  # global table (2 entries), bg idx 0
    header += bytes((10, 20, 30)) + bytes((0, 0, 0))  # bg color, filler
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    # 2x2 frame at (1, 1), LOCAL 2-color table, LZW for indices [0,1,1,0]
    img = b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2) + bytes([0x80])
    img += bytes((200, 0, 0)) + bytes((0, 200, 0))
    # min code size 2: clear=4, end=5; codes 4,0,1,1 at 3 bits — after
    # the second post-clear code the table hits slot 8, so a conformant
    # decoder widens to 4 bits for the remaining codes 0,5
    lzw = bytearray()
    acc = nbits = 0
    for code, width in ((4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)):
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            lzw.append(acc & 0xFF); acc >>= 8; nbits -= 8
    if nbits:
        lzw.append(acc & 0xFF)
    img += bytes([2, len(lzw)]) + bytes(lzw) + b"\x00"
    payload = header + gce + img + b"\x3b"
    dw, dh, dec = gif_decode(payload)
    assert (dw, dh) == (4, 4)
    assert dec[0] == (10, 20, 30)              # background outside frame
    assert dec[1 * 4 + 1] == (200, 0, 0)       # frame (0,0) -> canvas (1,1)
    assert dec[1 * 4 + 2] == (0, 200, 0)
    assert dec[2 * 4 + 1] == (0, 200, 0)
    assert dec[2 * 4 + 2] == (200, 0, 0)

    # GCE TRANSPARENCY honored (round-10 review fix): flag index 1 as
    # transparent — those pixels must show the background, as any
    # conformant renderer draws them
    gce_t = b"\x21\xf9\x04\x01\x00\x00\x01\x00"  # flag set, idx 1
    dec_t = gif_decode(header + gce_t + img + b"\x3b")[2]
    assert dec_t[1 * 4 + 1] == (200, 0, 0)     # idx 0 still paints
    assert dec_t[1 * 4 + 2] == (10, 20, 30)    # idx 1 -> background
    assert dec_t[2 * 4 + 1] == (10, 20, 30)
    assert dec_t[2 * 4 + 2] == (200, 0, 0)

    # header-declared-dimension bomb: tiny payload, huge canvas — must
    # raise instantly instead of allocating gigabytes
    import pytest

    bomb = b"GIF89a" + struct.pack("<HH", 30000, 30000) + b"\x00\x00\x00\x3b"
    with pytest.raises(ValueError, match="too large"):
        gif_decode(bomb)
    # truncated-anywhere payloads raise ValueError, never struct.error
    with pytest.raises(ValueError):
        gif_decode(b"GIF89a" + struct.pack("<HH", 4, 4) + b"\x80\x00\x00\x2c\x01")


def test_gif_features_resize_and_hash():
    """gif_features shares the pixel-statistics contract, gif_resize
    emits a decodable GIF, and a GIF re-encode of a BMP dhash-matches
    its source EXACTLY (lossless — the strongest cross-codec twin)."""
    from gluestick_ts_spark.operators.imagehash import dhash_of_payload
    from gluestick_ts_spark.operators.media_codecs import (
        bmp_encode,
        gif_decode,
        gif_encode,
        gif_features,
        gif_resize,
        sniff_format,
    )

    px = [((x * 50) % 256, (y * 80) % 256, 128) for y in range(8) for x in range(8)]
    enc = gif_encode(8, 8, px)
    feats = gif_features(enc, 8)
    assert len(feats) == 8 and 0.0 < feats[3] < 1.0
    small = gif_resize(enc, 4, 4)
    assert sniff_format(small) == "gif"
    assert gif_decode(small)[0] == 4
    assert dhash_of_payload(enc) == dhash_of_payload(bmp_encode(8, 8, px))


def test_gif_animation_frames_and_wav24():
    """Round-10 follow-ons: animated-GIF frame sampling (composed
    frames re-encoded as standalone PNGs, cost bounded by max_frames)
    and 24-bit PCM WAV decode (sign-extended 3-byte words) — the
    wavhash of a 24-bit waveform equals its 16-bit twin's (window
    energies scale, comparisons don't flip)."""
    import io
    import math
    import struct
    import wave

    from gluestick_ts_spark.operators.imagehash import wavhash_of_payload
    from gluestick_ts_spark.operators.media_codecs import (
        gif_decode_frames,
        gif_encode,
        gif_frames,
        png_decode,
        sniff_format,
        wav_decode,
    )

    # animated gif: splice three local-palette solid frames
    def local_frame(color, w=4, h=4):
        img = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x80])
        img += bytes(color) + b"\x00\x00\x00"
        lzw = bytearray()
        acc = nbits = 0
        cs, nc, first = 3, 6, True
        seq = [(4, 3)]
        for _ in range(w * h):
            seq.append((0, cs))
            if first:
                first = False
            else:
                nc += 1
                if nc == (1 << cs) and cs < 12:
                    cs += 1
        seq.append((5, cs))
        for code, width_ in seq:
            acc |= code << nbits
            nbits += width_
            while nbits >= 8:
                lzw.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            lzw.append(acc & 0xFF)
        return img + bytes([2, len(lzw)]) + bytes(lzw) + b"\x00"

    header = (b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0x80, 0, 0])
              + bytes((9, 9, 9)) + b"\x00\x00\x00")
    anim = (header + local_frame((255, 0, 0)) + local_frame((0, 255, 0))
            + local_frame((0, 0, 255)) + b"\x3b")
    w, h, frames = gif_decode_frames(anim, max_frames=10)
    assert [f[0] for f in frames] == [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    assert len(gif_decode_frames(anim, max_frames=1)[2]) == 1  # bounded
    pngs = gif_frames(anim, 3)
    assert all(sniff_format(p) == "png" for p in pngs)
    assert png_decode(pngs[1])[2][0] == (0, 255, 0)
    # a still gif yields its one frame
    still = gif_encode(4, 4, [(7, 7, 7)] * 16)
    assert len(gif_frames(still, 5)) == 1

    # 24-bit wav
    samples = [int(4_000_000 * math.sin(i / 9)) for i in range(1500)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(3)
        wv.setframerate(8000)
        wv.writeframes(b"".join(
            int(s).to_bytes(3, "little", signed=True) for s in samples
        ))
    p24 = buf.getvalue()
    fr, nch, nfr, dec = wav_decode(p24)
    assert nfr == 1500 and abs(dec[100] - samples[100] / (1 << 23)) < 1e-12
    buf16 = io.BytesIO()
    with wave.open(buf16, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(struct.pack("<1500h", *[s >> 8 for s in samples]))
    assert wavhash_of_payload(p24) == wavhash_of_payload(buf16.getvalue())


def test_mp4_probe_metadata_and_box_shapes():
    """r12: real MP4 metadata from the moov walk — fixture round-trip,
    version-1 mvhd (64-bit duration), largesize boxes, and the
    ValueError contract for non-BMFF / moov-less / lying payloads."""
    from gluestick_ts_spark.operators.media_codecs import (
        mp4_encode_meta,
        mp4_probe,
        sniff_format,
    )

    p = mp4_encode_meta(1920, 1080, 90500)
    assert sniff_format(p) == "mp4"
    assert mp4_probe(p) == (1920, 1080, 90500)
    # odd timescale: integer truncation is the documented contract
    assert mp4_probe(mp4_encode_meta(640, 360, 12345, timescale=90000))[2] == 12345

    def box(typ, body):
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    # version-1 mvhd: 8-byte times, 64-bit duration
    mvhd_v1 = box(
        b"mvhd",
        b"\x01\x00\x00\x00" + bytes(16) + (1000).to_bytes(4, "big")
        + (75_000).to_bytes(8, "big") + bytes(80),
    )
    p1 = box(b"ftyp", b"isom" + bytes(8)) + box(b"moov", mvhd_v1)
    assert mp4_probe(p1) == (None, None, 75_000)
    # largesize (size==1) top-level box is walked, not tripped over
    moov = box(b"moov", mvhd_v1)
    large_moov = (
        (1).to_bytes(4, "big") + b"moov"
        + (len(moov) - 8 + 16).to_bytes(8, "big") + moov[8:]
    )
    assert mp4_probe(box(b"ftyp", b"isom" + bytes(8)) + large_moov)[2] == 75_000
    # contract: ValueError, never IndexError/overrun
    import pytest as _pt

    with _pt.raises(ValueError):
        mp4_probe(b"not a movie at all....")
    with _pt.raises(ValueError):
        mp4_probe(box(b"ftyp", b"isom" + bytes(8)))  # no moov
    lying = bytearray(p)
    lying[0:4] = (1 << 30).to_bytes(4, "big")  # ftyp size overruns file
    with _pt.raises(ValueError):
        mp4_probe(bytes(lying))


def test_mp3_probe_frames_id3_vbr_and_errors():
    """r12: real MP3 metadata from the frame-header scan — fixture
    round-trip within one frame, ID3v2 skip (syncsafe size), VBR
    duration as the per-frame sum, MPEG2 sample rates, junk
    tolerance, and the ValueError contract."""
    from gluestick_ts_spark.operators.media_codecs import (
        mp3_encode_meta,
        mp3_probe,
        sniff_format,
    )

    p = mp3_encode_meta(30_000)
    assert sniff_format(p) == "mp3"
    hz, dur, frames = mp3_probe(p)
    assert hz == 44100 and abs(dur - 30_000) <= 27
    # ID3v2 prefix (syncsafe size) skips cleanly
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 1, 5]) + bytes(133)
    assert sniff_format(id3 + p) == "mp3"
    assert mp3_probe(id3 + p) == (hz, dur, frames)
    # VBR: mixed-bitrate frames sum per-frame samples (the Xing math)
    vbr = mp3_encode_meta(1000, kbps=320) + mp3_encode_meta(1000, kbps=64)
    hz2, dur2, _f2 = mp3_probe(vbr)
    assert hz2 == 44100 and abs(dur2 - 2000) <= 54
    # MPEG2 table: 16 kHz Layer III uses 576 samples/frame
    # (build one frame by hand: version bits 10, layer III)
    hdr = bytes((0xFF, 0xE0 | (2 << 3) | (1 << 1) | 1, (4 << 4) | (2 << 2), 0))
    flen = 576 // 8 * 32 * 1000 // 16000  # 32 kbps @ 16 kHz
    one = hdr + bytes(flen - 4)
    assert mp3_probe(one * 10) == (16000, 10 * 576 * 1000 // 16000, 10)
    # trailing junk (an ID3v1 tag) ends the stream, no error
    assert mp3_probe(p + b"TAG" + bytes(125))[2] == frames
    import pytest as _pt

    with _pt.raises(ValueError):
        mp3_probe(bytes(200_000))  # no frame within the resync cap


def test_probe_media_metadata_mp4_mp3(spark):
    """r12: the Arrow probe fills REAL metadata for the two dominant
    crawl formats while their feature decode stays honestly labeled
    ('mp4-meta'/'mp3-meta' — positively identified, metadata real,
    vector fake)."""
    from gluestick_ts_spark.operators.media_codecs import (
        mp3_encode_meta,
        mp4_encode_meta,
    )
    from gluestick_ts_spark.operators.multimodal import (
        attach_media_metadata,
        extract_media_features,
        probe_media_metadata,
    )

    rows = [
        (1, mp4_encode_meta(1280, 720, 42_000)),
        (2, mp3_encode_meta(7_000)),
        (3, b"\x00" * 64),  # unsniffable: metadata untouched
    ]
    df = attach_media_metadata(
        spark.createDataFrame(rows, "id int, content binary"), "content"
    )
    probed = {r.id: r.media_meta for r in probe_media_metadata(df).collect()}
    m4 = probed[1]
    assert (m4["media_type"], m4["format"]) == ("video", "mp4")
    assert (m4["width"], m4["height"], m4["duration_ms"]) == (1280, 720, 42_000)
    m3 = probed[2]
    assert (m3["media_type"], m3["format"]) == ("audio", "mp3")
    assert abs(m3["duration_ms"] - 7_000) <= 27
    assert probed[3]["width"] is None and probed[3]["format"] == "bin"
    labels = {
        r.id: r.decoder
        for r in extract_media_features(df, "content").collect()
    }
    assert labels == {1: "mp4-meta", 2: "mp3-meta", 3: "fake"}


def test_audio_only_mp4_classifies_audio(spark):
    """An ISO BMFF container with no video track header (M4A/M4B
    podcasts sniff as 'mp4' too) classifies media_type='audio' with
    the real duration, and does NOT clobber caller-claimed fields
    with None widths."""
    from gluestick_ts_spark.operators.media_codecs import mp4_encode_meta
    from gluestick_ts_spark.operators.multimodal import (
        attach_media_metadata,
        probe_media_metadata,
    )

    from pyspark.sql import functions as F

    payload = mp4_encode_meta(0, 0, 9_000)  # zero-dim tkhd = no video
    df = attach_media_metadata(
        spark.createDataFrame([(1, payload)], "id int, content binary"),
        "content",
    ).withColumn(
        # caller-claimed width: must survive the audio probe
        "media_meta",
        F.col("media_meta").withField("width", F.lit(640)),
    )
    m = probe_media_metadata(df).first().media_meta
    assert (m["media_type"], m["format"]) == ("audio", "mp4")
    assert m["duration_ms"] == 9_000
    assert m["width"] == 640  # untouched
