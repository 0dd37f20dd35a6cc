"""Pure-stdlib media codecs for the multimodal operators.

Real decoders for the formats a container with no media libraries can
still parse honestly:

- **BMP** (Windows bitmap, BI_RGB 24/32-bit): header + pixel parsing,
  channel statistics, and a real nearest-neighbor resize that emits a
  valid 24-bit BMP.
- **WAV** (RIFF PCM, via stdlib ``wave``): sample decoding (8/16/24/
  32 bit), amplitude statistics, duration, and real time-slice "frames"
  re-encoded as standalone WAV payloads.
- **PNG** (via stdlib ``zlib``): 8-bit gray/RGB/RGBA, all five
  scanline filters, valid re-encode.
- **JPEG** (round 10, ``jpeg_codec.py``): from-scratch baseline
  decoder (arbitrary DQT/DHT, 4:4:4/4:2:2/4:2:0, restart markers,
  fixed-point integer IDCT — platform-exact) + a deterministic
  encoder. Round 11: PROGRESSIVE (SOF2) decodes fully (all four T.81
  §G scan kinds, EOBRUN, spectral bands, successive approximation)
  and EXIF orientation normalizes the pixels upright — so progressive
  crawl images and rotated phone re-uploads take the real decode path
  and hash with their twins; only arithmetic/12-bit/hierarchical
  still fall to the labeled fake.
- **GIF** (round 10, ``gif_codec.py``): full LZW decoder (87a/89a,
  local/global palettes, interlace, frame composition; first frame
  only — documented) + a lossless <=256-color fixture encoder.
- **AVI / MJPEG video** (round 11, ``avi_codec.py``): tolerant RIFF
  container walker whose frames are standalone JPEGs the repo's own
  decoder handles (baseline AND progressive MJPEG) — REAL video frame
  sampling (a pure demux, cost bounded by frames asked) and
  header-only width/height/frames/fps probing; deterministic fixture
  writer. Replaces the labeled fake sampler for the one video format
  that needs no codec library.

``sniff_format`` dispatches on magic bytes; payloads in any other
format fall back to the clearly-labeled deterministic fakes in
``multimodal.py`` (PIL/ffmpeg are not installable in this
environment). The reference has no media operators at all — this is a
scale-extension surface (SURVEY §2.2), so there is no parity target,
only the contract pinned by tests/test_streaming_multimodal.py.

Everything here is driver-free pure-Python called from Arrow-batched
``mapInPandas`` workers: per-payload cost is O(bytes) with no Spark
API use, so the same functions serve a 1000-executor cluster
unchanged.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

from .avi_codec import avi_decode_frames, avi_encode, avi_frames, avi_probe
from .gif_codec import gif_decode, gif_decode_frames, gif_encode
from .jpeg_codec import jpeg_decode, jpeg_encode

# shared header-declared-dimension cap (the jpeg/gif codecs carry their
# own copies — they cannot import this module without a cycle): decode
# memory stays bounded no matter what a crafted header claims
_MAX_PIXELS = 1 << 24

__all__ = [
    "IMAGE_DECODERS",
    "sniff_format",
    "bmp_decode",
    "bmp_features",
    "bmp_resize",
    "bmp_encode",
    "wav_decode",
    "wav_features",
    "wav_frames",
    "png_decode",
    "png_encode",
    "png_features",
    "png_resize",
    "jpeg_decode",
    "jpeg_encode",
    "jpeg_features",
    "jpeg_resize",
    "gif_decode",
    "gif_decode_frames",
    "gif_encode",
    "gif_frames",
    "avi_encode",
    "avi_decode_frames",
    "avi_probe",
    "avi_frames",
    "avi_features",
    "gif_features",
    "gif_resize",
    "mp4_probe",
    "mp4_encode_meta",
    "mp3_probe",
    "mp3_encode_meta",
]


def _is_mp3_frame_header(b1: int, b2: int) -> bool:
    """Whether bytes 2-3 of a candidate sync complete a VALID MPEG
    audio Layer III frame header (version not reserved, layer III,
    bitrate index not free/bad, sample-rate index not reserved) — the
    validity checks are what keep the bare 0xFFEx sync from
    false-positive sniffing random binary."""
    if (b1 & 0xE0) != 0xE0:
        return False
    version = (b1 >> 3) & 3
    layer = (b1 >> 1) & 3
    bidx = (b2 >> 4) & 0xF
    ridx = (b2 >> 2) & 3
    return version != 1 and layer == 1 and bidx not in (0, 15) and ridx != 3


def sniff_format(payload: bytes | None) -> str | None:
    """Magic-byte format sniff: ``"png"``, ``"bmp"``, ``"wav"``,
    ``"jpeg"``, ``"gif"``, ``"avi"`` (round 11 — MJPEG video),
    ``"mp4"`` / ``"mp3"`` (round 12 — metadata-probe formats: the
    container/frame headers parse for REAL width/height/duration via
    ``mp4_probe``/``mp3_probe``; pixel/sample decode still needs codec
    libraries and stays the labeled fake), or None."""
    if not payload or len(payload) < 12:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    # ISO BMFF: size(4) + 'ftyp' — the brand-independent MP4 signature
    if payload[4:8] == b"ftyp":
        return "mp4"
    # MP3: an ID3v2 tag, or a valid Layer III frame sync at offset 0
    # (JPEG's FF D8 fails the 0xE0 mask, so order here is free)
    if payload[:3] == b"ID3":
        return "mp3"
    if payload[0] == 0xFF and _is_mp3_frame_header(payload[1], payload[2]):
        return "mp3"
    return None


def _nn_resize(decode_fn, encode_fn, payload: bytes, width: int, height: int) -> bytes:
    """The ONE nearest-neighbor resize all four image codecs share:
    decode, integer-index sample, re-encode with the matching
    encoder."""
    sw, sh, pixels = decode_fn(payload)
    out = []
    for r in range(height):
        sr = min(sh - 1, (r * sh) // height)
        for c in range(width):
            sc = min(sw - 1, (c * sw) // width)
            out.append(pixels[sr * sw + sc])
    return encode_fn(width, height, out)


# -- BMP ---------------------------------------------------------------------

def bmp_decode(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Parse an uncompressed (BI_RGB) 24/32-bit BMP.

    Returns ``(width, height, pixels)`` with pixels row-major from the
    TOP row down, each an ``(r, g, b)`` tuple. Raises ``ValueError`` on
    anything that is not a plain BI_RGB 24/32-bit bitmap.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_offset,) = struct.unpack_from("<I", payload, 10)
    (dib_size,) = struct.unpack_from("<I", payload, 14)
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    bytes_per_px = bpp // 8
    stride = ((bpp * width + 31) // 32) * 4
    need = pix_offset + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows: list[list[tuple[int, int, int]]] = []
    for r in range(height):
        base = pix_offset + r * stride
        row = []
        for c in range(width):
            o = base + c * bytes_per_px
            b, g, rr = payload[o], payload[o + 1], payload[o + 2]
            row.append((rr, g, b))
        rows.append(row)
    if not top_down:
        rows.reverse()  # BMP stores bottom-up by default
    return width, height, [px for row in rows for px in row]


def bmp_encode(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """Emit a valid bottom-up 24-bit BI_RGB BMP from row-major
    top-down ``(r, g, b)`` pixels."""
    stride = ((24 * width + 31) // 32) * 4
    pad = b"\x00" * (stride - width * 3)
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        for c in range(width):
            rr, g, b = pixels[r * width + c]
            body += bytes((b, g, rr))
        body += pad
    pix_offset = 14 + 40
    file_size = pix_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + bytes(body)


def bmp_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Real pixel statistics from a decoded BMP, shaped to
    ``n_features``: per-channel means (r, g, b, /255), luma mean, luma
    stddev (/255), width & height (/4096), aspect ratio (w/h, /16) —
    padded with zeros / truncated to fit."""
    width, height, pixels = bmp_decode(payload)
    n = len(pixels) or 1
    mr = sum(p[0] for p in pixels) / n
    mg = sum(p[1] for p in pixels) / n
    mb = sum(p[2] for p in pixels) / n
    lumas = [0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2] for p in pixels]
    ml = sum(lumas) / n
    var = sum((x - ml) ** 2 for x in lumas) / n
    feats = [
        mr / 255.0,
        mg / 255.0,
        mb / 255.0,
        ml / 255.0,
        (var ** 0.5) / 255.0,
        width / 4096.0,
        height / 4096.0,
        (width / height) / 16.0,
    ]
    feats = feats[:n_features]
    return feats + [0.0] * (n_features - len(feats))


def bmp_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize: decode, sample, re-encode as a
    valid 24-bit BMP."""
    return _nn_resize(bmp_decode, bmp_encode, payload, width, height)


# -- WAV ---------------------------------------------------------------------

_WIDTH_FMT = {1: "b", 2: "h", 4: "i"}


def wav_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Parse a PCM WAV via stdlib ``wave``.

    Returns ``(framerate, nchannels, nframes, samples)`` with samples
    normalized to [-1, 1] (channels interleaved). Raises
    ``ValueError`` on compressed / malformed payloads.
    """
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            framerate = w.getframerate()
            nchannels = w.getnchannels()
            nframes = w.getnframes()
            sampwidth = w.getsampwidth()
            raw = w.readframes(nframes)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a decodable WAV: {e}") from e
    if sampwidth not in (1, 2, 3, 4):
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    count = len(raw) // sampwidth
    if sampwidth == 3:
        # 24-bit PCM (round 10): 3-byte little-endian signed words
        samples = []
        scale = float(1 << 23)
        for i in range(count):
            v = int.from_bytes(raw[3 * i : 3 * i + 3], "little", signed=True)
            samples.append(v / scale)
        return framerate, nchannels, nframes, samples
    vals = struct.unpack(f"<{count}{_WIDTH_FMT[sampwidth]}", raw[: count * sampwidth])
    if sampwidth == 1:
        # 8-bit WAV is unsigned ('b' read it signed: shift accordingly)
        samples = [((v + 256 if v < 0 else v) - 128) / 128.0 for v in vals]
    else:
        scale = float(1 << (8 * sampwidth - 1))
        samples = [v / scale for v in vals]
    return framerate, nchannels, nframes, samples


def wav_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Real audio statistics shaped to ``n_features``: RMS, mean |amp|,
    max |amp|, zero-crossing rate, duration seconds (/3600), sample
    rate (/48000), channel count (/8), frame count (/1e7) — padded /
    truncated to fit."""
    framerate, nchannels, nframes, samples = wav_decode(payload)
    n = len(samples) or 1
    rms = (sum(s * s for s in samples) / n) ** 0.5
    mean_abs = sum(abs(s) for s in samples) / n
    max_abs = max((abs(s) for s in samples), default=0.0)
    zc = sum(
        1 for i in range(1, len(samples)) if (samples[i - 1] < 0) != (samples[i] < 0)
    )
    zcr = zc / n
    duration_s = nframes / framerate if framerate else 0.0
    feats = [
        rms,
        mean_abs,
        max_abs,
        zcr,
        duration_s / 3600.0,
        framerate / 48000.0,
        nchannels / 8.0,
        nframes / 1e7,
    ]
    feats = feats[:n_features]
    return feats + [0.0] * (n_features - len(feats))


def wav_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Real time-slice sampling: split the audio into ``n_frames``
    contiguous windows, each re-encoded as a standalone, decodable WAV
    payload (header + its slice of PCM frames)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            params = w.getparams()
            nframes = w.getnframes()
            raw = w.readframes(nframes)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a decodable WAV: {e}") from e
    if nframes <= 0:
        return []
    n_frames = max(1, min(n_frames, nframes))
    per = nframes // n_frames
    frame_bytes = params.sampwidth * params.nchannels
    out: list[bytes] = []
    for i in range(n_frames):
        start = i * per
        end = nframes if i == n_frames - 1 else (i + 1) * per
        chunk = raw[start * frame_bytes : end * frame_bytes]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as ow:
            ow.setnchannels(params.nchannels)
            ow.setsampwidth(params.sampwidth)
            ow.setframerate(params.framerate)
            ow.writeframes(chunk)
        out.append(buf.getvalue())
    return out


# -- PNG ---------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Parse an 8-bit non-interlaced PNG (grayscale / RGB / RGBA) using
    only stdlib ``zlib``: chunk walk, IDAT inflate, and full scanline
    un-filtering (all five PNG filter types, including Paeth).

    Returns ``(width, height, pixels)`` row-major top-down as
    ``(r, g, b)`` tuples (grayscale is expanded, alpha is dropped) —
    the same contract as ``bmp_decode``, so features/resize share one
    pixel pipeline. Raises ``ValueError`` for non-PNG payloads and the
    unsupported corners (16-bit, palette, interlaced).
    """
    if len(payload) < 8 or payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = -1
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
                raise ValueError(
                    f"unsupported PNG: depth={depth} interlace={interlace}"
                )
            channels = {0: 1, 2: 3, 6: 4}.get(color, 0)
            if channels == 0:
                raise ValueError(f"unsupported PNG color type {color}")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width <= 0 or height <= 0 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if width * height > _MAX_PIXELS:
        raise ValueError(f"PNG too large: {width}x{height}")
    stride = width * channels
    # bounded inflate: a zlib bomb with small declared dims must not
    # expand past the scanline budget the header promises; corrupt
    # streams must raise ValueError (the Arrow fallback contract), not
    # a raw zlib.error
    try:
        raw = zlib.decompressobj().decompress(
            bytes(idat), height * (stride + 1)
        )
    except zlib.error as e:
        raise ValueError(f"corrupt PNG stream: {e}") from e
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG scanlines")
    pixels: list[tuple[int, int, int]] = []
    prev = bytearray(stride)
    for r in range(height):
        base = r * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        prev = line
        for c in range(width):
            o = c * channels
            if channels == 1:
                g = line[o]
                pixels.append((g, g, g))
            else:
                pixels.append((line[o], line[o + 1], line[o + 2]))
    return width, height, pixels


def png_encode(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """Emit a valid 8-bit RGB non-interlaced PNG (filter 0 scanlines,
    stdlib ``zlib`` deflate + crc32) from row-major top-down
    ``(r, g, b)`` pixels."""
    raw = bytearray()
    for r in range(height):
        raw.append(0)  # filter type None
        for c in range(width):
            raw += bytes(pixels[r * width + c])

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _pixel_features(
    width: int, height: int, pixels: list[tuple[int, int, int]], n_features: int
) -> list[float]:
    """Shared pixel-statistics feature vector (the ``bmp_features``
    contract): channel means, luma mean/stddev, normalized dims,
    aspect."""
    n = len(pixels) or 1
    mr = sum(p[0] for p in pixels) / n
    mg = sum(p[1] for p in pixels) / n
    mb = sum(p[2] for p in pixels) / n
    lumas = [0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2] for p in pixels]
    ml = sum(lumas) / n
    var = sum((x - ml) ** 2 for x in lumas) / n
    feats = [
        mr / 255.0,
        mg / 255.0,
        mb / 255.0,
        ml / 255.0,
        (var ** 0.5) / 255.0,
        width / 4096.0,
        height / 4096.0,
        (width / height) / 16.0,
    ]
    feats = feats[:n_features]
    return feats + [0.0] * (n_features - len(feats))


def png_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Real pixel statistics from a decoded PNG — identical feature
    contract to ``bmp_features``."""
    return _pixel_features(*png_decode(payload), n_features)


def jpeg_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Real pixel statistics from a decoded baseline JPEG
    (``jpeg_codec.jpeg_decode``) — identical feature contract to
    ``bmp_features``."""
    return _pixel_features(*jpeg_decode(payload), n_features)


def jpeg_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize: decode, sample, re-encode as a
    valid baseline 4:4:4 JPEG (the default encoder settings)."""
    return _nn_resize(jpeg_decode, jpeg_encode, payload, width, height)


def png_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize: decode, sample, re-encode as a
    valid 8-bit RGB PNG."""
    return _nn_resize(png_decode, png_encode, payload, width, height)


def gif_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Real pixel statistics from a decoded GIF first frame
    (``gif_codec.gif_decode``) — identical feature contract to
    ``bmp_features``."""
    return _pixel_features(*gif_decode(payload), n_features)


def gif_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize: decode the first frame, sample,
    re-encode as a single-frame GIF (lossless — NN sampling only picks
    existing palette colors). The >256-distinct-color guard can fire
    only when the background color was not in the palette; callers'
    sniff dispatchers treat that ValueError as fall-to-fake."""
    return _nn_resize(gif_decode, gif_encode, payload, width, height)


def avi_features(payload: bytes, n_features: int = 8) -> list[float]:
    """Real pixel statistics from the FIRST decoded MJPEG frame —
    identical feature contract to the image codecs, so a mixed
    image/video corpus shares one feature space. First frame only by
    design: the probe's duration/frame-count carries the temporal
    dimension; decoding every frame for a feature vector would make
    cost ∝ video length."""
    w, h, frames = avi_decode_frames(payload, max_frames=1)
    return _pixel_features(w, h, frames[0], n_features)


# the ONE image-decoder registry (imagehash, the multimodal probe, and
# the driver-query oracle builders all dispatch through it — no more
# per-site copies of the same dict)
IMAGE_DECODERS = {
    "bmp": bmp_decode,
    "png": png_decode,
    "jpeg": jpeg_decode,
    "gif": gif_decode,
}


def gif_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Real frame sampling for (possibly animated) GIFs — the image
    twin of ``wav_frames``: decode up to ``n_frames`` COMPOSED frames
    (cumulative rendering, transparency + restore-to-background
    disposal honored) and re-encode each as a standalone PNG. PNG —
    not GIF — on purpose: a composed frame can mix colors from several
    per-frame palettes past the 256-color GIF limit, and PNG is the
    repo's lossless unbounded-palette container, so the sampler never
    fails on a legal animation. A still GIF yields one frame. Cost is
    bounded by ``n_frames`` (later animation frames are never
    decoded)."""
    w, h, frames = gif_decode_frames(payload, max_frames=max(1, n_frames))
    return [png_encode(w, h, f) for f in frames]


# -- MP4 / MP3 metadata probes (round 12) -------------------------------------
#
# The two formats that dominate real crawls' media bytes. Full decode
# needs codec libraries this container doesn't have (the labeled-fake
# contract covers the pixel/sample path), but METADATA does not: an
# ISO/IEC 14496-12 box walk and an MPEG audio (ISO 11172-3 / 13818-3)
# frame-header scan yield real duration/dimensions/sample-rate cheaply
# — which is what a curation user filters on.

def _mp4_boxes(data: bytes, start: int, end: int):
    """Walk ISO BMFF boxes in ``data[start:end]``, yielding
    ``(type, body_start, box_end)``. Handles 64-bit largesize
    (size==1) and to-end-of-file (size==0); raises ValueError on a
    size that doesn't advance or overruns — each step moves forward by
    >= 8 bytes, so the walk is linear and bounded."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box at {pos}")
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad mp4 box size {size} at {pos}")
        yield typ, pos + hdr, pos + size
        pos += size


def mp4_probe(payload: bytes) -> tuple[int | None, int | None, int | None]:
    """Real MP4 metadata from the ``moov`` box alone — no frame
    decode: ``(width, height, duration_ms)``.

    ``mvhd`` carries the presentation timescale + duration (version 0:
    32-bit fields at offsets 12/16 of the box body; version 1: 64-bit
    duration at 24 after 8-byte timestamps); each ``trak``'s ``tkhd``
    carries the track's display width/height as 16.16 fixed point in
    the body's last 8 bytes (same tail position in both versions —
    audio tracks are 0x0, so the first non-zero pair is the video
    track). Raises ValueError when the payload isn't ISO BMFF or holds
    no ``moov``."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 (ISO BMFF) payload")
    width = height = duration_ms = None
    saw_moov = False
    for typ, a, b in _mp4_boxes(payload, 0, len(payload)):
        if typ != b"moov":
            continue
        saw_moov = True
        for t2, c, d in _mp4_boxes(payload, a, b):
            body = payload[c:d]
            if t2 == b"mvhd" and len(body) >= 20:
                if body[0] == 1 and len(body) >= 32:  # version 1
                    ts = int.from_bytes(body[20:24], "big")
                    dur = int.from_bytes(body[24:32], "big")
                else:  # version 0
                    ts = int.from_bytes(body[12:16], "big")
                    dur = int.from_bytes(body[16:20], "big")
                if ts:
                    duration_ms = dur * 1000 // ts
            elif t2 == b"trak":
                for t3, e, f in _mp4_boxes(payload, c, d):
                    tb = payload[e:f]
                    if t3 == b"tkhd" and len(tb) >= 8:
                        w = int.from_bytes(tb[-8:-4], "big") >> 16
                        h = int.from_bytes(tb[-4:], "big") >> 16
                        if w and h and width is None:
                            width, height = w, h
        break  # one moov per file
    if not saw_moov:
        raise ValueError("mp4 payload holds no moov box")
    return width, height, duration_ms


def mp4_encode_meta(
    width: int, height: int, duration_ms: int, timescale: int = 1000
) -> bytes:
    """Deterministic metadata-true MP4 fixture: a spec-shaped
    ``ftyp`` + ``moov(mvhd + trak(tkhd))`` + stub ``mdat`` whose
    header math round-trips through :func:`mp4_probe` exactly. The
    media samples are a zero stub — this is a METADATA fixture (the
    probe never looks at mdat), same philosophy as ``warc_encode``."""

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    dur = duration_ms * timescale // 1000
    # mvhd v0: flags(4) times(8) timescale(4) duration(4) rate(4)
    # volume(2) reserved(10) matrix(36) predefined(24) next_track(4)
    mvhd = box(
        b"mvhd",
        bytes(4) + bytes(8) + timescale.to_bytes(4, "big")
        + dur.to_bytes(4, "big") + (0x00010000).to_bytes(4, "big")
        + (0x0100).to_bytes(2, "big") + bytes(10)
        + _MP4_IDENTITY_MATRIX + bytes(24) + (2).to_bytes(4, "big"),
    )
    # tkhd v0: flags(4) times(8) track_id(4) reserved(4) duration(4)
    # reserved(8) layer(2) alt(2) volume(2) reserved(2) matrix(36)
    # width(4) height(4) — width/height 16.16 fixed point
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + bytes(8) + (1).to_bytes(4, "big") + bytes(4)
        + dur.to_bytes(4, "big") + bytes(8) + bytes(2) + bytes(2)
        + bytes(2) + bytes(2) + _MP4_IDENTITY_MATRIX
        + (width << 16).to_bytes(4, "big") + (height << 16).to_bytes(4, "big"),
    )
    ftyp = box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2mp41")
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd)) + box(b"mdat", bytes(32))


_MP4_IDENTITY_MATRIX = (
    (0x00010000).to_bytes(4, "big") + bytes(12)
    + (0x00010000).to_bytes(4, "big") + bytes(12)
    + (0x40000000).to_bytes(4, "big")
)

# MPEG audio Layer III tables (ISO 11172-3 / 13818-3): kbps by bitrate
# index, Hz by sample-rate index keyed on the header version bits
# (3 = MPEG1, 2 = MPEG2, 0 = MPEG2.5)
_MP3_KBPS_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
_MP3_KBPS_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
_MP3_HZ = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}
_MP3_MAX_RESYNC = 64 * 1024  # junk scanned before the FIRST frame


def mp3_probe(payload: bytes) -> tuple[int, int, int]:
    """Real MP3 metadata from the frame headers alone — no sample
    decode: ``(sample_rate_hz, duration_ms, frame_count)``.

    Skips a leading ID3v2 tag (syncsafe size), resyncs over up to 64 KB
    of pre-stream junk, then walks Layer III frame headers: each frame
    contributes its version's samples-per-frame (1152 MPEG1 / 576
    MPEG2+2.5) and advances by the header-derived frame length, so
    duration sums correctly for VBR streams too (the Xing estimate is
    exactly this sum). The walk is linear in the payload; trailing
    junk/tags end it. Raises ValueError when no valid frame exists."""
    n = len(payload)
    pos = 0
    if payload[:3] == b"ID3" and n >= 10:
        size = 0
        for byte in payload[6:10]:
            size = (size << 7) | (byte & 0x7F)
        pos = 10 + size
    frames = 0
    total_samples = 0
    rate = 0
    scan_limit = pos + _MP3_MAX_RESYNC
    while pos + 4 <= n:
        b0, b1, b2 = payload[pos], payload[pos + 1], payload[pos + 2]
        if not (b0 == 0xFF and _is_mp3_frame_header(b1, b2)):
            if frames or pos > scan_limit:
                break  # stream over (trailing tag) or junk cap hit
            pos += 1
            continue
        version = (b1 >> 3) & 3
        kbps = (_MP3_KBPS_V1 if version == 3 else _MP3_KBPS_V2)[(b2 >> 4) & 0xF]
        hz = _MP3_HZ[version][(b2 >> 2) & 3]
        padding = (b2 >> 1) & 1
        spf = 1152 if version == 3 else 576
        flen = spf // 8 * kbps * 1000 // hz + padding
        if flen <= 4:
            break  # defensive: never stall
        frames += 1
        total_samples += spf
        rate = hz
        pos += flen
    if not frames:
        raise ValueError("no MPEG audio frames in payload")
    return rate, total_samples * 1000 // rate, frames


def mp3_encode_meta(
    duration_ms: int, sample_rate: int = 44100, kbps: int = 128
) -> bytes:
    """Deterministic metadata-true MP3 fixture: enough valid MPEG1
    Layer III frames (zero-filled side-info/samples — a silence
    stream) to cover ``duration_ms``; round-trips through
    :func:`mp3_probe` to within one frame (~26 ms)."""
    bidx = _MP3_KBPS_V1.index(kbps)
    ridx = _MP3_HZ[3].index(sample_rate)
    hdr = bytes(
        (0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1, (bidx << 4) | (ridx << 2), 0)
    )
    flen = 1152 // 8 * kbps * 1000 // sample_rate
    frame = hdr + bytes(flen - 4)
    n_frames = max(1, (duration_ms * sample_rate + 1152 * 1000 - 1) // (1152 * 1000))
    return frame * n_frames
