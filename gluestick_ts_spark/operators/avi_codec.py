"""Pure-stdlib MJPEG-in-AVI container codec — REAL video frame
sampling (``media_codecs``' sixth format).

The multimodal frame sampler's video path was the labeled byte-chunk
fake ("video codecs need ffmpeg"); this module closes the gap for the
one video format that needs NO codec library: Motion-JPEG in the RIFF
AVI container, where every frame is a standalone baseline/progressive
JPEG the repo's own ``jpeg_codec`` already decodes. MJPEG-AVI is what
webcams, dashcams, scientific cameras, and many older capture
pipelines emit — a real slice of crawl video.

- ``avi_decode_frames``: tolerant RIFF walker (``LIST hdrl`` headers,
  ``LIST movi`` frame chunks incl. ``rec `` interleave groups, stray
  chunks skipped) that stops parsing the byte stream the moment
  ``max_frames`` frames are extracted — cost is bounded by the frames
  you ask for, never the video length.
- ``avi_probe``: header-only metadata (width/height/frame count/fps) —
  no frame decode, for the metadata probe.
- ``avi_frames``: the sampler — returns the embedded JPEG payloads
  THEMSELVES (a pure demux: MJPEG frames are already standalone
  JPEGs), each validated by a real decode so a corrupt frame raises
  here, not downstream.
- ``avi_encode``: deterministic fixture writer (valid avih/strh/strf
  headers, ``00dc`` chunks, ``idx1`` index, even-padding) over
  ``jpeg_codec.jpeg_encode``.

Same contracts as the sibling codecs: every decode error path is
``ValueError`` (the Arrow fallback boundary), header-declared counts
and dimensions are capped BEFORE allocating, and everything is a pure
deterministic function of the bytes. The reference has no media code
at all (scale-extension surface, SURVEY §2.2).
"""

from __future__ import annotations

import struct

from .jpeg_codec import jpeg_decode, jpeg_encode

__all__ = ["avi_encode", "avi_decode_frames", "avi_probe", "avi_frames", "avi_frames_at"]

# frame-count cap for the unbounded (max_frames=None) decode — far
# above the sampler use cases; a forged header can't drive an
# unbounded loop (chunks are slice-bounded by the payload anyway)
_MAX_FRAMES = 4096


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """One RIFF chunk with the spec's even-length padding."""
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def avi_encode(
    width: int,
    height: int,
    frames: list[list[tuple[int, int, int]]],
    fps: int = 10,
    **jpeg_kwargs,
) -> bytes:
    """Encode row-major ``(r, g, b)`` pixel frames as an MJPEG AVI:
    each frame a standalone JPEG (``jpeg_kwargs`` pass through to
    ``jpeg_encode`` — subsampling/quality/progressive all work) inside
    a spec-valid RIFF (avih + vids strh/strf + movi + idx1).
    Deterministic, so synth fixtures are digest-pinnable."""
    if not frames:
        raise ValueError("avi_encode: at least one frame required")
    if fps < 1:
        raise ValueError(f"avi_encode: fps must be >= 1, got {fps}")
    payloads = [jpeg_encode(width, height, f, **jpeg_kwargs) for f in frames]
    max_bytes = max(len(p) for p in payloads)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(payloads),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale / dwRate -> fps
            0,  # dwStart
            len(payloads),  # dwLength (frames)
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: varying)
            0, 0, width & 0xFFFF, height & 0xFFFF,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        max_bytes,  # biSizeImage (max frame is a legal value)
        0, 0, 0, 0,  # ppm / clr
    )
    strl = _chunk(b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    offsets = []  # idx1 offsets are relative to the start of 'movi'
    for p in payloads:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_body)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(p))
        for off, p in zip(offsets, payloads)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield ``(fourcc, body_start, body_len)`` for the RIFF chunks in
    ``data[pos:end]``; tolerant of truncation (stops at the first chunk
    that runs past ``end``)."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            break  # truncated final chunk
        yield fourcc, body, size
        pos = body + size + (size % 2)  # even padding


def avi_probe(payload: bytes) -> tuple[int, int, int, int]:
    """Header-only probe: ``(width, height, n_frames, fps)`` from the
    ``avih``/``strh`` headers — no frame decode. Raises ``ValueError``
    for non-AVI/corrupt payloads."""
    try:
        return _avi_probe_impl(payload)
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt AVI payload: {e}") from e


def _avi_probe_impl(payload: bytes) -> tuple[int, int, int, int]:
    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not an AVI payload")
    for fourcc, body, size in _walk_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST" or payload[body : body + 4] != b"hdrl":
            continue
        width = height = n_frames = 0
        fps = 0
        for f2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
            if f2 == b"avih" and s2 >= 40:
                usec, _, _, _, total = struct.unpack_from("<IIIII", payload, b2)
                width, height = struct.unpack_from("<II", payload, b2 + 32)
                n_frames = total
                fps = 1_000_000 // usec if usec else 0
            elif f2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                for f3, b3, s3 in _walk_chunks(payload, b2 + 4, b2 + s2):
                    if (
                        f3 == b"strh"
                        and s3 >= 32
                        and payload[b3 : b3 + 4] == b"vids"
                    ):
                        scale, rate = struct.unpack_from("<II", payload, b3 + 20)
                        if scale:
                            fps = rate // scale
        if width <= 0 or height <= 0:
            raise ValueError("AVI missing video dimensions")
        return width, height, n_frames, fps
    raise ValueError("AVI missing hdrl headers")


def avi_decode_frames(
    payload: bytes, max_frames: int | None = None
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode up to ``max_frames`` MJPEG frames to ``(width, height,
    [frame_pixels, ...])`` — each frame through the repo's own JPEG
    decoder, so baseline AND progressive MJPEG both work. Parsing
    STOPS once enough frames are extracted (cost ∝ frames asked, not
    video length). Every decoded frame must match the header
    dimensions (a dimension-switching stream is corrupt, not silently
    mixed). Raises ``ValueError`` for non-AVI/corrupt payloads."""
    try:
        return _avi_decode_frames_impl(payload, max_frames)
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt AVI payload: {e}") from e


def _is_frame_chunk(fourcc: bytes) -> bool:
    # ##dc (compressed) / ##db (uncompressed slot, MJPEG writers use
    # both) video chunks of any stream number
    return (
        fourcc[2:4] in (b"dc", b"db")
        and fourcc[:2].isdigit()
    )


def _avi_decode_frames_impl(
    payload: bytes, max_frames: int | None
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    if max_frames is not None and max_frames < 1:
        raise ValueError(f"max_frames must be >= 1, got {max_frames}")
    width, height, _n, _fps = _avi_probe_impl(payload)
    want = _MAX_FRAMES if max_frames is None else min(max_frames, _MAX_FRAMES)
    frames: list[list[tuple[int, int, int]]] = []

    def take(body: int, size: int) -> bool:
        """Decode one frame chunk; True when enough frames are taken."""
        fw, fh, px = jpeg_decode(payload[body : body + size])
        if (fw, fh) != (width, height):
            raise ValueError(
                f"AVI frame dims {fw}x{fh} != header {width}x{height}"
            )
        frames.append(px)
        return len(frames) >= want

    for fourcc, body, size in _walk_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST" or payload[body : body + 4] != b"movi":
            continue
        for f2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
            if f2 == b"LIST" and payload[b2 : b2 + 4] == b"rec ":
                # interleave group: frames live one level down
                for f3, b3, s3 in _walk_chunks(payload, b2 + 4, b2 + s2):
                    if _is_frame_chunk(f3) and take(b3, s3):
                        return width, height, frames
            elif _is_frame_chunk(f2) and take(b2, s2):
                return width, height, frames
        break  # one movi LIST per file
    if not frames:
        raise ValueError("AVI holds no decodable video frames")
    return width, height, frames


def avi_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """The frame SAMPLER: the first ``n_frames`` embedded JPEG payloads
    themselves (MJPEG frames are standalone JPEGs — a pure demux, no
    transcode), each VALIDATED by a real decode so a corrupt frame
    raises here instead of downstream. Bounded by ``n_frames``."""
    if n_frames < 1:
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")
    try:
        width, height, _n, _fps = _avi_probe_impl(payload)
        out: list[bytes] = []
        for fourcc, body, size in _walk_chunks(payload, 12, len(payload)):
            if fourcc != b"LIST" or payload[body : body + 4] != b"movi":
                continue
            for f2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
                targets = (
                    _walk_chunks(payload, b2 + 4, b2 + s2)
                    if f2 == b"LIST" and payload[b2 : b2 + 4] == b"rec "
                    else [(f2, b2, s2)]
                )
                for f3, b3, s3 in targets:
                    if not _is_frame_chunk(f3):
                        continue
                    frame = payload[b3 : b3 + s3]
                    fw, fh, _ = jpeg_decode(frame)  # validate
                    if (fw, fh) != (width, height):
                        raise ValueError(
                            f"AVI frame dims {fw}x{fh} != header "
                            f"{width}x{height}"
                        )
                    out.append(frame)
                    if len(out) >= n_frames:
                        return out
            break
        if not out:
            raise ValueError("AVI holds no decodable video frames")
        return out
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt AVI payload: {e}") from e


def avi_frames_at(payload: bytes, indices) -> list[bytes]:
    """Positional frame sampler: the embedded JPEGs at the requested
    frame ORDINALS (0-based), in ascending-ordinal order — the EVEN
    sampling primitive (``vhash_of_payload(sample="even")``): picking
    [0, n/k, 2n/k, ...] makes the signature robust to head/tail trims
    that shift every frame the first-k sampler sees. The demux walks
    chunk HEADERS up to the last requested ordinal (cheap — no decode)
    and decodes ONLY the selected frames; parsing stops at the last
    hit. Missing ordinals (beyond the stream) are skipped, not errors;
    an empty selection raises ValueError."""
    want = sorted({int(i) for i in indices})
    if not want or want[0] < 0:
        raise ValueError(f"indices must be non-empty and >= 0, got {indices!r}")
    last = want[-1]
    wanted = set(want)
    try:
        width, height, _n, _fps = _avi_probe_impl(payload)
        out: list[bytes] = []
        ordinal = 0
        for fourcc, body, size in _walk_chunks(payload, 12, len(payload)):
            if fourcc != b"LIST" or payload[body : body + 4] != b"movi":
                continue
            for f2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
                targets = (
                    _walk_chunks(payload, b2 + 4, b2 + s2)
                    if f2 == b"LIST" and payload[b2 : b2 + 4] == b"rec "
                    else [(f2, b2, s2)]
                )
                for f3, b3, s3 in targets:
                    if not _is_frame_chunk(f3):
                        continue
                    if ordinal in wanted:
                        frame = payload[b3 : b3 + s3]
                        fw, fh, _ = jpeg_decode(frame)  # validate
                        if (fw, fh) != (width, height):
                            raise ValueError(
                                f"AVI frame dims {fw}x{fh} != header "
                                f"{width}x{height}"
                            )
                        out.append(frame)
                    if ordinal >= last:
                        if not out:
                            raise ValueError(
                                "AVI holds no decodable video frames"
                            )
                        return out
                    ordinal += 1
            break
        if not out:
            raise ValueError("AVI holds no decodable video frames")
        return out
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt AVI payload: {e}") from e
