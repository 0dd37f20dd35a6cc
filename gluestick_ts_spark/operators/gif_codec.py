"""Pure-stdlib GIF codec (``media_codecs``' fifth format).

Round 10 follow-on to the JPEG codec: the r9 verdict named "JPEG (and
GIF) decode" as the perceptual-dedup gap — GIF is the remaining
non-trivial crawl image format (BMP/PNG already decode). The DECODER
is general for real crawl GIFs: GIF87a/GIF89a, global and local color
tables, interlaced images (the four-pass row order), full LZW with
table growth/12-bit cap/CLEAR handling, extension-block skipping, and
frame composition at (left, top) on the logical screen. ANIMATION is
deliberately first-frame-only (documented): for dedup/feature
purposes the first frame is the perceptual identity, and decoding a
whole animation per payload is exactly the per-row waste the Arrow
mappers exist to avoid.

The ENCODER is a fixture tool (like ``jpeg_encode``): at most 256
distinct colors (raises beyond — a real quantizer is out of scope),
literal-code LZW with spec-faithful code-width bookkeeping, CLEAR
resets before the 12-bit ceiling. Lossless — a GIF re-encode of an
image decodes to the EXACT source pixels, which makes GIF twins
byte-stable dedup fixtures.

Determinism: everything is integer table lookups and byte packing —
a pure, platform-exact function of the bytes, literal-embeddable in
oracles (the ``imagehash`` requirement). The reference has no media
code at all (scale-extension surface, SURVEY §2.2).
"""

from __future__ import annotations

import struct

__all__ = ["gif_decode", "gif_decode_frames", "gif_encode"]


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF-flavor LZW (LSB-first bit packing, CLEAR/END codes, table
    grows by one entry per post-first code, code width grows when the
    next slot reaches 2^width, 12-bit cap)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [[i] for i in range(clear)] + [None, None]

    out: list[int] = []
    table = list(base)
    code_size = min_code_size + 1
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= n:
                return out  # truncated stream: return what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError("invalid first LZW code")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError("invalid LZW code")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


# cap header-declared dimensions BEFORE allocating the canvas: a
# 14-byte payload can declare 65535x65535 (a multi-GB Python list) and
# OOM the executor before any validity check fires — and unlike JPEG,
# LZW legitimately expands small payloads, so the cap is absolute
# rather than payload-proportional.
_MAX_PIXELS = 1 << 24


def gif_decode(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode a GIF's FIRST frame to ``(width, height, pixels)``
    row-major top-down ``(r, g, b)`` tuples over the logical screen —
    the ``bmp_decode``/``png_decode``/``jpeg_decode`` contract. Areas
    the first frame doesn't cover — and its TRANSPARENT pixels (GCE
    transparency index) — show the background color (or black with no
    global table). Raises ``ValueError`` for non-GIF/corrupt/truncated
    payloads and images beyond ``_MAX_PIXELS``."""
    w, h, frames = gif_decode_frames(payload, max_frames=1)
    return w, h, frames[0]


def gif_decode_frames(
    payload: bytes, max_frames: int | None = None
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode UP TO ``max_frames`` composed frames of a (possibly
    animated) GIF: ``(width, height, [frame_pixels, ...])``, each frame
    the full logical screen AS RENDERED at that point of the animation
    — cumulative composition with GCE transparency honored and disposal
    method 2 (restore-to-background) applied between frames (method 3,
    restore-to-previous, is treated as leave-in-place — a documented
    simplification; it is rare in crawl GIFs). The per-payload cost is
    bounded by ``max_frames``, so samplers never pay for a whole
    animation to take a few frames. Raises ``ValueError`` (never a raw
    struct/index error) for corrupt/truncated payloads — the contract
    every Arrow fallback path catches."""
    try:
        return _gif_decode_frames_impl(payload, max_frames)
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF payload: {e}") from e


def _gif_decode_frames_impl(
    payload: bytes, max_frames: int | None = None
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    width, height = struct.unpack_from("<HH", payload, 6)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate GIF dimensions")
    if width * height > _MAX_PIXELS:
        raise ValueError(f"GIF too large: {width}x{height}")
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    global_table: list[tuple[int, int, int]] | None = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        raw = payload[pos : pos + 3 * size]
        if len(raw) < 3 * size:
            raise ValueError("truncated GIF global color table")
        global_table = [tuple(raw[i : i + 3]) for i in range(0, 3 * size, 3)]
        pos += 3 * size

    def skip_subblocks(p: int) -> int:
        while p < len(payload) and payload[p]:
            p += 1 + payload[p]
        return p + 1

    bg = (
        global_table[bg_index]
        if global_table and bg_index < len(global_table)
        else (0, 0, 0)
    )
    canvas = [bg] * (width * height)
    frames: list[list[tuple[int, int, int]]] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            # Graphic Control Extension: honor the transparency index
            # and disposal method for the frame it precedes (a
            # transparent pixel shows what is already on the canvas);
            # every other extension is skipped
            if payload[pos + 1] == 0xF9 and payload[pos + 2] >= 4:
                gce_packed = payload[pos + 3]
                transparent = payload[pos + 6] if gce_packed & 0x01 else None
                disposal = (gce_packed >> 2) & 0x07
            pos = skip_subblocks(pos + 2)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
        if iw * ih > _MAX_PIXELS:
            # the logical-screen cap alone is not enough: the image
            # descriptor's own dimensions drive the LZW output size,
            # and a 4x4-screen payload declaring a 65535x65535 frame
            # would otherwise expand unboundedly before any check
            raise ValueError(f"GIF frame too large: {iw}x{ih}")
        ipacked = payload[pos + 9]
        pos += 10
        table = global_table
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            raw = payload[pos : pos + 3 * size]
            if len(raw) < 3 * size:
                raise ValueError("truncated GIF local color table")
            table = [tuple(raw[i : i + 3]) for i in range(0, 3 * size, 3)]
            pos += 3 * size
        if table is None:
            raise ValueError("GIF image with no color table")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"invalid LZW min code size {min_code_size}")
        data = bytearray()
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(bytes(data), min_code_size, iw * ih)
        if len(indices) < iw * ih:
            raise ValueError("truncated GIF image data")
        # row order: sequential, or the four interlace passes
        if ipacked & 0x40:
            rows = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
        else:
            rows = list(range(ih))
        nt = len(table)
        for src_r, dst_r in enumerate(rows):
            y = top + dst_r
            if y >= height:
                continue
            base = src_r * iw
            for x in range(min(iw, width - left)):
                idx = indices[base + x]
                if idx < nt and idx != transparent:
                    canvas[y * width + left + x] = table[idx]
        frames.append(list(canvas))
        if max_frames is not None and len(frames) >= max_frames:
            return width, height, frames
        if disposal == 2:  # restore the frame's rect to background
            for y in range(top, min(top + ih, height)):
                row = y * width
                for x in range(left, min(left + iw, width)):
                    canvas[row + x] = bg
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image block")
    return width, height, frames


def gif_encode(
    width: int, height: int, pixels: list[tuple[int, int, int]]
) -> bytes:
    """Encode row-major top-down ``(r, g, b)`` pixels as a valid
    GIF89a (single frame, global palette). Lossless; raises
    ``ValueError`` beyond 256 distinct colors (a fixture encoder, not
    a quantizer). LZW emits literal codes with spec-faithful width
    bookkeeping and CLEAR resets, so any conformant decoder — not
    just ours — reads it."""
    if width <= 0 or height <= 0:
        raise ValueError("degenerate image dimensions")
    if len(pixels) != width * height:
        raise ValueError("pixel count does not match dimensions")
    palette: dict[tuple[int, int, int], int] = {}
    for p in pixels:
        if p not in palette:
            if len(palette) == 256:
                raise ValueError("gif_encode supports at most 256 colors")
            palette[p] = len(palette)
    bits = 2
    while (1 << bits) < len(palette):
        bits += 1
    table_size = 1 << bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (bits - 1), 0, 0])  # global table, bg 0, aspect 0
    for color, _ in sorted(palette.items(), key=lambda kv: kv[1]):
        out += bytes(color)
    out += b"\x00\x00\x00" * (table_size - len(palette))
    # image descriptor: full screen, no local table, not interlaced
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    min_code_size = max(2, bits)
    out.append(min_code_size)

    clear = 1 << min_code_size
    end = clear + 1
    acc = 0
    nbits = 0
    body = bytearray()
    code_size = min_code_size + 1
    next_code = end + 1
    first_since_clear = True

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for p in pixels:
        emit(palette[p])
        # mirror the decoder's bookkeeping: every code after the first
        # since CLEAR adds a table entry; width grows when the next
        # slot reaches 2^width; reset comfortably before the 12-bit cap
        if first_since_clear:
            first_since_clear = False
            continue
        next_code += 1
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4094:
            emit(clear)
            code_size = min_code_size + 1
            next_code = end + 1
            first_since_clear = True
    emit(end)
    if nbits:
        body.append(acc & 0xFF)
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)
