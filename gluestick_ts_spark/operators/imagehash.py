"""Perceptual image hashing + Hamming near-dup pairs — the multimodal
half of the dedup family (the reference has no media operators; this
is a scale-extension surface like ``multimodal.py``).

- ``dhash_of_payload`` / ``ahash_of_payload``: pure-Python 64-bit
  difference-hash / average-hash over the repo's own stdlib BMP/PNG
  decoders (``media_codecs.py``). Integer-only arithmetic throughout
  (luma = (299r+587g+114b)//1000, floor mean, nearest-neighbor index
  maps), so a hash is bit-identical on every platform and can embed as
  a SQL literal for DuckDB oracles — the ``_mm_synth_payload``
  pattern.
- ``image_dhash``: the distributed column — Arrow ``mapInPandas``
  batches, one decode per payload, NULL for undecodable/non-image
  payloads (the labeled-fake philosophy of ``multimodal.py``: a mixed
  corpus never fails mid-job).
- ``hamming_neardup_pairs``: pigeonhole-banded Hamming join over ANY
  64-bit hash column (the ``simhash_pairs`` machinery generalized to a
  precomputed column): split the hash into ``n_blocks > max_hamming``
  bands; any pair within ``max_hamming`` agrees on >= 1 full band, so
  banding has recall 1.0 and the exact ``bit_count(xor)`` post-filter
  makes the output EQUAL the quadratic pair set — what the SQL oracle
  brute-forces. Candidates come from equi-joins on (block, value);
  never a cross join.

100 TB shape: hashing is map-only (the image bytes never shuffle — the
64-bit hash column is what moves); the band join keys are short and
AQE-skew-splittable. A solid-color corpus degenerates to one band
bucket — the same hot-value caveat ``simhash_pairs`` documents; the
join (not a bucket groupBy) keeps it inside AQE's skew-split reach.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .media_codecs import bmp_decode, png_decode, sniff_format

__all__ = [
    "dhash_of_payload",
    "ahash_of_payload",
    "wavhash_of_payload",
    "image_dhash",
    "media_hashes",
    "hamming_neardup_pairs",
]


def _gray_grid(payload: bytes, out_w: int, out_h: int) -> list[list[int]] | None:
    """Decode a BMP/PNG payload and nearest-neighbor-resize its
    integer luma plane to ``out_w x out_h``. None when the payload is
    not a decodable image."""
    fmt = sniff_format(payload)
    if fmt not in ("bmp", "png"):
        return None
    try:
        w, h, px = (bmp_decode if fmt == "bmp" else png_decode)(payload)
    except ValueError:
        return None
    if w <= 0 or h <= 0:
        return None
    grid = []
    for oy in range(out_h):
        sy = (oy * h) // out_h
        row = []
        for ox in range(out_w):
            sx = (ox * w) // out_w
            r, g, b = px[sy * w + sx]
            row.append((299 * r + 587 * g + 114 * b) // 1000)
        grid.append(row)
    return grid


def dhash_of_payload(payload: bytes | None, hash_size: int = 8) -> int | None:
    """64-bit (for the default size 8) difference hash: resize the
    luma plane to ``(hash_size+1) x hash_size``, bit ``y*size + x`` set
    iff ``luma[y][x] > luma[y][x+1]`` (the standard dHash). Returns a
    SIGNED 64-bit int (bit 63 may be set), matching Spark LongType."""
    if payload is None:
        return None
    grid = _gray_grid(payload, hash_size + 1, hash_size)
    if grid is None:
        return None
    v = 0
    for y in range(hash_size):
        for x in range(hash_size):
            if grid[y][x] > grid[y][x + 1]:
                v |= 1 << (y * hash_size + x)
    return v - (1 << 64) if v >= 1 << 63 else v


def ahash_of_payload(payload: bytes | None, hash_size: int = 8) -> int | None:
    """Average hash: ``hash_size x hash_size`` luma grid, bit set iff
    the pixel exceeds the FLOOR mean (integer division keeps the
    threshold engine-exact)."""
    if payload is None:
        return None
    grid = _gray_grid(payload, hash_size, hash_size)
    if grid is None:
        return None
    flat = [v for row in grid for v in row]
    mean = sum(flat) // len(flat)
    v = 0
    for i, lum in enumerate(flat):
        if lum > mean:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v


def wavhash_of_payload(payload: bytes | None, hash_size: int = 8) -> int | None:
    """64-bit audio "energy dHash" for PCM WAV payloads — the audio
    twin of ``dhash_of_payload``: split the raw integer samples into
    ``hash_size**2 + 1`` equal time windows, bit ``i`` set iff
    ``sum(|s|)`` of window ``i`` exceeds window ``i+1``. Pure integer
    arithmetic over the decoded sample words (no float normalization),
    so the hash is bit-identical everywhere and SQL-literal-embeddable.
    Robust to amplitude-preserving near-dups (re-trims, low-level
    noise flip only near-tie windows); NOT a chromaprint — frequency
    shifts change it, which is the right behavior for exact-ish
    re-encode detection. None for non-WAV/undecodable payloads."""
    import io
    import struct
    import wave

    if payload is None or sniff_format(payload) != "wav":
        return None
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            sampwidth = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError):
        return None
    fmt = {1: "b", 2: "h", 4: "i"}.get(sampwidth)
    if fmt is None:
        return None
    count = len(raw) // sampwidth
    if count == 0:
        return None
    vals = struct.unpack(f"<{count}{fmt}", raw[: count * sampwidth])
    n_win = hash_size * hash_size + 1
    energies = []
    for i in range(n_win):
        lo = (i * count) // n_win
        hi = ((i + 1) * count) // n_win
        energies.append(sum(abs(v) for v in vals[lo:hi]))
    v = 0
    for i in range(hash_size * hash_size):
        if energies[i] > energies[i + 1]:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v


def media_hashes(
    df: DataFrame,
    binary_col: str = "content",
    columns: dict | None = None,
    hash_size: int = 8,
) -> DataFrame:
    """Append SEVERAL perceptual-hash columns in ONE Arrow pass (one
    decode stage for the whole family — at scale the payload bytes are
    the cost, not the per-hash arithmetic). ``columns`` maps column
    name -> ``payload -> int | None``; default
    ``{"dhash": dhash_of_payload, "wavhash": wavhash_of_payload}`` —
    images hash into ``dhash`` (wavhash NULL) and WAVs into
    ``wavhash`` (dhash NULL)."""
    if columns is None:
        columns = {"dhash": dhash_of_payload, "wavhash": wavhash_of_payload}
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(name, T.LongType(), True) for name in columns]
    )

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            payloads = list(pdf[binary_col])
            for name, fn in columns.items():
                pdf[name] = pd.array(
                    [fn(b, hash_size) for b in payloads], dtype="Int64"
                )
            yield pdf

    return df.mapInPandas(_mapper, schema=out_schema)


def image_dhash(
    df: DataFrame,
    binary_col: str = "content",
    hash_col: str = "dhash",
    hash_size: int = 8,
    kind: str = "dhash",
) -> DataFrame:
    """Append the perceptual hash column (``long``, NULL for
    non-image/undecodable payloads) — the single-column convenience
    form of ``media_hashes`` (one shared Arrow mapper, not a third
    copy of it)."""
    if kind not in ("dhash", "ahash"):
        raise ValueError(f"kind must be 'dhash' or 'ahash', got {kind!r}")
    fn = dhash_of_payload if kind == "dhash" else ahash_of_payload
    return media_hashes(df, binary_col, {hash_col: fn}, hash_size)


def hamming_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 6,
    n_blocks: int | None = None,
) -> DataFrame:
    """All pairs ``(id_a < id_b, hamming)`` with Hamming distance <=
    ``max_hamming`` between 64-bit hashes. NULL hashes are dropped (an
    undecodable image can't near-dup anything). Pigeonhole blocking
    with ``n_blocks > max_hamming`` keeps recall exactly 1.0 (see
    module docstring), so the output EQUALS the quadratic definition —
    the brute-force SQL oracle's formulation.

    Output: ``id_a, id_b, hamming`` (hamming as long).
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(
            f"max_hamming must be in [0, 63], got {max_hamming} — at >= 64 "
            "every 64-bit pair matches; emit a cross join deliberately if "
            "that is really what you want"
        )
    if n_blocks is None:
        # n_blocks > max_hamming always has a legal value up to 64
        # (one block per bit); cap at 64, not 32, so max_hamming in
        # [32, 63] gets a working default instead of a refusal
        n_blocks = min(max_hamming + 1, 64)
    if n_blocks <= max_hamming:
        raise ValueError(
            f"n_blocks ({n_blocks}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole recall guarantee"
        )
    bits_per = max(1, 64 // n_blocks)
    h = df.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("__h")
    )
    if n_blocks == 1:
        # exact-duplicate search (max_hamming=0): the single "band" is
        # the whole hash — no mask (a 64-bit all-ones literal overflows
        # LongType), no shift
        block_exprs = [F.col("__h")]
    else:
        mask = (1 << bits_per) - 1
        block_exprs = [
            F.shiftright(F.col("__h"), i * bits_per).bitwiseAND(F.lit(mask))
            for i in range(n_blocks)
        ]
    blocks = h.select(
        "id",
        "__h",
        F.posexplode(F.array(*block_exprs)).alias("block", "block_val"),
    )
    blocks = blocks.persist()
    try:
        a = blocks.select(
            F.col("id").alias("id_a"), F.col("__h").alias("__ha"), "block", "block_val"
        )
        b = blocks.select(
            F.col("id").alias("id_b"), F.col("__h").alias("__hb"), "block", "block_val"
        )
        hamming = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
        pairs = (
            a.join(b, on=["block", "block_val"])
            .where(F.col("id_a") < F.col("id_b"))
            .where(hamming <= max_hamming)
            .select("id_a", "id_b", hamming.cast("long").alias("hamming"))
            .distinct()
        )
        return pairs.localCheckpoint(eager=True)
    finally:
        blocks.unpersist()
