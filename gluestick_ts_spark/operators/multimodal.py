"""Multimodal (image/audio/video) column plumbing.

Scale-extension operator (SURVEY §2.2 "Extensions"): media ride as
opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
UDFs over ``mapInPandas``.

Decode is REAL for the formats pure stdlib can parse — uncompressed
BMP images and PCM WAV audio (``media_codecs.py``: pixel/sample
statistics, nearest-neighbor BMP resize, WAV time-slice frames) —
dispatched by magic-byte sniffing. Payloads in any OTHER format fall
back to a clearly-marked deterministic fake (byte-level stats), because
the compressed-codec libraries (PIL/librosa/ffmpeg) are not available
in this environment; swap ``decode_fn`` for a real codec in
production. The Spark-side plumbing — schema, Arrow batch shape,
partition sizing, UDF signature — is identical for both paths.

Scale notes: ``mapInPandas`` streams Arrow record batches; media bytes
never land on the driver. ``spark.sql.files.maxPartitionBytes`` (and
the repartition knob here) bound per-task memory: for 100 MB media
blobs you run ~32-64 rows per batch, not the 10k default —
``media_repartition`` exposes that.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .media_codecs import (
    IMAGE_DECODERS,
    avi_features,
    avi_frames,
    avi_probe,
    bmp_features,
    bmp_resize,
    gif_features,
    gif_frames,
    gif_resize,
    jpeg_features,
    jpeg_resize,
    mp3_probe,
    mp4_probe,
    png_features,
    png_resize,
    sniff_format,
    wav_decode,
    wav_features,
    wav_frames,
)

__all__ = [
    "MEDIA_METADATA_TYPE",
    "MEDIA_FEATURE_TYPE",
    "attach_media_metadata",
    "probe_media_metadata",
    "extract_media_features",
    "resize_media",
    "sample_frames",
    "media_repartition",
    "fake_decode_features",
    "real_decode_features",
    "decode_features_with_provenance",
]

# Typed metadata carried alongside the opaque payload.
MEDIA_METADATA_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),   # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("size_bytes", T.LongType(), True),
    ]
)

MEDIA_FEATURE_TYPE = T.ArrayType(T.FloatType(), True)


def attach_media_metadata(
    df: DataFrame,
    binary_col: str = "content",
    media_type: str = "image",
    fmt: str = "bin",
) -> DataFrame:
    """Add the typed metadata struct next to a binary payload column.
    Width/height/duration are NULL until a real probe fills them; size
    is computed JVM-side."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("long").alias("size_bytes"),
        ),
    )


def probe_media_metadata(
    df: DataFrame,
    binary_col: str = "content",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Fill the metadata struct from the payloads themselves via an
    Arrow-batched probe: BMP/PNG/JPEG/GIF -> real width/height
    (+ format/media_type), WAV -> real duration_ms (+ format/
    media_type), AVI -> real width/height/duration from the container
    headers alone (round 11 — media_type="video", no frame decode),
    MP4 -> real width/height/duration from the ``moov`` box walk and
    MP3 -> real duration from the MPEG frame-header scan (round 12 —
    the dominant real-crawl formats get REAL metadata even though
    their pixel/sample decode stays the labeled fake); unsniffable
    payloads keep their existing metadata untouched. Same schema in
    and out."""

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            metas = []
            for payload, meta in zip(pdf[binary_col], pdf[meta_col]):
                meta = dict(meta) if isinstance(meta, dict) else {}
                fmt = sniff_format(payload)
                try:
                    if fmt in IMAGE_DECODERS:
                        w, h, _ = IMAGE_DECODERS[fmt](payload)
                        meta.update(
                            media_type="image", format=fmt, width=w, height=h
                        )
                    elif fmt == "wav":
                        framerate, _, nframes, _ = wav_decode(payload)
                        dur = int(nframes * 1000 / framerate) if framerate else None
                        meta.update(
                            media_type="audio", format="wav", duration_ms=dur
                        )
                    elif fmt == "avi":  # round 11: header-only probe
                        vw, vh, nf, fps = avi_probe(payload)
                        meta.update(
                            media_type="video", format="avi",
                            width=vw, height=vh,
                            duration_ms=(nf * 1000 // fps) if fps else None,
                        )
                    elif fmt == "mp4":  # round 12: moov box walk
                        mw, mh, mdur = mp4_probe(payload)
                        # no video track header -> audio-only ISO BMFF
                        # (M4A/M4B podcasts sniff as mp4 too): classify
                        # audio and do NOT clobber caller width/height
                        # with None — the ValueError path's keep-caller
                        # promise applies to absent fields as well
                        if mw is None and mh is None:
                            meta.update(
                                media_type="audio", format="mp4",
                                duration_ms=mdur,
                            )
                        else:
                            meta.update(
                                media_type="video", format="mp4",
                                width=mw, height=mh, duration_ms=mdur,
                            )
                    elif fmt == "mp3":  # round 12: frame-header scan
                        hz, adur, _nf = mp3_probe(payload)
                        meta.update(
                            media_type="audio", format="mp3",
                            duration_ms=adur,
                        )
                except ValueError:
                    pass  # sniffed but undecodable: keep caller metadata
                meta.setdefault("size_bytes", len(payload) if payload else 0)
                metas.append(meta)
            pdf[meta_col] = metas
            yield pdf

    return df.mapInPandas(_mapper, schema=df.schema)


def media_repartition(df: DataFrame, rows_per_task: int, total_rows: int) -> DataFrame:
    """Bound per-task media volume: at 100 TB a task holding thousands
    of 100 MB blobs OOMs; repartition so each task sees roughly
    ``rows_per_task`` rows before the decode UDF.

    ``total_rows`` is required (an estimate is fine — partition sizing
    only needs the right order of magnitude): sizing must not trigger a
    ``count()`` job over the media table. When no estimate exists at
    all, prefer lowering ``spark.sql.files.maxPartitionBytes`` on the
    scan so the source itself yields bounded partitions.
    """
    parts = max(1, (total_rows + rows_per_task - 1) // rows_per_task)
    return df.repartition(parts)


def fake_decode_features(payload: bytes | None, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: byte-level statistics
    shaped like a feature vector. NOT a real decode — replace with
    PIL/librosa in production (kept importable so tests pin the
    contract)."""
    if payload is None:
        return [0.0] * n_features
    n = len(payload)
    if n == 0:
        return [0.0] * n_features
    # bucket byte histogram into n_features bins + simple moments
    feats = [0.0] * n_features
    for i, b in enumerate(payload[:4096]):
        feats[b % n_features] += 1.0
    total = sum(feats) or 1.0
    return [f / total for f in feats]


def decode_features_with_provenance(
    payload: bytes | None, n_features: int = 8
) -> tuple[list[float], str]:
    """Format-sniffing feature decoder that also reports WHICH decoder
    produced the vector: ``("png"|"bmp"|"jpeg"|"gif"|"wav"|"avi")``
    for a real decode,
    ``"fake"`` for the byte-stat stand-in. In a mixed corpus real and
    fake feature vectors are numerically indistinguishable, so the
    label is the only audit trail — downstream filters can drop or
    re-queue ``decoder = 'fake'`` rows once a real codec is plugged
    in.

    Round 12: MP4/MP3 payloads label ``"mp4-meta"``/``"mp3-meta"`` —
    the feature vector is still the byte-stat fake (sample decode
    needs codec libraries), but the format was positively identified
    and ``probe_media_metadata`` fills REAL duration/dimensions for
    it, so these rows are re-queueable by format, unlike anonymous
    ``"fake"`` bytes."""
    fmt = sniff_format(payload)
    try:
        if fmt == "bmp":
            return bmp_features(payload, n_features), "bmp"
        if fmt == "png":
            return png_features(payload, n_features), "png"
        if fmt == "jpeg":
            return jpeg_features(payload, n_features), "jpeg"
        if fmt == "gif":
            return gif_features(payload, n_features), "gif"
        if fmt == "wav":
            return wav_features(payload, n_features), "wav"
        if fmt == "avi":
            return avi_features(payload, n_features), "avi"
        if fmt in ("mp4", "mp3"):
            return fake_decode_features(payload, n_features), fmt + "-meta"
    except ValueError:
        # sniffed but undecodable (truncated/arithmetic/hierarchical;
        # progressive decodes for real since round 11) -> labeled fake
        pass
    return fake_decode_features(payload, n_features), "fake"


def real_decode_features(payload: bytes | None, n_features: int = 8) -> list[float]:
    """Format-sniffing feature decoder: REAL pixel statistics for BMP
    payloads and REAL audio statistics for WAV payloads
    (``media_codecs.py``); anything else (or a corrupt BMP/WAV) falls
    back to the labeled byte-stat fake so a mixed-format corpus never
    fails mid-job."""
    return decode_features_with_provenance(payload, n_features)[0]


def extract_media_features(
    df: DataFrame,
    binary_col: str = "content",
    feature_col: str = "features",
    decode_fn: Callable[[bytes | None], list[float]] | None = None,
    n_features: int = 8,
    batch_size_hint: int | None = None,
    provenance_col: str | None = "decoder",
    hash_columns: dict[str, Callable[[bytes | None], int | None]] | None = None,
) -> DataFrame:
    """Decode media payloads to feature vectors via ``mapInPandas``.

    ``decode_fn`` maps one payload to ``list[float]``; the default is
    the sniffing dispatcher — real decode for BMP/WAV, deterministic
    byte-stat fake for formats that need codec libs unavailable here.
    Custom decoders that need missing libs should raise
    ``NotImplementedError`` at import time, not per row.

    Output schema = input schema + ``feature_col array<float>`` +
    ``provenance_col string`` (``"bmp"``/``"wav"``/``"fake"``, or
    ``"custom"`` when a caller-supplied ``decode_fn`` ran — pass
    ``provenance_col=None`` to omit). The provenance column is the only
    way to tell a real decode from the fake fallback in a mixed corpus.

    ``hash_columns`` (name -> ``payload -> int | None``, e.g. the
    perceptual ``dhash_of_payload``/``wavhash_of_payload`` family)
    appends LongType hash columns in the SAME Arrow pass — at 100 TB
    the payload transfer/decode dominates, so feature extraction and
    hashing must not each pay it.
    """
    if decode_fn is None:
        dispatch = lambda b: decode_features_with_provenance(b, n_features)  # noqa: E731
    else:
        dispatch = lambda b: (decode_fn(b), "custom")  # noqa: E731
    hash_columns = hash_columns or {}
    extra = [T.StructField(feature_col, MEDIA_FEATURE_TYPE, True)]
    if provenance_col:
        extra.append(T.StructField(provenance_col, T.StringType(), True))
    extra.extend(
        T.StructField(name, T.LongType(), True) for name in hash_columns
    )
    out_schema = T.StructType(list(df.schema.fields) + extra)
    bcol = binary_col

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            payloads = list(pdf[bcol])
            decoded = [dispatch(b) for b in payloads]
            pdf[feature_col] = [feats for feats, _ in decoded]
            if provenance_col:
                pdf[provenance_col] = [label for _, label in decoded]
            for name, fn in hash_columns.items():
                pdf[name] = pd.array([fn(b) for b in payloads], dtype="Int64")
            yield pdf

    return df.mapInPandas(_mapper, schema=out_schema)


def _fake_resize(payload: bytes | None, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: nearest-neighbor byte sampling to
    ``width*height`` bytes. NOT a real image op — swap in PIL's
    ``Image.resize`` in production."""
    if not payload:
        return b""
    n_out = max(1, width * height)
    n_in = len(payload)
    step = max(1, n_in // n_out)
    return payload[::step][:n_out]


def _sniff_resize(
    payload: bytes | None, width: int, height: int
) -> tuple[bytes, str]:
    """Default resize: REAL nearest-neighbor pixel resize for
    BMP/PNG/JPEG/GIF payloads (re-encoded in the SAME container,
    labeled with the format); byte-sampling fake labeled ``"fake"``
    for everything else — including a corrupt payload of a known
    format (the ValueError fall-through)."""
    fmt = sniff_format(payload)
    if fmt in ("bmp", "png", "jpeg", "gif"):
        try:
            fn = {"bmp": bmp_resize, "png": png_resize,
                  "jpeg": jpeg_resize, "gif": gif_resize}[fmt]
            return fn(payload, width, height), fmt
        except ValueError:
            pass
    return _fake_resize(payload, width, height), "fake"


def resize_media(
    df: DataFrame,
    binary_col: str = "content",
    meta_col: str = "media_meta",
    width: int = 64,
    height: int = 64,
    resize_fn: Callable[[bytes | None, int, int], bytes] | None = None,
    provenance_col: str | None = None,
) -> DataFrame:
    """Resize media payloads via ``mapInPandas``; the metadata struct's
    width/height are updated to the target dimensions. Schema is
    unchanged by default, so resizes compose with feature extraction;
    pass ``provenance_col`` to append a string column recording which
    resizer ran per row (``"bmp"`` real / ``"fake"`` byte-sampling /
    ``"custom"``). Default ``resize_fn`` is the sniffing dispatcher: a
    real pixel resize for BMP, the labeled byte-sampling fake
    otherwise."""
    if resize_fn is None:
        dispatch = _sniff_resize
    else:
        dispatch = lambda b, w, h: (resize_fn(b, w, h), "custom")  # noqa: E731
    out_schema = df.schema
    if provenance_col:
        out_schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField(provenance_col, T.StringType(), True)]
        )

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            resized = [dispatch(b, width, height) for b in pdf[binary_col]]
            pdf[binary_col] = [payload for payload, _ in resized]
            if provenance_col:
                pdf[provenance_col] = [label for _, label in resized]
            if meta_col in pdf.columns:
                def _upd(meta):
                    if not isinstance(meta, dict):
                        return meta
                    meta = dict(meta)
                    meta["width"] = width
                    meta["height"] = height
                    meta["size_bytes"] = width * height
                    return meta
                pdf[meta_col] = pdf[meta_col].map(_upd)
            yield pdf

    return df.mapInPandas(_mapper, schema=out_schema)


def _fake_frames(payload: bytes | None, n_frames: int) -> list[bytes]:
    """Deterministic frame-sample stand-in: split the payload into
    ``n_frames`` contiguous chunks (a real implementation seeks ffmpeg
    keyframes)."""
    if not payload:
        return []
    n = len(payload)
    size = max(1, n // n_frames)
    return [payload[i * size : (i + 1) * size] for i in range(min(n_frames, n))]


def _sniff_frames(payload: bytes | None, n_frames: int) -> tuple[list[bytes], str]:
    """Default frame sampler: REAL time-slice windows for WAV payloads
    (each frame is itself a valid, decodable WAV, labeled ``"wav"``),
    REAL composed animation frames for GIF payloads (round 10 — each
    frame re-encoded as a standalone PNG, labeled ``"gif"``; see
    ``media_codecs.gif_frames`` for why PNG), and REAL video frames
    for MJPEG AVIs (round 11 — each frame the embedded standalone
    JPEG, a pure demux, labeled ``"avi"``); contiguous byte-chunk fake
    labeled ``"fake"`` for everything else (non-MJPEG video codecs
    need ffmpeg)."""
    fmt = sniff_format(payload)
    if fmt == "wav":
        try:
            return wav_frames(payload, n_frames), "wav"
        except ValueError:
            pass
    elif fmt == "gif":
        try:
            return gif_frames(payload, n_frames), "gif"
        except ValueError:
            pass
    elif fmt == "avi":  # round 11: REAL video frames (MJPEG demux)
        try:
            return avi_frames(payload, n_frames), "avi"
        except ValueError:
            pass
    return _fake_frames(payload, n_frames), "fake"


def sample_frames(
    df: DataFrame,
    binary_col: str = "content",
    n_frames: int = 4,
    frame_fn: Callable[[bytes | None, int], list[bytes]] | None = None,
    provenance_col: str | None = None,
) -> DataFrame:
    """Sample ``n_frames`` frames per video payload: one OUTPUT ROW per
    frame with ``frame_idx int`` + ``frame binary`` appended (the
    video's own payload column is dropped — frames replace it). Row
    explosion happens inside the Arrow batch, so a task's memory is
    bounded by batch size × frames, never the whole video table.
    Default ``frame_fn`` is the sniffing dispatcher: real WAV
    time-slices, labeled byte-chunk fake otherwise; pass
    ``provenance_col`` to append which sampler ran (``"wav"`` /
    ``"fake"`` / ``"custom"``, replicated onto each frame row)."""
    if frame_fn is None:
        dispatch = _sniff_frames
    else:
        dispatch = lambda b, n: (frame_fn(b, n), "custom")  # noqa: E731
    keep = [f for f in df.schema.fields if f.name != binary_col]
    extra = [
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
    if provenance_col:
        extra.append(T.StructField(provenance_col, T.StringType(), True))
    out_schema = T.StructType(keep + extra)
    keep_names = [f.name for f in keep]
    out_names = [f.name for f in out_schema.fields]

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Columnar explode: one pass over zipped columns (no
        # iterrows/per-row pandas indexing in the hot loop).
        for pdf in batches:
            sampled = [dispatch(payload, n_frames) for payload in pdf[binary_col]]
            frame_lists = [fl for fl, _ in sampled]
            counts = [len(fl) for fl in frame_lists]
            data = {
                k: [v for v, c in zip(pdf[k], counts) for _ in range(c)]
                for k in keep_names
            }
            data["frame_idx"] = [i for c in counts for i in range(c)]
            data["frame"] = [frame for fl in frame_lists for frame in fl]
            if provenance_col:
                data[provenance_col] = [
                    label for (_, label), c in zip(sampled, counts) for _ in range(c)
                ]
            yield pd.DataFrame(data, columns=out_names)

    return df.mapInPandas(_mapper, schema=out_schema)
