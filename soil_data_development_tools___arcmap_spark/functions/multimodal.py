"""Multimodal (binary) column operators for the training-data pipeline.

Images/audio/video are carried as opaque ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched Pandas functions over ``mapInPandas`` (the 10-100x
faster path vs row-at-a-time Python UDFs — batch in, batch out, zero
per-row Python call overhead).

Codec policy (optional dependencies): the default ``fake`` codec is a
deterministic byte-level decoder that keeps every piece of Spark-side
plumbing real and testable without any media library — schema,
partitioning, UDF signature, Arrow batch shape, multi-row (frame)
fan-out. The ``ppm`` (binary P6 image) and WAV
(RIFF mono 16-bit PCM) codecs are REAL decoders with zero
dependencies, so a genuine image and audio decode path runs — and is
oracle-gated — even in this codec-less container. The ``png`` codec
is a REAL pillow-backed decode/resize path
taken whenever ``PIL`` imports (an extras dependency); when it does
not — as in this container — requesting it raises
``NotImplementedError`` at plan-build time (fail-fast on the driver,
never half-way through a 100 TB job on the executors). Compressed
audio/video codecs (librosa / av) remain declared stubs.

Scale notes: payloads stay inside the executors end-to-end (no
collect); ``_spread`` repartitions before the Pandas stages so Arrow
batches form on all cores; with real media, tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` down so a batch of
payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread

#: formats assigned round-robin by id — stands in for real sniffing
MEDIA_FORMATS = ["png", "wav", "mp4"]

REAL_CODECS = {"png": "PIL", "wav": "librosa", "mp4": "av"}


def codec_available(codec: str) -> bool:
    """True when the optional library backing ``codec`` imports
    ('fake' and 'ppm' need nothing). Driver-side check so unavailable
    codecs fail at plan build, not mid-job on an executor."""
    if codec in ("fake", "ppm"):
        return True
    import importlib.util

    lib = REAL_CODECS.get(codec)
    return lib is not None and importlib.util.find_spec(lib) is not None


def _require_codec(codec: str) -> None:
    if codec in ("fake", "ppm", "png"):
        if codec_available(codec):
            return
    lib = REAL_CODECS.get(codec, codec)
    raise NotImplementedError(
        f"codec {codec!r} needs the optional dependency {lib!r}, which is "
        "not installed; use codec='fake' for the deterministic byte decoder"
    )


# ----------------------------------------------------------- PPM codec
# Dependency-free REAL image format (same policy as the repo's GeoTIFF/
# PDF/shapefile byte codecs): binary PPM "P6" — 3-field ASCII header +
# raw RGB triplets. Lets the real decode path run where pillow isn't
# installed, and gives the gate an image pipeline whose pixel
# arithmetic an SQL oracle can reproduce exactly.

#: integer ITU-R 601 luma — exact in every engine (no float)
def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6, maxval 255). ``rgb`` = row-major R,G,B bytes."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length != 3*width*height")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def encode_wav_pcm16(sample_rate: int, samples: list[int]) -> bytes:
    """Mono 16-bit PCM WAV (RIFF) from signed samples — stdlib only."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,
        2,
        16,
        b"data",
        len(data),
    )
    return hdr + data


def decode_wav_pcm16(blob: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, n_samples, all samples) from a mono 16-bit PCM
    RIFF WAV — the real audio-decode path, zero dependencies. Walks
    the chunk list (so writers that add LIST/fact chunks still parse),
    accepts only the PCM/mono/16-bit form ``encode_wav_pcm16`` emits."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, rate, data = 12, None, None
    while i + 8 <= len(blob):
        cid, size = blob[i : i + 4], struct.unpack("<I", blob[i + 4 : i + 8])[0]
        body = blob[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if (fmt, ch, bits) != (1, 1, 16):
                raise ValueError("only mono 16-bit PCM supported")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: 2 * n]))
    return rate, n, samples


def decode_ppm(blob: bytes) -> tuple[int, int, list[int]]:
    """(height, width, row-major GRAYSCALE pixels) from a P6 PPM.

    Accepts the canonical whitespace-separated header (comments
    excluded — this is a data-plane codec, not a file importer);
    maxval must be 255 (the only form ``encode_ppm`` emits)."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        fields.append(int(blob[i:j]))
        i = j
    i += 1  # the single whitespace byte after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    px = blob[i : i + 3 * width * height]
    if len(px) != 3 * width * height:
        raise ValueError("truncated pixel data")
    gray = [
        _luma(px[3 * k], px[3 * k + 1], px[3 * k + 2])
        for k in range(width * height)
    ]
    return height, width, gray


def attach_media(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """(did, media binary, meta struct<n_bytes,content_md5,format>).

    The payload is the UTF-8 encoding of the text column — a
    deterministic stand-in for real media bytes; the metadata struct is
    the pattern for typed sidecar info (dimensions, codec, duration).
    """
    payload = F.encode(F.col(col), "UTF-8")
    fmt = F.element_at(
        F.array(*[F.lit(x) for x in MEDIA_FORMATS]),
        (F.col(id_col) % len(MEDIA_FORMATS) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("did"),
        payload.alias("media"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
            fmt.alias("format"),
        ).alias("meta"),
    )


def media_metadata(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Flattened metadata view — pure JVM-side Column expressions (no
    Python), the cheap first pass a 100 TB media crawl would run."""
    m = attach_media(df, id_col, col)
    return m.select(
        "did",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
        F.col("meta.format").alias("format"),
    )


_FEATURES_SCHEMA = "did long, n_bytes int, n_space int, side int"


def media_features(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Byte-level feature extraction via mapInPandas: payload size,
    0x20-byte count (stand-in for a content histogram) and the fake
    decoder's square-image side = isqrt(n_bytes)."""
    media = _spread(attach_media(df, id_col, col).select("did", "media"), "did")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf["media"].map(len)
            yield pd.DataFrame(
                {
                    "did": pdf["did"],
                    "n_bytes": n,
                    "n_space": pdf["media"].map(lambda b: b.count(b" ")),
                    "side": n.map(math.isqrt),
                }
            )

    return media.mapInPandas(batches, _FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    frame_bytes: int = 64,
    every: int = 4,
    spread: bool = True,
) -> DataFrame:
    """Frame sampling: treat the payload as a stream of fixed-size
    frames, keep every Nth — the video-keyframe pattern. One input row
    fans out to many output rows (mapInPandas as a UDTF).

    ``spread=False`` when the caller already partitioned the input
    (e.g. spread the id frame BEFORE synthesizing the payload) — the
    default repartition here moves the PAYLOADS through an exchange,
    which a synthesized or column-derived payload never needs."""
    media = attach_media(df, id_col, col).select("did", "media")
    if spread:
        media = _spread(media, "did")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dids, idxs, md5s = [], [], []
            for did, blob in zip(pdf["did"], pdf["media"]):
                nframes = (len(blob) + frame_bytes - 1) // frame_bytes
                for i in range(0, nframes, every):
                    dids.append(did)
                    idxs.append(i)
                    md5s.append(
                        hashlib.md5(
                            blob[i * frame_bytes : (i + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame({"did": dids, "frame_idx": idxs, "frame_md5": md5s})

    return media.mapInPandas(batches, "did long, frame_idx int, frame_md5 string")


def decode_media(
    df: DataFrame | None,
    id_col: str = "doc_id",
    col: str = "text",
    codec: str = "fake",
    media: DataFrame | None = None,
) -> DataFrame:
    """Decode payloads to (did, height, width, head array<int>).

    ``codec='fake'`` interprets the bytes as a side×side grayscale
    image (side = isqrt(n_bytes)) and returns the first 16 pixel
    values — deterministic, library-free. ``codec='ppm'`` is a REAL
    image decode with zero dependencies (binary P6 parse + integer
    ITU-R 601 grayscale — see ``decode_ppm``), so the genuine decode
    path runs and is gate-checked even in codec-less containers.
    ``codec='png'`` is the pillow-backed
    decode: pillow opens each payload inside the Arrow batch loop
    (grayscale-converted; head = first 16 pixels row-major) — taken
    only when the optional ``PIL`` dependency imports, else
    ``NotImplementedError`` at plan build. The Spark plumbing (schema,
    batching, partitioning) is identical either way.

    ``media`` overrides the text-derived stand-in payloads with a real
    (did, media binary) DataFrame — the production entry point.
    """
    _require_codec(codec)
    src = media if media is not None else attach_media(df, id_col, col)
    m = _spread(src.select("did", "media"), "did")

    if codec == "fake":

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                sides = pdf["media"].map(lambda b: math.isqrt(len(b)))
                yield pd.DataFrame(
                    {
                        "did": pdf["did"],
                        "height": sides,
                        "width": sides,
                        "head": pdf["media"].map(
                            lambda b: [int(x) for x in b[:16]]
                        ),
                    }
                )

    elif codec == "ppm":

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                decoded = pdf["media"].map(lambda b: decode_ppm(bytes(b)))
                yield pd.DataFrame(
                    {
                        "did": pdf["did"],
                        "height": decoded.map(lambda t: t[0]),
                        "width": decoded.map(lambda t: t[1]),
                        "head": decoded.map(lambda t: t[2][:16]),
                    }
                )

    else:

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from PIL import Image

            def one(blob: bytes):
                with Image.open(io.BytesIO(bytes(blob))) as img:
                    g = img.convert("L")
                    px = list(g.getdata())
                    return g.height, g.width, [int(x) for x in px[:16]]

            for pdf in it:
                decoded = pdf["media"].map(one)
                yield pd.DataFrame(
                    {
                        "did": pdf["did"],
                        "height": decoded.map(lambda t: t[0]),
                        "width": decoded.map(lambda t: t[1]),
                        "head": decoded.map(lambda t: t[2]),
                    }
                )

    return m.mapInPandas(batches, "did long, height int, width int, head array<int>")


def resize_media(
    df: DataFrame | None,
    id_col: str = "doc_id",
    col: str = "text",
    out_side: int = 8,
    codec: str = "fake",
    media: DataFrame | None = None,
) -> DataFrame:
    """Resize to out_side×out_side; returns the resized pixel grid's
    md5 + byte count. ``fake`` stride-samples the byte grid
    (library-free); ``png`` is the real pillow path
    (grayscale + NEAREST resample — deterministic across pillow
    versions, unlike antialiased filters) behind the same optional-
    dependency gate as ``decode_media``."""
    _require_codec(codec)
    src = media if media is not None else attach_media(df, id_col, col)
    m = _spread(src.select("did", "media"), "did")

    if codec == "fake":

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            def one(blob: bytes) -> bytes:
                side = math.isqrt(len(blob))
                if side == 0:
                    return b""
                stride = max(side // out_side, 1)
                return bytes(
                    blob[r * side + c]
                    for r in range(0, side, stride)
                    for c in range(0, side, stride)
                )

            for pdf in it:
                resized = pdf["media"].map(one)
                yield pd.DataFrame(
                    {
                        "did": pdf["did"],
                        "out_bytes": resized.map(len),
                        "out_md5": resized.map(
                            lambda b: hashlib.md5(b).hexdigest()
                        ),
                    }
                )

    elif codec == "ppm":

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            def one(blob: bytes) -> bytes:
                h, w, gray = decode_ppm(bytes(blob))
                # NEAREST sampling at fixed integer strides — the same
                # rule as the fake codec, on the decoded gray grid
                sr, sc = max(h // out_side, 1), max(w // out_side, 1)
                return bytes(
                    gray[r * w + c]
                    for r in range(0, h, sr)
                    for c in range(0, w, sc)
                )

            for pdf in it:
                resized = pdf["media"].map(one)
                yield pd.DataFrame(
                    {
                        "did": pdf["did"],
                        "out_bytes": resized.map(len),
                        "out_md5": resized.map(
                            lambda b: hashlib.md5(b).hexdigest()
                        ),
                    }
                )

    else:

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from PIL import Image

            def one(blob: bytes) -> bytes:
                with Image.open(io.BytesIO(bytes(blob))) as img:
                    g = img.convert("L").resize(
                        (out_side, out_side), Image.Resampling.NEAREST
                    )
                    return g.tobytes()

            for pdf in it:
                resized = pdf["media"].map(one)
                yield pd.DataFrame(
                    {
                        "did": pdf["did"],
                        "out_bytes": resized.map(len),
                        "out_md5": resized.map(
                            lambda b: hashlib.md5(b).hexdigest()
                        ),
                    }
                )

    return m.mapInPandas(batches, "did long, out_bytes int, out_md5 string")


def audio_features(media: DataFrame) -> DataFrame:
    """Real audio decode + feature extraction over (did, media) WAV
    payloads: sample rate, sample count, Σ|s| (integer loudness
    stand-in for RMS — exact across engines) and peak amplitude. Same
    Arrow-batched mapInPandas shape as the image path; payloads never
    leave the executors."""
    m = _spread(media.select("did", "media"), "did")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["media"].map(lambda b: decode_wav_pcm16(bytes(b)))
            yield pd.DataFrame(
                {
                    "did": pdf["did"],
                    "sample_rate": decoded.map(lambda t: t[0]),
                    "n_samples": decoded.map(lambda t: t[1]),
                    "abs_sum": decoded.map(
                        lambda t: sum(abs(s) for s in t[2])
                    ),
                    "peak": decoded.map(
                        lambda t: max((abs(s) for s in t[2]), default=0)
                    ),
                }
            )

    return m.mapInPandas(
        batches,
        "did long, sample_rate int, n_samples int, abs_sum long, peak int",
    )


def ingest_mix_group(d: int, scale: int = 1) -> int:
    """Piecewise planted-group seed that yields all three ingest-gate
    outcomes at once (the pure-modulus seeds cannot: an odd modulus
    puts both parities in every multi-member class → everything is a
    corpus dup; an even modulus single-parities every class → nothing
    is). 40% of ids share small cross-parity classes (corpus dups),
    40% fall in parity-separated 8-blocks (within-stream dup chains
    among the odd ids), 20% are singletons (novel admits). The three
    families interleave mod 3, so they are disjoint without any
    corpus-size constant; ``scale`` grows the small-class count with a
    replica factor so planted dup-group size — and hence gate match
    fan-out and admitted-state growth — stays constant as the corpus
    scales (the same rule every other scale harness applies).
    Mirrored verbatim by the oracle SQL CASE (oracles._MIX_G). The
    scaled small-class modulus is forced ODD: an even modulus puts
    every class on a single parity (members differ by a multiple of
    it), which would empty the dup_corpus outcome at every even
    factor — the round-9 video harness caught exactly that (scale=1
    keeps the original 23, so registered-query hashes are
    untouched)."""
    if d % 5 < 2:
        m = 23 * scale
        return 3 * (d % (m + 1 - m % 2))
    if d % 5 < 4:
        return 3 * (2 * (d // 8) + d % 2) + 1
    return 3 * d + 2


#: ingest-mix hash bound: group seeds reduce mod 2**22 before the
#: multiplicative hash so every product stays under 2**63 in BOTH
#: engines (DuckDB BIGINT vs Python bignum) — the worst factor is the
#: image channel index 3*255+3, giving 2**22 * 768 * 2654435761 < 2**63
_MIX_HASH_MOD = 4194304
_MIX_HASH_MUL = 2654435761


def planted_images(
    df: DataFrame, base_mod: int = 37, spread: bool = True,
    group_mode: str = "mod", scale: int = 1,
) -> DataFrame:
    """(did, media) — deterministic 16×16 PPM images synthesized per
    doc_id ON THE EXECUTORS: a base pattern keyed doc_id % base_mod
    (the planted duplicate group) plus a uniform brightness offset
    doc_id % 7 (channel bases stay ≤239 and the offset ≤6, so no byte
    wraps and the shift stays truly uniform — the perturbation aHash
    is provably invariant to). Shared by the batch phash queries and
    the streaming ingest gate, so one pixel formula backs every
    oracle recomputation.

    ``spread`` repartitions the 8-byte doc_id frame BEFORE synthesis:
    the downstream fingerprint stage then chains in the SAME task, so
    encoded payloads never cross an exchange — only ids in,
    fingerprints out. Works on batch AND streaming frames (a streaming
    repartition is a per-micro-batch shuffle of ids — the gates keep
    it ON so a one-file trigger still fingerprints on every core);
    pass False only when the caller already partitioned the ids.
    ``group_mode="ingest_mix"`` swaps the modulus seed for
    ``ingest_mix_group(d, scale)`` (the growing-gate fixture) AND the
    linear pattern for a multiplicative-hash one: every linear channel
    reduces mod 240, so the linear family has at most 240 distinct
    base images no matter how many groups exist — the growing gate's
    novel-admit path would saturate at corpus scale. The hash pixels
    give each group an independent pattern (64-bit aHash space), so
    admitted-state growth tracks genuine novelty at any factor."""
    src = df.select("doc_id")
    if spread:
        src = _spread(src, "doc_id")
    mix = group_mode == "ingest_mix"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            medias = []
            for did in pdf["doc_id"]:
                d = int(did)
                off = d % 7
                if mix:
                    gm = ingest_mix_group(d, scale) % _MIX_HASH_MOD
                    rgb = bytes(
                        ((gm + 1) * (3 * k + c) * _MIX_HASH_MUL)
                        % 4294967296 // 65536 % 240 + off
                        for k in range(256)
                        for c in (1, 2, 3)
                    )
                else:
                    g = d % base_mod
                    rgb = bytes(
                        v
                        for y in range(16)
                        for x in range(16)
                        for v in (
                            (x * 7 + y * 13 + g * 29) % 240 + off,
                            (x * 3 + y * 5 + g * 17) % 240 + off,
                            (x * 11 + y + g * 23) % 240 + off,
                        )
                    )
                medias.append(encode_ppm(16, 16, rgb))
            yield pd.DataFrame({"did": pdf["doc_id"], "media": medias})

    return src.mapInPandas(gen, "did long, media binary")


def planted_audio(
    df: DataFrame, base_mod: int = 23, spread: bool = True,
    group_mode: str = "mod", scale: int = 1,
) -> DataFrame:
    """(did, media) — deterministic mono 16-bit WAVs synthesized per
    doc_id on the executors: a base waveform keyed doc_id % base_mod
    (the planted duplicate group) times a per-doc gain 1 + doc_id % 3
    (the loudness-normalization perturbation the energy-delta
    fingerprint is provably invariant to). Shared by the batch audio
    fingerprint query and the streaming ingest gate. ``spread`` as in
    ``planted_images`` — ids shuffle (batch or per micro-batch),
    payloads never do; ``group_mode`` as in ``planted_images``.

    The ingest-mix mode also swaps the sawtooth waveform for a
    multiplicative-hash one: the sawtooth family is a single cyclic
    sequence entered at ``g``-dependent phases, so its energy-delta
    bits collapse to ~46 distinct fingerprints across all 512 phases —
    every stream clip would collide into the corpus and the gate's
    admit/dup_stream paths would never fire. The hash waveform gives
    each group an independent orbit, which the gate needs and the
    oracle mirrors exactly in integer SQL (seeds bounded by
    ``_MIX_HASH_MOD`` so products fit BIGINT in both engines)."""
    src = df.select("doc_id")
    if spread:
        src = _spread(src, "doc_id")
    mix = group_mode == "ingest_mix"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            medias = []
            for did in pdf["doc_id"]:
                d = int(did)
                gain = 1 + d % 3
                if mix:
                    gm = ingest_mix_group(d, scale) % _MIX_HASH_MOD
                    samples = [
                        (((gm + 1) * (k + 1) * _MIX_HASH_MUL)
                         % 4294967296 // 16777216 - 128) * gain
                        for k in range(96)
                    ]
                else:
                    g = d % base_mod
                    samples = [
                        (((g * 37 + k * 29) % 512) - 256) * gain
                        for k in range(96)
                    ]
                medias.append(encode_wav_pcm16(8000, samples))
            yield pd.DataFrame({"did": pdf["doc_id"], "media": medias})

    return src.mapInPandas(gen, "did long, media binary")


def average_hash_64(gray: list[int], height: int, width: int) -> tuple[int, int]:
    """64-bit average-hash (aHash) of a grayscale pixel grid, split as
    (hi32, lo32) — the classic perceptual image fingerprint: mean-pool
    to 8×8, threshold each cell against the global mean, pack row-major.

    All-integer (block mean and global mean are floor divisions), so the
    value is bit-reproducible in any engine — and invariant under a
    uniform brightness shift: adding c to every pixel adds c to every
    pooled cell AND to the mean, leaving every comparison unchanged.
    Requires height and width to be multiples of 8 (real pipelines
    resize first — see ``resize_media``)."""
    if height % 8 or width % 8 or not gray:
        raise ValueError("average_hash_64 needs an 8k x 8k grayscale grid")
    bh, bw = height // 8, width // 8
    pooled = [
        sum(
            gray[(by * bh + r) * width + bx * bw + c]
            for r in range(bh)
            for c in range(bw)
        )
        // (bh * bw)
        for by in range(8)
        for bx in range(8)
    ]
    mean = sum(pooled) // 64
    hi = lo = 0
    for b, p in enumerate(pooled):
        bit = 1 if p > mean else 0
        if b < 32:
            hi |= bit << (31 - b)
        else:
            lo |= bit << (63 - b)
    return hi, lo


def image_average_hash(media: DataFrame, spread: bool = True) -> DataFrame:
    """(did, ahash_hi, ahash_lo) — perceptual average-hash of P6 PPM
    payloads. Decode and hash happen INSIDE the Arrow batch (the
    designated media escape hatch): at 100 TB the pixel data never
    enters a shuffle — each payload collapses to 8 bytes of fingerprint
    map-side, and only the fingerprints move. ``spread=False`` when
    the input is already well-partitioned (the planted pipelines
    spread the id frame BEFORE synthesis) or is a stream — spreading
    HERE would push the payloads themselves through an exchange."""
    m = media.select("did", "media")
    if spread:
        m = _spread(m, "did")

    def one(blob: bytes) -> tuple[int, int]:
        h, w, gray = decode_ppm(blob)
        return average_hash_64(gray, h, w)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = pdf["media"].map(lambda b: one(bytes(b)))
            yield pd.DataFrame(
                {
                    "did": pdf["did"],
                    "ahash_hi": hashes.map(lambda t: t[0]),
                    "ahash_lo": hashes.map(lambda t: t[1]),
                }
            )

    return m.mapInPandas(batches, "did long, ahash_hi long, ahash_lo long")


def audio_delta_fingerprint(
    media: DataFrame, window: int = 8, spread: bool = True
) -> DataFrame:
    """(did, fp, n_windows) — an energy-delta acoustic fingerprint of
    mono PCM WAV payloads: split the samples into fixed windows, take
    each window's integer energy Σs², and emit one bit per consecutive
    pair (1 when energy rose). Packs ≤64 windows into one BIGINT,
    most-significant-delta first.

    Invariant under uniform amplitude scaling (energies scale by c², so
    every strict comparison is preserved) — the property that makes it
    a dedup key for re-encoded/re-normalized audio. Integer-exact, so
    an SQL oracle reproduces it bit-for-bit. Same 100 TB posture as the
    image hash: samples never leave the decode stage; only the 8-byte
    fingerprint is shuffled. ``spread`` as in ``image_average_hash``."""
    m = media.select("did", "media")
    if spread:
        m = _spread(m, "did")

    def one(blob: bytes) -> tuple[int, int]:
        _, n, samples = decode_wav_pcm16(blob)
        nw = n // window
        if nw > 64:
            raise ValueError("fingerprint supports at most 64 windows")
        energies = [
            sum(s * s for s in samples[w * window : (w + 1) * window])
            for w in range(nw)
        ]
        fp = 0
        for w in range(1, nw):
            bit = 1 if energies[w] > energies[w - 1] else 0
            fp |= bit << (nw - 1 - w)
        return fp, nw

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = pdf["media"].map(lambda b: one(bytes(b)))
            yield pd.DataFrame(
                {
                    "did": pdf["did"],
                    "fp": fps.map(lambda t: t[0]),
                    "n_windows": fps.map(lambda t: t[1]),
                }
            )

    return m.mapInPandas(batches, "did long, fp long, n_windows int")


def audio_rank_fingerprint(
    media: DataFrame, frame: int = 24, bands: int = 8, spread: bool = True
) -> DataFrame:
    """(did, fp, n_windows) — the RANK-ORDER acoustic fingerprint: the
    joint argsort of all frame×band comb-filter energies (ties broken
    by position — equality is gain-invariant too), serialized and
    md5-packed into a 32-hex string key.

    The top of the round-10 fingerprint-entropy ladder. Measured on
    the ingest-mix waveform over 20k docs: energy-delta 652 distinct,
    adjacent-band signs 2,639, full rank order 19,416 — the energy
    VECTOR itself is near-injective (19,881) and the rank order keeps
    nearly all of it while staying exactly gain-invariant (scaling by
    gain² preserves every comparison AND every tie). A near-injective
    fingerprint is what makes the growing gate's state track true
    novelty instead of the fingerprint family's pattern ceiling —
    the delta family's saturation flagged genuinely-distinct clips as
    dups (false positives), which rank order eliminates on this
    fixture. All integer comparisons + one md5, so the SQL oracle
    reproduces it bit-for-bit (ROW_NUMBER over (energy, position) +
    string_agg + md5)."""
    import hashlib

    m = media.select("did", "media")
    if spread:
        m = _spread(m, "did")

    def one(blob: bytes) -> tuple[str, int]:
        _, n, samples = decode_wav_pcm16(blob)
        nf = n // frame
        ens = []
        for f in range(nf):
            fr = samples[f * frame : (f + 1) * frame]
            for b in range(bands):
                corr = sum(
                    v if (i // (b + 1)) % 2 == 0 else -v
                    for i, v in enumerate(fr)
                )
                ens.append(corr * corr)
        order = sorted(range(len(ens)), key=lambda i: (ens[i], i))
        return (
            hashlib.md5("|".join(str(i) for i in order).encode()).hexdigest(),
            nf,
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = pdf["media"].map(lambda b: one(bytes(b)))
            yield pd.DataFrame(
                {
                    "did": pdf["did"],
                    "fp": fps.map(lambda t: t[0]),
                    "n_windows": fps.map(lambda t: t[1]),
                }
            )

    return m.mapInPandas(batches, "did long, fp string, n_windows int")


def audio_spectral_fingerprint(
    media: DataFrame, frame: int = 24, bands: int = 8, spread: bool = True
) -> DataFrame:
    """(did, fp, n_windows) — a SPECTRAL-SHAPE acoustic fingerprint,
    the second fingerprint family next to ``audio_delta_fingerprint``
    (round-10 verdict item 5: the energy-delta family's 11-bit space
    tops out at a few hundred patterns on any one signal family; a
    family keyed to spectral CONTENT keeps growing with novelty).

    Per fixed-length frame, correlate the PCM samples against a bank
    of square-wave comb filters (period 2(b+1), b = 0..bands-1 — a
    coarse integer filter bank), square each correlation into a band
    energy, and emit one bit per adjacent band pair (1 when energy
    rises with b): the sign of the spectral slope, frame by frame.
    4 frames × 7 comparisons = 28 bits on the 96-sample fixture —
    ~2^28 values vs the delta family's 2^11.

    Same invariance and posture as the delta family: uniform gain
    scales every band energy by gain², preserving all comparisons;
    all-integer (correlations ≤ frame·|s|max, energies fit BIGINT), so
    a SQL oracle reproduces it bit-for-bit; samples never leave the
    Arrow batch — only the 8-byte fingerprint shuffles."""
    m = media.select("did", "media")
    if spread:
        m = _spread(m, "did")

    def one(blob: bytes) -> tuple[int, int]:
        _, n, samples = decode_wav_pcm16(blob)
        nf = n // frame
        bits_total = nf * (bands - 1)
        if bits_total > 63:
            raise ValueError("fingerprint supports at most 63 bits")
        fp = 0
        for f in range(nf):
            fr = samples[f * frame : (f + 1) * frame]
            ens = []
            for b in range(bands):
                corr = sum(
                    v if (i // (b + 1)) % 2 == 0 else -v
                    for i, v in enumerate(fr)
                )
                ens.append(corr * corr)
            for b in range(1, bands):
                bit = 1 if ens[b] > ens[b - 1] else 0
                fp |= bit << (bits_total - 1 - (f * (bands - 1) + b - 1))
        return fp, nf

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = pdf["media"].map(lambda b: one(bytes(b)))
            yield pd.DataFrame(
                {
                    "did": pdf["did"],
                    "fp": fps.map(lambda t: t[0]),
                    "n_windows": fps.map(lambda t: t[1]),
                }
            )

    return m.mapInPandas(batches, "did long, fp long, n_windows int")
