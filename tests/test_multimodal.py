"""Multimodal binary-column plumbing: schema, Arrow batch shape,
fan-out, determinism, and the stubbed real-codec path."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from soil_data_development_tools___arcmap_spark.functions.multimodal import (
    attach_media,
    decode_media,
    media_features,
    media_metadata,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a" * 100),
        (1, "b c d " * 30),
        (2, "x"),
        (3, ""),
        (4, "the quick brown fox " * 20),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_attach_media_schema(docs):
    m = attach_media(docs)
    assert [f.name for f in m.schema.fields] == ["did", "media", "meta"]
    assert m.schema["media"].dataType.simpleString() == "binary"
    assert (
        m.schema["meta"].dataType.simpleString()
        == "struct<n_bytes:int,content_md5:string,format:string>"
    )
    row = m.where(F.col("did") == 0).first()
    assert row.media == b"a" * 100
    assert row.meta.n_bytes == 100
    assert row.meta.format == "png"


def test_media_metadata_matches_bytes(docs):
    got = {r.did: r for r in media_metadata(docs).collect()}
    assert got[1].n_bytes == len("b c d " * 30)
    assert got[1].content_md5 == hashlib.md5(("b c d " * 30).encode()).hexdigest()
    assert got[3].n_bytes == 0


def test_media_features_values(docs):
    got = {r.did: r for r in media_features(docs).collect()}
    assert got[4].n_space == ("the quick brown fox " * 20).count(" ")
    assert got[4].side == math.isqrt(400)
    assert got[3].n_bytes == 0 and got[3].side == 0


def test_sample_frames_fanout(docs):
    got = sample_frames(docs, frame_bytes=64, every=4).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.did, []).append(r)
    # 180-byte doc 1 -> 3 frames -> indices {0} at every=4... 100-byte
    # doc 0 -> 2 frames -> just frame 0; 400-byte doc 4 -> 7 frames ->
    # frames 0 and 4.
    assert [r.frame_idx for r in sorted(by_doc[4], key=lambda r: r.frame_idx)] == [0, 4]
    blob = ("the quick brown fox " * 20).encode()
    want = hashlib.md5(blob[4 * 64 : 5 * 64]).hexdigest()
    assert [r.frame_md5 for r in by_doc[4] if r.frame_idx == 4] == [want]
    # empty doc still yields no frames, not a crash
    assert 3 not in by_doc


def test_decode_fake_and_stub(docs):
    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        codec_available,
    )

    got = {r.did: r for r in decode_media(docs).collect()}
    assert got[0].height == got[0].width == 10
    assert got[0].head == [ord("a")] * 16
    if not codec_available("png"):
        # without the optional pillow dependency the real codec must
        # fail at plan build, on the driver
        with pytest.raises(NotImplementedError, match="PIL"):
            decode_media(docs, codec="png")
    with pytest.raises(NotImplementedError):
        resize_media(docs, codec="mp4")


def _png_media(spark):
    """(did, media) rows of REAL png bytes: did 1 → a 4×6 gradient,
    did 2 → a 10×10 constant-7 image."""
    import io

    from PIL import Image

    rows = []
    img1 = Image.new("L", (4, 6))  # width 4, height 6
    img1.putdata([(x * 40 + 5) % 251 for x in range(24)])
    img2 = Image.new("L", (10, 10), color=7)
    for did, img in ((1, img1), (2, img2)):
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append((did, bytearray(buf.getvalue())))
    return spark.createDataFrame(rows, "did long, media binary")


def test_decode_png_real(spark):
    pytest.importorskip("PIL")
    media = _png_media(spark)
    got = {r.did: r for r in decode_media(None, codec="png", media=media).collect()}
    assert (got[1].height, got[1].width) == (6, 4)
    assert got[1].head == [(x * 40 + 5) % 251 for x in range(16)]
    assert (got[2].height, got[2].width) == (10, 10)
    assert got[2].head == [7] * 16


def test_resize_png_real(spark):
    pytest.importorskip("PIL")
    media = _png_media(spark)
    got = {
        r.did: r
        for r in resize_media(
            None, out_side=2, codec="png", media=media
        ).collect()
    }
    assert got[1].out_bytes == 4 and got[2].out_bytes == 4
    import hashlib as _h

    assert got[2].out_md5 == _h.md5(bytes([7] * 4)).hexdigest()


def test_resize_deterministic(docs):
    a = {r.did: (r.out_bytes, r.out_md5) for r in resize_media(docs).collect()}
    b = {r.did: (r.out_bytes, r.out_md5) for r in resize_media(docs).collect()}
    assert a == b
    # 10x10 fake image, out_side=8 -> stride 1 keeps all 100 bytes
    assert a[0][0] == 100


def test_partitioned_batches(docs):
    # the _spread repartition must not lose or duplicate rows
    big = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 100))
    out = media_features(big)
    assert out.count() == 10
    assert out.select("did").distinct().count() == 10


# ----------------------------------------------------------- PPM codec


def test_ppm_roundtrip():
    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    rgb = bytes(range(2 * 3 * 3))  # 3 wide, 2 tall
    blob = encode_ppm(3, 2, rgb)
    h, w, gray = decode_ppm(blob)
    assert (h, w) == (2, 3)
    exp = [
        (299 * rgb[3 * k] + 587 * rgb[3 * k + 1] + 114 * rgb[3 * k + 2]) // 1000
        for k in range(6)
    ]
    assert gray == exp


def test_ppm_rejects_bad_input():
    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\x00")
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(2, 2, bytes(12))[:-1])  # truncated pixels
    with pytest.raises(ValueError):
        encode_ppm(2, 2, bytes(11))  # wrong payload length


def test_decode_media_ppm_path(spark):
    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        decode_media,
        encode_ppm,
    )

    rows = [
        (1, bytearray(encode_ppm(4, 2, bytes([10, 20, 30]) * 8))),
        (2, bytearray(encode_ppm(2, 2, bytes([255, 255, 255]) * 4))),
    ]
    media = spark.createDataFrame(rows, "did long, media binary")
    got = {r.did: r for r in decode_media(None, media=media, codec="ppm").collect()}
    g = (299 * 10 + 587 * 20 + 114 * 30) // 1000
    assert (got[1].height, got[1].width) == (2, 4)
    assert got[1].head == [g] * 8
    # 255,255,255 -> (299+587+114)*255//1000 = 255 exactly
    assert got[2].head == [255] * 4


def test_resize_media_ppm_path(spark):
    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        encode_ppm,
        resize_media,
    )

    # 8x8 image, out_side=2 -> strides 4: picks rows/cols 0 and 4
    rgb = bytes(
        v for y in range(8) for x in range(8) for v in (x * 10, x * 10, x * 10)
    )
    media = spark.createDataFrame(
        [(7, bytearray(encode_ppm(8, 8, rgb)))], "did long, media binary"
    )
    out = resize_media(None, out_side=2, codec="ppm", media=media).collect()[0]
    assert out.out_bytes == 4
    exp = bytes([0, 40, 0, 40])  # gray of gray-valued pixels = value
    assert out.out_md5 == hashlib.md5(exp).hexdigest()


# ----------------------------------------------------------- WAV codec


def test_wav_roundtrip():
    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = [0, 1, -1, 32767, -32768, 1234]
    rate, n, got = decode_wav_pcm16(encode_wav_pcm16(16000, samples))
    assert (rate, n) == (16000, 6)
    assert got == samples


def test_wav_chunk_walk_skips_extras():
    """A LIST chunk between fmt and data must be walked over, and an
    odd-sized chunk must respect RIFF word alignment."""
    import struct

    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    base = encode_wav_pcm16(8000, [5, -5])
    hdr, fmt_chunk, data_chunk = base[:12], base[12:36], base[36:]
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    blob = hdr + fmt_chunk + extra + data_chunk
    rate, n, got = decode_wav_pcm16(blob)
    assert (rate, n, got) == (8000, 2, [5, -5])


def test_wav_rejects_bad_input():
    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        decode_wav_pcm16,
    )

    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFX\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFF\x04\x00\x00\x00WAVE")  # no chunks


def test_audio_features_values(spark):
    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    rows = [
        (1, bytearray(encode_wav_pcm16(8000, [100, -200, 300]))),
        (2, bytearray(encode_wav_pcm16(12000, []))),
    ]
    media = spark.createDataFrame(rows, "did long, media binary")
    got = {r.did: r for r in audio_features(media).collect()}
    assert got[1].sample_rate == 8000
    assert got[1].n_samples == 3
    assert got[1].abs_sum == 600
    assert got[1].peak == 300
    assert got[2].n_samples == 0 and got[2].abs_sum == 0 and got[2].peak == 0


# ------------------------------------------------- media dedup fingerprints


def test_average_hash_brightness_invariance():
    """aHash must not move under a uniform brightness shift (the
    re-encode perturbation the planted-dup query exploits) but must
    move when a block's content genuinely changes."""
    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        average_hash_64,
    )

    base = [(3 * x + 5 * y) % 200 for y in range(16) for x in range(16)]
    h0 = average_hash_64(base, 16, 16)
    for off in (1, 6, 50):
        shifted = [p + off for p in base]
        assert average_hash_64(shifted, 16, 16) == h0
    # blow out one 2x2 block far past the mean -> its bit must flip
    tampered = list(base)
    for r in range(2):
        for c in range(2):
            tampered[r * 16 + c] = 255
    assert average_hash_64(tampered, 16, 16) != h0


def test_average_hash_shape_and_packing():
    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        average_hash_64,
    )

    # half-bright / half-dark: top 4 pooled rows dark (bit 0), bottom
    # bright (bit 1) -> hi = 0, lo = the low 32 bits all set
    grid = [0 if y < 8 else 100 for y in range(16) for x in range(16)]
    hi, lo = average_hash_64(grid, 16, 16)
    assert hi == 0
    assert lo == (1 << 32) - 1
    with pytest.raises(ValueError):
        average_hash_64([0] * (15 * 15), 15, 15)


def test_audio_fingerprint_gain_invariance(spark):
    from soil_data_development_tools___arcmap_spark.functions.multimodal import (
        audio_delta_fingerprint,
        encode_wav_pcm16,
    )

    base = [((k * 29) % 512) - 256 for k in range(96)]
    rows = [
        (1, bytearray(encode_wav_pcm16(8000, base))),
        (2, bytearray(encode_wav_pcm16(8000, [3 * s for s in base]))),
        # reversed waveform: energy profile mirrored -> different bits
        (3, bytearray(encode_wav_pcm16(8000, base[::-1]))),
    ]
    media = spark.createDataFrame(rows, "did long, media binary")
    got = {r.did: r for r in audio_delta_fingerprint(media).collect()}
    assert got[1].n_windows == 12
    assert got[1].fp == got[2].fp
    assert got[1].fp != got[3].fp


def test_phash_dup_query_groups_by_base_pattern(spark):
    """Docs sharing doc_id % 37 must land in one aHash group despite
    their differing brightness offsets (doc_id % 7)."""
    import soil_data_development_tools___arcmap_spark.queries as Q

    out = Q.docs_media_phash_dups(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    by_did = {r.did: r for r in rows}
    dids = sorted(by_did)
    # two ids with the same base pattern but different offsets
    pairs = [
        (a, b)
        for a in dids
        for b in dids
        if a < b and a % 37 == b % 37 and a % 7 != b % 7
    ]
    assert pairs, "fixture too small to plant a cross-offset dup pair"
    for a, b in pairs[:5]:
        ra, rb = by_did[a], by_did[b]
        assert (ra.ahash_hi, ra.ahash_lo) == (rb.ahash_hi, rb.ahash_lo)
        assert ra.group_rep == rb.group_rep


def test_video_neardup_pairs_same_base_only(spark):
    import soil_data_development_tools___arcmap_spark.queries as Q

    out = Q.docs_media_video_neardup(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "expected planted same-base video pairs"
    for r in rows:
        # every reported pair shares the base pattern and is majority-shared
        assert r.did_a % 29 == r.did_b % 29
        assert r.jacc_e3 >= 500
        assert r.shared <= min(r.nf_a, r.nf_b)
    # at least one pair with differing lengths (24..28 frames) survived
    assert any(r.nf_a != r.nf_b for r in rows)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=205), min_size=256, max_size=256
        ),
        st.integers(min_value=0, max_value=50),
    )
    def test_average_hash_uniform_shift_property(grid, off):
        """For ANY 16x16 grid and ANY uniform shift that stays in
        byte range, the aHash is unchanged — the invariance the
        planted-dup queries rely on, proven for arbitrary content."""
        from soil_data_development_tools___arcmap_spark.functions.multimodal import (
            average_hash_64,
        )

        assert average_hash_64(grid, 16, 16) == average_hash_64(
            [p + off for p in grid], 16, 16
        )

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-256, max_value=256),
            min_size=96,
            max_size=96,
        ),
        st.integers(min_value=1, max_value=100),
    )
    def test_audio_fingerprint_gain_property(samples, gain):
        """For ANY waveform and ANY positive integer gain, the
        energy-delta fingerprint is unchanged (energies scale by
        gain², preserving every comparison) — pure-Python replica of
        the operator's window/delta/pack math, engine-free."""

        def fp(sig, window=8):
            nw = len(sig) // window
            es = [
                sum(s * s for s in sig[w * window : (w + 1) * window])
                for w in range(nw)
            ]
            out = 0
            for w in range(1, nw):
                out |= (1 if es[w] > es[w - 1] else 0) << (nw - 1 - w)
            return out

        assert fp(samples) == fp([s * gain for s in samples])
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_video_neardup_stop_frame_cap(spark):
    """With max_freq below the planted group size, the ubiquitous
    base frames stop generating candidates and only the (larger)
    doc-specific overlap survives — here none, so no pairs; with the
    default cap the planted pairs appear. Proves the stop-frame guard
    actually gates candidate generation."""
    import soil_data_development_tools___arcmap_spark.queries as Q

    sf = "/root/testdata/sf0.001"
    with_cap = Q.docs_media_video_neardup(spark, sf, max_freq=2).count()
    default = Q.docs_media_video_neardup(spark, sf).count()
    assert default > 0
    assert with_cap < default
