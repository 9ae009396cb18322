"""Multimodal column plumbing: image/audio/video as opaque binary.

Design for 100 TB multimodal corpora: media bytes live in a
``binary`` column next to typed metadata (modality, codec, declared
dims); heavy per-item work (decode, resize, frame-sample, feature
extraction) runs as Arrow-batched ``mapInPandas`` so each task
processes a columnar batch without per-row Python overhead, and the
bytes never pass through the driver.

The actual codec work needs image/audio libraries that are NOT in
this container — ``decode_image`` therefore routes to a
deterministic fake when Pillow is absent (and raises
NotImplementedError for modalities with no fake).  The Spark-side
contract — schemas, batch iteration, partitioning — is real and
tested; swapping in a real decoder changes only `_decode_bytes`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("media_format", T.StringType(), True),  # png|wav|mp4|...
    T.StructField("content", T.BinaryType(), True),
    T.StructField("declared_width", T.IntegerType(), True),
    T.StructField("declared_height", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("content_hash", T.StringType(), True),
])


def synthesize_media(spark, docs: DataFrame, modality: str = "image") -> DataFrame:
    """Deterministic fake media: bytes derived from each document's
    text (for tests/benchmarks only — real pipelines read real files
    via spark.read.format('binaryFile'))."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit("fake").alias("media_format"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        (F.pmod(F.col("doc_id"), F.lit(64)) + 16).cast("int").alias("declared_width"),
        (F.pmod(F.col("doc_id"), F.lit(48)) + 16).cast("int").alias("declared_height"),
    )


def _make_decoder():
    """Build the per-item decoder as a NESTED function: cloudpickle
    serializes nested functions by value, so Spark workers never need
    this package importable (the driver contract imports us by file
    path, leaving executors' PYTHONPATH without the repo)."""

    state = {"probed": False, "opener": None}

    def decode(content: bytes, modality: str, declared_w: int, declared_h: int):
        """Decode one media item → (width, height, mean_luma).

        Real decoders (Pillow/librosa/av) are not in this container;
        the image path falls back to a deterministic fake derived from
        the bytes, so plumbing stays testable.  Audio/video have no
        fake yet.  The image-stack probe runs once per decoder
        instance, never per item (failed imports are never cached —
        see _luma_stream_fn)."""
        if modality == "image":
            if not state["probed"]:
                state["probed"] = True
                try:  # real path, if a codec library is ever present
                    import io

                    from PIL import Image  # type: ignore

                    state["opener"] = (
                        lambda b: Image.open(io.BytesIO(b)).convert("L")
                    )
                except ImportError:
                    state["opener"] = None
            if state["opener"] is not None:
                try:
                    img = state["opener"](content)
                    import numpy as np

                    arr = np.asarray(img, dtype="float64")
                    return img.width, img.height, float(arr.mean())
                except Exception:
                    pass  # not an image: fall through to the fake
            # deterministic fake: dims from declared metadata, luma
            # from a byte checksum — stable across runs/engines
            # (vectorized byte sum: identical value to sum(content),
            # without the per-byte Python loop)
            if content:
                import numpy as np

                luma = (
                    int(np.frombuffer(content, dtype=np.uint8)
                        .sum(dtype=np.int64)) % 25600
                ) / 100.0
            else:
                luma = None
            return declared_w, declared_h, luma
        raise NotImplementedError(f"no decoder (or fake) for modality={modality!r}")

    return decode


# module-level handle for direct (driver-side) use and tests
_decode_bytes = _make_decoder()


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Per-item decode + feature extraction via Arrow-batched
    mapInPandas.  Each batch is one Arrow RecordBatch — tune
    spark.sql.execution.arrow.maxRecordsPerBatch for very large items
    (e.g. 64 for multi-MB images so a batch stays < memory budget).

    The closure binds every dependency LOCALLY (no module-global
    references): cloudpickle then ships it by value, so executors
    never need this package on their PYTHONPATH — essential when the
    caller imported us by file path (the driver contract does)."""
    decode = _make_decoder()  # nested instance → pickled by value
    out_cols = [f.name for f in FEATURE_SCHEMA.fields]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = row.content if row.content is not None else b""
                w, h, luma = decode(
                    content, row.modality, row.declared_width, row.declared_height
                )
                out.append({
                    "media_id": row.media_id,
                    "n_bytes": len(content),
                    "width": w,
                    "height": h,
                    "mean_luma": luma,
                    "content_hash": hashlib.md5(content).hexdigest(),
                })
            yield _pd.DataFrame(out, columns=out_cols)

    return media.mapInPandas(op, FEATURE_SCHEMA)


DHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("dhash", T.LongType(), True),
])


def _luma_stream_fn():
    """Per-item luma-stream decoder, nested for by-value pickling
    (see _make_decoder).  Real path: Pillow grayscale raster.  Fake
    path (codec libs absent here): the content's UTF-8 codepoint
    stream — synthesize_media derives content from text, and a
    codepoint stream has the LOCALITY a perceptual hash needs (a
    small edit perturbs one window; a crop shifts windows slightly),
    unlike a cryptographic-hash fake.  Raw bytes as the last resort
    for undecodable content.

    The image-stack probe runs ONCE per decoder instance (first
    call), not once per item: a FAILED ``from PIL import Image`` is
    never cached by Python — every retry pays a full finder-chain
    scan (~80µs here), which at one attempt per item was ~0.4s per
    5k-item pass, pure overhead on every stack-less environment (the
    same trap _decode_stack_present documents for the video path)."""

    state = {"probed": False, "opener": None}

    def luma_stream(content: bytes):
        import numpy as np

        if not state["probed"]:
            state["probed"] = True
            try:  # real path, if an image stack is ever present
                import io

                from PIL import Image  # type: ignore

                state["opener"] = (
                    lambda b: Image.open(io.BytesIO(b)).convert("L")
                )
            except ImportError:
                state["opener"] = None
        if state["opener"] is not None:
            try:
                img = state["opener"](content)
                return np.asarray(img, dtype="int64").ravel()
            except Exception:
                pass  # not an image: fall through to the fake path
        try:
            s = content.decode("utf-8")
            # utf-32-le round-trip = vectorized codepoints (no
            # per-char Python loop in the decode hot path)
            return np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype("int64")
        except UnicodeDecodeError:
            return np.frombuffer(content, dtype=np.uint8).astype("int64")

    return luma_stream


def _grid_sums_fn():
    """Window-sum kernel, nested for by-value pickling (the
    mapInPandas closures must not reference module globals — see
    _make_decoder)."""

    def grid_sums(stream, cells: int):
        """Partition a 1-D luma stream into ``cells`` equal windows;
        return (sum, count) int64 arrays.  Window of sample i is
        (i * cells) // n — pure integer math so the DuckDB oracle can
        replay it exactly ((i * cells) // n in both dialects)."""
        import numpy as np

        n = stream.size
        idx = (np.arange(n, dtype="int64") * cells) // n
        # float64 bincount sums stay exact: luma <= 0x10FFFF, n <= ~1e6
        # per item keeps every sum far below 2^53
        s = np.bincount(idx, weights=stream, minlength=cells).astype("int64")
        c = np.bincount(idx, minlength=cells).astype("int64")
        return s, c

    return grid_sums


# module-level handle for direct (driver-side) use and tests
_grid_sums = _grid_sums_fn()


def extract_dhash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual difference hash (dhash) per media item, computed
    inside the same Arrow-batched mapInPandas decode boundary as
    extract_features: decode → ``grid``×``grid`` luma-window grid →
    bit b set iff the row-wise left window is dimmer than its right
    neighbor.  grid=8 gives 8 rows × 7 comparisons = a 56-bit hash —
    deliberately NOT the textbook 8×9/64-bit variant, because 56 bits
    keeps the value sign-safe in a BIGINT in every engine (Spark,
    DuckDB, parquet) with the banding math unchanged (4 bands × 14
    bits; Hamming ≤ 3 is pigeonhole-lossless).

    Empty/undecodable items hash to NULL (never a sentinel value that
    could collide into a near-dup bucket).

    Window comparisons use cross-multiplied integer sums
    (sum_l·cnt_r < sum_r·cnt_l), never float averages — exact and
    replayable in SQL, and immune to summation-order ulps.

    Reference parity: the reference pipeline has no media dedup at
    all (its graph/feature layer /root/reference/graph_code/
    pyg_graphs.py consumes whatever rows exist); this is part of the
    beyond-reference training-data surface the brief names."""
    out_cols = [f.name for f in DHASH_SCHEMA.fields]
    luma_stream = _luma_stream_fn()
    grid_sums = _grid_sums_fn()  # nested instances → pickled by value
    g = int(grid)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        cells = g * g
        nbits = g * (g - 1)
        shifts = np.arange(nbits, dtype="uint64")

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = row.content if row.content is not None else b""
                stream = luma_stream(content)
                if stream.size == 0:
                    out.append({"media_id": row.media_id, "dhash": None})
                    continue
                s, c = grid_sums(stream, cells)
                sg, cg = s.reshape(g, g), c.reshape(g, g)
                bits = (sg[:, :-1] * cg[:, 1:] < sg[:, 1:] * cg[:, :-1]).ravel()
                fp = int((bits.astype("uint64") << shifts).sum())
                out.append({"media_id": row.media_id, "dhash": fp})
            yield _pd.DataFrame(out, columns=out_cols)

    return media.mapInPandas(op, DHASH_SCHEMA)


PHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("phash", T.LongType(), True),
])


def extract_phash(media: DataFrame, grid: int = 32, keep: int = 8) -> DataFrame:
    """Perceptual DCT hash (phash): decode → ``grid``×``grid`` luma
    grid → 2-D DCT-II (numpy matmul against the orthonormal DCT
    basis) → keep the top-left ``keep``×``keep`` low-frequency block
    minus the DC term → threshold at the block's median → 63-bit
    hash.  Robust to uniform brightness shifts (DC excluded) and mild
    rescaling (low frequencies only).

    Float DCT is not SQL-replayable, so phash has no DuckDB oracle —
    it is pytest-verified (determinism, brightness invariance,
    separation of unrelated items); dhash is the oracled twin."""
    out_cols = [f.name for f in PHASH_SCHEMA.fields]
    luma_stream = _luma_stream_fn()
    grid_sums = _grid_sums_fn()  # nested instances → pickled by value
    g, k = int(grid), int(keep)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        cells = g * g
        # orthonormal DCT-II basis, built once per task
        n_idx = np.arange(g)
        basis = np.cos(np.pi * (2 * n_idx[None, :] + 1) * n_idx[:, None] / (2 * g))
        basis[0] *= np.sqrt(1.0 / g)
        basis[1:] *= np.sqrt(2.0 / g)
        nbits = k * k - 1
        shifts = np.arange(nbits, dtype="uint64")

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = row.content if row.content is not None else b""
                stream = luma_stream(content)
                if stream.size == 0:
                    out.append({"media_id": row.media_id, "phash": None})
                    continue
                s, c = grid_sums(stream, cells)
                lum = np.where(c > 0, s / np.maximum(c, 1), 0.0).reshape(g, g)
                coef = basis @ lum @ basis.T
                block = coef[:k, :k].ravel()[1:]  # drop DC
                bits = block > np.median(block)
                fp = int((bits.astype("uint64") << shifts).sum())
                out.append({"media_id": row.media_id, "phash": fp})
            yield _pd.DataFrame(out, columns=out_cols)

    return media.mapInPandas(op, PHASH_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_samples", T.IntegerType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("content_hash", T.StringType(), True),
])


def extract_audio_features(media: DataFrame, sample_rate: float = 16000.0) -> DataFrame:
    """Audio decode + waveform stats via Arrow-batched mapInPandas.

    Real codec path (librosa/soundfile) when present; otherwise a
    deterministic fake that reads the bytes as a centered uint8
    waveform — the batch shapes, schema, and vectorized numpy stats
    are exactly what the real decoder slots into.  Closure is fully
    by-value (see extract_features)."""
    rate = float(sample_rate)
    out_cols = [f.name for f in AUDIO_FEATURE_SCHEMA.fields]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np
        import pandas as _pd

        state = {"probed": False, "reader": None}

        def decode(content: bytes):
            if not state["probed"]:
                state["probed"] = True
                try:  # probe the audio stack ONCE per task — failed
                    # imports are never cached (see _luma_stream_fn)
                    import io

                    import soundfile  # type: ignore

                    state["reader"] = (
                        lambda b: soundfile.read(io.BytesIO(b))
                    )
                except ImportError:
                    state["reader"] = None
            if state["reader"] is not None:
                try:  # real path, if an audio stack is ever present
                    wave, sr = state["reader"](content)
                    return wave.astype("float64"), float(sr)
                except Exception:
                    pass  # undecodable: fall through to the fake
            # deterministic fake: bytes as a centered uint8 wave
            wave = np.frombuffer(content, dtype=np.uint8).astype("float64") - 128.0
            return wave, rate

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = row.content if row.content is not None else b""
                wave, sr = decode(content)
                n = int(wave.size)
                out.append({
                    "media_id": row.media_id,
                    "n_samples": n,
                    "duration_s": n / sr if sr else None,
                    "rms": float(np.sqrt(np.mean(wave**2))) if n else None,
                    "content_hash": hashlib.md5(content).hexdigest(),
                })
            yield _pd.DataFrame(out, columns=out_cols)

    return media.mapInPandas(op, AUDIO_FEATURE_SCHEMA)


FRAME_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("mean_luma", T.DoubleType(), True),
])


def _decode_stack_present() -> bool:
    """Probe for a real video decode stack (pyav).  A FAILED import
    is never cached by Python (each retry pays a full finder scan),
    so the mapInPandas operator probes ONCE per batch iterator and
    threads the answer through — never once per frame."""
    try:
        import av  # type: ignore  # noqa: F401
    except ImportError:
        return False
    return True


def _frame_luma(content: bytes, idx: int, decoder_present: bool | None = None):
    """Per-frame luma for one sampled frame index.

    The decoder probe sits OUTSIDE any swallowing except: if a video
    stack (pyav) is ever present in the environment, this must fail
    loudly rather than silently keep using the deterministic fake —
    the same unsupported-capability contract as pybpe's loud refusals
    (an earlier version raised the NotImplementedError *inside* the
    try whose except selected the fake, making the real-decode branch
    unreachable by construction)."""
    if decoder_present is None:
        decoder_present = _decode_stack_present()
    if decoder_present:
        raise NotImplementedError(
            "a video decode stack (pyav) is importable but real "
            "seek+decode is not implemented; refusing to silently "
            "substitute the deterministic fake"
        )
    if not content:
        return None
    # deterministic fake: rotate the byte window by frame
    start = idx % len(content)
    window = content[start:start + 64] or content[:64]
    return (sum(window) * (idx + 1) % 25600) / 100.0


def extract_frame_features(media: DataFrame) -> DataFrame:
    """Per-sampled-frame decode for video: consumes the
    ``sample_frame_indices`` column from frame_sample_plan and emits
    one row per (media_id, frame) — a mapInPandas fan-out, so the
    frame explosion happens inside the Arrow batch, never on the
    driver.  Real path would seek+decode each index (pyav); the
    deterministic fake derives per-frame luma from a byte slice so
    distinct frames get distinct, reproducible values (see
    ``_frame_luma`` for the loud-refusal contract when a real decoder
    is present)."""
    out_cols = [f.name for f in FRAME_FEATURE_SCHEMA.fields]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        present = _decode_stack_present()  # once, not per frame

        def frame_luma(content, idx):
            return _frame_luma(content, idx, decoder_present=present)

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = row.content if row.content is not None else b""
                for idx in row.sample_frame_indices:
                    out.append({
                        "media_id": row.media_id,
                        "frame_idx": int(idx),
                        "mean_luma": frame_luma(content, int(idx)),
                    })
            yield _pd.DataFrame(out, columns=out_cols)

    return media.mapInPandas(op, FRAME_FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, n_frames: int = 8, declared_fps: float = 30.0,
    declared_duration_s: float = 10.0,
) -> DataFrame:
    """Video frame sampling, metadata stage: compute the deterministic
    frame indices to decode (evenly spaced across the declared
    duration) as an array column — the decode itself belongs in the
    same mapInPandas pass as images (no codec libs here: the real
    per-frame decode raises NotImplementedError via _decode_bytes for
    modality='video').  Keeping index selection JVM-side means the
    planner can drop undecoded frames before any bytes move."""
    total = F.lit(int(declared_fps * declared_duration_s))
    idx = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (i * total / n_frames).cast("int"),
    )
    return media.withColumn("sample_frame_indices", idx)


def resize_plan(media: DataFrame, max_side: int) -> DataFrame:
    """Resize is metadata-only until decode: compute the target dims
    JVM-side (no bytes touched) — the actual pixel resample belongs in
    the same mapInPandas pass as decode."""
    w, h = F.col("declared_width"), F.col("declared_height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h))
    return media.withColumn("target_width", F.ceil(w * scale).cast("int")).withColumn(
        "target_height", F.ceil(h * scale).cast("int")
    )
