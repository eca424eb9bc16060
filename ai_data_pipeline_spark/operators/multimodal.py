"""Multimodal column support: opaque binary payloads with typed metadata,
decoded / feature-extracted via Arrow-batched pandas (north-star
extension).

Design (the part that matters at 100 TB):
- media are ``BinaryType`` columns + metadata struct; they flow through
  Spark untouched (no JVM<->Python crossing) until a decode stage;
- decode/feature-extract runs in ``mapInPandas`` — per-partition Arrow
  batches, vectorized pandas/numpy inside, schema declared up front;
- the image/audio codec libraries are NOT in this container, so
  ``decode_image`` is a clearly-marked stub (NotImplementedError); the
  deterministic byte-level feature path below exercises the exact same
  plumbing (binary in → fixed-schema features out) and is oracle-checked
  byte-for-byte against DuckDB blob functions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ai_data_pipeline_spark.catalog import load_table
from ai_data_pipeline_spark.registry import QueryDef

FEATURE_SCHEMA = "doc_id long, source string, n_bytes long, first_byte int, last_byte int, byte_sum long"


def decode_image(payload: bytes, target_size: tuple[int, int] | None = None):
    """Decode an image payload by magic-number dispatch. PNG (8-bit
    grayscale), BMP (indexed-8 grayscale DIB), and GIF87a (grayscale
    LZW) decode FOR REAL via the stdlib-only codecs in
    functions/codecs.py — see multimodal_png_roundtrip /
    multimodal_bmp_roundtrip / multimodal_gif_roundtrip below, which
    drive the full encode→decode→feature pipeline through mapInPandas
    under an oracle. Other formats (JPEG/WebP/...) still raise: their
    codecs are genuinely not in this container, and a silent fake
    would poison features."""
    from ai_data_pipeline_spark.functions.codecs import (
        bmp_decode,
        gif_decode,
        png_decode,
        resize_nearest,
    )

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        img, _meta = png_decode(payload)
        return resize_nearest(img, target_size) if target_size else img
    if payload[:2] == b"BM":
        img, _meta = bmp_decode(payload)
        return resize_nearest(img, target_size) if target_size else img
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        img, _meta = gif_decode(payload)
        return resize_nearest(img, target_size) if target_size else img
    raise NotImplementedError(
        "only PNG, BMP, and GIF decode are available in this "
        "environment (stdlib-only codecs); JPEG/WebP need codec "
        "libraries this container does not ship"
    )


def _byte_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction, fully vectorized: the batch's
    payloads concatenate into one uint8 buffer (per-row cost is a single
    O(1) len()), and first/last bytes index via the segment offsets while
    byte sums come from one np.add.reduceat over the nonempty segment
    starts — no per-byte Python anywhere (int64 upcast before the
    reduction; summing uint8 would wrap at 255)."""
    import numpy as np

    for pdf in it:
        payloads = pdf["payload"]
        n = len(payloads)
        lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=n)
        first = np.full(n, -1, dtype=np.int64)
        last = np.full(n, -1, dtype=np.int64)
        sums = np.zeros(n, dtype=np.int64)
        nz = lens > 0
        if nz.any():
            ends = np.cumsum(lens)
            starts = ends - lens
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
            first[nz] = buf[starts[nz]]
            last[nz] = buf[ends[nz] - 1]
            # empty segments have zero width, so consecutive nonempty
            # starts still delimit exact per-row extents
            sums[nz] = np.add.reduceat(buf, starts[nz])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_bytes": lens,
                "first_byte": first,
                "last_byte": last,
                "byte_sum": sums,
            }
        )


def byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the multimodal path:
    documents.text encoded to a binary column stands in for media bytes;
    features aggregate per source."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.encode("text", "UTF-8").alias("payload")
    )
    feats = d.mapInPandas(_byte_feature_batches, schema=FEATURE_SCHEMA)
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("sum_bytes"),
        F.min("first_byte").alias("min_first_byte"),
        F.max("last_byte").alias("max_last_byte"),
        F.sum("byte_sum").alias("sum_byte_sum"),
    )


# DuckDB mirror: hex-string view of the same utf-8 bytes (substring on
# BLOB is unsupported, so all byte access goes through hex(encode(text))).
_D = "(instr('0123456789ABCDEF', {c}) - 1)"


def _hexpair_to_int(h: str, pos: str) -> str:
    d1 = _D.format(c=f"substr({h}, {pos}, 1)")
    d2 = _D.format(c=f"substr({h}, ({pos})+1, 1)")
    return f"(16*{d1} + {d2})"


BYTE_FEATURES_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, source, hex(encode(text)) AS h FROM documents
), feats AS (
  SELECT doc_id, source,
    length(h) // 2 AS n_bytes,
    CASE WHEN length(h) = 0 THEN -1 ELSE {_hexpair_to_int('h', '1')} END AS first_byte,
    CASE WHEN length(h) = 0 THEN -1
         ELSE {_hexpair_to_int('h', 'length(h)-1')} END AS last_byte,
    coalesce(list_sum([{_hexpair_to_int('h', 'i')} for i in range(1, length(h)+1, 2)]), 0) AS byte_sum
  FROM hx
)
SELECT source, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
       min(first_byte) AS min_first_byte, max(last_byte) AS max_last_byte,
       CAST(sum(byte_sum) AS BIGINT) AS sum_byte_sum
FROM feats GROUP BY source
"""


def resize_image(payload: bytes, target_size: tuple[int, int] = (224, 224)):
    """Decode (PNG) + nearest-neighbor resize + re-encode — a real
    byte-in/byte-out thumbnailing kernel for the one format this
    container can decode; other formats raise via decode_image's
    dispatch. The resampler is exact index math (functions/codecs.py
    resize_nearest), so results are engine-reproducible — no
    library-specific interpolation kernels."""
    from ai_data_pipeline_spark.functions.codecs import png_encode_gray

    return png_encode_gray(decode_image(payload, target_size))


FRAME_BYTES = 32  # bytes per pseudo-frame
FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = (
    "doc_id long, n_bytes long, n_frames long, n_sampled long, sampled_sum long"
)


def _frame_sample_batches(it):
    """Frame sampling over opaque binary payloads: treat the byte stream
    as fixed-size frames, keep every FRAME_STRIDE-th frame (the video
    keyframe-sampling access pattern), and reduce each kept frame.
    Vectorized numpy per Arrow batch — no per-byte Python."""
    import numpy as np

    for pdf in it:
        out = {"doc_id": [], "n_bytes": [], "n_frames": [], "n_sampled": [], "sampled_sum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(payload, dtype=np.uint8)
            n = len(a)
            n_frames = -(-n // FRAME_BYTES)
            idx = np.arange(n) // FRAME_BYTES
            mask = (idx % FRAME_STRIDE) == 0
            out["doc_id"].append(doc_id)
            out["n_bytes"].append(n)
            out["n_frames"].append(n_frames)
            out["n_sampled"].append(-(-n_frames // FRAME_STRIDE))
            out["sampled_sum"].append(int(a[mask].sum()))
        yield pd.DataFrame(out)


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling: binary payload -> every FRAME_STRIDE-th
    FRAME_BYTES-sized frame is kept and reduced. documents.text bytes
    stand in for video payloads; real codecs slot into the same
    mapInPandas stage (decode_image/resize_image stubs above)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInPandas(_frame_sample_batches, schema=FRAME_SCHEMA)


FRAME_SAMPLE_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h, length(hex(encode(text)))//2 AS n FROM documents
)
SELECT doc_id, n AS n_bytes,
  (n + {FRAME_BYTES - 1}) // {FRAME_BYTES} AS n_frames,
  ((n + {FRAME_BYTES - 1}) // {FRAME_BYTES} + {FRAME_STRIDE - 1}) // {FRAME_STRIDE} AS n_sampled,
  CAST(coalesce(list_sum([ (16*(instr('0123456789ABCDEF', substr(h, i, 1))-1)
                      + (instr('0123456789ABCDEF', substr(h, i+1, 1))-1))
                     for i in range(1, length(h)+1, 2)
                     if ((((i-1)//2) // {FRAME_BYTES}) % {FRAME_STRIDE} = 0) ]), 0) AS BIGINT) AS sampled_sum
FROM hx
"""


IMG_W = 64  # pseudo-image width in bytes (row-major)
IMG_H = 64  # rows; payloads crop/zero-pad to IMG_W*IMG_H
TILE_GRID = 4  # 4x4 tiles → 16 tile sums per image


def _image_tile_batches(it):
    """2D tile pooling over opaque payloads: bytes as a row-major
    IMG_W×IMG_H uint8 grid (cropped / zero-padded — the letterbox
    convention), reduced to TILE_GRID² per-tile sums. This is the
    pooling/resize access pattern an image pipeline runs after decode,
    with the decode stubbed (no codecs in this container) and the
    layout math real. Vectorized: one reshape+sum per image."""
    import numpy as np

    n_px = IMG_W * IMG_H
    th, tw = IMG_H // TILE_GRID, IMG_W // TILE_GRID
    for pdf in it:
        out = {"doc_id": [], "tile": [], "px_sum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(payload[:n_px], dtype=np.uint8).astype(np.int64)
            if len(a) < n_px:
                a = np.pad(a, (0, n_px - len(a)))
            sums = (
                a.reshape(IMG_H, IMG_W)
                .reshape(TILE_GRID, th, TILE_GRID, tw)
                .sum(axis=(1, 3))
                .reshape(-1)
            )
            out["doc_id"].extend([doc_id] * (TILE_GRID * TILE_GRID))
            out["tile"].extend(range(TILE_GRID * TILE_GRID))
            out["px_sum"].extend(int(s) for s in sums)
        yield pd.DataFrame(out)


def image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal tile pooling: binary payload → 4×4 grid of tile sums
    (exact integers). documents.text bytes stand in for decoded pixel
    buffers; a real decoder slots in front of the same kernel."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInPandas(
        _image_tile_batches, schema="doc_id long, tile int, px_sum long"
    )


def _tile_expr() -> str:
    tw, th = IMG_W // TILE_GRID, IMG_H // TILE_GRID
    return (
        f"((pos // {IMG_W}) // {th}) * {TILE_GRID} + (pos % {IMG_W}) // {tw}"
    )


IMAGE_TILES_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h FROM documents
), bytes AS (
  SELECT doc_id, (unnest(range(1, least(length(h), {2 * IMG_W * IMG_H}) + 1, 2)) - 1) // 2 AS pos, h
  FROM hx
), px AS (
  SELECT doc_id, pos, {_hexpair_to_int('h', '2*pos + 1')} AS b FROM bytes
), tiles AS (
  SELECT doc_id, {_tile_expr()} AS tile, CAST(sum(b) AS BIGINT) AS px_sum
  FROM px GROUP BY 1, 2
), grid AS (
  SELECT d.doc_id, t.tile FROM documents d
  CROSS JOIN (SELECT unnest(range({TILE_GRID * TILE_GRID})) AS tile) t
)
SELECT g.doc_id, CAST(g.tile AS INT) AS tile, coalesce(t.px_sum, 0) AS px_sum
FROM grid g LEFT JOIN tiles t ON g.doc_id = t.doc_id AND g.tile = t.tile
"""


def _phash_relation(docs: DataFrame) -> DataFrame:
    """(doc_id, phash, total_sum) over any (doc_id, text) relation —
    the tile pass + threshold rollup shared by image_phash and the
    cross-modal agreement audit (which phashes an AUGMENTED corpus)."""
    from pyspark.sql import Window

    d = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    tiles = d.mapInPandas(
        _image_tile_batches, schema="doc_id long, tile int, px_sum long"
    )
    n_tiles = TILE_GRID * TILE_GRID
    wt = Window.partitionBy("doc_id")  # 16 rows per partition
    flagged = tiles.withColumn("total_sum", F.sum("px_sum").over(wt)).withColumn(
        "bit",
        F.when(
            F.col("px_sum") * n_tiles > F.col("total_sum"),
            F.expr("shiftleft(1L, tile)"),
        ).otherwise(F.lit(0)),
    )
    return flagged.groupBy("doc_id").agg(
        F.sum("bit").alias("phash"), F.min("total_sum").alias("total_sum")
    )


def image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style image near-dup signature: bit j of the
    16-bit signature is set iff tile j's pixel sum exceeds the image
    mean (tile_sum · n_tiles > total_sum — an exact integer
    comparison, no float means). Images sharing a signature are
    near-dup candidates — the image analog of SimHash text dedup, and
    the standard cheap screen before pairwise image comparison at
    100 TB (groupBy on a 16-bit key: one keyed shuffle).

    Composed from the tile relation (one mapInPandas pass), a
    16-row-per-doc window for the image total, and a per-doc rollup on
    the same doc_id partitioning."""
    return _phash_relation(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


IMAGE_PHASH_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h FROM documents
), bytes AS (
  SELECT doc_id, (unnest(range(1, least(length(h), {2 * IMG_W * IMG_H}) + 1, 2)) - 1) // 2 AS pos, h
  FROM hx
), px AS (
  SELECT doc_id, pos, {_hexpair_to_int('h', '2*pos + 1')} AS b FROM bytes
), tiles AS (
  SELECT doc_id, {_tile_expr()} AS tile, CAST(sum(b) AS BIGINT) AS px_sum
  FROM px GROUP BY 1, 2
), flagged AS (
  SELECT doc_id, tile, px_sum,
         sum(px_sum) OVER (PARTITION BY doc_id) AS total_sum
  FROM tiles
)
SELECT doc_id,
       CAST(sum(CASE WHEN px_sum * {TILE_GRID * TILE_GRID} > total_sum
                     THEN (1 << tile) ELSE 0 END) AS BIGINT) AS phash,
       CAST(min(total_sum) AS BIGINT) AS total_sum
FROM flagged GROUP BY doc_id
"""


# --- cross-modal dedup agreement (round-11 frontier) -----------------------

CROSSMODAL_OFF = 10_000_000  # planted-twin doc_id re-key offset


def _crossmodal_fp_sql(text: str) -> str:
    """Exact-text fingerprint (normalized md5) — the stream_index_dedup
    normalization, shared verbatim by both engines."""
    return f"md5(regexp_replace(trim(lower({text})), '\\s+', ' ', 'g'))"


def _augmented_corpus(docs: DataFrame) -> DataFrame:
    """documents + three deterministic planted twin channels (the
    er_fuzzy_linkage discipline — each channel provably fires at every
    SF; cross-engine equality holds because every transform is
    character-exact ASCII-safe SQL both engines implement identically):

    - BOTH twin   (doc_id % 10 == 0): verbatim copy → same text
      fingerprint AND same image phash.
    - IMAGE twin  (doc_id % 10 == 5, len ≥ 2): first two characters
      swapped — a byte permutation WITHIN tile 0, so every tile sum
      (hence the phash) is unchanged, while the normalized text
      fingerprint differs for any doc whose first two characters
      differ.
    - TEXT twin   (doc_id % 10 == 2): two trailing spaces appended —
      trim-normalization keeps the fingerprint identical, while the
      appended bytes land inside the pixel window (all test texts are
      shorter than IMG_W·IMG_H) and perturb the tile sums.
    """
    both = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + CROSSMODAL_OFF).alias("doc_id"), "text"
    )
    image = (
        docs.filter((F.col("doc_id") % 10 == 5) & (F.length("text") >= 2))
        .select(
            (F.col("doc_id") + 2 * CROSSMODAL_OFF).alias("doc_id"),
            F.concat(
                F.substring("text", 2, 1),
                F.substring("text", 1, 1),
                F.expr("substring(text, 3)"),
            ).alias("text"),
        )
    )
    text = docs.filter(F.col("doc_id") % 10 == 2).select(
        (F.col("doc_id") + 3 * CROSSMODAL_OFF).alias("doc_id"),
        F.concat("text", F.lit("  ")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(both).unionByName(
        image
    ).unionByName(text)


def crossmodal_dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup agreement audit: over the planted-twin corpus,
    how often do the TEXT near-dup screen (exact normalized
    fingerprint) and the IMAGE near-dup screen (tile phash over the
    byte payload) nominate the same duplicate pairs? The answer prices
    a cheap single-modality screen before trusting it to gate the
    other modality at 100 TB (e.g. dropping images because their
    caption text is a dup).

    Pair masses are computed WITHOUT enumerating pairs: per-key group
    counts n contribute C(n,2) = n·(n−1)/2, summed — three keyed
    aggregates over the corpus, no joins of data-scaled relations, so
    the audit runs at any corpus size (the pair-free trick that the
    pair-ENUMERATING screens, dedup_exact and image_phash_pairs,
    cannot use because they must emit the pairs). jaccard_ppm =
    |both| / |text ∪ image| in integer ppm (div == // on
    non-negatives)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = _augmented_corpus(docs)
    fp = aug.select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        ).alias("fp"),
    )
    ph = _phash_relation(aug).select("doc_id", "phash")
    j = fp.join(ph, "doc_id").localCheckpoint()  # fixed-width, 3 consumers

    def pair_mass(cols: list, name: str) -> DataFrame:
        return (
            j.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.coalesce(F.sum(F.expr("n * (n - 1) div 2")), F.lit(0))
                .cast("long")
                .alias(name)
            )
        )

    t = pair_mass(["fp"], "n_pairs_text")
    i = pair_mass(["phash"], "n_pairs_image")
    b = pair_mass(["fp", "phash"], "n_pairs_both")
    return (
        t.crossJoin(i)
        .crossJoin(b)
        .select(
            "n_pairs_text",
            "n_pairs_image",
            "n_pairs_both",
            F.expr(
                "cast(coalesce((n_pairs_both * 1000000)"
                " div nullif(n_pairs_text + n_pairs_image - n_pairs_both, 0),"
                " 0) as bigint)"
            ).alias("jaccard_ppm"),
        )
    )


def _crossmodal_oracle() -> str:
    n_tiles = TILE_GRID * TILE_GRID
    return f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {CROSSMODAL_OFF}, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + {2 * CROSSMODAL_OFF},
         substr(text, 2, 1) || substr(text, 1, 1) || substr(text, 3)
  FROM documents WHERE doc_id % 10 = 5 AND length(text) >= 2
  UNION ALL
  SELECT doc_id + {3 * CROSSMODAL_OFF}, text || '  '
  FROM documents WHERE doc_id % 10 = 2
), hx AS (
  SELECT doc_id, hex(encode(text)) AS h FROM aug
), bytes AS (
  SELECT doc_id, (unnest(range(1, least(length(h), {2 * IMG_W * IMG_H}) + 1, 2)) - 1) // 2 AS pos, h
  FROM hx
), px AS (
  SELECT doc_id, pos, {_hexpair_to_int('h', '2*pos + 1')} AS b FROM bytes
), tiles AS (
  SELECT doc_id, {_tile_expr()} AS tile, CAST(sum(b) AS BIGINT) AS px_sum
  FROM px GROUP BY 1, 2
), flagged AS (
  SELECT doc_id, tile, px_sum,
         sum(px_sum) OVER (PARTITION BY doc_id) AS total_sum
  FROM tiles
), ph AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN px_sum * {n_tiles} > total_sum
                       THEN (1 << tile) ELSE 0 END) AS BIGINT) AS phash
  FROM flagged GROUP BY doc_id
), joined AS (
  SELECT a.doc_id, {_crossmodal_fp_sql("a.text")} AS fp, ph.phash
  FROM aug a JOIN ph USING (doc_id)
), t AS (
  SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS n_pairs_text
  FROM (SELECT count(*) AS n FROM joined GROUP BY fp)
), i AS (
  SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS n_pairs_image
  FROM (SELECT count(*) AS n FROM joined GROUP BY phash)
), b AS (
  SELECT CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS n_pairs_both
  FROM (SELECT count(*) AS n FROM joined GROUP BY fp, phash)
)
SELECT n_pairs_text, n_pairs_image, n_pairs_both,
       CAST(coalesce((n_pairs_both * 1000000)
            // nullif(n_pairs_text + n_pairs_image - n_pairs_both, 0), 0)
            AS BIGINT) AS jaccard_ppm
FROM t CROSS JOIN i CROSS JOIN b
"""


def decode_audio(payload: bytes, sample_rate: int = 16_000):
    """Decode an audio payload by container dispatch. WAV (mono 16-bit
    PCM) decodes FOR REAL via the stdlib RIFF parser in
    functions/codecs.py — see multimodal_wav_roundtrip below, which
    drives encode→decode→energy features through mapInPandas under an
    oracle. Compressed formats (MP3/AAC/Opus) still raise: no codec
    libraries in this container."""
    from ai_data_pipeline_spark.functions.codecs import wav_decode

    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return wav_decode(payload)
    raise NotImplementedError(
        "only WAV/PCM decode is available in this environment; "
        "MP3/AAC need codec libraries this container does not ship"
    )


AUDIO_FRAME = 64  # samples per analysis frame

AUDIO_SCHEMA = (
    "doc_id long, n_samples long, n_frames long, total_energy long,"
    " max_energy long, peak_frame long"
)


def _audio_energy_batches(it):
    """Waveform analysis over opaque payloads: bytes as centered 8-bit
    PCM, per-frame energy = Σ(sample−128)², peak-frame detection —
    the VAD/silence-trim access pattern, vectorized with reduceat."""
    import numpy as np

    for pdf in it:
        out = {
            "doc_id": [], "n_samples": [], "n_frames": [],
            "total_energy": [], "max_energy": [], "peak_frame": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(payload, dtype=np.uint8).astype(np.int64) - 128
            sq = a * a
            n = len(a)
            n_frames = -(-n // AUDIO_FRAME)
            energies = np.add.reduceat(sq, np.arange(0, n, AUDIO_FRAME)) if n else np.zeros(0, dtype=np.int64)
            out["doc_id"].append(doc_id)
            out["n_samples"].append(n)
            out["n_frames"].append(n_frames)
            out["total_energy"].append(int(sq.sum()))
            out["max_energy"].append(int(energies.max()) if n else 0)
            out["peak_frame"].append(int(energies.argmax()) if n else -1)
        yield pd.DataFrame(out)


def audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio path: binary payload → framed energy profile →
    peak frame. documents.text bytes stand in for PCM; a real decoder
    (decode_audio stub) slots in front of the same kernel."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInPandas(_audio_energy_batches, schema=AUDIO_SCHEMA)


AUDIO_ENERGY_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h FROM documents
), bytes AS (
  SELECT doc_id,
         (unnest(range(1, length(h) + 1, 2)) - 1) // 2 AS pos,
         h
  FROM hx
), samples AS (
  SELECT doc_id, pos,
         {_hexpair_to_int('h', '2*pos + 1')} - 128 AS s
  FROM bytes
), frames AS (
  SELECT doc_id, pos // {AUDIO_FRAME} AS frame, sum(s * s) AS energy,
         count(*) AS n_in_frame
  FROM samples GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id,
         CAST(sum(n_in_frame) AS BIGINT) AS n_samples,
         count(*) AS n_frames,
         CAST(sum(energy) AS BIGINT) AS total_energy,
         CAST(max(energy) AS BIGINT) AS max_energy
  FROM frames GROUP BY 1
), peak AS (
  SELECT doc_id, frame AS peak_frame FROM (
    SELECT doc_id, frame,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY energy DESC, frame ASC) AS rk
    FROM frames
  ) WHERE rk = 1
)
SELECT d.doc_id, n_samples, n_frames, total_energy, max_energy, peak_frame
FROM per_doc d JOIN peak p ON d.doc_id = p.doc_id
"""


PHASH_BANDS = 4  # 32-bit signature -> 4 bands x 8 bits
PHASH_BAND_BITS = 8
PHASH_HAM_MAX = 3  # with 4 bands, any pair at Hamming <= 3 shares a band
# 32 signature segments: 8-bit bands give 256 bucket values per band, so
# expected bucket membership is n/256 — the 16-bit/4-bit variant had only
# 16 values per band and measurably degenerated toward all-pairs at
# sf0.1 (~312 docs per bucket -> ~3M candidate pairs). Widening the
# signature as the corpus grows is exactly the documented scale lever.
SEG_BITS = 32


def _seg_sig_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Content-adaptive SEG_BITS-bit signature (32 bits, 4×8-bit
    bands): the payload splits into
    SEG_BITS equal byte segments (boundaries scale with the payload, so
    every bit covers real content — unlike the fixed-canvas tile hash,
    whose zero-padded tiles are constant across documents); bit j is set
    iff segment j's byte sum exceeds the payload mean (exact integer
    cross-product test). One np.add.reduceat per row."""
    import numpy as np

    for pdf in it:
        doc_ids = pdf["doc_id"].to_numpy()
        sigs = np.zeros(len(doc_ids), dtype=np.int64)
        for r, payload in enumerate(pdf["payload"]):
            n = len(payload)
            if n == 0:
                continue
            a = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            # segment of byte pos is pos*SEG_BITS // n, so segment j
            # starts at ceil(j*n / SEG_BITS)
            offs = -((np.arange(SEG_BITS, dtype=np.int64) * -n) // SEG_BITS)
            sums = np.add.reduceat(a, np.minimum(offs, n - 1))
            # reduceat yields a[off] (not 0) for empty segments — mask
            ends = np.append(offs[1:], n)
            sums[offs >= ends] = 0
            total = int(a.sum())
            bits = (sums * SEG_BITS > total).astype(np.int64)
            sigs[r] = int((bits << np.arange(SEG_BITS)).sum())
        yield pd.DataFrame({"doc_id": doc_ids, "phash": sigs})


def image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs via banded Hamming join on a
    perceptual signature — the LSH-banding trick applied to images:
    split the SEG_BITS-bit signature (32 bits) into PHASH_BANDS bands
    (8 bits each); by pigeonhole,
    any pair within Hamming distance PHASH_HAM_MAX (< #bands) agrees
    exactly on at least one band, so an equi-join on (band, band_value)
    generates every true candidate without an all-pairs product.
    Candidates are deduped (a pair can share several bands) and
    verified with an exact ``bit_count(xor)`` popcount.

    Scale: one keyed shuffle on the (band, value) key instead of O(n²)
    comparisons; at 100 TB you widen the signature (64-bit) and the
    bands so per-bucket membership stays executor-sized — same plan
    shape. The signature itself is one mapInPandas scan (content-
    adaptive segments, see _seg_sig_batches — the fixed-canvas tile
    hash of ``image_phash`` is near-constant on short payloads and
    would degenerate to all-pairs)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    sig = d.mapInPandas(_seg_sig_batches, schema="doc_id long, phash long")
    bands = sig.select(
        "doc_id",
        "phash",
        F.explode(F.array(*[F.lit(j) for j in range(PHASH_BANDS)])).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(phash, band * {PHASH_BAND_BITS}) & {2**PHASH_BAND_BITS - 1}"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("pa"),
            F.col("b.phash").alias("pb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(pa ^ pb)"))
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


IMAGE_PHASH_PAIRS_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n FROM documents
), bytes AS (
  SELECT doc_id, n, (unnest(range(1, length(h) + 1, 2)) - 1) // 2 AS pos, h
  FROM hx
), px AS (
  SELECT doc_id, (pos * {SEG_BITS}) // n AS seg,
         {_hexpair_to_int('h', '2*pos + 1')} AS b
  FROM bytes
), segs AS (
  SELECT doc_id, seg, CAST(sum(b) AS BIGINT) AS seg_sum FROM px GROUP BY 1, 2
), flagged AS (
  SELECT doc_id, seg, seg_sum,
         sum(seg_sum) OVER (PARTITION BY doc_id) AS total_sum
  FROM segs
), sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN seg_sum * {SEG_BITS} > total_sum
                       THEN (CAST(1 AS BIGINT) << seg) ELSE 0 END) AS BIGINT) AS phash
  FROM flagged GROUP BY doc_id
), bands AS (
  SELECT doc_id, phash, band,
         (phash >> (band * {PHASH_BAND_BITS})) & {2**PHASH_BAND_BITS - 1} AS band_val
  FROM sig CROSS JOIN (SELECT unnest(range({PHASH_BANDS})) AS band)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.phash AS pa, b.phash AS pb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(pa, pb)) <= {PHASH_HAM_MAX}
"""


SHOT_JUMP_NUM, SHOT_JUMP_DEN = 3, 10  # boundary = >= 30% energy jump


def _frame_energy_batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """Per-frame byte-sum energies: one np.add.reduceat per payload
    (the same vectorized surface as the audio kernel); real codecs
    replace the byte-sum with a decoded-luma sum, same shape."""
    import numpy as np

    for pdf in it:
        doc_ids, frames, energies = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            if n == 0:
                continue
            a = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            offs = np.arange(0, n, FRAME_BYTES, dtype=np.int64)
            sums = np.add.reduceat(a, offs)
            doc_ids.extend([doc_id] * len(offs))
            frames.extend(range(len(offs)))
            energies.extend(int(s) for s in sums)
        yield pd.DataFrame(
            {"doc_id": doc_ids, "frame": frames, "energy": energies}
        )


def shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the sampled frame stream — the
    temporal-structure pass a video curation pipeline runs to split
    footage into clips before captioning/embedding: a boundary is a
    relative energy jump >= SHOT_JUMP_NUM/SHOT_JUMP_DEN between
    consecutive frames (exact-rational test; a zero-energy previous
    frame is a boundary iff the current frame is non-zero). Emits per
    video: frame count, boundary count, and the first cut point.

    Scale: the frame explosion is a mapInPandas scan (one reduceat per
    payload); the lag window partitions by doc_id — state bounded by
    frames-per-video, never corpus size — and the rollup is a keyed
    aggregate with map-side partials."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    frames = d.mapInPandas(
        _frame_energy_batches, schema="doc_id long, frame int, energy long"
    )
    w = W.partitionBy("doc_id").orderBy("frame")
    flagged = frames.withColumn("prev", F.lag("energy").over(w)).withColumn(
        "is_cut",
        F.when(F.col("prev").isNull(), F.lit(0))
        .when((F.col("prev") == 0), (F.col("energy") > 0).cast("int"))
        .otherwise(
            (
                F.abs(F.col("energy") - F.col("prev")) * SHOT_JUMP_DEN
                >= F.col("prev") * SHOT_JUMP_NUM
            ).cast("int")
        ),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("is_cut").alias("n_boundaries"),
        F.min(F.when(F.col("is_cut") == 1, F.col("frame"))).alias("first_cut"),
    )


SHOT_BOUNDARIES_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS h FROM documents
  WHERE octet_length(encode(text)) > 0
), bytes AS (
  SELECT doc_id, (unnest(range(1, length(h) + 1, 2)) - 1) // 2 AS pos, h
  FROM hx
), fe AS (
  SELECT doc_id, pos // {FRAME_BYTES} AS frame,
         CAST(sum({_hexpair_to_int('h', '2*pos + 1')}) AS BIGINT) AS energy
  FROM bytes GROUP BY 1, 2
), flagged AS (
  SELECT doc_id, frame, energy,
         lag(energy) OVER (PARTITION BY doc_id ORDER BY frame) AS prev
  FROM fe
), cuts AS (
  SELECT doc_id, frame,
         CASE WHEN prev IS NULL THEN 0
              WHEN prev = 0 THEN CAST(energy > 0 AS INT)
              ELSE CAST(abs(energy - prev) * {SHOT_JUMP_DEN}
                        >= prev * {SHOT_JUMP_NUM} AS INT) END AS is_cut
  FROM flagged
)
SELECT doc_id, count(*) AS n_frames,
       CAST(sum(is_cut) AS BIGINT) AS n_boundaries,
       min(CASE WHEN is_cut = 1 THEN frame END) AS first_cut
FROM cuts GROUP BY doc_id
"""


HDR_MAX_DIM = 16_000_000  # plausibility band for the fake width/height


def header_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction from a binary column WITHOUT any
    Python: the first 8 payload bytes parse as two big-endian uint32s
    (standing in for an image header's width/height), entirely with
    built-in expressions (hex + base-16 conv) — the pattern for pulling
    typed fields out of binary lake columns at scan speed when the
    header layout is fixed. Emits the parsed dims and a plausibility
    flag; real formats swap the offsets, same plan (a magic-number
    dispatch CASE on the first bytes).

    Scale: narrow map over the scan, whole-stage codegen, no shuffle."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    hx = d.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.hex(F.col("payload")).alias("h"),
    )
    w = F.when(
        F.col("n_bytes") >= 8, F.conv(F.substring("h", 1, 8), 16, 10).cast("long")
    )
    hgt = F.when(
        F.col("n_bytes") >= 8, F.conv(F.substring("h", 9, 8), 16, 10).cast("long")
    )
    return hx.select(
        "doc_id",
        "n_bytes",
        w.alias("hdr_w"),
        hgt.alias("hdr_h"),
        (
            w.isNotNull()
            & (w > 0)
            & (w <= HDR_MAX_DIM)
            & (hgt > 0)
            & (hgt <= HDR_MAX_DIM)
        )
        .cast("int")
        .alias("flag_plausible"),
    )


HEADER_META_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes, hex(encode(text)) AS h
  FROM documents
), parsed AS (
  SELECT doc_id, n_bytes,
         CASE WHEN n_bytes >= 8
              THEN CAST('0x' || substr(h, 1, 8) AS BIGINT) END AS hdr_w,
         CASE WHEN n_bytes >= 8
              THEN CAST('0x' || substr(h, 9, 8) AS BIGINT) END AS hdr_h
  FROM hx
)
SELECT doc_id, n_bytes, hdr_w, hdr_h,
       CAST(coalesce(hdr_w > 0 AND hdr_w <= {HDR_MAX_DIM}
                     AND hdr_h > 0 AND hdr_h <= {HDR_MAX_DIM}, FALSE) AS INT)
         AS flag_plausible
FROM parsed
"""


# --- real-codec roundtrips -------------------------------------------------
# Deterministic media synthesized from doc_id arithmetic, encoded to a
# REAL container (PNG via zlib DEFLATE with chunk CRCs; WAV via RIFF),
# decoded back with the spec-parsing decoders in functions/codecs.py,
# and feature-extracted — all inside one mapInPandas stage. The oracle
# recomputes the features from the same closed-form pixel/sample
# definitions, so any codec defect (filtering, CRC, chunk walk, byte
# order) surfaces as a value mismatch; the stage additionally asserts
# decode(encode(x)) == x so corruption fails LOUDLY rather than
# producing plausible wrong features.

RT_W, RT_H = 24, 16  # synthesized image dims (384 px)
RS_H, RS_W = 8, 12  # nearest-neighbor resize target
WAV_N = 256  # samples per synthesized clip
WAV_RATE = 16_000

PNG_RT_SCHEMA = (
    "doc_id long, width int, height int, px_sum long, px_min int,"
    " px_max int, rs_sum long"
)


def _png_roundtrip_batches(it):
    import numpy as np

    from ai_data_pipeline_spark.functions.codecs import (
        png_decode,
        png_encode_gray,
        resize_nearest,
    )

    idx = np.arange(RT_W * RT_H, dtype=np.int64)
    for pdf in it:
        out = {
            "doc_id": [], "width": [], "height": [], "px_sum": [],
            "px_min": [], "px_max": [], "rs_sum": [],
        }
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            img = ((doc_id * 31 + idx * 7) % 256).astype(np.uint8).reshape(
                RT_H, RT_W
            )
            decoded, meta = png_decode(png_encode_gray(img))
            if not np.array_equal(decoded, img):
                raise ValueError(f"PNG roundtrip broke identity for doc {doc_id}")
            rs = resize_nearest(decoded, (RS_H, RS_W))
            out["doc_id"].append(doc_id)
            out["width"].append(meta["width"])
            out["height"].append(meta["height"])
            out["px_sum"].append(int(decoded.astype(np.int64).sum()))
            out["px_min"].append(int(decoded.min()))
            out["px_max"].append(int(decoded.max()))
            out["rs_sum"].append(int(rs.astype(np.int64).sum()))
        yield pd.DataFrame(out)


def png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-PNG decode path: synthesize per-doc grayscale pixels, write
    a spec-complete PNG (zlib + CRCs), parse it back (header, chunk
    walk, inflate, unfilter), assert bit-identity, then feature-extract
    the DECODED pixels (+ a nearest-neighbor thumbnail). Emitted stats
    come only from parsed output — width/height from IHDR, sums from
    decoded pixels — so the oracle checks the codec, not the generator.

    Scale: the media path at 100 TB is exactly this shape — binary in
    object storage, decode + features in one Arrow-batched Python
    stage, nothing but fixed-width features ever shuffled."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(_png_roundtrip_batches, schema=PNG_RT_SCHEMA)


PNG_ROUNDTRIP_ORACLE = f"""
WITH px AS (
  SELECT doc_id, i, (doc_id * 31 + i * 7) % 256 AS p
  FROM documents, (SELECT unnest(range(0, {RT_W * RT_H})) AS i)
), base AS (
  SELECT doc_id, CAST(sum(p) AS BIGINT) AS px_sum,
         CAST(min(p) AS INT) AS px_min, CAST(max(p) AS INT) AS px_max
  FROM px GROUP BY doc_id
), rs AS (
  SELECT doc_id,
         CAST(sum((doc_id * 31
                   + (((y * {RT_H}) // {RS_H}) * {RT_W}
                      + (x * {RT_W}) // {RS_W}) * 7) % 256) AS BIGINT)
           AS rs_sum
  FROM documents,
       (SELECT unnest(range(0, {RS_H})) AS y),
       (SELECT unnest(range(0, {RS_W})) AS x)
  GROUP BY doc_id
)
SELECT b.doc_id, CAST({RT_W} AS INT) AS width, CAST({RT_H} AS INT) AS height,
       px_sum, px_min, px_max, rs_sum
FROM base b JOIN rs USING (doc_id)
"""


# BMP roundtrip: deliberately ODD width so the 4-byte row padding path
# is exercised (stride 24 for width 23), and a top-row feature so a
# decoder that forgot the bottom-up flip fails the oracle even though
# whole-image sums would still match.
BMP_W, BMP_H = 23, 14

BMP_RT_SCHEMA = (
    "doc_id long, width int, height int, px_sum long, px_min int,"
    " px_max int, top_row_sum long"
)


def _bmp_roundtrip_batches(it):
    import numpy as np

    from ai_data_pipeline_spark.functions.codecs import (
        bmp_decode,
        bmp_encode_gray,
    )

    idx = np.arange(BMP_W * BMP_H, dtype=np.int64)
    for pdf in it:
        out = {
            "doc_id": [], "width": [], "height": [], "px_sum": [],
            "px_min": [], "px_max": [], "top_row_sum": [],
        }
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            img = ((doc_id * 13 + idx * 5) % 256).astype(np.uint8).reshape(
                BMP_H, BMP_W
            )
            decoded, meta = bmp_decode(bmp_encode_gray(img))
            if not np.array_equal(decoded, img):
                raise ValueError(f"BMP roundtrip broke identity for doc {doc_id}")
            d64 = decoded.astype(np.int64)
            out["doc_id"].append(doc_id)
            out["width"].append(meta["width"])
            out["height"].append(meta["height"])
            out["px_sum"].append(int(d64.sum()))
            out["px_min"].append(int(decoded.min()))
            out["px_max"].append(int(decoded.max()))
            out["top_row_sum"].append(int(d64[0].sum()))
        yield pd.DataFrame(out)


def bmp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-BMP decode path: synthesize per-doc grayscale pixels, write
    an indexed-8 BI_RGB DIB (identity palette, bottom-up padded rows),
    parse it back (header validation, palette check, flip, de-pad),
    assert bit-identity, then feature-extract the DECODED pixels. The
    top-row sum pins scanline ORDER — a decoder that skipped the
    bottom-up flip reproduces every whole-image stat but fails it.

    Same 100 TB shape as multimodal_png_roundtrip: binary payloads
    decode in one Arrow-batched Python stage; only fixed-width
    features shuffle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(_bmp_roundtrip_batches, schema=BMP_RT_SCHEMA)


BMP_ROUNDTRIP_ORACLE = f"""
WITH px AS (
  SELECT doc_id, i, (doc_id * 13 + i * 5) % 256 AS p
  FROM documents, (SELECT unnest(range(0, {BMP_W * BMP_H})) AS i)
)
SELECT doc_id, CAST({BMP_W} AS INT) AS width, CAST({BMP_H} AS INT) AS height,
       CAST(sum(p) AS BIGINT) AS px_sum,
       CAST(min(p) AS INT) AS px_min, CAST(max(p) AS INT) AS px_max,
       CAST(sum(CASE WHEN i < {BMP_W} THEN p ELSE 0 END) AS BIGINT)
         AS top_row_sum
FROM px GROUP BY doc_id
"""


GIF_W, GIF_H = 21, 13
GIF_RT_SCHEMA = (
    "doc_id long, width int, height int, px_sum long, px_min int,"
    " px_max int, top_row_sum long"
)


def _gif_roundtrip_batches(it):
    import numpy as np

    from ai_data_pipeline_spark.functions.codecs import (
        gif_decode,
        gif_encode_gray,
    )

    idx = np.arange(GIF_W * GIF_H, dtype=np.int64)
    for pdf in it:
        out = {
            "doc_id": [], "width": [], "height": [], "px_sum": [],
            "px_min": [], "px_max": [], "top_row_sum": [],
        }
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            img = ((doc_id * 29 + idx * 7) % 256).astype(np.uint8).reshape(
                GIF_H, GIF_W
            )
            decoded, meta = gif_decode(gif_encode_gray(img))
            if not np.array_equal(decoded, img):
                raise ValueError(f"GIF roundtrip broke identity for doc {doc_id}")
            d64 = decoded.astype(np.int64)
            out["doc_id"].append(doc_id)
            out["width"].append(meta["width"])
            out["height"].append(meta["height"])
            out["px_sum"].append(int(d64.sum()))
            out["px_min"].append(int(decoded.min()))
            out["px_max"].append(int(decoded.max()))
            out["top_row_sum"].append(int(d64[0].sum()))
        yield pd.DataFrame(out)


def gif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-GIF decode path: synthesize per-doc grayscale pixels,
    LZW-compress them into a GIF87a (identity palette, variable-width
    codes, sub-block framing), parse it back (signature/palette/
    framing validation, full LZW decode incl. the self-referential
    code case), assert bit-identity, then feature-extract the DECODED
    pixels. Unlike PNG/BMP, the payload here went through a REAL
    entropy coder round-trip — a single corrupted code widens or
    shifts every later code, so the identity assert covers the whole
    bit stream. top_row_sum pins scanline order (GIF is top-down —
    the opposite of BMP's bottom-up, so a decoder confusing the two
    conventions fails exactly one of the twin queries).

    Same 100 TB shape as the PNG/BMP twins: one Arrow-batched Python
    stage; only fixed-width features shuffle. Unlike those twins, the
    kernel is genuinely sequential per image (LZW), so the CPU-bound
    stage is repartitioned first — the profiler discipline for
    single-row-group test parquet that would otherwise scan (and
    LZW-encode 50k images) in one task; no-ops at cluster scale where
    the scan already has thousands of splits."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    parallelism = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < parallelism:
        d = d.repartition(parallelism)
    return d.mapInPandas(_gif_roundtrip_batches, schema=GIF_RT_SCHEMA)


GIF_ROUNDTRIP_ORACLE = f"""
WITH px AS (
  SELECT doc_id, i, (doc_id * 29 + i * 7) % 256 AS p
  FROM documents, (SELECT unnest(range(0, {GIF_W * GIF_H})) AS i)
)
SELECT doc_id, CAST({GIF_W} AS INT) AS width, CAST({GIF_H} AS INT) AS height,
       CAST(sum(p) AS BIGINT) AS px_sum,
       CAST(min(p) AS INT) AS px_min, CAST(max(p) AS INT) AS px_max,
       CAST(sum(CASE WHEN i < {GIF_W} THEN p ELSE 0 END) AS BIGINT)
         AS top_row_sum
FROM px GROUP BY doc_id
"""


WAV_RT_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, amp_sum long,"
    " energy long, s_min int, s_max int"
)


def _wav_roundtrip_batches(it):
    import numpy as np

    from ai_data_pipeline_spark.functions.codecs import (
        wav_decode,
        wav_encode_pcm16,
    )

    idx = np.arange(WAV_N, dtype=np.int64)
    for pdf in it:
        out = {
            "doc_id": [], "n_samples": [], "sample_rate": [], "amp_sum": [],
            "energy": [], "s_min": [], "s_max": [],
        }
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            s = (((doc_id * 7 + idx * 11) % 4096) - 2048).astype(np.int16)
            decoded, rate = wav_decode(wav_encode_pcm16(s, rate=WAV_RATE))
            if rate != WAV_RATE or not np.array_equal(decoded, s):
                raise ValueError(f"WAV roundtrip broke identity for doc {doc_id}")
            d64 = decoded.astype(np.int64)
            out["doc_id"].append(doc_id)
            out["n_samples"].append(len(decoded))
            out["sample_rate"].append(rate)
            out["amp_sum"].append(int(d64.sum()))
            out["energy"].append(int((d64 * d64).sum()))
            out["s_min"].append(int(decoded.min()))
            out["s_max"].append(int(decoded.max()))
        yield pd.DataFrame(out)


def wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-WAV decode path: synthesize per-doc 16-bit PCM, wrap in a
    RIFF container, parse it back (chunk walk, fmt validation, LE
    samples), assert bit-identity, then compute the energy features a
    speech-curation pipeline runs (sum/energy/range) from the DECODED
    samples only."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(_wav_roundtrip_batches, schema=WAV_RT_SCHEMA)


WAV_ROUNDTRIP_ORACLE = f"""
WITH s AS (
  SELECT doc_id, ((doc_id * 7 + i * 11) % 4096) - 2048 AS v
  FROM documents, (SELECT unnest(range(0, {WAV_N})) AS i)
)
SELECT doc_id, count(*) AS n_samples, CAST({WAV_RATE} AS INT) AS sample_rate,
       CAST(sum(v) AS BIGINT) AS amp_sum,
       CAST(sum(v * v) AS BIGINT) AS energy,
       CAST(min(v) AS INT) AS s_min, CAST(max(v) AS INT) AS s_max
FROM s GROUP BY doc_id
"""


QUERY_DEFS = [
    QueryDef("multimodal_byte_features", byte_features, BYTE_FEATURES_ORACLE),
    QueryDef("multimodal_png_roundtrip", png_roundtrip, PNG_ROUNDTRIP_ORACLE),
    QueryDef("multimodal_bmp_roundtrip", bmp_roundtrip, BMP_ROUNDTRIP_ORACLE),
    QueryDef("multimodal_gif_roundtrip", gif_roundtrip, GIF_ROUNDTRIP_ORACLE),
    QueryDef("multimodal_wav_roundtrip", wav_roundtrip, WAV_ROUNDTRIP_ORACLE),
    QueryDef("multimodal_shot_boundaries", shot_boundaries, SHOT_BOUNDARIES_ORACLE),
    QueryDef("multimodal_header_meta", header_meta, HEADER_META_ORACLE),
    QueryDef("multimodal_image_phash_pairs", image_phash_pairs, IMAGE_PHASH_PAIRS_ORACLE),
    QueryDef("multimodal_frame_sample", frame_sample, FRAME_SAMPLE_ORACLE),
    QueryDef("multimodal_audio_energy", audio_energy, AUDIO_ENERGY_ORACLE),
    QueryDef("multimodal_image_tiles", image_tiles, IMAGE_TILES_ORACLE),
    QueryDef("multimodal_image_phash", image_phash, IMAGE_PHASH_ORACLE),
    QueryDef(
        "crossmodal_dedup_agreement", crossmodal_dedup_agreement, _crossmodal_oracle()
    ),
]
