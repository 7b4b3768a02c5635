"""Group K — multimodal column plumbing (q62): opaque binary payloads
with typed metadata, decoded by an Arrow-batched Python stage.

The container has no image/audio codecs, so the decode kernel is a
DETERMINISTIC FAKE (byte-level stats standing in for pixel stats) and
the real-codec path raises ``NotImplementedError`` — clearly marked
below. Everything around the stub is the real production shape:

- payloads as a ``binary`` column + a typed metadata struct
  (the Parquet layout a multimodal training set uses),
- decode as ``mapInPandas`` — Arrow record batches into Python, one
  vectorized pass per batch, schema declared as a DDL string,
- batch-size control via ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (decoders are memory-bound: payload_bytes × batch_rows is the
  executor-memory knob at 100 TB).

The oracle checks the byte-level outputs (payload length, header
byte, fake dims) in SQL — proving the binary plumbing round-trips —
while the Python stage is the part a real deployment swaps for PIL /
ffmpeg.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hearthstats_spark.io import load_table
from hearthstats_spark.queries.registry import register

_HAVE_REAL_CODECS = False  # no PIL/ffmpeg in this container
try:  # pragma: no cover - exercised only where codecs exist
    import PIL.Image  # noqa: F401

    _HAVE_REAL_CODECS = True
except ImportError:
    pass


def _decode_real(payload: bytes) -> dict:  # pragma: no cover
    """Real-codec path: swap in PIL/ffmpeg here. STUB — this container
    ships no codecs, so reaching this is a deployment error."""
    raise NotImplementedError(
        "real image decode requires PIL; this environment runs the "
        "deterministic fake decoder instead"
    )


#: hex(encode(text)) is the oracle's view of the engine's UTF-8
#: payload bytes (string→binary cast): byte i is the hex pair at
#: substr(hx, 2i-1, 2), decoded with strpos on the uppercase digit
#: table. On pure-ASCII corpora bytes == code points, which is why
#: the former n_chars/unicode()-based oracles passed for six rounds —
#: the unicode-text audit axis (round 8) exposed the conflation.
_HEXDIGITS = "0123456789ABCDEF"


def _hex_pair_sql(hx: str, pos: str) -> str:
    """SQL for the INT value of byte #``pos`` (1-based) of the hex
    dump ``hx`` — (high nibble)*16 + low nibble."""
    return (f"(strpos('{_HEXDIGITS}', substr({hx}, 2 * ({pos}) - 1, 1)) - 1)"
            f" * 16"
            f" + strpos('{_HEXDIGITS}', substr({hx}, 2 * ({pos}), 1)) - 1")


@register(
    "q62_multimodal_decode",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, text,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
        FROM documents
    )
    SELECT doc_id,
           'image' AS modality,
           CAST(nb AS BIGINT) AS n_bytes,
           CAST(CASE WHEN text IS NULL THEN NULL
                     WHEN nb = 0 THEN -1
                     ELSE {_hex_pair_sql('hx', '1')}
                END AS INT) AS header_byte,
           CAST(32 + doc_id % 608 AS INT) AS width,
           CAST(32 + doc_id % 448 AS INT) AS height
    FROM b
    """,
)
def q62_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble binary payload + metadata struct, then run the decode
    stage over ``mapInPandas``. Fake decoder: payload length, header
    byte, metadata passthrough — enough to prove schema, partitioning,
    UDF signature, and Arrow batch shape end to end.

    NULL-payload policy (degenerate audit, round 8): a missing
    payload decodes to NULL stats — the kernel emits NULL
    n_bytes/header_byte instead of crashing on ``len(None)``, and the
    oracle's payload-derived columns carry the matching ``CASE WHEN
    text IS NULL THEN NULL`` (n_bytes must NOT fall back to the
    n_chars metadata column for a null payload). Metadata-derived
    columns (width/height) stay non-null on both engines. No-op on
    the shipped corpora."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    assembled = d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),  # opaque bytes
        F.struct(
            F.lit("image").alias("modality"),
            (F.lit(32) + F.col("doc_id") % 608).cast("int").alias("width"),
            (F.lit(32) + F.col("doc_id") % 448).cast("int").alias("height"),
        ).alias("meta"),
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if _HAVE_REAL_CODECS:  # pragma: no cover
                [_decode_real(p) for p in b["payload"] if p is not None]
            payloads = b["payload"]
            yield pd.DataFrame({
                "doc_id": b["doc_id"],
                "modality": [m["modality"] for m in b["meta"]],
                "n_bytes": pd.array(
                    [None if p is None else len(p) for p in payloads],
                    dtype="Int64"),
                "header_byte": pd.array(
                    [None if p is None else (p[0] if len(p) else -1)
                     for p in payloads],
                    dtype="Int32"),
                "width": [m["width"] for m in b["meta"]],
                "height": [m["height"] for m in b["meta"]],
            })

    return assembled.mapInPandas(
        decode,
        "doc_id long, modality string, n_bytes long, header_byte int, "
        "width int, height int",
    )


_N_FRAMES = 4


@register(
    "q65_multimodal_frames",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, text,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
        FROM documents
    )
    SELECT doc_id,
           CAST(f.frame_idx AS INT) AS frame_idx,
           CAST(CASE WHEN text IS NULL THEN NULL
                     ELSE (f.frame_idx * nb) // {_N_FRAMES} END
                AS BIGINT) AS offset,
           CAST(CASE WHEN text IS NULL THEN NULL
                     WHEN nb = 0 THEN -1
                     ELSE {_hex_pair_sql(
                         'hx',
                         f'(f.frame_idx * nb) // {_N_FRAMES} + 1')}
                END AS INT) AS frame_byte
    FROM b
    CROSS JOIN (SELECT unnest(generate_series(0, {_N_FRAMES - 1}))
                AS frame_idx) f
    """,
)
def q65_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling — the 1→N multimodal shape (video → sampled
    frames): each payload emits ``_N_FRAMES`` rows at evenly-spaced
    byte offsets, produced in one vectorized ``mapInPandas`` pass
    (the decoder-free analog of ffmpeg keyframe extraction; the
    sampled byte stands in for the frame tensor).

    Scale notes: output rows = N × input rows with no shuffle — the
    explode happens inside the Python stage so payload bytes cross
    the Arrow boundary ONCE, not once per frame.

    NULL-payload policy (degenerate audit, round 8): a NULL payload
    still emits its {_N_FRAMES} frame rows (the 1→N fan-out is
    metadata-driven) but with NULL offset/frame_byte on both engines;
    no-op on the shipped corpora."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload"))

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "frame_idx": [], "offset": [],
                   "frame_byte": []}
            for did, payload in zip(b["doc_id"], b["payload"]):
                if payload is None:  # NULL payload -> NULL frame stats
                    for i in range(_N_FRAMES):
                        out["doc_id"].append(did)
                        out["frame_idx"].append(i)
                        out["offset"].append(None)
                        out["frame_byte"].append(None)
                    continue
                n = len(payload)
                for i in range(_N_FRAMES):
                    off = (i * n) // _N_FRAMES
                    out["doc_id"].append(did)
                    out["frame_idx"].append(i)
                    out["offset"].append(off)
                    out["frame_byte"].append(payload[off] if n else -1)
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "offset": pd.array(out["offset"], dtype="Int64"),
                "frame_byte": pd.array(out["frame_byte"], dtype="Int32"),
            })

    return d.mapInPandas(
        sample_frames,
        "doc_id long, frame_idx int, offset long, frame_byte int",
    )


_N_HIST = 16
# q71's oracle decodes byte % 16 as the low hex nibble — only valid
# at exactly this width
assert _N_HIST == 16, "q71 oracle's low-nibble shortcut requires 16"


@register(
    "q71_multimodal_features",
    # byte % 16 is exactly the LOW NIBBLE — the second hex digit of
    # the byte's pair (positions 2i in the hex dump); _N_HIST == 16
    # is load-bearing for that shortcut
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(strpos('{_HEXDIGITS}', substr(hx, 2 * i, 1)) - 1 AS INT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_bytes_in_bucket
    FROM b, unnest(generate_series(1, nb)) t(i)
    GROUP BY 1, 2
    """,
)
def q71_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction stage — the fixed-dim-vector-per-payload
    shape (image → embedding): a 16-bucket byte histogram per payload
    computed in one ``mapInPandas`` pass (numpy bincount per row),
    emitted as (doc_id, bucket, count) rows so the oracle can check
    it flat. A real deployment swaps the histogram kernel for a model
    forward pass; the Arrow plumbing, batch shape, and output
    contract are identical.

    Scale notes: histogram work is a single vectorized pass per
    Arrow batch; output is ≤16 rows per payload, no shuffle.

    NULL-payload policy (degenerate audit, round 8): a NULL payload
    has no byte histogram — zero rows emitted, matching the oracle
    (unnesting a NULL split already yields nothing there); no-op on
    the shipped corpora."""
    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, buckets, counts = [], [], []
            for did, payload in zip(b["doc_id"], b["payload"]):
                if payload is None:  # NULL payload -> no histogram rows
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8) % _N_HIST
                hist = np.bincount(arr, minlength=_N_HIST)
                nz = np.nonzero(hist)[0]
                ids.extend([did] * len(nz))
                buckets.extend(nz.tolist())
                counts.extend(hist[nz].tolist())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "bucket": pd.Series(buckets, dtype="int32"),
                "n_bytes_in_bucket": pd.Series(counts, dtype="int64"),
            })

    return d.mapInPandas(
        extract, "doc_id long, bucket int, n_bytes_in_bucket long")


@register(
    "q72_multimodal_resize",
    # GREATEST(…, 1) mirrors the kernel's max(stride, 1): an empty
    # payload samples to 0 bytes, not NaN
    oracle="""
    WITH b AS (
        SELECT doc_id, text, octet_length(encode(text)) AS nb
        FROM documents
    )
    SELECT doc_id,
           CAST(32 + doc_id % 608 AS INT) AS orig_w,
           CAST(32 + doc_id % 448 AS INT) AS orig_h,
           64 AS target_w, 64 AS target_h,
           ROUND(64.0 / (32 + doc_id % 608), 4) AS scale_x,
           ROUND(64.0 / (32 + doc_id % 448), 4) AS scale_y,
           CAST(CASE WHEN text IS NULL THEN NULL
                     ELSE CEIL(CAST(nb AS DOUBLE)
                          / GREATEST(CEIL(CAST(nb AS DOUBLE) / 4096),
                                     1)) END
                AS BIGINT) AS n_sampled_bytes
    FROM b
    """,
)
def q72_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage — metadata transform + payload downsampling (the
    image-resize analog without codecs): target 64×64 with scale
    factors from the typed metadata, and the payload strided down to
    ≤4096 bytes inside ``mapInPandas`` (``payload[::stride]`` stands
    in for pixel interpolation; n_sampled_bytes is checked against
    the closed-form ceil arithmetic in the oracle).

    NULL-payload policy (degenerate audit, round 8): a NULL payload
    resizes to NULL n_sampled_bytes (metadata columns stay non-null)
    on both engines; no-op on the shipped corpora."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    assembled = d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        (F.lit(32) + F.col("doc_id") % 608).cast("int").alias("orig_w"),
        (F.lit(32) + F.col("doc_id") % 448).cast("int").alias("orig_h"),
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            sampled = [
                None if p is None
                else len(p[::max(-(-len(p) // 4096), 1)])
                for p in b["payload"]
            ]
            yield pd.DataFrame({
                "doc_id": b["doc_id"],
                "orig_w": b["orig_w"], "orig_h": b["orig_h"],
                "target_w": pd.Series([64] * len(b), dtype="int32"),
                "target_h": pd.Series([64] * len(b), dtype="int32"),
                "scale_x": (64.0 / b["orig_w"]).round(4),
                "scale_y": (64.0 / b["orig_h"]).round(4),
                "n_sampled_bytes": pd.array(sampled, dtype="Int64"),
            })

    return assembled.mapInPandas(
        resize,
        "doc_id long, orig_w int, orig_h int, target_w int, target_h int, "
        "scale_x double, scale_y double, n_sampled_bytes long",
    )
