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


@register(
    "q62_multimodal_decode",
    oracle="""
    SELECT doc_id,
           'image' AS modality,
           CAST(n_chars AS BIGINT) AS n_bytes,
           CAST(unicode(SUBSTRING(text, 1, 1)) AS INT) AS header_byte,
           CAST(32 + doc_id % 608 AS INT) AS width,
           CAST(32 + doc_id % 448 AS INT) AS height
    FROM documents
    """,
)
def q62_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble binary payload + metadata struct, then run the decode
    stage over ``mapInPandas``. Fake decoder: payload length, header
    byte, metadata passthrough — enough to prove schema, partitioning,
    UDF signature, and Arrow batch shape end to end."""
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
                [_decode_real(p) for p in b["payload"]]
            payloads = b["payload"]
            yield pd.DataFrame({
                "doc_id": b["doc_id"],
                "modality": [m["modality"] for m in b["meta"]],
                "n_bytes": payloads.map(len).astype("int64"),
                "header_byte": payloads.map(
                    lambda p: p[0] if len(p) else -1).astype("int32"),
                "width": [m["width"] for m in b["meta"]],
                "height": [m["height"] for m in b["meta"]],
            })

    return assembled.mapInPandas(
        decode,
        "doc_id long, modality string, n_bytes long, header_byte int, "
        "width int, height int",
    )
