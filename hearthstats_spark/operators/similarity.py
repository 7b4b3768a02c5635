"""Similarity-search operators as a reusable library (q50/q51/q61
are the declared query forms).

Three tiers, by data size:

- ``brute_force_topk_pairs`` — broadcast reference matrix + numpy
  kernel per Arrow batch; exact; reference side must fit in a
  broadcast (≲ 1M × 64 f64 ≈ 0.5 GB).
- ``blocked_threshold_pairs`` — one shuffle on a blocking key, then
  a block-local O(b²) kernel; exact WITHIN blocks (IVF trade).
- q61's bucketed probe — same blocked shape with a quantizer as the
  key; see queries/ann.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def brute_force_topk_pairs(df: DataFrame, id_col: str, vec_col: str,
                           k: int = 100) -> DataFrame:
    """Global top-k most-cosine-similar pairs (id_a < id_b), exact.
    Tie-safe local pruning: a batch keeps every pair at-or-above its
    own k-th value, so the global (sim desc, id_a, id_b) order sees
    all contenders. Returns (id_a, id_b, sim) with sim rounded 4dp."""
    import numpy as np
    import pandas as pd

    base = df.select(F.col(id_col).alias("vec_id"),
                     F.col(vec_col).alias("embedding"))
    pdf = base.toPandas()
    ref_ids = pdf["vec_id"].to_numpy()
    ref = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ref_n = np.sqrt((ref * ref).sum(axis=1))
    bc = df.sparkSession.sparkContext.broadcast((ref_ids, ref, ref_n))

    def topk(batches):
        ids_r, mat_r, nrm_r = bc.value
        for b in batches:
            q_ids = b["vec_id"].to_numpy()
            q = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            q_n = np.sqrt((q * q).sum(axis=1))
            sims = np.round((q @ mat_r.T) / np.outer(q_n, nrm_r), 4)
            sims[q_ids[:, None] >= ids_r[None, :]] = -np.inf
            flat = sims.ravel()
            if flat.size > k:
                vk = np.partition(flat, flat.size - k)[flat.size - k]
                idx = np.nonzero(np.isfinite(flat) & (flat >= vk))[0]
            else:
                idx = np.nonzero(np.isfinite(flat))[0]
            ai, bi = np.unravel_index(idx, sims.shape)
            yield pd.DataFrame({
                "vec_id_a": q_ids[ai], "vec_id_b": ids_r[bi],
                "sim": flat[idx],
            })

    cand = base.mapInPandas(topk, "vec_id_a long, vec_id_b long, sim double")
    return (cand.orderBy(F.col("sim").desc(), "vec_id_a", "vec_id_b")
            .limit(k)
            .withColumnRenamed("vec_id_a", f"{id_col}_a")
            .withColumnRenamed("vec_id_b", f"{id_col}_b"))


def blocked_threshold_pairs(df: DataFrame, id_col: str, vec_col: str,
                            block_col: str,
                            min_sim: float = 0.3) -> DataFrame:
    """All pairs with cosine ≥ min_sim sharing a blocking key.
    Returns (block, id_a, id_b, sim)."""
    import numpy as np
    import pandas as pd

    base = df.select(F.col(block_col).alias("block"),
                     F.col(id_col).alias("vec_id"),
                     F.col(vec_col).alias("embedding"))

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        mat = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        sims = (mat @ mat.T) / np.outer(nrm, nrm)
        ai, bi = np.nonzero(np.triu(sims >= min_sim, k=1))
        blk = pdf["block"].iloc[:1]
        return pd.DataFrame({
            "block": blk.repeat(len(ai)).to_numpy()
            if len(ai) else np.array([], dtype=blk.dtype),
            "id_a": ids[ai], "id_b": ids[bi],
            "sim": np.round(sims[ai, bi], 4),
        })

    out_block_type = dict(base.dtypes)["block"]
    return base.groupBy("block").applyInPandas(
        block_pairs,
        f"block {out_block_type}, id_a long, id_b long, sim double",
    )
