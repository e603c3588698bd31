"""Planted bitext corpus that ENGAGES both C139 guards.

The driver's oracle-checked SFs keep `bitext_margin_mining_lsh`'s two
scale guards (adaptive plane count, 256-member hot-bucket posting cap)
deliberately inert so the static 4-plane oracle stays hash-exact. The
r9 verdict flagged the gap: nothing pinned the miner's RECALL vs the
exact C136 baseline in the regime where the guards actually fire.
This corpus fires both and keeps a crisp ground truth:

- per-side count > 2048 (the occupancy gate), so `_bitext_planes`
  exceeds `_N_PLANES`;
- one TIGHT "hub" cluster (hot_noise tiny) whose members land in the
  same bucket of every table and flood it past `_BITEXT_MAX_POSTING`
  — the truncation regime. Its members are mutual near-duplicates, so
  the ratio margin rejects them on BOTH miners (margin ~1.0 < 1.05):
  the cap truncates exactly the pairs the margin never mines, which
  is the design claim the r9 verdict asked to see tested;
- many LOOSE background clusters around random unit centers
  (bg_noise large): each source's true counterpart (itself plus
  pair_eps noise, cosine ~0.9999) towers over the ~0.7-0.8 in-cluster
  background, so the margin mines it — these pairs are the recall
  denominator, and their buckets stay under the cap.

Deterministic: seeded numpy, no wall-clock anywhere.
"""

from __future__ import annotations

import os

import numpy as np


def plant_engaged_bitext_corpus(
    out_dir: str,
    n_bg_clusters: int = 32,
    per_bg: int = 80,
    bg_noise: float = 0.3,
    hot_members: int = 600,
    hot_noise: float = 0.02,
    dim: int = 16,
    pair_eps: float = 0.01,
    seed: int = 7,
) -> int:
    """Write ``<out_dir>/embeddings.parquet`` (vec_id, embedding,
    label): label 0 is the source side, label 1 its noisy true-pair
    twin (twin of src ``i`` is vec_id ``1_000_000 + i``). Returns the
    per-side count (``n_bg_clusters * per_bg + hot_members``)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_bg_clusters + 1, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    parts = [
        centers[c] + bg_noise * rng.standard_normal((per_bg, dim))
        for c in range(n_bg_clusters)
    ]
    parts.append(
        centers[-1] + hot_noise * rng.standard_normal((hot_members, dim))
    )
    src = np.concatenate(parts)
    n_side = len(src)
    tgt = src + pair_eps * rng.standard_normal((n_side, dim))
    vec_ids = np.concatenate(
        [np.arange(n_side), 1_000_000 + np.arange(n_side)]
    ).astype(np.int64)
    emb = np.concatenate([src, tgt]).astype(np.float32)
    labels = np.concatenate(
        [np.zeros(n_side), np.ones(n_side)]
    ).astype(np.int32)
    table = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in emb], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "embeddings.parquet"))
    return n_side


def mined_pairs(df) -> set[tuple[int, int]]:
    """(src_id, tgt_id) pairs from a miner's result DataFrame."""
    return {(int(r.src_id), int(r.tgt_id)) for r in df.collect()}
