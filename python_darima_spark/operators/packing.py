"""Sequence packing for training-data batching (north-star extension;
no reference twin — the reference has no document pipeline).

Two variants over sharded corpora:

* **Block packing** (`q_pack_sequences`, queries/llm_data.py): bin =
  floor(exclusive-cumsum / capacity) — pure window SQL, one shuffle,
  engine-portable, but a bin can overflow by at most one document.
* **Greedy first-fit packing** (`pack_greedy` here): the exact
  "fill until the next doc would overflow, then open a new bin"
  recursion. Inherently sequential *per shard* (bin state resets depend
  on every prior assignment), so it runs as an Arrow-batched grouped-map
  over shards: each task packs one shard in pandas; shards scale out
  with the corpus. No bin exceeds ``capacity`` unless a single document
  alone does (which then gets its own bin).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    shard_col: str,
    capacity: int,
) -> DataFrame:
    """Exact greedy first-fit packing per shard → (id, shard, bin_id).

    Each shard's documents are packed in ascending ``id_col`` order; the
    running bin closes when the next document would push it past
    ``capacity``. Output bin_ids are dense per shard starting at 0.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(shard_col, LongType()),
            StructField("bin_id", LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        bins, fill, bin_id = [], 0, 0
        for tok in pdf[token_col]:
            if fill > 0 and fill + tok > capacity:
                bin_id += 1
                fill = 0
            fill += tok
            bins.append(bin_id)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                shard_col: pdf[shard_col].to_numpy(),
                "bin_id": bins,
            }
        )

    cols = [
        F.col(id_col).cast("long").alias(id_col),
        F.col(shard_col).cast("long").alias(shard_col),
        F.col(token_col),
    ]
    return df.select(*cols).groupBy(shard_col).applyInPandas(pack, out_schema)
