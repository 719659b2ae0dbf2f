"""Sequence packing for training-data pipelines: greedily pack documents
into fixed token-budget sequences (the "concat short docs to fill the
context window" step before tokenized-example writing).

Shape: mapInPandas over each partition — zero shuffle; sequence ids embed
the partition id (same scheme as the gzip chunker) so they are unique
without coordination. Packing is greedy first-fit within a partition in
row order: deterministic for a fixed partitioning; co-locate/sort rows
first (e.g. ``repartition(k, key).sortWithinPartitions(key)``) when
cross-run stable packs are required.

A document alone larger than the budget becomes its own (over-budget)
singleton sequence — packing must not drop or split documents; splitting
is the tokenizer's job downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

PACK_SCHEMA = StructType(
    [
        StructField("seq_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", IntegerType()),
        StructField("seq_slot", IntegerType()),  # position of the doc in its sequence
    ]
)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign each doc to a packed sequence: DataFrame[seq_id, doc_id,
    n_tokens, seq_slot] with sum(n_tokens) <= budget per seq_id (except
    over-budget singletons). Greedy first-fit in partition row order."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        seq_local = 0
        cur_tokens = 0
        cur_slot = 0
        started = False

        def seq_id() -> int:
            return ((pid + 1) << 32) | seq_local

        for pdf in batches:
            ids, seqs, toks, slots = [], [], [], []
            for doc_id, n_tok in zip(pdf[id_col], pdf[tokens_col]):
                n_tok = int(n_tok) if n_tok is not None and n_tok == n_tok else 0
                if started and cur_tokens + n_tok > budget:
                    seq_local += 1
                    cur_tokens = 0
                    cur_slot = 0
                started = True
                ids.append(int(doc_id))
                seqs.append(seq_id())
                toks.append(n_tok)
                slots.append(cur_slot)
                cur_tokens += n_tok
                cur_slot += 1
            yield pd.DataFrame(
                {
                    "seq_id": seqs,
                    "doc_id": ids,
                    "n_tokens": toks,
                    "seq_slot": slots,
                }
            )

    return docs.select(id_col, tokens_col).mapInPandas(pack, PACK_SCHEMA)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-sequence fill statistics: doc count, token total, fill ratio."""
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 4).alias("fill"),
    )
