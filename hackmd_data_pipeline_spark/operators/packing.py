"""Token-budget sequence packing (training-data surface).

LLM pre-training consumes fixed-length token sequences; short
documents are PACKED together to avoid padding waste. Globally optimal
bin packing is inherently sequential, so the scalable form is
PER-PARTITION greedy packing: each partition packs its own documents
into sequences independently (embarrassingly parallel, one Arrow pass,
zero shuffle), and sequence ids are made globally unique by prefixing
the partition id. Packing efficiency loss vs global packing is at most
one under-filled sequence per partition — negligible when partitions
hold thousands of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# partition id occupies the high bits of seq_id; 2^40 local sequences
# per partition is unreachable in practice
_PART_SHIFT = 40


def pack_sequences(df: DataFrame, max_tokens: int,
                   id_col: str = "doc_id",
                   token_count_col: str = "n_tokens") -> DataFrame:
    """Greedy first-fit packing in partition order.

    Output: ``id_col | n_tokens | seq_id | overflow`` — ``seq_id``
    groups documents whose token counts sum to <= max_tokens;
    documents LARGER than the budget get a dedicated sequence with
    ``overflow = true`` (the caller decides truncate-vs-drop; packing
    never silently loses data).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")

    def pack(iterator):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = pid << _PART_SHIFT
        seq, used = 0, 0
        for pdf in iterator:
            ids, toks, seqs, over = [], [], [], []
            for doc, n in zip(pdf[id_col], pdf[token_count_col]):
                n = int(n)
                if n > max_tokens:
                    # oversize doc: own sequence, flagged
                    if used > 0:
                        seq += 1
                    ids.append(doc); toks.append(n)
                    seqs.append(base + seq); over.append(True)
                    seq += 1
                    used = 0
                    continue
                if used + n > max_tokens:
                    seq += 1
                    used = 0
                ids.append(doc); toks.append(n)
                seqs.append(base + seq); over.append(False)
                used += n
            yield pd.DataFrame({
                id_col: pd.array(ids, dtype="int64"),
                "n_tokens": pd.array(toks, dtype="int64"),
                "seq_id": pd.array(seqs, dtype="int64"),
                "overflow": pd.array(over, dtype="bool"),
            })

    out_schema = (df.select(id_col).schema
                  .add("n_tokens", "long")
                  .add("seq_id", "long")
                  .add("overflow", "boolean"))
    return df.select(id_col, token_count_col).mapInPandas(pack, out_schema)


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Per-sequence fill statistics: ``seq_id | n_docs | seq_tokens |
    fill_ratio | has_overflow`` — the padding-waste audit."""
    return (
        packed.groupBy("seq_id")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("seq_tokens"),
             F.max(F.col("overflow").cast("int")).cast("boolean")
             .alias("has_overflow"))
        .withColumn("fill_ratio",
                    F.round(F.col("seq_tokens") / F.lit(max_tokens), 4))
    )
