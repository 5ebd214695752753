"""Sequence packing and document chunking — the last mile between a clean
corpus and a training run.

- chunk_docs: overlapping token windows (RAG/embedding chunking) as a pure
  Catalyst projection — sequence → slice → explode, no Python, scan-speed
  at 100 TB.
- pack_sequences: greedy fixed-token-budget bin packing (every pretraining
  run concatenates short documents into budget-length sequences). Packing
  is inherently sequential WITHIN a pack stream, so the scale shape is
  "hash docs into independent groups, pack each group sequentially":
  groups are bounded (a shard's worth of docs), run via applyInPandas —
  one shuffle on the group key, Arrow-batched pandas per group, no global
  coordination. The greedy rule (next doc joins the open pack iff
  fill + n_tokens <= budget, else opens a new pack) is deterministic given
  the (group, doc order), so a DuckDB recursive CTE restates it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_docs(df: DataFrame, size: int = 32, stride: int = 24,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Overlapping token windows: chunk i (1-based) covers tokens
    [(i-1)*stride + 1, ... + size). Docs shorter than `size` yield one
    chunk. Emits (id, chunk_id, n_tokens, chunk_fp)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.floor((n - size + stride - 1) / stride) + 1).cast("int")
    chunk = F.explode(F.sequence(F.lit(1), n_chunks)).alias("chunk_id")
    out = df.select(F.col(id_col), toks.alias("toks"), chunk)
    piece = F.slice(F.col("toks"), (F.col("chunk_id") - 1) * stride + 1, size)
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", piece)).alias("chunk_fp"))


def pack_sequences(df: DataFrame, budget: int = 256, n_groups: int = 16,
                   id_col: str = "doc_id",
                   tokens_col: Column | None = None) -> DataFrame:
    """Greedy sequence packing: within each hash group (id % n_groups),
    walk docs in id order; a doc joins the open pack iff the pack stays
    within `budget` tokens, else it opens the next pack. Emits
    (grp, id, n_tokens, pack_id, pack_pos) — the pack manifest a training
    loader consumes.

    At scale the group key is the training shard (bounded docs per group);
    the only shuffle is the groupBy, and each group packs independently in
    one Arrow batch."""
    n_tok = (tokens_col if tokens_col is not None
             else F.size(F.split(F.col("text"), " "))).cast("long")
    base = df.select((F.col(id_col) % n_groups).alias("grp"),
                     F.col(id_col).alias("doc_id"),
                     n_tok.alias("n_tokens"))

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_id, pack_pos, fill = [], [], 0
        current, pos = 0, 0
        for nt in pdf["n_tokens"]:
            if pos > 0 and fill + nt > budget:
                current += 1
                fill, pos = 0, 0
            fill += int(nt)
            pos += 1
            pack_id.append(current)
            pack_pos.append(pos)
        pdf["pack_id"] = pack_id
        pdf["pack_pos"] = pack_pos
        return pdf[["grp", "doc_id", "n_tokens", "pack_id", "pack_pos"]]

    return (base.groupBy("grp").applyInPandas(
        pack, "grp long, doc_id long, n_tokens long, "
              "pack_id long, pack_pos long"))
