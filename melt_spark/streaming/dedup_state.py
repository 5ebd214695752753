"""Custom stateful streaming operator: first-seen dedup.

A training-data ingest stream wants "emit each document once, ever" —
exact-dedup across micro-batches. Spark has no built-in; this is the
applyInPandasWithState shape (SURVEY.md build directive: custom stateful
operators via applyInPandasWithState).

State: per fingerprint group, one flag "seen" (+ the winning doc_id). Within
a batch the winner is min(doc_id) — deterministic under any partition/arrival
order; across batches the state suppresses re-emission. State size is
O(distinct fingerprints) spread across the state store — scales horizontally.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "fingerprint string, doc_id long"
STATE_SCHEMA = "seen boolean, doc_id long"


def _dedup_fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    best = None
    for pdf in pdfs:
        m = int(pdf["doc_id"].min())
        best = m if best is None else min(best, m)
    if state.exists:
        return  # already emitted for this fingerprint — suppress forever
    if best is not None:
        state.update((True, best))
        yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [best]})


def streaming_first_seen(docs_stream: DataFrame,
                         fingerprint_col: str = "fingerprint",
                         id_col: str = "doc_id") -> DataFrame:
    """docs_stream must carry (fingerprint, doc_id). Emits each fingerprint
    exactly once with its first (min-id-in-first-batch) document."""
    renamed = docs_stream.select(
        docs_stream[fingerprint_col].alias("fingerprint"),
        docs_stream[id_col].alias("doc_id"))
    return (renamed.groupBy("fingerprint")
            .applyInPandasWithState(_dedup_fn, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
