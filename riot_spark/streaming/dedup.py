"""Stateful streaming dedup — first-seen document fingerprints.

The batch dedup operators (riot_spark/operators/dedup.py) answer
"which docs duplicate which"; a TRAINING-DATA INGEST stream needs the
online form: emit a document only the first time its fingerprint is
seen, across micro-batches.  This is a custom stateful operator on
Structured Streaming's `applyInPandasWithState`: state is keyed by
fingerprint (one boolean per distinct fingerprint ever seen), each
micro-batch emits the minimum doc_id of any not-yet-seen fingerprint
group and marks it seen.  At 10^12 docs the state store shards by the
fingerprint hash across executors — the same partitioning the batch
dedup's groupBy uses.

The reference has no streaming engine (SURVEY.md §2.8); this extends
its realtime add-cache idea (core/indexer.go:116-176) to the dedup
surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fingerprint", StringType()),
    ]
)
STATE_SCHEMA = StructType([StructField("seen", BooleanType())])


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return  # fingerprint already emitted in an earlier batch
    best = None
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
    if best is None:
        return
    state.update((True,))
    yield pd.DataFrame({"doc_id": [best], "fingerprint": [key[0]]})


def first_seen_stream(doc_stream: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) stream -> stream of first-seen rows.

    One output row per distinct fingerprint, carrying the smallest
    doc_id of the micro-batch in which the fingerprint first appeared.
    """
    return doc_stream.groupBy("fingerprint").applyInPandasWithState(
        _first_seen,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
