"""Custom stateful streaming operator: per-domain running page statistics
via ``applyInPandasWithState`` (Arrow-batched, no per-row Python).

The streaming metrics twin of the batch per-source rollup (A1): for every
``norm_domain`` keep a running (n_pages, first_seen, last_seen) across
micro-batches. State is explicit (GroupState) and timeout-free here —
domain cardinality is the state bound; at 100 TB put a processing-time
timeout on cold domains (the commented knob) so state stays working-set
sized.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = T.StructType(
    [
        T.StructField("norm_domain", T.StringType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("first_seen", T.TimestampType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_pages", T.LongType()),
        T.StructField("first_seen", T.TimestampType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)


def _update(key, pdf_iter, state: GroupState):
    (domain,) = key
    n = 0
    first = last = None
    for pdf in pdf_iter:
        ts = pd.to_datetime(pdf["warc_ts"])
        n += len(pdf)
        lo, hi = ts.min(), ts.max()
        first = lo if first is None or lo < first else first
        last = hi if last is None or hi > last else last
    if state.exists:
        pn, pf, pl = state.get
        n += pn
        first = pf if pf is not None and (first is None or pf < first) else first
        last = pl if pl is not None and (last is None or pl > last) else last
    state.update((n, first, last))
    yield pd.DataFrame(
        {
            "norm_domain": [domain],
            "n_pages": [n],
            "first_seen": [first],
            "last_seen": [last],
        }
    )


def domain_page_stats(pages: DataFrame) -> DataFrame:
    """Running per-domain stats over a stream carrying (norm_domain,
    warc_ts). Emits the updated row for each domain seen in a batch."""
    return pages.select("norm_domain", "warc_ts").groupBy("norm_domain").applyInPandasWithState(
        _update,
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
