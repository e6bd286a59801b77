"""Stream-shaped operators over the ``events`` table.

The reference has no streaming concepts (SURVEY §2.8); these exist for
training-data-pipeline completeness.  Ray Data has no event-time watermarks,
so windows are expressed as batch groupbys over ``(key, window_start)`` —
the ordered-log pattern from the Ray guide.  All are SQL-checkable.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

WINDOW_S = 3600


def _events(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def tumbling_window_user_stats(sf_dir: str, window_s: int = WINDOW_S):
    """Per (user_id, hour window): event count and value sum."""
    from ray.data.aggregate import Count, Sum

    def add_window(batch: pa.Table) -> pa.Table:
        # µs → s by integer division (a straight cast to timestamp[s] raises
        # on sub-second values); epochs are non-negative so // is floor
        epoch_us = pc.cast(batch.column("ts"), pa.int64())
        epoch = pc.divide(epoch_us, 1_000_000)
        win = pc.multiply(pc.divide(epoch, window_s), window_s)
        return batch.append_column("window_start", pc.cast(win, pa.int64()))

    ds = _events(sf_dir, ["ts", "user_id", "value"]).map_batches(
        add_window, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby(["user_id", "window_start"]).aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="value_sum")
    )


SQL_TUMBLING_WINDOW = f"""
SELECT user_id,
       (CAST(floor(epoch(ts)) AS BIGINT) // {WINDOW_S}) * {WINDOW_S}
           AS window_start,
       count(*) AS n_events,
       sum(value) AS value_sum
FROM events
GROUP BY 1, 2
"""


def event_type_rates(sf_dir: str):
    """Event-type frequency table (share of total, rounded)."""
    from ray.data.aggregate import Count

    ds = _events(sf_dir, ["event_type"])
    total = ds.count()
    agg = ds.groupby("event_type").aggregate(Count(alias_name="n"))

    def add_rate(batch: pa.Table) -> pa.Table:
        rate = pc.round(
            pc.divide(pc.cast(batch.column("n"), pa.float64()), float(total)),
            ndigits=6,
        )
        return batch.append_column("rate", rate)

    return agg.map_batches(add_rate, batch_format="pyarrow")


SQL_EVENT_TYPE_RATES = """
SELECT event_type, count(*) AS n,
       round(count(*)::DOUBLE / (SELECT count(*) FROM events), 6) AS rate
FROM events GROUP BY event_type
"""
