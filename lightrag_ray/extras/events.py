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


def _round_value_sum(batch: pa.Table) -> pa.Table:
    """Round the float value_sum to 4 decimals on the ENGINE side (the
    oracles apply the same round): summation order differs between the
    bucketed numpy reductions and DuckDB's scan order, so raw sums diverge
    by ~1 ULP on a few rows.  Inputs are 2-decimal values, so the true sum
    is ≥ 0.0049 away from any 4-decimal rounding boundary — far beyond ULP
    error — making the rounded values order-independent and bit-equal."""
    import numpy as np

    i = batch.schema.get_field_index("value_sum")
    rounded = np.round(np.asarray(batch.column("value_sum"), np.float64), 4)
    return batch.set_column(i, "value_sum", pa.array(rounded, pa.float64()))


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
    ).map_batches(_round_value_sum, batch_format="pyarrow", zero_copy_batch=True)


SQL_TUMBLING_WINDOW = f"""
SELECT user_id,
       (CAST(floor(epoch(ts)) AS BIGINT) // {WINDOW_S}) * {WINDOW_S}
           AS window_start,
       count(*) AS n_events,
       round(sum(value), 4) AS value_sum
FROM events
GROUP BY 1, 2
"""


def sliding_window_user_stats(
    sf_dir: str, window_s: int = WINDOW_S, slide_s: int = WINDOW_S // 4
):
    """Per (user_id, sliding window): each event lands in ``window_s /
    slide_s`` overlapping windows — explode inside ``map_batches`` (rows ×
    W/S), then ONE groupby.  No per-event state, no watermark: the ordered-
    log pattern, scale-safe because the explode factor is a small constant."""
    from ray.data.aggregate import Count, Sum

    n_windows = window_s // slide_s

    def explode_windows(batch: pa.Table) -> pa.Table:
        import numpy as np

        epoch = (
            pc.divide(pc.cast(batch.column("ts"), pa.int64()), 1_000_000)
            .to_numpy(zero_copy_only=False)
        )
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        values = batch.column("value").to_numpy(zero_copy_only=False)
        # latest window containing t starts at floor(t/slide)*slide; earlier
        # ones step back by slide while start > t - window
        base = (epoch // slide_s) * slide_s
        starts = base[None, :] - (np.arange(n_windows)[:, None] * slide_s)
        valid = starts > (epoch[None, :] - window_s)
        idx = np.nonzero(valid)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(users[None, :], n_windows, 0)[idx],
                                    pa.int64()),
                "window_start": pa.array(starts[idx], pa.int64()),
                "value": pa.array(np.repeat(values[None, :], n_windows, 0)[idx],
                                  pa.float64()),
            }
        )

    ds = _events(sf_dir, ["ts", "user_id", "value"]).map_batches(
        explode_windows, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby(["user_id", "window_start"]).aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="value_sum")
    ).map_batches(_round_value_sum, batch_format="pyarrow", zero_copy_batch=True)


SQL_SLIDING_WINDOW = f"""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, value FROM events
),
w AS (
  SELECT user_id, t, value,
         (t // {WINDOW_S // 4}) * {WINDOW_S // 4} - k * {WINDOW_S // 4}
             AS window_start
  FROM e, (SELECT unnest(range({WINDOW_S // (WINDOW_S // 4)})) AS k)
  WHERE (t // {WINDOW_S // 4}) * {WINDOW_S // 4} - k * {WINDOW_S // 4}
        > t - {WINDOW_S}
)
SELECT user_id, window_start, count(*) AS n_events, round(sum(value), 4) AS value_sum
FROM w GROUP BY 1, 2
"""

SESSION_GAP_S = 1800


def session_windows(sf_dir: str, gap_s: int = SESSION_GAP_S, buckets: int = 64):
    """Per-user session windows (gap-based): events more than ``gap_s``
    apart start a new session.

    Scale shape (round-2 VERDICT #5): users are hashed into ``buckets``
    coarse groups so the shuffle produces O(buckets) map_groups calls, not
    one per user (millions of tiny pandas groups at web scale).  Inside a
    bucket the whole reduction is vectorized: one (user, t) sort, boundary
    flags where the user changes or the gap exceeds ``gap_s``, then
    ``np.add.reduceat`` / boundary indexing for the per-session aggregates —
    no per-session Python loop.  Session state never crosses a user, and a
    user never crosses a bucket, so the bucket key is the only coordination.
    """
    import numpy as np
    import pandas as pd

    def sessions(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["user_id", "t"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["t"].to_numpy(np.int64)
        v = g["value"].to_numpy(np.float64)
        n = len(u)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_s)
        starts = np.flatnonzero(new)
        nexts = np.r_[starts[1:], n]
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_start": pa.array(t[starts], pa.int64()),
                "session_end": pa.array(t[nexts - 1], pa.int64()),
                "n_events": pa.array(nexts - starts, pa.int64()),
                "value_sum": pa.array(
                    np.round(np.add.reduceat(v, starts), 4), pa.float64()
                ),
            }
        )

    def add_epoch_bucket(batch: pa.Table) -> pa.Table:
        from lightrag_ray.extras.dedup import _cc_bucket_of

        epoch = pc.divide(pc.cast(batch.column("ts"), pa.int64()), 1_000_000)
        batch = batch.append_column("t", pc.cast(epoch, pa.int64()))
        return batch.append_column(
            "ub", _cc_bucket_of(batch.column("user_id").cast(pa.int64()), buckets)
        )

    ds = _events(sf_dir, ["ts", "user_id", "value"]).map_batches(
        add_epoch_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby("ub").map_groups(sessions, batch_format="pandas")


SQL_SESSION_WINDOWS = f"""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, value FROM events
),
flagged AS (
  SELECT user_id, t, value,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                   > {SESSION_GAP_S} OR
                   lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
),
numbered AS (
  SELECT user_id, t, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, min(t) AS session_start, max(t) AS session_end,
       count(*) AS n_events, round(sum(value), 4) AS value_sum
FROM numbered GROUP BY user_id, session_no
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


def asof_join(
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "click",
    buckets: int = 64,
):
    """Temporal as-of join: each ``left_type`` event is joined to the most
    recent ``right_type`` event by the same user at-or-before its timestamp
    (ties broken by highest event_id — a total order, so the result is
    deterministic; left rows with no prior right event are dropped).

    Ray Data has no native as-of join; the scale shape is ONE hash shuffle
    on coarse user buckets (O(buckets) map_groups calls, not one tiny
    pandas group per user — same rationale as ``session_windows``) + an
    in-bucket sort and a per-user vectorized ``searchsorted`` sweep: rhs is
    sorted by (t, event_id), so ``searchsorted(right)-1`` lands on the last
    right event at-or-before each left timestamp with the highest event_id
    on ties.  Python work is O(users-in-bucket) slicing, never per event.
    The SQL oracle's inequality join is O(n²) per user and exists only as
    the correctness statement.  Timestamps flow as epoch-µs int64."""
    import numpy as np
    import pandas as pd

    def sweep(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["user_id", "t_us", "event_id"], kind="mergesort")
        is_l = (g["event_type"] == left_type).to_numpy()
        is_r = (g["event_type"] == right_type).to_numpy()
        u = g["user_id"].to_numpy(np.int64)
        t = g["t_us"].to_numpy(np.int64)
        ev = g["event_id"].to_numpy(np.int64)
        val = g["value"].to_numpy(np.float64)
        ok = g["v_ok"].to_numpy(bool)

        out = {k: [] for k in ("event_id", "user_id", "t_us",
                               "right_event_id", "right_t_us", "right_value")}
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) if n else []
        bounds = list(starts) + [n]
        for gi in range(len(bounds) - 1):
            lo, hi = bounds[gi], bounds[gi + 1]
            l_m = is_l[lo:hi]
            r_m = is_r[lo:hi]
            if not l_m.any() or not r_m.any():
                continue
            l_t, l_ev = t[lo:hi][l_m], ev[lo:hi][l_m]
            r_t, r_ev = t[lo:hi][r_m], ev[lo:hi][r_m]
            r_val, r_ok = val[lo:hi][r_m], ok[lo:hi][r_m]
            idx = np.searchsorted(r_t, l_t, side="right") - 1
            hit = idx >= 0
            if not hit.any():
                continue
            k = idx[hit]
            out["event_id"].extend(l_ev[hit].tolist())
            out["user_id"].extend([int(u[lo])] * int(hit.sum()))
            out["t_us"].extend(l_t[hit].tolist())
            out["right_event_id"].extend(r_ev[k].tolist())
            out["right_t_us"].extend(r_t[k].tolist())
            out["right_value"].extend(
                float(v) if o else None for v, o in zip(r_val[k], r_ok[k])
            )
        return pa.table(
            {
                "event_id": pa.array(out["event_id"], pa.int64()),
                "user_id": pa.array(out["user_id"], pa.int64()),
                "t_us": pa.array(out["t_us"], pa.int64()),
                "right_event_id": pa.array(out["right_event_id"], pa.int64()),
                "right_t_us": pa.array(out["right_t_us"], pa.int64()),
                "right_value": pa.array(out["right_value"], pa.float64()),
            }
        )

    def prep(batch: pa.Table) -> pa.Table:
        # Null-ts rows are dropped on BOTH sides, matching the oracle where
        # `r.t_us <= l.t_us` is never true for NULL; a NULL right-side value
        # flows through as NULL (the oracle emits NULL, not NaN), tracked
        # via a validity column that survives the pandas group conversion.
        keep = pc.and_(
            pc.is_in(
                batch.column("event_type"),
                value_set=pa.array([left_type, right_type]),
            ),
            pc.is_valid(batch.column("ts")),
        )
        batch = batch.filter(keep)
        t_us = pc.cast(batch.column("ts"), pa.int64())
        v_ok = pc.is_valid(batch.column("value"))
        from lightrag_ray.extras.dedup import _cc_bucket_of

        return (
            batch.drop_columns(["ts"])
            .append_column("t_us", t_us)
            .append_column("v_ok", v_ok)
            .append_column(
                "ub",
                _cc_bucket_of(batch.column("user_id").cast(pa.int64()), buckets),
            )
        )

    ds = _events(
        sf_dir, ["event_id", "ts", "user_id", "event_type", "value"]
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("ub").map_groups(sweep, batch_format="pandas")


SQL_ASOF_JOIN = """
WITH l AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events
  WHERE event_type = 'purchase'
),
r AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us, value FROM events
  WHERE event_type = 'click'
),
j AS (
  SELECT l.event_id, l.user_id, l.t_us,
         r.event_id AS right_event_id, r.t_us AS right_t_us,
         r.value AS right_value,
         row_number() OVER (
           PARTITION BY l.event_id
           ORDER BY r.t_us DESC, r.event_id DESC
         ) AS rk
  FROM l JOIN r ON l.user_id = r.user_id AND r.t_us <= l.t_us
)
SELECT event_id, user_id, t_us, right_event_id, right_t_us, right_value
FROM j WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# Range (interval) join

_RJ_CAMPAIGNS = 32
_RJ_SPAN_DIV = 64  # campaign c starts at t0 + c·span/64 …
_RJ_LEN_DIV = 16  # … and lasts span/16 — consecutive campaigns OVERLAP


def range_join_campaigns(sf_dir: str):
    """Range (interval) join: count events falling inside each of 32
    OVERLAPPING campaign windows — the inequality-predicate join Ray Data
    has no native operator for.  The campaign table is synthesized
    deterministically from the event time domain (``t0 + c·span//64`` for
    ``span//16`` µs, so every event can match up to four campaigns — a
    genuine one-to-many range join, stated identically in the SQL oracle's
    ``BETWEEN`` join).

    Scale shape: the interval side is SMALL (32 rows), so this is the
    broadcast arm of a range join — bounds ship in the combiner's closure,
    each batch emits per-campaign partial counts (≤32 rows), and one tiny
    groupby finishes.  A large interval side would instead bucket BOTH
    sides by coarse time range and sweep per bucket — the ``asof_join``
    pattern above; the broadcast arm is the right tool whenever the
    interval table fits a closure, which for campaign/session/maintenance
    windows it does."""
    import numpy as np
    from ray.data.aggregate import Sum

    from ray.data.aggregate import Max, Min

    ds = _events(sf_dir, ["ts", "event_type"])
    bounds = ds.aggregate(Min("ts"), Max("ts"))  # ONE pass for both bounds
    t0 = int(pc.cast(pa.scalar(bounds["min(ts)"]), pa.int64()).as_py())
    t1 = int(pc.cast(pa.scalar(bounds["max(ts)"]), pa.int64()).as_py())
    span = t1 - t0
    starts = np.array(
        [t0 + c * span // _RJ_SPAN_DIV for c in range(_RJ_CAMPAIGNS)], np.int64
    )
    ends = starts + span // _RJ_LEN_DIV

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch.column("ts"), pa.int64()), np.int64)
        is_p = np.asarray(
            pc.equal(batch.column("event_type"), "purchase"), bool
        )
        cid, n_ev, n_pur = [], [], []
        for c in range(_RJ_CAMPAIGNS):
            m = (ts >= starts[c]) & (ts <= ends[c])
            k = int(m.sum())
            if k:
                cid.append(c)
                n_ev.append(k)
                n_pur.append(int(is_p[m].sum()))
        return pa.table(
            {
                "campaign_id": pa.array(cid, pa.int64()),
                "n_events": pa.array(n_ev, pa.int64()),
                "n_purchases": pa.array(n_pur, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("campaign_id")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_purchases", alias_name="n_purchases"),
        )
    )


SQL_RANGE_JOIN = f"""
WITH b AS (
  SELECT epoch_us(min(ts))::BIGINT AS t0,
         epoch_us(max(ts))::BIGINT - epoch_us(min(ts))::BIGINT AS span
  FROM events
),
c AS (
  SELECT g.g::BIGINT AS campaign_id,
         (SELECT t0 FROM b) + g.g * (SELECT span FROM b) // {_RJ_SPAN_DIV} AS s,
         (SELECT t0 FROM b) + g.g * (SELECT span FROM b) // {_RJ_SPAN_DIV}
           + (SELECT span FROM b) // {_RJ_LEN_DIV} AS e
  FROM generate_series(0, {_RJ_CAMPAIGNS - 1}) g(g)
)
SELECT c.campaign_id,
       count(*)::BIGINT AS n_events,
       sum(CASE WHEN ev.event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
           AS n_purchases
FROM c JOIN events ev
  ON epoch_us(ev.ts) BETWEEN c.s AND c.e
GROUP BY c.campaign_id
"""


# ---------------------------------------------------------------------------
# Semi-structured JSON property extraction


def event_props_stats(sf_dir: str):
    """Semi-structured extraction: parse the ``props`` JSON column, pull
    the ``k`` field, aggregate (count, sum, max) per event type — the
    ubiquitous log-pipeline step of lifting a JSON payload into columns.
    Per-batch parse + combiner (one output row per event type per batch);
    the groupby merges |types|×blocks partials, the JSON text itself never
    shuffles.  Malformed / missing / non-integer payloads (including JSON
    string-encoded numbers like ``{"k": "3"}``) count in ``n_bad`` instead
    of aborting the pipeline — the oracle states the same rule via typed
    ``json_type`` extraction, so both engines reject the identical set."""
    import json

    import numpy as np
    from ray.data.aggregate import Max, Sum

    ds = _events(sf_dir, ["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        props = batch.column("props").to_pylist()
        agg: dict = {}
        for t, p in zip(types, props):
            row = agg.setdefault(t, [0, 0, None, 0])  # n, sum, max, bad
            try:
                k = json.loads(p)["k"]
                if not isinstance(k, int) or isinstance(k, bool):
                    raise ValueError
            except (TypeError, ValueError, KeyError, json.JSONDecodeError):
                row[3] += 1
                continue
            row[0] += 1
            row[1] += k
            row[2] = k if row[2] is None else max(row[2], k)
        keys = sorted(agg)
        return pa.table(
            {
                "event_type": pa.array(keys, pa.string()),
                "n_events": pa.array([agg[t][0] for t in keys], pa.int64()),
                "sum_k": pa.array([agg[t][1] for t in keys], pa.int64()),
                "max_k": pa.array([agg[t][2] for t in keys], pa.int64()),
                "n_bad": pa.array([agg[t][3] for t in keys], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
            Sum("n_bad", alias_name="n_bad"),
        )
    )


SQL_EVENT_PROPS_STATS = """
WITH p AS (
  -- typed extraction: only JSON *integers* count (json_type BIGINT/UBIGINT);
  -- quoted numbers ('"3"' -> VARCHAR), floats, bools and nulls all land in
  -- n_bad -- the exact failure set of the Ray kernel's isinstance(k, int)
  SELECT event_type,
         CASE WHEN json_type(props::JSON, '$.k') IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type,
       count(k)::BIGINT AS n_events,
       coalesce(sum(k), 0)::BIGINT AS sum_k,
       max(k)::BIGINT AS max_k,
       (count(*) - count(k))::BIGINT AS n_bad
FROM p GROUP BY event_type
"""
