"""Event-time windowing over the `events` log table.

Ray Data is a batch engine with no watermarks (SURVEY.md §2.6: the reference
has no temporal semantics either — its "windows" are spatial/memory
windows).  Stream-shaped workloads are expressed as an ordered, partitioned
log: partition by key, order by ts within the group.

- :func:`tumbling_window` — fixed-width windows via integer bucket math +
  the partial-aggregation combiner (one shuffle row per (key, window, batch)).
- :func:`session_windows` — gap-based sessionization per key inside
  ``groupby(key).map_groups`` over the ts-sorted group.

Window ids are integer microsecond buckets so the DuckDB oracle reproduces
them exactly (``epoch_us(ts) // width``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

US = 1_000_000


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
        zero_copy_only=False)


def tumbling_window(ds: ray.data.Dataset, *, ts_col: str = "ts",
                    key_col: str = "user_id", value_col: str = "value",
                    width_s: int = 3600) -> ray.data.Dataset:
    """Per (key, window) count + sum over fixed windows of ``width_s``
    seconds.  ``window_id = epoch_us // (width_s * 1e6)`` (int64)."""
    width_us = width_s * US

    def partial(b: pa.Table) -> pa.Table:
        ts = _ts_us(b[ts_col])
        win = ts // width_us
        key = b[key_col].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame({"k": key, "w": win, "v": v})
        g = df.groupby(["k", "w"], sort=False).agg(
            n_=("v", "size"), sum_=("v", "sum")).reset_index()
        return pa.table({
            key_col: pa.array(g["k"].to_numpy()),
            "window_id": pa.array(g["w"].to_numpy(), pa.int64()),
            "n_": pa.array(g["n_"].to_numpy(), pa.int64()),
            "sum_": pa.array(g["sum_"].to_numpy(), pa.float64()),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby([key_col, "window_id"], sort=False).agg(
            n=("n_", "sum"), value_sum=("sum_", "sum")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    from .shuffle import sorted_block_reduce
    return sorted_block_reduce(
        ds.select_columns([ts_col, key_col, value_col]).map_batches(
            partial, batch_size=None, batch_format="pyarrow"),
        [key_col, "window_id"], combine)


def sliding_window(ds: ray.data.Dataset, *, ts_col: str = "ts",
                   key_col: str = "user_id", value_col: str = "value",
                   width_s: int = 3600, hop_s: int = 900
                   ) -> ray.data.Dataset:
    """Per (key, window) count + sum over SLIDING (hopping) windows: window
    ``w`` covers ``[w*hop, w*hop + width)``, so each event lands in
    ~width/hop windows.  Explode-to-window + the same partial-aggregation
    combiner as tumbling (one shuffle row per (key, window, batch)).

    Window range per event (integer µs math, identical in the DuckDB
    oracle): ``lo = max(0, (ts - width + K*hop) // hop + 1 - K)`` with
    ``K = width // hop + 1`` — the K*hop shift keeps the dividend positive
    because DuckDB's ``//`` truncates toward zero on negatives while numpy
    floors; on positive operands they agree.  ``hi = ts // hop``."""
    width_us = width_s * US
    hop_us = hop_s * US
    K = width_us // hop_us + 1

    def partial(b: pa.Table) -> pa.Table:
        ts = _ts_us(b[ts_col])
        key = b[key_col].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = np.maximum(0, (ts - width_us + K * hop_us) // hop_us + 1 - K)
        hi = ts // hop_us
        counts = (hi - lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ts)), counts)
        starts = np.cumsum(counts) - counts
        win = (np.arange(len(idx)) - starts[idx]) + lo[idx]
        df = pd.DataFrame({"k": key[idx], "w": win, "v": v[idx]})
        g = df.groupby(["k", "w"], sort=False).agg(
            n_=("v", "size"), sum_=("v", "sum")).reset_index()
        return pa.table({
            key_col: pa.array(g["k"].to_numpy()),
            "window_id": pa.array(g["w"].to_numpy(), pa.int64()),
            "n_": pa.array(g["n_"].to_numpy(), pa.int64()),
            "sum_": pa.array(g["sum_"].to_numpy(), pa.float64()),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby([key_col, "window_id"], sort=False).agg(
            n=("n_", "sum"), value_sum=("sum_", "sum")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    from .shuffle import sorted_block_reduce
    return sorted_block_reduce(
        ds.select_columns([ts_col, key_col, value_col]).map_batches(
            partial, batch_size=None, batch_format="pyarrow"),
        [key_col, "window_id"], combine)


def sliding_window_sql(width_s: int, hop_s: int, table: str = "events",
                       ts_col: str = "ts", key_col: str = "user_id",
                       value_col: str = "value") -> str:
    """DuckDB twin of :func:`sliding_window` (same shifted integer math)."""
    width_us = width_s * US
    hop_us = hop_s * US
    K = width_us // hop_us + 1
    return f"""
WITH ev AS (
  SELECT {key_col}, epoch_us({ts_col}) AS ts_us, {value_col} FROM {table}
), exploded AS (
  SELECT {key_col}, {value_col}, unnest(range(
    greatest(0, (ts_us - {width_us} + {K * hop_us}) // {hop_us} + 1 - {K}),
    ts_us // {hop_us} + 1)) AS window_id
  FROM ev
)
SELECT {key_col}, window_id, count(*)::BIGINT AS n,
       sum({value_col}) AS value_sum
FROM exploded GROUP BY 1, 2
""".strip()


def session_windows(ds: ray.data.Dataset, *, ts_col: str = "ts",
                    key_col: str = "user_id",
                    gap_s: int = 1800) -> ray.data.Dataset:
    """Sessionization: events of one key sorted by ts; a gap > ``gap_s``
    seconds starts a new session.  Output one row per session:
    (key, session_id 0-based per key, n_events, start_us, end_us)."""
    gap_us = gap_s * US

    def sessions_block(g: pd.DataFrame) -> pd.DataFrame:
        """Sessionize EVERY key in the block in one vectorized pass (the
        block holds all events of each key it holds — sorted_block_reduce)."""
        g = g.sort_values([key_col, "ts_us"], kind="stable")
        key = g[key_col].to_numpy()
        ts = g["ts_us"].to_numpy()
        new_key = np.concatenate([[True], key[1:] != key[:-1]])
        gap = np.concatenate([[True], (ts[1:] - ts[:-1]) > gap_us])
        new_s = new_key | gap
        # session ordinal within key: cumulative new_s minus the running
        # count at each key start
        sid_global = np.cumsum(new_s) - 1
        key_first_sid = sid_global[new_key]
        sid = sid_global - np.repeat(key_first_sid, np.diff(
            np.append(np.nonzero(new_key)[0], len(key))))
        starts_idx = np.nonzero(new_s)[0]
        counts = np.diff(np.append(starts_idx, len(ts)))
        ends = np.maximum.reduceat(ts, starts_idx)
        return pd.DataFrame({
            key_col: key[starts_idx],
            "session_id": sid[starts_idx].astype(np.int64),
            "n_events": counts.astype(np.int64),
            "start_us": ts[starts_idx].astype(np.int64),
            "end_us": ends.astype(np.int64),
        })

    def add_us(b: pa.Table) -> pa.Table:
        return pa.table({key_col: b[key_col],
                         "ts_us": pa.array(_ts_us(b[ts_col]), pa.int64())})

    from .shuffle import sorted_block_reduce
    return sorted_block_reduce(
        ds.select_columns([ts_col, key_col]).map_batches(
            add_us, batch_format="pyarrow"),
        key_col, sessions_block)


def od_flows(ds: "ray.data.Dataset", res: int, *, ts_col: str = "ts",
             key_col: str = "user_id", id_col: str = "event_id",
             x_col: str = "x", y_col: str = "y") -> "ray.data.Dataset":
    """Origin-destination flow matrix (spatio-temporal lag): for each key's
    events ordered by (ts, id), every consecutive pair contributes one flow
    from the earlier event's grid cell to the later's; output global
    ``(cell_from, cell_to, n_flows)`` counts over the ``res×res`` grid.

    Same distribution shape as sessionize: ONE range-shuffle on the key
    (each block holds all events of its keys), a vectorized per-block lag
    (no per-key Python), then per-batch partial counts into a tiny
    cell-pair groupby.  DuckDB ``lag() OVER (PARTITION BY key ORDER BY
    ts, id)`` reproduces it exactly."""
    import pyarrow as pa

    from .shuffle import sorted_block_reduce

    def prep(b: pa.Table) -> pa.Table:
        i = np.floor(b[x_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        j = np.floor(b[y_col].to_numpy(zero_copy_only=False) * res) \
            .astype(np.int64)
        np.clip(i, 0, res - 1, out=i)
        np.clip(j, 0, res - 1, out=j)
        return pa.table({
            key_col: b[key_col],
            "ts_us": pa.array(_ts_us(b[ts_col]), pa.int64()),
            id_col: b[id_col],
            "cell": pa.array(i * res + j, pa.int64())})

    def flows_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "ts_us", id_col], kind="stable")
        key = g[key_col].to_numpy()
        cell = g["cell"].to_numpy()
        same = key[1:] == key[:-1]
        cf, ct = cell[:-1][same], cell[1:][same]
        pair = cf * np.int64(res * res) + ct
        ks, cnt = np.unique(pair, return_counts=True)
        return pd.DataFrame({
            "pair__": ks,
            "cell_from": (ks // (res * res)).astype(np.int64),
            "cell_to": (ks % (res * res)).astype(np.int64),
            "n_": cnt.astype(np.int64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cell_from", "cell_to"], sort=False)["n_"].sum() \
            .reset_index(name="n_flows")
        out["n_flows"] = out["n_flows"].astype(np.int64)
        return out

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    partials = sorted_block_reduce(prepped, key_col, flows_block)
    return sorted_block_reduce(partials, "pair__", combine)


def funnel_counts(ds: "ray.data.Dataset", stages: list[str], *,
                  ts_col: str = "ts", key_col: str = "user_id",
                  type_col: str = "event_type") -> "ray.data.Dataset":
    """Ordered funnel analysis: how many keys reach each stage, where a
    stage counts only if an event of its type occurs STRICTLY AFTER the
    key's qualifying time for the previous stage (min-ts chaining — the
    standard product-analytics funnel).

    One range-shuffle on the key (each block holds every event of its
    keys), then a fully vectorized within-block chain of groupby-min +
    merge steps — no per-key Python.  Per-block partial stage counts sum
    exactly because keys never span blocks."""
    import pyarrow as pa

    from .shuffle import sorted_block_reduce

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            key_col: b[key_col],
            "ts_us": pa.array(_ts_us(b[ts_col]), pa.int64()),
            type_col: b[type_col]})

    def funnel_block(g: pd.DataFrame) -> pd.DataFrame:
        cur = g[g[type_col] == stages[0]].groupby(key_col)["ts_us"] \
            .min().rename("prev_t").reset_index()
        counts = [len(cur)]
        for stage in stages[1:]:
            ev = g[g[type_col] == stage][[key_col, "ts_us"]] \
                .merge(cur, on=key_col)
            ev = ev[ev["ts_us"] > ev["prev_t"]]
            cur = ev.groupby(key_col)["ts_us"].min().rename("prev_t") \
                .reset_index()
            counts.append(len(cur))
        return pd.DataFrame({
            "stage": np.arange(1, len(stages) + 1, dtype=np.int64),
            type_col: stages,
            "n_": np.array(counts, dtype=np.int64)})

    partials = sorted_block_reduce(
        ds.select_columns([key_col, ts_col, type_col]).map_batches(
            prep, batch_format="pyarrow"),
        key_col, funnel_block)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["stage", type_col], sort=False)["n_"].sum() \
            .reset_index(name="n_users")
        out["stage"] = out["stage"].astype(np.int64)
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return sorted_block_reduce(partials, "stage", combine)


def traj_length(ds: "ray.data.Dataset", *, ts_col: str = "ts",
                key_col: str = "user_id", id_col: str = "event_id",
                x_col: str = "x", y_col: str = "y",
                quant: int = 1 << 20) -> "ray.data.Dataset":
    """Per-key trajectory length: total Euclidean distance travelled over
    the key's events ordered by (ts, id).  Step distances are f64 sqrt
    (correctly rounded, bit-identical to SQL) then QUANTIZED to integers
    (``floor(step * quant)``) before summation, so the per-key total is
    order-independent — a raw float sum would depend on reduction order.
    Output: (key, n_steps, dist_q, dist), dist = dist_q / quant (one
    division).  Same single-range-shuffle shape as od_flows: each block
    holds all events of its keys; the lag + sqrt + segment-sum is one
    vectorized pass (no per-key Python).  DuckDB ``lag() OVER`` + the same
    quantization reproduces it bit-for-bit."""
    import pyarrow as pa

    from .shuffle import sorted_block_reduce

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            key_col: b[key_col],
            "ts_us": pa.array(_ts_us(b[ts_col]), pa.int64()),
            id_col: b[id_col],
            x_col: b[x_col], y_col: b[y_col]})

    def block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "ts_us", id_col], kind="stable")
        key = g[key_col].to_numpy()
        x = g[x_col].to_numpy()
        y = g[y_col].to_numpy()
        same = key[1:] == key[:-1]
        dx = x[1:] - x[:-1]
        dy = y[1:] - y[:-1]
        step = np.sqrt(dx * dx + dy * dy)
        q = np.floor(step * float(quant)).astype(np.int64)
        df = pd.DataFrame({key_col: key[1:][same], "q": q[same]})
        out = df.groupby(key_col, sort=False)["q"] \
            .agg(n_steps="size", dist_q="sum").reset_index()
        out["n_steps"] = out["n_steps"].astype(np.int64)
        out["dist_q"] = out["dist_q"].astype(np.int64)
        out["dist"] = out["dist_q"].to_numpy().astype(np.float64) \
            / float(quant)
        return out

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return sorted_block_reduce(prepped, key_col, block)


def traj_length_sql(coord_cte: str, *, key_col: str = "user_id",
                    id_col: str = "event_id", quant: int = 1 << 20) -> str:
    q = float(quant)
    return coord_cte + f"""
, lagged AS (
  SELECT {key_col}, x, y,
         lag(x) OVER (PARTITION BY {key_col} ORDER BY ts, {id_col}) AS px,
         lag(y) OVER (PARTITION BY {key_col} ORDER BY ts, {id_col}) AS py
  FROM ev)
, steps AS (
  SELECT {key_col},
         CAST(floor(sqrt((x-px)*(x-px) + (y-py)*(y-py)) * {q}) AS BIGINT)
         AS sq
  FROM lagged WHERE px IS NOT NULL)
SELECT {key_col}, count(*)::BIGINT AS n_steps, sum(sq)::BIGINT AS dist_q,
       CAST(sum(sq) AS DOUBLE) / {q} AS dist
FROM steps GROUP BY {key_col}
"""


def basket_lift(ds: ray.data.Dataset, *, ts_col: str = "ts",
                key_col: str = "user_id", item_col: str = "event_type",
                width_s: int = 3600) -> "pd.DataFrame":
    """Association mining over event baskets: items = distinct ``item_col``
    per (key, tumbling window) basket; for every item pair a < b reports
    support counts and LIFT = P(ab) / (P(a)·P(b)) = (n_ab·n) / (n_a·n_b).
    Kept as an exact integer ratio with ONE float division, so the SQL
    self-join twin is bit-equal (no logs — PMI's ln() is not
    reproducible across libms, the ratio is).

    Distribution: per-batch DISTINCT (key, window, item) partials (the
    alphabet is small, so partials collapse hard), one shuffle on the
    basket key co-locates each basket, pairs/marginals/basket-count come
    back as tiny count partials summed driver-side — item-pair cardinality
    is |alphabet|², never data-sized."""
    import pandas as pd

    from .shuffle import sorted_block_reduce
    width_us = width_s * US

    def distinct_partial(b: pa.Table) -> pa.Table:
        ts = _ts_us(b[ts_col])
        df = pd.DataFrame({
            "k": b[key_col].to_numpy(zero_copy_only=False),
            "w": ts // width_us,
            "item": b[item_col].to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    def basket_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["k", "w", "item"])
        g = g.sort_values(["k", "w", "item"], kind="stable")
        kk = (g["k"].astype(str) + "\x00" + g["w"].astype(str)).to_numpy()
        items = g["item"].to_numpy()
        starts = np.flatnonzero(np.concatenate(([True], kk[1:] != kk[:-1])))
        ends = np.append(starts[1:], len(kk))
        rows = []
        for st, en in zip(starts, ends):      # per basket: <=|alphabet| items
            its = items[st:en]
            rows.append(("\x01basket", "", 1))
            for x in its:
                rows.append(("\x01item", x, 1))
            for i in range(len(its)):
                for j in range(i + 1, len(its)):
                    rows.append((its[i], its[j], 1))
        return pd.DataFrame(rows, columns=["a", "b", "cnt"]) \
            .groupby(["a", "b"], as_index=False)["cnt"].sum()

    parts = sorted_block_reduce(
        ds.map_batches(distinct_partial, batch_format="pyarrow",
                       batch_size=None),
        ["k", "w"], basket_counts).to_pandas()
    agg = parts.groupby(["a", "b"], as_index=False)["cnt"].sum()
    n = np.int64(agg.loc[agg["a"] == "\x01basket", "cnt"].sum())
    n_item = dict(zip(agg.loc[agg["a"] == "\x01item", "b"],
                      agg.loc[agg["a"] == "\x01item", "cnt"]))
    pairs = agg[~agg["a"].str.startswith("\x01")].copy()
    n_a = pairs["a"].map(n_item).astype(np.int64)
    n_b = pairs["b"].map(n_item).astype(np.int64)
    n_ab = pairs["cnt"].astype(np.int64)
    return pd.DataFrame({
        "item_a": pairs["a"].to_numpy(),
        "item_b": pairs["b"].to_numpy(),
        "n_ab": n_ab.to_numpy(), "n_a": n_a.to_numpy(),
        "n_b": n_b.to_numpy(),
        "n_baskets": np.full(len(pairs), n),
        "lift": (n_ab.to_numpy() * n).astype(np.float64)
        / (n_a.to_numpy() * n_b.to_numpy()).astype(np.float64),
    }).sort_values(["item_a", "item_b"]).reset_index(drop=True)


def gap_fill(ds: ray.data.Dataset, *, ts_col: str = "ts",
             key_col: str = "user_id", value_col: str = "value",
             width_s: int = 3600) -> ray.data.Dataset:
    """Dense per-key time series: tumbling-window counts with EXPLICIT
    zero rows for every empty window between a key's first and last
    event — the gap-fill / densify step ahead of lag features, moving
    averages, and anomaly scoring (sparse window output silently skips
    gaps; models read that as "no row", not "zero activity").

    Composition: tumbling_window partials (shuffle rows ∝ distinct
    (key, window) pairs), then one key-keyed reduce whose vectorized
    ragged range expansion emits each key's full [min, max] window span.
    Per-key output is bounded by the key's active lifetime in windows —
    the documented partitioning assumption (same contract as sessionize:
    one key's rows must fit a reducer block)."""
    from .shuffle import sorted_block_reduce

    win = tumbling_window(ds, ts_col=ts_col, key_col=key_col,
                          value_col=value_col, width_s=width_s) \
        .select_columns([key_col, "window_id", "n"])

    def densify(g: pd.DataFrame) -> pa.Table:
        kk, ww, nn, _ = _dense_series(g, key_col)
        return pa.table({key_col: pa.array(kk),
                         "window_id": pa.array(ww, pa.int64()),
                         "n": pa.array(nn, pa.int64())})

    return sorted_block_reduce(win, key_col, densify)


def _dense_series(g: pd.DataFrame, key_col: str):
    """(key, window_id, n) sparse rows → dense per-key ragged series:
    returns (keys, window_ids, counts, run_starts) with every window in
    each key's [min, max] span present (zeros scattered in), keys
    contiguous, windows ascending.  Fully vectorized."""
    k = g[key_col].to_numpy()
    w = g["window_id"].to_numpy().astype(np.int64)
    n = g["n"].to_numpy().astype(np.int64)
    order = np.lexsort((w, k))
    k, w, n = k[order], w[order], n[order]
    uk, starts, cnt = np.unique(k, return_index=True, return_counts=True)
    lo = w[starts]
    hi = w[starts + cnt - 1]
    span = hi - lo + 1
    total = int(span.sum())
    # ragged ranges: for each key, lo..hi inclusive
    kk = np.repeat(uk, span)
    run_starts = np.cumsum(span) - span
    ww = (np.arange(total) - np.repeat(run_starts, span)
          + np.repeat(lo, span))
    nn = np.zeros(total, np.int64)
    # scatter the observed counts into the dense grid
    pos = np.repeat(run_starts, cnt) + (w - np.repeat(lo, cnt))
    nn[pos] = n
    return kk, ww, nn, run_starts


def rolling_features(ds: ray.data.Dataset, *, ts_col: str = "ts",
                     key_col: str = "user_id", value_col: str = "value",
                     width_s: int = 3600) -> ray.data.Dataset:
    """Per-key lag/rolling features over the gap-filled window series:
    for every dense window, ``lag1`` (previous window's count, 0 at the
    series head) and ``roll3`` (sum of the current + 2 preceding
    windows, ROWS-frame semantics) — the standard feature-engineering
    step before forecasting/anomaly models, where frame-based windows
    are only correct on a DENSIFIED series (on sparse output, "2
    preceding rows" silently skips over gaps).

    One shuffle total: tumbling partials → key-keyed reduce that
    densifies AND computes the shifts in the same vectorized pass
    (shifted views with zeros re-seeded at each key's run start)."""
    from .shuffle import sorted_block_reduce

    win = tumbling_window(ds, ts_col=ts_col, key_col=key_col,
                          value_col=value_col, width_s=width_s) \
        .select_columns([key_col, "window_id", "n"])

    def feats(g: pd.DataFrame) -> pa.Table:
        kk, ww, nn, run_starts = _dense_series(g, key_col)
        lag1 = np.concatenate([np.zeros(1, np.int64), nn[:-1]])
        lag1[run_starts] = 0
        # lag2: zero at each run's first two positions (a single-window
        # run's start+1 is the NEXT run's start, where zero also holds)
        lag2 = np.concatenate([np.zeros(2, np.int64), nn[:-2]])[:len(nn)]
        lag2[run_starts] = 0
        nxt = run_starts + 1
        lag2[nxt[nxt < len(nn)]] = 0
        return pa.table({key_col: pa.array(kk),
                         "window_id": pa.array(ww, pa.int64()),
                         "n": pa.array(nn, pa.int64()),
                         "lag1": pa.array(lag1, pa.int64()),
                         "roll3": pa.array(nn + lag1 + lag2, pa.int64())})

    return sorted_block_reduce(win, key_col, feats)


def transition_counts(ds: ray.data.Dataset, *, ts_col: str = "ts",
                      key_col: str = "user_id",
                      state_col: str = "event_type",
                      id_col: str = "event_id") -> ray.data.Dataset:
    """First-order Markov transition matrix over per-key ordered event
    sequences: count of (state_i → state_{i+1}) across all keys — the
    behavioral-analytics companion of funnel/sessionize (what follows
    what).  Order within a key is (ts, id) — the id tie-break makes the
    result deterministic under equal timestamps.

    One key-keyed shuffle; each reducer block sorts its keys' rows,
    takes consecutive same-key pairs (vectorized shift compare), and
    pre-aggregates to (t_from, t_to, n) partials — ≤ |states|² rows per
    block — before a tiny final reduce."""
    from .shuffle import sorted_block_reduce

    proj = ds.select_columns([key_col, ts_col, state_col, id_col])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="stable")
        k = g[key_col].to_numpy()
        s = g[state_col].to_numpy()
        same = k[1:] == k[:-1]
        df = pd.DataFrame({"t_from": s[:-1][same], "t_to": s[1:][same]})
        out = df.groupby(["t_from", "t_to"], as_index=False).size() \
            .rename(columns={"size": "n_"})
        out["n_"] = out["n_"].astype(np.int64)
        return out

    parts = sorted_block_reduce(proj, key_col, pairs)

    def total(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["t_from", "t_to"], as_index=False)["n_"].sum() \
            .rename(columns={"n_": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    return sorted_block_reduce(parts, ["t_from", "t_to"], total)


def cell_runs(ds: ray.data.Dataset, *, grid_n: int,
              ts_col: str = "ts", user_col: str = "user_id",
              id_col: str = "event_id", x_col: str = "x",
              y_col: str = "y") -> ray.data.Dataset:
    """Trajectory run-length compression (stay-point extraction): each
    user's (ts, id)-ordered event stream collapsed to maximal runs of
    consecutive events in the SAME grid cell — the densify-inverse that
    turns raw pings into visits ``(user_id, run_idx, cell, n_events,
    t_start, t_end)``.

    One user-keyed shuffle; inside each co-located block everything is
    shift-compare + reduceat arithmetic (run boundaries, per-run counts,
    first/last timestamps, per-user run ordinals) — no per-run Python.
    Exact and deterministic (ties ordered by event id); lag()/windowed
    cumulative-sum SQL twin."""
    import pandas as pd

    from .shuffle import sorted_block_reduce
    g = np.int64(grid_n)

    def runs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, ts_col, id_col], kind="stable")
        u = df[user_col].to_numpy()
        x = df[x_col].to_numpy()
        y = df[y_col].to_numpy()
        cell = (np.minimum((x * grid_n).astype(np.int64), g - 1) * g
                + np.minimum((y * grid_n).astype(np.int64), g - 1))
        t = df[ts_col].to_numpy()
        if not len(df):
            return pd.DataFrame({
                "user_id": np.empty(0, np.int64),
                "run_idx": np.empty(0, np.int64),
                "cell": np.empty(0, np.int64),
                "n_events": np.empty(0, np.int64),
                "t_start": np.empty(0, "datetime64[us]"),
                "t_end": np.empty(0, "datetime64[us]")})
        change = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (cell[1:] != cell[:-1])))
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(u))
        run_user = u[starts]
        new_user = np.concatenate(([True], run_user[1:] != run_user[:-1]))
        ufirst = np.flatnonzero(new_user)
        run_idx = (np.arange(len(starts))
                   - np.repeat(ufirst, np.diff(np.append(ufirst,
                                                         len(starts)))))
        return pd.DataFrame({
            "user_id": run_user.astype(np.int64),
            "run_idx": run_idx.astype(np.int64),
            "cell": cell[starts],
            "n_events": (ends - starts).astype(np.int64),
            "t_start": t[starts],
            "t_end": t[ends - 1]})

    return sorted_block_reduce(ds, user_col, runs)


def time_pair_count(ds: ray.data.Dataset, tau_us: int, *,
                    ts_col: str = "ts") -> ray.data.Dataset:
    """#{unordered pairs (i, j): |t_i − t_j| ≤ τ} — the 1-D analogue of the
    spatial radius join, via τ-width bucket halo (every qualifying pair
    spans same or adjacent buckets).  Exactly-once rule: a pair is counted
    in the LATER event's home bucket, so home-home pairs count in their
    shared bucket and cross pairs only where the earlier event is halo.
    Per-bucket counting is two vectorized searchsorted passes over sorted
    times; only (bucket, t, role) triples shuffle — never payloads — and
    bucket parallelism scales with the time span / τ.  Returns one row
    (n_pairs BIGINT)."""
    from .shuffle import sorted_block_reduce

    def explode(b: pa.Table) -> pa.Table:
        t = _ts_us(b[ts_col])
        bkt = t // tau_us
        return pa.table({
            "bkt": pa.array(np.concatenate([bkt, bkt + 1])),
            "t": pa.array(np.concatenate([t, t])),
            "halo": pa.array(np.concatenate([
                np.zeros(len(t), np.int8), np.ones(len(t), np.int8)])),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        total = 0
        bk = g["bkt"].to_numpy()
        tt = g["t"].to_numpy()
        hl = g["halo"].to_numpy()
        order = np.lexsort((tt, bk))
        bk, tt, hl = bk[order], tt[order], hl[order]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        for s, e in zip(starts, np.r_[starts[1:], len(bk)]):
            t_all, h_all = tt[s:e], hl[s:e]
            home = t_all[h_all == 0]
            if not len(home):
                continue
            # home-home: each qualifying pair seen from both sides
            lo = np.searchsorted(home, home - tau_us, "left")
            hi = np.searchsorted(home, home + tau_us, "right")
            total += int((hi - lo - 1).sum()) // 2
            # cross: halo times are all <= home times (previous bucket);
            # count halo partners within tau of each home event
            halo = t_all[h_all == 1]
            if len(halo):
                total += int((len(halo) - np.searchsorted(
                    halo, home - tau_us, "left")).sum())
        return pd.DataFrame({"g": pd.array([0], "int64"),
                             "n_": pd.array([total], "int64")})

    partials = sorted_block_reduce(
        ds.map_batches(explode, batch_format="pyarrow"), "bkt", per_bucket)
    return sorted_block_reduce(
        partials, "g",
        lambda g: pd.DataFrame({
            "n_pairs": pd.array([int(g["n_"].sum())], "int64")}))


def hausdorff_join(pts: ray.data.Dataset, pairs: ray.data.Dataset, *,
                   max_h_sq: int, user_col: str = "user_id"
                   ) -> ray.data.Dataset:
    """Symmetric discrete Hausdorff trajectory join: for each candidate
    user pair, H² = max(max_a min_b d², max_b min_a d²) over the two
    users' µ-quantized point sets, keeping pairs with H² ≤ ``max_h_sq``.
    All arithmetic is int64 (quantized coords), so the result is exact
    and trivially SQL-mirrorable.

    ``pts``: (user_id, xq, yq int64); ``pairs``: (user_a, user_b) with
    user_a < user_b (e.g. tiles.covisit_pairs blocking — candidate
    generation is the caller's recall contract; Hausdorff here is exact
    PER CANDIDATE).  Shape: each side's points replicate once per
    candidate pair through a sorted join (volume Σ_pairs(|A|+|B|), never
    all-users²), then one pair-keyed reduce computes the na×nb distance
    matrix per pair — bounded by two trajectories' lengths."""
    from .join import sorted_join
    from .shuffle import sorted_block_reduce

    i64 = pa.int64()
    pfields = {user_col: i64, "xq": i64, "yq": i64}

    def tag(side: int, own: str, other_col: str):
        def f(b: pa.Table) -> pa.Table:
            u = b[own].to_numpy(zero_copy_only=False).astype(np.int64)
            o = b[other_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            # pk packs (lo, hi) into one int64 — valid only for ids in
            # [0, 2^32); out-of-envelope ids would silently collide
            # (same invariant q_ann_recall's tag asserts)
            for v in (u, o):
                if len(v) and (int(v.min()) < 0
                               or int(v.max()) >= (1 << 32)):
                    raise ValueError(
                        "hausdorff_join user ids must be in [0, 2^32) "
                        "for pair-key packing")
            lo = np.minimum(u, o)
            hi = np.maximum(u, o)
            return pa.table({
                "pk": pa.array(lo * (np.int64(1) << 32) + hi),
                "side": pa.array(np.full(len(u), side, np.int8)),
                "xq": b["xq"], "yq": b["yq"]})
        return f

    a = sorted_join(pts, pairs.select_columns(["user_a", "user_b"]),
                    left_on=user_col, right_on="user_a", how="inner",
                    left_fields=pfields,
                    right_fields={"user_a": i64, "user_b": i64}) \
        .map_batches(tag(0, user_col, "user_b"), batch_format="pyarrow")
    b_ = sorted_join(pts, pairs.select_columns(["user_a", "user_b"]),
                     left_on=user_col, right_on="user_b", how="inner",
                     left_fields=pfields,
                     right_fields={"user_a": i64, "user_b": i64}) \
        .map_batches(tag(1, user_col, "user_a"), batch_format="pyarrow")

    def per_pair(g: "pd.DataFrame") -> "pd.DataFrame":
        pk = g["pk"].to_numpy()
        sd = g["side"].to_numpy()
        xq = g["xq"].to_numpy()
        yq = g["yq"].to_numpy()
        order = np.argsort(pk, kind="stable")
        pk, sd, xq, yq = pk[order], sd[order], xq[order], yq[order]
        starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        out_pk, out_h = [], []
        for s, e in zip(starts, np.r_[starts[1:], len(pk)]):
            m = sd[s:e] == 0
            ax, ay = xq[s:e][m], yq[s:e][m]
            bx, by = xq[s:e][~m], yq[s:e][~m]
            if not len(ax) or not len(bx):
                continue
            dx = ax[:, None] - bx[None, :]
            dy = ay[:, None] - by[None, :]
            d2 = dx * dx + dy * dy
            h = max(int(d2.min(axis=1).max()), int(d2.min(axis=0).max()))
            if h <= max_h_sq:
                out_pk.append(int(pk[s]))
                out_h.append(h)
        out_pk_a = np.asarray(out_pk, np.int64)
        return pd.DataFrame({
            "user_a": out_pk_a >> np.int64(32),
            "user_b": out_pk_a & np.int64((1 << 32) - 1),
            "hausdorff_sq": np.asarray(out_h, np.int64)})

    return sorted_block_reduce(a.union(b_), "pk", per_pair)
