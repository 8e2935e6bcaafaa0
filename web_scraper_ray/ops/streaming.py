"""Stream-shaped incremental ingestion with actor-held state.

Ray Data has no event-time windows; stream-shaped references are
treated as an ordered, partitioned log (guide: 'Streaming-shaped
workloads'). The stateless window ops live in ``relational.py``
(tumbling ``events_hourly``, gap ``session_windows``); this module is
the *incremental* form: state that must SURVIVE across arriving
micro-batches lives in sharded actors keyed by hash(key) % n — one
actor owns a key's state, batches arrive in ts order per key.

``ingest_events_incremental`` replays the events table as a
partitioned log: one distributed consumer task per key shard, each
feeding its :class:`KeyedStateShard` actor in sequential ts-ordered
micro-batches (partition ↔ consumer ↔ state shard, 1:1:1 — no event
row ever passes through the driver). The final state equals the batch
GROUP BY (the DuckDB oracle for query ``user_running_totals``), while
intermediate states are genuine mid-stream reads the batch world
cannot produce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


class KeyedStateShard:
    """One shard of per-key running state (``ray.remote``).

    State per key: (n_events, sum_value_e4, last_ts, n_purchases).
    ``ingest`` is additive and ORDER-SENSITIVE only for last_ts, which
    is why the feeder must deliver each key's rows in ts order (the
    log-partition contract)."""

    def __init__(self, shard_id: int, n_shards: int):
        self.shard_id = shard_id
        self.n_shards = n_shards
        self.state: dict[int, dict] = {}

    def ingest(self, rows: dict) -> int:
        for uid, ts, v_e4, etype in zip(
            rows["user_id"], rows["ts"], rows["value_e4"], rows["event_type"]
        ):
            st = self.state.get(uid)
            if st is None:
                st = {"n_events": 0, "sum_value_e4": 0, "last_ts": None,
                      "n_purchases": 0}
                self.state[uid] = st
            st["n_events"] += 1
            st["sum_value_e4"] += int(v_e4)
            st["last_ts"] = ts
            if etype == "purchase":
                st["n_purchases"] += 1
        return len(self.state)

    def dump(self) -> list[dict]:
        return [
            {"user_id": uid, **st} for uid, st in sorted(self.state.items())
        ]


def ingest_events_incremental(
    sf_dir: str, n_shards: int = 4, micro_batches: int = 8
) -> pd.DataFrame:
    """Replay events as micro-batches into state shards; return the
    final per-user running totals.

    The feeder is DISTRIBUTED (not a driver loop): the log is hash-
    partitioned by key shard in one groupby, and each partition is
    consumed by its own Ray task — a per-partition log consumer that
    sorts its shard's rows into ts order and feeds them to the shard's
    state actor in sequential micro-batches (blocking per chunk, so a
    key's chunk k commits before k+1 — the log-partition ordering
    contract). The driver only launches the pipeline and reads the
    final aggregated state (#users rows); no event row ever passes
    through it. This is exactly a partitioned-log consumer group's
    shape: partition ↔ consumer ↔ state shard, 1:1:1."""
    shard_cls = ray.remote(KeyedStateShard)
    shards = [shard_cls.options(num_cpus=0).remote(i, n_shards)
              for i in range(n_shards)]

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_type", "event_id"],
    )
    n_rows = ev.count()
    chunk = max(1, -(-n_rows // (micro_batches * n_shards)))  # ceil

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["shard"] = df["user_id"].astype("int64") % n_shards
        return df

    def feed_partition(g: pd.DataFrame) -> pd.DataFrame:
        # one complete key-shard partition, consumed in ts order
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        sid = int(g["shard"].iloc[0])
        g = g.assign(
            value_e4=np.floor(g["value"] * 10000.0 + 0.5).astype("int64")
        )
        for start in range(0, len(g), chunk):
            b = g.iloc[start : start + chunk]
            # blocking per micro-batch: chunk k is applied before k+1
            ray.get(shards[sid].ingest.remote({
                "user_id": b["user_id"].tolist(),
                "ts": b["ts"].tolist(),
                "value_e4": b["value_e4"].tolist(),
                "event_type": b["event_type"].tolist(),
            }))
        return pd.DataFrame({"shard": pd.Series([sid], dtype="int64"),
                             "n_fed": pd.Series([len(g)], dtype="int64")})

    fed = (
        ev.map_batches(add_shard, batch_format="pandas")
        .groupby("shard")
        .map_groups(feed_partition, batch_format="pandas")
    )
    # take_all() DRIVES the feeder pipeline — it must run
    # unconditionally (never inside an assert, which -O strips)
    n_fed = sum(r["n_fed"] for r in fed.take_all())
    if n_fed != n_rows:
        raise RuntimeError(f"feeder delivered {n_fed} of {n_rows} events")

    rows: list[dict] = []
    for part in ray.get([s.dump.remote() for s in shards]):
        rows.extend(part)
    out = pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)
    out["last_ts"] = pd.to_datetime(out["last_ts"]).astype("datetime64[us]")
    return out[["user_id", "n_events", "sum_value_e4", "n_purchases", "last_ts"]]
