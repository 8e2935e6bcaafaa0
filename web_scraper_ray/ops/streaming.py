"""Stream-shaped incremental ingestion with actor-held state.

Ray Data has no event-time windows; stream-shaped references are
treated as an ordered, partitioned log (guide: 'Streaming-shaped
workloads'). The stateless window ops live in ``relational.py``
(tumbling ``events_hourly``, gap ``session_windows``); this module is
the *incremental* form: state that must SURVIVE across arriving
micro-batches lives in sharded actors keyed by hash(key) % n — one
actor owns a key's state, batches arrive in ts order per key.

``ingest_events_incremental`` replays the events table as N sequential
micro-batches (a log consumer's shape) into :class:`KeyedStateShard`
actors maintaining per-user running aggregates; the final state equals
the batch GROUP BY (the DuckDB oracle for query ``user_running_totals``),
while intermediate states are genuine mid-stream reads the batch world
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
    """Replay events (ts-ordered) as micro-batches into state shards;
    return the final per-user running totals."""
    shard_cls = ray.remote(KeyedStateShard)
    shards = [shard_cls.options(num_cpus=0).remote(i, n_shards)
              for i in range(n_shards)]

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_type", "event_id"],
    ).sort(["ts", "event_id"])  # the log's arrival order

    n_rows = ev.count()
    batch_size = max(1, -(-n_rows // micro_batches))  # ceil: N micro-batches

    pending: list = []
    for batch in ev.iter_batches(batch_size=batch_size, batch_format="pandas"):
        # micro-batch feed: rows route to their key's shard; within one
        # feed call the per-key ts order is preserved (batch is sorted)
        batch = batch.copy()
        batch["value_e4"] = np.floor(batch["value"] * 10000.0 + 0.5).astype("int64")
        batch["shard"] = batch["user_id"].astype("int64") % n_shards
        for sid, g in batch.groupby("shard", sort=True):
            pending.append(shards[sid].ingest.remote({
                "user_id": g["user_id"].tolist(),
                "ts": g["ts"].tolist(),
                "value_e4": g["value_e4"].tolist(),
                "event_type": g["event_type"].tolist(),
            }))
        # barrier per micro-batch: a shard must finish batch k before
        # k+1 (per-key order); ray actor calls already serialize per
        # actor, so one global wait at the end suffices for correctness
    ray.get(pending)

    rows: list[dict] = []
    for part in ray.get([s.dump.remote() for s in shards]):
        rows.extend(part)
    out = pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)
    out["last_ts"] = pd.to_datetime(out["last_ts"]).astype("datetime64[us]")
    return out[["user_id", "n_events", "sum_value_e4", "n_purchases", "last_ts"]]
