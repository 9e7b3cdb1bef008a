#!/usr/bin/env python3
"""Volume event-stream corpus for StreamVolBench (q65-q68 at scale).

Generates n_events synthetic events with real SESSION structure — each
event belongs to a per-user session whose internal gaps are < 30 min,
so q67's sessionization and q68's 10-minute interval join both have
genuine work to do — written as n_parts parquet files in GLOBAL TIME
ORDER (file k holds the k-th time slice). Streamed with
maxFilesPerTrigger, the files replay like a live feed: event time
advances monotonically across micro-batches, which is what makes
watermark-based state eviction measurable.

Schema matches /root/testdata's events table (event_id, ts[us],
user_id, event_type, value, props). Deterministic (seed fixed).

Usage: python3 tools/events_gen.py <outDir> <nEvents> [nParts=64]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SPAN_US = 7 * 24 * 3600 * 1000000      # one week of event time
BASE_US = 1735689600000000             # 2025-01-01T00:00:00Z
EVENTS_PER_SESSION = 5                 # expected (1 + geometric)
TYPES = np.array(["click", "view", "purchase", "signup"])
TYPE_P = np.array([0.55, 0.30, 0.10, 0.05])


def main(outdir, n_events, n_parts):
    rng = np.random.default_rng(42)
    n_sessions = max(1, n_events // EVENTS_PER_SESSION)
    n_users = max(1000, n_events // 100)

    # Sessions: random user, random start across the week, geometric
    # length (mean EVENTS_PER_SESSION, capped far below the 30-min gap
    # budget: 30 events x <=4-min gaps < 2h00 but every GAP < 30 min,
    # which is all q67's splitter looks at).
    sess_user = rng.integers(0, n_users, n_sessions, dtype=np.int64)
    sess_start = rng.integers(0, SPAN_US, n_sessions, dtype=np.int64)
    sess_len = 1 + np.minimum(rng.geometric(1.0 / EVENTS_PER_SESSION, n_sessions), 29)
    total = int(sess_len.sum())

    # Expand sessions to events: per-event gap uniform 10s..4min.
    sess_idx = np.repeat(np.arange(n_sessions), sess_len)
    gaps = rng.integers(10_000_000, 240_000_000, total, dtype=np.int64)
    # First event of each session gets offset 0: zero the gap wherever
    # a new session begins, then cumsum within sessions.
    starts = np.zeros(total, dtype=bool)
    starts[np.cumsum(sess_len)[:-1]] = True
    starts[0] = True
    gaps[starts] = 0
    offs = np.cumsum(gaps)
    # Subtract each session's base cumsum so offsets restart per session.
    base = np.zeros(total, dtype=np.int64)
    base[starts] = offs[starts]
    np.maximum.accumulate(base, out=base)
    ts = BASE_US + sess_start[sess_idx] + (offs - base)

    user = sess_user[sess_idx]
    etype = TYPES[rng.choice(len(TYPES), total, p=TYPE_P)]
    value = np.round(rng.exponential(25.0, total), 2)

    order = np.argsort(ts, kind="stable")
    ts, user, etype, value = ts[order], user[order], etype[order], value[order]
    event_id = np.arange(total, dtype=np.int64)

    os.makedirs(f"{outdir}/events_parts", exist_ok=True)
    bounds = np.linspace(0, total, n_parts + 1).astype(np.int64)
    for k in range(n_parts):
        lo, hi = bounds[k], bounds[k + 1]
        tbl = pa.table({
            "event_id": event_id[lo:hi],
            "ts": pa.array(ts[lo:hi], type=pa.timestamp("us")),
            "user_id": user[lo:hi],
            "event_type": etype[lo:hi],
            "value": value[lo:hi],
            "props": np.full(hi - lo, "", dtype=object),
        })
        pq.write_table(tbl, f"{outdir}/events_parts/part-{k:04d}.parquet")
    print(f"events={total:,} users={n_users:,} sessions={n_sessions:,} "
          f"parts={n_parts} span_days=7 -> {outdir}/events_parts")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]),
         int(sys.argv[3]) if len(sys.argv) > 3 else 64)
