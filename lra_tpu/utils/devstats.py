"""Opt-in per-device-round statistics (set LRA_TPU_DEVSTATS=1).

Each batched device round (chain SDP, gap align, refine boxes, big-gap)
records one event: host pack/dispatch time, device compute wait (block on
the merged result), d2h copy wait, host post-processing, and transfer
size.  ``report()`` aggregates per round tag.  Zero overhead when
disabled; when enabled, the extra ``block_until_ready`` before the copy
serializes compute and transfer so the two are separated honestly.
"""

from __future__ import annotations

import os
import time

ENABLED = bool(os.environ.get("LRA_TPU_DEVSTATS"))
EVENTS: list = []


def now() -> float:
    return time.perf_counter()


def record(tag: str, **kw) -> None:
    if ENABLED:
        EVENTS.append((tag, kw))


def reset() -> None:
    EVENTS.clear()


def report(out=None) -> dict:
    """Aggregate events per tag; print a table if ``out`` is given."""
    agg: dict = {}
    for tag, kw in EVENTS:
        a = agg.setdefault(tag, {"rounds": 0})
        a["rounds"] += 1
        for k, v in kw.items():
            a[k] = a.get(k, 0) + v
    if out is not None:
        cols = ["rounds", "buckets", "jobs", "small_jobs", "pack_s",
                "compute_s", "copy_s", "post_s", "bytes"]
        out.write("round\t" + "\t".join(cols) + "\n")
        for tag, a in agg.items():
            row = [tag]
            for c in cols:
                v = a.get(c, 0)
                row.append(f"{v:.4f}" if isinstance(v, float) else str(v))
            out.write("\t".join(row) + "\n")
    return agg
