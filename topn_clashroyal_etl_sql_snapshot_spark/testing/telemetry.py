"""Shared measurement telemetry for the bench harness and the A/B /
scaling tools — one /proc/stat parser instead of per-tool copies, so a
fix to the busy/idle accounting reaches every drift-adjudication
reading at once (r9 review finding)."""

from __future__ import annotations


def cpu_busy() -> tuple[float, float]:
    """(busy_jiffies, total_jiffies) from /proc/stat's aggregate cpu
    line; idle = idle + iowait. Two calls bracketing a timed window
    give the machine-wide CPU-busy fraction over that window —
    the signal that tells a reader whether a slow sample ran on a
    loaded machine (drift) or an idle one (signal)."""
    with open("/proc/stat") as fh:
        parts = fh.readline().split()[1:]
    vals = [float(x) for x in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0.0)
    return sum(vals) - idle, sum(vals)


def busy_fraction(before: tuple[float, float], after: tuple[float, float]) -> float:
    """CPU-busy fraction between two :func:`cpu_busy` readings."""
    return (after[0] - before[0]) / max(after[1] - before[1], 1e-9)
