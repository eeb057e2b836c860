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


def cpu_steal() -> tuple[float, float]:
    """(steal_jiffies, total_jiffies) from /proc/stat — the hypervisor
    steal counter, the direct witness for shared-host contention.
    ``cpu_busy`` counts steal as busy (busy = total − idle − iowait),
    so a loaded-host sample and a GC-thrash sample look identical
    there; bracketing with this too separates them (r16 verdict: two
    rounds of regressions were adjudicated 'box load' without a
    steal receipt)."""
    with open("/proc/stat") as fh:
        parts = fh.readline().split()[1:]
    vals = [float(x) for x in parts]
    steal = vals[7] if len(vals) > 7 else 0.0
    return steal, sum(vals)


def jvm_gc_ms(spark) -> float:
    """Cumulative JVM GC milliseconds of the local-mode driver JVM
    (sum over all collector MX beans). Bracketing a timed window gives
    the GC share of that window — the in-JVM twin of the host-side
    steal counter. Returns -1.0 if the JMX surface is unavailable."""
    try:
        beans = (
            spark.sparkContext._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        return float(sum(b.getCollectionTime() for b in beans))
    except Exception:  # noqa: BLE001 — telemetry must never fail a run
        return -1.0
