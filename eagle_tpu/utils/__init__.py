"""Shared host-side helpers."""

import os


def available_cpus() -> int:
    """CPU cores available to THIS process — not the machine total.

    The overlap/prefetch "auto" heuristics gate worker threads on a spare
    core existing; on affinity/cgroup-restricted hosts ``os.cpu_count()``
    reports machine cores and would enable threads that contend with the
    dispatch loop for the GIL (a measured net loss on one core).
    """
    try:
        return len(os.sched_getaffinity(0)) or 1
    except (AttributeError, OSError):  # non-Linux
        return os.cpu_count() or 1
