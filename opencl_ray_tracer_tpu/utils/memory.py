"""Memory introspection — the reference's MemoryCounter
(misc/MemoryCounter.cpp:7-12, Win32 pagefile usage; famously dead code).
Here it is alive and device-aware: host RSS + per-device HBM stats."""

from __future__ import annotations

from typing import Dict

import jax


def get_host_memory_usage_bytes() -> int:
    """Host process RSS (the getMemoryUsage role)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        import os

        return pages * os.sysconf("SC_PAGE_SIZE")
    except Exception:
        return 0


def get_device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats where the backend exposes them."""
    out: Dict[str, Dict[str, int]] = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                k: int(v)
                for k, v in stats.items()
                if isinstance(v, (int, float))
            }
    return out


def format_memory_report() -> str:
    lines = [f"host rss: {get_host_memory_usage_bytes() / 1e6:.1f} MB"]
    for dev, stats in get_device_memory_stats().items():
        used = stats.get("bytes_in_use", 0)
        limit = stats.get("bytes_limit", 0)
        lines.append(
            f"{dev}: {used / 1e6:.1f} MB in use"
            + (f" / {limit / 1e6:.1f} MB" if limit else "")
        )
    return "\n".join(lines)
