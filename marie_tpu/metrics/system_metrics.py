"""System/process metric collectors (reference: marie/metrics/system_metrics.py)."""

from typing import Dict


def collect_system_metrics() -> Dict[str, float]:
    import psutil

    vm = psutil.virtual_memory()
    proc = psutil.Process()
    out = {
        "system.cpu_percent": psutil.cpu_percent(interval=None),
        "system.memory_percent": vm.percent,
        "system.memory_available_bytes": float(vm.available),
        "process.memory_rss_bytes": float(proc.memory_info().rss),
        "process.num_threads": float(proc.num_threads()),
    }
    try:
        import jax

        # device memory stats when the backend reports them
        stats = jax.devices()[0].memory_stats() or {}
        if "bytes_in_use" in stats:
            out["device.bytes_in_use"] = float(stats["bytes_in_use"])
    except Exception:  # noqa: BLE001
        pass
    return out
