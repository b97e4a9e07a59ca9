"""Device/host memory tracking with efficiency indices.

Parity target: reference plenoctree/memory_tracker.py (`MemorySnapshot`
:18, `MemoryTracker` :50-578): periodic snapshots of accelerator + process
+ system memory with peak tracking, and `calculate_efficiency_indices`
(:343-478) — memory_efficiency_index = PSNR/GB, quality_memory_tradeoff =
(PSNR*SSIM)/GB, lpips_memory_efficiency = (1-LPIPS)/GB, combined index,
storage_aware_mei = PSNR*log10(compression)/storage_GB, and
voxel_density_efficiency. The reference's nvidia-smi > reserved >
allocated > RSS source priority becomes: TPU HBM stats (jax
memory_stats) > process RSS.
"""
from __future__ import annotations

import gc
from dataclasses import dataclass
from datetime import datetime
from typing import Any, Dict, Optional

import numpy as np


@dataclass
class MemorySnapshot:
    timestamp: str
    step: int
    device_bytes_in_use: float = 0.0
    device_bytes_limit: float = 0.0
    device_peak_bytes: float = 0.0
    process_rss_gb: float = 0.0
    system_used_gb: float = 0.0
    system_total_gb: float = 0.0

    @property
    def device_gb(self) -> float:
        return self.device_bytes_in_use / 1e9

    @property
    def device_peak_gb(self) -> float:
        return self.device_peak_bytes / 1e9


class MemoryTracker:
    def __init__(self):
        self.snapshots = []
        self.peak_device_bytes = 0.0
        self.peak_rss_gb = 0.0

    def _device_stats(self):
        try:
            import jax

            stats = {}
            for d in jax.local_devices():
                s = d.memory_stats()
                if s:
                    for k in ("bytes_in_use", "bytes_limit", "peak_bytes_in_use"):
                        stats[k] = stats.get(k, 0) + s.get(k, 0)
            return stats
        except Exception:
            return {}

    def capture_snapshot(self, step: int = 0) -> MemorySnapshot:
        dev = self._device_stats()
        rss_gb = used = total = 0.0
        try:
            import psutil

            p = psutil.Process()
            rss_gb = p.memory_info().rss / 1e9
            vm = psutil.virtual_memory()
            used, total = vm.used / 1e9, vm.total / 1e9
        except Exception:
            pass
        snap = MemorySnapshot(
            timestamp=datetime.now().isoformat(),
            step=step,
            device_bytes_in_use=float(dev.get("bytes_in_use", 0)),
            device_bytes_limit=float(dev.get("bytes_limit", 0)),
            device_peak_bytes=float(dev.get("peak_bytes_in_use", 0)),
            process_rss_gb=rss_gb,
            system_used_gb=used,
            system_total_gb=total,
        )
        self.peak_device_bytes = max(
            self.peak_device_bytes, snap.device_bytes_in_use, snap.device_peak_bytes
        )
        self.peak_rss_gb = max(self.peak_rss_gb, rss_gb)
        self.snapshots.append(snap)
        return snap

    def get_memory_metrics(self, snapshot: Optional[MemorySnapshot] = None) -> Dict[str, float]:
        snap = snapshot or (self.snapshots[-1] if self.snapshots else self.capture_snapshot())
        return {
            "device_memory_gb": snap.device_gb,
            "device_peak_memory_gb": self.peak_device_bytes / 1e9,
            "device_memory_limit_gb": snap.device_bytes_limit / 1e9,
            "process_rss_gb": snap.process_rss_gb,
            "peak_process_rss_gb": self.peak_rss_gb,
            "system_used_gb": snap.system_used_gb,
            "system_total_gb": snap.system_total_gb,
        }

    def _primary_memory_gb(self) -> float:
        """Source priority: device HBM > process RSS (tracker:408-423)."""
        if self.peak_device_bytes > 0:
            return self.peak_device_bytes / 1e9
        return max(self.peak_rss_gb, 1e-9)

    def calculate_efficiency_indices(
        self,
        psnr: float,
        ssim: Optional[float] = None,
        lpips: Optional[float] = None,
        *,
        storage_size_gb: Optional[float] = None,
        compression_ratio: Optional[float] = None,
        occupancy_ratio: Optional[float] = None,
    ) -> Dict[str, float]:
        primary = self._primary_memory_gb()
        peak = primary
        out: Dict[str, float] = {
            "memory_efficiency_index": psnr / primary,
            "peak_memory_efficiency_index": psnr / peak,
            "memory_source_gb": primary,
        }
        if ssim is not None:
            out["quality_memory_tradeoff"] = (psnr * ssim) / primary
        if lpips is not None:
            out["lpips_memory_efficiency"] = (1.0 - lpips) / primary
            out["peak_lpips_memory_efficiency"] = (1.0 - lpips) / peak
        if ssim is not None and lpips is not None:
            out["combined_quality_memory_index"] = (
                psnr * ssim * (1.0 - lpips)
            ) / primary
        if storage_size_gb and compression_ratio:
            out["storage_aware_mei"] = (
                psnr * np.log10(max(compression_ratio, 1.0 + 1e-9))
            ) / storage_size_gb
        if storage_size_gb and occupancy_ratio is not None:
            out["voxel_density_efficiency"] = (
                psnr * occupancy_ratio
            ) / storage_size_gb
        return out

    def get_model_size_estimate(self, params: Any = None) -> Dict[str, float]:
        """Parameter-count/bytes estimate (tracker:479-522 equivalent)."""
        if params is None:
            return {"param_count": 0, "param_gb": 0.0}
        import jax

        leaves = jax.tree_util.tree_leaves(params)
        count = sum(int(np.prod(l.shape)) for l in leaves)
        nbytes = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize for l in leaves
        )
        return {"param_count": count, "param_gb": nbytes / 1e9}

    def cleanup_memory(self):
        gc.collect()

    def reset_peak_tracking(self):
        self.peak_device_bytes = 0.0
        self.peak_rss_gb = 0.0
