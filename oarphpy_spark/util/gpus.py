"""GPU inventory (capability parity with the reference's ``GPUInfo``,
``oarphpy/util/misc.py:550-621``): parse ``nvidia-smi`` into typed
rows for executor placement / experiment tracking. Degrades to an
empty list when no GPU tooling exists (this environment)."""

from __future__ import annotations

import subprocess
from dataclasses import dataclass

_QUERY = (
    "nvidia-smi --query-gpu=index,name,memory.total,memory.used "
    "--format=csv,noheader,nounits"
)


@dataclass
class GPUInfo:
    index: int
    name: str
    mem_total_mb: int
    mem_used_mb: int

    @property
    def mem_free_mb(self) -> int:
        return self.mem_total_mb - self.mem_used_mb

    @staticmethod
    def parse_smi_csv(output: str) -> list["GPUInfo"]:
        infos = []
        for line in output.strip().splitlines():
            parts = [p.strip() for p in line.split(",")]
            if len(parts) != 4:
                continue
            infos.append(
                GPUInfo(
                    index=int(parts[0]),
                    name=parts[1],
                    mem_total_mb=int(parts[2]),
                    mem_used_mb=int(parts[3]),
                )
            )
        return infos

    @classmethod
    def get_infos(cls) -> list["GPUInfo"]:
        try:
            out = subprocess.run(
                _QUERY.split(), capture_output=True, text=True, timeout=10
            )
        except (OSError, subprocess.TimeoutExpired):
            return []
        if out.returncode != 0:
            return []
        return cls.parse_smi_csv(out.stdout)
