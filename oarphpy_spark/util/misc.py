"""Driver/executor-side utilities (capability parity with the
reference's ``oarphpy/util/misc.py``; fresh implementations).
"""

from __future__ import annotations

import hashlib
import itertools
import logging
import pickle
import subprocess
import sys
import threading
from collections import OrderedDict
from typing import Any, Iterable, Iterator

_log = logging.getLogger(__name__)


def stable_hash(x: Any) -> int:
    """Deterministic 128-bit content hash of any picklable value.

    Python's builtin ``hash`` is salted per process (PYTHONHASHSEED), so
    it cannot key distributed work; pickle+md5 is stable across runs and
    machines (same approach as reference ``oarphpy/util/misc.py:89-122``).
    For DataFrame columns use ``F.md5`` / ``F.xxhash64`` instead — this
    is for arbitrary Python values.
    """
    data = pickle.dumps(x, protocol=4)
    return int.from_bytes(hashlib.md5(data).digest(), "big")


def get_size_of_deep(v: Any) -> int:
    """Recursive in-memory byte estimate of a nested value (ndarray
    fast-path via .nbytes; containers traversed; reference analog:
    ``oarphpy/util/misc.py:47-86``)."""
    seen: set[int] = set()

    def sz(x: Any) -> int:
        if id(x) in seen:
            return 0
        seen.add(id(x))
        nbytes = getattr(x, "nbytes", None)
        if nbytes is not None and isinstance(nbytes, int):
            return nbytes
        if isinstance(x, (str, bytes, bytearray)):
            return len(x)
        if isinstance(x, dict):
            return sum(sz(k) + sz(val) for k, val in x.items())
        if isinstance(x, (list, tuple, set, frozenset)):
            return sum(sz(e) for e in x)
        if hasattr(x, "__dict__"):
            return sz(x.__dict__)
        if hasattr(x, "__slots__"):
            return sum(sz(getattr(x, s)) for s in x.__slots__ if hasattr(x, s))
        return sys.getsizeof(x, 8)

    return sz(v)


def ichunked(seq: Iterable, n: int) -> Iterator[list]:
    """Yield lists of up to ``n`` items (reference
    ``oarphpy/util/misc.py:125-136``)."""
    it = iter(seq)
    while True:
        chunk = list(itertools.islice(it, n))
        if not chunk:
            return
        yield chunk


def roundrobin(*seqs: Iterable) -> Iterator:
    """Interleave sequences until all are exhausted (reference
    ``oarphpy/util/misc.py:139-154``)."""
    iters = [iter(s) for s in seqs]
    while iters:
        nxt = []
        for it in iters:
            try:
                yield next(it)
                nxt.append(it)
            except StopIteration:
                pass
        iters = nxt


def run_cmd(cmd: str, collect: bool = False, nolog: bool = False) -> bytes | None:
    """Run a shell command, optionally capturing stdout+stderr
    (capability parity with reference ``oarphpy/util/misc.py:332-350``).
    Raises ``CalledProcessError`` on non-zero exit either way — a
    silent failure in a driver-side setup step should never be silent.
    """
    cmd = cmd.replace("\n", " ").strip()
    if not nolog:
        _log.info("Running %s ...", cmd)
    if collect:
        out = subprocess.check_output(cmd, shell=True, stderr=subprocess.STDOUT)
    else:
        subprocess.check_call(cmd, shell=True)
        out = None
    if not nolog:
        _log.info("... done with %s", cmd)
    return out


def get_non_loopback_iface() -> str:
    """Best-effort non-loopback IPv4 for this host (reference
    ``oarphpy/util/misc.py:351-365``): hostname resolution first, then
    the address a UDP socket would route externally from (no packet is
    actually sent for UDP ``connect``)."""
    import socket

    try:
        non_loopbacks = [
            ip
            for ip in socket.gethostbyname_ex(socket.gethostname())[2]
            if not ip.startswith("127.")
        ]
        if non_loopbacks:
            return non_loopbacks[0]
    except OSError:
        pass
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        s.connect(("8.8.8.8", 80))
        return s.getsockname()[0]
    finally:
        s.close()


_SYS_INFO_LOCK = threading.Lock()


def get_sys_info() -> dict[str, Any]:
    """Snapshot host diagnostics (reference ``oarphpy/util/misc.py:
    368-413``): CPU/memory/disk/GPU/network state as one dict — the
    payload an executor-inventory query ships back per host. Every
    probe is individually fault-tolerant (missing binaries yield empty
    strings) and serialized under a lock because some tools (notably
    nvidia-smi) misbehave under concurrent invocation. No network
    requests are made."""
    import multiprocessing
    import os
    import socket

    def safe_cmd(cmd: str) -> str:
        with _SYS_INFO_LOCK:
            try:
                out = run_cmd(cmd, collect=True, nolog=True)
                return out.decode("utf-8", errors="replace") if out else ""
            except Exception:
                return ""

    info: dict[str, Any] = {}
    info["filepath"] = os.path.abspath(__file__)
    info["PYTHONPATH"] = ":".join(sys.path)
    info["nvidia_smi"] = safe_cmd("nvidia-smi")
    info["cpuinfo"] = safe_cmd("cat /proc/cpuinfo")
    info["disk_free"] = safe_cmd("df -h")
    info["ifconfig"] = safe_cmd("ifconfig || ip addr")
    info["memory"] = safe_cmd("free -h || cat /proc/meminfo")
    info["hostname"] = socket.gethostname()
    try:
        info["host"] = get_non_loopback_iface()
    except OSError:
        info["host"] = ""
    info["n_cpus"] = multiprocessing.cpu_count()
    return info


def as_row_of_constants(obj: Any) -> "OrderedDict[str, Any]":
    """Flatten an object's UPPERCASE constants (recursively) into one
    row for experiment tracking (reference ``oarphpy/util/misc.py:
    158-191``)."""
    row: "OrderedDict[str, Any]" = OrderedDict()
    for name in sorted(dir(obj)):
        if not name.isupper():
            continue
        val = getattr(obj, name)
        if callable(val):
            continue
        if isinstance(val, (bool, int, float, str, bytes, type(None))):
            row[name] = val
        elif isinstance(val, (list, tuple, dict)):
            row[name] = repr(val)
        else:
            nested = as_row_of_constants(val)
            if nested:
                for k, v in nested.items():
                    row[f"{name}_{k}"] = v
            else:
                row[name] = repr(val)
    return row
