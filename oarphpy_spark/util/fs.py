"""Local-filesystem utilities (capability parity with the reference's
fs helpers, ``oarphpy/util/misc.py:430-467``). Driver-side only — at
cluster scale, storage paths are object-store URIs handled by Spark's
Hadoop filesystem layer, not these."""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator


def mkdir_p(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def rm_rf(path: str) -> None:
    if os.path.isdir(path) and not os.path.islink(path):
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.exists(path) or os.path.islink(path):
        os.remove(path)


def cleandir(path: str) -> None:
    """Ensure ``path`` exists and is empty."""
    rm_rf(path)
    mkdir_p(path)


def all_files_recursive(root: str) -> Iterator[str]:
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in sorted(filenames):
            yield os.path.join(dirpath, f)


def missing_or_empty(path: str) -> bool:
    """True when the path doesn't exist, is an empty file, or is a
    directory containing no files."""
    if not os.path.exists(path):
        return True
    if os.path.isfile(path):
        return os.path.getsize(path) == 0
    return next(all_files_recursive(path), None) is None
