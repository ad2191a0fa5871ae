"""Shared build logic for the first-party C++ data-path libraries.

The .so artifacts are build products, never committed (unauditable, and a
binary compiled with -march=native on one machine can SIGILL on another).
Staleness is gated on a content hash of the source + compile command stored
next to the .so — git does not preserve mtimes, so mtime comparisons would
trust whatever binary happened to be on disk.
"""

from __future__ import annotations

import hashlib
import subprocess
from pathlib import Path
from typing import List, Optional

__all__ = ["build_native_lib"]


def _fingerprint(src: Path, cmd: List[str]) -> str:
    h = hashlib.sha256()
    h.update(src.read_bytes())
    h.update("\0".join(cmd).encode())
    return h.hexdigest()


def build_native_lib(src: Path, so: Path,
                     extra_flags: Optional[List[str]] = None) -> Path:
    """Compile ``src`` to ``so`` unless an up-to-date build (matching the
    stored content hash) already exists. Raises on compile failure; never
    returns a path to a stale/unverified binary."""
    cmd = (["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
            "-o", str(so), str(src)] + (extra_flags or []))
    want = _fingerprint(src, cmd)
    stamp = so.with_suffix(so.suffix + ".hash")
    if so.exists() and stamp.exists() and stamp.read_text().strip() == want:
        return so
    so.parent.mkdir(exist_ok=True)
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"g++ failed building {so.name}: {proc.stderr[-500:]}")
    stamp.write_text(want)
    return so
