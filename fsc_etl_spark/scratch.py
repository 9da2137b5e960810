"""Deterministic scratch directories for queries that materialize a
table copy (layout rewrites, format round trips).

``tempfile.mkdtemp`` per invocation leaks a full table copy on every
bench/sweep run (a 188-query sweep left hundreds of abandoned copies).
Instead each (tag, process) pair maps to ONE fixed path that writers
``mode("overwrite")`` into — repeated invocations in a session replace
their previous copy instead of accumulating, while concurrent
processes (pytest beside a sweep) stay isolated via the pid. At most
one copy per tag per live process remains on disk, cleared by the OS
temp reaper like any other tempdir content.
"""

from __future__ import annotations

import os
import tempfile


def scratch_path(tag: str) -> str:
    """Stable per-(tag, process) scratch directory path (not created).

    Callers write with ``mode("overwrite")`` (or overwrite-partition
    semantics) so re-invocation replaces the previous copy in place.
    """
    return os.path.join(
        tempfile.gettempdir(), f"fsc_scratch_{tag}_{os.getpid()}"
    )
