"""Process-scoped scratch directories (streaming sinks/checkpoints,
synthesized landing zones).

``scratch_dir`` is ``tempfile.mkdtemp`` plus an atexit sweep: every
directory it hands out is removed when the process exits, so repeated
bench/test/driver runs don't accumulate orphaned sink and checkpoint
trees in /tmp (a long session otherwise leaks hundreds). In production
these paths are object-store URIs owned by the job scheduler — this
helper exists only for the local, self-contained shapes of the
registered queries."""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_CREATED: list[str] = []


def scratch_dir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    _CREATED.append(d)
    return d


def cached_dir_valid(cache: dict, key) -> bool:
    """True iff ``cache[key]`` names a directory that still exists.

    The landing-zone builders memoize their scratch path per sf_dir for
    the process lifetime; if the tmpdir is cleaned underneath them (an
    external tmp reaper, a scratch sweep between long-session phases)
    the cached path dangles and every later call in the same process
    fails on a missing read. This guard drops the dangling entry so the
    caller rebuilds instead (ADVICE r9). A vanished dir is removed from
    the cache here; re-validating existence per call is one stat against
    a parquet write the miss path would pay anyway.
    """
    d = cache.get(key)
    if d is None:
        return False
    if os.path.isdir(d):
        return True
    del cache[key]
    return False


@atexit.register
def _sweep() -> None:
    while _CREATED:
        shutil.rmtree(_CREATED.pop(), ignore_errors=True)
