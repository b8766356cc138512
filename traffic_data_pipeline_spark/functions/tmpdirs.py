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
import shutil
import tempfile

_CREATED: list[str] = []


def scratch_dir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    _CREATED.append(d)
    return d


@atexit.register
def _sweep() -> None:
    while _CREATED:
        shutil.rmtree(_CREATED.pop(), ignore_errors=True)
