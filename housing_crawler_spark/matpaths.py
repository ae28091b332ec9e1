"""Pid-scoped materialization dirs for the m-series oracle pattern.

Some multimodal queries (m1/m3/m4/m5/m6/m7) materialize the output of
their Arrow codec stage to parquet so BOTH engines — Spark and the
DuckDB oracle — aggregate over the exact same rows, leaving only the
numpy kernels outside the oracle (those are pinned by tests/test_media
and crawl parity).

Contract (the driver honors this by construction): the oracle SQL for
such a query reads ``read_parquet('<mat dir>')`` and is only valid
AFTER the query function itself has executed in the same process — the
query rewrites the dir at call time, and the dir name is pid-scoped so
two concurrent sessions (e.g. the driver gate and a pytest run) can
never race on overwrite-vs-read. The driver always runs the Spark
query before its oracle, so the ordering holds.

Cleanup: an atexit hook removes every dir this pid created, so
repeated runs don't accumulate stale ``/tmp/hcs_mat/*_<pid>`` dirs;
dirs of other pids are swept only when that pid is verifiably DEAD
(old mtime alone is not enough — a long-lived session's dirs must
survive other processes exiting).
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import time

_ROOT = "/tmp/hcs_mat"
_SUFFIX = f"_{os.getpid()}"
_PID_RE = re.compile(r"_(\d+)$")


def mat_path(name: str) -> str:
    """Parquet dir for this query's materialized stage, scoped to the
    current pid (stable for the process lifetime — the oracle f-string
    captures it at import time). Reuse TOUCHES the dir so a
    legitimately long-lived session (>1 week soak/bench loop) keeps its
    mtime fresh and the age-cap sweep below can never reap a dir that
    is actively in use (round-5 advice)."""
    path = f"{_ROOT}/{name}{_SUFFIX}"
    if os.path.isdir(path):
        try:
            os.utime(path, None)
        except OSError:
            pass
    return path


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else — leave it alone
    return True


@atexit.register
def _cleanup() -> None:
    if not os.path.isdir(_ROOT):
        return
    now = time.time()
    for d in os.listdir(_ROOT):
        full = os.path.join(_ROOT, d)
        if d.endswith(_SUFFIX):
            shutil.rmtree(full, ignore_errors=True)
            continue
        m = _PID_RE.search(d)
        try:
            age = now - os.path.getmtime(full)
        except OSError:
            continue
        # orphaned (crashed) pid's dir: owner dead AND aged out — OR
        # unparseable-pid junk aged a week. A week-old dir whose pid is
        # ALIVE is safe to reap too (pid recycling, round-4 advice)
        # because mat_path() touches dirs on reuse: a live session that
        # used the dir in the last week has a fresh mtime (round-5
        # advice closed the reap-under-a-live-soak-loop hole).
        if (age > 86400 and m and not _pid_alive(int(m.group(1)))) or (
            age > 7 * 86400
        ):
            shutil.rmtree(full, ignore_errors=True)
