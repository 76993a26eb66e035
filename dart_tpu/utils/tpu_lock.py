"""Cross-process TPU serialization lock (VERDICT r4 next-1).

The TPU here is reached through a SINGLE-TENANT remote tunnel: a second
process touching the device while one is compiling/running can fail the
other's dispatch or 500 the remote-compile helper (the r3 converged-tier
failure, the r4 driver-bench CPU fallbacks). Every tool in this repo that
touches the TPU takes this flock first; a CPU-only process never needs it.

Usage:
    from dart_tpu.utils.tpu_lock import tpu_lock
    with tpu_lock(timeout_s=600) as acquired:
        if acquired: ...   # exclusive tunnel access

The lock file lives in /tmp (survives workspace resets, shared across
checkouts of this repo on the host). Reentrant within a process via a
module-level count, so nested helpers don't deadlock.
"""

from __future__ import annotations

import contextlib
import errno
import fcntl
import os
import time

LOCK_PATH = "/tmp/dart_tpu_tunnel.lock"
_depth = 0
_fd = None


@contextlib.contextmanager
def tpu_lock(timeout_s: float = 600.0, poll_s: float = 2.0):
    """Acquire the exclusive tunnel lock, waiting up to `timeout_s`.

    Yields True if acquired, False on timeout (callers decide whether to
    proceed unlocked or abort — benches proceed-with-warning rather than
    die, since a stale holder is worse than a risky run)."""
    global _depth, _fd
    if _depth > 0:
        _depth += 1
        try:
            yield True
        finally:
            _depth -= 1
        return
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    deadline = time.time() + timeout_s
    got = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            got = True
            break
        except OSError as e:
            if e.errno not in (errno.EAGAIN, errno.EACCES):
                raise
            if time.time() >= deadline:
                break
            time.sleep(poll_s)
    if got:
        _depth, _fd = 1, fd
        try:
            os.ftruncate(fd, 0)
            os.write(fd, f"pid={os.getpid()}\n".encode())
        except OSError:
            pass
    try:
        yield got
    finally:
        if got:
            _depth = 0
            _fd = None
            fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
