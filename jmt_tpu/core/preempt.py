"""Graceful preemption: SIGTERM → checkpoint at the next epoch boundary.

TPU pool/pod VMs are preemptible — the scheduler sends SIGTERM with a short
grace window before killing the process. The reference has no failure or
recovery handling at all (SURVEY.md §5.3: no retry/preemption/elastic logic;
a mid-run kill loses everything since it never reloads weights in Training
mode). jmt_tpu already checkpoints the full train state every epoch; this
module adds the gap-closer: a signal sets a process-wide flag, and
``Runner.fit`` checks it at the two epoch-boundary points where exiting is
numerics-safe —

* after a train epoch (its validation is skipped; the state is saved with
  the epoch advanced, so resume continues at the NEXT epoch and the
  training numerics are identical to an uninterrupted run);
* after a full epoch (state already saved — exit is free).

``passed.txt`` is NOT written on a preempted exit, so re-launching the same
command resumes instead of skipping (the reference's idempotence guard,
parseit.py:354-358, is preserved for completed runs only).

Handlers are installed from the main thread only (``signal.signal`` raises
elsewhere); ``request()`` lets tests and external schedulers trigger the
same path programmatically.
"""
from __future__ import annotations

import signal
import threading
from typing import List, Tuple

_EVENT = threading.Event()
_INSTALLED: List[Tuple[int, object]] = []


def install(signals=(signal.SIGTERM,)) -> bool:
    """Install preemption handlers. Idempotent; returns False (and installs
    nothing) when not on the main thread."""
    if _INSTALLED:
        return True
    if threading.current_thread() is not threading.main_thread():
        return False
    for s in signals:
        prev = signal.signal(s, _handler)
        _INSTALLED.append((s, prev))
    return True


def uninstall() -> None:
    """Restore the pre-install handlers (test hygiene)."""
    while _INSTALLED:
        s, prev = _INSTALLED.pop()
        signal.signal(s, prev)


def _handler(signum, frame) -> None:
    _EVENT.set()


def request() -> None:
    """Programmatic preemption request (tests, external schedulers)."""
    _EVENT.set()


def requested() -> bool:
    return _EVENT.is_set()


def agreed() -> bool:
    """Cross-process consensus on the preemption flag.

    On a pod, SIGTERM delivery skews across hosts: if each process acted on
    its LOCAL flag, one host could break out of the epoch loop while the
    others proceed into the next collective — a permanent hang and no
    checkpoint. Every boundary check instead all-reduces the flag (max), so
    all processes take the same branch. The allgather is itself a lockstep
    collective, which is safe exactly because every process calls this at
    the same program points. Single process: the local flag."""
    import jax
    if jax.process_count() == 1:
        return _EVENT.is_set()
    import numpy as np
    from jax.experimental import multihost_utils
    flags = multihost_utils.process_allgather(
        np.asarray(_EVENT.is_set(), np.int32))
    return bool(np.max(flags))


def clear() -> None:
    _EVENT.clear()
