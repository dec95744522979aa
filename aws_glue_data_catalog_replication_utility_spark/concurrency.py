"""Driver-side job overlap: one shared primitive for the three places
the engine runs an independent Spark job on a side thread (the q34/q55
side-channel ndjson write, the q53 concurrent-CC towers, the importer's
async enriched-cache fill).

Spark's scheduler accepts concurrent job submission from multiple
driver threads; the ONLY thing these call sites need beyond
`threading.Thread` is error capture — an exception on the side thread
must surface on the caller thread at the join barrier, never be
swallowed (a swallowed side-channel write failure turns into a
confusing path-not-found, or worse a silent partial read, downstream).
Before r06 each site hand-rolled its own thread/err/join block and one
of them (the writer overlap) dropped errors on the floor.
"""

from __future__ import annotations

import threading
from typing import Callable, TypeVar

T = TypeVar("T")


class OverlappedTask:
    """A function running on a daemon side thread. `join()` blocks until
    it finishes, re-raises its exception on the caller thread if it
    failed, and returns its result otherwise. join() is idempotent —
    safe to use directly as a ready-barrier callback (e.g.
    `side_channel_ready=task.join`)."""

    def __init__(self, fn: Callable[[], T]):
        self._result: T | None = None
        self._error: BaseException | None = None

        def _run() -> None:
            try:
                self._result = fn()
            except BaseException as e:  # noqa: BLE001 — re-raised at join
                self._error = e

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()

    def join(self) -> T | None:
        self._thread.join()
        if self._error is not None:
            raise self._error
        return self._result


def run_overlapped(fn: Callable[[], T]) -> OverlappedTask:
    """Start `fn` on a side thread now; call `.join()` at the point its
    effects are needed."""
    return OverlappedTask(fn)
