"""Cooperative query deadline — the reference's timeout analog.

The reference checks ``isActive()`` between cells inside its kernels
(``oshdb-api/.../backend/Kernels.java:24-36``) and raises
``OSHDBTimeoutException`` when a query exceeds its configured timeout
(``MapReducerJdbc.java:43-49``); long multi-tenant queries need a way
to die cooperatively instead of holding executors. The Ray analog: a
``Deadline`` captured by the fused view stages and checked BETWEEN
BATCHES (the unit of work here, like the reference's cell) — a tripped
deadline raises the typed error inside the worker task, Ray propagates
it to the driver, and the streaming executor tears the query down.

The object is a plain absolute wall-clock instant, so it pickles into
every worker unchanged and all workers trip within one batch of each
other; there is no cross-worker coordination (none in the reference
either — each kernel checks its own flag).
"""

from __future__ import annotations

import time


class RayhistTimeoutError(RuntimeError):
    """Query exceeded its deadline (OSHDBTimeoutException analog)."""


class Deadline:
    def __init__(self, timeout_s: float, _now: float | None = None):
        self.deadline = (time.time() if _now is None else _now) + float(timeout_s)

    def expired(self) -> bool:
        return time.time() > self.deadline

    def check(self) -> None:
        """Raise if expired — call between batches in long stages."""
        if self.expired():
            raise RayhistTimeoutError(
                f"query deadline exceeded by {time.time() - self.deadline:.3f}s"
            )
