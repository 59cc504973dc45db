"""Background-thread batch prefetching.

The shuffled train loader re-collates batches on the host every epoch
(relabel + hybrid build + padding).  Overlapping that host work with the
device step hides it entirely — the TPU-side analogue of the reference's
DataLoader worker processes (main.py:159, its only multi-process aspect).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


def prefetch(it: Iterable, depth: int = 2) -> Iterator:
    """Iterate ``it`` on a daemon thread, keeping up to ``depth`` items ready."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            q.put(("__prefetch_error__", e))
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__prefetch_error__":
            raise item[1]
        yield item
