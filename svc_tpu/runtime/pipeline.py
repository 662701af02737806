"""Bounded producer/consumer queues + pipelined host threads.

The reference runs a 3-stage thread pipeline — video reader -> encoder ->
bitstream writer — over bounded circular queues with an end-of-stream
signal (reference: libs/queue.hpp:12-84, apps/encoder.cpp:125-229,
queue caps 10/10; decoder reader cap 100 apps/decoder.cpp:55-88).

Here the same structure overlaps host video decode and bitstream write with
device compute: the reader thread fills a bounded queue with frames, the
main thread assembles batches and runs the jitted encoder, the writer
thread drains output bytes. ``BoundedQueue`` reproduces the reference's
queue contract: blocking push, pop that returns None only when the queue is
empty *and* the producer signalled done.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

_DONE = object()


class BoundedQueue:
    """Blocking bounded queue with producer-done signaling
    (the contract of ``CircularQueue`` libs/queue.hpp:23-72)."""

    def __init__(self, capacity: int):
        self._q: "queue.Queue[Any]" = queue.Queue(maxsize=capacity)
        self._done = threading.Event()

    def push(self, item: Any) -> None:
        self._q.put(item)

    def signal_producer_done(self) -> None:
        self._done.set()
        # wake any blocked pop
        self._q.put(_DONE)

    def pop(self) -> Optional[Any]:
        """Blocking pop; returns None iff empty and producer is done."""
        while True:
            item = self._q.get()
            if item is _DONE:
                # propagate the sentinel for other consumers, then report EOS
                self._q.put(_DONE)
                return None
            return item

    def __iter__(self) -> Iterator[Any]:
        while True:
            item = self.pop()
            if item is None:
                return
            yield item


def pipeline_threads(
    producer: Callable[[BoundedQueue], None],
    consumer: Callable[[BoundedQueue], None],
    capacity: int,
) -> None:
    """Run ``producer`` in a daemon thread feeding ``consumer`` (current
    thread) through a bounded queue; joins the producer on exit (the
    reference's ``ThreadGuard`` join-on-destruct, libs/thread.hpp:13-24)."""
    q = BoundedQueue(capacity)

    def run_producer():
        try:
            producer(q)
        finally:
            q.signal_producer_done()

    t = threading.Thread(target=run_producer, daemon=True)
    t.start()
    try:
        consumer(q)
    finally:
        t.join()
