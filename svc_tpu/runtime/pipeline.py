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
from typing import Any, Callable, Iterator, List, Optional

_DONE = object()


class CancelledError(RuntimeError):
    """Raised inside a pipeline stage when its token is cancelled."""


class CancelToken:
    """Cooperative cancellation for pipeline stages.

    The reference ships an interruptible-thread framework
    (``InterruptFlag``/``IJThread``/``InterruptibleWait``,
    libs/thread.hpp:30-152) that its apps never use; this is the live
    equivalent: stages call ``check()`` at loop boundaries and any thread
    may ``cancel()`` the pipeline (used for clean Ctrl-C / GUI-quit
    teardown).
    """

    def __init__(self):
        self._event = threading.Event()

    def cancel(self) -> None:
        self._event.set()

    @property
    def cancelled(self) -> bool:
        return self._event.is_set()

    def check(self) -> None:
        if self._event.is_set():
            raise CancelledError("pipeline cancelled")

    def wait(self, timeout: Optional[float] = None) -> bool:
        """Interruptible wait (the ``InterruptibleWait`` analog,
        libs/thread.hpp:95-104)."""
        return self._event.wait(timeout)


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
    cancel: Optional[CancelToken] = None,
) -> None:
    """Run ``producer`` in a daemon thread feeding ``consumer`` (current
    thread) through a bounded queue; joins the producer on exit (the
    reference's ``ThreadGuard`` join-on-destruct, libs/thread.hpp:13-24).

    A ``CancelToken`` lets either side abort: the producer is expected to
    call ``cancel.check()`` between pushes; the consumer's cancellation
    propagates by signalling done and draining.

    A producer failure (anything but ``CancelledError``) is re-raised
    HERE after the consumer drains: without this, a crashed producer
    looks like a clean end-of-stream and the pipeline "succeeds" with a
    truncated output (e.g. a bitstream whose header promises more frames
    than its body holds).
    """
    q = BoundedQueue(capacity)
    producer_error: List[BaseException] = []

    def run_producer():
        try:
            producer(q)
        except CancelledError:
            pass
        except BaseException as e:  # noqa: BLE001 — re-raised below
            producer_error.append(e)
        finally:
            q.signal_producer_done()

    t = threading.Thread(target=run_producer, daemon=True)
    t.start()
    try:
        consumer(q)
    except CancelledError:
        pass
    finally:
        if cancel is not None:
            cancel.cancel()
        # unblock and drain a producer stuck on a full queue so the join
        # below can never deadlock (no-op on the normal path)
        while q.pop() is not None:
            pass
        t.join()
    if producer_error:
        raise producer_error[0]
