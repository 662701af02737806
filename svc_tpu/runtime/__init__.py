"""Host runtime: bounded queues, pipelined I/O threads.

Counterpart of the reference's L1 concurrency substrate
(libs/queue.hpp, libs/thread.hpp) — here the queues feed batched device
steps instead of per-frame CPU work. A native C++ implementation of the
hot serialization path lives in ``native/`` with ctypes bindings in
``svc_tpu.runtime.native``.
"""

from svc_tpu.runtime.pipeline import BoundedQueue, pipeline_threads  # noqa: F401
