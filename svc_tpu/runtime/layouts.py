"""Shared boundary-layout pinning for the jitted codec programs.

Left to itself, XLA picks minor-to-major orders for large program
parameters/results that "help" the surrounding transfers and then inserts
full-tensor relayout copies inside the program (measured: 1.5-2.2 ms per
1080p batch on the coefficient tensors). Pinning row-major — what the
host ships and what the serializer memcpys — deletes that waste, but
introduces two hazards this module centralizes the defenses for:

* a pinned ``Format`` leaves the TILING unspecified, so the compiled
  executable specializes to the concrete tiling of the first argument
  that reaches it, and the persistent compile cache does NOT key on that
  choice — a later device-resident argument with any other tiling fails
  at runtime with ``INVALID_ARGUMENT: TPU backend error`` and leaves the
  tunnel session poisoned (every subsequent dispatch fails);
* a blind per-call ``device_put(x, fmt)`` never compares equal to a
  concrete on-device layout (tiling None vs concrete), so it re-copies
  the full tensor on EVERY call (measured 2.4 ms at 1080p decode).

:class:`PinnedInput` therefore stages host arrays through the pin once,
records the resulting CANONICAL concrete format, and normalizes any
device-resident argument to it — skipping the copy when formats already
match. Host (numpy) arrays pass straight to the jit, whose H2D transfer
writes the pinned layout directly.
"""

from __future__ import annotations

from typing import Optional


def row_major_format(ndim: int):
    """Row-major boundary ``Format`` on the default device, or ``None``
    on backends/jax versions without concrete-layout support."""
    try:
        import jax
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        return Format(
            Layout(major_to_minor=tuple(range(ndim))),
            SingleDeviceSharding(jax.devices()[0]),
        )
    except Exception:
        return None


class PinnedInput:
    """Canonical staging/normalization for one pinned jit parameter."""

    def __init__(self, fmt):
        self.fmt = fmt
        self._canonical = None

    def stage(self, host_array):
        """One H2D copy straight into the pinned layout (benchmarks and
        pipelines that pre-stage inputs ahead of a timing loop)."""
        import jax
        import jax.numpy as jnp

        if self.fmt is None:
            return jnp.asarray(host_array)
        staged = jax.device_put(host_array, self.fmt)
        if self._canonical is None:
            try:
                self._canonical = staged.format
            except Exception:
                pass
        return staged

    def normalize(self, x):
        """Pass host arrays through; bring device-resident arrays into
        the canonical concrete layout (no-op when already there)."""
        import jax

        if self.fmt is None or not isinstance(x, jax.Array):
            return x
        canon = self._canonical
        cur = getattr(x, "format", None)
        if canon is None or cur != canon:
            x = jax.device_put(x, canon or self.fmt)
            try:
                self._canonical = x.format
            except Exception:
                pass
        return x
