"""Shared boundary-layout pinning for the jitted codec programs.

Left to itself, XLA picks minor-to-major orders for large program
parameters/results that "help" the surrounding transfers and then inserts
full-tensor relayout copies inside the program (measured: 1.5-2.2 ms per
1080p batch on the coefficient tensors). Pinning row-major — what the
host ships and what the serializer memcpys — deletes that waste, but
introduces two hazards this module centralizes the defenses for:

* a pinned ``Format`` leaves the TILING unspecified, so the compiled
  executable commits to one concrete tiling at compile time, and the
  persistent compile cache does NOT key on that choice — a
  device-resident argument with any other tiling fails at runtime with
  ``INVALID_ARGUMENT: TPU backend error`` and leaves the tunnel session
  poisoned (every subsequent dispatch fails — this took out 3 of 4 bench
  matrix legs in the round-3 driver run);
* a blind per-call ``device_put(x, fmt)`` never compares equal to a
  concrete on-device layout (tiling None vs concrete), so it re-copies
  the full tensor on EVERY call (measured 2.4 ms at 1080p decode).

:class:`PinnedDispatch` makes the mismatch structurally impossible: on
the first call it compiles the program ONCE (ahead-of-time, from abstract
shapes — no argument data can influence the executable), reads the
executable's OWN concrete input formats as the canonical layouts, then
routes every call through that same executable with device-resident
arguments normalized to the canonical format first (a no-op copy-skip
when they already match; host arrays pass straight through, their H2D
transfer writes the canonical layout directly). The executable the
arguments reach is by construction the executable whose formats they
were normalized to.
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


class PinnedDispatch:
    """Layout-safe dispatch wrapper around one layout-pinned jit.

    Args:
      jitted: the ``jax.jit``-wrapped function (with its layout pins).
      pinned_argnums: positions of the arguments whose pinned ``Format``
        leaves tiling unspecified (the hazard cases). Other arguments
        pass through untouched.
    """

    def __init__(self, jitted, pinned_argnums=(0,), fallback_formats=None):
        self._jitted = jitted
        self._pinned_argnums = tuple(pinned_argnums)
        self._fallback = dict(fallback_formats or {})  # argnum -> Format
        self._compiled = None
        self._canonical = {}  # argnum -> concrete Format
        self._abstract = None  # ShapeDtypeStructs the AOT signature holds

    def _ensure_compiled(self, args):
        import jax

        abstract = tuple(
            jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args
        )
        if self._compiled is not None and abstract == self._abstract:
            return True
        try:
            compiled = self._jitted.lower(*abstract).compile()
            in_fmts = compiled.input_formats[0]
        except Exception:
            return False  # backend without AOT/layout introspection
        self._compiled = compiled
        self._abstract = abstract
        self._canonical = {
            i: in_fmts[i] for i in self._pinned_argnums
        }
        return True

    def _normalize(self, i, x):
        """Bring a device-resident argument into the executable's own
        concrete format (no-op when already there); host arrays pass
        straight through — their H2D transfer writes the pinned layout."""
        import jax

        if not isinstance(x, jax.Array):
            return x
        canon = self._canonical.get(i)
        if canon is None:
            return x
        try:
            if x.format == canon:
                return x
        except Exception:
            pass
        return jax.device_put(x, canon)

    def __call__(self, *args):
        if not self._ensure_compiled(args):
            # no AOT/layout introspection on this backend: the layout-
            # pinned jit still runs, so device-resident arguments must
            # still be normalized to the pinned format (the fallback
            # Format) or the INVALID_ARGUMENT session-poisoning hazard
            # resurfaces exactly here
            import jax

            def norm(i, a):
                if i not in self._fallback or not isinstance(a, jax.Array):
                    return a
                try:
                    return jax.device_put(a, self._fallback[i])
                except Exception:
                    return a  # backend without Format-targeted puts

            args = tuple(norm(i, a) for i, a in enumerate(args))
            return self._jitted(*args)
        norm = [
            self._normalize(i, a) if i in self._canonical else a
            for i, a in enumerate(args)
        ]
        return self._compiled(*norm)

    def canonical_format(self, argnum=0):
        """The executable's concrete input format (None until first call)."""
        return self._canonical.get(argnum)

    def stage(self, argnum, host_array):
        """One H2D copy of a host array straight into the executable's
        canonical layout (benchmarks/pipelines that pre-stage inputs
        ahead of a timing loop). Before the first compile the abstract
        pin is used; its concrete tiling and the executable's coincide
        (both are the backend default for the pinned order), and
        ``__call__`` re-normalizes if they ever do not."""
        import jax
        import jax.numpy as jnp

        fmt = self._canonical.get(argnum) or self._fallback.get(argnum)
        if fmt is None:
            return jnp.asarray(host_array)
        return jax.device_put(host_array, fmt)
