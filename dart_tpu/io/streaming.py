"""In-graph telemetry streaming: jitted loops -> native ring buffer.

The reference keeps telemetry off the control path by shipping it to a
logger *process* through a queue (`PMPC/src/logger.py:39-148`). Here the
control loop is a device-resident XLA program; the equivalent is a
`jax.experimental.io_callback` tap that forwards selected per-step records
from inside `lax.scan` to the host, where the native C++ ring
(`dart_tpu.io.ringlog`) absorbs them without blocking (drop-and-count on
overflow — the same lossy-telemetry semantics as the reference's
latest-wins queues).

Usage:
    tap = TelemetryTap(path, record_dtype)      # host side, once
    ...inside the jitted step...
    tap.emit(t=t, x=x, u=u)                      # traced call
    ...after the loop...
    tap.close(); arr = RingLogger.read(path, record_dtype)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dart_tpu.io.ringlog import RingLogger

# Per-step record schema streamed by the production episode drivers
# (`cli/pmpc --stream`, `rollout.evaluate.make_pmpc_evaluator(tap=...)`).
EPISODE_STREAM_DTYPE = np.dtype([("k", "<i4"), ("px", "<f4"), ("py", "<f4"),
                                 ("ux", "<f4"), ("uy", "<f4"),
                                 ("err", "<f4")])


class TelemetryTap:
    """Bridges jitted code to the native ring via io_callback.

    `record_dtype` must be a structured numpy dtype; `emit` takes one
    keyword per field (scalars or small arrays matching the field shape).
    """

    def __init__(self, path: str, record_dtype: np.dtype,
                 capacity_records: int = 1 << 16):
        self.dtype = np.dtype(record_dtype)
        self.logger = RingLogger(path, self.dtype, capacity_records)

    def _host_push(self, *field_values):
        rec = np.zeros((), self.dtype)
        for name, value in zip(self.dtype.names, field_values):
            rec[name] = np.asarray(value)
        self.logger.push(rec)
        return np.int32(0)

    def emit(self, **fields):
        """Traced: enqueue one record from inside jit/scan. `ordered=True`
        keeps records in program order."""
        args = [jnp.asarray(fields[name]) for name in self.dtype.names]
        jax.experimental.io_callback(
            self._host_push, jax.ShapeDtypeStruct((), jnp.int32), *args,
            ordered=True)

    def stats(self):
        return self.logger.stats()

    def close(self):
        self.logger.close()
