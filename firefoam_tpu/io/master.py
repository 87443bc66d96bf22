"""Process-0 (master) gating for host-side I/O on multi-host runs.

The reference gates every probe/log/undecomposed-case write behind
Pstream::master() (rtis.C:292-309, DetailedSprinklerInjection.C:469,567,
1290); on a multi-process JAX run (pod slice, one process per host) the
same role falls to jax.process_index() == 0. Field data under jit is
globally addressable (GSPMD), so process 0 writing the full array IS the
reference's undecomposed-case semantics.

Single-controller runs (process_count == 1 — every test and the bundled
cases) are always master, so this is a no-op there.
"""

from __future__ import annotations

__all__ = ["is_master"]


def is_master() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # jax not initialised yet → single-process setup
        return True
