"""Continuous capacity-overflow monitoring for the training loop.

The reference fails loudly on bad steps (`octfusion_model_union.py:483`
NaN assert); our analogue is the static-capacity overflow flag every
solver returns in its loss dict (`octree/octree.py` overflow contract).
Checking it only on print steps would silently train on truncated graphs
for the other ``print_freq - 1`` steps, so this monitor keeps a
device-side running max (one tiny async ``jnp.maximum`` per step — no
host sync) and raises at the next synchronisation point (print time or
shutdown).
"""

from __future__ import annotations


class OverflowMonitor:
    """Accumulates the per-step overflow flag; ``check()`` raises if any
    step since construction overflowed.  ``update`` never synchronises —
    the max is a device scalar until ``check`` fetches it."""

    MESSAGE = (
        "octree/graph capacity overflow during training: nodes or edges "
        "were dropped, the step is wrong.  Raise capacity.finest_cap / "
        "capacity.edge_factor in the config (see octree/octree.py "
        "overflow contract)."
    )

    def __init__(self):
        self._acc = None

    def update(self, loss_dict):
        flag = loss_dict.get("overflow")
        if flag is None:
            return
        if self._acc is None:
            self._acc = flag
        else:
            import jax.numpy as jnp

            self._acc = jnp.maximum(self._acc, flag)

    def check(self):
        """Host-sync the accumulator and raise on any overflow so far."""
        if self._acc is not None and float(self._acc) > 0:
            raise RuntimeError(self.MESSAGE)
