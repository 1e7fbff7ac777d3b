"""VMEM-tile DFA model — vector-speed scans for small automata.

Wraps ops/scan_pallas.scan_states_tile: when ``S * C`` fits a few 128-lane
banks, the scan runs entirely on the VPU (Mosaic lane gathers), bypassing
the chip's slow scalar gather unit.  Match compaction reuses the standard
XLA machinery, so output semantics are identical to the dense DFA.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import ScanConfig
from ..core.tables import CompiledAutomaton

#: max table entries for eligibility (banks of 128; gather+select cost
#: grows linearly with bank count — 32 banks is still firmly VPU-bound)
TILE_TABLE_MAX = 4096


def tile_eligible(auto: CompiledAutomaton) -> bool:
    return auto.n_states * auto.n_classes <= TILE_TABLE_MAX


class TileDfaModel:
    def __init__(self, auto: CompiledAutomaton, config: ScanConfig) -> None:
        assert tile_eligible(auto)
        self.auto = auto
        self.config = config
        self._dev = None

    @property
    def device_arrays(self):
        if self._dev is None:
            import jax.numpy as jnp

            auto = self.auto
            self._dev = {
                "table_flat": jnp.asarray(
                    np.ascontiguousarray(auto.table).reshape(-1)
                ),
                "byte_class": jnp.asarray(auto.byte_class.astype(np.int32)),
                "used_bytes": jnp.asarray(auto.used_bytes),
                "final_start": jnp.int32(auto.final_start),
            }
        return self._dev

    def scan_compact_device(
        self,
        chunks: np.ndarray,
        lengths: np.ndarray,
        emit_from: np.ndarray,
        init_state,
        capacity: int,
    ):
        import jax
        import jax.numpy as jnp

        from ..ops.scan_jax import compact_final_states
        from ..ops.scan_pallas import scan_states_tile

        dev = self.device_arrays
        B = chunks.shape[0]
        init = (
            jnp.zeros((B,), jnp.int32)
            if init_state is None
            else jnp.asarray(init_state, dtype=jnp.int32)
        )
        interpret = jax.default_backend() != "tpu"
        states, carry = scan_states_tile(
            dev["table_flat"],
            dev["byte_class"],
            dev["used_bytes"],
            jnp.asarray(chunks),
            init,
            n_classes=self.auto.n_classes,
            lengths=jnp.asarray(lengths),
            interpret=interpret,
        )
        idx, sts, n = compact_final_states(
            states,
            jnp.asarray(lengths),
            jnp.asarray(emit_from),
            dev["final_start"],
            capacity,
        )
        return idx, sts, n, carry
