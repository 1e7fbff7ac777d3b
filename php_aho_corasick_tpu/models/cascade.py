"""Gram-filter cascade model — planning and host-side exact verification.

See ops/filter_jax.py for the device kernel.  This module decides when the
cascade applies, builds the per-stage hashed blooms from the pattern set,
and verifies compacted candidate starts exactly with a vectorized trie
walk (goto-only, detected via ``state_depth``).

The start-based paradigm is the "failure-less Aho-Corasick" family
(cf. PFAC, arXiv:1811.10498, PAPERS.md) — here with a vectorized bloom
prefilter in front so only candidate starts pay the walk.

Equivalence argument (vs the DFA scan): every occurrence of every pattern
is found at its own start position — a pattern that is a suffix factor of
another match (the reference's failure-chain emission,
``node_collect_matches``) starts at a later position and is detected
there independently.  Sorting verified (start, pattern) pairs by
``(end, start)`` reproduces the reference's emission order exactly:
ascending end position, and within one end the longest pattern (earliest
start) first (``tests/test1.phpt:99-118``).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import ScanConfig
from ..core.tables import CompiledAutomaton
from ..ops.filter_jax import KNUTH
from ..ops.matches import PackedRows


@dataclasses.dataclass
class CascadePlan:
    eligible: bool
    reason: str
    q: int = 0
    offsets: Tuple[int, ...] = ()
    salts: Tuple[int, ...] = ()
    log2_bits: int = 0
    bloom_words: Optional[np.ndarray] = None  # [n_stages, bits/32] int32
    shorts: Tuple[bytes, ...] = ()
    min_long_len: int = 0
    #: own pattern id per state (-1 when the state's string is no pattern)
    own_pat: Optional[np.ndarray] = None


def _gram_code_u32(classes: Sequence[int], n_classes: int) -> int:
    """Host replica of the device's wrapping base-C code arithmetic."""
    code = 0
    for c in classes:
        code = (code * n_classes + int(c)) & 0xFFFFFFFF
    return code


def _own_pat(auto: CompiledAutomaton) -> np.ndarray:
    own = np.full(auto.n_states, -1, dtype=np.int64)
    finals = np.arange(auto.final_start, auto.n_states)
    if finals.size:
        first = auto.emit_pats[auto.emit_start[finals]]
        is_own = auto.pat_lens[first] == auto.state_depth[finals]
        own[finals[is_own]] = first[is_own]
    return own


def plan_cascade(
    patterns: Sequence[bytes],
    auto: CompiledAutomaton,
    config: ScanConfig,
) -> CascadePlan:
    if not patterns:
        return CascadePlan(False, "no patterns")
    longs = [p for p in patterns if len(p) >= config.cascade_min_q]
    shorts = tuple(p for p in patterns if len(p) < config.cascade_min_q)
    if len(shorts) > config.cascade_max_shorts:
        return CascadePlan(
            False, f"{len(shorts)} short patterns (> {config.cascade_max_shorts})"
        )
    log2_bits = config.cascade_log2_bloom_bits
    if not longs:
        return CascadePlan(
            True, "shorts-only", q=0, shorts=shorts, min_long_len=0,
            bloom_words=np.zeros((0, 1), np.int32), own_pat=_own_pat(auto),
        )
    min_long = min(len(p) for p in longs)
    q = min(8, min_long)
    # stage offsets: gram windows fully inside every long pattern
    offs = {0}
    if min_long - q >= 1:
        offs.add(min_long - q)
    if min_long - q >= 2:
        offs.add((min_long - q) // 2)
    offsets = tuple(sorted(offs))
    # bloom fill check: a saturated filter passes everything — not worth it
    if len(longs) > (1 << log2_bits) * config.cascade_max_fill:
        return CascadePlan(
            False,
            f"{len(longs)} long patterns saturate a 2^{log2_bits}-bit bloom",
        )
    bc = auto.byte_class
    C = auto.n_classes
    salts = tuple(0x9E3779B9 * (s + 1) & 0xFFFFFFFF for s in range(len(offsets)))
    words = np.zeros((len(offsets), (1 << log2_bits) // 32), dtype=np.uint32)
    for s, (off, salt) in enumerate(zip(offsets, salts)):
        for p in longs:
            cls = bc[np.frombuffer(p, np.uint8)[off : off + q]]
            code = _gram_code_u32(cls, C)
            h = ((code ^ salt) * KNUTH) & 0xFFFFFFFF
            slot = h >> (32 - log2_bits)
            words[s, slot >> 5] |= np.uint32(1) << np.uint32(slot & 31)
    return CascadePlan(
        True,
        "ok",
        q=q,
        offsets=offsets,
        salts=salts,
        log2_bits=log2_bits,
        bloom_words=words.view(np.int32),
        shorts=shorts,
        min_long_len=min_long,
        own_pat=_own_pat(auto),
    )


class CascadeModel:
    """Device candidate filter + host exact verifier."""

    def __init__(
        self, auto: CompiledAutomaton, plan: CascadePlan, config: ScanConfig
    ) -> None:
        assert plan.eligible
        self.auto = auto
        self.plan = plan
        self.config = config
        self._dev = None

    @property
    def device_arrays(self):
        if self._dev is None:
            import jax.numpy as jnp

            auto = self.auto
            self._dev = {
                "bloom_words": jnp.asarray(self.plan.bloom_words),
                "byte_class": jnp.asarray(auto.byte_class.astype(np.int32)),
                "used_bytes": jnp.asarray(auto.used_bytes),
                "min_long_len": jnp.int32(self.plan.min_long_len),
            }
        return self._dev

    def bloom_impl(self) -> str:
        impl = self.config.bloom_impl
        if impl == "auto":
            return "take"  # measured per-backend default; PERF_NOTES.md
        if impl == "matmul":
            import jax

            if jax.default_backend() == "tpu":
                # measured: the one-hot f32 matmul lookup is INEXACT on the
                # v5e MXU (bloom false negatives = missed matches) — refuse
                return "take"
        return impl

    def scan_candidates(self, chunks, lengths, emit_from, capacity: int):
        import jax.numpy as jnp

        from ..ops.filter_jax import filter_candidates

        dev = self.device_arrays
        p = self.plan
        return filter_candidates(
            dev["bloom_words"],
            dev["byte_class"],
            dev["used_bytes"],
            jnp.asarray(chunks),
            jnp.asarray(lengths),
            jnp.asarray(emit_from),
            dev["min_long_len"],
            n_classes=self.auto.n_classes,
            q=p.q,
            offsets=p.offsets,
            log2_bits=p.log2_bits,
            salts=p.salts,
            shorts=p.shorts,
            bloom_impl=self.bloom_impl(),
            capacity=capacity,
        )

    def verify(
        self,
        packed: PackedRows,
        start_idx: np.ndarray,  # [capacity] flattened b * L + p, ascending
        n_cand: int,
    ) -> Iterator[Tuple[int, int, np.ndarray]]:
        """Exact verification: vectorized goto-walk from root over each
        candidate window; yields ``(doc, end_pos, [pid])`` in reference
        emission order ``(row, end, start)``."""
        if n_cand == 0:
            return iter(())
        auto = self.auto
        L = packed.row_len
        idx = start_idx[:n_cand].astype(np.int64)
        rows = idx // L
        ps = idx % L
        table = auto.table
        bc = auto.byte_class
        depth = auto.state_depth
        own = self.plan.own_pat
        row_len = packed.lengths[rows].astype(np.int64)
        row_emit = packed.emit_from[rows].astype(np.int64)

        states = np.zeros(idx.shape[0], dtype=np.int64)
        alive = np.ones(idx.shape[0], dtype=bool)
        out_rows: List[np.ndarray] = []
        out_end: List[np.ndarray] = []
        out_start: List[np.ndarray] = []
        out_pid: List[np.ndarray] = []
        for j in range(auto.max_len):
            pos = ps + j
            in_row = pos < row_len
            alive &= in_row
            if not alive.any():
                break
            safe_pos = np.minimum(pos, L - 1)
            b = packed.chunks[rows, safe_pos]
            states = table[states, bc[b]].astype(np.int64)
            alive &= depth[states] == j + 1  # left the pure-prefix path?
            o = own[states]
            # end-1 byte index = pos; ownership window [emit_from, length)
            emit = alive & (o >= 0) & (pos >= row_emit)
            if emit.any():
                sel = np.nonzero(emit)[0]
                out_rows.append(rows[sel])
                out_end.append(pos[sel] + 1)
                out_start.append(ps[sel])
                out_pid.append(o[sel])
        if not out_rows:
            return iter(())
        r = np.concatenate(out_rows)
        e = np.concatenate(out_end)
        st = np.concatenate(out_start)
        pid = np.concatenate(out_pid)
        order = np.lexsort((st, e, r))  # (row, end, start): longest-first
        docs = packed.doc_id[r[order]]
        ends = packed.global_off[r[order]] + e[order]
        pids = pid[order]

        def gen():
            for i in range(order.shape[0]):
                yield int(docs[i]), int(ends[i]), pids[i : i + 1]

        return gen()
