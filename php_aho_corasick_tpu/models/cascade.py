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
    #: "anchored": per-position multi-stage blooms; "sampled": one
    #: positional-alignment bloom checked every ``stride`` positions
    mode: str = "anchored"
    stride: int = 0
    log2_words: int = 0
    sampled_salt: int = 0
    sampled_words: Optional[np.ndarray] = None  # [2**log2_words] int32
    #: planner's estimated candidate starts per scanned byte (diagnostics)
    est_cand_density: float = 0.0


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


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


#: measured per-lookup cost of the XLA gather unit on TPU v5e (seconds);
#: see docs/PERF_NOTES.md — table-size independent down to tiny tables.
_GATHER_S = 1 / 104e6
#: amortized host-verification cost per candidate start (vectorized numpy
#: root walk; most false candidates die within a few steps).
_VERIFY_S = 30e-9
#: hard cap on positional-bloom alignments (bits of an int32 word).
_MAX_STRIDE = 32
#: skip exact gram enumeration above this many (pattern, alignment) entries.
_ENUM_CAP = 64_000_000


def _alignment_gram_codes(
    longs: Sequence[bytes], bc: np.ndarray, C: int, q: int, s: int
) -> Tuple[np.ndarray, np.ndarray]:
    """``(codes, aligns)`` of every long pattern's q-gram at offsets
    ``[0, s)`` — wrapping uint32 base-C codes, bit-identical to the device's
    int32 arithmetic (ops/filter_jax.py sampled_gram_codes)."""
    by_len: dict = {}
    for p in longs:
        by_len.setdefault(len(p), []).append(p)
    codes: List[np.ndarray] = []
    aligns: List[np.ndarray] = []
    for n, ps in sorted(by_len.items()):
        arr = np.frombuffer(b"".join(ps), np.uint8).reshape(len(ps), n)
        cls = bc[arr].astype(np.uint32)
        for j in range(s):  # s <= min_long - q + 1 <= n - q + 1
            c = np.zeros(len(ps), np.uint32)
            for t in range(q):
                c = c * np.uint32(C) + cls[:, j + t]
            codes.append(c)
            aligns.append(np.full(len(ps), j, np.int32))
    return np.concatenate(codes), np.concatenate(aligns)


def _plan_sampled(
    longs: Sequence[bytes],
    auto: CompiledAutomaton,
    config: ScanConfig,
    min_long: int,
) -> Optional[dict]:
    """Pick ``(q, stride, log2_words)`` for the strided positional bloom by
    a simple per-byte cost model: one gather per ``stride`` positions plus
    host verification proportional to expected candidate density.  Returns
    None when no sampled configuration beats per-position anchored blooms
    (e.g. min_long == q => stride 1)."""
    A = max(int(auto.used_bytes.shape[0]), 1)
    n_longs = len(longs)
    max_w = config.cascade_log2_words_max
    best = None
    for q in range(min(16, min_long), config.cascade_min_q - 1, -1):
        s = min(_MAX_STRIDE, min_long - q + 1)
        if s < 2:
            continue
        n_entries = n_longs * s
        log2_w = int(np.ceil(np.log2(max(n_entries, 1) * 32)))
        log2_w = min(max(log2_w, 14), max_w)
        true_density = min(1.0, n_entries / float(A) ** q)
        fill = n_entries / float(1 << log2_w)
        cand_per_byte = (1.1 * true_density + fill) / s
        cost = _GATHER_S / s + _VERIFY_S * cand_per_byte
        if best is None or cost < best["cost"]:
            best = dict(
                q=q, stride=s, log2_words=log2_w, cost=cost,
                cand_per_byte=cand_per_byte,
            )
    if best is None:
        return None
    if best["cand_per_byte"] > config.cascade_max_cand_density:
        return None
    return best


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

    if config.cascade_mode in ("auto", "sampled"):
        choice = _plan_sampled(longs, auto, config, min_long)
        if choice is not None and len(longs) * choice["stride"] <= _ENUM_CAP:
            q, s = choice["q"], choice["stride"]
            log2_w = choice["log2_words"]
            salt = 0x85EBCA6B
            codes, aligns = _alignment_gram_codes(
                longs, auto.byte_class, auto.n_classes, q, s
            )
            h = ((codes ^ np.uint32(salt)) * np.uint32(KNUTH))
            widx = (h >> np.uint32(32 - log2_w)).astype(np.int64)
            words = np.zeros(1 << log2_w, dtype=np.uint32)
            np.bitwise_or.at(
                words, widx, np.uint32(1) << aligns.astype(np.uint32)
            )
            # exact candidate-density estimate from the built filter
            n_distinct = np.unique(codes).shape[0]
            true_density = min(1.0, n_distinct / float(
                max(int(auto.used_bytes.shape[0]), 1)
            ) ** q)
            fill = float(codes.shape[0]) / float(1 << log2_w)
            density = (1.1 * true_density + fill) / s
            if density <= config.cascade_max_cand_density:
                return CascadePlan(
                    True,
                    f"sampled q={q} stride={s}",
                    q=q,
                    shorts=shorts,
                    min_long_len=min_long,
                    own_pat=_own_pat(auto),
                    mode="sampled",
                    stride=s,
                    log2_words=log2_w,
                    sampled_salt=salt,
                    sampled_words=words.view(np.int32),
                    est_cand_density=density,
                )
        if config.cascade_mode == "sampled":
            return CascadePlan(
                False, "no viable sampled configuration for this pattern set"
            )
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
            p = self.plan
            self._dev = {
                "byte_class": jnp.asarray(auto.byte_class.astype(np.int32)),
                "used_bytes": jnp.asarray(auto.used_bytes),
                "min_long_len": jnp.int32(p.min_long_len),
            }
            if p.mode == "sampled":
                self._dev["sampled_words"] = jnp.asarray(p.sampled_words)
            else:
                self._dev["bloom_words"] = jnp.asarray(p.bloom_words)
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

    def scan_hits_sampled(self, chunks, lengths, emit_from, capacity: int):
        """One launch of the grid-domain sampled filter (ops/filter_jax.py
        filter_hits_sampled)."""
        import jax.numpy as jnp

        from ..ops.filter_jax import filter_hits_sampled

        dev = self.device_arrays
        p = self.plan
        return filter_hits_sampled(
            dev["sampled_words"],
            dev["byte_class"],
            dev["used_bytes"],
            jnp.asarray(chunks),
            jnp.asarray(lengths),
            jnp.asarray(emit_from),
            dev["min_long_len"],
            n_classes=self.auto.n_classes,
            q=p.q,
            stride=p.stride,
            log2_words=p.log2_words,
            salt=p.sampled_salt,
            shorts=p.shorts,
            capacity=capacity,
        )

    def expand_hits(
        self,
        grid_idx: np.ndarray,
        long_word: np.ndarray,
        short_word: np.ndarray,
        n_hits: int,
        row_len: int,
        lengths: np.ndarray,  # [B] int32 (host copy)
    ) -> Tuple[np.ndarray, int]:
        """Host expansion of compacted grid hits into sorted unique
        candidate-start indices (flattened ``b * L + t``)."""
        p = self.plan
        s = p.stride
        M = -(-row_len // s)
        g = grid_idx[:n_hits].astype(np.int64)
        lw = long_word[:n_hits].astype(np.int64) & 0xFFFFFFFF
        sw = short_word[:n_hits].astype(np.int64) & 0xFFFFFFFF
        b = g // M
        pos = (g % M) * s
        base = b * row_len
        min_long = p.min_long_len
        parts: List[np.ndarray] = []
        for j in range(s):
            sel = (lw >> j) & 1 != 0
            if sel.any():
                t = pos[sel] - j
                ok = (t >= 0) & (t + min_long <= lengths[b[sel]])
                parts.append(base[sel][ok] + t[ok])
            sel = (sw >> j) & 1 != 0
            if sel.any():  # short starts: already length-gated on device
                parts.append(base[sel] + pos[sel] + j)
        if not parts:
            return np.zeros(0, np.int64), 0
        starts = np.unique(np.concatenate(parts))
        return starts, starts.shape[0]

    def candidates_np(self, packed: PackedRows, capacity: int):
        """Device filter + capacity retry + (sampled) host bit expansion.
        Returns ``(start_idx np, n_starts)`` ready for :meth:`verify`."""
        if self.plan.mode == "sampled":
            while True:
                idx, lw, sw, n = self.scan_hits_sampled(
                    packed.chunks, packed.lengths, packed.emit_from, capacity
                )
                n = int(n)
                if n <= capacity:
                    break
                capacity = _next_pow2(n)
            return self.expand_hits(
                np.asarray(idx), np.asarray(lw), np.asarray(sw), n,
                packed.row_len, packed.lengths,
            )
        while True:
            idx, n = self.scan_candidates(
                packed.chunks, packed.lengths, packed.emit_from, capacity
            )
            n = int(n)
            if n <= capacity:
                break
            capacity = _next_pow2(n)
        return np.asarray(idx), n

    def scan_candidates(self, chunks, lengths, emit_from, capacity: int):
        import jax.numpy as jnp

        from ..ops.filter_jax import filter_candidates

        dev = self.device_arrays
        p = self.plan
        assert p.mode != "sampled", "use scan_hits_sampled / candidates_np"
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

        # active-set walk: candidates that fall off the pure-prefix path are
        # compacted away each level, so total work tracks the (rapidly
        # decaying) survivor count rather than candidates x max_len
        act = np.arange(idx.shape[0])
        states = np.zeros(idx.shape[0], dtype=np.int64)
        out_rows: List[np.ndarray] = []
        out_end: List[np.ndarray] = []
        out_start: List[np.ndarray] = []
        out_pid: List[np.ndarray] = []
        for j in range(auto.max_len):
            pos = ps[act] + j
            in_row = pos < row_len[act]
            if not in_row.all():
                act = act[in_row]
                pos = pos[in_row]
            if act.size == 0:
                break
            b = packed.chunks[rows[act], pos]
            st = table[states[act], bc[b]].astype(np.int64)
            states[act] = st
            on_path = depth[st] == j + 1  # left the pure-prefix path?
            o = own[st]
            # end-1 byte index = pos; ownership window [emit_from, length)
            emit = on_path & (o >= 0) & (pos >= row_emit[act])
            if emit.any():
                sel = np.nonzero(emit)[0]
                out_rows.append(rows[act[sel]])
                out_end.append(pos[sel] + 1)
                out_start.append(ps[act[sel]])
                out_pid.append(o[sel])
            if not on_path.all():
                act = act[on_path]
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
