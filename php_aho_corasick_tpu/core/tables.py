"""Compiled automaton tables — the frozen, device-ready representation.

This is the TPU-native replacement for the reference's pointer trie
(``src/multifast/node.h:37-58``): after finalize, goto/fail transitions are
precomposed into a dense byte-class-compressed transition table so the scan
is a single gather per byte, instead of the reference's runtime failure-link
chasing (``src/multifast/ahocorasick.c:199-234``).

Layout decisions (TPU-first):

* **Byte-class compression** — columns are equivalence classes of bytes.
  Every byte that appears in no pattern behaves identically (goes to root
  from every state), so the table is ``[S, C]`` with
  ``C = distinct-used-bytes + 1`` instead of ``[S, 256]``.  For typical
  pattern sets this is a 10-40x size cut, which is what makes the table
  VMEM-resident on TPU.
* **Finality by state order** — states are renumbered so all *final* states
  (states whose failure-chain match set is non-empty, the flattened result
  of ``node_collect_matches``, ``src/multifast/node.c:424-441``) occupy the
  tail of the id space.  The scan kernel then tests finality with a single
  vectorized compare ``state >= final_start`` instead of a second gather.
* **CSR match emission** — ``emit_start``/``emit_pats`` map each final state
  to its matched pattern ids, ordered own-pattern-first then failure-chain
  (i.e. decreasing pattern length), which reproduces the reference's
  intra-position match ordering (visible in ``tests/test1.phpt:99-118``).
"""

from __future__ import annotations

import dataclasses
import io
from typing import Optional

import numpy as np


@dataclasses.dataclass
class CompiledAutomaton:
    """Frozen automaton: host numpy arrays, uploaded to device by the API."""

    #: ``[S, C]`` next-state table over byte classes (int32, or int16 when
    #: the state count fits — halves table bytes).
    table: np.ndarray
    #: ``[256]`` byte -> class id (class 0 = "appears in no pattern").
    byte_class: np.ndarray
    #: ``[S+1]`` CSR row starts into :attr:`emit_pats`.
    emit_start: np.ndarray
    #: ``[E]`` pattern ids, grouped per state, decreasing pattern length.
    emit_pats: np.ndarray
    #: ``[P]`` byte length of each accepted pattern.
    pat_lens: np.ndarray
    #: ``[S]`` trie depth of each state (= length of the state's string);
    #: used by the streaming-replace backlog cut (replace.c:529 analog).
    state_depth: np.ndarray
    #: first final state id; ``state >= final_start`` <=> final.
    final_start: int
    #: longest accepted pattern in bytes (drives halo width = max_len - 1).
    max_len: int

    @property
    def n_states(self) -> int:
        return self.table.shape[0]

    @property
    def n_classes(self) -> int:
        return self.table.shape[1]

    @property
    def n_patterns(self) -> int:
        return int(self.pat_lens.shape[0])

    @property
    def n_final(self) -> int:
        return self.n_states - self.final_start

    @property
    def emit_counts(self) -> np.ndarray:
        return (self.emit_start[1:] - self.emit_start[:-1]).astype(np.int32)

    @property
    def used_bytes(self) -> np.ndarray:
        """Sorted byte values used by any pattern; byte ``used_bytes[i]``
        has class ``i + 1`` (the compiler assigns classes in sorted byte
        order)."""
        return np.nonzero(self.byte_class)[0].astype(np.uint8)

    @property
    def table_bytes(self) -> int:
        return self.table.nbytes

    # ---- serialization (reference has none — automata are rebuilt each
    # process; worth having here since million-pattern builds are costly) ----

    def save(self, path) -> None:
        np.savez_compressed(
            path,
            table=self.table,
            byte_class=self.byte_class,
            emit_start=self.emit_start,
            emit_pats=self.emit_pats,
            pat_lens=self.pat_lens,
            state_depth=self.state_depth,
            final_start=np.int64(self.final_start),
            max_len=np.int64(self.max_len),
            format_version=np.int64(1),
        )

    @classmethod
    def load(cls, path) -> "CompiledAutomaton":
        with np.load(path) as z:
            if int(z["format_version"]) != 1:
                raise ValueError("unsupported automaton file version")
            return cls(
                table=z["table"],
                byte_class=z["byte_class"],
                emit_start=z["emit_start"],
                emit_pats=z["emit_pats"],
                pat_lens=z["pat_lens"],
                state_depth=z["state_depth"],
                final_start=int(z["final_start"]),
                max_len=int(z["max_len"]),
            )

    # ---- introspection (analog of ac_trie_display, ahocorasick.c:304) ----

    def describe(self) -> str:
        out = io.StringIO()
        out.write(
            f"CompiledAutomaton: {self.n_states} states "
            f"({self.n_final} final), {self.n_classes} byte classes, "
            f"{self.n_patterns} patterns, max_len={self.max_len}\n"
        )
        out.write(
            f"  table: {self.table.dtype.name}[{self.n_states},{self.n_classes}]"
            f" = {self.table_bytes / 1024:.1f} KiB; "
            f"emit entries: {self.emit_pats.shape[0]}\n"
        )
        return out.getvalue()

    def validate(self) -> None:
        """Internal consistency checks (used by tests and after load)."""
        S, C = self.table.shape
        assert self.byte_class.shape == (256,)
        assert self.byte_class.min() >= 0 and self.byte_class.max() < C
        assert self.table.min() >= 0 and self.table.max() < S
        assert self.emit_start.shape == (S + 1,)
        assert 0 <= self.final_start <= S
        counts = self.emit_counts
        assert (counts[: self.final_start] == 0).all()
        if self.final_start < S:
            assert (counts[self.final_start :] > 0).all()
        if self.emit_pats.size:
            assert self.emit_pats.min() >= 0
            assert self.emit_pats.max() < self.n_patterns
        assert self.state_depth.shape == (S,)
        assert self.state_depth[0] == 0
        if S > 1:
            assert int(self.state_depth.max()) == self.max_len


def state_dtype(n_states: int, allow_int16: bool) -> np.dtype:
    if allow_int16 and n_states <= np.iinfo(np.int16).max:
        return np.dtype(np.int16)
    return np.dtype(np.int32)
