"""Host-side scan runtime: document packing and match expansion.

Bridges variable-length user haystacks and the fixed-shape device kernels in
:mod:`scan_jax`:

* **Packing** — documents are cut into rows of at most ``chunk_len`` payload
  bytes with a left *halo* of ``max_len - 1`` overlap bytes (the TPU-native
  replacement for the reference's sequential chunked streaming,
  ``ahocorasick.c:236-238``): the DFA state at any position depends on at
  most the previous ``max_len - 1`` bytes, so a chunk scanned from root with
  that much left context reproduces the exact state sequence of a full
  sequential scan.  Positions inside the halo are owned by the neighboring
  chunk and masked via ``emit_from``.
* **Expansion** — compacted device match positions are expanded through the
  CSR emit tables into (doc, end_pos, pattern_ids) records, in reference
  scan order: ascending end position, and within one end position the
  state's own (longest) pattern before its failure-chain suffix factors
  (``node_collect_matches`` order, ``src/multifast/node.c:424-441``).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Sequence, Tuple

import numpy as np

from ..core.tables import CompiledAutomaton

ROW_ALIGN = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class PackedRows:
    """Fixed-shape batch of scan rows plus per-row provenance."""

    chunks: np.ndarray  # [B, L] uint8
    lengths: np.ndarray  # [B] int32 (valid bytes in row; 0 for pad rows)
    emit_from: np.ndarray  # [B] int32 (first emitting in-row position)
    doc_id: np.ndarray  # [B] int32
    global_off: np.ndarray  # [B] int64 (doc offset of row position 0)

    @property
    def batch(self) -> int:
        return self.chunks.shape[0]

    @property
    def row_len(self) -> int:
        return self.chunks.shape[1]


def pack_documents(
    docs: Sequence[bytes],
    chunk_len: int,
    halo: int,
    batch_pad: int = 8,
) -> PackedRows:
    """Cut documents into halo-overlapped rows and pad to a fixed shape."""
    rows: List[Tuple[int, int, int, bytes]] = []  # (doc, off, emit_from, data)
    for d, doc in enumerate(docs):
        n = len(doc)
        if n == 0:
            continue
        if n <= chunk_len:
            rows.append((d, 0, 0, doc))
            continue
        for start in range(0, n, chunk_len):
            row_start = max(0, start - halo)
            row = doc[row_start : min(start + chunk_len, n)]
            rows.append((d, row_start, start - row_start, row))

    B = max(_round_up(max(len(rows), 1), batch_pad), batch_pad)
    L = _round_up(max((len(r[3]) for r in rows), default=1), ROW_ALIGN)
    chunks = np.zeros((B, L), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    emit_from = np.zeros(B, dtype=np.int32)
    doc_id = np.full(B, -1, dtype=np.int32)
    global_off = np.zeros(B, dtype=np.int64)
    for i, (d, off, ef, data) in enumerate(rows):
        chunks[i, : len(data)] = np.frombuffer(data, dtype=np.uint8)
        lengths[i] = len(data)
        emit_from[i] = ef
        doc_id[i] = d
        global_off[i] = off
    return PackedRows(chunks, lengths, emit_from, doc_id, global_off)


def expand_matches(
    auto: CompiledAutomaton,
    packed: PackedRows,
    match_idx: np.ndarray,  # [capacity] int32, INT32_MAX-padded, ascending
    match_state: np.ndarray,  # [capacity] int32
    n_matches: int,
) -> Iterator[Tuple[int, int, np.ndarray]]:
    """Yield ``(doc, end_pos, pattern_ids)`` per final position, in order.

    ``end_pos`` is the *exclusive* byte end offset within the document —
    the reference's ``pos`` field (``php_ahocorasick.c:555-560``).
    """
    if n_matches == 0:
        return
    L = packed.row_len
    idx = match_idx[:n_matches]
    sts = match_state[:n_matches]
    rows = idx // L
    ts = idx % L
    end_pos = packed.global_off[rows] + ts + 1
    docs = packed.doc_id[rows]
    starts = auto.emit_start[sts]
    ends = auto.emit_start[sts + 1]
    for i in range(n_matches):
        yield int(docs[i]), int(end_pos[i]), auto.emit_pats[starts[i] : ends[i]]
