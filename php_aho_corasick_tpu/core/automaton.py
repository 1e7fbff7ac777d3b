"""Finalize: trie -> compiled dense automaton.

TPU-first re-design of the reference's ``ac_trie_finalize``
(``src/multifast/ahocorasick.c:143-155``):

* failure links computed by **level-order BFS with vectorized numpy steps**
  (O(states) per level) instead of the reference's recursive DFS with
  per-node O(depth^2) suffix probing (``ahocorasick.c:344-396``);
* goto and fail are **precomposed** into one dense table at build time, so
  the device scan never follows failure links;
* match sets are unioned along failure chains exactly like
  ``node_collect_matches`` (``src/multifast/node.c:424-441``) and flattened
  to CSR.

The key identities used (standard Aho-Corasick-as-DFA construction):

  ``delta(s, b) = children[s][b]`` if the edge exists, else
  ``delta(fail(s), b)``  (root's missing edges go to root), and for an edge
  ``s --b--> t`` at depth(s) >= 1: ``fail(t) = delta(fail(s), b)``.

Processing states level by level makes both computable with pure array ops:
when level ``d`` is processed every referenced row belongs to a shallower
level and is already complete.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .tables import CompiledAutomaton, state_dtype
from .trie import TrieBuilder


def compile_trie(
    trie: TrieBuilder,
    pattern_lengths: Sequence[int],
    allow_int16: bool = True,
) -> CompiledAutomaton:
    """Compile a finished trie into a :class:`CompiledAutomaton`.

    ``pattern_lengths[i]`` is the byte length of accepted pattern ``i`` (in
    trie insertion order).
    """
    S = trie.n_states
    own = np.asarray(trie.own, dtype=np.int64)
    depth = np.asarray(trie.depth, dtype=np.int64)
    pat_lens = np.asarray(pattern_lengths, dtype=np.int32)
    assert pat_lens.shape[0] == trie.n_patterns

    # --- byte classes: 0 = byte used by no pattern (always -> root) ---
    used = sorted({b for ch in trie.children for b in ch})
    byte_class = np.zeros(256, dtype=np.int32)
    for i, b in enumerate(used):
        byte_class[b] = i + 1
    C = len(used) + 1

    # --- flat edge arrays (each non-root state has exactly one in-edge) ---
    n_edges = S - 1
    e_src = np.empty(n_edges, dtype=np.int64)
    e_cls = np.empty(n_edges, dtype=np.int64)
    e_dst = np.empty(n_edges, dtype=np.int64)
    k = 0
    for s, ch in enumerate(trie.children):
        for b, t in ch.items():
            e_src[k] = s
            e_cls[k] = byte_class[b]
            e_dst[k] = t
            k += 1
    assert k == n_edges
    # group edges by source depth so levels can be processed with array ops
    order = np.argsort(depth[e_src], kind="stable")
    e_src, e_cls, e_dst = e_src[order], e_cls[order], e_dst[order]
    level_bounds = np.searchsorted(depth[e_src], np.arange(depth.max() + 2))

    # --- level-order closure: table rows + failure links ---
    table = np.zeros((S, C), dtype=np.int64)
    fail = np.zeros(S, dtype=np.int64)
    max_depth = int(depth.max()) if S > 1 else 0
    states_by_level: List[np.ndarray] = [
        np.nonzero(depth == d)[0] for d in range(max_depth + 1)
    ]
    for d in range(max_depth + 1):
        if d > 0:
            lv = states_by_level[d]
            table[lv] = table[fail[lv]]
        lo, hi = level_bounds[d], level_bounds[d + 1]
        src, cls_, dst = e_src[lo:hi], e_cls[lo:hi], e_dst[lo:hi]
        table[src, cls_] = dst
        if d == 0:
            fail[dst] = 0
        else:
            fail[dst] = table[fail[src], cls_]

    # --- match-set union along failure chains (CSR, own-first order) ---
    # lists[s] is a tuple of pattern ids: own pattern (longest) first, then
    # the failure chain's — i.e. decreasing pattern length, reproducing the
    # reference's intra-position ordering.
    lists: List[tuple] = [()] * S
    bfs_order = np.concatenate(states_by_level) if S > 1 else np.array([0])
    for s in bfs_order:
        base = lists[fail[s]] if s != 0 else ()
        lists[s] = ((int(own[s]),) + base) if own[s] >= 0 else base

    counts = np.fromiter((len(l) for l in lists), dtype=np.int64, count=S)

    # --- renumber: non-final states first, finals last (finality becomes a
    # compare on the device: state >= final_start) ---
    is_final = counts > 0
    perm = np.empty(S, dtype=np.int64)  # old id -> new id
    nonfinal_old = np.nonzero(~is_final)[0]
    final_old = np.nonzero(is_final)[0]
    perm[nonfinal_old] = np.arange(nonfinal_old.shape[0])
    perm[final_old] = nonfinal_old.shape[0] + np.arange(final_old.shape[0])
    final_start = int(nonfinal_old.shape[0])
    assert perm[0] == 0  # root is never final (empty patterns rejected)

    inv = np.empty(S, dtype=np.int64)  # new id -> old id
    inv[perm] = np.arange(S)
    table_new = perm[table[inv]]

    emit_start = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(counts[inv], out=emit_start[1:])
    emit_pats = np.fromiter(
        (p for old in inv for p in lists[old]),
        dtype=np.int64,
        count=int(emit_start[-1]),
    )

    dt = state_dtype(S, allow_int16)
    auto = CompiledAutomaton(
        table=table_new.astype(dt),
        byte_class=byte_class,
        emit_start=emit_start.astype(np.int64),
        emit_pats=emit_pats.astype(np.int32),
        pat_lens=pat_lens,
        state_depth=depth[inv].astype(np.int32),
        final_start=final_start,
        max_len=int(trie.max_len),
    )
    return auto


def empty_automaton() -> CompiledAutomaton:
    """Automaton of zero patterns (init with empty list is legal in the
    reference, ``tests/test3.phpt:12``): single root state, never matches."""
    return CompiledAutomaton(
        table=np.zeros((1, 1), dtype=np.int16),
        byte_class=np.zeros(256, dtype=np.int32),
        emit_start=np.zeros(2, dtype=np.int64),
        emit_pats=np.zeros(0, dtype=np.int32),
        pat_lens=np.zeros(0, dtype=np.int32),
        state_depth=np.zeros(1, dtype=np.int32),
        final_start=1,
        max_len=0,
    )
