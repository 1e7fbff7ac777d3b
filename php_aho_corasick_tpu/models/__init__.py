"""Automaton models (device-side representations of the compiled DFA)."""

from .dense_dfa import DenseDfaModel

__all__ = ["DenseDfaModel"]
