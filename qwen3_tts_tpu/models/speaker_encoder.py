"""ECAPA-TDNN speaker encoder — implemented in a later milestone."""
