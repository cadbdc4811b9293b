"""Shared fixed-point / timestamp constants for the mining_* modules
(split from the original single mining.py in r11 — VERDICT r10 #7).

_EV_CENTS: the events.value money column as exact BIGINT cents — every
mining query that sums money routes through this expression so engine
float-summation order can never flip an oracle hash.
_CUPED_SPLIT: the fixed pre/post experiment cutover timestamp shared by
the CUPED / paired-conversion / attribution queries.
"""

from __future__ import annotations

_CUPED_SPLIT = "2024-01-15 00:00:00"
_EV_CENTS = "CAST(round(value * 100, 0) AS BIGINT)"
