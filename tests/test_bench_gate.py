"""Pins for bench.py's regression-flag predicate (no Spark needed).

The r13 verdict's "what's wrong" #1: the soft rule's absolute-delta
floor let a 2.34x normalized swing through unflagged (json_extract
0.53 -> 1.24 s, delta 0.71 s — 0.04 s under the 0.75 s floor). The hard
tier closes that class: >= 2x normalized flags regardless of the floor.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_soft_tier_requires_both_factor_and_floor():
    # 1.6x over allowance but only 0.3 s absolute: jitter band, no flag
    assert not bench._is_regression(t=0.8, prev_t=0.5, allowed=0.5)
    # 1.6x AND a whole-second delta: flagged
    assert bench._is_regression(t=8.0, prev_t=5.0, allowed=5.0)


def test_hard_tier_ignores_the_absolute_floor():
    # the r13 escape, replayed: 2.34x normalized, delta 0.71 s < floor —
    # the OLD rule absorbed it; the hard tier flags it
    assert bench._is_regression(t=1.24, prev_t=0.53, allowed=0.53)
    # exactly at the hard factor counts (>=)
    assert bench._is_regression(t=1.0, prev_t=0.5, allowed=0.5)
    # just under the hard factor with a sub-floor delta stays unflagged
    assert not bench._is_regression(t=0.99, prev_t=0.5, allowed=0.5)


def test_normalized_allowance_widens_the_soft_band_not_the_hard_rule():
    # a slower host raises `allowed` above prev_t; both tiers compare
    # against the allowance, so neither flags a pure host swing
    assert not bench._is_regression(t=1.1, prev_t=0.53, allowed=0.8)
    # but 2x of even the widened allowance still flags
    assert bench._is_regression(t=1.6, prev_t=0.53, allowed=0.8)


def test_constants_are_what_the_docs_claim():
    assert bench.REGRESSION_FACTOR == 1.5
    assert bench.REGRESSION_HARD_FACTOR == 2.0
    assert bench.REGRESSION_ABS_FLOOR_S == 0.75
