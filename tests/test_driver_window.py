"""The driver's oracle harness truncates the catalog to its first
``DRIVER_WINDOW`` entries (observed across CORRECTNESS_r01-r04). These tests
make the window membership a conscious decision: a re-ordering or a new
registration can never silently evict an entry that still needs its first
driver-green row, and no entry may sit parked so long its last driver-green
row goes stale.
"""

import glob
import json
import os
import re

from kamodo_dask_spark.queries import DRIVER_WINDOW, ORACLES, PARKED, QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: A parked entry's most recent driver-green row may be at most this many
#: rounds behind the latest recorded round (the VERDICT r4 rotation
#: contract: "no entry goes 3+ rounds without a fresh driver row").
MAX_PARKED_STALENESS = 2


def _rounds() -> dict[int, dict]:
    out = {}
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        with open(path) as f:
            out[int(m.group(1))] = json.load(f)
    return out


def _never_driver_green() -> list[str]:
    """Catalog entries with no GREEN row (hash_match and no err) in any
    recorded CORRECTNESS_r*.json — derived, not hardcoded, so entries added
    in any future round are protected automatically. A red row is not a
    check: an entry whose only driver row failed still needs its first
    green one. They MUST occupy positions < DRIVER_WINDOW."""
    green: set[str] = set()
    for doc in _rounds().values():
        for name, row in doc.items():
            if row.get("hash_match") is True and row.get("err") is None:
                green.add(name)
    return [n for n in QUERIES if n not in green]


#: Presence floor: entries awaiting their first driver row as of round 6
#: (this round's additions). The derived list above is computed FROM the
#: catalog, so it cannot notice an entry being deleted outright — this
#: hardcoded subset can. (Prune names once they have a recorded green round
#: AND a deliberate removal decision.)
ROUND6_PENDING: list[str] = [
    "bpe_token_counts",
    "substring_dedup",
    "dataset_profile",
    "doc_attributes",
    "filter_pipeline",
    "key_skew_profile",
    "bigram_logprob",
]

#: The round-6 window INTENT (see queries.py PARKED comment): the 37
#: entries parked in r5 (last driver row r4) are all back in-window, plus
#: the 9 keepers whose machinery/oracle changes this round.
ROUND6_UNPARKED_MUST_BE_IN_WINDOW = [
    # formerly-parked families, all back for fresh r6 rows
    "similarity_topk",
    "quantized_similarity_topk",
    "ann_ivf_topk",
    "lsh_ann_topk",
    "dedup_keep_first",
    "minhash_est_jaccard",
    "dedup_clusters",
    "cluster_representatives",
    "contamination",
    "text_quality",
    "language_id",
    "doc_fingerprints",
    "repetition_scores",
    "gopher_rules",
    "pii_redaction",
    "pii_redaction_strict",
    "doc_chunks",
    "vocabulary",
    "unigram_logprob",
    "bm25_search",
    "dataset_split",
    "stratified_sample",
    "mixture_sample",
    "sequence_packing",
    "multimodal_decode",
    "multimodal_resize",
    "video_frame_sample",
    "streaming_tumbling_1h",
    "streaming_sliding_30m",
    "streaming_dedup",
    "stream_static_enrich",
    "stream_stream_join",
    "rolling_1h_user",
    "salted_enrich_join",
    "skewed_event_counts",
    "interval_session_counts",
    "incremental_upsert",
    # r5-green keepers whose code/oracle changes in r6 — kept in-window for
    # a fresh driver signal on the changed machinery
    "url_dedup",
    "html_extract",
    # interp_1d: r5-green keeper, parked mid-round (as-of machinery
    # unchanged) to free a slot for filter_pipeline; interp_4d likewise
    # unpinned for key_skew_profile (driver smoke-checks it via entry())
    # interp_4d_corner unpinned late in r6 for bigram_logprob (gate
    # refactor semantics-preserving; strict local parity still covers it)
    # dedup_exact_groups: initially a keeper for the r5 re-measure ask;
    # parked once the re-measure closed as host noise (SCALE.md), freeing
    # its window slot for dataset_profile
    "sessionization",
    "streaming_interp",
    # asof_purchase_view: r5-green keeper, parked mid-round (operator
    # unchanged) to free a slot for doc_attributes
]


def test_round6_pending_entries_still_registered():
    missing = [n for n in ROUND6_PENDING if n not in QUERIES]
    assert not missing, f"pending entries vanished from the catalog: {missing}"


def test_round6_window_membership():
    order = list(QUERIES)
    window = set(order[:DRIVER_WINDOW])
    missing = [
        n
        for n in ROUND6_UNPARKED_MUST_BE_IN_WINDOW + ROUND6_PENDING
        if n not in window
    ]
    assert not missing, f"intended r6 window members fell outside: {missing}"


def test_never_checked_entries_inside_window():
    order = list(QUERIES)
    for name in _never_driver_green():
        pos = order.index(name)
        assert pos < DRIVER_WINDOW, (
            f"{name} at position {pos} — outside the driver's "
            f"{DRIVER_WINDOW}-row window, it will never get a driver row"
        )


def test_only_parked_entries_outside_window():
    """Anything past the window must be there deliberately (in PARKED)."""
    order = list(QUERIES)
    outside = order[DRIVER_WINDOW:]
    stray = [n for n in outside if n not in PARKED]
    assert not stray, f"entries evicted from the driver window unintentionally: {stray}"


def test_parked_entries_recently_green():
    """Only entries with a RECENT driver-green row may be parked: the most
    recent green row must be within MAX_PARKED_STALENESS rounds of the
    latest recorded round — the rotation contract that prevents any entry
    drifting for 3+ rounds without a fresh driver check."""
    rounds = _rounds()
    if not rounds:  # fresh checkout without driver artifacts
        return
    latest = max(rounds)
    for name in PARKED:
        green_rounds = [
            n
            for n, doc in rounds.items()
            if doc.get(name, {}).get("hash_match") is True
            and doc.get(name, {}).get("err") is None
        ]
        assert green_rounds, f"parked {name} has no driver-green row at all"
        staleness = latest - max(green_rounds)
        assert staleness <= MAX_PARKED_STALENESS, (
            f"parked {name}: last green round r{max(green_rounds)} is "
            f"{staleness} rounds behind r{latest} — rotate it back in"
        )


def test_every_entry_has_an_oracle_or_is_known_weak():
    """Omitting an oracle downgrades the driver check to rows-only — keep
    the list of such entries explicit and empty."""
    no_oracle = [n for n in QUERIES if n not in ORACLES]
    assert no_oracle == [], f"entries without a DuckDB oracle: {no_oracle}"


def test_compute_parked_policy():
    """The mechanical rotation: never-green + pinned always in-window,
    remaining slots most-stale-first, loud overflow failures."""
    import pytest

    from kamodo_dask_spark import queries as q

    order = [f"e{i}" for i in range(8)]
    # window of 4 (simulate by temporarily shrinking)
    old = q.DRIVER_WINDOW
    q.DRIVER_WINDOW = 4
    try:
        # e0 never green; e1 pinned (green r5); others green r3..r5
        green = {"e1": 5, "e2": 3, "e3": 4, "e4": 5, "e5": 3, "e6": 4, "e7": 5}
        parked = q._compute_parked(order, 5, green, ["e1"])
        window = [n for n in order if n not in parked]
        assert "e0" in window and "e1" in window
        # two free slots go to the stalest greens: e2 (r3) then e5 (r3)
        assert window == ["e0", "e1", "e2", "e5"]
        # fresh checkout: no artifacts -> first N stay in-window
        assert q._compute_parked(order, None, {}, []) == order[4:]
        # overflow: 5 never-green entries cannot fit a 4-row window
        with pytest.raises(RuntimeError, match="exceed"):
            q._compute_parked(order, 5, {n: 5 for n in order[5:]}, [])
        # staleness ceiling: parking an entry already at staleness 2 raises
        green_all = {n: 5 for n in order}
        green_all["e7"] = 3  # stale but squeezed out by pins
        with pytest.raises(RuntimeError, match="staleness"):
            q._compute_parked(order, 5, green_all, ["e0", "e1", "e2", "e3"])
    finally:
        q.DRIVER_WINDOW = old


def test_auto_rotation_matches_r6_intent():
    """With the committed r1-r5 artifacts, the mechanical policy must
    reproduce the round-6 hand rotation: every r4-green formerly-parked
    entry in-window, pins in-window, never-green entries in-window."""
    from kamodo_dask_spark.queries import DRIVER_WINDOW, PINNED_THIS_ROUND, QUERIES

    window = set(list(QUERIES)[:DRIVER_WINDOW])
    for n in PINNED_THIS_ROUND:
        assert n in window, n
