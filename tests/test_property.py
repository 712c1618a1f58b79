"""Property-based tests (hypothesis): the interpolation kernel and the
relational corner-join agree on arbitrary grids/points, and salted joins are
equivalent to plain joins."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from kamodo_dask_spark.grid.interpolate import nlinear_interp
from kamodo_dask_spark.operators.skew import salted_join, two_phase_agg


def sorted_axis(min_size=2, max_size=6):
    return (
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=min_size,
            max_size=max_size,
            unique=True,
        )
        .map(sorted)
        .map(np.array)
    )


@given(
    ax=sorted_axis(),
    vals_seed=st.integers(0, 2**32 - 1),
    pts_seed=st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_nlinear_1d_properties(ax, vals_seed, pts_seed):
    rng = np.random.default_rng(vals_seed)
    vals = rng.uniform(-10, 10, len(ax))
    prng = np.random.default_rng(pts_seed)
    pts = prng.uniform(ax[0], ax[-1], (20, 1))
    out = nlinear_interp([ax], vals, pts, fill_value=np.nan)
    # in-bounds points never get fill
    assert not np.isnan(out).any()
    # interpolation is bounded by the bracketing node values
    for x, y in zip(pts[:, 0], out):
        i = np.clip(np.searchsorted(ax, x, side="right") - 1, 0, len(ax) - 2)
        lo, hi = sorted((vals[i], vals[i + 1]))
        assert lo - 1e-9 <= y <= hi + 1e-9
    # exact on nodes
    node_out = nlinear_interp([ax], vals, ax.reshape(-1, 1), fill_value=np.nan)
    np.testing.assert_allclose(node_out, vals, rtol=1e-12)


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_nlinear_nd_matches_separable(seed):
    """On a multilinear (separable, degree-1-per-axis) function the
    interpolant must reproduce the function everywhere in the hull."""
    rng = np.random.default_rng(seed)
    d = rng.integers(1, 4)
    axes = [np.sort(rng.uniform(-5, 5, rng.integers(2, 5))) for _ in range(d)]
    while any(len(np.unique(a)) < len(a) for a in axes):
        axes = [np.sort(rng.uniform(-5, 5, rng.integers(2, 5))) for _ in range(d)]
    coefs = rng.uniform(-2, 2, d + 1)

    def f(*coords):
        return coefs[0] + sum(c * x for c, x in zip(coefs[1:], coords))

    mesh = np.meshgrid(*axes, indexing="ij")
    vals = f(*mesh)
    pts = np.column_stack([rng.uniform(a[0], a[-1], 30) for a in axes])
    out = nlinear_interp(axes, vals, pts, fill_value=np.nan)
    expected = f(*[pts[:, k] for k in range(d)])
    np.testing.assert_allclose(out, expected, rtol=1e-9, atol=1e-9)


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=8, deadline=None)
def test_jaccard_pairs_match_bruteforce(spark, seed):
    """jaccard_pairs (group-join inverted index) vs a direct python
    computation of shingle-set Jaccard on random word-soup docs."""
    from itertools import combinations

    from kamodo_dask_spark.operators.dedup import jaccard_pairs

    rng = np.random.default_rng(seed)
    vocab = ["a", "b", "c", "d", "e"]
    docs = []
    for i in range(rng.integers(2, 10)):
        n_words = rng.integers(0, 12)
        docs.append((i, " ".join(rng.choice(vocab, n_words))))

    def sh(text, n=3):
        ws = [w for w in text.lower().split() if w]
        if len(ws) <= n:
            # mirrors the operator: short docs yield one (possibly empty) gram
            return {" ".join(ws)}
        return set(" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1))

    expected = {}
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        sa, sb = sh(ta), sh(tb)
        common = len(sa & sb)
        if common == 0:
            continue
        j = round(common / (len(sa) + len(sb) - common), 6)
        if j >= 0.3:
            expected[(min(ia, ib), max(ia, ib))] = j

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, threshold=0.3).collect()
    }
    assert got == pytest.approx(expected)


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(300)], "k int, v double"
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")
    plain = fact.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(fact, dim, on="k", salts=8).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_equals_plain_agg(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i % 5, float(i)) for i in range(1000)], "k int, v double")
    plain = {r["k"]: (r["s"], r["n"]) for r in df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("*").alias("n")).collect()}
    two = {r["k"]: (r["v"], r["n"]) for r in two_phase_agg(
        df, "k", {"v": "sum", "n": "count"}, salts=8).collect()}
    for k in plain:
        assert two[k][0] == pytest.approx(plain[k][0])
        assert two[k][1] == plain[k][1]


def test_salt_is_deterministic_and_spreads_hot_key(spark):
    """The salt is a content hash, not rand(): two materializations assign
    every row the SAME salt (task-retry determinism), and a heavy-hitter
    key's rows still spread across many salt values."""
    from pyspark.sql import functions as F

    from kamodo_dask_spark.operators.skew import _row_salt

    df = spark.createDataFrame(
        [(0, float(i)) for i in range(500)] + [(k, 0.0) for k in range(1, 5)],
        "k int, v double",
    )
    salted = df.withColumn("_salt", _row_salt(df, ["k"], 8))
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, salted.repartition(7).collect()))
    assert a == b  # same salt per row regardless of physical layout/retries
    hot = {s for (k, v, s) in a if k == 0}
    assert len(hot) == 8  # the hot key uses every salt bucket


def test_two_phase_agg_run_to_run_identical(spark):
    """Determinism convention: repeated runs produce IDENTICAL results —
    the salt fixes each row's partial group. Integer-valued doubles keep the
    sums exact, so equality is order-independent and the assertion pins the
    salt assignment, not float addition order."""
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(3000)], "k int, v double"
    )
    spec = {"v": "sum", "n": "count", "lo": ("min", "v"), "hi": ("max", "v")}
    runs = [
        sorted(map(tuple, two_phase_agg(df, "k", spec, salts=8).collect()))
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


def test_units_roundtrip_through_sink(spark, tmp_path):
    from pyspark.sql import functions as F
    from kamodo_dask_spark.grid.model import normalize_measure_columns, units_of
    from kamodo_dask_spark.sources.sinks import write_grid_with_units

    df = spark.createDataFrame([(1.0, 2.0)], ["lon", "rho[kg/m^3]"])
    normalized = normalize_measure_columns(df)
    out = str(tmp_path / "units_grid")
    write_grid_with_units(normalized, out)
    back = spark.read.parquet(out)
    assert set(back.columns) == {"lon", "rho[kg/m^3]"}  # spelling restored
    renorm = normalize_measure_columns(back)
    assert units_of(renorm, "rho") == "kg/m^3"  # and parses back


@given(
    seed=st.integers(0, 2**32 - 1),
    bucket_width=st.sampled_from([0.25, 1.0, 3.0, 7.5, 40.0, 1000.0]),
)
@settings(max_examples=12, deadline=None)
def test_interval_join_invariant_to_bucket_width(spark, seed, bucket_width):
    """interval_join results depend only on the data, never on bucket_width
    (widths far below and far above the interval lengths included) — the
    bucketing is an execution strategy, not a semantic knob."""
    from kamodo_dask_spark.operators.rangejoin import interval_join

    rng = np.random.default_rng(seed)
    pts = [(int(i), float(x)) for i, x in enumerate(rng.uniform(-20, 20, 12))]
    starts = rng.uniform(-20, 20, 6)
    ivs = [
        (int(j), float(s), float(s + w))
        for j, (s, w) in enumerate(zip(starts, rng.uniform(0, 8, 6)))
    ]
    p = spark.createDataFrame(pts, "pid int, x double")
    i = spark.createDataFrame(ivs, "iid int, s double, e double")
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(p, i, "x", "s", "e", bucket_width=bucket_width).collect()
    }
    expected = {
        (pid, iid) for pid, x in pts for iid, s, e in ivs if s <= x <= e
    }
    assert got == expected


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=10, deadline=None)
def test_interval_left_join_matches_bruteforce(spark, seed):
    """how='left' against a python brute force, with keyed groups and NULL
    payload values in the mix: unmatched points appear exactly once with
    their keys intact and NULL interval columns; matched points appear once
    per covering interval (the r4 review fixes — key-overwrite and the
    non-null-safe anti-join re-emitting NULL-bearing rows — stay fixed)."""
    from kamodo_dask_spark.operators.rangejoin import interval_join

    rng = np.random.default_rng(seed)
    n_pts, n_ivs = 10, 5
    pts = [
        (
            int(i),
            ["g1", "g2"][int(rng.integers(2))],
            float(np.round(rng.uniform(-10, 10), 3)),
            None if rng.random() < 0.3 else f"t{i}",
        )
        for i in range(n_pts)
    ]
    ivs = [
        (
            int(j),
            ["g1", "g2"][int(rng.integers(2))],
            float(np.round(s, 3)),
            float(np.round(s + rng.uniform(0, 6), 3)),
        )
        for j, s in enumerate(rng.uniform(-10, 10, n_ivs))
    ]
    p = spark.createDataFrame(pts, "pid int, grp string, x double, tag string")
    i = spark.createDataFrame(ivs, "iid int, grp string, s double, e double")
    got = sorted(
        (r["pid"], r["grp"], r["tag"], r["iid"])
        for r in interval_join(
            p, i, "x", "s", "e", on="grp", bucket_width=3.0, how="left"
        ).collect()
    )
    expected = []
    for pid, grp, x, tag in pts:
        matches = [iid for iid, g2, s, e in ivs if g2 == grp and s <= x <= e]
        if matches:
            expected.extend((pid, grp, tag, iid) for iid in matches)
        else:
            expected.append((pid, grp, tag, None))
    assert got == sorted(expected)


@given(seed=st.integers(0, 2**31 - 1), max_df=st.integers(1, 4))
@settings(max_examples=8, deadline=None)
def test_line_dedup_matches_python_oracle(spark, seed, max_df):
    """line_dedup ≡ a pure-python reference on random corpora: same
    surviving docs, same line order, same counts."""
    import numpy as np

    from kamodo_dask_spark.operators.dedup import line_dedup

    rng = np.random.default_rng(seed)
    vocab = [f"line{i}" for i in range(6)]
    docs = {
        did: [vocab[v] for v in rng.integers(0, len(vocab), rng.integers(1, 8))]
        for did in range(12)
    }

    # python oracle
    from collections import defaultdict

    df_count = defaultdict(set)
    for did, lines in docs.items():
        for ln in set(lines):
            df_count[ln].add(did)
    boiler = {ln for ln, ds in df_count.items() if len(ds) > max_df}
    expected = {}
    for did, lines in docs.items():
        kept = [ln for ln in lines if ln not in boiler]
        if kept:
            expected[did] = ("\n".join(kept), len(kept))

    sdf = spark.createDataFrame(
        [(did, "\n".join(lines)) for did, lines in docs.items()],
        "doc_id long, text string",
    ).repartition(4)
    got = {
        r["doc_id"]: (r["text"], r["n_lines"])
        for r in line_dedup(sdf, max_doc_frequency=max_df).collect()
    }
    assert got == expected


@given(seed=st.integers(0, 2**31 - 1), L=st.integers(1, 12), off=st.integers(0, 11))
@settings(max_examples=10, deadline=None)
def test_chunk_documents_matches_python_oracle(spark, seed, L, off):
    """chunk_documents ≡ a pure-python windower on random corpora for any
    (max_tokens, stride) combination, including empty and sub-window docs."""
    import numpy as np

    from kamodo_dask_spark.operators.text import chunk_documents

    S = max(1, min(L, off))
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(20):
        n = int(rng.integers(0, 40))
        docs.append((i, " ".join(f"t{rng.integers(0, 9)}" for _ in range(n))))

    def oracle(text):
        ws = [w for w in text.lower().split() if w]
        n = len(ws)
        extra = max(0, -(-(n - L) // S)) if n > L else 0
        out = []
        for ci in range(1 + extra):
            piece = ws[ci * S : ci * S + L]
            out.append((ci, len(piece), " ".join(piece)))
        return out

    expected = {
        (i, ci): (nt, txt) for i, t in docs for ci, nt, txt in oracle(t)
    }
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_index"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(sdf, max_tokens=L, stride=S).collect()
    }
    assert got == expected


def test_key_only_relation_still_spreads_hot_key(spark):
    """Degenerate case: a relation with ONLY the key column must not give
    every row of the hot key one salt (that would rebuild the hot
    partition) — the positional fallback spreads them."""
    from pyspark.sql import functions as F

    from kamodo_dask_spark.operators.skew import _row_salt, two_phase_agg

    df = spark.range(0, 2000, 1, 8).select((F.col("id") % 2).cast("int").alias("k"))
    salted = df.withColumn("_salt", _row_salt(df, ["k"], 8))
    per_key = {
        r["k"]: r["n"]
        for r in salted.groupBy("k").agg(
            F.countDistinct("_salt").alias("n")).collect()
    }
    assert per_key[0] == 8 and per_key[1] == 8
    counts = {r["k"]: r["n"] for r in two_phase_agg(
        df, "k", {"n": "count"}, salts=8).collect()}
    assert counts == {0: 1000, 1: 1000}


@given(
    seed=st.integers(0, 2**32 - 1),
    seq_len=st.integers(1, 64),
    n_shards=st.integers(1, 6),
)
@settings(max_examples=12, deadline=None)
def test_pack_sequences_matches_python_oracle(spark, seed, seq_len, n_shards):
    """Arbitrary token counts / seq_len / shard counts: the distributed
    layout equals a sequential python recomputation of the md5-sharded
    concat-and-chunk packing (offsets gapless per shard, spans exact)."""
    import hashlib

    from kamodo_dask_spark.operators.sampling import pack_sequences

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 80))
    counts = rng.integers(0, 5 * seq_len, n)
    rows = [(int(i), int(c)) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_sequences(df, "doc_id", "n_tok", seq_len=seq_len, n_shards=n_shards)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}

    def md5(k):
        return hashlib.md5(str(k).encode()).hexdigest()

    per_shard: dict[int, list[int]] = {}
    for doc_id, n_tok in rows:
        if n_tok > 0:
            per_shard.setdefault(int(md5(doc_id)[:8], 16) % n_shards, []).append(doc_id)
    expected = {}
    for shard, ids in per_shard.items():
        off = 0
        for doc_id in sorted(ids, key=lambda d: (md5(d), d)):
            n_tok = dict(rows)[doc_id]
            expected[doc_id] = {
                "doc_id": doc_id,
                "shard": shard,
                "n_tokens": n_tok,
                "token_offset": off,
                "first_seq": off // seq_len,
                "last_seq": (off + n_tok - 1) // seq_len,
            }
            off += n_tok
    assert got == expected


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=10, deadline=None)
def test_funnel_matches_bruteforce(spark, seed):
    """funnel() against a python greedy reference over random event
    streams: per-user chain times, NULL propagation after a break, and the
    window bound all agree — including duplicate timestamps (strict >) and
    users missing step 1 entirely."""
    import datetime as dt

    from kamodo_dask_spark.operators.funnel import funnel

    rng = np.random.default_rng(seed)
    steps = ["a", "b", "c"]
    types = ["a", "b", "c", "x"]
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for _ in range(rng.integers(5, 60)):
        rows.append(
            (
                int(rng.integers(0, 6)),
                t0 + dt.timedelta(seconds=int(rng.integers(0, 50))),
                types[int(rng.integers(0, len(types)))],
            )
        )
    window_us = int(rng.integers(1, 40)) * 1_000_000
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"], r["converted"])
        for r in funnel(df, steps, window_us=window_us).collect()
    }

    expected = {}
    us = {
        u: sorted(
            (int(ts.timestamp() * 1_000_000), ty)
            for uu, ts, ty in rows
            if uu == u
        )
        for u in {r[0] for r in rows}
    }
    for u, evs in us.items():
        chain = []
        bound = None
        for step in steps:
            nxt = min(
                (t for t, ty in evs if ty == step and (bound is None or t > bound)),
                default=None,
            )
            chain.append(nxt)
            if nxt is None:
                break
            bound = nxt
        if chain[0] is None:
            continue
        chain += [None] * (len(steps) - len(chain))
        converted = chain[-1] is not None and chain[-1] - chain[0] <= window_us
        expected[u] = (chain[0], chain[1], chain[2], converted)
    assert got == expected


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=8, deadline=None)
def test_link_records_matches_bruteforce(spark, seed):
    """link_records against a python reference: for every right record the
    reference computes Jaccard against ALL left records (no blocking) and
    keeps the best >= threshold; the operator must agree whenever the true
    best match shares at least one kept bigram (blocking completeness on
    these small vocabularies), and must never emit a pair a full scan would
    reject."""
    from kamodo_dask_spark.operators.linkage import link_records

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]

    def name():
        k = int(rng.integers(2, 5))
        return " ".join(vocab[int(rng.integers(0, len(vocab)))] for _ in range(k))

    left = [(i, name()) for i in range(10)]
    right = [(100 + i, name()) for i in range(10)]
    ldf = spark.createDataFrame(left, "lid long, name string")
    rdf = spark.createDataFrame(right, "rid long, name string")
    thr = 0.34
    got = {
        r["rid"]: (r["lid"], r["jaccard"])
        for r in link_records(
            ldf, rdf, "lid", "rid", threshold=thr, max_block=10_000
        ).collect()
    }

    def toks(s):
        return set(s.split())

    def bigrams(s):
        ws = s.split()
        return {f"{a} {b}" for a, b in zip(ws, ws[1:])}

    for rid, rname in right:
        best = None
        for lid, lname in left:
            sh = len(toks(lname) & toks(rname))
            if sh == 0:
                continue
            j = round(sh / (len(toks(lname)) + len(toks(rname)) - sh), 6)
            if j >= thr and (best is None or (j, -lid) > (best[1], -best[0])):
                best = (lid, j)
        if best is not None and bigrams(right[rid - 100][1]) & bigrams(
            dict(left)[best[0]]
        ):
            assert got.get(rid) == (best[0], best[1]), (rid, best, got.get(rid))
        # soundness: anything emitted must be >= threshold under full scan
        if rid in got:
            lid, j = got[rid]
            sh = len(toks(dict(left)[lid]) & toks(rname))
            jj = round(
                sh / (len(toks(dict(left)[lid])) + len(toks(rname)) - sh), 6
            )
            assert jj == j and jj >= thr


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=8, deadline=None)
def test_triangle_counts_match_bruteforce(spark, seed):
    """Random graphs: the degree-oriented plan's per-node counts equal a
    brute-force enumeration over all C(n,3) triples."""
    import itertools

    from kamodo_dask_spark.operators.graph import triangle_counts

    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 12))
    # random edge set incl. duplicates and reversed duplicates
    m = int(rng.integers(3, 25))
    edges = [
        (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)
    ]
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not und:
        return
    nodes = {v for e in und for v in e}
    want = dict.fromkeys(nodes, 0)
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            want[a] += 1
            want[b] += 1
            want[c] += 1
    df = spark.createDataFrame(edges, "src long, dst long").filter(
        "src <> dst"
    )
    got = {
        r["node"]: r["triangles"] for r in triangle_counts(df).collect()
    }
    assert got == want


@given(seed=st.integers(0, 2**32 - 1), k=st.integers(0, 4))
@settings(max_examples=8, deadline=None)
def test_k_hop_matches_bfs_reference(spark, seed, k):
    """Random graphs: min-hop distances equal a reference BFS, directed
    and undirected."""
    from collections import deque

    from kamodo_dask_spark.operators.graph import k_hop_reachability

    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 10))
    m = int(rng.integers(2, 20))
    edges = [
        (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)
    ]
    seeds = sorted({int(rng.integers(0, n)) for _ in range(2)})

    for directed in (False, True):
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            if not directed:
                adj.setdefault(b, set()).add(a)
        want = {s: 0 for s in seeds}
        dq = deque(seeds)
        while dq:
            u = dq.popleft()
            if want[u] >= k:
                continue
            for v in adj.get(u, ()):
                if v not in want:
                    want[v] = want[u] + 1
                    dq.append(v)
        got = {
            r["node"]: r["hop"]
            for r in k_hop_reachability(
                spark.createDataFrame(edges, "src long, dst long"),
                spark.createDataFrame([(s,) for s in seeds], "node long"),
                k=k,
                directed=directed,
            ).collect()
        }
        assert got == want, (directed, edges, seeds)


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=8, deadline=None)
def test_prefix_jaccard_join_matches_brute_force(spark, seed):
    """Random small corpora over a tiny vocabulary: the prefix-filtered
    exact join returns EXACTLY the brute-force all-pairs J >= t set —
    a completeness proof of the prefix-filter theorem + length filter,
    across thresholds."""
    from kamodo_dask_spark.operators.dedup import prefix_jaccard_join

    rng = np.random.default_rng(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    n_docs = int(rng.integers(4, 12))
    texts = []
    for _ in range(n_docs):
        n_w = int(rng.integers(0, 8))
        texts.append(" ".join(vocab[int(rng.integers(0, 5))] for _ in range(n_w)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def gram_set(t, n=3):
        ws = t.lower().split()
        if not ws:
            return {""}
        m = max(len(ws) - (n - 1), 1)
        return {" ".join(ws[i:i + n]) for i in range(m)}

    sets = [gram_set(t) for t in texts]
    for t in (0.34, 0.6, 0.9, 1.0):
        want = set()
        for i in range(n_docs):
            for j in range(i + 1, n_docs):
                inter = len(sets[i] & sets[j])
                jac = inter / (len(sets[i]) + len(sets[j]) - inter)
                # threshold on the UNROUNDED ratio (the contract the
                # prefix filter can actually guarantee); rounded output
                if jac >= t:
                    want.add((i, j, round(jac, 6)))
        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in prefix_jaccard_join(df, threshold=t).collect()
        }
        assert got == want, (t, texts)


def test_prefix_jaccard_join_output_invariant_to_df_saturation(spark):
    """r14 packing: the (df, h) token order rides one packed int64 with
    df SATURATED at ``_DF_PACK_CAP``. Forcing the cap to 1 collapses the
    order to hash-only (every df saturates) — the candidate set changes,
    but the exact verify must keep the OUTPUT identical to brute force,
    which is the property that makes the packed order safe."""
    from kamodo_dask_spark.operators import dedup

    texts = [
        "aa bb cc aa bb cc",  # aa/bb/cc are corpus-wide stop shingles
        "aa bb cc aa bb dd",
        "aa bb cc",
        "ee ee ee",
        "aa bb cc aa bb cc",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def gram_set(t, n=3):
        ws = t.lower().split()
        if not ws:
            return {""}
        m = max(len(ws) - (n - 1), 1)
        return {" ".join(ws[i:i + n]) for i in range(m)}

    sets = [gram_set(t) for t in texts]
    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            jac = inter / (len(sets[i]) + len(sets[j]) - inter)
            if jac >= 0.5:
                want.add((i, j, round(jac, 6)))
    old_cap = dedup._DF_PACK_CAP
    dedup._DF_PACK_CAP = 1
    try:
        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in dedup.prefix_jaccard_join(df, threshold=0.5).collect()
        }
    finally:
        dedup._DF_PACK_CAP = old_cap
    assert got == want, texts


@given(seed=st.integers(0, 2**32 - 1), hops=st.integers(0, 4))
@settings(max_examples=8, deadline=None)
def test_weighted_sssp_matches_bellman_ford(spark, seed, hops):
    """Random weighted graphs: bounded-hop min-cost distances equal a
    reference Bellman–Ford (relax-all per round), directed and
    undirected, with parallel edges."""
    from kamodo_dask_spark.operators.graph import weighted_sssp

    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 9))
    m = int(rng.integers(2, 18))
    edges = [
        (int(rng.integers(0, n)), int(rng.integers(0, n)),
         int(rng.integers(1, 10)))
        for _ in range(m)
    ]
    seeds = sorted({int(rng.integers(0, n)) for _ in range(2)})

    for directed in (False, True):
        rel = [e for e in edges if e[0] != e[1]]
        if not directed:
            rel = rel + [(b, a, w) for a, b, w in rel]
        want = {s: 0 for s in seeds}
        for _ in range(hops):
            nxt = dict(want)
            for a, b, w in rel:
                if a in want and want[a] + w < nxt.get(b, 1 << 60):
                    nxt[b] = want[a] + w
            want = nxt
        got = {
            r["node"]: r["dist"]
            for r in weighted_sssp(
                spark.createDataFrame(edges, "src long, dst long, weight long"),
                spark.createDataFrame([(s,) for s in seeds], "node long"),
                max_hops=hops,
                directed=directed,
            ).collect()
        }
        assert got == want, (directed, hops, edges, seeds)


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=8, deadline=None)
def test_merge_agg_view_equals_full_recompute(spark, seed):
    """Random base/delta splits with NULL keys and NULL measures: the
    incremental merge equals the from-scratch aggregation."""
    from pyspark.sql import functions as F

    from kamodo_dask_spark.operators.maintenance import merge_agg_view

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 40))
    rows = []
    for _ in range(n):
        g = ["a", "b", "c", None][int(rng.integers(0, 4))]
        x = None if rng.random() < 0.15 else int(rng.integers(-50, 50))
        rows.append((g, x))
    df = spark.createDataFrame(rows, "g string, x long")
    # deterministic complement split on the value (id-based splits are
    # unstable across re-evaluation; rand() would resample per scan)
    base = df.filter(F.coalesce(F.col("x"), F.lit(7)) % 3 != 0)
    delta = df.filter(F.coalesce(F.col("x"), F.lit(7)) % 3 == 0)

    def agg(d):
        return d.groupBy("g").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").alias("sx"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )

    out = merge_agg_view(
        agg(base), delta, ["g"],
        counts=["n"], sums={"sx": "x"}, mins={"mn": "x"}, maxs={"mx": "x"},
    )
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in agg(df).collect()
    }


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=8, deadline=None)
def test_merge_agg_view_retract_equals_full_recompute(spark, seed):
    """Random retract/insert deltas (incl. NULL keys, whole-key
    retractions): the signed merge equals aggregating the net row
    multiset from scratch, with vanished keys absent."""
    from pyspark.sql import functions as F

    from kamodo_dask_spark.operators.maintenance import (
        merge_agg_view_retract,
    )

    rng = np.random.default_rng(seed)

    def val():
        return None if rng.random() < 0.2 else int(rng.integers(-50, 50))

    n = int(rng.integers(2, 40))
    rows = [
        (["a", "b", "c", None][int(rng.integers(0, 4))], val())
        for _ in range(n)
    ]
    df = spark.createDataFrame(rows, "g string, x long")
    # retract a deterministic subset of base rows (incl. NULL-measure
    # rows), insert a fresh batch
    dels = df.filter(F.coalesce(F.col("x"), F.lit(9)) % 3 == 0)
    ins_rows = [
        (["a", "d", None][int(rng.integers(0, 3))], val())
        for _ in range(int(rng.integers(0, 10)))
    ]
    ins = spark.createDataFrame(ins_rows, "g string, x long")

    def agg(d):
        return d.groupBy("g").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").alias("sx"),
            F.count("x").cast("bigint").alias("nx"),
        )

    delta = dels.withColumn("s", F.lit(-1)).unionByName(
        ins.withColumn("s", F.lit(1))
    )
    out = merge_agg_view_retract(
        agg(df), delta, ["g"], "s", counts=["n"], sums={"sx": "x"},
        sum_nonnull_counts={"sx": "nx"},
    )
    net = df.exceptAll(dels).unionByName(ins)
    cols = ["g", "n", "sx", "nx"]
    assert {tuple(r) for r in out.select(*cols).collect()} == {
        tuple(r) for r in agg(net).select(*cols).collect()
    }


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=6, deadline=None)
def test_connected_components_star_matches_union_find(spark, seed):
    """Random multigraphs (dup edges, self-loops, isolated self-pairs)
    against a Python union-find GROUND TRUTH — stronger than star ≡
    hashmin (which could agree on a shared bug): both algorithms must
    produce exactly the union-find components with min-vertex labels."""
    from kamodo_dask_spark.operators.dedup import connected_components

    rng = np.random.default_rng(seed)
    n_nodes = int(rng.integers(2, 60))
    n_edges = int(rng.integers(1, 80))
    edges = [
        (int(rng.integers(0, n_nodes)), int(rng.integers(0, n_nodes)))
        for _ in range(n_edges)
    ]

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    verts = {v for e in edges for v in e}
    want = {}
    for v in verts:
        root = find(v)
        comp = min(u for u in verts if find(u) == root)
        want[v] = comp

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    for alg in ("star", "hashmin"):
        got = {
            r["vertex"]: r["component"]
            for r in connected_components(df, algorithm=alg).collect()
        }
        assert got == want, (alg, seed)


@given(seed=st.integers(0, 2**32 - 1))
@settings(max_examples=6, deadline=None)
def test_retract_minmax_equals_full_recompute(spark, seed):
    """Random retract/insert deltas against the min/max hybrid: the
    touched-key rescan + stored-state passthrough equals aggregating
    the net row multiset from scratch (incl. NULL keys, extremum
    retractions, whole-group vanishes, and brand-new keys)."""
    from pyspark.sql import functions as F

    from kamodo_dask_spark.operators.maintenance import (
        merge_agg_view_retract_minmax,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 40))
    rows = [
        (
            ["a", "b", "c", None][int(rng.integers(0, 4))],
            int(rng.integers(-50, 50)),
        )
        for _ in range(n)
    ]
    df = spark.createDataFrame(rows, "g string, x long")
    dels = df.filter(F.col("x") % 3 == 0)
    ins_rows = [
        (["a", "d", None][int(rng.integers(0, 3))], int(rng.integers(-50, 50)))
        for _ in range(int(rng.integers(0, 10)))
    ]
    ins = spark.createDataFrame(ins_rows, "g string, x long")
    net = df.exceptAll(dels).unionByName(ins)

    def agg(d):
        return d.groupBy("g").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").alias("sx"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )

    delta = dels.withColumn("s", F.lit(-1)).unionByName(
        ins.withColumn("s", F.lit(1))
    )
    out = merge_agg_view_retract_minmax(
        agg(df), delta, net, ["g"], "s",
        counts=["n"], sums={"sx": "x"}, mins={"mn": "x"}, maxs={"mx": "x"},
    )
    cols = ["g", "n", "sx", "mn", "mx"]
    assert {tuple(r) for r in out.select(*cols).collect()} == {
        tuple(r) for r in agg(net).select(*cols).collect()
    }
