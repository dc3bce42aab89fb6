"""Property-based tests (hypothesis) for the operators with hand-rolled
distributed implementations.

The oracle tests pin these operators to fixed fixtures; properties pin
them to their *semantics* on adversarial inputs — duplicate timestamps,
empty sides, single-user floods — where a window-frame or tie-break bug
would hide from a fixture.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.layout import salted_join

_TS0 = dt.datetime(2024, 1, 1)

# (user_id, minutes offset, is_purchase) — small domains force collisions
_event = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=30),
    st.booleans(),
)


def _asof_spark(spark, events):
    """The engine's as-of strategy (union + window carry-forward),
    built over an arbitrary in-memory event list."""
    rows = [
        (i, u, _TS0 + dt.timedelta(minutes=m), bool(p))
        for i, (u, m, p) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, is_purchase boolean"
    )
    purchases = (
        df.filter("is_purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    clicks = df.filter("NOT is_purchase").select("event_id", "user_id", "ts")

    p = purchases.select(
        F.lit(None).cast("long").alias("event_id"),
        "ts",
        "user_id",
        "purchase_event_id",
        F.lit(1).alias("is_p"),
    )
    c = clicks.select(
        "event_id",
        "ts",
        "user_id",
        F.lit(None).cast("long").alias("purchase_event_id"),
        F.lit(0).alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(),
            F.col("is_p").desc(),
            F.col("purchase_event_id").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        p.unionByName(c)
        .select(
            "event_id",
            "user_id",
            "is_p",
            F.last("purchase_event_id", ignorenulls=True)
            .over(w)
            .alias("matched"),
        )
        .filter(F.col("is_p") == 0)
    )
    return {r["event_id"]: r["matched"] for r in out.collect()}


def _asof_naive(events):
    """Quadratic reference implementation of the same semantics."""
    purchases = {}
    for i, (u, m, p) in enumerate(events):
        if p:
            key = (u, m)
            purchases[key] = max(purchases.get(key, -1), i)
    out = {}
    for i, (u, m, p) in enumerate(events):
        if p:
            continue
        candidates = [
            (pm, pid)
            for (pu, pm), pid in purchases.items()
            if pu == u and pm <= m
        ]
        out[i] = max(candidates)[1] if candidates else None
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_event, min_size=1, max_size=25))
def test_asof_join_matches_naive(spark, events):
    assert _asof_spark(spark, events) == _asof_naive(events)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=0,
        max_size=30,
    )
)
def test_salted_join_equals_plain_join(spark, pairs):
    big = spark.createDataFrame(
        [(k, v) for k, v in pairs] or [(None, None)], "k long, v long"
    ).filter("k IS NOT NULL")
    small = spark.createDataFrame(
        [(k, k * 10) for k in range(4)], "k long, tag long"
    )
    got = sorted(
        map(tuple, salted_join(big, small, "k", n_salts=3).collect())
    )
    want = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "word", "x1"]),
            min_size=0,
            max_size=90,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_chunking_covers_and_reconstructs(spark, docs):
    """Every chunk must equal tokens[idx*stride : idx*stride+chunk], chunk
    counts must be ceil(n/stride), and empty documents must emit nothing —
    on arbitrary token streams, not just the fixture corpus."""
    from streaming_data_ingestion_spark.queries.llm_pipeline import chunk_documents

    chunk, stride = 8, 5
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, chunk=chunk, stride=stride).collect()
    }

    expected_keys = set()
    for i, toks in enumerate(docs):
        n = len(toks)
        n_chunks = (n + stride - 1) // stride
        for idx in range(n_chunks):
            expected_keys.add((i, idx))
            want_toks = toks[idx * stride : idx * stride + chunk]
            assert got[(i, idx)] == (" ".join(want_toks), len(want_toks))
    assert set(got) == expected_keys


def test_dedup_clusters_invariants(spark):
    """Structural invariants of the connected-components output, checked
    independently of the recursive-CTE oracle: every candidate pair lands
    in one cluster, the cluster label is the component minimum (so it is
    ≤ every member and is itself a member), and exactly the label-owners
    are canonical."""
    from streaming_data_ingestion_spark.registry import all_queries

    from .conftest import SF_DIR

    specs = all_queries()
    clusters = {
        r.doc_id: r.cluster_id
        for r in specs["q_dedup_clusters"].fn(spark, SF_DIR).collect()
    }
    pairs = specs["q_dedup_minhash_pairs"].fn(spark, SF_DIR).collect()

    # (a) connectivity respected: paired docs share a cluster.
    for p in pairs:
        assert clusters[p.doc_a] == clusters[p.doc_b]
    # (b) label is the minimum member and a member itself.
    members: dict[int, list[int]] = {}
    for doc, lab in clusters.items():
        members.setdefault(lab, []).append(doc)
    for lab, docs in members.items():
        assert lab == min(docs)
    # (c) unpaired docs are singletons labelled by themselves.
    paired = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    for doc, lab in clusters.items():
        if doc not in paired:
            assert lab == doc


# --------------------------------------------------------------------------
# q_repetition's run-length fold: max bigram count without a group-by.
# --------------------------------------------------------------------------

_token = st.text(
    alphabet=st.sampled_from("ab \té"), min_size=0, max_size=4
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_token, min_size=0, max_size=20))
def test_repetition_fold_equals_counter(spark, texts):
    """The sorted-array run-length fold must equal a plain Counter max on
    arbitrary text — whitespace runs, empty strings, unicode, heavy
    duplication — because sort_array makes equal bigrams adjacent and
    the fold tracks the longest run."""
    from collections import Counter

    text = " ".join(texts)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")

    # NB: Spark/DuckDB trim() strips ONLY spaces (not \t), so the model
    # must strip(" "), not Python's default whitespace strip.
    toks = [t for t in text.strip(" ").split(" ") if t != ""]
    if len(toks) >= 2:
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    elif len(toks) == 1:
        bigrams = [toks[0]]  # the engines' shared degenerate convention
    else:
        bigrams = []
    expected = max(Counter(bigrams).values()) if bigrams else 0

    from streaming_data_ingestion_spark.queries.llm_text import (
        q_repetition as _q,  # noqa: F401  (registered fn, call directly)
    )
    from streaming_data_ingestion_spark.registry import REGISTRY

    # Build the same expression the query uses, over the in-memory doc.
    import streaming_data_ingestion_spark.queries.llm_text as lt

    out = df.select(
        F.aggregate(
            F.sort_array(lt._bigrams(lt._tokens())),
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long"))
                .alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                        F.lit(1).cast("long")
                    ),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        ).alias("top")
    ).collect()[0][0]
    assert out == expected, (text, toks, out, expected)


# --------------------------------------------------------------------------
# q_sessionize's lag → flag → running-sum assignment vs a naive model.
# --------------------------------------------------------------------------


def _sessions_naive(events, gap_s=1800):
    """Reference sessionizer: per user, walk events in (ts, event_id)
    order and split when the gap exceeds gap_s. Returns
    {(user, seq): (n_events, start, end)}."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, (u, sec) in enumerate(events):
        by_user[u].append((_TS0 + dt.timedelta(seconds=sec), eid))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        seq, prev = 0, None
        for ts, _eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap_s:
                seq += 1
                out[(u, seq)] = [0, ts, ts]
            out[(u, seq)][0] += 1
            out[(u, seq)][2] = ts
            prev = ts
    return {k: tuple(v) for k, v in out.items()}


# seconds offsets chosen to straddle the 1800 s gap boundary exactly
_sess_event = st.tuples(
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=0, max_value=4000),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_sess_event, min_size=1, max_size=25))
def test_sessionize_matches_naive(spark, events):
    """The single-shuffle window assignment must agree with a per-user
    Python walk on adversarial inputs: duplicate timestamps, events
    exactly 1800 s apart (same session — strict > opens a new one), and
    single-user floods."""
    rows = [
        (eid, u, _TS0 + dt.timedelta(seconds=sec))
        for eid, (u, sec) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > 1_800_000_000),
        1,
    ).otherwise(0)
    seq = F.sum(new_s).over(
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_end)
        for r in (
            df.select("user_id", "ts", seq.alias("session_seq"))
            .groupBy("user_id", "session_seq")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
            )
            .collect()
        )
    }
    assert got == _sessions_naive(events)


# --------------------------------------------------------------------------
# q_decontaminate's gram-overlap flagging vs a set-based model.
# --------------------------------------------------------------------------


def _grams8_model(toks):
    """The engines' shared 8-gram convention: max(len-7, 1) windows; a
    short doc yields ONE partial gram of all its tokens, and an EMPTY
    doc yields none (arrays_zip of empty slices is empty)."""
    if not toks:
        return set()
    n = max(len(toks) - 7, 1)
    return {" ".join(toks[i : i + 8]) for i in range(n)}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
        min_size=1,
        max_size=14,
    )
)
def test_decontaminate_matches_set_model(spark, docs):
    """With a 3-token alphabet and short docs, gram collisions between
    random documents are common — the join-based flagging must equal the
    brute-force set intersection, including the degenerate one-partial-
    gram convention and empty documents."""
    import hashlib

    from streaming_data_ingestion_spark.queries.llm_pipeline import decontaminate

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.split, r.n_shared_grams, r.contaminated)
        for r in decontaminate(df).collect()
    }

    def split_of(i):
        h = hashlib.md5(str(i).encode()).hexdigest()[0]
        return "test" if h in "ef" else ("val" if h in "cd" else "train")

    test_grams = set()
    for i, toks in enumerate(docs):
        if split_of(i) == "test":
            test_grams |= _grams8_model([t for t in toks if t])
    want = {}
    for i, toks in enumerate(docs):
        sp = split_of(i)
        if sp == "test":
            continue
        mine = _grams8_model([t for t in toks if t])
        n = len(mine & test_grams)
        want[i] = (sp, n, n > 0)
    assert got == want


def test_seq_pack_invariants(spark):
    """Packing semantics on the real fixture: offsets stay inside the
    budget, pack_ids are dense per source, and the running layout is
    exactly reconstructible — pack_offset equals the prefix sum of
    earlier documents' tokens modulo the budget."""
    from streaming_data_ingestion_spark.queries.llm_pipeline import (
        _PACK_BUDGET,
        q_seq_pack,
    )
    from tests.conftest import SF_DIR

    out = q_seq_pack(spark, SF_DIR).toPandas()
    assert (out.pack_offset >= 0).all()
    assert (out.pack_offset < _PACK_BUDGET).all()
    for _, grp in out.groupby("source"):
        g = grp.sort_values("doc_id").reset_index(drop=True)
        # reconstruct: running start offset before each doc
        start = 0
        for r in g.itertuples():
            assert r.pack_id == start // _PACK_BUDGET, r
            assert r.pack_offset == start % _PACK_BUDGET, r
            start += r.n_tokens
        # pack ids are monotone and start at 0
        assert g.pack_id.iloc[0] == 0
        assert (g.pack_id.diff().dropna() >= 0).all()


def test_emb_quantize_roundtrip_bound(spark):
    """Quantization invariants: every q8 component is in [-127, 127],
    and dequantization reconstructs the original within one quantization
    step (scale/127)."""
    from streaming_data_ingestion_spark.queries.llm_similarity import (
        q_emb_quantize,
    )
    from streaming_data_ingestion_spark.tables import load
    from tests.conftest import SF_DIR

    out = q_emb_quantize(spark, SF_DIR).toPandas().set_index("vec_id")
    orig = (
        load(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .set_index("vec_id")
    )
    assert len(out) == len(orig)
    for vid in list(out.index)[:50]:
        scale = out.loc[vid, "scale"]
        # q8 is serialized as a comma-joined string (driver-canonicalizer
        # safety — see test_plans.test_oracled_outputs_are_scalar_only)
        q8 = [int(v) for v in out.loc[vid, "q8"].split(",")]
        emb = list(orig.loc[vid, "embedding"])
        assert all(-127 <= q <= 127 for q in q8), vid
        step = scale / 127.0
        for q, x in zip(q8, emb):
            assert abs(q * step - float(x)) <= step + 1e-12, (vid, q, x)


# --------------------------------------------------------------------------
# Round-3 operator invariants (TPC-H completion + new LLM ops).
# --------------------------------------------------------------------------


def test_time_rollup_grains_consistent(spark):
    """The day grain must be exactly the sum of its hour rows — the
    invariant that makes a multi-resolution rollup trustworthy (and the
    one a grain-mismatched GROUPING SETS bug would break)."""
    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load
    from tests.conftest import SF_DIR

    out = all_queries()["q_time_rollup"].fn(spark, SF_DIR).collect()
    days = {}
    hours = {}
    for r in out:
        key = (r["bucket_start"].date() if r["grain"] == "1h"
               else r["bucket_start"].date(), r["event_type"])
        if r["grain"] == "1d":
            days[key] = (r["n_events"], r["sum_value"])
        else:
            n, s = hours.get(key, (0, 0.0))
            hours[key] = (n + r["n_events"], s + r["sum_value"])
    assert set(days) == set(hours)
    for key, (n_d, _) in days.items():
        assert n_d == hours[key][0]
    total_events = load(spark, SF_DIR, "events").count()
    assert sum(n for n, _ in days.values()) == total_events


def test_pq_encode_matches_sequential_model(spark):
    """PQ codes and error must equal a plain sequential-Python model of
    the same folds — pinning argmin tie-breaks and fold order (the things
    a 'mostly right' vectorized rewrite silently changes)."""
    from streaming_data_ingestion_spark.queries.llm_similarity import (
        _PQ_K,
        _PQ_SUB,
        _PQ_SUBDIM,
    )
    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load
    from tests.conftest import SF_DIR

    got = {
        r["vec_id"]: r
        for r in all_queries()["q_pq_encode"].fn(spark, SF_DIR).collect()
    }
    vecs = load(spark, SF_DIR, "embeddings").limit(50).collect()
    for row in vecs:
        emb = row["embedding"]
        codes, err = [], 0.0
        for s in range(_PQ_SUB):
            dists = []
            for c in range(_PQ_K):
                acc = 0.0
                for d in range(_PQ_SUBDIM):
                    cent = (float((c * 31 + d * 17 + s * 7) % 13) - 6.0) / 6.0
                    diff = float(emb[s * _PQ_SUBDIM + d]) - cent
                    acc = acc + diff * diff
                dists.append(acc)
            m = min(dists)
            codes.append(dists.index(m))
            err = err + m
        r = got[row["vec_id"]]
        # codes is serialized as a comma-joined string (driver safety)
        assert [int(v) for v in r["codes"].split(",")] == codes
        assert r["sq_err"] == err
        assert all(0 <= c < _PQ_K for c in codes)


def test_dataset_card_mass_conservation(spark):
    """Card totals must reconcile with direct counts: docs per source sum
    to the corpus, token totals match q_token_count, rates are in [0,1]."""
    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load
    from tests.conftest import SF_DIR

    card = all_queries()["q_dataset_card"].fn(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents")
    assert sum(r["n_docs"] for r in card) == docs.count()
    tok_total = sum(
        r["n_ws_tokens"]
        for r in all_queries()["q_token_count"].fn(spark, SF_DIR).collect()
    )
    assert sum(r["total_tokens"] for r in card) == tok_total
    for r in card:
        assert 0.0 <= r["dup_rate"] <= 1.0
        assert 0.0 <= r["short_rate"] <= 1.0
        assert r["n_exact_dups"] <= r["n_docs"]


def test_cross_dedup_bounds(spark):
    """Matrix rows are canonical (source_a < source_b) and doc counts
    never exceed pair counts; total pairs equal the cross-source subset
    of the LSH collision set."""
    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load
    from tests.conftest import SF_DIR

    from pyspark.sql import functions as F2

    matrix = all_queries()["q_cross_dedup"].fn(spark, SF_DIR).collect()
    for r in matrix:
        assert r["source_a"] < r["source_b"]
        assert 1 <= r["n_docs_a"] <= r["n_pairs"]
    pairs = all_queries()["q_dedup_minhash_pairs"].fn(spark, SF_DIR)
    src = load(spark, SF_DIR, "documents").select("doc_id", "source")
    cross = (
        pairs.join(src.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("source", "sa"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("source", "sb"), "doc_b")
        .filter(F2.col("sa") != F2.col("sb"))
        .count()
    )
    assert sum(r["n_pairs"] for r in matrix) == cross


def test_tpch_mass_conservation(spark):
    """Distribution/aggregate mass checks: Q13's histogram covers every
    customer exactly once; Q1's order counts cover the filtered fact."""
    from pyspark.sql import functions as F2

    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load
    from tests.conftest import SF_DIR

    q13 = all_queries()["q_tpch_q13"].fn(spark, SF_DIR).collect()
    n_cust = load(spark, SF_DIR, "customer").count()
    assert sum(r["custdist"] for r in q13) == n_cust

    q1 = all_queries()["q_tpch_q1"].fn(spark, SF_DIR).collect()
    n_li = (
        load(spark, SF_DIR, "lineitem")
        .filter(F2.col("l_shipdate") <= F2.lit("2001-08-06").cast("timestamp"))
        .count()
    )
    assert sum(r["count_order"] for r in q1) == n_li


def test_quality_gopher_invariants(spark):
    """Gopher battery: one row per document, `passes` is exactly the
    conjunction of the five rule flags, and ratio-rule cross-multiplied
    booleans agree with the float ratios they encode."""
    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load
    from tests.conftest import SF_DIR

    rows = all_queries()["q_quality_gopher"].fn(spark, SF_DIR).collect()
    assert len(rows) == load(spark, SF_DIR, "documents").count()
    flags = ("r_word_count", "r_mean_word_len", "r_symbol_ratio",
             "r_alpha_ratio", "r_stopwords")
    seen = {True: 0, False: 0}
    for r in rows:
        assert r["passes"] == all(r[f] for f in flags)
        assert r["n_tokens"] > 0
        seen[r["passes"]] += 1
    # thresholds are tuned so the battery genuinely splits the fixture
    assert seen[True] > 0 and seen[False] > 0


def test_dup_substring_finds_planted_near_dups(spark):
    """The fixture plants near-duplicate documents (no exact copies), so
    shared 5-gram spans must exist; counts stay within bounds and the
    sharing relation is symmetric in aggregate (a gram shared by doc A is
    shared by at least one other doc, so flagged docs can't number one)."""
    from streaming_data_ingestion_spark.registry import all_queries
    from tests.conftest import SF_DIR

    rows = all_queries()["q_dup_substring"].fn(spark, SF_DIR).collect()
    for r in rows:
        assert 0 <= r["n_dup_grams"] <= r["n_grams"]
        assert 0.0 <= r["dup_frac"] <= 1.0
    flagged = [r for r in rows if r["n_dup_grams"] > 0]
    assert len(flagged) >= 2  # sharing needs at least two participants


def test_lang_id_eval_mass_conservation(spark):
    """Confusion-matrix counts cover the corpus exactly once and the
    prediction space is the classifier's codomain."""
    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load
    from tests.conftest import SF_DIR

    rows = all_queries()["q_lang_id_eval"].fn(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == load(spark, SF_DIR, "documents").count()
    assert {r["predicted_lang"] for r in rows} <= {"en", "und"}


def test_corr_and_linreg_invariants(spark):
    """Correlations live in [-1, 1]; OLS R² equals the squared correlation
    of the same pair (the single-regressor identity), and quantity-price
    must correlate strongly positively in TPC-H-shaped data."""
    from streaming_data_ingestion_spark.registry import all_queries
    from tests.conftest import SF_DIR

    corr = {
        r["l_returnflag"]: r
        for r in all_queries()["q_corr_matrix"].fn(spark, SF_DIR).collect()
    }
    for r in corr.values():
        for c in ("corr_qty_price", "corr_qty_disc", "corr_price_disc",
                  "corr_price_tax"):
            assert -1.0 <= r[c] <= 1.0
    for r in all_queries()["q_linreg"].fn(spark, SF_DIR).collect():
        c = corr[r["l_returnflag"]]["corr_qty_price"]
        assert abs(r["r2"] - c * c) < 1e-9


def test_seasonality_and_entropy_invariants(spark):
    """Seasonal indices average to 1 weighted by volume (mass conservation)
    and entropy is bounded by ln(vocabulary)."""
    import math

    from streaming_data_ingestion_spark.registry import all_queries
    from tests.conftest import SF_DIR

    season = all_queries()["q_seasonality"].fn(spark, SF_DIR).collect()
    by_type: dict = {}
    for r in season:
        by_type.setdefault(r["event_type"], []).append(r)
    for rows in by_type.values():
        total = sum(r["n_events"] for r in rows)
        # Σ share·index = Σ (n/total)·(n·7/total)... instead verify the
        # definitional identity per row and that indices bracket 1.0
        for r in rows:
            assert abs(r["seasonal_index"] - r["n_events"] * 7 / total) < 1e-12
        assert min(r["seasonal_index"] for r in rows) <= 1.0
        assert max(r["seasonal_index"] for r in rows) >= 1.0

    for r in all_queries()["q_entropy"].fn(spark, SF_DIR).collect():
        assert 0.0 <= r["entropy_nats"] <= math.log(r["n_terms"]) + 1e-9


def test_ewma_lookback_cap_bounds_per_user_state(spark, tmp_path, monkeypatch):
    """q_ewma folds only the EWMA_MAX_EVENTS most recent events per user:
    with the cap patched below a user's history, the result must equal
    the hand-computed fold over exactly that recency suffix (ordered by
    ts, event_id), and n_events must report the capped count."""
    import pandas as pd

    from streaming_data_ingestion_spark.queries import event_analytics

    rows = []
    # user 7: 10 events, values 1..10 in ts order; user 8: 3 events
    for i in range(10):
        rows.append(
            {
                "event_id": i,
                "ts": dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
                "user_id": 7,
                "event_type": "click",
                "value": float(i + 1),
                "props": "{}",
            }
        )
    for i in range(3):
        rows.append(
            {
                "event_id": 100 + i,
                "ts": dt.datetime(2024, 2, 1) + dt.timedelta(hours=i),
                "user_id": 8,
                "event_type": "view",
                "value": float(10 * (i + 1)),
                "props": "{}",
            }
        )
    sf_dir = str(tmp_path)
    pd.DataFrame(rows).to_parquet(f"{sf_dir}/events.parquet", index=False)

    monkeypatch.setattr(event_analytics, "EWMA_MAX_EVENTS", 4)
    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in event_analytics.q_ewma(spark, sf_dir).collect()
    }

    def fold(vals):
        s = vals[0]
        for x in vals[1:]:
            s = s * 0.5 + x * 0.5
        return s

    # user 7: only the last 4 events (values 7,8,9,10) enter the fold
    assert got[7] == (4, fold([7.0, 8.0, 9.0, 10.0]))
    # user 8: under the cap — full history, unchanged semantics
    assert got[8] == (3, fold([10.0, 20.0, 30.0]))


def test_cms_heavy_hitters_invariants(spark):
    """Count-Min guarantees: est >= exact for every candidate, and NO
    true heavy hitter (exact count > total/200) can be missed — the
    sketch only overcounts, so the candidate cut est*200 >= total is a
    superset of the true cut."""
    from streaming_data_ingestion_spark.queries.sketches import (
        _PHI_DENOM,
        q_heavy_hitters_cms,
    )
    from streaming_data_ingestion_spark.tables import load

    from tests.conftest import SF_DIR

    got = q_heavy_hitters_cms(spark, SF_DIR).collect()
    assert got, "fixture corpus must contain heavy hitters"
    for r in got:
        assert r["est"] >= r["n_exact"], r

    toks = load(spark, SF_DIR, "documents").select(
        F.explode(
            F.filter(F.split(F.trim(F.col("text")), " "), lambda t: t != "")
        ).alias("token")
    )
    total = toks.count()
    truth = {
        r["token"]: r["n"]
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["n"] * _PHI_DENOM >= total
    }
    flagged = {r["token"]: r["n_exact"] for r in got if r["is_true_heavy"]}
    assert flagged == truth  # exact recall AND precision after verify


def test_join_asof_fwd_matches_naive_model(spark):
    """Forward as-of invariant: for each click, purchase_ts must be the
    MINIMUM purchase ts >= click ts for that user (None if no such
    purchase) — checked against a naive pandas model on a sample."""
    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load
    from tests.conftest import SF_DIR

    got = all_queries()["q_join_asof_fwd"].fn(spark, SF_DIR).toPandas()
    ev = load(spark, SF_DIR, "events").toPandas()
    purchases = ev[ev.event_type == "purchase"]
    by_user = {
        uid: sorted(g["ts"]) for uid, g in purchases.groupby("user_id")
    }
    sample = got.sample(n=min(200, len(got)), random_state=7)
    for _, row in sample.iterrows():
        cand = [t for t in by_user.get(row["user_id"], []) if t >= row["ts"]]
        want = min(cand) if cand else None
        if want is None:
            assert row["purchase_ts"] is None or row["purchase_ts"] != row["purchase_ts"]
        else:
            assert row["purchase_ts"] == want, (row["user_id"], row["ts"])


def test_pca2_projection_invariants(spark):
    """Closed-form PCA invariants: sample variance of pc1 equals the
    reported top eigenvalue share of total variance; pc1 ⟂ pc2
    (covariance ~ 0); pc1 variance >= pc2 variance."""
    import numpy as np

    from streaming_data_ingestion_spark.registry import all_queries
    from tests.conftest import SF_DIR

    pdf = all_queries()["q_pca2_project"].fn(spark, SF_DIR).toPandas()
    pc1 = pdf["pc1"].to_numpy()
    pc2 = pdf["pc2"].to_numpy()
    v1 = pc1.var()  # population variance, matching the moment formulas
    v2 = pc2.var()
    share = pdf["var_share_pc1"].iloc[0]
    assert abs(pdf["var_share_pc1"].std()) < 1e-15  # constant per corpus
    assert v1 >= v2
    assert np.isclose(v1 / (v1 + v2), share, atol=1e-9)
    cov = ((pc1 - pc1.mean()) * (pc2 - pc2.mean())).mean()
    assert abs(cov) < 1e-9 * max(v1, 1.0)


def test_split_leakage_audit_mass_conservation(spark):
    """The audit's pair counts must sum to the total LSH pair count, and
    is_leak must be exactly 'endpoints differ'."""
    from streaming_data_ingestion_spark.registry import all_queries
    from tests.conftest import SF_DIR

    rows = all_queries()["q_split_leakage_audit"].fn(spark, SF_DIR).collect()
    n_pairs = (
        all_queries()["q_dedup_minhash_pairs"].fn(spark, SF_DIR).count()
    )
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    for r in rows:
        assert r["split_a"] <= r["split_b"]  # canonical order
        assert r["is_leak"] == (r["split_a"] != r["split_b"])


# ---------------------------------------------------------------------------
# Round-5 tail operators: semantic invariants over the fixture corpus
# (the oracle pins exact values; these pin the *relationships* between
# sibling operators that a fixture hash can't express).
# ---------------------------------------------------------------------------


def test_asof_nearest_dominates_both_directions(spark):
    """The nearest match must never be farther than either directional
    match: |ts − nearest| ≤ |ts − backward| and ≤ |ts − forward| per
    click, the direction tag must agree with the matched side, and a
    click is unmatched only when BOTH directions are."""
    from streaming_data_ingestion_spark.registry import all_queries
    from tests.conftest import SF_DIR

    specs = all_queries()
    near = {
        r["event_id"]: r
        for r in specs["q_join_asof_nearest"].fn(spark, SF_DIR).collect()
    }
    back = {
        r["event_id"]: r["purchase_ts"]
        for r in specs["q_join_asof"].fn(spark, SF_DIR).collect()
    }
    fwd = {
        r["event_id"]: r["purchase_ts"]
        for r in specs["q_join_asof_fwd"].fn(spark, SF_DIR).collect()
    }
    assert set(near) == set(back) == set(fwd)
    for eid, r in near.items():
        b_ts, f_ts, n_ts = back[eid], fwd[eid], r["purchase_ts"]
        if b_ts is None and f_ts is None:
            assert n_ts is None and r["direction"] is None
            continue
        assert n_ts is not None
        d_n = abs((r["ts"] - n_ts).total_seconds())
        if b_ts is not None:
            assert d_n <= abs((r["ts"] - b_ts).total_seconds())
        if f_ts is not None:
            assert d_n <= abs((r["ts"] - f_ts).total_seconds())
        if r["direction"] == "back":
            assert n_ts <= r["ts"]
        else:
            assert r["direction"] == "fwd" and n_ts >= r["ts"]


def test_containment_dominates_jaccard(spark):
    """Containment is the looser measure: for any candidate pair both
    operators emit, max(cont_a, cont_b) ≥ jaccard (|∩|/min ≥ |∩|/|∪|),
    and both containments are in (0, 1]."""
    from streaming_data_ingestion_spark.registry import all_queries
    from tests.conftest import SF_DIR

    specs = all_queries()
    cont = {
        (r["doc_a"], r["doc_b"]): r
        for r in specs["q_minhash_containment"].fn(spark, SF_DIR).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in specs["q_dedup_ngram_jaccard"].fn(spark, SF_DIR).collect()
    }
    assert cont, "containment emitted no pairs on the fixture"
    for pair, r in cont.items():
        assert 0.0 < r["cont_a_in_b"] <= 1.0
        assert 0.0 < r["cont_b_in_a"] <= 1.0
        if pair in jac:
            assert (
                max(r["cont_a_in_b"], r["cont_b_in_a"]) >= jac[pair] - 1e-12
            )


def test_late_events_invariants(spark):
    """Late accounting must conserve rows (Σ n_events = |events|), never
    count more late than arrived, leave the first batch watermark-less,
    and advance the watermark monotonically with arrival order."""
    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load
    from tests.conftest import SF_DIR

    specs = all_queries()
    rows = sorted(
        specs["q_late_events"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["batch_id"],
    )
    n_total = load(spark, SF_DIR, "events").count()
    assert sum(r["n_events"] for r in rows) == n_total
    assert all(0 <= r["n_late"] <= r["n_events"] for r in rows)
    assert rows[0]["watermark"] is None and rows[0]["n_late"] == 0
    marks = [r["watermark"] for r in rows[1:]]
    assert all(m is not None for m in marks)
    assert marks == sorted(marks)


def test_quality_classifier_score_semantics(spark):
    """Scores are means of weights in [-1, 1] and the keep/drop label is
    exactly the sign gate on the integer score."""
    from streaming_data_ingestion_spark.registry import all_queries
    from tests.conftest import SF_DIR

    rows = (
        all_queries()["q_quality_classifier"].fn(spark, SF_DIR).collect()
    )
    assert rows
    for r in rows:
        assert -1.0 <= r["score"] <= 1.0
        assert (r["label"] == "keep") == (r["score_int"] > 0)
