"""Property tests for the pure-Python cores of the stateful operators.

These drive the applyInPandasWithState update functions directly through
a fake GroupState — no Spark session — so hypothesis can hammer the
algorithmic guarantees with thousands of random streams.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
    _update_decayed_fn,
    _update_hh_fn,
    DECAY_SHIFT,
    _MS_PER_DAY,
)


class FakeState:
    def __init__(self):
        self._val = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v

    def remove(self):
        self._val = None

    def setTimeoutDuration(self, ms):
        pass


@st.composite
def item_stream(draw):
    """A stream of items split into micro-batches."""
    alphabet = [f"k{i}" for i in range(draw(st.integers(2, 30)))]
    n = draw(st.integers(1, 300))
    items = draw(st.lists(st.sampled_from(alphabet), min_size=n, max_size=n))
    n_batches = draw(st.integers(1, 5))
    size = max(1, len(items) // n_batches)
    return [items[i : i + size] for i in range(0, len(items), size)]


@given(item_stream(), st.integers(2, 10))
@settings(max_examples=200, deadline=None)
def test_space_saving_guarantees_hold_for_any_stream(batches, capacity):
    """Space-Saving invariants (Metwally '05) for every surviving key:
    reported >= true_count and reported - overcount <= true_count; the
    counter table never exceeds capacity; and total reported mass over
    the table never loses the stream's total (any key with
    true_count > N/capacity MUST survive)."""
    fn = _update_hh_fn(capacity, retention_ms=10_000)
    state = FakeState()
    out = None
    for batch in batches:
        out = list(fn(("s",), iter([pd.DataFrame({"item": batch})]), state))[-1]
    truth = Counter(x for b in batches for x in b)
    n_total = sum(truth.values())
    keys = out["keys"][0]
    counts = out["counts"][0]
    overs = out["overcounts"][0]
    assert len(keys) <= capacity
    for k, c, o in zip(keys, counts, overs):
        assert c >= truth[k], (k, c, truth[k])
        assert c - o <= truth[k], (k, c, o, truth[k])
    # classic guarantee: every key with frequency > n/capacity survives
    for k, t in truth.items():
        if t > n_total / capacity:
            assert k in keys, (k, t, n_total, capacity, keys)


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(1, 40)),  # (day, count)
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_decayed_counter_is_exact_and_arrival_order_free(day_counts):
    """The round-9 per-day count ring makes the decayed counter EXACT:
    the emitted scaled value equals the closed-form per-event weighted
    sum (events older than `shift` days relative to the final horizon
    weigh zero), for ANY arrival order and ANY batch split — an event
    arriving late lands in its true age cell and ages with the ring,
    identically to the batch GROUP BY. (The pre-r9 single-counter form
    right-shifted an aggregated sum and could floor away carry bits;
    this property replaces its floor-envelope with equality.)"""
    fn = _update_decayed_fn(DECAY_SHIFT, retention_ms=10_000)
    state = FakeState()
    out = None
    # feed in the (possibly unsorted) generated order, one batch per day
    for day, cnt in day_counts:
        ts = [day * _MS_PER_DAY + i for i in range(cnt)]
        out = list(fn(("k",), iter([pd.DataFrame({"timestamp": ts})]), state))[-1]
    max_day = max(d for d, _ in day_counts)
    scaled = int(out["scaled"][0])
    exact = sum(
        c << (DECAY_SHIFT - (max_day - d))
        for d, c in day_counts
        if max_day - d <= DECAY_SHIFT
    )
    assert scaled == exact
    assert int(out["n_events"][0]) == sum(c for _, c in day_counts)
    assert int(out["as_of_day"][0]) == max_day


def test_space_saving_eviction_path_removes_state():
    fn = _update_hh_fn(4, retention_ms=10)
    state = FakeState()
    list(fn(("s",), iter([pd.DataFrame({"item": ["a", "b"]})]), state))
    assert state.exists
    state.hasTimedOut = True
    assert list(fn(("s",), iter([]), state)) == []
    assert not state.exists


# -- plan-guard classifier properties (pure string logic) -------------------
from squonk2_fastapi_ws_event_stream_spark.functions.plan_guard import (  # noqa: E402
    BOUNDED,
    WORKLOAD,
    _filter_class,
)


@given(
    st.sampled_from(["doc_id", "vec_id", "o_orderkey", "event_id"]),
    st.integers(2, 10_000),
    st.integers(0, 99),
    st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_filter_class_recognizes_stride_and_bounds(col, mod, rem, casted):
    lit = f"cast({rem} as bigint)" if casted else str(rem)
    mod_lit = f"cast({mod} as bigint)" if casted else str(mod)
    stride = f"(({col}#12L % {mod_lit}) = {lit})"
    assert _filter_class(stride) == WORKLOAD
    eq = f"({col}#3L = {lit})"
    assert _filter_class(eq) == BOUNDED
    upper = f"({col}#3L < {lit})"
    assert _filter_class(upper) == BOUNDED


@given(st.text(alphabet="abcdefg_%()=<> 0123456789#L", max_size=60))
@settings(max_examples=200, deadline=None)
def test_filter_class_never_blesses_unknown_columns(cond):
    # A condition that names no unique-key column proves nothing.
    from squonk2_fastapi_ws_event_stream_spark.functions.plan_guard import (
        UNIQUE_KEY_COLS,
    )

    if not any(c in cond for c in UNIQUE_KEY_COLS):
        assert _filter_class(cond) is None


@given(
    st.lists(st.integers(0, 1000), min_size=31, max_size=200),
    st.integers(1, 4),
)
@settings(max_examples=200, deadline=None)
def test_zscore_core_matches_reference_welford(xs, n_batches):
    """The integer cross-multiplied z-test must agree with a float
    reference implementation of the same prior-distribution rule, and
    (n, s, s2) state must be exactly the stream's moments regardless of
    batching."""
    from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (
        ZSCORE_MIN_N,
        ZSCORE_Z,
        _update_zscore_fn,
    )

    fn = _update_zscore_fn(retention_ms=10_000)
    state = FakeState()
    size = max(1, len(xs) // n_batches)
    total_flagged = 0
    for i in range(0, len(xs), size):
        out = list(
            fn(("k",), iter([pd.DataFrame({"x": xs[i : i + size]})]), state)
        )[-1]
        total_flagged += int(out["batch_anomalies"][0])
    n, s, s2 = state.get
    assert n == len(xs) and s == sum(xs) and int(s2) == sum(x * x for x in xs)

    # float reference (exact integers are small enough here that float64
    # is itself exact: values <= 1000, n <= 200)
    rn = rs = rs2 = 0
    ref_flagged = 0
    for x in xs:
        if rn >= ZSCORE_MIN_N:
            var_n2 = rn * rs2 - rs * rs
            d = x * rn - rs
            if (var_n2 == 0 and d != 0) or (
                var_n2 > 0 and d * d > ZSCORE_Z**2 * var_n2
            ):
                ref_flagged += 1
        rn += 1
        rs += x
        rs2 += x * x
    assert total_flagged == ref_flagged


# ---------------------------------------------------------------------------
# CDC chunking (t68) shift-invariance — THE property that distinguishes
# content-defined chunking from fixed-size blocks: prepending words to a
# document leaves every chunk after the first content-defined boundary
# byte-identical, so shared suffixes still dedup. Exercised on the pure
# chunking rule (the same hash/boundary arithmetic the Spark expressions
# and the DuckDB oracle both implement), hypothesis-driven.
# ---------------------------------------------------------------------------
def _cdc_chunks(words: list[str], mod: int = 8) -> list[str]:
    """Reference implementation of t68's chunking rule."""
    chunks: list[list[str]] = []
    for w in words:
        h = (ord(w[0]) if w else 0) * 131 + len(w) * 7 + (ord(w[-1]) if w else 0)
        if h % mod == 0 or not chunks:
            chunks.append([w])
        else:
            chunks[-1].append(w)
    return [" ".join(c) for c in chunks]


_word = st.text(alphabet="abcdefghij", min_size=1, max_size=8)


@given(
    doc=st.lists(_word, min_size=8, max_size=60),
    prefix=st.lists(_word, min_size=1, max_size=10),
)
@settings(max_examples=300, deadline=None)
def test_cdc_chunks_are_shift_invariant_past_first_boundary(doc, prefix):
    base = _cdc_chunks(doc)
    shifted = _cdc_chunks(prefix + doc)
    # Every base chunk that STARTS at a boundary word (i.e. all but
    # possibly the first) must reappear verbatim in the shifted doc's
    # chunk list — content decides the cut, not position.
    reappear = set(shifted)
    for c in base[1:]:
        assert c in reappear, (c, base, shifted)


@given(doc=st.lists(_word, min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_cdc_chunks_partition_the_document(doc):
    chunks = _cdc_chunks(doc)
    assert " ".join(chunks) == " ".join(doc)


def test_cdc_reference_rule_matches_spark_and_oracle_hash():
    # Pin the reference rule to the operator's constants: same affine
    # hash (ascii(first)*131 + len*7 + ascii(last)), same mod.
    from squonk2_fastapi_ws_event_stream_spark.operators.corpus import T68_MOD

    assert T68_MOD == 8
    # boundary example: a word whose hash is divisible by 8 starts a chunk
    w = "aa"  # 97*131 + 2*7 + 97 = 12818 -> 12818 % 8 = 2: not a boundary
    h = ord(w[0]) * 131 + len(w) * 7 + ord(w[-1])
    assert h == 12818 and h % T68_MOD != 0


# -- round-9 twin cores: batch-split invariance + independent closed forms --
#
# Each streaming twin claims its final emission depends only on the event
# SEQUENCE, not on how the stream was chopped into micro-batches — that is
# what makes a checkpoint restart (which re-chops the tail) safe, and what
# lets the batch query replay the same log to identical values. These
# properties drive the pure-Python update cores through random sequences
# under random batch splits and compare against closed forms computed
# directly from the flat sequence (prefix sums, telescoping integrals,
# Counter-based ring replay) rather than a second copy of the fold.
from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (  # noqa: E402
    FUNNEL_STEPS,
    HOURLY_DEN,
    HOURLY_NUM,
    _update_cusum_fn,
    _update_funnel_fn,
    _update_hourly_fn,
    _update_twap_fn,
)


def _frames(rows: pd.DataFrame, cuts: list) -> list:
    """Chop a DataFrame into consecutive non-empty micro-batches."""
    edges = [0, *cuts, len(rows)]
    return [rows.iloc[a:b] for a, b in zip(edges, edges[1:]) if b > a]


def _final(fn, frames: list):
    """Drive an update core over micro-batches; return the last emission."""
    state = FakeState()
    out = None
    for pdf in frames:
        res = list(fn(("k",), iter([pdf]), state))
        if res:
            out = res[-1]
    return out


@st.composite
def _seq_with_cuts(draw, row_strategy, min_size=1, max_size=60):
    n = draw(st.integers(min_size, max_size))
    seq = [draw(row_strategy) for _ in range(n)]
    cuts = sorted(draw(st.sets(st.integers(1, max(1, n - 1)), max_size=4)))
    return seq, [c for c in cuts if c < n]


@given(_seq_with_cuts(st.tuples(st.integers(0, 1_000_000), st.integers(0, 10_000))))
@settings(max_examples=200, deadline=None)
def test_twap_integral_telescopes_and_ignores_batch_splits(seq_cuts):
    """The TWAP core's span is the telescoped first-to-last gap of the
    KEPT subsequence (regressions skipped), its integral is the sum of
    value x holding-time over consecutive kept pairs, and the final
    emission is identical for any micro-batch split of the same feed."""
    seq, cuts = seq_cuts
    rows = pd.DataFrame(
        {"us": [u for u, _ in seq], "cents": [c for _, c in seq],
         "offset": range(len(seq))}
    )
    fn = _update_twap_fn(retention_ms=10_000)
    out = _final(fn, _frames(rows, cuts))
    one = _final(_update_twap_fn(retention_ms=10_000), [rows])
    assert out.equals(one)  # split-invariant
    # closed form: greedy-keep of non-regressing observations (the spec)
    kept = []
    for u, c in seq:
        if not kept or u >= kept[-1][0]:
            kept.append((u, c))
    n_kept = len(kept)
    assert int(out["n_obs"][0]) == n_kept
    assert int(out["late"][0]) == len(seq) - n_kept
    span = kept[-1][0] - kept[0][0]
    assert int(out["span_us"][0]) == span  # sum of deltas telescopes
    vt = sum(c * (u2 - u1) for (u1, c), (u2, _) in zip(kept, kept[1:]))
    assert int(out["twap_milli"][0]) == (vt * 10 // span if span else -1)
    assert int(out["last_value_milli"][0]) == kept[-1][1] * 10


@given(
    _seq_with_cuts(st.integers(-1_000, 1_000), max_size=80),
    st.integers(-50, 50),
    st.integers(0, 2_000),
)
@settings(max_examples=200, deadline=None)
def test_cusum_forensic_mode_matches_pages_closed_form(seq_cuts, target, threshold):
    """rearm=False (e32's forensic form) must equal Page's closed form
    computed from prefix sums: stat_i = cum_i - min(0, cum_1..cum_i),
    n_alarms = |{i : stat_i > h}|, first_alarm_n = first such i; and the
    emission must not depend on the batch split."""
    from itertools import accumulate

    seq, cuts = seq_cuts
    rows = pd.DataFrame({"cents": seq, "offset": range(len(seq))})
    fn = _update_cusum_fn(target, threshold, retention_ms=10_000, rearm=False)
    out = _final(fn, _frames(rows, cuts))
    one = _final(
        _update_cusum_fn(target, threshold, retention_ms=10_000, rearm=False),
        [rows],
    )
    # alarmed_in_batch is BY DESIGN batch-relative ("fired in THIS
    # batch") — exclude it from split-invariance; its per-batch truth is
    # pinned against the closed form below.
    assert out.drop(columns="alarmed_in_batch").equals(
        one.drop(columns="alarmed_in_batch")
    )
    cums = list(accumulate(x - target for x in seq))
    mins = list(accumulate(cums, min, initial=0))[1:]  # empty prefix = 0
    stats = [c - min(0, m) for c, m in zip(cums, mins)]
    alarm_idx = [i + 1 for i, s in enumerate(stats) if s > threshold]
    assert int(out["stat"][0]) == stats[-1]
    assert int(out["n_alarms"][0]) == len(alarm_idx)
    assert int(out["first_alarm_n"][0]) == (alarm_idx[0] if alarm_idx else 0)
    assert bool(out["alarmed_in_batch"][0]) == any(
        i > (cuts[-1] if cuts else 0) for i in alarm_idx
    )


@given(
    _seq_with_cuts(st.integers(-1_000, 1_000), max_size=80),
    st.integers(-50, 50),
    st.integers(0, 2_000),
)
@settings(max_examples=200, deadline=None)
def test_cusum_rearm_first_alarm_agrees_with_forensic(seq_cuts, target, threshold):
    """Before the first alarm the two modes share state bit for bit, so
    first_alarm_n must agree; re-arming can only swallow subsequent
    alarms, never add them; and rearm=True is split-invariant too."""
    seq, cuts = seq_cuts
    rows = pd.DataFrame({"cents": seq, "offset": range(len(seq))})
    re_ = _final(
        _update_cusum_fn(target, threshold, retention_ms=10_000, rearm=True),
        _frames(rows, cuts),
    )
    one = _final(
        _update_cusum_fn(target, threshold, retention_ms=10_000, rearm=True),
        [rows],
    )
    fo = _final(
        _update_cusum_fn(target, threshold, retention_ms=10_000, rearm=False),
        [rows],
    )
    assert re_.drop(columns="alarmed_in_batch").equals(
        one.drop(columns="alarmed_in_batch")
    )
    assert int(re_["first_alarm_n"][0]) == int(fo["first_alarm_n"][0])
    assert int(re_["n_alarms"][0]) <= int(fo["n_alarms"][0])
    assert int(re_["stat"][0]) >= 0 and int(fo["stat"][0]) >= 0


@given(
    _seq_with_cuts(
        st.tuples(
            st.sampled_from([*FUNNEL_STEPS, "noise", "refund"]),
            st.integers(0, 10_000),
        ),
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_funnel_greedy_spec_and_split_invariance(seq_cuts):
    """The funnel core is the greedy in-order matcher: the stage only
    advances on the exact next step name, signup time is the FIRST
    signup's ms, conversion latency is first-completion minus that —
    independent of micro-batch boundaries."""
    seq, cuts = seq_cuts
    rows = pd.DataFrame(
        {"step": [s for s, _ in seq], "ms": [m for _, m in seq],
         "offset": range(len(seq))}
    )
    out = _final(_update_funnel_fn(retention_ms=10_000), _frames(rows, cuts))
    one = _final(_update_funnel_fn(retention_ms=10_000), [rows])
    assert out.drop(columns="n_events").equals(one.drop(columns="n_events"))
    stage, signup, conv = 0, 0, -1
    for step, ms in seq:
        if stage < len(FUNNEL_STEPS) and step == FUNNEL_STEPS[stage]:
            if stage == 0:
                signup = ms
            stage += 1
            if stage == len(FUNNEL_STEPS):
                conv = ms - signup
    assert int(out["stage"][0]) == stage
    assert bool(out["converted"][0]) == (stage == len(FUNNEL_STEPS))
    assert int(out["conv_ms"][0]) == conv


@given(_seq_with_cuts(st.integers(0, 20), max_size=120))
@settings(max_examples=200, deadline=None)
def test_hourly_ring_replays_the_counter_closed_form(seq_cuts):
    """For an hour-ordered feed (the source's offset order), the flagged
    closed hours equal a Counter-based replay of e21's 6-trailing-
    observed-hours rule, the open (max) hour never emits, the ring never
    exceeds 6 cells, and the emissions are split-invariant."""
    seq, cuts = seq_cuts
    hours = sorted(seq)
    rows = pd.DataFrame({"hour_no": hours})
    fn = _update_hourly_fn(HOURLY_NUM, HOURLY_DEN, retention_ms=10_000)
    state = FakeState()
    got = []
    for pdf in _frames(rows, cuts):
        for out in fn(("k",), iter([pdf]), state):
            got.extend(map(tuple, out.itertuples(index=False)))
    assert len(state.get[2]) <= 6  # observed-hours ring is bounded
    # single-batch replay must flag the same closed hours
    state1 = FakeState()
    got1 = []
    for out in _update_hourly_fn(HOURLY_NUM, HOURLY_DEN, 10_000)(
        ("k",), iter([rows]), state1
    ):
        got1.extend(map(tuple, out.itertuples(index=False)))
    assert got == got1
    # closed form from the hour Counter: every hour except the open max
    # closes in order against the 6 trailing observed counts
    truth = Counter(hours)
    ring: list = []
    expected = []
    for h in sorted(truth)[:-1]:
        cnt = truth[h]
        if len(ring) == 6:
            trail = sum(ring)
            if cnt * 6 * HOURLY_DEN >= trail * HOURLY_NUM:
                expected.append(
                    ("k", h, cnt, cnt * 6_000_000 // trail / 1e6)
                )
        ring.append(cnt)
        del ring[:-6]
    assert got == expected


# -- sketch cores: linearity, bottom-K-of-union, rank correctness -----------
#
# The sketch twins' e2e tests pin bit-identity vs their batch queries on
# real logs; these properties pin the ALGEBRA that makes the sketches
# mergeable and order-free at 100 TB — AMS counters are linear (a
# partitioned fold merges by elementwise sum), a KMV sketch is the
# bottom-K of the hash-set union (any split merges to the same sketch),
# and the DDSketch bucket choice equals the true rank element's bucket
# (the monotone-bucketing theorem the quantile guarantee rests on).
from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (  # noqa: E402
    _LATENESS_EDGES_US,
    _ams_sign,
    _dds_bucket,
    _update_ams_fn,
    _update_dds_fn,
    _update_kmv_fn,
    _update_lateness_fn,
    AMS_D,
    DDS_QS,
    KMV_K,
)
from squonk2_fastapi_ws_event_stream_spark.functions.hashing import (  # noqa: E402
    KMV_A,
    KMV_B,
    KMV_P,
)


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=80),
    st.lists(st.integers(0, 10_000), min_size=1, max_size=80),
    st.randoms(),
)
@settings(max_examples=150, deadline=None)
def test_ams_counters_are_linear_and_order_free(xs, ys, rng):
    """AMS sign counters are sums of ±1: zs(A ++ B) = zs(A) + zs(B)
    elementwise (partitioned folds merge by addition — the 100 TB merge
    contract), any permutation folds to the same state, each |z_i| <= n
    with z_i ≡ n (mod 2), and the emitted min/median×2/max are exactly
    the sorted squared counters."""
    def fold(values):
        state = FakeState()
        out = list(
            _update_ams_fn(10_000)(
                ("k",), iter([pd.DataFrame({"value_id": values})]), state
            )
        )[-1]
        return state.get, out

    (na, za), _ = fold(xs)
    (nb, zb), _ = fold(ys)
    (nab, zab), out = fold(xs + ys)
    assert nab == na + nb == len(xs) + len(ys)
    assert list(zab) == [a + b for a, b in zip(za, zb)]
    shuffled = list(xs + ys)
    rng.shuffle(shuffled)
    (ns, zs_), _ = fold(shuffled)
    assert (ns, list(zs_)) == (nab, list(zab))
    for z in zab:
        assert abs(z) <= nab and (z - nab) % 2 == 0
    sq = sorted(z * z for z in zab)
    assert int(out["est_min"][0]) == sq[0]
    assert int(out["est_max"][0]) == sq[-1]
    assert int(out["est_median_x2"][0]) == sq[AMS_D // 2 - 1] + sq[AMS_D // 2]


@given(_seq_with_cuts(st.integers(0, 5_000), max_size=120))
@settings(max_examples=150, deadline=None)
def test_kmv_state_is_the_bottom_k_of_the_hash_union(seq_cuts):
    """For ANY batch split, the KMV state is exactly the K smallest
    DISTINCT hashes of everything seen (the sketch IS bottom-K of the
    union — what makes shard-merge exact), and the emission publishes
    the x13 closed-form estimate from the kth minimum."""
    seq, cuts = seq_cuts
    rows = pd.DataFrame({"value_id": seq})
    fn = _update_kmv_fn(10_000)
    state = FakeState()
    out = None
    for pdf in _frames(rows, cuts):
        out = list(fn(("k",), iter([pdf]), state))[-1]
    truth = sorted({((v % KMV_P) * KMV_A + KMV_B) % KMV_P for v in seq})[:KMV_K]
    n_seen, mins = state.get
    assert list(mins) == truth
    assert n_seen == len(seq)
    k = len(truth)
    assert int(out["k_kept"][0]) == k
    kth = truth[-1]
    assert int(out["kth_min_hash"][0]) == kth
    est = float(k) if k < KMV_K else ((k - 1) * KMV_P * 10000 // kth) / 1e4
    assert float(out["kmv_estimate"][0]) == est


@given(_seq_with_cuts(st.integers(1, 1 << 20), max_size=150))
@settings(max_examples=150, deadline=None)
def test_ddsketch_bucket_choice_equals_the_true_rank_elements_bucket(seq_cuts):
    """_dds_bucket is the monotone power-of-2 bucketing (2^b <= v <
    2^(b+1)), so for every q the smallest bucket whose cumulative count
    reaches ceil(q·n) is EXACTLY the bucket of the true rank-ceil(q·n)
    element of the sorted stream — the relative-error guarantee's load-
    bearing step — under any batch split."""
    import math

    seq, cuts = seq_cuts
    for v in (1, 2, 3, 4, 1 << 19):
        b = _dds_bucket(v)
        assert (1 << b) <= v < (1 << (b + 1))
    rows = pd.DataFrame({"value_id": seq})
    fn = _update_dds_fn(10_000)
    state = FakeState()
    out = None
    for pdf in _frames(rows, cuts):
        out = list(fn(("k",), iter([pdf]), state))[-1]
    n = len(seq)
    ordered = sorted(seq)
    for q, col in zip(DDS_QS, ("b50", "b95", "b99")):
        rank = math.ceil(q * n)
        assert int(out[col][0]) == _dds_bucket(ordered[rank - 1]), (q, seq)
    assert int(out["n_seen"][0]) == n


@given(_seq_with_cuts(st.integers(0, 200_000_000), max_size=100))
@settings(max_examples=150, deadline=None)
def test_lateness_histogram_matches_the_running_max_closed_form(seq_cuts):
    """Each message's lateness is (running max of prior event times −
    its own), bucketed on the fixed edges; the cumulative histogram
    equals the closed form computed from the flat sequence, partitions
    the stream, and ignores batch splits."""
    seq, cuts = seq_cuts
    rows = pd.DataFrame({"us": seq, "offset": range(len(seq))})
    fn = _update_lateness_fn(10_000)
    state = FakeState()
    out = None
    for pdf in _frames(rows, cuts):
        out = list(fn(("k",), iter([pdf]), state))[-1]
    buckets = [0] * 5
    mx = -1
    for us in seq:
        late = max(0, mx - us) if mx >= 0 else 0
        if late <= _LATENESS_EDGES_US[0]:
            buckets[0] += 1
        else:
            buckets[
                sum(late >= e for e in _LATENESS_EDGES_US[1:]) + 1
            ] += 1
        mx = max(mx, us)
    got = [int(out[c][0]) for c in ("on_time", "lt_1s", "lt_10s", "lt_100s", "ge_100s")]
    assert got == buckets
    assert sum(got) == int(out["n_msgs"][0]) == len(seq)
    assert int(out["max_event_us"][0]) == max(seq)


# -- the remaining stateful cores: split invariance completes the set -------
from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (  # noqa: E402
    _update_latest_fn,
    _update_rate_fn,
    _update_session_fn,
    _update_totals_fn,
)


@given(
    _seq_with_cuts(st.integers(0, 50_000_000), max_size=80),
    st.integers(1, 20),
    st.integers(1, 10),
)
@settings(max_examples=150, deadline=None)
def test_rate_limiter_bounds_and_split_invariance(seq_cuts, rate, burst):
    """Token bucket invariants for any event-time sequence and any batch
    split: final state is split-invariant, tokens stay in [0, burst],
    and the two analytic regimes hold — zero event-time span accepts
    exactly min(n, burst) (no refill ever), and gaps large enough to
    refill a full cost accept everything."""
    seq, cuts = seq_cuts
    rate_mk = rate * 1_000_000
    rows = pd.DataFrame({"us": seq, "offset": range(len(seq))})

    def run(frames):
        fn = _update_rate_fn(rate_mk, burst, retention_ms=10_000)
        state = FakeState()
        tot_acc = 0
        for pdf in frames:
            out = list(fn(("k",), iter([pdf]), state))[-1]
            tot_acc += int(out["n_accepted"][0])
        return tot_acc, state.get

    acc_split, st_split = run(_frames(rows, cuts))
    acc_one, st_one = run([rows])
    assert (acc_split, st_split) == (acc_one, st_one)
    tokens, _ = st_one
    assert 0 <= tokens <= burst * 1000
    # regime 1: all arrivals at one instant -> exactly the burst drains
    same = pd.DataFrame({"us": [7] * len(seq), "offset": range(len(seq))})
    acc_same, _ = run([same])
    assert acc_same == min(len(seq), burst)
    # regime 2: every gap refills >= one full cost -> nothing throttles
    refill_gap = (1000 * 1_000_000_000) // rate_mk + 1
    spaced = pd.DataFrame(
        {"us": [i * refill_gap for i in range(len(seq))],
         "offset": range(len(seq))}
    )
    acc_spaced, _ = run([spaced])
    assert acc_spaced == len(seq)


@given(
    _seq_with_cuts(st.integers(0, 500_000), max_size=60),
    st.integers(1, 10_000),
)
@settings(max_examples=150, deadline=None)
def test_session_tracker_matches_the_gap_split_closed_form(seq_cuts, gap_ms):
    """The emitted closed sessions (plus the final open one in state)
    are exactly the gaps-and-islands split of the ordered feed —
    independent of micro-batch boundaries."""
    seq, cuts = seq_cuts
    rows = pd.DataFrame({"ms": seq, "offset": range(len(seq))})

    def run(frames):
        fn = _update_session_fn(gap_ms, retention_ms=10_000)
        state = FakeState()
        closed = []
        for pdf in frames:
            for out in fn(("u",), iter([pdf]), state):
                closed.extend(
                    (int(a), int(b), int(c))
                    for a, b, c in zip(
                        out["session_start_ms"],
                        out["session_end_ms"],
                        out["n_events"],
                    )
                )
        return closed, state.get

    got, open_state = run(_frames(rows, cuts))
    got1, open1 = run([rows])
    assert (got, open_state) == (got1, open1)
    # closed form: split the ordered feed wherever silence exceeds gap_ms
    sessions, cur = [], None
    for ms in seq:
        if cur is None:
            cur = [ms, ms, 1]
        elif ms - cur[1] > gap_ms:
            sessions.append(tuple(cur))
            cur = [ms, ms, 1]
        else:
            cur[1] = max(cur[1], ms)
            cur[2] += 1
    assert got == sessions
    assert open_state == tuple(cur)  # the final session stays open


@given(_seq_with_cuts(st.integers(0, 10_000), max_size=80))
@settings(max_examples=100, deadline=None)
def test_running_totals_are_exact_stream_moments(seq_cuts):
    """Totals/min/max are the exact moments of the whole stream under
    any batch split."""
    seq, cuts = seq_cuts
    rows = pd.DataFrame({"n_bytes": seq})
    fn = _update_totals_fn(retention_ms=10_000)
    state = FakeState()
    out = None
    for pdf in _frames(rows, cuts):
        out = list(fn(("k",), iter([pdf]), state))[-1]
    assert int(out["total_messages"][0]) == len(seq)
    assert int(out["total_bytes"][0]) == sum(seq)
    assert int(out["min_bytes"][0]) == min(seq)
    assert int(out["max_bytes"][0]) == max(seq)


@given(_seq_with_cuts(st.text(max_size=8), max_size=60))
@settings(max_examples=100, deadline=None)
def test_latest_state_elects_the_max_offset_row(seq_cuts):
    """The compacted winner is the max-offset row of the whole feed,
    under any batch split (offsets here are the global feed index, so
    the winner is simply the LAST value)."""
    seq, cuts = seq_cuts
    rows = pd.DataFrame(
        {"offset": range(len(seq)), "value_str": [str(v) for v in seq]}
    )
    fn = _update_latest_fn(retention_ms=10_000)
    state = FakeState()
    out = None
    for pdf in _frames(rows, cuts):
        out = list(fn(("k",), iter([pdf]), state))[-1]
    assert int(out["last_offset"][0]) == len(seq) - 1
    assert out["last_value"][0] == str(seq[-1])


# -- histogram drift core: the last core without a property ------------------
from squonk2_fastapi_ws_event_stream_spark.streaming.stateful import (  # noqa: E402
    _drift_ppm,
    _update_drift_fn,
    DRIFT_BUCKETS,
)


@given(
    st.dictionaries(
        st.integers(0, 12),
        st.lists(st.integers(-500, 70_000), min_size=1, max_size=15),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 4),
)
@settings(max_examples=150, deadline=None)
def test_drift_core_matches_the_fraction_closed_form(by_period, n_batches):
    """For a period-ordered feed under any batch split: the reference is
    the previous period's histogram iff that period is ADJACENT (a gap
    empties it), the published ks/l1 equal floor(1e6 x the exact
    rational KS/L1 distance) computed independently with Fractions, and
    a trailing batch of strictly-stale periods changes nothing."""
    from fractions import Fraction

    lo, width = 0, 1000
    periods = sorted(by_period)
    seq = [(p, v) for p in periods for v in by_period[p]]
    rows = pd.DataFrame(
        {"period": [p for p, _ in seq], "value_id": [v for _, v in seq]}
    )
    size = max(1, len(rows) // n_batches)
    frames = [rows.iloc[i : i + size] for i in range(0, len(rows), size)]

    def run(fs):
        fn = _update_drift_fn(lo, width, retention_ms=10_000)
        state = FakeState()
        out = None
        for pdf in fs:
            out = list(fn(("k",), iter([pdf]), state))[-1]
        return out, state.get

    out, st_split = run(frames)
    out1, st_one = run([rows])
    assert st_split[0] == st_one[0]
    assert list(st_split[1]) == list(st_one[1])
    assert list(st_split[2]) == list(st_one[2])

    def hist(vals):
        h = [0] * DRIFT_BUCKETS
        for v in vals:
            h[min(max((v - lo) // width, 0), DRIFT_BUCKETS - 1)] += 1
        return h

    last = periods[-1]
    ref = (
        hist(by_period[last - 1])
        if len(periods) > 1 and periods[-2] == last - 1
        else [0] * DRIFT_BUCKETS
    )
    cur = hist(by_period[last])
    assert int(out["period"][0]) == last
    assert int(out["n_ref"][0]) == sum(ref)
    assert int(out["n_cur"][0]) == sum(cur)
    n_r, n_c = sum(ref), sum(cur)
    if n_r == 0 or n_c == 0:
        assert (int(out["ks_ppm"][0]), int(out["l1_ppm"][0])) == (-1, -1)
    else:
        cum_r = cum_c = 0
        ks = Fraction(0)
        l1 = Fraction(0)
        for r, c in zip(ref, cur):
            cum_r += r
            cum_c += c
            ks = max(ks, abs(Fraction(cum_c, n_c) - Fraction(cum_r, n_r)))
            l1 += abs(Fraction(c, n_c) - Fraction(r, n_r))
        assert int(out["ks_ppm"][0]) == (ks.numerator * 1_000_000) // ks.denominator
        assert int(out["l1_ppm"][0]) == (l1.numerator * 1_000_000) // l1.denominator
        assert (int(out["ks_ppm"][0]), int(out["l1_ppm"][0])) == _drift_ppm(ref, cur)

    # strictly-stale tail batch: dropped without touching the stats
    if last > 0:
        stale = pd.DataFrame({"period": [0, last - 1], "value_id": [1, 2]})
        out2, st2 = run(frames + [stale])
        assert out2.equals(out)
        assert st2[0] == st_one[0]
        assert list(st2[1]) == list(st_one[1])
        assert list(st2[2]) == list(st_one[2])
