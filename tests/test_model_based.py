"""Model-based invariant test (hypothesis): a random sequence of put/remove
ops against a cuckoo filter, checked against an exact multiset model — the
zero-false-negative invariant must hold after EVERY operation.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from guava_probably_spark.sketches import BloomSketch, CuckooSketch
from guava_probably_spark.sketches.base import FUNNEL_LONG

ops_strategy = st.lists(
    st.tuples(
        st.sampled_from(["put", "remove", "probe_all"]),
        st.integers(min_value=0, max_value=300),
    ),
    min_size=1,
    max_size=120,
)


@given(ops_strategy)
@settings(max_examples=40, deadline=None)
def test_cuckoo_no_false_negatives_under_random_ops(ops):
    sk = CuckooSketch(2000, 0.01, funnel=FUNNEL_LONG)
    model: dict[int, int] = {}  # element -> multiplicity
    for op, x in ops:
        if op == "put":
            if sk.put(x):
                model[x] = model.get(x, 0) + 1
        elif op == "remove":
            if model.get(x, 0) > 0:  # only remove known-added (reference hazard)
                assert sk.remove(x), f"remove({x}) failed though present"
                model[x] -= 1
        else:
            live = [k for k, v in model.items() if v > 0]
            if live:
                assert sk.might_contain_batch(
                    np.array(live, dtype=np.int64)
                ).all(), "false negative!"
    live = [k for k, v in model.items() if v > 0]
    if live:
        assert sk.might_contain_batch(np.array(live, dtype=np.int64)).all()
    assert sk.size == sum(model.values())


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=500))
@settings(max_examples=30, deadline=None)
def test_bloom_no_false_negatives_any_input(xs):
    sk = BloomSketch(600, 0.01, funnel=FUNNEL_LONG)
    sk.update(np.array(xs, dtype=np.int64))
    assert sk.might_contain_batch(np.array(xs, dtype=np.int64)).all()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=200),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=30, deadline=None)
def test_mg_bracketing_under_random_splits(parts):
    """Misra-Gries: for ANY split of ANY stream into parts built separately
    and merged in order, every tracked counter brackets the true frequency
    and the total decrement stays within n/(k+1)."""
    from collections import Counter

    from guava_probably_spark.sketches import MisraGriesSketch

    k = 16
    acc = MisraGriesSketch(k=k)
    for part in parts:
        s = MisraGriesSketch(k=k)
        s.update(np.array(part, dtype=np.int64))
        acc.merge(s)
    true = Counter(x for part in parts for x in part)
    n = sum(len(p) for p in parts)
    assert acc.n == n
    assert acc.e <= n / (k + 1)
    for item, c in acc.counters.items():
        assert c <= true[item] <= c + acc.e
    # no false negatives above the bound
    for item, f in true.items():
        if f > n / (k + 1):
            assert item in acc.counters


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=400),
    st.permutations([0, 1, 2]),
)
@settings(max_examples=30, deadline=None)
def test_theta_blob_equal_for_any_split_and_merge_order(xs, order):
    """Theta/KMV: the retained set is the k smallest distinct hashes of the
    stream — byte-equal blobs for ANY 3-way split merged in ANY order."""
    from guava_probably_spark.sketches import ThetaSketch
    from guava_probably_spark.sketches.base import FUNNEL_LONG

    k = 32
    direct = ThetaSketch(k=k, funnel=FUNNEL_LONG)
    direct.update(np.array(xs, dtype=np.int64))
    parts = [xs[i::3] for i in range(3)]
    sks = []
    for part in parts:
        s = ThetaSketch(k=k, funnel=FUNNEL_LONG)
        if part:
            s.update(np.array(part, dtype=np.int64))
        sks.append(s)
    acc = sks[order[0]].copy()
    acc.merge(sks[order[1]]).merge(sks[order[2]])
    assert acc.to_bytes() == direct.to_bytes()
    if len(set(xs)) < k:
        # exact strictly below saturation. At EXACTLY k distinct the pure
        # KMV state (k smallest hashes, theta = k-th) is indistinguishable
        # from a trimmed >k stream — hypothesis found the boundary (xs =
        # 0..31): the estimator (k-1)/theta applies there, within bound
        assert acc.estimate() == float(len(set(xs)))
    else:
        err = abs(acc.estimate() - len(set(xs))) / len(set(xs))
        assert err <= acc.relative_error_bound(nsigma=4.0)


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=400),
    st.permutations([0, 1, 2]),
)
@settings(max_examples=25, deadline=None)
def test_sbf_zero_fn_and_blob_equal_any_split_and_merge_order(xs, order):
    """Scalable bloom under hypothesis: any 3-way split of any input,
    merged in any order, yields (a) zero false negatives for every
    inserted element and (b) a blob byte-equal to every other merge order
    (canonical stage-set union)."""
    from guava_probably_spark.sketches import ScalableBloomSketch

    def build(chunk):
        sk = ScalableBloomSketch(64, 0.05, funnel=FUNNEL_LONG)
        if len(chunk):
            sk.update(np.array(chunk, dtype=np.int64))
        return sk

    parts = [xs[0::3], xs[1::3], xs[2::3]]
    sketches = [build(p) for p in parts]
    acc = build([])
    for i in order:
        acc.merge(sketches[i])
    baseline = build(parts[0]).merge(build(parts[1])).merge(build(parts[2]))
    assert acc.to_bytes() == baseline.to_bytes()
    assert acc.might_contain_batch(np.array(xs, dtype=np.int64)).all()
    # occupancy-honest compound estimate never exceeds the union of the
    # surviving stages' occupancy fpps by construction
    assert 0.0 <= acc.expected_fpp() < 1.0
