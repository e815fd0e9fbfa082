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
