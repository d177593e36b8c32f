"""Property-based tests (hypothesis) for the pure-math layers: cascade
statistics, long-context splitting, hashing, postprocessing.

SURVEY §5 implication: "the accuracy guarantee is the headline feature —
port the math exactly and property-test it against simulated oracles."
These run without Spark (driver-side numerics only), so hypothesis can
afford hundreds of examples.
"""

import numpy as np
import pytest
from hypothesis import given, settings as hyp_settings
from hypothesis import strategies as st

from lotus_spark.cascades.utils import (
    calibrate_scores,
    importance_sampling,
    learn_filter_thresholds,
)
from lotus_spark.long_context import split_tokenwise, truncate_doc
from lotus_spark.models import EchoLM, HashRM
from lotus_spark.operators.postprocessors import parse_bool
from lotus_spark.operators.sem_topk import _parse_choice


# ------------------------------------------------------------ cascade math
@given(st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False),
                min_size=1, max_size=300))
def test_calibrate_scores_is_monotone_rank_map(raw):
    scores = np.array(raw)
    cal = calibrate_scores(scores)
    assert ((cal > 0) & (cal <= 1)).all()
    # order-preserving: strictly larger raw score → calibrated >=
    order = np.argsort(scores, kind="stable")
    assert (np.diff(cal[order]) >= -1e-12).all()


@given(st.integers(min_value=25, max_value=400),
       st.floats(min_value=0.05, max_value=0.9))
def test_importance_sampling_weights_reconstruct_total(n, pct):
    rng = np.random.default_rng(7)
    scores = rng.random(n)
    idx, corr = importance_sampling(scores, pct, seed=3)
    assert len(idx) == len(set(idx.tolist()))  # without replacement
    assert (corr > 0).all()
    # Horvitz-Thompson-ish: weighted sample count estimates population size
    # (loose tolerance — sampling w/o replacement biases the naive weights)
    est = corr.sum()
    assert 0.25 * n <= est <= 4.0 * n


@given(st.integers(min_value=30, max_value=400),
       st.floats(min_value=0.5, max_value=0.95),
       st.floats(min_value=0.5, max_value=0.95))
@hyp_settings(max_examples=40)
def test_thresholds_certified_precision_holds_on_sample(n, prec_t, rec_t):
    """On the labeled sample itself, the accept region at the learned τ⁺
    must meet the precision target (the Hoeffding correction only makes the
    certificate harder, never easier)."""
    rng = np.random.default_rng(n)
    scores = np.round(rng.random(n), 3)
    labels = rng.random(n) < scores  # well-calibrated oracle
    w = np.ones(n)
    tp, tn = learn_filter_thresholds(scores, labels, w, rec_t, prec_t, 0.2)
    assert 0.0 <= tn <= min(tp, 1.0) or tp == 2.0
    if tp <= 1.0:
        mask = scores >= tp
        assert labels[mask].mean() >= prec_t - 1e-9
    if tn > 0.0:
        dropped = labels[scores <= tn].sum()
        assert dropped / max(labels.sum(), 1) <= 1.0 - rec_t + 1e-9


def test_thresholds_all_negative_oracle_accepts_nothing():
    scores = np.linspace(0.01, 1.0, 50)
    labels = np.zeros(50, dtype=bool)
    tp, tn = learn_filter_thresholds(scores, labels, np.ones(50), 0.9, 0.9, 0.2)
    assert tp == 2.0  # nothing is precision-certifiable


# ----------------------------------------------------------- long context
@given(st.lists(st.text(alphabet=st.characters(
    whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=12),
    min_size=1, max_size=200), st.integers(min_value=5, max_value=60))
def test_split_tokenwise_lossless_and_bounded(words, budget):
    text = " ".join(words)
    lm = EchoLM()
    pieces = split_tokenwise(text, lm, budget)
    assert " ".join(pieces) == text  # lossless word stream
    for p in pieces:
        # budget holds unless the piece is one single overlong word
        assert lm.count_tokens(p) <= budget or " " not in p
    out = truncate_doc(text, lm, budget)
    assert lm.count_tokens(out) <= budget + 2


# ----------------------------------------------------------------- hashing
@given(st.text(max_size=200))
def test_hashrm_is_deterministic_and_unit_norm(doc):
    a = HashRM(dim=32)(np.array([doc], dtype=object).tolist())
    b = HashRM(dim=32)([doc])
    assert np.allclose(a, b)
    n = np.linalg.norm(a[0])
    assert n == 0.0 or abs(n - 1.0) < 1e-5


# ------------------------------------------------------------ postprocess
@given(st.text(max_size=50))
def test_parse_bool_never_crashes_and_defaults(garbage):
    out = parse_bool(garbage, default=True)
    assert out in (True, False)
    if "true" not in garbage.lower() and "false" not in garbage.lower():
        assert out is True  # default wins on garbage
    assert parse_bool("True") is True
    assert parse_bool("  false ", default=True) is False


@given(st.text(max_size=80))
def test_parse_choice_total(garbage):
    assert _parse_choice(garbage) in (0, 1)
    assert _parse_choice(garbage + " Document 2") == 1
    assert _parse_choice("Document 2 then Document 1") == 0


# ------------------------------------------------------- jaccard counting
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 30)),
        min_size=0, max_size=200,
    ),
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 30)),
        min_size=0, max_size=200,
    ),
)
def test_cooccurrence_sparse_equals_dense(l_post, r_post):
    """The sparse bincount expansion must equal the dense posting-matrix
    matmul it replaces, for any posting lists (incl. duplicates/empties)."""
    from lotus_spark.functions.dedup import _cooccurrence_counts

    n_l, n_r = 8, 6
    # dedupe (doc, shingle) pairs — postings are sets per doc
    l_post = sorted(set(l_post))
    r_post = sorted(set(r_post))
    l_docs = np.array([d for d, _ in l_post], dtype=np.int64)
    l_sh = np.array([s for _, s in l_post], dtype=np.int64)
    r_docs = np.array([d for d, _ in r_post], dtype=np.int64)
    r_sh = np.array([s for _, s in r_post], dtype=np.int64)

    got = _cooccurrence_counts(l_docs, l_sh, r_docs, r_sh, n_l, n_r)

    ML = np.zeros((n_l, 31))
    ML[l_docs, l_sh] = 1.0
    MR = np.zeros((n_r, 31))
    MR[r_docs, r_sh] = 1.0
    want = ML @ MR.T
    assert (got == want).all()


@given(
    st.dictionaries(
        st.text(st.characters(min_codepoint=97, max_codepoint=122),
                min_size=1, max_size=4),
        st.floats(min_value=0.001, max_value=100, allow_nan=False),
        min_size=1, max_size=8,
    ),
    st.integers(min_value=0, max_value=10_000),
)
@hyp_settings(max_examples=200, deadline=None)
def test_largest_remainder_quotas_properties(weights, total):
    """Quotas sum exactly to total and each sits within [floor, ceil] of
    its proportional share (the apportionment invariants largest-remainder
    guarantees; monotonicity in total is NOT one of them — Alabama
    paradox — and is deliberately not asserted)."""
    import math

    from lotus_spark.functions.sampling import largest_remainder_quotas

    quota = largest_remainder_quotas(weights, total)
    assert set(quota) == set(weights)
    assert sum(quota.values()) == total
    norm = sum(weights.values())
    for k, v in weights.items():
        share = total * v / norm
        assert math.floor(share) <= quota[k] <= math.ceil(share), (
            k, share, quota[k])


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 20)),  # (term, weight)
        min_size=0, max_size=200,
    ),
    st.integers(1, 12),       # capacity
    st.integers(1, 5),        # number of batches the stream splits into
)
@hyp_settings(max_examples=120, deadline=None)
def test_misra_gries_merge_guarantees(pairs, capacity, n_batches):
    """The streaming heavy-hitters summary's textbook guarantees, on the
    pure merge function (streaming/ops.py::mg_merge): (1) at most
    `capacity` counters; (2) estimates never overcount; (3) each
    estimate undercounts by at most total/(capacity+1); (4) every term
    with true frequency above that bound is PRESENT; (5) batch
    splitting never changes totals' bounds (merge is stream-order
    tolerant within the guarantee)."""
    from collections import Counter

    from lotus_spark.streaming.ops import mg_merge

    truth = Counter()
    for t, w in pairs:
        truth[t] += w
    total = sum(truth.values())

    c: dict = {}
    step = max(1, len(pairs) // n_batches)
    for i in range(0, len(pairs), step):
        batch = Counter()
        for t, w in pairs[i:i + step]:
            batch[t] += w
        c = mg_merge(c, dict(batch), capacity)

    assert len(c) <= capacity                                  # (1)
    err = total / (capacity + 1)
    for t, est in c.items():
        assert est <= truth[t], (t, est, truth[t])             # (2)
        assert truth[t] - est <= err + 1e-9, (t, est)          # (3)
    for t, f in truth.items():
        if f > err:
            assert t in c, (t, f, err, dict(c))                # (4)


@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=1, max_size=70, unique=True),
       st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=20))
@hyp_settings(max_examples=40, deadline=None)
def test_heap_topk_wave_equals_serial_equals_sorted(vals, K, batch):
    """r9 wave-batched heap_topk: for EVERY consistent comparator
    (distinct integer values compared by magnitude), any wave size must
    return exactly the serial protocol's answer — which is the global
    sorted top-K. Exercises uneven final waves, K > n, single-doc
    inputs, and batch_size=1 (the serial degenerate) by construction."""
    from lotus_spark.operators.sem_topk import BatchedComparator, heap_topk
    from lotus_spark.models.fake_lm import FakeLM

    docs = [f"{v:07d}" for v in vals]

    def fn(prompt: str) -> str:
        import re as _re

        d1, d2 = _re.search(
            r"Document 1:\n(\d+)\n\nDocument 2:\n(\d+)", prompt).groups()
        return "Document 1" if int(d1) > int(d2) else "Document 2"

    expected = sorted(range(len(vals)), key=lambda i: -vals[i])[:K]
    got = heap_topk(docs, K, BatchedComparator(FakeLM(fn), "bigger"),
                    batch_size=batch)
    assert got == expected
