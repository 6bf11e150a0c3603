"""Property-based tests (hypothesis) for the round-5 operators.

Pure-Python properties (no Spark round-trip, so generous example
budgets): the InDel ratio must agree with an independent
difference-based LCS reference and satisfy metric-style invariants;
token_set_ratio must be symmetric, bounded, and exactly 100 on equal
token SETS; the bucket-guard and RRF invariants that fixed examples
can miss.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fantasy_premier_league_spark.operators.fuzzy import _indel_ratio, token_set_ratio

WORDS = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=5), min_size=0, max_size=6
).map(lambda ws: " ".join(ws))


def _lcs_ref(a: str, b: str) -> int:
    """Independent quadratic LCS (full-matrix, different construction)."""
    m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            m[i][j] = (
                m[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1] else max(m[i - 1][j], m[i][j - 1])
            )
    return m[len(a)][len(b)]


class TestIndelRatioProperties:
    @settings(max_examples=200, deadline=None)
    @given(a=st.text(alphabet="abcxyz ", max_size=12), b=st.text(alphabet="abcxyz ", max_size=12))
    def test_matches_independent_lcs_reference(self, a, b):
        got = _indel_ratio(a, b)
        if not a and not b:
            assert got == 100.0
        else:
            assert got == 200.0 * _lcs_ref(a, b) / (len(a) + len(b))

    @settings(max_examples=200, deadline=None)
    @given(a=st.text(alphabet="abcxyz ", max_size=12), b=st.text(alphabet="abcxyz ", max_size=12))
    def test_symmetric_bounded_and_identity(self, a, b):
        assert _indel_ratio(a, b) == _indel_ratio(b, a)
        assert 0.0 <= _indel_ratio(a, b) <= 100.0
        assert _indel_ratio(a, a) == 100.0


class TestTokenSetRatioProperties:
    @settings(max_examples=150, deadline=None)
    @given(a=WORDS, b=WORDS)
    def test_symmetric_and_bounded(self, a, b):
        assert token_set_ratio(a, b) == token_set_ratio(b, a)
        assert 0.0 <= token_set_ratio(a, b) <= 100.0

    @settings(max_examples=150, deadline=None)
    @given(ws=st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=5), min_size=1, max_size=6), data=st.data())
    def test_equal_token_sets_score_100(self, ws, data):
        # any permutation + duplication of the same token set is a 100
        perm = data.draw(st.permutations(ws))
        dup = perm + [perm[0]]
        assert token_set_ratio(" ".join(ws), " ".join(dup)) == 100.0

    @settings(max_examples=150, deadline=None)
    @given(
        ws=st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=5), min_size=2, max_size=8, unique=True),
        k=st.integers(min_value=1, max_value=7),
    )
    def test_token_subset_scores_100(self, ws, k):
        # rapidfuzz token_set property: a token-subset is a perfect match
        # (the intersection equals one side entirely)
        subset = ws[: min(k, len(ws))]
        assert token_set_ratio(" ".join(subset), " ".join(ws)) == 100.0


class TestPrefixFilterLemma:
    """The lossless claim of prefix_filtered_jaccard_pairs, attacked with
    random corpora: every pair at/above the Jaccard threshold MUST share
    a token inside both prefixes (same global order, same float-floor
    prefix length, same length filter as the Spark operator) — including
    the t*|S|-exactly-integer edge cases fixed examples miss."""

    @settings(max_examples=300, deadline=None)
    @given(
        corpus=st.lists(
            st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=12),
            min_size=2,
            max_size=8,
        ),
        threshold=st.sampled_from([0.2, 0.25, 1 / 3, 0.5, 2 / 3, 0.75, 0.8]),
    )
    def test_true_pairs_always_survive_candidate_generation(self, corpus, threshold):
        import math
        from collections import Counter

        df = Counter(tok for s in corpus for tok in s)
        order = lambda tok: (df[tok], tok)

        def prefix(s):
            n = len(s)
            plen = n - math.floor(threshold * n) + 1
            return set(sorted(s, key=order)[: max(plen, 0)])

        for i in range(len(corpus)):
            for j in range(i + 1, len(corpus)):
                a, b = corpus[i], corpus[j]
                inter = len(a & b)
                jac = inter / len(a | b)
                if jac >= threshold:
                    # length filter must not reject a true pair
                    la, lb = len(a), len(b)
                    assert threshold * la <= lb and threshold * lb <= la
                    # prefix collision must exist (the pigeonhole lemma)
                    assert prefix(a) & prefix(b), (
                        f"true pair lost: {a} {b} jac={jac} t={threshold}"
                    )
