"""Property tests for the concat-and-cut packing arithmetic
(plans/llm_pipeline.pack_sequences_boundaries).

The Spark and DuckDB sides share one set of integer formulas: exclusive
running sum `cum`, sequence span [cum div L, (cum+n-1) div L], offsets
clamped to [0, L]. These properties prove the formulas — over arbitrary
token-length lists, not just the fixtures — so the oracle equality in
CORRECTNESS is testing two correct implementations, not two copies of
one mistake:

- every token of every doc lands in exactly one sequence slot,
- slots within a sequence never overlap and sort contiguously,
- every sequence is filled to exactly L except the final one.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

L = 256


def pack(n_tokens: list[int]):
    """Pure mirror of the shared formulas: (doc_idx, seq_id, s_off,
    e_off) rows for one shard's doc list."""
    rows = []
    cum = 0
    for i, n in enumerate(n_tokens):
        if n <= 0:
            continue
        for seq in range(cum // L, (cum + n - 1) // L + 1):
            s = max(cum - seq * L, 0)
            e = min(cum + n - seq * L, L)
            rows.append((i, seq, s, e))
        cum += n
    return rows, cum


@given(st.lists(st.integers(min_value=0, max_value=1000), max_size=60))
@settings(max_examples=300, deadline=None)
def test_every_token_in_exactly_one_slot(lens):
    rows, total = pack(lens)
    assert sum(e - s for (_, _, s, e) in rows) == total
    # per doc: its slots are contiguous and sum to its length
    per_doc: dict[int, list[tuple[int, int, int]]] = {}
    for d, seq, s, e in rows:
        per_doc.setdefault(d, []).append((seq, s, e))
    for d, slots in per_doc.items():
        slots.sort()
        assert sum(e - s for (_, s, e) in slots) == lens[d]
        # consecutive sequences; interior slots span the full [0, L)
        seqs = [q for (q, _, _) in slots]
        assert seqs == list(range(seqs[0], seqs[0] + len(seqs)))
        for j, (_, s, e) in enumerate(slots):
            if j > 0:
                assert s == 0
            if j < len(slots) - 1:
                assert e == L


@given(st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_sequences_fill_exactly_except_the_last(lens):
    rows, total = pack(lens)
    by_seq: dict[int, int] = {}
    for _, seq, s, e in rows:
        by_seq[seq] = by_seq.get(seq, 0) + (e - s)
        assert 0 <= s < e <= L
    last = max(by_seq)
    assert by_seq == {**{q: L for q in range(last)}, last: by_seq[last]}
    assert by_seq[last] == total - last * L
