"""BPE tokenizer (ext.bpe): trainer determinism, encoder correctness,
the one-merge-per-step sequentialization the DuckDB oracle relies on,
and the distributed count kernel vs a driver-side recompute."""

import random

from mopso_engine.ext.bpe import (
    _merge_word,
    bpe_token_counts,
    encode_word,
    pinned_merges,
    train_bpe_from_counts,
)


def test_trainer_known_example():
    # classic Sennrich toy corpus: 'low'x5 'lower'x2 'newest'x6 'widest'x3
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_from_counts(counts, n_merges=4)
    # most frequent first pair: ('e','s') count 9 (newest+widest), then
    # ('es','t') 9, then ('est','</w>') 9, then ('l','o') 7
    assert merges[:4] == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")]


def test_trainer_deterministic_and_early_stop():
    counts = {"ab": 1, "cd": 1}  # no pair repeats -> zero merges
    assert train_bpe_from_counts(counts, n_merges=10) == []
    c2 = {"aaab": 3, "abab": 2}
    assert train_bpe_from_counts(c2, n_merges=5) == train_bpe_from_counts(
        c2, n_merges=5
    )


def test_encode_word_applies_ranks_in_order():
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("est", "</w>"): 2, ("l", "o"): 3}
    assert encode_word("newest", ranks) == ("n", "e", "w", "est</w>")
    assert encode_word("lo", ranks) == ("lo", "</w>")
    assert encode_word("xyz", ranks) == ("x", "y", "z", "</w>")


def test_overlapping_run_merges_left_to_right():
    ranks = {("a", "a"): 0}
    assert encode_word("aaa", ranks) == ("aa", "a", "</w>")
    assert encode_word("aaaa", ranks) == ("aa", "aa", "</w>")


def _encode_one_at_a_time(word, ranks):
    """The oracle's sequentialization: ONE merge per step — lowest rank,
    leftmost occurrence."""
    syms = list(word) + ["</w>"]
    while True:
        best = None  # (rank, pos)
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            return tuple(syms)
        i = best[1]
        syms[i : i + 2] = [syms[i] + syms[i + 1]]


def test_oracle_sequentialization_equivalent():
    """The DuckDB oracle merges one occurrence per recursive step; the
    Spark kernel batch-merges all occurrences of the chosen pair. Both
    must reach the same fixpoint for every word (the creation-order rank
    argument) — checked over random words under the PINNED merges and
    under adversarial run-heavy ranks."""
    ranks = {tuple(p): i for i, p in enumerate(pinned_merges())}
    rng = random.Random(11)
    alphabet = "aerostwlnd"
    for _ in range(300):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        assert encode_word(w, ranks) == _encode_one_at_a_time(w, ranks)
    run_ranks = {("a", "a"): 0, ("aa", "a"): 1, ("aa", "aa"): 2, ("b", "a"): 3}
    for _ in range(200):
        w = "".join(rng.choice("ab") for _ in range(rng.randint(1, 12)))
        assert encode_word(w, run_ranks) == _encode_one_at_a_time(w, run_ranks)


def test_merge_word_nonoverlapping():
    assert _merge_word(("a", "b", "a", "b"), ("a", "b")) == ("ab", "ab")
    assert _merge_word(("a", "a", "a"), ("a", "a")) == ("aa", "a")


def test_bpe_token_counts_matches_driver_recompute(spark):
    ranks = {tuple(p): i for i, p in enumerate(pinned_merges())}
    rows = [
        (1, "the river flows south under a low dark tower"),
        (2, "Data pipelines PACK documents into sequences"),
        (3, "   "),
        (4, "aaa aaaa newest"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in bpe_token_counts(docs).collect()}
    for doc_id, text in rows:
        words = [w for w in text.strip().lower().split() if w]
        want = (len(words), sum(len(encode_word(w, ranks)) for w in words))
        assert got[doc_id] == want
    assert got[3] == (0, 0)  # whitespace-only doc counts zero, not one


def test_pack_sequences_count_col(spark):
    from mopso_engine.ext.pipeline import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c", 10), (2, "d e", 300), (3, "f", 7)],
        "doc_id long, text string, n_bpe_tokens long",
    )
    by_col = {r["doc_id"]: r for r in pack_sequences(
        docs, seq_len=128, buckets=2, count_col="n_bpe_tokens"
    ).collect()}
    assert {d: r["n_tokens"] for d, r in by_col.items()} == {1: 10, 2: 300, 3: 7}
    # offsets must accumulate the supplied counts, and a 300-token doc
    # spans multiple 128-token sequences
    assert by_col[2]["last_seq"] >= by_col[2]["first_seq"]
    total = sum(r["n_tokens"] for r in by_col.values())
    assert total == 317


def test_chunk_documents_bpe_invariants(spark):
    from mopso_engine.ext.text import chunk_documents_bpe

    ranks = {tuple(p): i for i, p in enumerate(pinned_merges())}
    text = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "unrelated engineers measure tokenizer throughput across nine "
        "availability zones and a very long pneumonoultramicroscopic word"
    )
    docs = spark.createDataFrame([(1, text), (2, "one"), (3, "  ")],
                                 "doc_id long, text string")
    budget, over = 12, 4
    out = sorted(
        chunk_documents_bpe(docs, budget_tokens=budget, overlap_tokens=over).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc  # whitespace-only doc emits nothing
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_words"] == 1
    chunks = by_doc[1]
    # chunk_idx is dense from 0
    assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
    words = text.lower().split()
    cost = {w: len(encode_word(w, ranks)) for w in words}
    for c in chunks:
        ws = c["chunk_text"].split()
        assert c["n_words"] == len(ws)
        assert c["n_bpe_tokens"] == sum(cost[w] for w in ws)
        # budget respected unless the chunk is a single over-budget word
        assert c["n_bpe_tokens"] <= budget or c["n_words"] == 1
    # every word position covered in order: concatenating the
    # non-overlapped prefixes reproduces the document
    rebuilt, pos = [], 0
    for i, c in enumerate(chunks):
        ws = c["chunk_text"].split()
        # this chunk's words are the document's words at some start <= pos
        starts = [j for j in range(len(words) - len(ws) + 1) if words[j:j+len(ws)] == ws]
        assert starts, f"chunk {i} is not a contiguous slice of the doc"
        s = [st for st in starts if st <= pos]
        assert s, "chunk starts beyond an uncovered gap"
        st = max(s)
        # carried-over suffix must fit the overlap budget (except a
        # forced single-word advance)
        if i > 0 and pos - st > 0:
            carried = words[st:pos]
            assert sum(cost[w] for w in carried) <= over or len(ws) == 1
        pos = st + len(ws)
    assert pos == len(words)  # last chunk reaches the final word


def test_chunk_documents_bpe_guards(spark):
    import pytest
    from mopso_engine.ext.text import chunk_documents_bpe

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents_bpe(docs, budget_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents_bpe(docs, budget_tokens=8, overlap_tokens=8)
    with pytest.raises(ValueError):
        chunk_documents_bpe(docs, budget_tokens=8, overlap_tokens=-1)


def test_bpe_fertility_gate(spark):
    from mopso_engine.ext.bpe import bpe_fertility

    rows = [
        (1, "the table and the window are fast"),     # common words, low fertility
        (2, "zqxv jkwpf qzzkt vvxjq wqzzp"),          # gibberish, near-char encoding
        (3, "   "),                                    # empty -> fails
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bpe_fertility(docs, max_fertility=3.5).collect()}
    ranks = {tuple(p): i for i, p in enumerate(pinned_merges())}
    for doc_id, text in rows:
        words = [w for w in text.strip().lower().split() if w]
        nb = sum(len(encode_word(w, ranks)) for w in words)
        assert out[doc_id]["n_bpe_tokens"] == nb
        if words:
            assert abs(out[doc_id]["fertility"] - round(nb / len(words), 6)) < 1e-9
    assert out[2]["fertility"] > out[1]["fertility"]  # gibberish encodes worse
    assert out[3]["fertility"] == 0.0 and not out[3]["fertility_pass"]
    assert out[1]["fertility_pass"]
