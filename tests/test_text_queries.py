

def test_chunk_udtf_agrees_with_relational_twin(spark, sf_dir):
    """The imperative UDTF chunker and the codegen explode+slice
    chunker must be row-identical — same tokens, same windows, same
    short last chunk."""
    from etl_orders_spark.plans.registry import query_map

    q = query_map()
    a = sorted(map(tuple, q["chunk_docs_windows"](spark, sf_dir).collect()))
    b = sorted(map(tuple, q["chunk_docs_udtf"](spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_dup_span_finds_planted_copies_with_matching_text(spark, sf_dir):
    """Every planted companion doc (doc_id >= 1000000) copies a
    16-token window verbatim from its source doc, so BOTH sides of the
    copy must report a duplicated span (the source's island may be
    wider than the copied window when the fixture's own planted
    near-dup passages overlap it, so extents — not fps — are the law
    here; the value-hash oracle certifies the fps)."""
    from etl_orders_spark.plans.registry import query_map

    rows = query_map()["dup_span_detection_docs"](spark, sf_dir).collect()
    assert len(rows) > 0
    by_doc: dict[int, set[str]] = {}
    for r in rows:
        assert r.span_tokens == r.span_end - r.span_start + 1 >= 8
        by_doc.setdefault(r.doc_id, set()).add(r.span_fp)
    clones = {d for d in by_doc if d >= 1000000}
    assert clones, "planted companions produced no spans"
    for c in clones:
        src = c - 1000000
        assert src in by_doc, f"source {src} of planted clone {c} has no span"


def test_dup_span_covers_planted_window(spark, sf_dir):
    """The clone's duplicated span must cover its copied window
    (tokens 4..19 of the 22-token companion: prefix 3 + copy 16 +
    suffix 3, 5-gram grain trims 3 tokens off each edge of the island
    extent at worst)."""
    from etl_orders_spark.plans.registry import query_map

    rows = query_map()["dup_span_detection_docs"](spark, sf_dir).collect()
    for r in rows:
        if r.doc_id >= 1000000:
            assert r.span_start <= 4 and r.span_end >= 19, (
                r.doc_id,
                r.span_start,
                r.span_end,
            )


def test_bpe_train_checksums_track_segmentation(spark, sf_dir):
    """Each training round must CHANGE the vocabulary checksum: the
    checksum hashes the space-joined symbol segmentation, and a merge
    always re-segments at least the words containing the top pair.
    (A bare-concatenation checksum is merge-invariant and would pass
    vacuously — this pins the space-separator contract.) Rules must be
    well-formed 'a+b' pairs with positive integer weights."""
    from etl_orders_spark.plans.registry import query_map

    rows = sorted(
        query_map()["bpe_train_merges_docs"](spark, sf_dir).collect(),
        key=lambda r: r.it,
    )
    assert [r.it for r in rows] == [1, 2, 3]
    assert len({r.vocab_checksum for r in rows}) == 3
    for r in rows:
        assert r.weight > 0 and "+" in r.pair
    # learned rules are distinct (a pair, once merged, cannot recur)
    assert len({r.pair for r in rows}) == 3


def test_bpe_train_overlap_hazard_merges_left_to_right(spark, tmp_path):
    """The fixture vocabulary has no doubled top pair, so the island
    even-offset branch never fires there — this planted corpus makes
    it the WHOLE computation. 'aaaa' and 'aaaaa' force overlapping
    (a,a) runs in both parities; the hand-computed law is:
      round 1: a+a weight 7 (3 overlapping pairs in aaaa + 4 in aaaaa),
               aaaa -> [aa,aa,</w>], aaaaa -> [aa,aa,a,</w>]
               (leftmost-nonoverlapping: even island offsets only)
      round 2: aa+aa weight 2, -> [aaaa,</w>] / [aaaa,a,</w>]
      round 3: tie at weight 1 broken by pair asc -> a+</w>
    A wrong island rule (merge every matching position, or
    rightmost-first) changes the weights or the rules."""
    from pyspark.sql import Row

    from etl_orders_spark.plans.registry import query_map

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [Row(doc_id=0, text="aaaa aaaaa", lang="en", source="s0", n_chars=10)]
    ).write.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(
        query_map()["bpe_train_merges_docs"](spark, sf_dir).collect(),
        key=lambda r: r.it,
    )
    assert [(r.pair, r.weight) for r in rows] == [
        ("a+a", 7),
        ("aa+aa", 2),
        ("a+</w>", 1),
    ]


def test_bpe_encode_planted_corpus_law(spark, tmp_path):
    """Encode applies the learned merges to every word OCCURRENCE.
    This corpus has vocab {aaaa: 4, aaaaa: 1}; hand-running the 3
    rounds: a+a (16) -> aa+aa (5) -> aaaa+</w> (4), so the final
    segmentations are aaaa -> [aaaa</w>] (1 token) and aaaaa ->
    [aaaa, a, </w>] (3 tokens). A doc repeating one word twice must
    produce exactly double the single-occurrence checksum
    (occurrence-weighted hashing, not distinct-word hashing)."""
    from pyspark.sql import Row

    from etl_orders_spark.plans.registry import query_map

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [
            Row(doc_id=0, text="aaaa aaaaa", lang="en", source="s0", n_chars=10),
            Row(doc_id=1, text="aaaa", lang="en", source="s0", n_chars=4),
            Row(doc_id=2, text="aaaa aaaa", lang="en", source="s0", n_chars=9),
        ]
    ).write.parquet(f"{sf_dir}/documents.parquet")
    out = {r.doc_id: r for r in query_map()["bpe_encode_docs"](spark, sf_dir).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0].n_words, out[0].n_tokens) == (2, 4)
    assert (out[1].n_words, out[1].n_tokens) == (1, 1)
    assert (out[2].n_words, out[2].n_tokens) == (2, 2)
    assert out[2].seg_checksum == 2 * out[1].seg_checksum


def test_gopher_rules_planted_docs_fail_exactly_their_rule(spark, sf_dir):
    """Each planted document (ids 9000001..9000008) must fail EXACTLY
    its engineered rule and the control (9000009) must pass all seven
    — pinning both the fail branch of every rule and the absence of
    collateral failures (a planted doc tripping a second rule would
    silently weaken the battery's per-rule coverage)."""
    from etl_orders_spark.plans.registry import query_map

    out = {
        r.doc_id: r.asDict()
        for r in query_map()["gopher_quality_rules_docs"](spark, sf_dir).collect()
        if r.doc_id >= 9000000
    }
    expected_fail = {
        9000001: "pass_word_count",
        9000002: "pass_mean_word_len",
        9000003: "pass_mean_word_len",
        9000004: "pass_symbol_ratio",
        9000005: "pass_bullet_lines",
        9000006: "pass_ellipsis_lines",
        9000007: "pass_alpha_words",
        9000008: "pass_stop_words",
    }
    flags = [k for k in next(iter(out.values())) if k.startswith("pass_")]
    for did, rule in expected_fail.items():
        fails = [f for f in flags if not out[did][f]]
        assert fails == [rule], f"{did}: {fails}"
        assert out[did]["keep"] is False
    assert all(out[9000009][f] for f in flags) and out[9000009]["keep"] is True


def test_wordpiece_train_likelihood_not_frequency(spark, tmp_path):
    """Hand-computed law separating WordPiece from BPE on the same
    corpus: vocab {abab: 2, cd: 1}. Pair counts say a+b (weight 4)
    every round, but the likelihood ratio w/(u(a)*u(b)) says:
      round 1: (c,d) scores 1/(1*1)=1.0  -> c+d   (BPE would say a+b)
      round 2: (cd,</w>) 1/(1*3)         -> cd+</w>
      round 3: (a,b) 4/16 TIES (b,</w>) 2/8 at 0.25 exactly ->
               (a,b) wins on the pair-ASC tie-break
    A frequency-selection bug reproduces BPE; a tie-break bug flips
    round 3; unigram-count bugs move rounds 1-2."""
    from pyspark.sql import Row

    from etl_orders_spark.plans.registry import query_map

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [Row(doc_id=0, text="abab abab cd", lang="en", source="s0", n_chars=12)]
    ).write.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(
        query_map()["wordpiece_train_merges_docs"](spark, sf_dir).collect(),
        key=lambda r: r.it,
    )
    assert [
        (r.pair, r.pair_weight, r.left_weight, r.right_weight) for r in rows
    ] == [
        ("c+d", 1, 1, 1),
        ("cd+</w>", 1, 1, 3),
        ("a+b", 4, 4, 4),
    ]
    # every round re-segments at least the merged word
    assert len({r.vocab_checksum for r in rows}) == 3


def test_wordpiece_encode_greedy_longest_match(spark, tmp_path):
    """Tiny corpus where EVERY multi-char substring fits the top-200
    vocab, so the greedy walk must take the longest legal piece each
    step: 'abcdefgh' (len 8) -> [abcdef, ##gh] (6-char cap, then the
    continuation class), 'ab' -> [ab]. Occurrence weighting: a doc
    with one word twice carries exactly double the checksum."""
    from pyspark.sql import Row

    from etl_orders_spark.plans.registry import query_map

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [
            Row(doc_id=0, text="abcdefgh ab", lang="en", source="s0", n_chars=11),
            Row(doc_id=1, text="ab ab", lang="en", source="s0", n_chars=5),
            Row(doc_id=2, text="ab", lang="en", source="s0", n_chars=2),
        ]
    ).write.parquet(f"{sf_dir}/documents.parquet")
    out = {
        r.doc_id: r
        for r in query_map()["wordpiece_encode_docs"](spark, sf_dir).collect()
    }
    assert set(out) == {0, 1, 2}
    assert (out[0].n_words, out[0].n_tokens) == (2, 3)  # [abcdef,##gh] + [ab]
    assert (out[1].n_words, out[1].n_tokens) == (2, 2)
    assert (out[2].n_words, out[2].n_tokens) == (1, 1)
    assert out[1].seg_checksum == 2 * out[2].seg_checksum


def test_incremental_dedup_planted_clones_drop_exact(spark, sf_dir):
    """The five planted byte-exact clones of historical docs must all
    verdict drop_exact (and also flag near — an exact dup is jaccard
    1.0); the batch must contain keeps; exact precedence holds (no
    drop_near row is also exact)."""
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.plans.text_queries import _INC_CLONE_BASE, _INC_CLONE_SRC

    rows = {
        r.doc_id: r
        for r in query_map()["incremental_dedup_verdicts_docs"](spark, sf_dir).collect()
    }
    for src in _INC_CLONE_SRC:
        r = rows[_INC_CLONE_BASE + src]
        assert r.verdict == "drop_exact" and r.is_exact_dup and r.is_near_dup
    verdicts = {r.verdict for r in rows.values()}
    assert "keep" in verdicts
    for r in rows.values():
        if r.verdict == "drop_near":
            assert not r.is_exact_dup


def test_incremental_dedup_fast_tier_matches_portable(spark, sf_dir):
    """The xxhash64 production tier must produce the identical verdict
    set as the portable-md5 oracle tier on the static fixture (hash
    families only change key representation, never set membership,
    modulo 64-bit collisions the fixture makes deterministic)."""
    from etl_orders_spark.plans.registry import query_map

    q = query_map()
    slow = sorted(map(tuple, q["incremental_dedup_verdicts_docs"](spark, sf_dir).collect()))
    fast = sorted(
        map(tuple, q["incremental_dedup_verdicts_docs_fast"](spark, sf_dir).collect())
    )
    assert slow == fast


def test_unigram_lm_prefers_whole_word_piece(spark, tmp_path):
    """Hand-computed Viterbi law: corpus 'xyxy xyxy' seeds pieces
    {x:4, y:4, xy:4, yx:2, xyx:2, yxy:2, xyxy:2}, N=20; the whole-word
    candidate [xyxy] costs ln(10) ~ 2.30 micro-nats while the best
    split [xy, xy] costs 2*ln(5) ~ 3.22 — so the unigram objective
    must segment every occurrence as ONE piece (a greedy-longest or
    cost-free bug changes n_tokens). Occurrence weighting: the two-
    occurrence doc carries exactly double the one-occurrence doc's
    checksum."""
    from pyspark.sql import Row

    from etl_orders_spark.plans.registry import query_map

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [
            Row(doc_id=0, text="xyxy xyxy", lang="en", source="s0", n_chars=9),
            Row(doc_id=1, text="xyxy", lang="en", source="s0", n_chars=4),
        ]
    ).write.parquet(f"{sf_dir}/documents.parquet")
    out = {
        r.doc_id: r
        for r in query_map()["unigram_lm_encode_docs"](spark, sf_dir).collect()
    }
    assert (out[0].n_words, out[0].n_tokens) == (2, 2)
    assert (out[1].n_words, out[1].n_tokens) == (1, 1)
    assert out[0].seg_checksum == 2 * out[1].seg_checksum


def test_text_kmeans_hashed_separates_planted_topics(spark, tmp_path):
    """Four disjoint-vocabulary topic groups, each containing exactly
    one of the four seed ids (0..3 — init is the K lowest doc_ids), so
    every group starts with its own exact centroid; after the Lloyd
    rounds every cluster must hold precisely its group (group g =
    {g} ∪ {100g+10+j, j<5}, so the expected (n_docs, id_checksum)
    pairs are closed-form). A mixed cluster means the hashed-vector
    distance/argmin math is wrong."""
    from pyspark.sql import Row

    from etl_orders_spark.plans.registry import query_map

    vocab = [
        "apple banana fruit orchard ripe sweet",
        "car engine wheel piston torque gear",
        "river lake stream delta marsh tide",
        "violin cello sonata tempo chord octave",
    ]
    rows = []
    for g in range(4):
        rows.append(Row(doc_id=g, text=vocab[g], lang="en", source="s0", n_chars=30))
        for j in range(5):
            rows.append(
                Row(doc_id=100 * g + 10 + j, text=vocab[g], lang="en",
                    source="s0", n_chars=30)
            )
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{sf_dir}/documents.parquet")
    out = query_map()["text_kmeans_hashed_docs"](spark, sf_dir).collect()
    expected = {(6, g + 5 * (100 * g + 10) + 10) for g in range(4)}
    for it in (1, 2):
        got = {(r.n_docs, r.id_checksum) for r in out if r.it == it}
        assert got == expected, (it, got)


def test_kneser_ney_sums_to_one_and_orders_sanely(spark, sf_dir):
    """The interpolated-KN algebra, pinned independently of the lane's
    scoring join: rebuild the model tables in Python from the corpus
    trigrams and assert (a) sum over the FULL vocabulary of
    P(w3|w1,w2) == 1 for sampled observed contexts — the interpolation
    closes exactly, including unseen-trigram and unseen-continuation
    branches the scoring lane never evaluates — and (b) the lane's
    reported per-trigram NLL matches the rebuilt model's probability
    for sampled observed trigrams at micro-nat grain."""
    import math
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from etl_orders_spark.functions.text import normalize_text, tokens
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.plans.text_queries import _KN_D
    from etl_orders_spark.sources.readers import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens(normalize_text(F.col("text"))).alias("t"))
        .collect()
    )
    tri = Counter()
    vocab = set()
    doc_tris = {}
    for r in docs:
        ts = r.t or []
        vocab.update(ts)
        grams = [tuple(ts[i : i + 3]) for i in range(len(ts) - 2)]
        doc_tris[r.doc_id] = grams
        tri.update(grams)
    ctx2_c, ctx2_n1 = Counter(), Counter()
    cont2 = defaultdict(set)
    for (w1, w2, w3), c in tri.items():
        ctx2_c[(w1, w2)] += c
        ctx2_n1[(w1, w2)] += 1
        cont2[(w2, w3)].add(w1)
    n1_cont2 = {k: len(v) for k, v in cont2.items()}
    mid_n1, mid_nt = Counter(), Counter()
    cont1 = defaultdict(set)
    for (w2, w3), n1 in n1_cont2.items():
        mid_n1[w2] += n1
        mid_nt[w2] += 1
        cont1[w3].add(w2)
    n1_w3 = {k: len(v) for k, v in cont1.items()}
    bt = sum(n1_w3.values())
    wt = len(n1_w3)
    vsz = len(vocab)
    D = _KN_D

    def p1(w3):
        return max(n1_w3.get(w3, 0) - D, 0.0) / bt + D * wt / bt / vsz

    def p2(w2, w3):
        n1m = mid_n1.get(w2, 0)
        if n1m == 0:  # unseen middle word: pure continuation backoff
            return p1(w3)
        return max(n1_cont2.get((w2, w3), 0) - D, 0.0) / n1m + D * mid_nt[
            w2
        ] / n1m * p1(w3)

    def p3(w1, w2, w3):
        cc = ctx2_c[(w1, w2)]
        return max(tri.get((w1, w2, w3), 0) - D, 0.0) / cc + D * ctx2_n1[
            (w1, w2)
        ] / cc * p2(w2, w3)

    contexts = sorted(ctx2_c)[:5] + sorted(ctx2_c)[-5:]
    for w1, w2 in contexts:
        total = sum(p3(w1, w2, w3) for w3 in vocab)
        # unseen w3 (not even a continuation type) still gets the
        # uniform floor through p1 — the closure must be exact
        assert abs(total - 1.0) < 1e-9, ((w1, w2), total)
    out = {
        r.doc_id: (r.n_trigrams, r.total_nll_micro)
        for r in query_map()["kneser_ney_trigram_docs"](spark, sf_dir).collect()
    }
    for doc_id, grams in list(doc_tris.items())[:20]:
        if not grams:
            assert doc_id not in out
            continue
        expect = sum(math.floor(math.log(1.0 / p3(*g)) * 1e6) for g in grams)
        assert out[doc_id] == (len(grams), expect), doc_id


def test_decontamination_planted_branches(spark, sf_dir):
    """Every fixture branch of the eval-decontamination screen: the
    benchmark source docs self-flag with ALL snippet grams, the
    full-snippet plants flag exactly one benchmark, the N-1-token
    plant stays clean (the screen's edge is exact n-gram grain), and
    the corpus keeps clean docs."""
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.plans.text_queries import (
        _DECON_BENCH_SRC,
        _DECON_N,
        _DECON_PLANT_BASE,
        _DECON_PLANTS,
        _DECON_SNIP_LEN,
    )

    rows = {
        r.doc_id: r
        for r in query_map()["decontaminate_eval_docs"](spark, sf_dir).collect()
    }
    n_snip_grams = _DECON_SNIP_LEN - _DECON_N + 1
    for src in _DECON_BENCH_SRC:
        r = rows[src]
        assert r.verdict == "contaminated"
        assert r.n_hit_grams >= n_snip_grams and r.n_benchmarks_hit >= 1
    for off, _host, _src, ntok in _DECON_PLANTS:
        r = rows[_DECON_PLANT_BASE + off]
        if ntok >= _DECON_N:
            assert r.verdict == "contaminated"
            assert r.n_hit_grams >= n_snip_grams and r.n_benchmarks_hit >= 1
        else:  # sub-threshold overlap: must NOT flag
            assert r.verdict == "clean"
            assert r.n_hit_grams == 0 and r.n_benchmarks_hit == 0
    verdicts = [r.verdict for r in rows.values()]
    assert verdicts.count("clean") > len(_DECON_BENCH_SRC)
    # clean rows carry zero counts (left-join coalesce law)
    for r in rows.values():
        assert (r.verdict == "contaminated") == (r.n_hit_grams > 0)


def test_unigram_train_trajectory_monotone_and_consistent(spark, sf_dir):
    """The unigram-LM train lane's hard-EM objective (total_cost,
    occurrence-weighted integer micro-nats) must be non-increasing
    round over round on the fixture corpus, vocabulary size is fixed
    (the fixed-vocab hard-EM variant), and the final round's
    occurrence-weighted token count equals the encode lane's corpus
    total (train and encode share _ulm_em_rounds by construction —
    this pins the wiring end-to-end)."""
    from etl_orders_spark.plans.registry import query_map

    q = query_map()
    rows = sorted(
        (r.it, r) for r in q["unigram_lm_train_docs"](spark, sf_dir).collect()
    )
    assert [it for it, _ in rows] == list(range(len(rows))) and len(rows) >= 2
    pieces = {r.n_pieces for _, r in rows}
    assert len(pieces) == 1  # fixed vocabulary
    costs = [r.total_cost for _, r in rows]
    assert all(a >= b for a, b in zip(costs, costs[1:]))
    enc_tokens = (
        q["unigram_lm_encode_docs"](spark, sf_dir)
        .agg({"n_tokens": "sum"})
        .collect()[0][0]
    )
    assert rows[-1][1].n_tokens == enc_tokens


def test_two_pass_dense_rank_matches_window_dense_rank(spark):
    """two_pass_dense_rank == Window dense_rank bit-for-bit, on a
    frame engineered so duplicate keys outnumber range partitions
    (every key's dense run must survive the range split) and key
    frequencies are skewed."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_orders_spark.operators.rank import two_pass_dense_rank

    rows = [(i, (i * i) % 17, (i * 7) % 5) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {
        (r.id, r.drk)
        for r in two_pass_dense_rank(
            df, [F.col("a"), F.col("b")], rank_col="drk", partitions=8
        ).collect()
    }
    w = Window.partitionBy(F.lit(0)).orderBy("a", "b")
    want = {
        (r.id, r.drk)
        for r in df.withColumn("drk", F.dense_rank().over(w).cast("long")).collect()
    }
    assert got == want


def test_suffix_array_matches_python_ground_truth(spark, sf_dir):
    """The 5-round prefix doubling must equal a definitionally-direct
    Python construction: dense rank of the depth-32-capped suffix of
    every normalized position, computed by sorting the literal
    strings. Exhaustive over the full sf0.001 corpus — every position,
    every doc, including cross-doc rank ties."""
    import re

    import duckdb

    from etl_orders_spark.plans.registry import query_map

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    keys = {}
    for doc_id, text in docs:
        t = re.sub(r"\s+", " ", text.lower()).strip()
        for pos in range(1, len(t) + 1):
            keys[(doc_id, pos)] = t[pos - 1 : pos - 1 + 32]
    rank_of = {k: i + 1 for i, k in enumerate(sorted(set(keys.values())))}
    want = {(d, p): rank_of[k] for (d, p), k in keys.items()}

    got = {
        (r.doc_id, r.pos): r.srank
        for r in query_map()["suffix_array_docs"](spark, sf_dir).collect()
    }
    assert got == want


def test_suffix_array_words_is_orderconsistent_subset(spark, sf_dir):
    """The word-grain direct-sort tier must agree with the char-grain
    doubling lane on every shared position: word-start rows are a
    subset of the char lane's rows, and the two rank columns induce
    the SAME ordering (equal char-lane ranks <=> equal word-lane
    ranks) — the cross-tier law that pins the direct sort against the
    doubling construction without re-deriving either."""
    from etl_orders_spark.plans.registry import query_map

    q = query_map()
    chars = {
        (r.doc_id, r.pos): r.srank
        for r in q["suffix_array_docs"](spark, sf_dir).collect()
    }
    words = {
        (r.doc_id, r.pos): r.srank
        for r in q["suffix_array_words_docs"](spark, sf_dir).collect()
    }
    assert set(words) <= set(chars)
    assert len(words) > 0
    # same ordering: sort shared positions by each rank; the induced
    # grouping and order must be identical
    by_char = sorted(words, key=lambda k: (chars[k], k))
    by_word = sorted(words, key=lambda k: (words[k], k))
    assert by_char == by_word
    for k1, k2 in zip(by_char, by_char[1:]):
        assert (chars[k1] == chars[k2]) == (words[k1] == words[k2])


def test_bloom_prefilter_no_false_negatives_and_agrees_with_exact(spark, sf_dir):
    """The Bloom laws, pinned against the full exact screen: (1) NO
    false negatives — every doc the incremental lane calls an exact
    dup must be a Bloom maybe AND drop_exact here; (2) every
    drop_exact matches the exact lane's is_exact_dup verdict exactly;
    (3) bloom_fp rows are genuinely novel (the FP branch is honest);
    (4) the planted clones all land in drop_exact."""
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.plans.text_queries import _INC_CLONE_BASE, _INC_CLONE_SRC

    q = query_map()
    bloom = {r.doc_id: r for r in q["bloom_prefilter_incremental_docs"](spark, sf_dir).collect()}
    exact = {
        r.doc_id: r.is_exact_dup
        for r in q["incremental_dedup_verdicts_docs"](spark, sf_dir).collect()
    }
    assert set(bloom) == set(exact)
    for doc_id, is_dup in exact.items():
        b = bloom[doc_id]
        if is_dup:
            assert b.bloom_maybe and b.is_exact_dup and b.verdict == "drop_exact"
        else:
            assert not b.is_exact_dup
            assert b.verdict == ("bloom_fp" if b.bloom_maybe else "skip_novel")
    for src in _INC_CLONE_SRC:
        assert bloom[_INC_CLONE_BASE + src].verdict == "drop_exact"


def test_html_extraction_recovers_content_and_drops_boilerplate(spark, sf_dir):
    """The lossless-extraction law on every templated page: kept text
    equals the normalized source exactly (recovered TRUE), the planted
    link-spam paragraph lands in n_linkspam, both nav and footer land
    in n_boiler, and the block ledger adds up."""
    from etl_orders_spark.plans.registry import query_map

    rows = query_map()["html_extract_main_docs"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.recovered, r
        assert r.n_linkspam >= 1
        assert r.n_boiler == 2
        assert r.n_blocks == r.n_kept + r.n_boiler + r.n_linkspam
        # nav(3) + footer(2) + spam(3) links are always present
        assert r.n_links == 8


def test_suffix_repeated_passages_are_real_repeats(spark, sf_dir):
    """Ground-truth re-verification of the adjacency miner: every
    emitted pair's two positions must actually share lcp characters
    of normalized text (checked against the raw corpus in Python),
    the lcp must be maximal w.r.t. the depth cap (either depth-long
    or followed by differing characters), and both within-doc and
    cross-doc repetition must be represented."""
    import re

    import duckdb

    from etl_orders_spark.plans.registry import query_map

    txt = {
        doc_id: re.sub(r"\s+", " ", t.lower()).strip()
        for doc_id, t in duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    }
    rows = query_map()["suffix_repeated_passages_docs"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert any(r.cross_doc for r in rows)
    for r in rows:
        a = txt[r.doc_a][r.pos_a - 1 :]
        b = txt[r.doc_b][r.pos_b - 1 :]
        assert a[: r.lcp] == b[: r.lcp], (r, a[:40], b[:40])
        if r.lcp < 32:
            # maximal: the next characters differ (or one side ended)
            assert a[r.lcp : r.lcp + 1] != b[r.lcp : r.lcp + 1] or (
                len(a) == r.lcp or len(b) == r.lcp
            )
