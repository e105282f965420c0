"""Datapipe operator invariants (the DuckDB-oracle contract check is the
strong gate; these assert structural properties and scale-path equivalence
with the naive plans)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from flink_cdc_spark.datapipe import dedup, similarity, textstats


def test_connected_components_multi_hop(spark):
    """Chains require propagation across O(length) rounds; isolated pairs
    and separate components stay separate."""
    edges = spark.createDataFrame(
        # one chain 1-2-3-4-5, one pair 10-11, one triangle 20-21-22
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        "src BIGINT, dst BIGINT",
    )
    out = {r.node: r.component for r in dedup.connected_components(edges).collect()}
    assert out == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_duplicate_chain_edges_sparse(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "same text"), (4, "other")],
        "doc_id BIGINT, text STRING",
    )
    edges = {(r.src, r.dst) for r in dedup.duplicate_chain_edges(docs).collect()}
    assert edges == {(1, 2), (2, 3)}  # chain, not clique; singleton excluded


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_exact_dedup_covers_all_rows(docs):
    out = dedup.exact_dedup(docs)
    total = out.agg(F.sum("dup_count")).first()[0]
    assert total == docs.count()
    assert out.select("fingerprint").distinct().count() == out.count()


def test_ngram_jaccard_finds_planted_near_dups(docs):
    pairs = dedup.ngram_jaccard_pairs(docs).collect()
    assert len(pairs) > 0
    assert all(0.5 <= r.jaccard <= 1.0 for r in pairs)
    assert all(r.doc_a < r.doc_b for r in pairs)


def test_minhash_recall_on_high_jaccard(docs):
    """LSH with 4 bands x 2 rows must recover essentially all j>=0.9 pairs."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert exact, "corpus should contain planted near-duplicates"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.95
    # verification step bounds precision: every emitted pair passes the
    # exact-jaccard threshold
    assert lsh <= {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=dedup.JACCARD_THRESHOLD).collect()
    }


def test_simhash_banding_is_lossless(docs):
    """Banded pair join == naive cross-join filter (pigeonhole argument)."""
    sh = dedup.simhash(docs).cache()
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_pairs(docs).collect()
    }
    a, b = sh.alias("a"), sh.alias("b")
    naive = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= dedup.SIMHASH_MAX_HAMMING)
        .collect()
    }
    assert banded == naive


def test_embedding_near_dup_symmetric_bounds(embs):
    pairs = dedup.embedding_near_dup_pairs(embs).collect()
    assert all(-1.0001 <= r.cosine <= 1.0001 for r in pairs)
    assert all(r.vec_a < r.vec_b for r in pairs)


def test_cosine_topk_shape_and_selfmatch(embs):
    q = embs.where("vec_id < 5")
    out = similarity.cosine_topk(embs, q, k=3).collect()
    assert len(out) == 15
    assert all(r.nbr_id != r.query_id for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        cos = [r.cosine for r in rows]
        assert cos == sorted(cos, reverse=True)


def test_ann_is_subset_quality(embs):
    """ANN top-1 should usually agree with exact top-1 (planted or not,
    the top neighbor is far above the noise floor for at least some
    queries); weak check: ANN results are valid corpus ids with sane
    scores."""
    q = embs.where("vec_id < 10")
    ann = similarity.ann_topk(embs, q, k=5).collect()
    assert len(ann) > 0
    ids = {r.vec_id for r in embs.select("vec_id").collect()}
    assert all(r.nbr_id in ids for r in ann)


def test_language_id_deterministic_labels(docs):
    out = textstats.language_id(docs)
    langs = {r.predicted_lang for r in out.select("predicted_lang").distinct().collect()}
    assert langs <= {"en", "de", "fr", "es", "zh", "und"}
    assert out.count() == docs.count()


def test_token_stats_sanity(docs):
    out = textstats.token_stats(docs).collect()
    for r in out:
        assert r.ws_tokens > 0
        assert r.bpe_tokens >= r.ws_tokens  # BPE-ish splits at least as fine
        assert 0 <= r.punct_ratio <= 1


def test_fingerprint_unique_on_distinct_texts(docs):
    out = textstats.fingerprint(docs)
    assert out.select("fp_md5").distinct().count() == docs.select("text").distinct().count()
    assert out.where(F.col("fp64") < 0).count() == 0


def test_ivf_candidates_are_probed_cells_only(embs):
    """IVF returns valid neighbors with correct ordering; probing 2 of 16
    cells, each query still gets k results on this corpus."""
    q = embs.where("vec_id < 5")
    out = similarity.ivf_topk(embs, q, k=3).collect()
    by_q = {}
    for r in out:
        assert r.nbr_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        cos = [r.cosine for r in rows]
        assert cos == sorted(cos, reverse=True)


def test_repetition_stats_signals(spark):
    from flink_cdc_spark.datapipe import textstats

    df = spark.createDataFrame(
        [
            (1, "a a a a"),              # one word repeated
            (2, "w x y z"),              # all distinct
            (3, "a b a b a b"),          # repeated 2-grams
            (4, "solo"),                 # shorter than any n-gram
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in textstats.repetition_stats(df).collect()}
    assert rows[1].n_words == 4 and rows[1].dup_word_frac == 0.75
    assert rows[1].top_word_frac == 1.0
    assert rows[2].dup_word_frac == 0.0 and rows[2].top_word_frac == 0.25
    # "a b a b a b": 5 bigrams, 2 distinct -> dup fraction 0.6
    assert rows[3].dup_2gram_frac == 0.6
    assert rows[4].dup_2gram_frac == 0.0 and rows[4].dup_3gram_frac == 0.0


def test_decontaminate_removes_ngram_overlap(spark):
    from flink_cdc_spark.datapipe import textstats

    df = spark.createDataFrame(
        [
            (0, "secret held out benchmark phrase", "en", "s", 10),   # benchmark (id%97==0)
            (1, "totally unrelated text here now", "en", "s", 10),
            (2, "contains the secret held out benchmark words", "en", "s", 10),
            (3, "held out benchmark", "en", "s", 10),                 # exact 3-gram hit
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars INT",
    )
    kept = {r.doc_id for r in textstats.decontaminate(df).collect()}
    assert kept == {1}  # 2 and 3 share a 3-gram with the benchmark doc

    # the gram join must broadcast (tiny benchmark side)
    plan = textstats.decontaminate(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_stratified_hash_sample_deterministic(spark):
    from flink_cdc_spark.datapipe.sampling import (
        _threshold_hex,
        stratified_hash_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r.doc_id for r in stratified_hash_sample(docs).collect()}
    b = {r.doc_id for r in stratified_hash_sample(docs).collect()}
    assert a == b and 0 < len(a) < docs.count()  # reproducible, non-trivial
    # rate monotonicity: a higher rate keeps a superset
    half = {r.doc_id for r in stratified_hash_sample(
        docs, rates=(("en", 0.3), ("zh", 0.3)), default_rate=0.3).collect()}
    full = {r.doc_id for r in stratified_hash_sample(
        docs, rates=(("en", 0.9), ("zh", 0.9)), default_rate=0.9).collect()}
    assert half <= full
    assert _threshold_hex(1.0) == "g0000000" and _threshold_hex(0.5) == "80000000"


def test_vocab_topk_counts(spark):
    from flink_cdc_spark.datapipe.sampling import vocab_topk

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a")], "doc_id LONG, text STRING"
    )
    rows = vocab_topk(docs, k=2).collect()
    assert [(r.token, r.occurrences, r.doc_freq) for r in rows] == [
        ("a", 3, 2), ("b", 2, 2)
    ]


def test_pii_scrub_redacts_and_counts(spark):
    from flink_cdc_spark.datapipe.sampling import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail a@b.com and c@d.org plus +1-555-0123-4567 at 10.1.2.3"),
            (2, "clean text no pii"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert rows[1].n_email == 2 and rows[1].n_phone == 1 and rows[1].n_ipv4 == 1
    assert "<EMAIL>" in rows[1].text and "<PHONE>" in rows[1].text
    assert "a@b.com" not in rows[1].text and "10.1.2.3" not in rows[1].text
    assert rows[2].text == "clean text no pii"
    assert (rows[2].n_email, rows[2].n_phone, rows[2].n_ipv4) == (0, 0, 0)


def test_unigram_logprob_properties(spark):
    from flink_cdc_spark.datapipe.sampling import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b"), (3, "z z")],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    assert rows[1].n_scored == 4 and rows[2].n_scored == 2
    # a document of common tokens scores lower (more typical) than one of
    # rarer tokens: 'a' appears 4x, 'z' 2x
    assert rows[1].mean_nll < rows[3].mean_nll
    # deterministic across re-evaluation
    again = {r.doc_id: r.mean_nll for r in unigram_logprob(docs).collect()}
    assert again == {k: v.mean_nll for k, v in rows.items()}


def test_quantized_topk_tracks_float_ranking(spark):
    """int8 quantization preserves neighbor quality: the top-1 neighbor
    per query matches the float cosine top-1 on the test embeddings (the
    grid error is ~1/127, far below typical neighbor gaps)."""
    from flink_cdc_spark.datapipe import similarity

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = embs.where("vec_id < 5")
    exact = {(r.query_id, r.rank): r.nbr_id
             for r in similarity.cosine_topk(embs, queries, k=1).collect()}
    quant = {(r.query_id, r.rank): r.nbr_id
             for r in similarity.quantized_topk(embs, queries, k=1).collect()}
    agree = sum(1 for k in exact if quant.get(k) == exact[k])
    assert agree >= 4  # at most one flip among 5 queries


def test_hash_sample_rate_one_keeps_all(spark):
    """rate >= 1.0 is keep-all — including keys whose md5 prefix is
    'ffffffff' (strict < against the 'g0000000' sentinel)."""
    from flink_cdc_spark.datapipe.sampling import (
        _threshold_hex,
        stratified_hash_sample,
    )

    assert _threshold_hex(1.0) == "g0000000"
    df = spark.range(500).selectExpr("id AS doc_id", "'xx' AS lang")
    kept = stratified_hash_sample(df, rates=(), default_rate=1.0).count()
    assert kept == 500


def test_semantic_dedup_keep_policy(spark):
    """SemDeDup cluster-bucketed dedup: a dropped row must have a kept
    lower-id near-dup in ITS OWN cell; pairs across cells never drop."""
    from flink_cdc_spark.datapipe import dedup

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kept = dedup.semantic_dedup(df)
    kept_ids = {r.vec_id for r in kept.collect()}
    all_ids = {r.vec_id for r in df.select("vec_id").collect()}
    dropped = all_ids - kept_ids
    assert kept_ids  # something survives
    # dropped rows each have a lower-id same-cell neighbor above threshold
    from flink_cdc_spark.datapipe.similarity import _dot, _ivf_scores_spark, _unit_expr
    from pyspark.sql import functions as F

    cells = (
        df.selectExpr("vec_id", f"{_unit_expr('embedding')} AS u")
        .withColumn("scores", F.expr(_ivf_scores_spark("u")))
        .withColumn("cell", F.expr("array_position(scores, array_max(scores))"))
        .drop("scores")
    )
    a, b = cells.alias("a"), cells.alias("b")
    pairs = (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .where(F.round(F.expr(_dot("a.u", "b.u")), 4) >= dedup.COSINE_DUP_THRESHOLD)
        .select(F.col("a.vec_id").alias("lo"), F.col("b.vec_id").alias("hi"))
        .collect()
    )
    should_drop = {r.hi for r in pairs}
    assert dropped == should_drop


def test_exact_substring_pairs_and_freq_cap(spark):
    from flink_cdc_spark.datapipe import dedup

    boiler = "x " * 12  # identical 12-token doc shared by many
    rows = (
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
        + [(2, "alpha beta gamma delta epsilon zeta eta theta different tail")]
        + [(3, "totally unrelated words that share no window with the others here")]
        + [(100 + i, boiler.strip()) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b): r.shared_windows
        for r in dedup.exact_substring_pairs(df, window=8, freq_cap=5).collect()
    }
    # docs 1 and 2 share exactly the first 8-token window
    assert pairs == {(1, 2): 1}
    # without the cap the 10 identical boiler docs pair quadratically
    uncapped = dedup.exact_substring_pairs(df, window=8, freq_cap=1000)
    assert uncapped.where("doc_a >= 100").count() == 45  # C(10,2)


def test_kmeans_assign_properties(spark):
    from flink_cdc_spark.datapipe import clustering

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = df.count()
    out = clustering.kmeans_assign(df, k=4, iters=2)
    rows = out.collect()
    assert len(rows) == n  # every vector assigned, exactly once
    clusters = {r.cluster for r in rows}
    assert clusters <= set(range(4))
    # deterministic: a second run assigns identically
    again = {(r.vec_id, r.cluster) for r in
             clustering.kmeans_assign(df, k=4, iters=2).collect()}
    assert {(r.vec_id, r.cluster) for r in rows} == again
    # iterating must not worsen the Lloyd objective (sum sq dist)
    import numpy as np

    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in df.collect()}
    for vid in vecs:
        vecs[vid] = vecs[vid] / np.sqrt((vecs[vid] ** 2).sum())

    def objective(assign):
        by_c = {}
        for vid, c in assign.items():
            by_c.setdefault(c, []).append(vecs[vid])
        total = 0.0
        for c, vs in by_c.items():
            m = np.mean(vs, axis=0)
            total += sum(((v - m) ** 2).sum() for v in vs)
        return total

    a1 = {r.vec_id: r.cluster for r in
          clustering.kmeans_assign(df, k=4, iters=1).collect()}
    a3 = {r.vec_id: r.cluster for r in
          clustering.kmeans_assign(df, k=4, iters=3).collect()}
    assert objective(a3) <= objective(a1) + 1e-9

    with pytest.raises(ValueError, match="at least k"):
        clustering.kmeans_assign(df.limit(2), k=4)


def test_sessionize_gap_semantics(spark):
    import datetime

    from flink_cdc_spark.datapipe import sessions

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    m = datetime.timedelta(minutes=1)
    rows = [
        # user 1: two sessions split by a 100-minute gap
        (1, t0, 1), (1, t0 + 5 * m, 2), (1, t0 + 105 * m, 3),
        # user 2: one session, equal timestamps ordered by event_id
        (2, t0, 10), (2, t0, 11),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long")
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.start_us, r.end_us)
        for r in sessions.sessionize(ev, gap_minutes=60).collect()
    }
    us = lambda dt: int(
        dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6
    )
    assert got == {
        (1, 1): (2, us(t0), us(t0 + 5 * m)),
        (1, 2): (1, us(t0 + 105 * m), us(t0 + 105 * m)),
        (2, 1): (2, us(t0), us(t0)),
    }


def test_pack_sequences_invariants(spark):
    """Packing invariants: every doc is packed exactly once, packs never
    cross shards, consecutive pack indices per shard, and a pack only
    overflows when a single straddling/oversized doc forces it."""
    from flink_cdc_spark.datapipe.packing import MAX_TOKENS, pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packs = pack_sequences(docs).collect()
    assert sum(p.n_docs for p in packs) == docs.count()
    by_shard = {}
    for p in packs:
        by_shard.setdefault(p.shard, []).append(p)
    for shard, ps in by_shard.items():
        idxs = sorted(p.pack_idx for p in ps)
        assert idxs == list(range(len(idxs))), f"shard {shard} gaps: {idxs}"
        for p in ps:
            # doc ranges within one shard must not interleave across packs
            assert p.first_doc <= p.last_doc
            if p.n_docs > 1:
                # multi-doc packs only overflow via the straddling last doc:
                # the exclusive prefix of the last doc was under budget
                assert p.total_tokens > 0
    # total token conservation
    from pyspark.sql import functions as F

    toks = docs.select(
        F.expr("size(split(trim(text), '\\\\s+'))").alias("t")
    ).agg(F.sum("t")).collect()[0][0]
    assert sum(p.total_tokens for p in packs) == toks


def test_chunk_documents_invariants(spark):
    """Chunk windows tile every document: chunk 0 starts at 0, strides
    advance by STRIDE, the last window reaches the document end, every
    chunk is non-empty and at most CHUNK tokens, and a short doc yields
    exactly one chunk covering it whole."""
    from flink_cdc_spark.datapipe import chunking

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(250))),
         (2, "only three tokens"),
         (3, " ".join(f"x{i}" for i in range(96)))],  # exactly one window
        "doc_id BIGINT, text STRING",
    )
    out = chunking.chunk_documents(docs, chunk_tokens=96, stride=64)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_toks = {1: 250, 2: 3, 3: 96}
    for d, rs in by_doc.items():
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        for r in rs:
            assert r.start_tok == r.chunk_idx * 64
            assert 0 < r.n_tok <= 96
        last = rs[-1]
        assert last.start_tok + last.n_tok == n_toks[d]  # reaches the end
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tok == 3
    assert len(by_doc[3]) == 1
    # 250 tokens, chunk 96 stride 64 -> 1 + ceil(154/64) = 4 windows
    assert len(by_doc[1]) == 4
    with pytest.raises(ValueError, match="stride"):
        chunking.chunk_documents(docs, chunk_tokens=10, stride=11)


def test_epoch_shuffle_is_a_permutation_and_seed_sensitive(spark):
    from flink_cdc_spark.datapipe import chunking

    docs = spark.range(500).withColumnRenamed("id", "doc_id")
    s0 = chunking.epoch_shuffle(docs, seed=0).collect()
    assert len(s0) == 500 and len({r.doc_id for r in s0}) == 500
    # within a shard, positions are 1..n with no gaps
    by_shard = {}
    for r in s0:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # a different seed is a different permutation (order changes)
    s1 = chunking.epoch_shuffle(docs, seed=1).collect()
    key0 = {r.doc_id: (r.shard, r.pos) for r in s0}
    key1 = {r.doc_id: (r.shard, r.pos) for r in s1}
    assert key0 != key1
    # and rerunning seed 0 is bit-identical (no RNG state)
    s0b = chunking.epoch_shuffle(docs, seed=0).collect()
    assert key0 == {r.doc_id: (r.shard, r.pos) for r in s0b}


def test_source_cap_keeps_best_per_source(spark):
    from flink_cdc_spark.datapipe import chunking

    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", 1000 - i) for i in range(10)],
        "doc_id BIGINT, source STRING, n_chars BIGINT",
    )
    out = chunking.source_cap(docs, cap=3).collect()
    assert len(out) == 6
    for r in out:
        assert 1 <= r.rk <= 3
    # highest n_chars (lowest doc_id here) survive per source
    kept = sorted(r.doc_id for r in out)
    assert kept == [0, 1, 2, 3, 4, 5]


def test_tfidf_topk_ordering(spark):
    """tf wins first, rarity breaks ties, term string last; k bounds."""
    from flink_cdc_spark.datapipe import ranking

    docs = spark.createDataFrame(
        [(1, "apple apple banana cherry"),
         (2, "banana banana cherry cherry date"),
         (3, "apple banana")],
        "doc_id BIGINT, text STRING",
    )
    out = ranking.tfidf_topk(docs, k=2)
    rows = {(r.doc_id, r.rk): (r.term, r.tf, r.df) for r in out.collect()}
    # doc 1: apple tf=2 -> rank 1; banana/cherry tf=1, cherry rarer (df 2 vs 3)
    assert rows[(1, 1)] == ("apple", 2, 2)
    assert rows[(1, 2)] == ("cherry", 1, 2)
    # doc 2: banana and cherry both tf=2: cherry df=2 < banana df=3
    assert rows[(2, 1)] == ("cherry", 2, 2)
    assert rows[(2, 2)] == ("banana", 2, 3)
    assert max(rk for (_, rk) in rows) == 2


def test_dsir_prefers_target_like_documents(spark):
    """DSIR importance weights rank documents sharing the target subset's
    n-grams above documents that don't; a single-token doc contributes
    no bigrams (the sequence(0,-1) guard) but still gets a score."""
    from flink_cdc_spark.datapipe import ranking

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha beta", "en"),
         (2, "alpha beta gamma", "en"),
         (3, "alpha beta alpha", "fr"),      # target-like but raw-labelled
         (4, "zeta eta theta iota", "fr"),   # nothing in common with target
         (5, "alpha", "fr")],                # 1 token -> unigram only
        "doc_id BIGINT, text STRING, lang STRING",
    )
    out = ranking.dsir_importance(docs, target_lang="en", k=5)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    # the disjoint-vocabulary doc must rank strictly below the
    # target-overlapping ones
    assert all(rows[4].score < rows[d].score for d in (1, 2, 3))
    # 1-token doc: exactly one feature (its unigram), no bigram blowup
    assert rows[5].n_feat == 1


def test_temperature_mix_flattens_head_sources(spark):
    """alpha=0.5 sampling keeps a LARGER fraction of a tail source than
    of a head source (rate ratio = sqrt(n_head/n_tail)), with expected
    total near target_rows; rate >= 1 keeps a tiny source whole."""
    from flink_cdc_spark.datapipe import sampling

    rows = (
        [(i, "head", "en", 10) for i in range(3000)]
        + [(10_000 + i, "tail", "en", 10) for i in range(300)]
        + [(20_000 + i, "tiny", "en", 10) for i in range(3)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, source STRING, lang STRING, n_chars BIGINT"
    )
    out = sampling.temperature_mix(docs, target_rows=600)
    kept = out.groupBy("source").count().collect()
    by_src = {r.source: r["count"] for r in kept}
    frac_head = by_src.get("head", 0) / 3000
    frac_tail = by_src.get("tail", 0) / 300
    assert frac_tail > frac_head  # temperature flattening
    # tiny source: rate = target*s_int/(s_tot*n) >= 1 -> kept whole
    assert by_src.get("tiny", 0) == 3
    total = sum(by_src.values())
    assert 400 <= total <= 800  # expected ~600, hash-sample variance


def test_gopher_rules_each_rule_rejects(spark):
    """Each Gopher rule fires independently: short doc, numeric-only doc
    (alpha fraction + mean-word-length), stopword-free doc, and a doc
    passing all four. The synthetic corpus never fails mwl/alpha, so the
    crafted docs pin those branches."""
    from flink_cdc_spark.datapipe import textstats

    good = "the cat and the dog ran to a tree of green leaves and " * 3
    docs = spark.createDataFrame(
        [
            (1, good),                                    # all pass
            (2, "the a of and to"),                       # too short
            (3, "1 2 3 4 5 " * 6 + "the a of and to"),    # alpha frac + mwl low
            (4, "zebra " * 30),                           # no stopwords
            (5, ("x" * 40 + " ") * 12 + good),            # mwl high
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = {r.doc_id: r for r in textstats.gopher_rules(docs).collect()}
    assert rows[1].keep
    assert not rows[2].wc_ok and not rows[2].keep
    assert not rows[3].alpha_ok and not rows[3].mwl_ok and not rows[3].keep
    assert not rows[4].stop_ok and not rows[4].keep
    assert not rows[5].mwl_ok and not rows[5].keep and rows[5].alpha_ok


def test_retention_cohorts_counts_users_once_per_offset(spark):
    """A user active twice in the same day counts once; cohorts anchor to
    the user's first-seen day; day buckets are integer micros div."""
    from flink_cdc_spark.datapipe import features
    import datetime as dt

    d0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def row(eid, u, day, hour=0):
        return (eid, u, d0 + dt.timedelta(days=day, hours=hour))

    ev = spark.createDataFrame(
        [
            row(1, 1, 0), row(2, 1, 0, 3),  # same user, same day twice
            row(3, 1, 2),                   # active at offset 2
            row(4, 2, 0), row(5, 2, 1),     # cohort day 0, offset 0 and 1
            row(6, 3, 1),                   # later cohort, offset 0 only
        ],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP",
    )
    out = {(r.cohort_day, r.day_offset): r.n_users
           for r in features.retention_cohorts(ev).collect()}
    base_day = int(d0.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6) // features.DAY_US
    assert out[(base_day, 0)] == 2      # users 1 and 2, once each
    assert out[(base_day, 1)] == 1      # user 2
    assert out[(base_day, 2)] == 1      # user 1
    assert out[(base_day + 1, 0)] == 1  # user 3's own cohort
    assert len(out) == 4


def test_session_window_native_boundary(spark):
    """Spark's session_window MERGES an event at exactly t+gap into the
    same session (touching windows merge; split only on diff > gap) —
    the same boundary rule as the lag-based sessionize. Pinned here so
    the oracle (strict >) can never silently diverge again."""
    import datetime

    from flink_cdc_spark.datapipe import sessions

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    m = datetime.timedelta(minutes=1)
    rows = [
        (1, t0, 1), (1, t0 + 60 * m, 2),   # exactly gap apart -> merged
        (2, t0, 3), (2, t0 + 59 * m, 4),   # inside the gap
        (3, t0, 5), (3, t0 + 61 * m, 6),   # one past the gap -> split
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long")
    got = sorted(
        (r.user_id, r.n_events, r.start_us, r.end_us)
        for r in sessions.sessionize_native(ev, gap_minutes=60).collect()
    )
    us = lambda dt: int(
        dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6
    )
    assert got == [
        (1, 2, us(t0), us(t0 + 60 * m)),   # == gap merges (one session)
        (2, 2, us(t0), us(t0 + 59 * m)),
        (3, 1, us(t0), us(t0)),            # > gap splits
        (3, 1, us(t0 + 61 * m), us(t0 + 61 * m)),
    ]
    # the lag-based variant agrees at the boundary
    lag = sessions.sessionize(ev, gap_minutes=60).collect()
    assert {(r.user_id, r.session_idx, r.n_events) for r in lag} == {
        (1, 1, 2), (2, 1, 2), (3, 1, 1), (3, 2, 1),
    }


def test_chunking_differential_vs_naive_model(spark):
    """Differential: the Spark chunking plan vs a direct Python
    transcription of the sliding-window rule, over adversarial token
    counts (empty text, exactly-one-window, exact multiples of stride,
    one-past boundaries)."""
    import hashlib

    from flink_cdc_spark.datapipe import chunking

    chunk, stride = 96, 64
    sizes = [0, 1, 2, 63, 64, 65, 95, 96, 97, 128, 159, 160, 161,
             192, 224, 225, 250, 288, 289, 320]
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(n)))
            for i, n in enumerate(sizes)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    def naive(doc_id, text):
        toks = __import__("re").split(r"\s+", text.strip())
        n = len(toks)
        out = []
        c = 0
        while True:
            start = c * stride
            ln = min(chunk, n - start)
            out.append((doc_id, c, start, ln,
                        hashlib.md5(" ".join(toks[start:start + ln])
                                    .encode()).hexdigest()))
            if start + ln >= n:
                break
            c += 1
        return out

    expect = sorted(r for (d, t) in rows for r in naive(d, t))
    got = sorted(
        (r.doc_id, r.chunk_idx, r.start_tok, r.n_tok, r.chunk_hash)
        for r in chunking.chunk_documents(
            docs, chunk_tokens=chunk, stride=stride
        ).collect()
    )
    assert got == expect


def test_asof_enrich_boundaries(spark):
    """At-or-before semantics: an order at EXACTLY the event instant is
    taken; same-instant order ties resolve to the highest order key;
    users with no prior order get NULLs."""
    import datetime

    from flink_cdc_spark.datapipe import features

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    h = datetime.timedelta(hours=1)
    ev = spark.createDataFrame(
        [(1, t0 + 2 * h, 10),   # after both orders of user 10
         (2, t0, 10),           # exactly at order time -> taken
         (3, t0 - h, 10),       # before any order -> NULL
         (4, t0 + h, 11)],      # user with no orders -> NULL
        "event_id long, ts timestamp_ntz, user_id long",
    )
    orders = spark.createDataFrame(
        [(100, 10, t0), (101, 10, t0),        # same-instant tie -> 101
         (102, 10, t0 + 90 * datetime.timedelta(minutes=1))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz",
    )
    got = {r.event_id: r.order_key
           for r in features.asof_enrich(ev, orders).collect()}
    assert got == {1: 102, 2: 101, 3: None, 4: None}


def test_rolling_features_window_edges(spark):
    """RANGE frame is inclusive at exactly -7 days; micro-unit integer
    sums are exact; equal-instant peers all count; no decimal dtype in
    the output schema (driver-collector invariant)."""
    import datetime

    from flink_cdc_spark.datapipe import features

    t0 = datetime.datetime(2024, 2, 1, 0, 0, 0)
    d = datetime.timedelta(days=1)
    us = datetime.timedelta(microseconds=1)
    ev = spark.createDataFrame(
        [(1, t0 - 8 * d, 5, 1.5),        # outside every window below
         (2, t0 - 7 * d, 5, 2.25),       # exactly 7d before t0 -> included
         (3, t0 - 7 * d + us, 5, 0.5),   # just inside
         (4, t0, 5, 4.0),
         (5, t0, 5, 8.0)],               # equal-instant peer
        "event_id long, ts timestamp_ntz, user_id long, value double",
    )
    out = features.rolling_event_features(ev)
    assert "decimal" not in out.schema["sum_trail_micros"].dataType.simpleString()
    got = {r.event_id: (r.n_trail, r.sum_trail_micros) for r in out.collect()}
    assert got[4] == (4, 14_750_000)
    assert got[5] == (4, 14_750_000)  # peers share the frame
    assert got[2] == (2, 3_750_000)   # event 1 is 1d earlier


def test_hash_split_deterministic_and_stable(spark):
    from flink_cdc_spark.datapipe import sampling

    docs = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    a = {r.doc_id: r.split for r in sampling.hash_split(docs).collect()}
    b = {r.doc_id: r.split
         for r in sampling.hash_split(docs.where("doc_id < 100")).collect()}
    # growth-stability: removing rows never changes survivors' splits
    assert all(a[k] == v for k, v in b.items())
    assert set(a.values()) == {"train", "val", "test"}
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert frac_train > 0.95


def test_connected_components_long_chain_log_rounds(spark):
    """Pointer jumping: a 200-node chain converges within max_iter=12
    (log-diameter rounds) — plain min-propagation would need ~200."""
    from flink_cdc_spark.datapipe import dedup

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "src BIGINT, dst BIGINT"
    )
    out = {r.node: r.component
           for r in dedup.connected_components(edges, max_iter=12).collect()}
    assert set(out.values()) == {0} and len(out) == 201


def test_funnel_stage_ordering_and_window(spark):
    """Steps must occur IN ORDER (a click before the first view doesn't
    count) and inside the window of the FIRST step."""
    import datetime

    from flink_cdc_spark.datapipe import features

    t0 = datetime.datetime(2024, 1, 1)
    d = datetime.timedelta(days=1)
    rows = [
        # user 1: full ordered funnel inside 7d -> stage 3
        (1, t0, 1, "view"), (1, t0 + d, 2, "click"), (1, t0 + 2 * d, 3, "purchase"),
        # user 2: click BEFORE the first view -> stage 1 only
        (2, t0, 4, "click"), (2, t0 + d, 5, "view"),
        # user 3: purchase outside the 7d window of the first view -> stage 2
        (3, t0, 6, "view"), (3, t0 + d, 7, "click"), (3, t0 + 8 * d, 8, "purchase"),
        # user 4: no funnel events at all -> stage 0
        (4, t0, 9, "error"),
        # user 5: purchase exactly at t1 + 7d -> included (<= bound)
        (5, t0, 10, "view"), (5, t0 + d, 11, "click"), (5, t0 + 7 * d, 12, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, event_type string"
    )
    got = {r.user_id: r.stage for r in features.funnel_stages(ev).collect()}
    assert got == {1: 3, 2: 1, 3: 2, 4: 0, 5: 3}


def test_event_transitions_counts(spark):
    import datetime

    from flink_cdc_spark.datapipe import features

    t0 = datetime.datetime(2024, 1, 1)
    m = datetime.timedelta(minutes=1)
    rows = [
        (1, t0, 1, "a"), (1, t0 + m, 2, "b"), (1, t0 + 2 * m, 3, "a"),
        (2, t0, 4, "a"), (2, t0 + m, 5, "b"),
        (3, t0, 6, "solo"),  # single event: no transition
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, event_type string"
    )
    got = {(r.from_type, r.to_type): r.n
           for r in features.event_transitions(ev).collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_bpe_pair_counts_weighted_by_occurrence(spark):
    from flink_cdc_spark.datapipe import sampling

    docs = spark.createDataFrame(
        [(1, "abab abab"), (2, "ab cd x")],  # 'ab' pair: 2+2+1 = 5
        "doc_id long, text string",
    )
    got = {r.pair: (r.occurrences, r.rk)
           for r in sampling.bpe_pair_counts(docs, k=10).collect()}
    assert got["ab"] == (5, 1)
    assert got["ba"] == (2, 2)
    assert got["cd"][0] == 1
    assert "x" not in got  # single-char words yield no pair


def test_salted_join_equals_plain_join(spark):
    from flink_cdc_spark.datapipe import skew

    big = spark.createDataFrame(
        # key 1 is the hot key
        [(1, i) for i in range(50)] + [(2, 100), (3, 101), (9, 102)],
        "k long, uniq long",
    )
    small = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    salted = {(r.k, r.uniq, r.v)
              for r in skew.salted_join(big, small, "k", "uniq", n_salt=4).collect()}
    plain = {(r.k, r.uniq, r.v) for r in big.join(small, "k").collect()}
    assert salted == plain and len(plain) == 52
    # left join keeps unmatched hot rows with NULL payloads
    left = {(r.k, r.uniq, r.v)
            for r in skew.salted_join(big, small, "k", "uniq",
                                      n_salt=4, how="left").collect()}
    assert left == plain | {(9, 102, None)}


def test_value_quantiles_disc_picks_actual_elements(spark):
    """percentile_disc returns the smallest element whose cumulative
    distribution reaches p — an actual element, never an interpolation."""
    from flink_cdc_spark.datapipe import features

    ev = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 7.77)],
        "event_type STRING, value DOUBLE",
    )
    rows = {r.event_type: r for r in features.value_quantiles(ev).collect()}
    assert (rows["a"].n, rows["a"].p50_cents, rows["a"].p90_cents,
            rows["a"].p99_cents) == (4, 200, 400, 400)
    assert (rows["b"].n, rows["b"].p50_cents) == (1, 777)


def test_filtered_topk_respects_label_predicate(embs, spark):
    """Every returned neighbor carries an allowed label, and the result
    is the exact top-k over the restricted set (not a post-filtered
    global top-k, which could return fewer than k rows)."""
    from flink_cdc_spark.datapipe import similarity

    q = embs.where("vec_id < 3")
    out = similarity.filtered_topk(embs, q, labels=(0, 1), k=4).collect()
    allowed = {r.vec_id for r in embs.where("label in (0, 1)").collect()}
    assert all(r.nbr_id in allowed for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        assert len(rows) == 4  # pre-filter keeps full k
        cos = [r.cosine for r in sorted(rows, key=lambda r: r.rank)]
        assert cos == sorted(cos, reverse=True)


def test_hybrid_retrieval_candidates_contain_query_term(docs, embs, spark):
    """Every returned neighbor CONTAINS the query's top tf-idf term (the
    true inverted-index probe — the r10 recall fix: a doc carrying the
    query term as its #2 term is a legitimate candidate), and ranks
    order by cosine descending."""
    import re

    from flink_cdc_spark.datapipe import ranking, similarity

    out = similarity.hybrid_retrieval(docs, embs, n_queries=3, k=3).collect()
    assert out
    top1 = {r.doc_id: r.term for r in ranking.tfidf_topk(docs, k=1).collect()}
    tokens = {
        r.doc_id: set(re.sub(r"\s+", " ", r.text.lower().strip()).split(" "))
        for r in docs.collect()
    }
    for r in out:
        assert top1[r.query_id] in tokens[r.nbr_id]
        assert r.nbr_id != r.query_id
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        cos = [r.cosine for r in sorted(rows, key=lambda r: r.rank)]
        assert cos == sorted(cos, reverse=True)


def test_crossdoc_overlap_counts_shared_grams_once(spark):
    """A 3-gram shared with ANOTHER doc counts as duplicated; repeats
    within one doc do not (distinct-first); short docs are absent."""
    from flink_cdc_spark.datapipe import textstats

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # grams: 'a b c', 'b c d'
            (2, "a b c x y"),        # shares 'a b c' with doc 1
            (3, "q r s q r s"),      # intra-doc repeat only: no cross dup
            (4, "zz yy"),            # < 3 tokens -> excluded
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = {r.doc_id: r for r in textstats.crossdoc_ngram_overlap(docs).collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1].n_grams, rows[1].n_dup) == (2, 1)
    assert (rows[2].n_grams, rows[2].n_dup) == (3, 1)
    assert rows[3].n_dup == 0 and rows[3].dup_frac == 0.0
    assert rows[1].dup_frac == 0.5


def test_value_outliers_integer_exact_threshold(spark):
    """Squared z-score rule flags exactly the values beyond k sigma; a
    constant-valued type (zero variance) flags nothing except values
    differing at all... which cannot exist; boundary value at exactly
    k*std is NOT an outlier (strict >)."""
    from flink_cdc_spark.datapipe import features

    rows = (
        # type 'a': 15 values of 10.00, one extreme. A lone outlier among
        # n points has z at most (n-1)/sqrt(n) under the population std
        # that INCLUDES it, so n must exceed 10 for 3-sigma to fire
        [(i, "a", 10.0) for i in range(15)] + [(15, "a", 1000.0)]
        # type 'b': constant — no outliers possible
        + [(100 + i, "b", 5.0) for i in range(5)]
    )
    ev = spark.createDataFrame(rows, "event_id BIGINT, event_type STRING, value DOUBLE")
    out = {(r.event_type, r.event_id) for r in features.value_outliers(ev).collect()}
    assert out == {("a", 15)}


def test_value_outliers_overflow_raises_never_drops(spark):
    """Magnitudes whose squared z-score terms would overflow
    DECIMAL(38,0) must RAISE, not NULL-out the predicate and silently
    drop the extreme rows (the r9 advisor's cross-engine divergence:
    DuckDB's HUGEINT would not overflow)."""
    import pytest

    from flink_cdc_spark.datapipe import features

    ev = spark.createDataFrame(
        [(1, "a", 9.0e16), (2, "a", 1.0), (3, "a", 2.0)],
        "event_id BIGINT, event_type STRING, value DOUBLE",
    )  # n=3, max cents=9e18 -> n*max|cents| far beyond the 1e18 guard
    with pytest.raises(Exception, match="value_outliers"):
        features.value_outliers(ev).collect()


def test_value_outliers_overflow_guard_boundary_is_strict(spark):
    """At n*max|cents| == 1e19//max(k,2) EXACTLY, both squared z-score
    terms can land on exactly 10^38 — one past DECIMAL(38,0)'s max —
    so the guard must reject the boundary itself (advisor r11: the
    prior <= comparison admitted it)."""
    import pytest

    from flink_cdc_spark.datapipe import features

    # 2.5e16 * 100 = 2.5e18 cents exactly (5^19 * 2^17, inside double's
    # 53-bit mantissa); n=2 -> n*max = 5e18 == 10^19 // 2 for k=2.
    ev = spark.createDataFrame(
        [(1, "a", 2.5e16), (2, "a", 1.0)],
        "event_id BIGINT, event_type STRING, value DOUBLE",
    )
    with pytest.raises(Exception, match="value_outliers"):
        features.value_outliers(ev, k=2).collect()


def test_canonical_select_prefers_most_complete_copy(spark):
    """Per normalized-content cluster the MOST-raw-chars copy wins (the
    keep-the-complete-copy rule), ties break to the lowest id, singletons
    map to themselves — unlike exact_dedup's keep-lowest-key."""
    from flink_cdc_spark.datapipe import dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),       # cluster X, compact, low id
            (2, "alpha  beta   gamma"),    # cluster X, bloated -> wins
            (3, "ALPHA beta gamma"),       # cluster X, same len as 1
            (4, "solo doc"),               # singleton
            (5, "tie text"),               # cluster Y, equal length
            (6, "tie text"),               # cluster Y -> min id 5 wins
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.canonical_id: (r.n_members, r.kept_chars)
           for r in dedup.canonical_select(docs).collect()}
    assert out == {2: (3, 19), 4: (1, 8), 5: (2, 8)}


def test_exact_stratified_take_guarantees_counts(spark):
    """Exactly min(k, |stratum|) per stratum; picks deterministic across
    invocations; small strata return whole stratum."""
    from flink_cdc_spark.datapipe import sampling

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(100)] + [(1000, "tiny")],
        "doc_id LONG, source STRING",
    )
    out = sampling.exact_stratified_take(docs, k=5)
    counts = {r.stratum: r.n for r in
              out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s0": 5, "s1": 5, "s2": 5, "tiny": 1}
    a = {(r.stratum, r.doc_id) for r in out.collect()}
    b = {(r.stratum, r.doc_id)
         for r in sampling.exact_stratified_take(docs, k=5).collect()}
    assert a == b


def test_exact_stratified_take_prefilter_prunes_skewed_stratum(spark):
    """The r10 verdict's skew item: the exact per-stratum rank window is
    single-task, so a 100x-skewed stratum must be pruned BEFORE the
    window by the exact md5-prefix bucket threshold. Output must be
    bit-identical with and without the pre-filter, and the filter must
    actually drop the overwhelming majority of the big stratum."""
    from flink_cdc_spark.datapipe import sampling

    rows = [(i, "big") for i in range(20000)] + [
        (100000 + i, f"small{i % 4}") for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    k = 40

    fast = sampling.exact_stratified_take(docs, k=k)
    slow = sampling.exact_stratified_take(docs, k=k, prefilter=False)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))

    # the pre-filter itself: survivors of the big stratum ~ k + n/65536,
    # i.e. a tiny fraction of 20000 (2x head-room in the assertion)
    base = docs.select(
        F.col("source").alias("stratum"),
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("__h"),
    )
    thresh = sampling._take_bucket_threshold(base, k)
    survivors = (
        base.join(thresh, "stratum", "left")
        .where(
            F.col("__bmax").isNull()
            | (F.substring("__h", 1, sampling._TAKE_BUCKET_HEX) <= F.col("__bmax"))
        )
        .where(F.col("stratum") == "big")
        .count()
    )
    assert k <= survivors < 2 * k + 20000 // 65536 + 8, survivors


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    """Lines in >= min_docs DISTINCT docs go; within-doc repeats don't
    count toward document frequency; blank lines are ignored."""
    from flink_cdc_spark.datapipe import textstats

    footer = "all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, f"alpha one\n{footer}\n\nunique to one"),
            (2, f"beta two\n{footer}"),
            (3, f"gamma three\n{footer}\n{footer}"),  # repeat, one doc
            (4, "delta four\nrare line"),
            (5, "epsilon five\nrare line"),  # 'rare line' in only 2 docs
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: (r.kept_lines, r.removed_lines)
           for r in textstats.line_dedup(docs, min_docs=3).collect()}
    assert out == {
        1: (2, 1),  # footer removed, blank ignored
        2: (1, 1),
        3: (1, 2),  # both occurrences of the boilerplate line removed
        4: (2, 0),  # df('rare line') = 2 < 3: kept
        5: (2, 0),
    }


def test_linear_quality_score_labels_by_cross_multiplied_mean(spark):
    from flink_cdc_spark.datapipe import textstats

    docs = spark.createDataFrame(
        [(1, "good good bad"), (2, "bad bad good"), (3, "unknown words only")],
        "doc_id LONG, text STRING",
    )
    model = spark.createDataFrame(
        [("good", 500), ("bad", -400)], "term STRING, w_micro LONG"
    )
    out = {r.doc_id: (r.n_tokens, r.n_scored, r.score_micros, r.label)
           for r in textstats.linear_quality_score(docs, model).collect()}
    assert out == {
        1: (3, 3, 600, "keep"),
        2: (3, 3, -300, "drop"),
        3: (3, 0, 0, "keep"),  # unscored tokens contribute 0; 0 >= 0
    }


def test_hash_weight_model_is_deterministic_and_bounded(spark):
    from flink_cdc_spark.datapipe import textstats

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} shared") for i in range(20)], "doc_id LONG, text STRING"
    )
    m1 = {(r.term, r.w_micro) for r in textstats.hash_weight_model(docs, k=3).collect()}
    m2 = {(r.term, r.w_micro) for r in textstats.hash_weight_model(docs, k=3).collect()}
    assert m1 == m2 and len(m1) == 3
    assert all(-1000 <= w <= 1000 for _, w in m1)
