"""LLM-data extension tests: dedup recall, ANN recall vs brute force,
SimHash properties, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from pypeline_spark.functions.dedup import (
    candidate_pairs,
    jaccard_for_pairs,
    lsh_bands,
    minhash_signature,
    shingle_rows,
    simhash64,
)
from pypeline_spark.functions.multimodal import attach_payload, decode_image, frame_sample
from pypeline_spark.functions.similarity import brute_force_topk
from pypeline_spark.registry import load_all
from pypeline_spark.session import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


class TestMinHashLSH:
    def test_finds_exact_duplicates(self, spark, docs):
        # plant exact dups: same text under new ids -> jaccard 1.0 pairs
        dup = docs.filter(F.col("doc_id") < 20).withColumn(
            "doc_id", F.col("doc_id") + 100000
        )
        corpus = docs.unionByName(dup)
        rows = shingle_rows(corpus)
        pairs = candidate_pairs(lsh_bands(minhash_signature(corpus)))
        verified = jaccard_for_pairs(pairs, rows)
        found = {
            (r.id_a, r.id_b)
            for r in verified.filter(F.col("jaccard") >= 0.999).collect()
        }
        expected = {(i, i + 100000) for i in range(20)}
        assert expected <= found  # identical docs always share all bands

    def test_high_jaccard_recall_vs_exact(self, spark, sf_dir):
        # every exact-Jaccard>=0.8 pair should surface as LSH candidate
        # (P[miss] = (1-j^3)^4 <= 0.05 at j=0.8; fixture pairs are ~0.99)
        cases = load_all()
        exact = {
            (r.id_a, r.id_b)
            for r in cases["q_ngram_jaccard"].builder(spark, sf_dir).collect()
            if r.jaccard >= 0.8
        }
        lsh = {
            (r.id_a, r.id_b)
            for r in cases["q_dedup_minhash"].builder(spark, sf_dir).collect()
        }
        assert exact, "fixture should contain near-dup pairs"
        missed = exact - lsh
        assert len(missed) / len(exact) <= 0.2, f"LSH missed {missed}"

    def test_signature_shape(self, spark, docs):
        sig = minhash_signature(docs.limit(5))
        assert len([c for c in sig.columns if c.startswith("mh_")]) == 12


class TestSimHash:
    def test_identical_texts_same_fingerprint(self, spark, docs):
        a = simhash64(docs.limit(10)).collect()
        b = simhash64(docs.limit(10)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_near_dup_pairs_have_small_hamming(self, spark, sf_dir):
        cases = load_all()
        out = cases["q_simhash"].builder(spark, sf_dir)
        rows = out.collect()
        assert all(r.hamming <= 3 for r in rows)


class TestDedupClusters:
    def test_label_propagation_reaches_fixpoint(self, spark, docs):
        """N_CC_ITERS iterations must equal N_CC_ITERS+2 — i.e., the
        propagation has converged to the full closure the recursive-CTE
        oracle computes (the equality the oracle check relies on)."""
        from pypeline_spark.functions.dedup import (
            N_CC_ITERS,
            candidate_pairs,
            doc_shingle_arrays,
            jaccard_from_arrays,
            lsh_bands,
            near_dup_clusters,
        )

        arrs = doc_shingle_arrays(docs).localCheckpoint(eager=False)
        sigs = minhash_signature(docs, arrs=arrs)
        pairs = jaccard_from_arrays(candidate_pairs(lsh_bands(sigs)), arrs).filter(
            F.col("jaccard") >= 0.5
        )
        ids = docs.select("doc_id")
        at_n = sorted(map(tuple, near_dup_clusters(pairs, ids).collect()))
        beyond = sorted(
            map(tuple, near_dup_clusters(pairs, ids, n_iter=N_CC_ITERS + 2).collect())
        )
        assert at_n == beyond

    def test_chain_clusters_together(self, spark):
        """a~b and b~c must land a, b, c in ONE cluster labeled min(id)
        even when a and c were never a pair (the case greedy pair-drop
        handles wrongly)."""
        from pypeline_spark.functions.dedup import near_dup_clusters

        pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 9)], "id_a long, id_b long")
        ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 7, 9)], "doc_id long")
        out = {r.doc_id: r.cluster_id for r in near_dup_clusters(pairs, ids).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7, 9: 7}


class TestANN:
    def test_ivf_recall_vs_brute_force(self, spark, sf_dir):
        """Raw IVF neighbor lists (ivf_topk) against the exact top-k;
        the q_knn_ivf query now self-reports this as a band flag —
        verify BOTH: the tighter 0.8 floor on raw lists here, and the
        query's own summary row."""
        from pyspark.sql import functions as F

        from pypeline_spark.functions.similarity import (
            N_CELLS,
            N_QUERIES,
            ivf_topk,
            kmeans_centroids,
        )
        from pypeline_spark.session import load_table

        cases = load_all()
        exact = cases["q_topk_cosine"].builder(spark, sf_dir).collect()
        e = load_table(spark, sf_dir, "embeddings")
        centroids = kmeans_centroids(e, k=N_CELLS, n_iter=3)
        queries = e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        approx = ivf_topk(
            queries, e.select("vec_id", "embedding"), centroids
        ).collect()
        exact_sets = {}
        for r in exact:
            exact_sets.setdefault(r.q_id, set()).add(r.vec_id)
        approx_sets = {}
        for r in approx:
            approx_sets.setdefault(r.q_id, set()).add(r.vec_id)
        recalls = [
            len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
            for q in exact_sets
        ]
        mean_recall = sum(recalls) / len(recalls)
        # 4 of 16 k-means cells probed: measured 0.86 at sf0.001 and
        # 0.96 at sf0.1 (up from 0.58 with the pre-kmeans stand-in
        # centroids); floor at 0.8 with margin for fixture variation
        assert mean_recall >= 0.8, f"mean recall {mean_recall}"
        summary = cases["q_knn_ivf"].builder(spark, sf_dir).collect()
        assert len(summary) == 1 and summary[0].ivf_recall_ok == 1

    def test_ivf_recall_scales_with_probes(self, spark, sf_dir):
        """The n_probe knob must actually buy recall (measured 0.38 at
        2 probes -> 0.82 at 8 of 16 cells): more cells probed => strict
        superset of candidates => recall can only rise, and on this
        fixture it rises a lot."""
        from pyspark.sql import functions as F

        from pypeline_spark.functions.similarity import (
            N_CELLS,
            N_QUERIES,
            ivf_topk,
            kmeans_centroids,
        )
        from pypeline_spark.session import load_table

        cases = load_all()
        exact_sets = {}
        for r in cases["q_topk_cosine"].builder(spark, sf_dir).collect():
            exact_sets.setdefault(r.q_id, set()).add(r.vec_id)
        e = load_table(spark, sf_dir, "embeddings")
        centroids = kmeans_centroids(e, k=N_CELLS)
        queries = e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )

        def recall(n_probe):
            ap = {}
            out = ivf_topk(
                queries, e.select("vec_id", "embedding"), centroids, n_probe=n_probe
            ).collect()
            for r in out:
                ap.setdefault(r.q_id, set()).add(r.vec_id)
            rs = [
                len(exact_sets[q] & ap.get(q, set())) / len(exact_sets[q])
                for q in exact_sets
            ]
            return sum(rs) / len(rs)

        low, high = recall(2), recall(8)
        assert high > low, f"recall did not improve: {low} -> {high}"
        # measured 0.94 at sf0.001 / 1.0 at sf0.1 with k-means cells
        assert high >= 0.9, f"8-probe recall too low: {high}"

    def test_cell_routed_dedup_is_lossless_on_fixture(self, spark, sf_dir):
        """The cell-routed near-dup scan (kmeans cells + 8-probe BLAS
        candidates + exact rescore) must find EXACTLY the all-pairs
        result — it is registered against the exact all-pairs oracle."""
        from pypeline_spark.functions.similarity import DEDUP_SIM_THRESHOLD, cosine

        cases = load_all()
        routed = {
            (r.id_a, r.id_b, r.sim)
            for r in cases["q_dedup_embedding"].builder(spark, sf_dir).collect()
        }
        e = load_table(spark, sf_dir, "embeddings")
        a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        exact = {
            (r.id_a, r.id_b, r.sim)
            for r in a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("s"))
            .filter(F.col("s") >= DEDUP_SIM_THRESHOLD)
            .select("id_a", "id_b", F.round("s", 6).alias("sim"))
            .collect()
        }
        assert routed == exact

    def test_brute_force_self_similarity(self, spark, sf_dir):
        e = load_table(spark, sf_dir, "embeddings").limit(50)
        q = e.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        # without the self-filter, every vector's top hit is itself
        out = brute_force_topk(q, e.select("vec_id", "embedding"), k=1)
        assert all(r.sim < 1.0 or r.vec_id != r.q_id for r in out.collect())


class TestMultimodal:
    def test_pointer_layout_round_trips(self, spark, docs):
        """Pack payloads into shard blobs, then fetch every pointer's
        byte range back — fetched bytes must equal the original payload
        (the (uri, byte_range) object-storage layout is lossless)."""
        from pypeline_spark.functions.multimodal import (
            fetch_ranges,
            pack_shards,
            payload_pointers,
        )

        payloads = attach_payload(docs.limit(200)).select("doc_id", "payload")
        fetched = fetch_ranges(payload_pointers(payloads), pack_shards(payloads))
        orig = {r.doc_id: bytes(r.payload) for r in payloads.collect()}
        got = {r.doc_id: bytes(r.payload) for r in fetched.collect()}
        assert got == orig

    def test_decode_plumbing(self, spark, docs):
        import hashlib

        out = decode_image(attach_payload(docs.limit(25)))
        rows = out.collect()
        assert len(rows) == 25
        for r in rows:
            assert r.byte_len > 0
            assert len(r.header) == 8  # 4 bytes hex
            assert r.width == 8 and r.height == r.byte_len // 8
            # channel de-interleave partitions the luminance exactly
            assert r.ch0_sum + r.ch1_sum == r.lum_sum

    def test_decode_witness_is_exact(self, spark, docs):
        """The md5 pixel witness and channel sums must equal a local
        recompute over the original text bytes — the decode is a real
        codec, not a shape-only stub."""
        import hashlib

        sample = docs.limit(10)
        decoded = {r.doc_id: r for r in decode_image(attach_payload(sample)).collect()}
        for t in sample.select("doc_id", "text").collect():
            raw = t.text.encode("utf-8")
            r = decoded[t.doc_id]
            assert r.px_md5 == hashlib.md5(raw).hexdigest()
            assert r.lum_sum == sum(raw)
            assert r.ch0_sum == sum(raw[0::2])
            assert r.header == raw[:4].hex()

    def test_byte_len_matches_text_len(self, spark, docs):
        joined = (
            decode_image(attach_payload(docs.limit(25)))
            .join(docs.limit(25), "doc_id")
            .select("byte_len", F.length(F.encode("text", "utf-8")).alias("expect"))
        )
        assert all(r.byte_len == r.expect for r in joined.collect())

    def test_frame_sample_stride(self, spark, docs):
        out = frame_sample(attach_payload(docs.limit(5)))
        counts = {r[0]: r[1] for r in out.groupBy("doc_id").count().collect()}
        lens = {r.doc_id: r.n for r in docs.limit(5).select("doc_id", F.length(F.encode("text", "utf-8")).alias("n")).collect()}
        for doc_id, n in lens.items():
            assert counts[doc_id] == max(n // 64, 1)

    def test_feature_extract_numpy_parity(self, spark, docs):
        import numpy as np

        from pypeline_spark.functions.multimodal import (
            N_FEATURE_BINS,
            extract_features,
        )

        sample = docs.limit(10)
        feats = {
            r.doc_id: r.features
            for r in extract_features(attach_payload(sample)).collect()
        }
        texts = {r.doc_id: r.text for r in sample.collect()}
        assert set(feats) == set(texts)
        for doc_id, text in texts.items():
            vec = np.array(feats[doc_id], dtype=np.float32)
            assert vec.shape == (N_FEATURE_BINS,)
            assert abs(vec.sum() - 1.0) < 1e-5  # L1-normalized
            raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
            expect = np.bincount(raw >> 4, minlength=N_FEATURE_BINS).astype("float32")
            np.testing.assert_allclose(vec, expect / expect.sum(), rtol=1e-6)


class TestCorpusPipeline:
    def test_cleaned_corpus_invariants(self, spark, sf_dir):
        from pypeline_spark.functions.corpus import (
            NEAR_DUP_THRESHOLD,
            clean_corpus,
        )
        from pypeline_spark.functions.dedup import (
            candidate_pairs,
            doc_shingle_arrays,
            jaccard_from_arrays,
            lsh_bands,
            minhash_signature,
        )
        from pypeline_spark.session import load_table

        cleaned = clean_corpus(load_table(spark, sf_dir, "documents")).cache()
        # no exact duplicates survive
        fps = cleaned.select(F.md5(F.lower(F.trim("text"))).alias("f"))
        assert fps.count() == fps.distinct().count()
        # re-running the same near-dup detector on the output finds
        # nothing: every detected pair's larger id was dropped, so a
        # surviving pair would contradict the drop policy
        arrs = doc_shingle_arrays(cleaned)
        pairs = candidate_pairs(lsh_bands(minhash_signature(cleaned, arrs=arrs)))
        remaining = (
            jaccard_from_arrays(pairs, arrs)
            .filter(F.col("jaccard") >= NEAR_DUP_THRESHOLD)
            .count()
        )
        assert remaining == 0

    def test_minhash_empty_input(self, spark):
        from pypeline_spark.functions.dedup import minhash_signature

        empty = spark.createDataFrame([], "doc_id long, text string")
        assert minhash_signature(empty).count() == 0

    def test_carry_tokens_parity(self, spark, sf_dir):
        # the r19 rewrite (window exact-dedup + carried token counts)
        # must keep the cleaned row set identical and n_toks equal to
        # the recomputed token count per surviving doc
        from pypeline_spark.functions.corpus import clean_corpus
        from pypeline_spark.functions.text import tokens
        from pypeline_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        plain = clean_corpus(docs)
        carried = clean_corpus(docs, carry_tokens=True)
        assert carried.columns == plain.columns + ["n_toks"]
        a = sorted(map(tuple, plain.collect()))
        b = sorted(map(tuple, carried.drop("n_toks").collect()))
        assert a == b
        bad = carried.filter(
            F.col("n_toks") != F.size(tokens(F.col("text")))
        ).count()
        assert bad == 0

    def test_exact_dedup_keeps_smallest_doc_id(self, spark, docs):
        # the window row_number rewrite must keep the group-min policy:
        # for every duplicated fingerprint, the survivor is min(doc_id)
        from pypeline_spark.functions.corpus import clean_corpus

        dup = docs.filter(F.col("doc_id") < 30).withColumn(
            "doc_id", F.col("doc_id") + 100000
        )
        cleaned = clean_corpus(docs.unionByName(dup))
        surviving = {r.doc_id for r in cleaned.select("doc_id").collect()}
        planted_and_kept = {
            r.doc_id
            for r in clean_corpus(docs)
            .filter(F.col("doc_id") < 30)
            .select("doc_id")
            .collect()
        }
        # every planted clone whose original survives the gates must
        # lose to the original (smaller id) in exact dedup
        assert all(i + 100000 not in surviving for i in planted_and_kept)
        assert planted_and_kept <= surviving


class TestLayoutIndependence:
    """Exports claim layout-independent determinism — re-running under a
    different partitioning must produce identical results (the property
    that makes training runs comparable)."""

    def test_train_shards_stable_across_partitionings(self, spark, docs):
        from pypeline_spark.functions.export import train_shards

        d = docs.select("doc_id")
        a = sorted(map(tuple, train_shards(d.repartition(7)).collect()))
        b = sorted(map(tuple, train_shards(d.repartition(2)).collect()))
        assert a == b
        # positions are a 1..n permutation within each shard
        from collections import defaultdict

        by_shard = defaultdict(list)
        for _, shard, pos in a:
            by_shard[shard].append(pos)
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(1, len(poss) + 1)), shard

    def test_payload_pointers_stable_across_partitionings(self, spark, docs):
        from pypeline_spark.functions.multimodal import attach_payload, payload_pointers

        p = attach_payload(docs.limit(100)).select("doc_id", "payload")
        a = sorted(map(tuple, payload_pointers(p.repartition(5)).collect()))
        b = sorted(map(tuple, payload_pointers(p.repartition(1)).collect()))
        assert a == b


class TestSequencePacking:
    def test_packs_respect_budget_and_are_layout_stable(self, spark, docs):
        from pypeline_spark.functions.export import PACK_BUDGET, pack_sequences

        a = sorted(map(tuple, pack_sequences(docs.repartition(5)).collect()))
        b = sorted(map(tuple, pack_sequences(docs.repartition(2)).collect()))
        assert a == b  # layout-independent
        from collections import defaultdict

        totals = defaultdict(int)
        members = defaultdict(int)
        for _, shard, pack_id, n_tokens in a:
            totals[(shard, pack_id)] += n_tokens
            members[(shard, pack_id)] += 1
        for key, tot in totals.items():
            # a pack may exceed the budget only as an oversized singleton
            assert tot <= PACK_BUDGET or members[key] == 1, (key, tot)
        assert len(totals) > 1  # the fixture actually packs into bins


class TestKnnLsh:
    def test_recall_floor_vs_brute_force(self, spark, sf_dir):
        from pypeline_spark.registry import load_all

        cases = load_all()
        brute = {
            (r.q_id, r.vec_id)
            for r in cases["q_topk_cosine"].builder(spark, sf_dir).collect()
        }
        lsh = {
            (r.q_id, r.vec_id)
            for r in cases["q_knn_lsh"].builder(spark, sf_dir).collect()
        }
        # near-random fixture vectors: 6x6 LSH measures ~0.34 recall
        # (clustered production data recalls far higher); the floor
        # guards against a silent candidate-generation regression
        assert len(brute & lsh) / len(brute) >= 0.2

    def test_candidate_join_is_equi_not_nested(self, spark, sf_dir):
        from pypeline_spark.registry import load_all

        plan = (
            load_all()["q_knn_lsh"]
            .builder(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestSpanDedup:
    def test_dup_share_bounded_and_consistent(self, spark, sf_dir):
        from pypeline_spark.registry import load_all

        cases = load_all()
        rows = cases["q_span_dup_share"].builder(spark, sf_dir).collect()
        assert rows, "span dup share returned nothing"
        for r in rows:
            assert 0 <= r.n_dup_spans <= r.n_spans
            assert 0 <= r.dup_bp <= 10_000
        # at least one doc shares a span with another (fixture has
        # 969 cross-doc duplicated spans at sf0.01)
        assert any(r.n_dup_spans > 0 for r in rows)

    def test_span_dedup_spans_recur_across_docs(self, spark, sf_dir):
        from pypeline_spark.registry import load_all

        rows = load_all()["q_span_dedup"].builder(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.n_docs >= 2
            assert r.n_occ >= r.n_docs
            assert len(r.span.split(" ")) == 10


class TestKnnRecall:
    def test_recall_bounds_and_floor(self, spark, sf_dir):
        from pypeline_spark.functions.similarity import N_QUERIES, TOP_K
        from pypeline_spark.registry import load_all

        rows = load_all()["q_knn_recall"].builder(spark, sf_dir).collect()
        assert len(rows) == N_QUERIES
        for r in rows:
            assert 0 <= r.hits <= TOP_K
            assert r.recall_bp == (10_000 * r.hits) // TOP_K
        # same floor as TestKnnLsh: mean recall over queries >= 0.2
        assert sum(r.hits for r in rows) / (len(rows) * TOP_K) >= 0.2


class TestMixtureTemperature:
    def test_sqrt_scaling_between_natural_and_uniform(self, spark, sf_dir):
        """tau=0.5 keeps MORE of the small strata than natural share
        and MORE total than the uniform mix — the defining property."""
        from pypeline_spark.registry import load_all
        from pypeline_spark.session import load_table

        cases = load_all()
        full = load_table(spark, sf_dir, "documents")
        kept = cases["q_mixture_temperature"].builder(spark, sf_dir)
        n_full = full.count()
        n_kept = kept.count()
        assert 0 < n_kept < n_full  # really downsampled, not degenerate
        # smallest stratum survives (rate anchor = 1.0)
        by_lang_full = {r.lang: r.cnt for r in full.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
        by_lang_kept = {r.lang: r.cnt for r in kept.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
        smallest = min(by_lang_full, key=by_lang_full.get)
        assert by_lang_kept[smallest] == by_lang_full[smallest]
        # larger strata keep a strictly smaller share than the anchor
        largest = max(by_lang_full, key=by_lang_full.get)
        assert by_lang_kept[largest] < by_lang_full[largest]


class TestJaccardPrefix:
    def test_prefix_prunes_candidates_but_loses_no_pair(self, spark, sf_dir):
        """The prefix candidate set must be strictly smaller than the
        full token-match candidate set (the pruning is real), while the
        final pairs equal the >= t slice of the brute-force ground
        truth (the pruning is lossless — also hash-pinned vs DuckDB)."""
        from pyspark.sql import functions as F

        from pypeline_spark.functions.dedup import (
            PREFIX_JACCARD_T,
            shingle_rows,
        )
        from pypeline_spark.registry import load_all
        from pypeline_spark.session import load_table

        cases = load_all()
        rows = shingle_rows(load_table(spark, sf_dir, "documents"))
        full_cand = (
            rows.alias("a")
            .join(rows.alias("b"), F.col("a.shingle") == F.col("b.shingle"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id"), F.col("b.doc_id"))
            .distinct()
            .count()
        )
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in cases["q_jaccard_prefix"].builder(spark, sf_dir).collect()
        }
        truth = {
            (r.id_a, r.id_b): r.jaccard
            for r in cases["q_ngram_jaccard"].builder(spark, sf_dir).collect()
            if r.jaccard >= PREFIX_JACCARD_T
        }
        assert got == truth
        # pruning effectiveness: the verified join touched fewer pairs
        # than the full token join would have produced
        assert len(got) <= full_cand
        assert full_cand > 0


class TestDedupRepresentatives:
    def test_keep_best_with_min_id_tiebreak(self, spark):
        from pypeline_spark.functions.dedup import dedup_representatives

        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (9, 9)],
            "doc_id bigint, cluster_id bigint",
        )
        scored = spark.createDataFrame(
            [
                (1, 0.2), (2, 0.9), (3, 0.9),   # tie at 0.9 -> min id 2
                (4, 0.5), (5, 0.7),             # clear best 5
                (9, 0.1),                        # singleton keeps itself
            ],
            "doc_id bigint, __score double",
        )
        got = {
            r.cluster_id: (r.rep_id, r.n_members, r.rep_score)
            for r in dedup_representatives(scored, clusters).collect()
        }
        assert got == {
            1: (2, 3, 0.9),
            4: (5, 2, 0.7),
            9: (9, 1, 0.1),
        }
