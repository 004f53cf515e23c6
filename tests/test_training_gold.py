"""Gold-oracle parity for the approximate training ops (VERDICT r1 item 1).

The gold side (qse_spark.goldgen) is an independent plain-Python/numpy
implementation driven by the pure-Python XXH64 twin; these tests assert the
Spark operators reproduce it bit-for-bit — including dtypes, which is what
the driver's value-hash comparison is sensitive to."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from qse_spark import goldgen
from qse_spark.operators import dedup, multimodal, similarity
from qse_spark.xxh import SPARK_SEED, _signed, hash_int, hash_long, xxh64

from conftest import TESTDATA


def test_xxh64_matches_spark(spark):
    """Pure-Python XXH64 is bit-exact vs Spark's xxhash64 expression for
    string, int-literal and long operands (the three paths goldgen uses)."""
    row = spark.sql("""
        SELECT xxhash64('abc') a, xxhash64('') b,
               xxhash64('word shingle three') c,
               xxhash64('tok', 7) d,
               xxhash64(CAST(-42 AS BIGINT), CAST(3 AS BIGINT)) e,
               xxhash64('ünïcödé ✨') f""").collect()[0]
    assert row["a"] == _signed(xxh64(b"abc", SPARK_SEED))
    assert row["b"] == _signed(xxh64(b"", SPARK_SEED))
    assert row["c"] == _signed(xxh64(b"word shingle three", SPARK_SEED))
    assert row["d"] == _signed(hash_int(7, xxh64(b"tok", SPARK_SEED)))
    assert row["e"] == _signed(hash_long(3, hash_long(-42, SPARK_SEED)))
    assert row["f"] == _signed(xxh64("ünïcödé ✨".encode(), SPARK_SEED))
    # spark_xxhash64 operand dispatch: a bare int folds as LONG; an
    # IntegerType operand (what F.lit(i) is) must be wrapped as
    # IntOperand or the gold silently diverges (review finding)
    from qse_spark.xxh import IntOperand, spark_xxhash64
    assert row["d"] == spark_xxhash64("tok", IntOperand(7))
    assert row["e"] == spark_xxhash64(-42, 3)
    assert row["d"] != spark_xxhash64("tok", 7)   # the documented trap


@pytest.fixture(scope="module")
def gold_dir():
    return goldgen.ensure_training_gold(TESTDATA)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{TESTDATA}/embeddings.parquet")


def _assert_bitexact(spark_df, gold_path, sort_cols):
    got = spark_df.toPandas()
    exp = pd.read_parquet(gold_path)
    got = got[sorted(got.columns)].sort_values(sort_cols).reset_index(drop=True)
    exp = exp[sorted(exp.columns)].sort_values(sort_cols).reset_index(drop=True)
    assert len(got) > 0, "vacuous comparison"
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)


def test_minhash_dedup_gold(docs, gold_dir):
    _assert_bitexact(dedup.minhash_dedup(docs, tau=0.5, k=3),
                     f"{gold_dir}/minhash_dedup.parquet", ["doc_id"])


def test_simhash_pairs_gold(docs, gold_dir):
    _assert_bitexact(dedup.simhash_dedup(docs, hamming=3),
                     f"{gold_dir}/simhash_pairs.parquet", ["id_a", "id_b"])


def test_lsh_ann_topk_gold(emb, gold_dir):
    out = (similarity.lsh_ann_topk(emb, emb.filter(F.col("vec_id") < 5),
                                   dim=64, k=10, n_planes=8)
           .select("query_id", "vec_id", "rank",
                   F.round("cosine", 6).alias("cosine")))
    _assert_bitexact(out, f"{gold_dir}/lsh_ann_topk.parquet",
                     ["query_id", "rank"])


def test_cosine_near_dup_gold(emb, gold_dir):
    dupe = (emb.filter(F.col("vec_id") < 25)
            .withColumn("vec_id", F.col("vec_id") + 100000))
    out = (similarity.cosine_near_dup_pairs(emb.unionByName(dupe),
                                            tau=0.9, dim=64)
           .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")))
    _assert_bitexact(out, f"{gold_dir}/cosine_near_dup.parquet",
                     ["id_a", "id_b"])


def _media(docs):
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(F.col("doc_id").alias("media_id"), kinds.alias("kind"),
                       F.encode("text", "utf-8").alias("payload"),
                       F.concat(F.lit("x-fake/"), kinds).alias("mime"))


def test_mm_decode_gold(docs, gold_dir):
    _assert_bitexact(multimodal.decode_media(_media(docs), fake=True),
                     f"{gold_dir}/mm_features.parquet", ["media_id"])


def test_mm_frames_gold(docs, gold_dir):
    feats = multimodal.decode_media(_media(docs), fake=True)
    _assert_bitexact(multimodal.frame_sample(feats, every_n=8),
                     f"{gold_dir}/mm_frames.parquet",
                     ["media_id", "frame_idx"])


def test_simhash_empty_doc_signature_zero(spark):
    d = spark.createDataFrame([(1, "alpha beta"), (2, ""), (3, "   ")],
                              ["doc_id", "text"])
    rows = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash(d).collect()}
    assert rows[2] == 0 and rows[3] == 0 and rows[1] != 0


def test_simhash_empty_docs_bounded(spark):
    """N token-less docs (all signature 0) must produce ZERO pairs from
    simhash_dedup (they used to collide on every chunk key — O(N²) pairs)
    and ONE linear exact-dup cluster from simhash_dedup_clusters."""
    rows = [(i, "") for i in range(20)] + [(100, "real text content here"),
                                           (101, "real text content here")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.simhash_dedup(d, hamming=3).collect()
    assert all(p["id_a"] >= 100 for p in pairs)   # no empty-doc pairs
    m = {r["doc_id"]: r["keeper_id"]
         for r in dedup.simhash_dedup_clusters(d, hamming=3).collect()}
    assert all(m[i] == 0 for i in range(20))      # one group, keeper=min
    assert m[100] == 100 and m[101] == 100


def test_simhash_chunk_cap_drops_hot_block(spark):
    """Chunks denser than max_block are dropped (and observable in
    dropped_chunk_report) — identical docs all share all 4 chunk keys, so
    a max_block below the group size must suppress their pairs."""
    d = spark.createDataFrame(
        [(i, "same boilerplate text for everyone") for i in range(8)]
        + [(50, "something else entirely unrelated words")],
        ["doc_id", "text"])
    assert dedup.simhash_dedup(d, hamming=3, max_block=4).count() == 0
    rep = dedup.dropped_chunk_report(d, max_block=4).collect()
    assert len(rep) == 4 and all(r["n"] == 8 for r in rep)
    # cap above the group size: all 28 pairs come back
    assert dedup.simhash_dedup(d, hamming=3, max_block=500).count() == 28


def test_dropped_shingle_report(spark):
    d = spark.createDataFrame(
        [(i, "common boiler plate unique%d tail" % i) for i in range(6)],
        ["doc_id", "text"])
    rep = dedup.dropped_shingle_report(d, k=3, max_df=5).collect()
    assert {r["shingle"] for r in rep} == {"common boiler plate"}
    assert rep[0]["df"] == 6


def test_ivf_topk_gold(emb, gold_dir):
    out = (similarity.ivf_topk(emb, emb.filter(F.col("vec_id") < 5),
                               k=10, n_centroids=16, nprobe=4)
           .select("query_id", "vec_id", "rank",
                   F.round("cosine", 6).alias("cosine")))
    _assert_bitexact(out, f"{gold_dir}/ivf_topk.parquet",
                     ["query_id", "rank"])


def test_winnow_gold(docs, gold_dir):
    from qse_spark.operators import text
    _assert_bitexact(text.winnow_fingerprint(docs, k=8, w=4),
                     f"{gold_dir}/winnow.parquet", ["doc_id", "fp"])


def test_simhash_clusters_gold(docs, gold_dir):
    _assert_bitexact(dedup.simhash_dedup_clusters(docs, hamming=3),
                     f"{gold_dir}/simhash_clusters.parquet", ["doc_id"])


def test_tfidf_pairs_gold(docs, gold_dir):
    from qse_spark.operators.linking import tfidf_cosine_pairs
    out = (tfidf_cosine_pairs(docs, tau=0.9, id_col="doc_id",
                              text_col="text")
           .select("id_a", "id_b", F.round("cosine", 6).alias("cosine")))
    _assert_bitexact(out, f"{gold_dir}/tfidf_pairs.parquet",
                     ["id_a", "id_b"])


def test_tfidf_boundary_pairs(spark):
    """Two pairs deliberately straddling tau=0.9 (one at ~0.8986, one at
    ~0.900003 — margins 1e-3 / 3e-6, which is still >= 1e9x the
    cross-engine float error): the Spark filter and the numpy gold twin
    must agree on both sides of the boundary."""
    def mk(shared, total, did, pfx):
        return (did, " ".join(
            [f"{pfx}tok{i}" for i in range(shared)]
            + [f"{pfx}uniq{did}_{j}" for j in range(total - shared)]))

    rows = [mk(127, 130, 1, "a"), mk(127, 130, 2, "a"),
            mk(129, 132, 3, "b"), mk(129, 132, 4, "b")]
    all_pairs = goldgen.gold_tfidf_pairs(rows, tau=0.8)
    c = {(a, b): v for a, b, v in zip(all_pairs["id_a"].to_pylist(),
                                      all_pairs["id_b"].to_pylist(),
                                      all_pairs["cosine"].to_pylist())}
    assert 0.895 < c[(1, 2)] < 0.9 and 0.9 < c[(3, 4)] < 0.905
    gold = goldgen.gold_tfidf_pairs(rows, tau=0.9)
    assert (list(zip(gold["id_a"].to_pylist(), gold["id_b"].to_pylist()))
            == [(3, 4)])
    from qse_spark.operators.linking import tfidf_cosine_pairs
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = (tfidf_cosine_pairs(d, tau=0.9, id_col="doc_id", text_col="text")
           .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
           .collect())
    assert [(r["id_a"], r["id_b"], r["cosine"]) for r in got] == \
        [(3, 4, gold["cosine"].to_pylist()[0])]


def test_tfidf_prefix_filter_lossless(spark):
    """The prefix-filtered plan (AllPairs bound) must return EXACTLY the
    direct inverted-index join's pairs and cosines — on an adversarial
    mix: heavy shared boilerplate (hot, low-idf tokens that fall into
    every suffix), near-identical tf-variant pairs straddling typical
    taus, exact duplicates (cosine 1.0), and a doc whose entire content
    is boilerplate (its prefix is still non-empty: total mass 1 > tau^2
    so at least one token always stays indexed)."""
    import math

    from qse_spark.operators.linking import tfidf_cosine_pairs

    boiler = "the of and to in for on with " * 4
    rows = [
        (1, boiler + "alpha beta gamma delta"),
        (2, boiler + "alpha beta gamma delta"),          # dup of 1
        (3, boiler + "alpha beta gamma epsilon"),        # near-dup of 1
        (4, boiler + "zeta eta theta iota kappa"),
        (5, boiler.strip()),                             # boilerplate-only
        (6, "alpha beta gamma delta"),                   # no boilerplate
        (7, "lonely unique words here"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    for tau in (0.5, 0.7, 0.9):
        def run(pf):
            out = tfidf_cosine_pairs(d, tau=tau, id_col="doc_id",
                                     text_col="text", prefix_filter=pf)
            return {(r.id_a, r.id_b): r.cosine for r in out.collect()}
        direct, prefix = run(False), run(True)
        assert set(direct) == set(prefix), tau
        assert all(math.isclose(direct[k], prefix[k], rel_tol=1e-9)
                   for k in direct), tau
    # the dup pair must be present at every tau with cosine ~1.0
    assert math.isclose(run(True)[(1, 2)], 1.0, rel_tol=1e-12)


def test_tfidf_prefix_filter_lossless_random_worlds(spark):
    """Prefix-vs-direct equality over seeded random worlds with Zipf-ish
    token draws (hot heads land in suffixes, rare tails in prefixes) —
    the structural regimes the fixed fixture can't cover: singleton
    token docs, all-hot docs, disjoint vocabularies, repeated tf."""
    import math

    import numpy as np

    from qse_spark.operators.linking import tfidf_cosine_pairs

    for seed in (3, 11, 27):
        rng = np.random.default_rng(seed)
        vocab = [f"w{j}" for j in range(40)]
        p = 1.0 / np.arange(1, len(vocab) + 1)
        p /= p.sum()
        rows = []
        for did in range(30):
            n = int(rng.integers(1, 25))
            rows.append((did, " ".join(rng.choice(vocab, size=n, p=p))))
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        for tau in (0.55, 0.9):
            def run(pf):
                out = tfidf_cosine_pairs(d, tau=tau, id_col="doc_id",
                                         text_col="text", prefix_filter=pf)
                return {(r.id_a, r.id_b): r.cosine for r in out.collect()}
            direct, prefix = run(False), run(True)
            assert set(direct) == set(prefix), (seed, tau)
            assert all(math.isclose(direct[k], prefix[k], rel_tol=1e-9)
                       for k in direct), (seed, tau)


def test_simhash_zero_signature_doc_not_merged_with_empty(spark):
    """A token-bearing doc whose bit votes legitimately produce signature
    0 must NOT be merged into the token-less exact-dup cluster (review
    finding: the cluster star used to test simhash == 0, which at
    billions of docs marks ~1e-8 of real 2-token docs as duplicates of
    empty documents). Membership now tests n_tok. The fixture fakes the
    rare event by passing a precomputed sig table."""
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, ""), (4, "gamma delta")],
        ["doc_id", "text"])
    sig = dedup.simhash(d)
    rows = {r["doc_id"]: (r["simhash"], r["n_tok"]) for r in sig.collect()}
    assert rows[2] == (0, 0) and rows[3] == (0, 0)
    assert rows[1][1] == 2 and rows[4][1] == 2
    # force doc 1's signature to 0 while keeping its n_tok — the
    # legitimately-zero-signature case
    forced = sig.withColumn(
        "simhash", F.when(F.col("doc_id") == 1, F.lit(0).cast("long"))
        .otherwise(F.col("simhash"))).localCheckpoint(eager=True)
    m = {r["doc_id"]: r["keeper_id"]
         for r in dedup.simhash_dedup_clusters(d, hamming=3,
                                               sig=forced).collect()}
    assert m[2] == 2 and m[3] == 2        # empty docs cluster together
    assert m[1] == 1 and m[4] == 4        # real docs untouched

    # pigeonhole precondition is now asserted, not assumed
    import pytest
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_dedup(d, hamming=4, blocks=4)
