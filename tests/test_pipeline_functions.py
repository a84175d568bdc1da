"""Training-data pipeline ops: dedup, similarity, text analysis,
multimodal plumbing — verified on the driver's documents/embeddings
tables (sf0.001) plus deterministic fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


# ---- text analysis --------------------------------------------------------
def test_token_count_and_quality(documents):
    from byzer_retrieval_spark.functions.text import (
        quality_features_exprs,
        token_count_expr,
    )

    feats = quality_features_exprs(F.col("text"))
    row = (
        documents.select(
            "doc_id",
            "text",
            token_count_expr(F.col("text")).alias("tc"),
            *[v.alias(k) for k, v in feats.items()],
        )
        .filter(F.col("doc_id") == 0)
        .collect()[0]
    )
    assert row["tc"] == len(row["text"].split())
    assert row["n_chars"] == len(row["text"])
    assert 0.0 <= row["stopword_ratio"] <= 1.0
    assert row["mean_token_len"] > 0


def test_lang_id_heuristic(spark):
    from byzer_retrieval_spark.functions.text import lang_id_expr

    rows = [
        ("the cat and the dog is in that house", "en"),
        ("der hund und die katze ist nicht ein fisch", "de"),
        ("le chat est dans la maison pour les amis", "fr"),
        ("el perro es un animal que vive por la casa", "es"),
        ("zzz qqq xxx", "und"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    got = [r["lang"] for r in df.select(lang_id_expr(F.col("text")).alias("lang")).collect()]
    assert got == [lang for _, lang in rows]


def test_fingerprint_whitespace_case_invariant(spark):
    from byzer_retrieval_spark.functions.text import fingerprint_expr

    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different text",)], ["text"]
    )
    fps = [r["fp"] for r in df.select(fingerprint_expr(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_text_sql_oracles_match(documents):
    """Each text op's DuckDB SQL form must equal the Spark expression."""
    import duckdb

    from byzer_retrieval_spark.functions.text import (
        fingerprint_expr,
        fingerprint_sql,
        lang_id_expr,
        lang_id_sql,
        token_count_expr,
        token_count_sql,
    )

    sdf = (
        documents.select(
            "doc_id",
            token_count_expr(F.col("text")).alias("tc"),
            lang_id_expr(F.col("text")).alias("lang"),
            fingerprint_expr(F.col("text")).alias("fp"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    ddf = con.execute(
        f"SELECT doc_id, {token_count_sql('text')} AS tc, "
        f"{lang_id_sql('text')} AS lang, {fingerprint_sql('text')} AS fp "
        f"FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    assert sdf["tc"].tolist() == ddf["tc"].tolist()
    assert sdf["lang"].tolist() == ddf["lang"].tolist()
    assert sdf["fp"].tolist() == ddf["fp"].tolist()


# ---- dedup ------------------------------------------------------------------
@pytest.fixture(scope="module")
def dup_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "The  Quick Brown Fox jumps over the lazy dog"),  # normalized dup
        (3, "the quick brown fox jumps over the lazy cat today"),  # near-dup
        (4, "completely unrelated content about spark engines"),
        (5, "another unrelated document mentioning parquet files"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_exact_dedup(dup_df):
    from byzer_retrieval_spark.functions.dedup import dedup_exact, exact_dup_groups

    groups = exact_dup_groups(dup_df, "id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["dup_ids"] == [0, 1, 2]
    assert groups[0]["keep_id"] == 0
    kept = sorted(r["id"] for r in dedup_exact(dup_df, "id", "text").collect())
    assert kept == [0, 3, 4, 5]


def test_ngram_jaccard_pairs(dup_df):
    from byzer_retrieval_spark.functions.dedup import ngram_jaccard_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_df, "id", "text", n=3, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0
    assert (4, 5) not in pairs


def test_minhash_lsh_finds_near_dups(dup_df):
    from byzer_retrieval_spark.functions.dedup import (
        minhash_lsh_dup_pairs,
        ngram_jaccard_pairs,
    )

    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(dup_df, "id", "text", n=2, threshold=0.6).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dup_pairs(
            dup_df, "id", "text", num_hashes=64, bands=16, shingle_n=2, threshold=0.6
        ).collect()
    }
    # LSH verifies candidates with exact jaccard → subset relation both
    # ways at these parameters (recall ~1 for j>=0.6 with b=16,r=4)
    assert lsh == exact
    assert (0, 1) in lsh


def test_simhash_near_dups(dup_df):
    from byzer_retrieval_spark.functions.dedup import simhash_dup_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_dup_pairs(dup_df, "id", "text", max_hamming=6).collect()
    }
    assert pairs.get((0, 1)) == 0  # identical text → identical simhash
    assert pairs.get((0, 2)) == 0  # normalization-invariant
    assert (4, 5) not in pairs


def test_embedding_near_dup_and_topk(spark, embeddings, tmp_path):
    from byzer_retrieval_spark.functions.dedup import embedding_dup_pairs
    from byzer_retrieval_spark.functions.similarity import (
        LshVectorIndex,
        brute_force_cosine_topk,
    )

    sub = embeddings.limit(60)
    # exact pairwise: symmetric, self-excluded, cosine in [-1, 1]
    pairs = embedding_dup_pairs(sub, "vec_id", "embedding", threshold=0.8).collect()
    for r in pairs:
        assert r["id_a"] < r["id_b"] and -1.0 <= r["cosine"] <= 1.0001

    q = embeddings.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    exact = [r["id"] for r in brute_force_cosine_topk(embeddings, "vec_id", "embedding", q, k=10).collect()]
    assert exact[0] == 0  # self is most similar
    # the testdata embeddings are near-random (best neighbor cosine ~0.33,
    # bit-agreement p~0.6) — LSH's job is HIGH-similarity retrieval, so
    # assert (a) the query itself is always found, (b) exact mode
    # (probe >= planes) reproduces brute force identically
    idx = LshVectorIndex(str(tmp_path / "lsh"), num_planes=12, num_tables=2)
    idx.build(embeddings, "vec_id", "embedding", dim=len(q))
    approx = idx.topk(spark, q, k=10, probe_hamming=3).collect()
    assert approx[0]["id"] == 0 and approx[0]["cosine"] == pytest.approx(1.0, abs=1e-5)
    exact_mode = [r["id"] for r in idx.topk(spark, q, k=10, probe_hamming=12).collect()]
    assert exact_mode == exact


def test_lsh_index_partition_pruning(spark, embeddings, tmp_path):
    """The probe must reach the scan as PARTITION filters (whole bucket
    directories pruned) — the point of build-time bucketing."""
    import io
    from contextlib import redirect_stdout

    from byzer_retrieval_spark.functions.similarity import LshVectorIndex

    q = embeddings.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    idx = LshVectorIndex(str(tmp_path / "lsh"), num_planes=12, num_tables=2)
    idx.build(embeddings, "vec_id", "embedding", dim=len(q))
    plan_buf = io.StringIO()
    with redirect_stdout(plan_buf):
        idx.topk(spark, q, k=10, probe_hamming=2).explain("formatted")
    plan = plan_buf.getvalue()
    assert "PartitionFilters" in plan
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("bucket" in l and "tbl" in l for l in pf_lines), pf_lines


def test_lsh_recall_on_planted_near_dups(spark, tmp_path):
    """LSH must reliably retrieve true near-duplicates (cosine >= 0.95):
    plant 20 perturbed copies of a base vector among 480 random ones."""
    import numpy as np

    from byzer_retrieval_spark.functions.similarity import (
        LshVectorIndex,
        brute_force_cosine_topk,
    )

    rng = np.random.default_rng(123)
    base = rng.standard_normal(32)
    rows = []
    for i in range(20):  # planted near-dups of `base`
        v = base + 0.12 * rng.standard_normal(32)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    for i in range(20, 500):
        v = rng.standard_normal(32)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, ["id", "vec"])
    qv = (base / np.linalg.norm(base)).tolist()
    exact = [r["id"] for r in brute_force_cosine_topk(df, "id", "vec", qv, k=10).collect()]
    idx = LshVectorIndex(str(tmp_path / "lsh_planted"), num_planes=12, num_tables=2)
    idx.build(df, "id", "vec", dim=32)
    approx = [r["id"] for r in idx.topk(spark, qv, k=10, probe_hamming=2).collect()]
    recall = len(set(exact) & set(approx)) / 10.0
    assert recall >= 0.9, f"LSH recall on planted near-dups {recall}"

    # the bucketed dup-pair path finds the planted near-dup pairs exactly
    from byzer_retrieval_spark.functions.dedup import embedding_dup_pairs

    exact_pairs = sorted(
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(df, "id", "vec", threshold=0.95).collect()
    )
    idx2 = LshVectorIndex(str(tmp_path / "lsh_pairs"), num_planes=2, num_tables=16)
    idx2.build(df, "id", "vec", dim=32)
    lsh_pairs = sorted(
        (r["id_a"], r["id_b"]) for r in idx2.dup_pairs(spark, threshold=0.95).collect()
    )
    assert lsh_pairs == exact_pairs


def test_cosine_topk_matches_duckdb(embeddings):
    import duckdb

    from byzer_retrieval_spark.functions.similarity import (
        brute_force_cosine_topk,
        cosine_topk_sql,
    )

    q = embeddings.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    sdf = brute_force_cosine_topk(embeddings, "vec_id", "embedding", q, k=5).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    ddf = con.execute(cosine_topk_sql("embeddings", "vec_id", "embedding", q, k=5)).df()
    assert sdf["id"].tolist() == ddf["id"].tolist()
    np.testing.assert_allclose(sdf["cosine"], ddf["cosine"], atol=2e-6)


# ---- multimodal plumbing -----------------------------------------------------
def test_multimodal_stub_pipeline(spark):
    from byzer_retrieval_spark.functions.multimodal import (
        FEATURE_DIM,
        HAS_PIL,
        decode_image_features,
        frame_sample_plan,
        synth_media_df,
    )

    media = synth_media_df(spark, n=30)
    feats = decode_image_features(media, fake=True).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
    # determinism: same payload → same features
    again = decode_image_features(media, fake=True).collect()
    assert [r["features"] for r in feats] == [r["features"] for r in again]
    # real decode raises either way on this table: the payloads are
    # sha256 garbage (ValueError "not a decodable ..."), video rows are
    # stubbed, and image rows need Pillow — whichever task fails first
    with pytest.raises(Exception) as ei:
        decode_image_features(media, fake=False).collect()
    msg = str(ei.value)
    assert (
        "not a decodable" in msg
        or "stubbed" in msg
        or "NotImplementedError" in msg
        or ("requires Pillow" in msg and not HAS_PIL)
    )


def test_multimodal_real_wav_decode(spark):
    """Round 5: audio graduates from stub — PCM WAV payloads decode for
    real via the stdlib ``wave`` module (no external dependency):
    16 amplitude-histogram bins + 16 spectral-band energies, each half
    L1-normalized, deterministic across runs."""
    from byzer_retrieval_spark.functions import multimodal as mm

    media = mm.synth_wav_media_df(spark, n=10)
    feats = {r["media_id"]: r for r in mm.decode_image_features(media).collect()}
    assert len(feats) == 10
    for r in feats.values():
        arr = np.asarray(r["features"], dtype=np.float32)
        assert arr.shape == (mm.FEATURE_DIM,)
        half = mm.FEATURE_DIM // 2
        assert abs(float(arr[:half].sum()) - 1.0) < 1e-3  # amplitude hist
        assert abs(float(arr[half:].sum()) - 1.0) < 1e-3  # spectral bands
    # different seeds → different spectra (non-vacuous features)
    assert feats[0]["features"] != feats[5]["features"]
    # determinism across runs
    again = {r["media_id"]: r for r in mm.decode_image_features(media).collect()}
    assert all(feats[k]["features"] == again[k]["features"] for k in feats)
    # spectral energy concentrates at the seeded fundamental: media 9's
    # fundamental (533 Hz) lands in a higher band than media 0's (200 Hz)
    def peak_band(k):
        return int(np.argmax(np.asarray(feats[k]["features"][half:])))

    assert peak_band(9) > peak_band(0)
    # a non-WAV payload raises naming the offending media_id
    bad = mm.synth_media_df(spark, n=3).filter("kind = 'audio'")
    with pytest.raises(Exception) as ei:
        mm.decode_image_features(bad).collect()
    assert "not a decodable audio" in str(ei.value)


def test_multimodal_real_y4m_decode(spark):
    """Round 5: video graduates from stub for the uncompressed
    YUV4MPEG2 container — pure-numpy parse, luma-histogram + temporal
    mean-luma features, and REAL per-frame sampling. Compressed codecs
    remain the (disclosed) stub."""
    from byzer_retrieval_spark.functions import multimodal as mm

    media = mm.synth_y4m_media_df(spark, n=8, w=16, h=12, n_frames=8)
    feats = {r["media_id"]: r for r in mm.decode_image_features(media).collect()}
    assert len(feats) == 8
    half = mm.FEATURE_DIM // 2
    for r in feats.values():
        arr = np.asarray(r["features"], dtype=np.float32)
        assert arr.shape == (mm.FEATURE_DIM,)
        assert abs(float(arr[:half].sum()) - 1.0) < 1e-3  # luma histogram
        # temporal profile entries are mean luma / 255 ∈ (0, 1)
        assert ((arr[half:] > 0.0) & (arr[half:] < 1.0)).all()
    assert feats[0]["features"] != feats[5]["features"]  # non-vacuous
    again = {r["media_id"]: r for r in mm.decode_image_features(media).collect()}
    assert all(feats[k]["features"] == again[k]["features"] for k in feats)
    # the generator ramps brightness strictly with frame index, so the
    # temporal profile must be strictly increasing for media 0
    prof = np.asarray(feats[0]["features"][half:])
    assert (np.diff(prof) > 0).all()

    # real frame sampling: 8 frames at 4 fps = 2000 ms; every 500 ms →
    # ticks 0/500/1000/1500 → frame indices 0/2/4/6
    frames = mm.sample_video_frames(media, every_ms=500).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(range(8))
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["ts_ms"])
        assert [r["frame_idx"] for r in rows] == [0, 2, 4, 6]
        assert [r["ts_ms"] for r in rows] == [0, 500, 1000, 1500]
        for r in rows:
            assert abs(sum(r["luma_hist"]) - 1.0) < 1e-3
        # brightness ramps with frame index within one video
        assert (
            np.diff([r["luma_mean"] for r in rows]) > 0
        ).all()
    # a compressed-codec payload raises the disclosed stub error
    bad = mm.synth_media_df(spark, n=3).filter("kind = 'video'")
    with pytest.raises(Exception) as ei:
        mm.sample_video_frames(bad).collect()
    assert "stubbed" in str(ei.value)


def test_multimodal_real_decode_with_pillow(spark):
    from byzer_retrieval_spark.functions import multimodal as mm

    if not mm.HAS_PIL:
        pytest.skip("Pillow not installed — real decode unavailable here")
    media = mm.synth_png_media_df(spark, n=12)
    feats = {r["media_id"]: r for r in mm.decode_image_features(media).collect()}
    assert len(feats) == 12
    for r in feats.values():
        arr = np.asarray(r["features"], dtype=np.float32)
        assert arr.shape == (mm.FEATURE_DIM,)
        assert abs(float(arr.sum()) - 1.0) < 1e-3  # L1-normalized histogram
    # determinism across runs
    again = {r["media_id"]: r for r in mm.decode_image_features(media).collect()}
    assert all(feats[k]["features"] == again[k]["features"] for k in feats)

    plan = frame_sample_plan(media, every_ms=400).collect()
    assert all(r["frame_ts_ms"][1] - r["frame_ts_ms"][0] == 400 for r in plan if len(r["frame_ts_ms"]) > 1)


# ---- streaming NRT analog -----------------------------------------------------
def test_incremental_index_stream(spark, tmp_path):
    from byzer_retrieval_spark.api import RetrievalEngine
    from byzer_retrieval_spark.operators.indexer import IndexConfig
    from byzer_retrieval_spark.plans.query import SearchQuery
    from byzer_retrieval_spark.streaming.incremental import incremental_index_stream
    from tests.conftest import F2_ROWS

    eng = RetrievalEngine(spark, str(tmp_path / "idx"))
    eng.build(
        spark.createDataFrame(F2_ROWS),
        cfg=IndexConfig(num_shards=2, analyzed_fields=("content",), id_columns=()),
        resume=False,
    )
    # stream source: parquet dir of new/updated docs
    src_dir = str(tmp_path / "incoming")
    new_rows = [
        {"_id": "2", "name": "b", "content": "streamed replacement words",
         "raw_content": "x"},
        {"_id": "9", "name": "z", "content": "brand new streamed document",
         "raw_content": "y"},
    ]
    spark.createDataFrame(new_rows).write.parquet(src_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema
    ).parquet(src_dir)
    q = incremental_index_stream(
        stream, eng.store(), str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q.awaitTermination(120)
    got = eng.search(SearchQuery(keyword="streamed", fields=["content"], limit=10)).collect()
    assert {r["_id"] for r in got} == {"2", "9"}
    # upsert semantics: old content of _id=2 no longer matches
    old = eng.search(SearchQuery(keyword="test", fields=["content"], limit=10)).collect()
    assert "2" not in {r["_id"] for r in old}


# ---- IVF ANN index --------------------------------------------------------
def test_ivf_exact_mode_matches_brute_force(spark, embeddings, tmp_path):
    """nprobe = num_clusters must reproduce the exact brute-force top-k
    (ids AND cosines) — the contract the driver oracle relies on."""
    from byzer_retrieval_spark.functions.similarity import (
        IvfVectorIndex,
        brute_force_cosine_topk,
    )

    q = embeddings.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
    idx = IvfVectorIndex(str(tmp_path / "ivf"), num_clusters=8)
    idx.build(embeddings, "vec_id", "embedding", dim=len(q))
    exact = [
        (r["id"], r["cosine"])
        for r in brute_force_cosine_topk(
            embeddings, "vec_id", "embedding", q, k=10
        ).collect()
    ]
    got = [(r["id"], r["cosine"]) for r in idx.topk(spark, q, k=10, nprobe=8).collect()]
    assert got == exact


def test_ivf_partition_pruning_and_recall(spark, embeddings, tmp_path):
    """Pruned probes must reach the scan as PARTITION filters, and the
    nearest-cluster probe must retrieve the query's true neighborhood:
    recall@10 >= 0.9 with nprobe = num_clusters/4."""
    import io
    from contextlib import redirect_stdout

    from byzer_retrieval_spark.functions.similarity import (
        IvfVectorIndex,
        brute_force_cosine_topk,
    )

    q = embeddings.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
    idx = IvfVectorIndex(str(tmp_path / "ivf"), num_clusters=8)
    idx.build(embeddings, "vec_id", "embedding", dim=len(q))

    plan_buf = io.StringIO()
    with redirect_stdout(plan_buf):
        idx.topk(spark, q, k=10, nprobe=2).explain("formatted")
    pf_lines = [
        l for l in plan_buf.getvalue().splitlines() if "PartitionFilters" in l
    ]
    assert any("cluster" in l for l in pf_lines), pf_lines

    exact = [
        r["id"]
        for r in brute_force_cosine_topk(
            embeddings, "vec_id", "embedding", q, k=10
        ).collect()
    ]
    approx = [r["id"] for r in idx.topk(spark, q, k=10, nprobe=2).collect()]
    recall = len(set(exact) & set(approx)) / 10.0
    assert recall >= 0.9, f"IVF recall {recall}"


# ---- connected-components dedup clustering --------------------------------
def test_connected_components_transitive_chain(spark):
    """A 100-node chain (diameter 99) must collapse to one cluster
    within max_iters via doubling-free min-label propagation, and
    disjoint cliques must stay separate."""
    from byzer_retrieval_spark.functions.graph import connected_components

    chain = [(i, i + 1) for i in range(100, 140)]      # one long chain
    clique = [(a, b) for a in range(500, 505) for b in range(a + 1, 505)]
    iso_pair = [(900, 901)]
    edges = spark.createDataFrame(chain + clique + iso_pair, ["src", "dst"])
    got = {
        (r.id, r.cluster)
        for r in connected_components(edges, max_iters=50).collect()
    }
    assert {(i, 100) for i in range(100, 141)} <= got
    assert {(i, 500) for i in range(500, 505)} <= got
    assert (900, 900) in got and (901, 900) in got
    assert len(got) == 41 + 5 + 2


def test_dedup_clusters_groups_transitively(spark, documents):
    """dedup_clusters must equal the transitive closure of the pair set
    (every pair's endpoints share a cluster; cluster = min member)."""
    from byzer_retrieval_spark.functions.dedup import (
        dedup_clusters,
        minhash_lsh_dup_pairs,
    )

    pairs = [
        (r.id_a, r.id_b)
        for r in minhash_lsh_dup_pairs(
            documents, "doc_id", "text", threshold=0.5
        ).collect()
    ]
    labels = {
        r.id: r.cluster
        for r in dedup_clusters(documents, "doc_id", "text", 0.5).collect()
    }
    # python union-find closure as the model
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    model = {x: find(x) for x in parent}
    assert labels == model


# ---- PII + repetition -----------------------------------------------------
def test_pii_scrub_and_counts(spark):
    from byzer_retrieval_spark.functions.text import (
        pii_counts_exprs,
        pii_scrub_expr,
    )

    txt = (
        "mail a.user+x@sub.example.org or 555-123-4567, ssn 123-45-6789, "
        "host 192.168.0.1 end"
    )
    df = spark.createDataFrame([(txt,)], ["t"])
    row = df.select(
        pii_scrub_expr(F.col("t")).alias("s"),
        *[c.alias(n) for n, c in pii_counts_exprs(F.col("t")).items()],
    ).collect()[0]
    assert row["n_email"] == 1 and row["n_phone"] == 1
    assert row["n_ssn"] == 1 and row["n_ipv4"] == 1
    assert row["s"] == "mail <EMAIL> or <PHONE>, ssn <SSN>, host <IP> end"


def test_repetition_fractions_known_values(spark):
    from byzer_retrieval_spark.functions.text import repetition_exprs

    # "a a a b": 4 tokens, 2 distinct → dup_word 0.5; top word a:3/4;
    # 2-grams [a a, a a, a b]: 3 grams, 2 distinct → dup 1/3
    df = spark.createDataFrame([("a a a b",), ("",), ("x",)], ["t"])
    rows = df.select(
        "t", *[c.alias(n) for n, c in repetition_exprs(F.col("t")).items()]
    ).collect()
    by = {r["t"]: r for r in rows}
    r = by["a a a b"]
    assert r["dup_word_frac"] == 0.5
    assert r["top_word_frac"] == 0.75
    assert abs(r["dup_2gram_frac"] - 1 / 3) < 1e-6
    assert by[""]["dup_word_frac"] == 0.0 and by[""]["top_word_frac"] == 0.0
    assert by["x"]["dup_2gram_frac"] == 0.0


# ---- chunking + stratified sampling ---------------------------------------
def test_chunk_documents_coverage_and_overlap(spark):
    from byzer_retrieval_spark.functions.chunking import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "a"), (3, "")], ["id", "t"])
    rows = chunk_documents(df, "id", "t", window=4, stride=3).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append((r["chunk_id"], r["n_tokens"]))
    # 10 tokens, starts 1,4,7,10 → sizes 4,4,4,1
    assert sorted(by_id[1]) == [(0, 4), (1, 4), (2, 4), (3, 1)]
    assert by_id[2] == [(0, 1)]
    assert 3 not in by_id  # empty doc → no chunks


def test_stratified_sample_deterministic_and_monotone(spark):
    from byzer_retrieval_spark.functions.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(1000)], ["id", "lang"]
    )
    a = {r["id"] for r in stratified_sample(docs, "id", "lang", {"en": 0.5}, 0.1).collect()}
    b = {r["id"] for r in stratified_sample(docs, "id", "lang", {"en": 0.5}, 0.1).collect()}
    assert a == b  # deterministic
    # raising a fraction only ADDS rows (per-row independence)
    c = {r["id"] for r in stratified_sample(docs, "id", "lang", {"en": 0.8}, 0.1).collect()}
    assert a <= c
    # rates land near targets
    en = sum(1 for i in a if i % 2)
    de = sum(1 for i in a if not i % 2)
    assert 200 <= en <= 300 and 20 <= de <= 80


def test_stratified_sample_full_fraction_keeps_all(spark):
    """fraction 1.0 must keep EVERY row of the stratum (regression: the
    9-char hex threshold silently kept ~1/16)."""
    from byzer_retrieval_spark.functions.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(400)], ["id", "lang"]
    )
    kept = {r["id"] for r in stratified_sample(docs, "id", "lang", {"en": 1.0}, 0.0).collect()}
    assert kept == {i for i in range(400) if i % 2}
