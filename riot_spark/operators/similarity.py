"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path buckets
vectors with random-hyperplane LSH so candidate generation is a
bucket-equi-join instead of a full cross product.  Dot products run
JVM-side via zip_with/aggregate — no Python in the loop.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector.

    orderBy().limit(k) compiles to per-partition partial top-k +
    TakeOrderedAndProject — a single pass, no global sort materialized.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = math.sqrt(sum(float(v) * float(v) for v in query_vec))
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        embeddings.select(F.col(id_col), F.round(cos, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact near-duplicate pairs (cosine >= threshold) via self cross
    join — the correctness baseline; use `lsh_neardup_pairs` at scale."""
    norm = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("n"),
    )
    a, b = norm.alias("a"), norm.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cos, 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    out: list[float] = []
    i = 0
    while len(out) < dim:
        h = hashlib.md5(f"plane:{seed}:{i}".encode()).digest()
        for off in range(0, 16, 4):
            if len(out) >= dim:
                break
            u = int.from_bytes(h[off : off + 4], "big") / 2**32
            out.append(2.0 * u - 1.0)
        i += 1
    return out


def lsh_bucket(
    embeddings: DataFrame,
    num_planes: int = 12,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 1,
) -> DataFrame:
    """(id, band, bucket) — random-hyperplane (SRP) LSH signatures as
    LONG bit-buckets, one independent plane-set per band.  Vectors
    sharing any band's bucket are ANN candidates; band 0's planes are
    seeds 0..num_planes-1 (backward-compatible with single-band)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    rows = []
    for band in range(bands):
        bucket = F.lit(0).cast("long")
        for p in range(num_planes):
            plane = F.array(
                *[F.lit(v) for v in _hyperplane(band * num_planes + p, dim)]
            )
            bit = (_dot(F.col(vec_col), plane) > 0).cast("long")
            bucket = bucket + F.shiftleft(bit, p)
        rows.append(F.struct(F.lit(band).alias("band"), bucket.alias("bucket")))
    return embeddings.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(*rows)).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    num_planes: int = 12,
    dim: int | None = None,
    bands: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: SRP-bucket candidates, then exact cosine verify.

    Per-band collision prob for angle θ is (1-θ/π)^num_planes; unioning
    `bands` independent plane-sets (minhash-style banding) raises
    recall to 1-(1-p)^bands at linear candidate cost.  Candidate pairs
    are deduped across bands BEFORE the exact-cosine verify, so each
    survivor pays the dot product once.  Pass `dim` when known (table
    metadata) to avoid the one-row probe."""
    buckets = lsh_bucket(embeddings, num_planes, dim, id_col, vec_col, bands)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    norm = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("n"),
    )
    va, vb = norm.alias("va"), norm.alias("vb")
    cos = _dot(F.col("va.v"), F.col("vb.v")) / (F.col("va.n") * F.col("vb.n"))
    return (
        cand.join(va, F.col("id_a") == F.col("va.id"))
        .join(vb, F.col("id_b") == F.col("vb.id"))
        .select("id_a", "id_b", F.round(cos, 4).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


QUANT = 65536.0  # k-means quantization scale (16 fractional bits)


def kmeans_train(
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, list[float]]:
    """Deterministic distributed Lloyd's k-means — makes `ivf_write` a
    real index build instead of a fixed-row fixture.

    Everything is reproducible bit-for-bit, run to run AND engine to
    engine (the DuckDB oracle re-trains independently and must land on
    identical centroids):

    * components quantize to integers (floor(x*65536+0.5)) so the
      per-cluster mean is an exact BIGINT sum / count — summation
      order, partitioning, and engine cannot change it;
    * seeds are the k vectors with smallest md5(vec_id) hex — data-
      driven, no RNG, identical in any engine with md5;
    * per-row distance argmin folds the array in index order (one
      codegen'd projection against literal centroids — no shuffle,
      no Python), ties break to the smaller cid.

    Per iteration the cluster sums are ONE partial-aggregated shuffle
    of k*dim longs — at 10^12 vectors that is the map-side-combine
    shape you want; only k*dim rows ever reach the driver."""
    q = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * QUANT + 0.5).cast("double"),
    )
    qdf = embeddings.select(
        F.col(id_col).alias("id"), q.alias("q")
    ).persist()
    try:
        seeds = [
            r["id"]
            for r in qdf.select("id")
            .orderBy(F.md5(F.col("id").cast("string").cast("binary")), "id")
            .limit(k)
            .collect()
        ]
        seed_rows = sorted(
            qdf.where(F.col("id").isin(seeds)).collect(),
            key=lambda r: seeds.index(r["id"]),
        )
        cents: dict[int, list[float]] = {
            cid: [float(x) for x in r["q"]]
            for cid, r in enumerate(seed_rows)
        }
        for _ in range(iters):
            assigned = qdf.select(
                "id", "q", _kmeans_cid(cents).alias("cid")
            )
            sums = (
                assigned.select(
                    "cid", F.posexplode("q").alias("j", "x")
                )
                .groupBy("cid", "j")
                .agg(
                    F.sum(F.col("x").cast("long")).alias("s"),
                    F.count("*").alias("n"),
                )
                .collect()
            )
            new: dict[int, list[float]] = {}
            for r in sums:
                vec = new.setdefault(
                    int(r["cid"]), [0.0] * len(next(iter(cents.values())))
                )
                vec[int(r["j"])] = float(r["s"]) / float(r["n"])
            # empty cluster keeps its previous centroid
            cents = {cid: new.get(cid, cents[cid]) for cid in cents}
        return cents
    finally:
        qdf.unpersist()


def _kmeans_cid(cents: dict[int, list[float]], col=None):
    """argmin_c sum_j (q_j - c_j)^2 as one literal-centroid expression;
    tie -> smaller cid (struct least is lexicographic).  `col` is the
    quantized-vector column (default the `q` column)."""
    if col is None:
        col = F.col("q")
    structs = []
    for cid, cvec in sorted(cents.items()):
        carr = F.array(*[F.lit(float(v)) for v in cvec])
        d = F.aggregate(
            F.zip_with(col, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        structs.append(F.struct(d.alias("d"), F.lit(cid).cast("long").alias("cid")))
    best = F.least(*structs) if len(structs) > 1 else structs[0]
    return best["cid"]


def kmeans_assign(
    embeddings: DataFrame,
    cents: dict[int, list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid) under the trained quantized-space centroids."""
    q = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * QUANT + 0.5).cast("double"),
    )
    return embeddings.select(
        F.col(id_col).alias("id"), q.alias("q")
    ).select("id", _kmeans_cid(cents).alias("cid"))


def kmeans_ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 4,
    iters: int = 2,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with TRAINED coarse centroids: Lloyd's over the corpus,
    probe the nprobe nearest clusters (quantized-space distance), exact
    cosine rerank inside them.  At build time pair with
    `ivf_write(embeddings, kmeans-derived assignment...)` so the probe
    is file-level partition pruning."""
    cents = kmeans_train(embeddings, n_clusters, iters, id_col, vec_col)
    qq = [float(math.floor(float(v) * QUANT + 0.5)) for v in query_vec]

    def dist(cvec: list[float]) -> float:
        return sum((a - b) * (a - b) for a, b in zip(qq, cvec))

    probe = sorted(cents, key=lambda cid: (dist(cents[cid]), cid))[:nprobe]
    assigned = kmeans_assign(embeddings, cents, id_col, vec_col)
    cand = assigned.where(F.col("cid").isin(probe)).select("id")
    pool = embeddings.join(
        cand, embeddings[id_col] == cand["id"], "left_semi"
    )
    return cosine_topk(pool, query_vec, k, id_col, vec_col)


def kmeans_ivf_write(
    embeddings: DataFrame,
    cents: dict[int, list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the table partitioned by TRAINED inverted list — the
    real IVF index build (`kmeans_train` -> partitioned store).  A
    probe then reads only its nprobe partitions via file-level
    partition pruning, same as `ivf_write`."""
    assigned = kmeans_assign(embeddings, cents, id_col, vec_col)
    (
        embeddings.join(assigned.withColumnRenamed("id", id_col), id_col)
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(path)
    )


def kmeans_ivf_read_topk(
    spark,
    path: str,
    query_vec: list[float],
    cents: dict[int, list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query the trained-IVF store: probe the nprobe nearest centroids
    in quantized space, scan only those cid partitions, exact-rerank."""
    qq = [float(math.floor(float(v) * QUANT + 0.5)) for v in query_vec]

    def dist(cvec: list[float]) -> float:
        return sum((a - b) * (a - b) for a, b in zip(qq, cvec))

    probe = sorted(cents, key=lambda cid: (dist(cents[cid]), cid))[:nprobe]
    pool = spark.read.parquet(path).where(F.col("cid").isin(probe))
    return cosine_topk(pool, query_vec, k, id_col, vec_col)


def ivf_assign(
    embeddings: DataFrame,
    centroids: dict[int, list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid) — coarse quantization: each vector joins its
    max-cosine centroid (tie -> smallest cid).  The centroid set is
    tiny and becomes literal expressions: assignment is one codegen'd
    projection, no shuffle, no Python."""
    structs = []
    for cid, cvec in sorted(centroids.items()):
        c = F.array(*[F.lit(float(v)) for v in cvec])
        cn = math.sqrt(sum(float(v) ** 2 for v in cvec))
        cos = _dot(F.col(vec_col), c) / (_norm(F.col(vec_col)) * F.lit(cn))
        structs.append(
            F.struct(cos.alias("cos"), F.lit(-cid).cast("long").alias("negcid"))
        )
    best = F.greatest(*structs) if len(structs) > 1 else structs[0]
    return embeddings.select(
        F.col(id_col).alias("id"), (-best["negcid"]).cast("long").alias("cid")
    )


def ivf_write(
    embeddings: DataFrame,
    centroids: dict[int, list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the table partitioned BY inverted list (cid): the
    build-time form of IVF.  A probe query then reads only its
    `nprobe` partitions — partition pruning happens in the file index,
    before any vector is touched."""
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    (
        embeddings.join(
            assigned.withColumnRenamed("id", id_col), id_col
        )
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(path)
    )


def ivf_read_topk(
    spark,
    path: str,
    query_vec: list[float],
    centroids: dict[int, list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query the partitioned IVF store: pick the `nprobe` centroids
    nearest the query, scan ONLY those cid partitions, exact-rerank."""
    qn = math.sqrt(sum(float(v) ** 2 for v in query_vec))

    def qcos(cvec: list[float]) -> float:
        cn = math.sqrt(sum(v * v for v in cvec))
        return sum(a * b for a, b in zip(query_vec, cvec)) / (cn * qn)

    probe = sorted(centroids, key=lambda c: (-qcos(centroids[c]), c))[:nprobe]
    pool = spark.read.parquet(path).where(F.col("cid").isin(probe))
    return cosine_topk(pool, query_vec, k, id_col, vec_col)


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroid_ids: list[int],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: probe the `nprobe` centroids nearest the query, then
    exact cosine top-k over only their assigned vectors.

    Deterministic flavor: centroids ARE rows of the embedding table
    (ids = centroid_ids), so both this and a SQL oracle derive the
    identical structure.  At 10^12 vectors the assignment is a
    build-time column (partition the table by cid); the probe filter
    then prunes partitions before any distance math."""
    cents = {
        int(r[id_col]): [float(x) for x in r[vec_col]]
        for r in embeddings.where(F.col(id_col).isin(centroid_ids)).collect()
    }
    qn = math.sqrt(sum(float(v) ** 2 for v in query_vec))

    def qcos(cvec: list[float]) -> float:
        cn = math.sqrt(sum(v * v for v in cvec))
        return sum(a * b for a, b in zip(query_vec, cvec)) / (cn * qn)

    probe = sorted(cents, key=lambda cid: (-qcos(cents[cid]), cid))[:nprobe]
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    cand = assigned.where(F.col("cid").isin(probe)).select("id")
    pool = embeddings.join(
        cand, embeddings[id_col] == cand["id"], "left_semi"
    )
    return cosine_topk(pool, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------- IVF-PQ
# Product quantization: the compressed-vector tier.  At 100 TB of
# embeddings the uncompressed cid-partitioned IVF store is IO-bound —
# every probe reads 4*dim bytes per vector.  PQ stores m one-byte
# codes per vector instead (dim=64, m=4 -> 256 bytes -> 4 bytes, 64x):
# the ADC scan phase never touches a raw vector, and only the top-R
# rerank pool hydrates real embeddings (scan-pruned isin, the same
# rank-then-hydrate pattern as the text engine).  Everything is
# deterministic and engine-reproducible: per-subspace codebooks reuse
# kmeans_train's integer-quantized Lloyd's, so the DuckDB oracle
# re-trains bit-identical codebooks from the same parquet.


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, dict[int, list[float]]]:
    """codebooks[sub][cid] = centroid of subspace `sub` in quantized
    space — kmeans_train run on each of the m contiguous dim/m slices.
    Seeds are the ksub smallest-md5 vec_ids (identical across
    subspaces, and identical in the SQL oracle)."""
    dim = len(embeddings.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sd = dim // m
    return {
        s: kmeans_train(
            embeddings.select(
                F.col(id_col),
                F.slice(F.col(vec_col), s * sd + 1, sd).alias(vec_col),
            ),
            ksub, iters, id_col, vec_col,
        )
        for s in range(m)
    }


def pq_encode(
    embeddings: DataFrame,
    books: dict[int, dict[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<long>) — per-subspace argmin code under the
    trained codebooks; one codegen'd projection, no shuffle."""
    m = len(books)
    sd = len(next(iter(books[0].values())))
    q = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * QUANT + 0.5).cast("double"),
    )
    base = embeddings.select(F.col(id_col).alias("id"), q.alias("q"))
    codes = [
        _kmeans_cid(books[s], col=F.slice(F.col("q"), s * sd + 1, sd))
        for s in range(m)
    ]
    return base.select("id", F.array(*codes).alias("codes"))


def _pq_adc_tables(
    query_vec: list[float], books: dict[int, dict[int, list[float]]]
) -> dict[int, list[float]]:
    """Driver-side asymmetric-distance tables: tables[sub][cid] =
    squared distance between the query's quantized slice and the
    codebook centroid (m*ksub floats total)."""
    m = len(books)
    sd = len(next(iter(books[0].values())))
    qq = [float(math.floor(float(v) * QUANT + 0.5)) for v in query_vec]
    out: dict[int, list[float]] = {}
    for s in range(m):
        sq = qq[s * sd : (s + 1) * sd]
        out[s] = [
            sum((a - b) * (a - b) for a, b in zip(sq, books[s][cid]))
            for cid in sorted(books[s])
        ]
    return out


def _pq_adc_col(tables: dict[int, list[float]], bits: int | None = None):
    """round(sum_s tables[s][codes[s]], 4) over a `codes` column —
    summed in subspace order (the 4-decimal round absorbs engine
    summation-order ulps, same as the kmeans oracle).  With `bits`
    set, `codes` is the bit-packed BIGINT layout and each sub-code is
    extracted with shift+mask instead of an array index — the ADC
    never materializes the unpacked array."""
    adc = F.lit(0.0)
    mask = (1 << bits) - 1 if bits else 0
    for s in sorted(tables):
        tbl = F.array(*[F.lit(float(d)) for d in tables[s]])
        if bits:
            code = F.shiftright(F.col("codes"), s * bits).bitwiseAND(
                F.lit(mask)
            )
        else:
            code = F.col("codes")[s]
        adc = adc + F.element_at(tbl, code.cast("int") + 1)
    return F.round(adc, 4)


def pq_adc_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    books: dict[int, dict[int, list[float]]],
    k: int = 10,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ search: ADC over the codes (top rerank*k candidates by
    approximate distance), then exact cosine rerank to k.  The ADC
    phase touches m bytes per vector; only the candidate pool reads
    raw embeddings."""
    codes = pq_encode(embeddings, books, id_col, vec_col)
    tables = _pq_adc_tables(query_vec, books)
    cand = (
        codes.select("id", _pq_adc_col(tables).alias("adc"))
        .orderBy(F.asc("adc"), F.asc("id"))
        .limit(rerank * k)
    )
    pool = embeddings.join(
        cand, embeddings[id_col] == cand["id"], "left_semi"
    )
    return cosine_topk(pool, query_vec, k, id_col, vec_col)


def _pq_bits(ksub: int) -> int:
    """bits per sub-code (2 for ksub=4)."""
    return max(1, (ksub - 1).bit_length())


def _pq_pack_meta(books: dict[int, dict[int, list[float]]]) -> tuple[int, int, bool]:
    """(m, bits, packable): the store bit-packs the m sub-codes into
    ONE BIGINT when they fit in 63 bits (m=16 x ksub=4 -> 32 bits);
    wider configs fall back to the array layout honestly."""
    m = len(books)
    bits = _pq_bits(len(books[0]))
    return m, bits, m * bits <= 63


def ivfpq_write(
    embeddings: DataFrame,
    cents: dict[int, list[float]],
    books: dict[int, dict[int, list[float]]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the COMPRESSED store: (vec_id, codes) partitioned by
    trained coarse cluster.  No raw vectors; when the m sub-codes fit
    in 63 bits they are bit-packed into a single BIGINT column (m=16 x
    ksub=4 -> one 32-bit value vs an array<long> of 16), so the ADC
    scan reads one fixed-width column per vector.  Rerank hydrates
    from the source embeddings table."""
    assigned = kmeans_assign(embeddings, cents, id_col, vec_col)
    codes = pq_encode(embeddings, books, id_col, vec_col)
    m, bits, packable = _pq_pack_meta(books)
    if packable:
        packed = F.lit(0).cast("long")
        for s in range(m):
            packed = packed + F.col("codes")[s].cast("long") * F.lit(
                1 << (s * bits)
            )
        codes = codes.select("id", packed.alias("codes"))
    (
        codes.join(assigned, "id")
        .select(F.col("id").alias(id_col), "codes", "cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(path)
    )


def ivfpq_read_topk(
    spark,
    path: str,
    embeddings: DataFrame,
    query_vec: list[float],
    cents: dict[int, list[float]],
    books: dict[int, dict[int, list[float]]],
    k: int = 10,
    nprobe: int = 2,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query the compressed store: probe the nprobe nearest coarse
    centroids (file-level partition pruning), ADC over their codes
    (reads m bytes/vector, never a raw embedding), collect the top
    rerank*k candidate ids, hydrate only those from the embeddings
    table (isin scan pushdown) and exact-rerank to k."""
    qq = [float(math.floor(float(v) * QUANT + 0.5)) for v in query_vec]

    def dist(cvec: list[float]) -> float:
        return sum((a - b) * (a - b) for a, b in zip(qq, cvec))

    probe = sorted(cents, key=lambda cid: (dist(cents[cid]), cid))[:nprobe]
    codes = spark.read.parquet(path).where(F.col("cid").isin(probe))
    tables = _pq_adc_tables(query_vec, books)
    _m, bits, packable = _pq_pack_meta(books)
    cand = (
        codes.select(
            F.col(id_col),
            _pq_adc_col(tables, bits=bits if packable else None).alias("adc"),
        )
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(rerank * k)
        .collect()
    )
    ids = [r[id_col] for r in cand]
    pool = embeddings.where(F.col(id_col).isin(ids))
    return cosine_topk(pool, query_vec, k, id_col, vec_col)
