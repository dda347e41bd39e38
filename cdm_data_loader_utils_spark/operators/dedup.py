"""Document deduplication family for large-scale training-data pipelines.

The reference's only dedup is driver-side set-dedup and the W1 window
(``/root/reference/src/cdm_data_loader_utils/parsers/refseq_importer/core/
cdm_builders.py:230-239``, ``parsers/refseq_pipeline/core/spark_delta.py:
129-139``). A 100 TB corpus needs the standard near-dup ladder; each operator
here is pure DataFrame API (one or two shuffles, no Python in the hot path):

* exact dedup — content-hash groupBy;
* n-gram Jaccard — shingle → explode → pair-join → ratio (exact, quadratic
  within shingle buckets; for corpora use MinHash first);
* MinHash + LSH — k seeded xxhash64 min-signatures → bands → bucket join →
  verify (the scale path: candidate generation is linear, verification only
  touches bucket collisions);
* SimHash — sign-aggregated 60-bit fingerprint, near-dup = small Hamming
  distance, candidate-blocked by rotated prefix bands.

Determinism AND portability: the per-token hash basis is sha256-derived
(one sha256 per distinct token, then a universal affine family
``(a_i·x + b_i) mod p`` for the k MinHash functions), so the exact same
values are computable in ANY engine with sha256 — the DuckDB correctness
oracles re-derive signatures/fingerprints independently and the outputs
hash-compare equal. No rand(), identical output at any parallelism.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne prime modulus for the affine MinHash family. Bases are 32-bit
# (first 8 sha256 hex chars) and multipliers < 2^30, so a·x + b < 2^62 —
# no 64-bit overflow in Spark (ANSI mode) or DuckDB (errors on overflow).
MINHASH_PRIME = 2_147_483_647


def portable_hash32(col: F.Column) -> F.Column:
    """First 32 bits of sha256 as a long — identical to DuckDB's
    ``CAST(concat('0x', substr(sha256(x),1,8)) AS BIGINT)``."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 8), 16, 10).cast("long")


def portable_hash60(col: F.Column) -> F.Column:
    """First 60 bits of sha256 as a long (15 hex chars) — fits a signed
    64-bit integer in every engine, no unsigned-wraparound mismatch."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def affine_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the universal family h_i(x) = (a_i·x +
    b_i) mod p, derived from sha256 of the index — reproducible in any
    language, no RNG state."""
    out = []
    for i in range(num_hashes):
        a = int(hashlib.sha256(f"minhash-a-{i}".encode()).hexdigest()[:8], 16)
        b = int(hashlib.sha256(f"minhash-b-{i}".encode()).hexdigest()[:8], 16)
        out.append((a % (1 << 30) + 1, b % MINHASH_PRIME))
    return out


def normalize_text(col: F.Column | str) -> F.Column:
    """Lowercase, collapse non-letter/digit runs to single spaces, trim.

    Unicode-aware (``\\p{L}\\p{N}`` — Java and RE2 agree on these classes,
    so the DuckDB oracle normalizes identically): an ASCII-only class here
    would normalize every non-Latin-script document to the empty string and
    :func:`exact_dedup` would silently collapse the whole non-Latin corpus
    into one surviving row. Texts with NO letters/digits at all (emoji-only,
    pure punctuation) fall back to their trimmed lowercase raw form instead
    of the empty string, so they never mass-collide either."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(c), r"[^\p{L}\p{N}]+", " "))
    return F.when(F.length(norm) == 0, F.lower(F.trim(c))).otherwise(norm)


def tokens(col: F.Column | str) -> F.Column:
    return F.split(normalize_text(col), " ")


def word_shingles(col: F.Column | str, n: int = 3) -> F.Column:
    """Distinct n-word shingles as an array (n=1 → distinct words)."""
    toks = tokens(col)
    if n == 1:
        return F.array_distinct(toks)
    # sliding windows via transform over index range
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.filter(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
            lambda s: s != "",
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per identical normalized text.

    ONE hash-aggregate shuffle total: ``min_by`` carries the whole winning
    row through the aggregate, so there is no second join-back shuffle. The
    group key is the fixed-width sha256, not the text itself."""
    h = F.sha2(normalize_text(text_col), 256)
    packed = df.groupBy(h.alias("__h")).agg(
        F.min_by(F.struct(*df.columns), F.col(id_col)).alias("__r")
    )
    return packed.select(*[F.col(f"__r.{c}").alias(c) for c in df.columns])


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    threshold: float = 0.6,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b, jaccard ≥ threshold).

    shingle-explode → equi-join on shingle → per-pair intersection count →
    |A∪B| = |A|+|B|−|A∩B|. The shingle join is the classic inverted-index
    trick: only documents sharing ≥1 shingle ever meet, so cost is bounded
    by shingle-bucket skew.

    ``max_shingle_df`` is the corpus-scale skew guard: shingles appearing in
    more than that many documents (boilerplate, stop-phrases) are dropped
    from the JOIN ONLY — a shingle shared by k documents contributes k² join
    rows, so one ubiquitous shingle is quadratic on its own. Pair scores
    stay exact for pairs that still meet on ≥1 informative shingle (sizes
    are computed BEFORE the cut and the intersection count keeps every
    surviving common shingle... note: dropping a shingle common to a pair
    lowers that pair's measured intersection, so this is a recall guard, not
    free — leave it None for the exact oracle tier, set it for corpora)."""
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    ).withColumn("sz", F.size("sh"))
    # persist: the exploded index feeds the optional df-histogram plus both
    # self-join sides; without it shingling re-executes up to 4×
    # keep the PERSISTED handle separate: reassigning the name to a derived
    # frame would make release() unpersist a never-cached plan (a no-op)
    ex_p = sh.select("id", "sz", F.explode("sh").alias("s")).persist()
    ex = ex_p
    if max_shingle_df is not None:
        dfreq = ex_p.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
        ex = (
            ex_p.join(dfreq.filter(F.col("__df") <= max_shingle_df), "s")
            .drop("__df")
        )
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    from .cache import track

    return track(
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"),
        ex_p,
    )


def _minhash_sig_udf(num_hashes: int):
    """Arrow-vectorized affine MinHash fold: xs (array<long> of 32-bit token
    bases) → the k-component signature, as ONE numpy pass per batch.

    Bit-identical to the former per-element HOF formulation (k ×
    ``array_min(transform(...))``): the arithmetic is exact int64
    (a < 2^30, x < 2^32 ⇒ a·x + b < 2^62, no overflow; numpy ``%`` equals
    ``pmod`` for non-negative operands), so signatures — and therefore every
    band bucket, estimate and emitted pair — are unchanged. The HOF form
    evaluated k interpreted lambda passes per document (guide §4.2: hand
    whole batches to vectorized native code instead); r7 measured the swap
    at sf0.1 and at 10× token volume before adopting it. Null/empty token
    arrays keep their legacy shape: an all-null k-vector."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    params = affine_params(num_hashes)
    a_vec = np.array([a for a, _ in params], dtype=np.int64)
    b_vec = np.array([b for _, b in params], dtype=np.int64)
    null_sig = [None] * num_hashes

    # no type hints on the impl: `from __future__ import annotations`
    # stringifies them and pyspark can't resolve names from a local import
    def _sig_impl(xs_series):
        vals = xs_series.to_numpy()
        m = len(vals)
        lens = np.fromiter(
            (0 if v is None else len(v) for v in vals), dtype=np.int64,
            count=m,
        )
        out = np.empty(m, dtype=object)
        nz = np.flatnonzero(lens > 0)
        if len(nz):
            flat = np.concatenate(
                [np.asarray(vals[i], dtype=np.int64) for i in nz]
            )
            bounds = np.concatenate(([0], np.cumsum(lens[nz])))
            # bound the (tokens × k) int64 work matrix at ~64 MB per slice
            budget = max(1, (8 << 20) // num_hashes)
            start = 0
            while start < len(nz):
                end = start
                while (end < len(nz)
                       and bounds[end + 1] - bounds[start] <= budget):
                    end += 1
                end = max(end, start + 1)  # a single huge doc still runs
                lo, hi = bounds[start], bounds[end]
                mm = (
                    flat[lo:hi, None] * a_vec[None, :] + b_vec[None, :]
                ) % MINHASH_PRIME
                mins = np.minimum.reduceat(
                    mm, bounds[start:end] - lo, axis=0
                )
                for j, i in enumerate(nz[start:end]):
                    out[i] = mins[j]
                start = end
        for i in np.flatnonzero(lens == 0):
            out[i] = null_sig
        return pd.Series(out)

    return pandas_udf(_sig_impl, T.ArrayType(T.LongType()))


def _minhash_features(
    df: DataFrame, text_col: str, id_col: str, n: int, num_hashes: int,
) -> DataFrame:
    """(id, sh, sig): shingle set AND signature from ONE normalize/shingle
    pass — the LSH pipeline needs both (banding reads sig, exact verify
    reads sh), and computing them together halves the text-normalization
    work and the per-side join count downstream."""
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    )
    xs = F.transform("sh", lambda s: portable_hash32(s))
    return sh.select(
        "id", "sh", _minhash_sig_udf(num_hashes)(xs).alias("sig")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 1, num_hashes: int = 64,
) -> DataFrame:
    """k independent min-hashes per document: ONE sha256 per distinct
    shingle (the 32-bit base x, JVM-side), then k affine hashes
    (a_i·x + b_i) mod p folded to per-document minima in a single
    Arrow-vectorized numpy pass (:func:`_minhash_sig_udf`) — cheaper than k
    independent strong hashes and bit-for-bit reproducible in the DuckDB
    oracle (exact integer arithmetic, no floats anywhere)."""
    return _minhash_features(df, text_col, id_col, n, num_hashes).select(
        "id", "sig"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    max_bucket_size: int = 500,
    est_fraction: float = 0.75,
) -> DataFrame:
    """MinHash→LSH candidate pairs verified by exact Jaccard.

    band hash → bucket key → self-join within buckets → signature-estimate
    prefilter → exact verify. With r=num_hashes/bands rows per band the
    candidate probability is 1−(1−j^r)^b. Output: (id_a, id_b, jaccard).

    Two guards keep degenerate corpora (tiny vocabularies, boilerplate) from
    going quadratic — the standard production mitigations:

    * ``max_bucket_size`` — a band bucket holding thousands of documents
      means that r-hash slice is near-universal and carries almost no
      similarity signal; such buckets are dropped before the self-join
      (bounded recall loss: a true pair must then collide in one of its
      OTHER informative bands);
    * ``est_fraction`` — candidates are pre-filtered on the MinHash
      similarity estimate (matching signature fraction ≥
      est_fraction·threshold) before the exact shingle-set verification,
      so the expensive array intersection runs only on plausible pairs.
    """
    rows = num_hashes // bands
    # persist: the (id, sh, sig) feature table feeds the banding below AND
    # both sides of the estimate+verify join — without it the whole
    # normalize → shingle → sha256 → affine-fold pipeline re-executes up to
    # 4× per run. One combined frame (r7) instead of separate sigs/sh
    # persists: shingling runs ONCE, and each candidate side resolves with
    # ONE broadcast join instead of two. O(N·(shingles + num_hashes·8))
    # bytes cached, spilling to disk beyond executor memory.
    feat = _minhash_features(df, text_col, id_col, n, num_hashes).persist()
    banded = feat.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows + r] for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    # persist: used for the bucket-size histogram AND both self-join sides.
    # The persisted handle stays under its own name — reassigning `banded`
    # would leave release() unpersisting an uncached derived plan
    banded_p = banded.persist()
    sizes = banded_p.groupBy("band", "bucket").agg(F.count("*").alias("__bs"))
    banded = (
        banded_p.join(sizes, ["band", "bucket"])
        .filter(F.col("__bs") <= max_bucket_size)
        .drop("__bs")
    )
    a, b = banded.alias("a"), banded.alias("b")
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
    # MinHash-estimate prefilter (fraction of matching signature
    # components), then exact verification of the survivors — each side's
    # (sig, sh) attached by a single join against the feature table
    fa = feat.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
        F.col("sh").alias("sh_a"),
    )
    fb = feat.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
        F.col("sh").alias("sh_b"),
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    ) / F.lit(num_hashes)
    # |A∪B| = |A| + |B| − |A∩B| exactly (shingle arrays are distinct), so
    # ONE hash-set pass per pair replaces the former intersect+union two —
    # identical integers, identical double division, identical 6dp round
    verified = (
        cand.join(fa, "id_a").join(fb, "id_b")
        .filter(est >= F.lit(est_fraction * threshold))
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("__common"),
            F.size("sh_a").alias("__sz_a"), F.size("sh_b").alias("__sz_b"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("__common")
                / (F.col("__sz_a") + F.col("__sz_b") - F.col("__common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    from .cache import track

    return track(verified, feat, banded_p)


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup edges → (id, label) with label =
    min id in the component. This is what turns PAIR output (jaccard /
    minhash / simhash / cosine) into actionable dedup: every member of a
    duplicate cluster maps to one representative.

    Algorithm: iterative min-label propagation with per-round pointer
    jumping (label ← label-of-label), i.e. alternating small-star-style
    hops — converges in O(log diameter) rounds. Each round is two shuffles
    on the vertex id (propagate + shortcut); lineage is truncated every
    round via localCheckpoint so the plan stays flat at any iteration count
    (swap for ``checkpoint`` with a cluster checkpoint dir in production).
    No driver-side data beyond the per-round convergence count. Each
    round's superseded checkpoint is unpersisted as soon as the next one
    lands (a long dedup loop must not accumulate one pinned block set per
    iteration); the FINAL round's blocks — which the returned frame reads
    from — are tracked for :func:`cache.release` alongside the upstream
    pair generator's persists (release only after consuming the result:
    truncated lineage cannot recompute).
    """
    from .cache import local_checkpoint_tracked, track

    e = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    # symmetric closure PLUS a self-loop per vertex: min-over-neighbors then
    # automatically includes the vertex's own label, so the loop body needs
    # no union (Spark 4's Union constraint rewrite also mishandles unions of
    # self-referencing checkpointed lineages)
    sym, sym_h = local_checkpoint_tracked(
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .unionByName(e.select(F.col("src"), F.col("src").alias("dst")))
        .unionByName(e.select(F.col("dst").alias("src"), F.col("dst")))
        .distinct()
    )
    try:
        labels, labels_h = local_checkpoint_tracked(
            sym.select("src").distinct().withColumn("label", F.col("src"))
        )
    except BaseException:
        sym_h.unpersist()
        raise
    converged = False
    try:
        for _ in range(max_iter):
            # 1. propagate: label(v) = min over {v} ∪ neighbors(v) of
            #    labels — one shuffle on dst then groupBy src (self-loops
            #    carry own label)
            new_labels = (
                sym.join(labels.select(F.col("src").alias("dst"), "label"), "dst")
                .groupBy("src")
                .agg(F.min("label").alias("label"))
            )
            # 2. pointer jump: label(v) ← label(label(v)) — collapses
            #    chains logarithmically instead of one hop per round
            jumped, jumped_h = local_checkpoint_tracked(
                new_labels.alias("a")
                .join(
                    new_labels.select(
                        F.col("src").alias("label"), F.col("label").alias("ll")
                    ).alias("b"),
                    "label",
                    "left",
                )
                .select(F.col("src"), F.coalesce("ll", "label").alias("label"))
            )
            try:
                changed = (
                    jumped.alias("n")
                    .join(labels.alias("o"), "src")
                    .filter(F.col("n.label") != F.col("o.label"))
                    .count()
                )
            except BaseException:
                jumped_h.unpersist()
                raise
            # previous round's checkpoint is now superseded — free its blocks
            labels_h.unpersist()
            labels, labels_h = jumped, jumped_h
            if changed == 0:
                converged = True
                break
    except BaseException:
        # a failed job mid-loop must not leave the closure + round
        # checkpoints pinned until session death — the error path frees
        # exactly what the happy path does
        sym_h.unpersist()
        labels_h.unpersist()
        raise
    # the returned frame reads only the FINAL labels checkpoint; the
    # symmetric closure (the largest intermediate, ~4x the edge count) is
    # dead once the loop ends — free it now rather than at release()
    sym_h.unpersist()
    if not converged:
        labels_h.unpersist()
        # Partially-propagated labels are a SILENT wrong answer (two members
        # of one cluster keep different representatives) — never return them
        # quietly. Pointer jumping converges in O(log diameter) rounds, so
        # hitting this means max_iter is far too low for the graph.
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds; labels would be incorrect — raise max_iter "
            f"(components converge in O(log diameter) rounds)"
        )
    from .cache import propagate

    return track(
        propagate(labels.select(F.col("src").alias("id"), "label"), pairs),
        labels_h,
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Map every document to its duplicate-cluster representative
    (min id of the connected component; singletons map to themselves).

    Output: (id_col, cluster_rep). Compose with any pair generator —
    :func:`jaccard_pairs` as the exact oracle, :func:`minhash_lsh_pairs` as
    the linear-time scale path (same edge schema)."""
    from .cache import propagate

    cc = connected_components(pairs)
    return propagate(
        df.select(F.col(id_col)).join(
            cc.select(F.col("id").alias(id_col), F.col("label").alias("cluster_rep")),
            id_col,
            "left",
        ).select(
            F.col(id_col),
            F.coalesce("cluster_rep", F.col(id_col)).alias("cluster_rep"),
        ),
        cc,
    )


def drop_duplicates_by_cluster(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep exactly one representative row per duplicate cluster — the
    apply-side of near-dup detection a real curation pipeline needs."""
    from .cache import propagate

    # keep the TRACKED handle: .filter() returns a new DataFrame without
    # the recorded dep list, so propagation must source from `clusters`
    clusters = dedup_clusters(df, pairs, id_col)
    reps = clusters.filter(F.col(id_col) == F.col("cluster_rep"))
    return propagate(df.join(reps.select(id_col), id_col, "inner"), clusters)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 60) -> DataFrame:
    """60-bit SimHash fingerprint per document.

    Hybrid split along the guide's rule of thumb: token hashing stays
    JVM-side (one sha256 per distinct token → 60-bit base, whole-stage
    codegen, reproducible in the DuckDB oracle), and only the bit-vote fold
    — which would need 60 separate array aggregates as pure column exprs —
    runs as an Arrow-batched pandas UDF over the compact ``array<long>`` of
    token hashes (numpy bit-unpack, vectorized across the whole batch).
    Deterministic: same hashes, same integer votes, any parallelism.
    60 bits (not 64) so the fingerprint stays positive in a signed int64 in
    every engine."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    assert bits == 60, "simhash is fixed at 60 bits"

    # no type hints: `from __future__ import annotations` stringifies them
    # and pyspark can't resolve 'pd.Series' from a function-local import
    def _fold_impl(hashes):
        # one flat bit-matrix for the WHOLE Arrow batch, segment-summed per
        # document via reduceat over the doc-contiguous layout — no per-doc
        # Python loop and no scatter-add (np.add.at is an order of
        # magnitude slower than reduceat on this shape; r7 measured the
        # swap at ~4.3 s → ~0.9 s for the sf0.1 fingerprint pass)
        n = len(hashes)
        lens = np.fromiter(
            (0 if hs is None else len(hs) for hs in hashes), dtype=np.int64, count=n
        )
        shifts = np.arange(60, dtype=np.uint64)
        if int(lens.sum()) == 0:
            return pd.Series(np.zeros(n, dtype=np.int64))
        flat = np.concatenate(
            [np.asarray(hs, dtype=np.int64) for hs in hashes if hs is not None and len(hs)]
        ).astype(np.uint64)
        bits_mat = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        nz = np.flatnonzero(lens > 0)
        starts = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
        sums = np.zeros((n, 60), dtype=np.int64)
        sums[nz] = np.add.reduceat(bits_mat, starts, axis=0)
        # votes[b] = (#tokens with bit b set) - (#tokens with bit b unset)
        votes = 2 * sums - lens[:, None]
        fp = ((votes > 0).astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
        return pd.Series(fp.view(np.int64))  # < 2^60, always positive

    _fold = pandas_udf(_fold_impl, T.LongType())

    toks = F.array_distinct(tokens(text_col))
    th = F.transform(toks, lambda t: portable_hash60(t))
    return df.select(F.col(id_col).alias("id"), _fold(th).alias("simhash"))


def simhash_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate blocking: split the 60-bit fingerprint into ``bands`` chunks —
    any pair within Hamming ≤ bands−1 shares at least one identical chunk
    (pigeonhole), so a chunk-equality join finds all such pairs without the
    quadratic blowup. The pigeonhole guarantee REQUIRES
    ``max_hamming ≤ bands − 1``; a looser radius would silently miss pairs
    whose differing bits spread across every chunk, so it raises instead."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole recall bound "
            f"bands-1={bands - 1}; raise bands to at least {max_hamming + 1}"
        )
    fps = simhash(df, text_col, id_col)
    width = 60 // bands
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            for i in range(bands)
        ]
    )
    # persist: both self-join sides read the fingerprints — without it the
    # normalize → tokenize → sha256 → pandas-UDF bit-vote pipeline (the
    # expensive part) executes twice. O(N·bands) fixed-width rows cached.
    blocked = fps.select(
        "id", "simhash", F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).persist()
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    from .cache import track

    # Hamming filter BEFORE the distinct: the filter is deterministic per
    # pair, so filter∘distinct ≡ distinct∘filter — but filtering first means
    # the dedup exchange shuffles only the ≤max_hamming pairs instead of
    # every chunk collision (r7: 2.14M collide pairs → 311k at sf0.1, the
    # distinct stage's input cut ~7×; guide §2.3 "shuffle fewer bytes")
    return track(
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct(),
        blocked,
    )
