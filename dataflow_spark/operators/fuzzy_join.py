"""Fuzzy (similarity) join between two tables — entity resolution.

The reference's dedup family only matches a table against itself; a
curation pipeline also needs the CROSS-table variant: match scraped
records against a canonical table, align two crawl snapshots, join
noisy titles to a catalog. This is the exact set-similarity join
(token/shingle Jaccard >= t) built scale-first:

- prefix filtering (PPJoin / AllPairs, Xiao et al. WWW'08): under a
  global total order, two sets with Jaccard >= t MUST share an element
  in their first floor((1-t)*|set|)+1 elements — candidate generation
  is an equi-join on prefix elements with complete recall, never a
  cartesian product;
- global-frequency ordering (rarest first) keeps prefix buckets tiny:
  stopword-ish shingles land at the end of every ordering and never
  block; the frequency table is computed over BOTH sides so the order
  is consistent;
- PPJoin positional filter prunes provably-sub-threshold candidates
  before any set materializes;
- sets are xxhash64'd to bigint arrays: set ops shuffle ~5x fewer
  bytes than raw shingle strings (same convention as the dedup family;
  a 64-bit collision flipping a boundary Jaccard is ~1e-15/corpus).

Exact semantics (same result as the quadratic nested loop), linear-ish
cost — the oracle for the contract query IS the quadratic nested loop.

Caveat: prefix filtering's pruning power comes from shingle-space
SPARSITY. On a low-entropy corpus (tiny vocabulary, heavy templating)
most shingles are frequent, prefix buckets grow dense, and cost trends
toward the quadratic floor — real web/text corpora are sparse (Heaps'
law), but for synthetic/templated data prefer the probabilistic
MinHash-LSH dedup family, or raise the threshold (prefix length is
(1-t)|set|+1, so t=0.8 probes 2x fewer elements than t=0.6).

Adaptive DENSE path (r6): when the LEFT side's shingle vocabulary is
small (low-entropy corpus, or a small query table matched into a huge
corpus) the operator skips candidate generation entirely: the left
side is collected as a packed bitset matrix (one column per left-vocab
shingle hash), broadcast, and each right-side Arrow batch computes
EXACT overlap counts against it with one BLAS matmul (0/1 float32;
integer counts < 2^24 are exact). Right-only shingles cannot overlap
and are dropped from the matrix — right set sizes come from the
untruncated arrays, so Jaccard/containment are unchanged. Zero
shuffles: one scan of the right side against a broadcast. The switch
is guarded by a cheap sampled probe, then exact vocab/size counts,
and falls back to the sparse PPJoin path when the left side exceeds
``dense_vocab_max`` distinct shingles or ``dense_broadcast_mb`` of
packed bits. On the degenerate bench sf1 replica (2.2k-shingle vocab,
where sparse PPJoin admits 406M candidates) this is the difference
between 199s and seconds, with bit-identical output (verified against
tools/brute_fuzzy_oracle.py and the DuckDB contract oracles).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataflow_spark.core.operator import BudgetExceededError, Operator
from dataflow_spark.core.registry import OPERATOR_REGISTRY
from dataflow_spark.functions import hashing as H
from dataflow_spark.functions import text as T
from dataflow_spark.functions.pulls import bounded_pull


@OPERATOR_REGISTRY.register()
class FuzzyJoinOperator(Operator):
    """Pairs (left_id, right_id, jaccard) with set Jaccard >= threshold.

    ``mode='char'`` compares distinct char-``shingle_n``-gram sets
    (robust to word-order edits — near-dup detection across tables);
    ``mode='words'`` compares distinct lowercased word sets (classic
    entity resolution on short strings). ``run(left, right=right)``.

    ``metric='jaccard'`` (default) matches on |A∩B|/|A∪B|;
    ``metric='containment'`` matches on |A∩B|/|A| — "the LEFT set is
    mostly contained in the right" (quote detection, subset/extract
    matching, left-side boilerplate lookup). Containment keeps the
    left-prefix pigeonhole guarantee (any (1-t)|A|+1 elements of A hit
    B when containment >= t) but the right side must index ALL its
    elements, and only |B| >= t|A| is a valid length bound.
    """

    def __init__(self, threshold: float = 0.7, mode: str = "char",
                 shingle_n: int = 5, metric: str = "jaccard",
                 left_key: str = "text", right_key: str = "text",
                 left_id: str = "doc_id", right_id: str = "doc_id",
                 dense_vocab_max: int = 8192, dense_broadcast_mb: int = 64,
                 max_candidate_pairs: float = 5e9,
                 dense_flop_budget: float = 2e13,
                 on_budget_exceeded: str = "raise",
                 fallback_num_perm: int = 64,
                 fallback_max_bucket: int = 256):
        if not 0.0 < threshold <= 1.0:
            raise ValueError("threshold must be in (0, 1]")
        if mode not in ("char", "words"):
            raise ValueError("mode must be 'char' or 'words'")
        if metric not in ("jaccard", "containment"):
            raise ValueError("metric must be 'jaccard' or 'containment'")
        if on_budget_exceeded not in ("raise", "minhash"):
            raise ValueError("on_budget_exceeded must be 'raise' or "
                             "'minhash'")
        self.threshold, self.mode, self.shingle_n = threshold, mode, shingle_n
        self.metric = metric
        self.left_key, self.right_key = left_key, right_key
        self.left_id, self.right_id = left_id, right_id
        # dense-path guards: 0 disables the dense path entirely
        self.dense_vocab_max = dense_vocab_max
        self.dense_broadcast_mb = dense_broadcast_mb
        # sparse-path blowup guard (0 disables): refuse predictably on
        # corpora whose prefix buckets imply a ~quadratic candidate set
        # (see NgramJaccardDeduplicateFilter — the r7 sf10 sweep JVM-OOM)
        self.max_candidate_pairs = max_candidate_pairs
        # dense-path compute guard (0 disables): n_left*n_right*nbits
        # multiply-adds. Calibrated in-container r8: the bitset kernel
        # (unpackbits + float32 GEMM + float64 threshold scan) sustains
        # ~1e10 budget-units/s per core, so 2e13 is ~1-4 min when the
        # right-side scan parallelizes (>=8 partitions typical) — the
        # r7 default (4e15) was ~100x optimistic and let a 5.6e13-unit
        # containment GEMV burn a 600s timeout instead of refusing,
        # while 2e13 still admits every shape the sf1 sweep completes
        # (largest: 5.6e12).
        self.dense_flop_budget = dense_flop_budget
        # budget-refusal policy: 'raise' (default — exact or nothing) or
        # 'minhash' (opt-in: MinHash-LSH candidates + EXACT verify; see
        # _minhash_join for the documented recall semantics)
        self.on_budget_exceeded = on_budget_exceeded
        self.fallback_num_perm = fallback_num_perm
        self.fallback_max_bucket = fallback_max_bucket
        self.input_keys = (left_key, left_id)
        self.output_keys = ("left_id", "right_id", self.metric)

    def _sets(self, col: Column) -> Column:
        if self.mode == "char":
            raw = H.char_shingles(col, self.shingle_n)
        else:
            raw = F.transform(T.words(col), lambda x: F.lower(x))
        return F.array_sort(F.array_distinct(
            F.transform(raw, lambda s: F.xxhash64(s))))

    def _try_dense(self, lraw: DataFrame, rraw: DataFrame):
        """Broadcast-bitset matmul path; None when guards say sparse.

        Exactness: overlap counts are sums of 0/1 float32 products —
        every partial sum is an integer < 2^24, hence exact; the final
        threshold uses the same float64 division as the sparse path.

        ``lraw`` is persisted for the duration of this probe: it is
        read by four separate jobs (vocab probe, vocab collect, size
        stats, row collect), and if the left plan were
        non-deterministic (a sample, a shuffle-dependent limit) an
        unpersisted recompute could hand the packing step tokens that
        are not in the collected vocab — searchsorted would then write
        a wrong column or index past the bitset (ADVICE r6). With one
        materialization all four reads see the same rows.
        """
        if self.dense_vocab_max <= 0:
            return None
        spark = lraw.sparkSession
        lraw = lraw.persist()
        try:
            return self._try_dense_persisted(lraw, rraw, spark)
        finally:
            lraw.unpersist()

    def _try_dense_persisted(self, lraw, rraw, spark):
        # sampled probe first: a subset's vocab only undercounts, so
        # "probe > max" proves the full left vocab is over budget
        # without scanning a (possibly huge) left side
        probe = (lraw.limit(2000)
                 .select(F.explode("_sh").alias("_p"))
                 .agg(F.countDistinct("_p")).first()[0])
        if probe > self.dense_vocab_max:
            return None
        vocab_pdf = bounded_pull(
            lraw.select(F.explode("_sh").alias("_p")).distinct(),
            self.dense_vocab_max + 1)  # bounded: limit(dense_vocab_max + 1)
        if len(vocab_pdf) > self.dense_vocab_max:
            return None

        import numpy as np

        # column j of the bitset matrix = rank of the shingle hash in
        # the sorted left vocabulary — searchsorted IS the token->column
        # map, vectorized on both the driver and the executors
        vocab = np.sort(vocab_pdf["_p"].to_numpy(dtype=np.int64))
        nbits = max(len(vocab), 1)
        stats = lraw.agg(F.count(F.lit(1)).alias("n"),
                         F.sum(F.size("_sh")).alias("tok")).first()
        n_l, tok_l = int(stats["n"] or 0), int(stats["tok"] or 0)
        budget = self.dense_broadcast_mb * 1024 * 1024
        # packed-bit matrix AND the raw set payload must both fit
        if n_l == 0 or n_l * ((nbits + 7) // 8) > budget or tok_l * 8 > 8 * budget:
            return None
        # FLOP budget (r7): byte-feasible is not compute-feasible — at
        # sf10 a 50k x 500k x 2226 GEMM fit the broadcast budget but
        # needed 5.6e16 flops (engine timeout at 600s). And reaching
        # this point proves the left vocabulary is degenerate-small
        # (<= dense_vocab_max), so the sparse PPJoin's prefix buckets
        # are ~all-pairs too — falling through would just burn the
        # caller's time re-deriving that (at sf10 the sparse guard's
        # own prefix aggregate exceeded a 600s engine budget). Raise
        # the actionable refusal HERE, in seconds.
        if self.dense_flop_budget:
            n_r = rraw.count()
            if float(n_l) * n_r * nbits > self.dense_flop_budget:
                raise BudgetExceededError(
                    "FuzzyJoinOperator: exact matching is infeasible on "
                    f"this corpus shape — left vocabulary is only {nbits}"
                    f" distinct shingles across {n_l} x {n_r} rows, so "
                    "both the dense bitset GEMM "
                    f"({float(n_l) * n_r * nbits:.2e} flops > "
                    f"dense_flop_budget={self.dense_flop_budget:.2e}) "
                    "and sparse PPJoin (prefix buckets hold most of the "
                    "corpus) are ~quadratic. Pass on_budget_exceeded="
                    "'minhash' for the approximate fallback (exact "
                    "verify, probabilistic recall), or raise "
                    "dense_flop_budget explicitly to accept the cost.")

        # bounded above: n_l rows whose packed bits fit dense_broadcast_mb.
        # Arrow toPandas, not collect: per-Row pickling of array<long>
        # cells costs seconds at the budget bound (guide §6, r9)
        lpdf = lraw.select("_id", "_sh").toPandas()
        lids = np.array(lpdf["_id"].tolist(), dtype=object)
        lsets = [np.asarray(v, dtype=np.int64) for v in lpdf["_sh"]]
        lsz = np.array([len(s) for s in lsets], dtype=np.float64)
        packed = np.zeros((n_l, (nbits + 7) // 8), dtype=np.uint8)
        blk = 8192
        for lo in range(0, n_l, blk):
            chunk = lsets[lo:lo + blk]
            dense = np.zeros((len(chunk), nbits), dtype=bool)
            rix = np.repeat(np.arange(len(chunk)),
                            [len(s) for s in chunk])
            toks = (np.concatenate(chunk) if chunk else
                    np.empty(0, dtype=np.int64))
            dense[rix, np.searchsorted(vocab, toks)] = True
            packed[lo:lo + len(chunk)] = np.packbits(dense, axis=1)
        bc = spark.sparkContext.broadcast((lids, lsz, packed, nbits, vocab))

        t, metric = self.threshold, self.metric
        out_schema = ("left_id " + lraw.schema["_id"].dataType.simpleString()
                      + ", right_id "
                      + rraw.schema["_id"].dataType.simpleString()
                      + f", {metric} double")

        def compute(batches):
            import pandas as pd

            lids_, lsz_, packed_, nbits_, vocab_ = bc.value
            lblk = max(1, (1 << 23) // max(nbits_, 1))  # ~8M bools/block
            for pdf in batches:
                sets = [np.asarray(s, dtype=np.int64) for s in pdf["_sh"]]
                rsz = np.array([len(s) for s in sets], dtype=np.float64)
                rm = np.zeros((len(pdf), nbits_), dtype=np.float32)
                rix = np.repeat(np.arange(len(sets)),
                                [len(s) for s in sets])
                toks = (np.concatenate(sets) if sets else
                        np.empty(0, dtype=np.int64))
                # right-only shingles land outside the left vocab: keep
                # only exact hits of the searchsorted probe
                pos = np.searchsorted(vocab_, toks).clip(
                    max=max(len(vocab_) - 1, 0))
                hit = vocab_[pos] == toks if len(vocab_) else (
                    np.zeros(len(toks), dtype=bool))
                rm[rix[hit], pos[hit]] = 1.0
                rids = pdf["_id"].to_numpy()
                for lo in range(0, len(lids_), lblk):
                    lm = np.unpackbits(
                        packed_[lo:lo + lblk], axis=1,
                        count=nbits_).astype(np.float32)
                    o = (rm @ lm.T).astype(np.float64)  # rows x lblk
                    if metric == "containment":
                        denom = np.broadcast_to(
                            lsz_[None, lo:lo + lblk], o.shape)
                    else:
                        denom = rsz[:, None] + lsz_[None, lo:lo + lblk] - o
                    with np.errstate(invalid="ignore", divide="ignore"):
                        val = o / denom
                    ri, li = np.nonzero(val >= t)
                    if len(ri):
                        yield pd.DataFrame({
                            "left_id": lids_[lo + li],
                            "right_id": rids[ri],
                            metric: val[ri, li]})

        return (rraw.mapInPandas(compute, schema=out_schema)
                .withColumn(metric, F.round(metric, 6)))

    def run(self, df: DataFrame, right: DataFrame | None = None,
            **kw: Any) -> DataFrame:
        if right is None:
            raise ValueError("FuzzyJoinOperator needs run(left, right=df)")
        lraw = (df.select(F.col(self.left_id).alias("_id"),
                          self._sets(F.col(self.left_key)).alias("_sh"))
                .filter(F.size("_sh") > 0))
        rraw = (right.select(F.col(self.right_id).alias("_id"),
                             self._sets(F.col(self.right_key)).alias("_sh"))
                .filter(F.size("_sh") > 0))
        #: last_path: which physical strategy served the last run() —
        #: 'dense' (broadcast bitset matmul), 'sparse' (PPJoin prefix
        #: filter), or 'minhash' (budget-refused, opt-in approximate
        #: fallback). Plan-debug surface for tests and operators
        #: composing this one; mirrors what .explain() can't show (the
        #: switch happens before any Spark plan exists).
        try:
            dense = self._try_dense(lraw, rraw)
            if dense is not None:
                self.last_path = "dense"
                return dense
            self.last_path = "sparse"
            return self._sparse_join(lraw, rraw)
        except BudgetExceededError:
            if self.on_budget_exceeded != "minhash":
                raise
            self.last_path = "minhash"
            return self._minhash_join(lraw, rraw)

    def _sparse_join(self, lraw: DataFrame, rraw: DataFrame) -> DataFrame:
        """PPJoin sparse path. The intermediate frames (dedup'd sides,
        membership map, prefix explode) are persisted for their multiple
        reads but released before returning: the result is eagerly
        localCheckpoint-ed (matched pairs — small), which consumes every
        pinned frame inside this call, so no cached blocks outlive the
        run (ADVICE r7: the guard persist used to leak for the session
        lifetime)."""
        pins: list[DataFrame] = []
        try:
            return self._sparse_join_pinned(lraw, rraw, pins)
        finally:
            for p in pins:
                p.unpersist()

    def _sparse_join_pinned(self, lraw: DataFrame, rraw: DataFrame,
                            pins: list[DataFrame]) -> DataFrame:
        t = self.threshold
        raw = (
            lraw.withColumn("_side", F.lit("L"))
            .unionByName(rraw.withColumn("_side", F.lit("R")))
        )
        # degenerate-corpus armor (same as the dedup family): collapse
        # rows with IDENTICAL shingle sets to one representative per
        # side before candidate generation — replicated/templated
        # corpora otherwise quadratically inflate every prefix bucket.
        # Survivor pairs expand back through the membership map at the
        # end (identical-set L/R pairs have Jaccard 1 >= t and are
        # found via their shared prefix like any other pair).
        raw = raw.withColumn(
            "_sethash",
            F.md5(F.concat_ws(",", F.transform(
                "_sh", lambda x: x.cast("string")))))
        members = raw.select("_side", "_id", "_sethash").persist()
        pins.append(members)
        sides = (raw.dropDuplicates(["_side", "_sethash"])
                 .select("_side", F.col("_sethash").alias("_id"), "_sh")
                 .persist())
        pins.append(sides)
        # one global frequency order over BOTH sides (rarest first)
        ex = sides.select("_side", "_id", F.explode("_sh").alias("_p"))
        freq = ex.groupBy("_p").agg(F.count(F.lit(1)).alias("_df"))
        ranked = (
            ex.join(freq, "_p")
            .groupBy("_side", "_id")
            .agg(F.array_sort(F.collect_list(F.struct("_df", "_p")))
                 .alias("_rs"))
            .select("_side", "_id",
                    F.transform("_rs", lambda s: s["_p"]).alias("_rsh"))
        )
        # left prefix is the pigeonhole block in both metrics; the right
        # prefix can only prune under the symmetric (jaccard) metric.
        # Integer-exact length (epsilon-guarded): the naive float
        # floor((1-t)*n)+1 is one short at boundary thresholds.
        lpre_len = H.prefix_length(t, F.size("_rsh"))
        rpre_len = (lpre_len if self.metric == "jaccard"
                    else F.size("_rsh"))
        prefix = ranked.select(
            "_side", "_id", F.size("_rsh").alias("_len"),
            F.posexplode(F.slice(
                "_rsh", 1,
                F.when(F.col("_side") == "L", lpre_len)
                .otherwise(rpre_len))).alias("_pos", "_p"))
        if self.max_candidate_pairs:
            # upper bound on the blocking join: sum over shared prefix
            # elements of (left bucket) x (right bucket); Heaps-law
            # corpora pass at any scale, degenerate corpora refuse with
            # an actionable error instead of an OOM-bound shuffle
            prefix = prefix.persist()
            pins.append(prefix)
            est = (prefix.groupBy("_p")
                   .agg(F.sum(F.when(F.col("_side") == "L", 1)
                              .otherwise(0)).alias("_cl"),
                        F.sum(F.when(F.col("_side") == "R", 1)
                              .otherwise(0)).alias("_cr"))
                   .agg(F.sum(F.col("_cl") * F.col("_cr")).alias("_u"))
                   .first()["_u"]) or 0
            if est > self.max_candidate_pairs:
                raise BudgetExceededError(
                    "FuzzyJoinOperator: prefix-bucket candidate upper "
                    f"bound {est:.2e} exceeds max_candidate_pairs="
                    f"{self.max_candidate_pairs:.2e} — the corpus is "
                    "too low-entropy for exact PPJoin at this size. "
                    "Pass on_budget_exceeded='minhash' for the "
                    "approximate fallback (exact verify, probabilistic "
                    "recall), or raise max_candidate_pairs / dense "
                    "guards explicitly.")
        if self.metric == "jaccard":
            alpha = H.ceil_lower_bound(F.lit(t / (1.0 + t))
                                       * (F.col("a._len") + F.col("b._len")))
            # length filter: Jaccard >= t forces t|A| <= |B| <= |A|/t
            lenf = ((F.col("b._len")
                     >= H.ceil_lower_bound(F.lit(t) * F.col("a._len")))
                    & (F.col("a._len")
                       >= H.ceil_lower_bound(F.lit(t) * F.col("b._len"))))
        else:
            # containment >= t needs overlap >= t|A|, and |B| >= t|A|
            alpha = H.ceil_lower_bound(F.lit(t) * F.col("a._len"))
            lenf = (F.col("b._len")
                    >= H.ceil_lower_bound(F.lit(t) * F.col("a._len")))
        bound = F.least(F.col("a._len") - F.col("a._pos"),
                        F.col("b._len") - F.col("b._pos"))
        cand = (
            prefix.filter(F.col("_side") == "L").alias("a")
            .join(prefix.filter(F.col("_side") == "R").alias("b"),
                  (F.col("a._p") == F.col("b._p")) & (bound >= alpha)
                  & lenf)
            .select(F.col("a._id").alias("_lid"),
                    F.col("b._id").alias("_rid"))
            .distinct()
        )
        lsets = sides.filter(F.col("_side") == "L").select(
            F.col("_id").alias("_lid"), F.col("_sh").alias("_sa"))
        rsets = sides.filter(F.col("_side") == "R").select(
            F.col("_id").alias("_rid"), F.col("_sh").alias("_sb"))
        verified = (
            cand.join(lsets, "_lid").join(rsets, "_rid")
            .withColumn("_ov", F.size(F.array_intersect("_sa", "_sb")))
            .withColumn(
                self.metric,
                F.col("_ov").cast("double") / F.size("_sa")
                if self.metric == "containment"
                else F.col("_ov").cast("double")
                / (F.size("_sa") + F.size("_sb") - F.col("_ov")))
            .filter(F.col(self.metric) >= t)
            .select("_lid", "_rid",
                    F.round(self.metric, 6).alias(self.metric))
        )
        lmem = members.filter(F.col("_side") == "L").select(
            F.col("_sethash").alias("_lid"), F.col("_id").alias("left_id"))
        rmem = members.filter(F.col("_side") == "R").select(
            F.col("_sethash").alias("_rid"), F.col("_id").alias("right_id"))
        final = (verified.join(lmem, "_lid").join(rmem, "_rid")
                 .select("left_id", "right_id", self.metric))
        # eager localCheckpoint: materializes the (small) matched-pair
        # result NOW, consuming members/sides/prefix so the caller in
        # _sparse_join can unpersist them — and truncates the 4-join
        # lineage the downstream pipeline would otherwise re-optimize
        return final.localCheckpoint(eager=True)

    def _minhash_join(self, lraw: DataFrame, rraw: DataFrame) -> DataFrame:
        """Opt-in approximate fallback when a budget guard refuses the
        exact algorithm (``on_budget_exceeded='minhash'``).

        Candidates come from MinHash-LSH banding over the shingle sets;
        every candidate is then verified with the EXACT metric on the
        true sets. So precision is exact (no false positives — every
        output row truly meets the threshold) and only RECALL is
        probabilistic, governed by the banding S-curve on JACCARD
        similarity (``optimal_bands(t', fallback_num_perm)``). Two
        documented recall losses:

        - oversized buckets: per (band, h) bucket each side is capped
          at ``fallback_max_bucket`` rows (smallest ids kept —
          deterministic), bounding candidates at buckets*cap^2 on the
          degenerate corpora that route here. Rows beyond the cap can
          only match through another band.

        ``metric='containment'`` does NOT use MinHash banding at all:
        MinHash collides on JACCARD, and the flagship containment shape
        (a 40-char quote inside a full document) has near-zero Jaccard
        — banding recall there is ~0 (measured 0/57 pairs at sf0.01,
        r9). It routes to ``_containment_fallback`` instead: pigeonhole
        prefix probing with a capped inverted index, whose only recall
        loss is the per-bucket cap.

        Both schemes run on identical-set REPRESENTATIVES (same
        degenerate-corpus armor as the sparse path): rows with equal
        shingle sets collapse to one per side before candidate
        generation and expand back at the end. Without this, a
        replicated corpus multiplies every candidate bucket by the
        replica count (r9 at sf10: 250k quote rows = ~2.5k distinct
        sets; uncollapsed, the verify join's candidate fan-out broke
        the driver's broadcast-collect budget).
        """
        pins: list[DataFrame] = []
        try:
            return self._minhash_join_pinned(lraw, rraw, pins)
        finally:
            for p in pins:
                p.unpersist()

    def _collapse_side(self, raw: DataFrame, pins: list[DataFrame]):
        """(members, representatives) for identical-shingle-set rows:
        members maps _sethash -> every original _id; representatives
        carry one (_id=_sethash, _sh) row per distinct set."""
        hashed = raw.withColumn(
            "_sethash",
            F.md5(F.concat_ws(",", F.transform(
                "_sh", lambda x: x.cast("string")))))
        members = hashed.select("_id", "_sethash").persist()
        pins.append(members)
        reps = (hashed.dropDuplicates(["_sethash"])
                .select(F.col("_sethash").alias("_id"), "_sh").persist())
        pins.append(reps)
        return members, reps

    def _expand_members(self, verified: DataFrame, lmem: DataFrame,
                        rmem: DataFrame) -> DataFrame:
        """Representative pairs -> original-id pairs (metric is
        set-determined, so every member pair inherits it). Eager
        localCheckpoint so the caller can release the pinned frames."""
        lx = lmem.select(F.col("_sethash").alias("left_id"),
                         F.col("_id").alias("_lorig"))
        rx = rmem.select(F.col("_sethash").alias("right_id"),
                         F.col("_id").alias("_rorig"))
        out = (verified.join(lx, "left_id").join(rx, "right_id")
               .select(F.col("_lorig").alias("left_id"),
                       F.col("_rorig").alias("right_id"), self.metric))
        return out.localCheckpoint(eager=True)

    def _minhash_join_pinned(self, lraw: DataFrame, rraw: DataFrame,
                             pins: list[DataFrame]) -> DataFrame:
        lmem, lreps = self._collapse_side(lraw, pins)
        if self.metric == "containment":
            rmem, rreps = self._collapse_right_projected(lreps, rraw,
                                                         pins)
            verified = self._containment_fallback(lreps, rreps)
        else:
            rmem, rreps = self._collapse_side(rraw, pins)
            verified = self._banding_fallback(lreps, rreps)
        return self._expand_members(verified, lmem, rmem)

    def _collapse_right_projected(self, lreps: DataFrame,
                                  rraw: DataFrame,
                                  pins: list[DataFrame]):
        """Right-side collapse for the containment fallback: collapse
        by the PROJECTION of each right set onto the left vocabulary.

        containment(A, B) = |A∩B| / |A| depends on B only through
        B∩U where U = union of all left shingles (A ⊆ U for every A),
        so two right rows with equal projections are EXCHANGEABLE for
        this metric — verification against the projection is exact,
        not approximate. This is what lets a replicated corpus
        collapse on the right even when raw sets differ (r9 at sf1:
        per-replica text suffixes defeat the raw-set collapse, but no
        suffix shingle occurs in any quote, so all replicas of a base
        doc share one projection — right reps drop from 50k rows to
        ~5k, prefix buckets shrink to base-corpus document
        frequencies, and the capped-bucket recall loss all but
        disappears: measured 0.357 -> ~1.0). Rows with an EMPTY
        projection can never reach a threshold > 0 and are dropped
        here (the inner join + groupBy does it).

        Scale shape: U is one distinct over the (already collapsed)
        left reps; the right explode is pruned by an equi-join on U
        (AQE broadcasts it when small) and re-grouped by _id — one
        linear shuffle, no quadratic term.
        """
        probe = lreps.select(F.explode("_sh").alias("_p")).distinct()
        proj = (rraw.select("_id", F.explode("_sh").alias("_p"))
                .join(probe, "_p")
                .groupBy("_id")
                .agg(F.array_sort(F.collect_set("_p")).alias("_sh")))
        hashed = proj.withColumn(
            "_sethash",
            F.md5(F.concat_ws(",", F.transform(
                "_sh", lambda x: x.cast("string")))))
        members = hashed.select("_id", "_sethash").persist()
        pins.append(members)
        reps = (hashed.dropDuplicates(["_sethash"])
                .select(F.col("_sethash").alias("_id"), "_sh").persist())
        pins.append(reps)
        return members, reps

    def _banding_fallback(self, lraw: DataFrame,
                          rraw: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        t = self.threshold
        # banding threshold in Jaccard space (see docstring)
        t_band = t if self.metric == "jaccard" else t / (2.0 - t)
        bands, rows = H.optimal_bands(min(max(t_band, 0.05), 0.95),
                                      self.fallback_num_perm)
        sig_udf = H.minhash_from_hashes_udf(self.fallback_num_perm)
        cap = self.fallback_max_bucket

        def banded(side: DataFrame) -> DataFrame:
            b = side.select(
                "_id",
                F.explode(H.band_hashes(sig_udf(F.col("_sh")),
                                        bands, rows)).alias("bh"))
            b = b.select("_id", F.col("bh.band").alias("band"),
                         F.col("bh.h").alias("h"))
            # per-bucket cap via a window (external sorter streams the
            # group — never a collect_list of an unbounded bucket)
            w = Window.partitionBy("band", "h").orderBy("_id")
            return (b.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") <= cap).drop("_rn"))

        cand = (banded(lraw.select("_id", "_sh"))
                .withColumnRenamed("_id", "_lid")
                .join(banded(rraw.select("_id", "_sh"))
                      .withColumnRenamed("_id", "_rid"), ["band", "h"])
                .select("_lid", "_rid").distinct())
        return self._verify_candidates(cand, lraw, rraw)

    def _verify_candidates(self, cand: DataFrame, lraw: DataFrame,
                           rraw: DataFrame) -> DataFrame:
        """Exact-metric verification of (_lid, _rid) candidate pairs —
        shared by both approximate fallbacks: every output row truly
        meets the threshold (precision exact), whatever produced the
        candidates."""
        lsets = lraw.select(F.col("_id").alias("_lid"),
                            F.col("_sh").alias("_sa"))
        rsets = rraw.select(F.col("_id").alias("_rid"),
                            F.col("_sh").alias("_sb"))
        return (
            cand.join(lsets, "_lid").join(rsets, "_rid")
            .withColumn("_ov", F.size(F.array_intersect("_sa", "_sb")))
            .withColumn(
                self.metric,
                F.col("_ov").cast("double") / F.size("_sa")
                if self.metric == "containment"
                else F.col("_ov").cast("double")
                / (F.size("_sa") + F.size("_sb") - F.col("_ov")))
            .filter(F.col(self.metric) >= self.threshold)
            .select(F.col("_lid").alias("left_id"),
                    F.col("_rid").alias("right_id"),
                    F.round(self.metric, 6).alias(self.metric)))

    def _containment_fallback(self, lraw: DataFrame,
                              rraw: DataFrame) -> DataFrame:
        """Approximate containment join: pigeonhole prefix probe +
        capped inverted index (``on_budget_exceeded='minhash'`` with
        ``metric='containment'``).

        Candidate guarantee: containment(A, B) >= t means at most
        (1-t)|A| elements of A are outside B, so ANY floor((1-t)|A|)+1
        elements of A include one of A∩B — the pigeonhole block, same
        as the exact path's left prefix (fuzzy_join reference
        semantics; prefix ordered rarest-first by right-side document
        frequency to keep probe buckets minimal, exactly PPJoin's
        ordering trick). Every true pair therefore shares at least one
        (prefix shingle, bucket); the ONLY recall loss is the
        per-shingle bucket cap below. Work bound: candidates <=
        |left prefix rows| * fallback_max_bucket, verification is
        exact per pair (precision 1.0).

        Scale shape: one groupBy for document frequency (map-side
        combine to |vocab| rows), the right explode is pre-pruned to
        shingles that occur in some left prefix (AQE broadcasts the
        probe set when small — the BM25 query-term trick), and the
        per-shingle cap is a deterministic pseudo-random sample
        (xxhash64 order, unbiased — smallest-id capping would
        systematically miss high-id replicas).
        """
        from pyspark.sql import Window

        cap = self.fallback_max_bucket
        rex = rraw.select("_id", F.explode("_sh").alias("_p"))
        dfreq = rex.groupBy("_p").agg(F.count(F.lit(1)).alias("_df"))
        lex = lraw.select("_id", F.size("_sh").alias("_len"),
                          F.explode("_sh").alias("_p"))
        # rarest-first: left shingles absent from the right get df 0 —
        # harmless prefix members (their buckets are empty; the
        # pigeonhole guarantee is per-B and holds for ANY fixed subset)
        lex = (lex.join(dfreq, "_p", "left")
               .withColumn("_df", F.coalesce("_df", F.lit(0))))
        wl = Window.partitionBy("_id").orderBy("_df", "_p")
        lpre = (lex.withColumn("_rn", F.row_number().over(wl))
                .filter(F.col("_rn")
                        <= H.prefix_length(self.threshold, F.col("_len")))
                .select(F.col("_id").alias("_lid"), "_p"))
        probe = lpre.select("_p").distinct()
        wr = Window.partitionBy("_p").orderBy(F.xxhash64("_p", "_id"),
                                              "_id")
        ridx = (rex.join(probe, "_p")
                .withColumn("_rn", F.row_number().over(wr))
                .filter(F.col("_rn") <= cap)
                .select(F.col("_id").alias("_rid"), "_p"))
        cand = lpre.join(ridx, "_p").select("_lid", "_rid").distinct()
        return self._verify_candidates(cand, lraw, rraw)
