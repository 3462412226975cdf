package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign each document a shard id such
  * that consecutive documents (in id order) fill each shard to a
  * weight budget — the "pack documents into ~1 GB / ~N-token training
  * shards" step at the end of every corpus pipeline.
  *
  * Semantics: with documents ordered by `idCol`, a document whose
  * preceding cumulative weight is `p` lands in shard `p div budget`
  * (documents are never split; a shard may overflow by at most one
  * document, the standard greedy rule).
  *
  * The naive formulation — `sum(w) OVER (ORDER BY id)` — is a GLOBAL
  * window: Spark plans it as a single-partition sort, one task doing
  * all the work. This implementation is the distributed two-phase
  * prefix sum instead:
  *
  *   1. coarse-bucket rows by `id div bucketWidth` (order-preserving);
  *   2. per-bucket totals (one map-side-combinable aggregation over
  *      n/bucketWidth rows) → running bucket offsets (a window over
  *      the TINY bucket relation only);
  *   3. broadcast the offsets back; within-bucket running sum is a
  *      window PARTITIONED by bucket — parallel across buckets.
  *
  * Total cost: one aggregation + one keyed shuffle of the corpus +
  * one broadcast of n/bucketWidth offset rows. At 10¹⁰ docs and
  * bucketWidth 10⁶ the offset relation is 10⁴ rows — trivially
  * broadcastable — and no single task ever sees more than one
  * bucket. PlanSpec pins this shape (the only unpartitioned window
  * runs over the bucket totals, never the corpus).
  */
object Pack {

  /** Add a `shard_id` column packing rows (in `idCol` order) into
    * consecutive shards of ≈`budget` total `weightCol`.
    *
    * `idCol` must be numeric, non-negative and unique (document ids);
    * `weightCol` non-negative (token counts). `bucketWidth` trades
    * bucket-relation size against per-bucket parallelism — any value
    * ≥ 1 is correct, only the plan economics change. */
  def packShards(df: DataFrame, idCol: String, weightCol: String,
                 budget: Long, bucketWidth: Long = 4096L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    withExclusivePrefix(df, idCol, weightCol, bucketWidth)
      // preceding-weight div budget; __pre < 2⁵³ so the double path is exact
      .withColumn("shard_id", floor(col("__pre").cast("double") / lit(budget.toDouble)).cast("long"))
      .drop("__pre")
  }

  /** The distributed two-phase EXCLUSIVE prefix sum both packers share:
    * adds `__pre` = Σ `weightCol` over all rows with smaller `idCol`.
    * See the object scaladoc for why this beats the global-window
    * formulation at scale. */
  private def withExclusivePrefix(df: DataFrame, idCol: String, weightCol: String,
                                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val reserved = Seq("__bucket", "__bw", "__boff", "__pre")
    val hits = reserved.filter(df.columns.contains)
    require(hits.isEmpty,
      s"prefix-sum packing uses reserved working columns already present in the input: $hits")

    val bucket = floor(col(idCol).cast("double") / lit(bucketWidth.toDouble)).cast("long")

    // Phase 1: per-bucket totals — tiny relation, map-side combinable.
    val totals = df.groupBy(bucket.as("__bucket"))
      .agg(sum(col(weightCol).cast("long")).as("__bw"))
    // Running offset over the bucket relation only (n/bucketWidth rows —
    // the deliberate, bounded use of a global window).
    val offW = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__boff", coalesce(sum(col("__bw")).over(offW), lit(0L)))
      .select("__bucket", "__boff")

    // Phase 2: within-bucket exclusive running sum, parallel per bucket.
    val inW = Window.partitionBy("__bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__bucket", bucket)
      .join(broadcast(offsets), "__bucket")
      .withColumn("__pre",
        col("__boff") + coalesce(sum(col(weightCol).cast("long")).over(inW), lit(0L)))
      .drop("__bucket", "__boff")
  }

  /** Concat-and-chunk sequence packing — the LM-training data step:
    * every document's token-id sequence (plus one `eosId` separator)
    * is concatenated in `idCol` order into one global token stream,
    * which is then cut into fixed-length training sequences of
    * `seqLen` ids (`seq_idx` ascending, last sequence ragged).
    * Documents are never reordered and never split across a boundary
    * inconsistently — token `g` of the stream lands in sequence
    * `g div seqLen` at offset `g mod seqLen`, exactly the
    * deterministic layout a packed pre-training corpus uses.
    *
    * Output: (seq_idx, tokens, n_tokens) with `tokens` the ordered id
    * array.
    *
    * Scale shape: per-document lengths feed the same two-phase
    * distributed prefix sum as [[packShards]] (no global window over
    * the corpus); the explode emits (global-pos, id) pairs that
    * shuffle ONCE on seq_idx; sequence assembly is the array_sort ∘
    * collect_list struct pattern (never collect_list order). Nothing
    * reaches the driver. */
  def packSequences(ids: DataFrame, seqLen: Int, eosId: Int = -1,
                    idCol: String = "doc_id", tokenCol: String = "token_ids",
                    bucketWidth: Long = 4096L): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val withEos = ids.select(col(idCol),
        concat(col(tokenCol), array(lit(eosId))).as("__toks"))
      .withColumn("__len", size(col("__toks")).cast("long"))
    val pre = withExclusivePrefix(withEos, idCol, "__len", bucketWidth)
    pre
      .select(col("__pre"), posexplode(col("__toks")).as(Seq("__p", "__tid")))
      .withColumn("__gpos", col("__pre") + col("__p"))
      // __gpos < 2⁵³ so the double floor-div path is exact
      .withColumn("seq_idx",
        floor(col("__gpos").cast("double") / lit(seqLen.toDouble)).cast("long"))
      .withColumn("__sp", col("__gpos") % seqLen)
      .groupBy("seq_idx")
      .agg(
        transform(array_sort(collect_list(struct(col("__sp"), col("__tid")))),
          x => x("__tid")).as("tokens"),
        count(lit(1)).as("n_tokens"))
  }

  /** Length-bucketed INFERENCE batching: group documents of similar
    * token length into fixed-size batches so each batch pads to its
    * own max length instead of the global max — the padding-waste
    * minimization every batched-inference / dynamic-batching server
    * performs. Documents land in length bucket `len div bucketWidth`;
    * within a bucket they batch `batchSize` at a time in (len DESC,
    * id) order (longest-first keeps each batch's max tight). Emits
    * per-batch stats incl. `pad_waste` = batch_max·n − Σlen, the
    * quantity the bucketing minimizes.
    *
    * Scale shape: one keyed window PARTITIONED BY the length bucket
    * (parallel across buckets, never a global sort) + one (bucket,
    * batch) aggregation — all exact integers, replayable verbatim. */
  def lengthBatches(df: DataFrame, lenCol: String, idCol: String,
                    bucketWidth: Long = 16L, batchSize: Int = 8): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val len = col(lenCol).cast("long")
    val bucketed = df.select(col(idCol).as("__id"), len.as("__len"))
      .withColumn("__bkt", floor(col("__len") / bucketWidth).cast("long"))
    val w = Window.partitionBy("__bkt")
      .orderBy(col("__len").desc, col("__id"))
    bucketed
      .withColumn("__batch",
        floor((row_number().over(w) - 1).cast("double") / batchSize).cast("long"))
      .groupBy(col("__bkt").as("bucket"), col("__batch").as("batch"))
      .agg(count(lit(1)).as("n_docs"),
        max("__len").as("max_len"),
        sum("__len").as("sum_len"))
      .select(col("bucket"), col("batch"), col("n_docs"), col("max_len"),
        (col("max_len") * col("n_docs") - col("sum_len")).as("pad_waste"))
  }
}
