package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column profiling for data-quality gates: per-column row/null counts
  * and numeric summary statistics, the pre-flight check a pipeline runs
  * before admitting a new partition of data (nulls spiked? a column
  * collapsed to a constant? value range drifted?).
  *
  * Scale shape: ONE aggregation pass computes every statistic for every
  * requested column together (6·|cols| aggregates in a single
  * map-side-combinable HashAggregate over one scan — not |cols| passes),
  * yielding a single bounded row that is unpivoted driver-side. The
  * reference has no profiling surface; this is north-star breadth.
  */
object Profile {

  /** Portable row rendering for the hash contracts below: '|'-joined
    * CAST-AS-STRING values with NULL made explicit as a NUL-prefixed
    * sentinel — concat_ws silently DROPS null elements, so without the
    * sentinel distinct rows collide on null placement ((a, NULL) vs
    * (NULL, a); ('x', NULL, 'y') vs ('x', 'y', NULL)). */
  private def renderRow(cols: Seq[String]) =
    concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000null"))): _*)

  /** ORDER-INDEPENDENT table checksum — the "did the copy round-trip
    * intact" integrity gate a load/unload pipeline runs on both ends:
    * every row hashes to a portable 60-bit md5 value over its
    * '|'-joined columns, and the table digest is (row count, bit-XOR
    * of row hashes, min hash, max hash). XOR/min/max commute, so the
    * digest is identical under any partitioning, ordering, or
    * shuffle — comparing source and destination digests needs no sort
    * and no row movement. (A sum-of-hashes digest would overflow
    * BIGINT differently across engines — Spark wraps, DuckDB widens
    * to HUGEINT — so the digest sticks to closed-over-BIGINT
    * aggregates.) Column values are rendered with CAST AS
    * STRING; restrict `cols` to integer/string/date columns (double
    * formatting is not portable across engines). NULL renders as the
    * explicit sentinel `"\u0000null"` (NUL-prefixed so no real string
    * value can collide with it): concat_ws would otherwise SKIP null
    * elements entirely, making (a, NULL) and (NULL, a) hash-equal.
    * DuckDB replay: `coalesce(CAST(c AS VARCHAR), chr(0) || 'null')`.
    *
    * Scale shape: one codegen'd projection + a single 3-aggregate
    * reduction — one scan, a few bytes to the driver. */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableChecksum requires at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in dataframe: $missing")
    val h = graft.functions.md5Hash60(renderRow(cols))
    df.select(h.as("h"))
      .agg(count(lit(1)).as("n_rows"),
        bit_xor(col("h")).as("xor_hash"),
        min(col("h")).as("min_hash"),
        max(col("h")).as("max_hash"))
  }

  /** Bucketed merkle-style integrity digest — [[tableChecksum]]'s
    * divide-and-conquer sibling: rows hash into `buckets` leaves by
    * their own hash value, each leaf folds to an order-independent
    * (n, xor, min, max) digest summarized as one md5, and the root
    * md5 chains the leaf digests in bucket order. Two mismatching
    * tables localize to the differing leaf in one exchange instead of
    * a full re-scan — the 100 TB "which shard drifted" primitive.
    * Everything commutes inside a leaf, so the digest is partitioning-
    * and shuffle-invariant like the flat checksum. */
  def merkleChecksum(df: DataFrame, cols: Seq[String],
                     buckets: Int = 16): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val h = graft.functions.md5Hash60(renderRow(cols))
    val leaf = df.select(h.as("h"))
      .withColumn("bucket", pmod(col("h"), lit(buckets.toLong)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("h")).as("xor_hash"),
        min(col("h")).as("min_hash"), max(col("h")).as("max_hash"))
      .withColumn("leaf_md5", md5(concat_ws(":",
        col("bucket").cast("string"), col("n_rows").cast("string"),
        col("xor_hash").cast("string"), col("min_hash").cast("string"),
        col("max_hash").cast("string"))))
    val root = leaf
      .agg(sort_array(collect_list(struct(col("bucket"), col("leaf_md5"))))
        .as("ls"))
      .select(md5(concat_ws("|",
        expr("transform(ls, x -> x.leaf_md5)"))).as("root_md5"))
    leaf.crossJoin(broadcast(root))
      .select("bucket", "n_rows", "xor_hash", "leaf_md5", "root_md5")
  }

  /** Long-form numeric profile: one output row per column —
    * (column, n, n_nulls, min, max, mean, stddev). Non-numeric columns
    * are accepted (min/max/mean cast to double; strings yield nulls in
    * the numeric slots but keep counts). */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "describe requires at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in dataframe: $missing")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        avg(col(c).cast("double")).as(s"${c}__mean"),
        stddev_samp(col(c).cast("double")).as(s"${c}__std"))
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head() // ONE bounded row
    def d(i: Int): Option[Double] =
      if (row.isNullAt(i)) None else Some(row.getDouble(i))
    val out = cols.zipWithIndex.map { case (c, i) =>
      val b = i * 6
      (c, row.getLong(b), Option(row.get(b + 1)).fold(0L)(_.asInstanceOf[Long]),
        d(b + 2), d(b + 3), d(b + 4), d(b + 5))
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("column", "n", "n_nulls", "min", "max", "mean", "stddev")
  }

  /** Key-skew profile: the distribution of per-key group sizes —
    * (group_size, n_keys) — the number every join/agg planner wants
    * before picking salting or AQE skew handling (one hot key at 10⁷
    * rows reads completely differently from 10⁷ keys at one row, and
    * a mean group size hides exactly that). Two keyed aggregations;
    * the second input is key-cardinality-sized, the output
    * distinct-size-sized. Exact integers — fully hash-oracle-able. */
  def keySkew(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keySkew requires at least one key column")
    val missing = keyCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in dataframe: $missing")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("group_size"))
      .groupBy("group_size").agg(count(lit(1)).as("n_keys"))
  }

  /** Data-quality expectation report — the declarative admission gate
    * a pipeline runs before accepting a batch (the rule-based sibling
    * of [[describe]]): each rule is (name, VIOLATION predicate), plus
    * optional per-column uniqueness expectations; the result is one
    * row per rule with its violation count and pass flag.
    *
    * Three-valued-logic contract (deliberate): a rule whose predicate
    * evaluates to NULL on a row does NOT count that row as violated —
    * SQL range/domain predicates are silently null on null inputs, so
    * null-sensitivity must be expressed as its own explicit rule
    * (`c.isNull`, as the dq_expectations fixture does). This matches
    * the warehouse CHECK-constraint convention (NULL passes).
    *
    * Scale shape: ONE aggregation pass evaluates every rule together
    * (a conditional sum per rule + a count-distinct per uniqueness
    * column in a single map-side-combinable agg over one scan), one
    * bounded row unpivoted driver-side. */
  def expect(
      df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)],
      uniqueCols: Seq[String] = Nil
  ): DataFrame = {
    require(rules.nonEmpty || uniqueCols.nonEmpty,
      "expect requires at least one rule or unique column")
    val missing = uniqueCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"unique columns not in dataframe: $missing")
    val aggs =
      count(lit(1)).as("__n") +:
      (rules.map { case (name, violation) =>
        sum(when(violation, 1L).otherwise(0L)).as(s"__r_$name")
      } ++ uniqueCols.map(c => countDistinct(col(c)).as(s"__u_$c")))
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head() // ONE bounded row
    val n = row.getLong(0)
    val out =
      rules.zipWithIndex.map { case ((name, _), i) =>
        val v = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
        (name, n, v, v == 0L)
      } ++ uniqueCols.zipWithIndex.map { case (c, i) =>
        val v = n - row.getLong(1 + rules.size + i)
        (s"${c}_unique", n, v, v == 0L)
      }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("rule", "n_rows", "n_violations", "pass")
  }

  /** Referential-integrity expectations — the FK gate [[expect]]'s
    * single-table aggregation pass cannot express. Each rule
    * `(name, fkCol, ref, refCol)` counts the rows of `df` whose
    * foreign key has no match in `ref.refCol`; a NULL foreign key
    * never matches and therefore violates (a nullable-FK policy is
    * expressed by pre-filtering `df`). Output schema matches
    * [[expect]] so callers union the two reports.
    *
    * Scale shape: one LEFT ANTI join per rule against the DISTINCT
    * reference keys — the reference side reduces to its key set first
    * (dimension-sized, broadcast when small), the fact side streams
    * through the join and only orphans are counted. Nothing fact-sized
    * is ever collected or broadcast. */
  def expectRefs(df: DataFrame,
      refs: Seq[(String, String, DataFrame, String)]): DataFrame = {
    require(refs.nonEmpty, "expectRefs requires at least one rule")
    val n = df.count()
    val out = refs.map { case (name, fkCol, ref, refCol) =>
      val viol = df.select(col(fkCol))
        .join(ref.select(col(refCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
        .count()
      (name, n, viol, viol == 0L)
    }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("rule", "n_rows", "n_violations", "pass")
  }

  /** Keyed table diff — the row-level complement of [[tableChecksum]]
    * (the checksum says two versions DIFFER; the diff says WHERE):
    * given two versions of a keyed table, emit one row per key whose
    * state changed, tagged `added` (key only in `newDf`), `deleted`
    * (only in `oldDf`) or `changed` (present in both, compared columns
    * differ) — the reconciliation primitive behind CDC audits,
    * migration sign-offs and replication monitoring.
    *
    * Comparison is by the same portable 60-bit md5 row hash the
    * checksum uses (same CAST-AS-STRING rendering contract: keep
    * `compareCols` to integer/string/date columns), so a diff-of-zero
    * and checksum equality agree by construction.
    *
    * Scale shape: two map-side hash projections + ONE keyed full outer
    * join on the key columns — no broadcast of either version, output
    * bounded by the changed-key count, unchanged keys never leave the
    * join. */
  def diffByKey(oldDf: DataFrame, newDf: DataFrame,
                keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diffByKey requires at least one key column")
    require(compareCols.nonEmpty, "diffByKey requires at least one compare column")
    def hashed(df: DataFrame, h: String) = {
      val missing = (keyCols ++ compareCols).filterNot(df.columns.contains)
      require(missing.isEmpty, s"columns not in dataframe: $missing")
      df.select(keyCols.map(col) :+
        graft.functions.md5Hash60(renderRow(compareCols)).as(h): _*)
    }
    val o = hashed(oldDf, "__oh")
    val n = hashed(newDf, "__nh")
    o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__oh").isNull, lit("added"))
          .when(col("__nh").isNull, lit("deleted"))
          .when(col("__oh") =!= col("__nh"), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) :+ col("change_type"): _*)
  }

  /** Schema diff between two relations (the metadata sibling of
    * [[diffByKey]]): one row per column that was added, removed, or
    * changed type, with the old/new type names — what a pipeline runs
    * before deciding whether a schema evolution is additive-safe.
    * Pure analysis: the plans are never executed; the result is a
    * bounded local relation built from the two schemas. */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val spark = oldDf.sparkSession
    import spark.implicits._
    val o = oldDf.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val n = newDf.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val rows = (o.keySet ++ n.keySet).toSeq.sorted.flatMap { c =>
      (o.get(c), n.get(c)) match {
        case (None, Some(nt))           => Some((c, null: String, nt, "added"))
        case (Some(ot), None)           => Some((c, ot, null: String, "removed"))
        case (Some(ot), Some(nt)) if ot != nt =>
          Some((c, ot, nt, "type_changed"))
        case _                          => None
      }
    }
    rows.toDF("column", "old_type", "new_type", "status")
  }
}
