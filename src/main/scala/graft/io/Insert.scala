package graft.io

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.schema.{Flavor, Infer, Snowflake}

/** Dataframe → table insert with optional CREATE from inferred schema.
  *
  * Reference: `insert_dataframe_to_table` builds `CREATE TABLE` DDL from
  * inferred/caller metadata then issues batched multi-row `INSERT INTO …
  * VALUES` with SQL-literal escaping and NULL-for-NaN
  * (locopy/redshift.py:532-666; the Snowflake variant uses true
  * param-binding executemany, locopy/snowflake.py:412-512).
  *
  * Spark-side there is no row-batching problem to work around — the
  * reference's `batch_size=1000` exists only because DB-API executemany
  * is slow (locopy/redshift.py:545-547). `createDataFrame(...).write`
  * is bulk and distributed; literal escaping disappears because data
  * never round-trips through SQL text.
  */
object Insert {

  /** Insert `df` into `table`. `create=true` ⇒ create table first using
    * `metadata` if given (explicit wins, locopy/redshift.py:582-586),
    * else the inferred §1.2 lattice schema.
    *
    * `distKey` (with `create=true`) is the reference's `CREATE TABLE …
    * DISTKEY(col)` (tests/test_integration.py:103,133) mapped to a
    * bucketed+sorted Spark table — see [[Load.loadAndCopy]] for the
    * zero-Exchange join rationale. Appends into an existing bucketed
    * table via `insertInto` keep its bucketing spec (it is a property
    * of the table). */
  def insertDataFrame(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      create: Boolean = false,
      metadata: Option[StructType] = None,
      flavor: Flavor = Snowflake,
      distKey: Option[String] = None,
      buckets: Int = 8
  ): Unit = {
    require(distKey.isEmpty || create,
      "distKey only applies when creating the table (create = true); an append " +
        "inherits the existing table's bucketing — bucket the table at creation")
    val schema = metadata.getOrElse(Infer.inferSchema(df, flavor))
    val casted = Infer.applySchema(df, schema)
    if (create) {
      Load.writeTable(casted, table, SaveMode.ErrorIfExists, distKey, buckets)
    } else {
      casted.write.mode(SaveMode.Append).insertInto(table)
    }
  }

  /** Local rows → table (the reference's client-side rows path). */
  def insertRows(
      spark: SparkSession,
      rows: Seq[Row],
      schema: StructType,
      table: String,
      create: Boolean = false
  ): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), schema)
    insertDataFrame(spark, df, table, create, Some(schema))
  }
}
