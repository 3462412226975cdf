package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** SQL execution + result fetch.
  *
  * Parity surface (reference: locopy/database.py:131-257):
  *   - `execute(sql, params)`  — run arbitrary SQL with optional
  *     parameter binding; the reference forwards `%s`/qmark params to the
  *     DB-API driver (locopy/database.py:150-152,173-176). Spark 3.4+
  *     parameterized SQL gives the same injection-safe binding natively.
  *   - `columnNames` — lowercase column names (locopy/database.py:192-205).
  *   - `toDataFrame` — fetch into a dataframe, `size` = chunk
  *     (locopy/database.py:207-245); here results already ARE DataFrames,
  *     so `size` maps to `limit(n)` and "None if empty" maps to Option.
  *   - `toDict` — generator of row-maps (locopy/database.py:247-257) →
  *     `toLocalIterator` of Map.
  *
  * Timing log parity: the reference logs wall-clock per statement
  * (locopy/database.py:169,182-188); we do the same at INFO level.
  */
final class Exec(val spark: SparkSession) {

  @volatile private var last: Option[DataFrame] = None

  /** Shared execution wrapper: error taxonomy (GraftError passes
    * through unwrapped, anything else wraps in ExecError exactly once),
    * per-statement wall-clock log (reference parity,
    * locopy/database.py:169,182-188), and cursor (`last`) update —
    * one body so the named and positional forms cannot drift. */
  private def runTimed(sql: String)(body: => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    try {
      val df = body
      last = Some(df)
      df
    } catch {
      case e: GraftError => throw e
      case e: Throwable  => throw new ExecError(s"error executing SQL: ${e.getMessage}", e)
    } finally {
      val secs = (System.nanoTime() - t0) / 1e9
      // nextOption: an empty SQL string has an empty linesIterator, and
      // a next() here would supersede the in-flight ExecError
      val head = sql.linesIterator.nextOption().getOrElse("")
      org.slf4j.LoggerFactory.getLogger(getClass).info(f"executed in $secs%.3f s: $head")
    }
  }

  /** Run SQL, keeping the (lazy) result as the "open cursor". Named
    * parameters bind via Spark parameterized SQL: `execute("... WHERE x
    * > :lo", Map("lo" -> 5))`. */
  def execute(sql: String, params: Map[String, Any] = Map.empty): DataFrame =
    runTimed(sql) {
      if (params.isEmpty) spark.sql(sql) else spark.sql(sql, params)
    }

  /** Batch form (reference `execute(sql, params, many=True)` →
    * `cursor.executemany`, locopy/database.py:150-166): run the same
    * parameterized statement once per parameter map — the reference's
    * bulk-INSERT path. Statements run eagerly in order (Spark DML
    * commands execute on `sql()`); returns the last result, which
    * stays fetchable via `toDataFrame`/`toDict` like any execute.
    *
    * Reference-parity notes:
    *  - an EMPTY parameter sequence is a no-op (DB-API executemany with
    *    an empty seq executes nothing); the "cursor" keeps its previous
    *    result (an empty relation if no statement ran yet).
    *  - DOCUMENTED DIVERGENCE: statements before a failing one have
    *    already executed and are NOT rolled back — Spark DML commands
    *    are auto-committed per statement, there is no transaction to
    *    abort (the reference inherits whatever transactionality its
    *    DB-API connection has).
    *
    * Note this is the row-at-a-time API-parity path for small batches
    * (the reference itself routes bulk data through COPY, not
    * executemany); large loads belong on [[graft.io.Load]] /
    * [[graft.io.Insert]], which write distributed. */
  def executeMany(sql: String, paramSeq: Seq[Map[String, Any]]): DataFrame = {
    if (paramSeq.isEmpty) last.getOrElse(spark.emptyDataFrame)
    else paramSeq.map(execute(sql, _)).last
  }

  /** Positional (qmark-style) batch form — same contract as the named
    * form above (empty seq = no-op; no cross-statement rollback). */
  def executeMany(sql: String, paramSeq: Seq[Seq[Any]])(implicit d: DummyImplicit): DataFrame = {
    if (paramSeq.isEmpty) last.getOrElse(spark.emptyDataFrame)
    else paramSeq.map(execute(sql, _)).last
  }

  /** Positional-parameter form (reference qmark style). Same error
    * taxonomy, timing log, and cursor (`last`) behavior as the named
    * form (shared [[runTimed]] body). */
  def execute(sql: String, params: Seq[Any]): DataFrame =
    runTimed(sql) {
      spark.sql(sql, params.toArray.asInstanceOf[Array[_]])
    }

  /** Lowercased column names of the last result (reference lowercases on
    * fetch, locopy/database.py:192-205). */
  def columnNames(): Seq[String] =
    last.map(_.schema.fieldNames.toSeq.map(_.toLowerCase)).getOrElse(Seq.empty)

  /** Last result as a DataFrame with lowercased columns; None if no
    * statement ran or result is empty (reference returns None on empty,
    * locopy/database.py:236). `size` = fetchmany(n). */
  def toDataFrame(size: Option[Int] = None): Option[DataFrame] =
    last.map { df0 =>
      val lowered = df0.toDF(df0.columns.map(_.toLowerCase).toIndexedSeq: _*)
      size.fold(lowered)(lowered.limit)
    }.filter(!_.isEmpty)

  /** Row-map iterator over the last result (reference to_dict generator,
    * locopy/database.py:247-257). Streams partition-by-partition; never
    * materializes the full result on the driver. */
  def toDict(): Iterator[Map[String, Any]] =
    last match {
      case None => Iterator.empty
      case Some(df) =>
        val names = df.schema.fieldNames.map(_.toLowerCase)
        df.toLocalIterator().asInstanceOf[java.util.Iterator[Row]]
          .asScala0
          .map(r => names.zip(r.toSeq).toMap)
    }

  private implicit class JIter[T](it: java.util.Iterator[T]) {
    def asScala0: Iterator[T] = new Iterator[T] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}
