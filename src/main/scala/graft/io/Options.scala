package graft.io

import graft.core.OptionError

/** Translation of the reference's COPY / file-format option vocabularies
  * into Spark reader/writer options.
  *
  * The reference has two vocabularies:
  *   - Redshift COPY options, free-form strings with injected defaults
  *     `DATEFORMAT 'auto'`, `COMPUPDATE ON`, `TRUNCATECOLUMNS` unless
  *     overridden, skipped entirely for PARQUET (reference:
  *     locopy/redshift.py:47-90,219-222) and `IGNOREHEADER [AS] n`
  *     parsing with a duplicate-option error (locopy/utility.py:511-537).
  *   - Snowflake per-format whitelists (csv/json/parquet) validated
  *     before use, raising on unknown keys (locopy/snowflake.py:39-91,
  *     314-317).
  *
  * We keep both behaviors: known options translate to Spark equivalents,
  * unknown options raise a typed [[OptionError]] (matching the
  * reference's ValueError), and defaults are injected unless overridden.
  */
object Options {

  sealed trait Format { def spark: String }
  case object Csv extends Format { val spark = "csv" }
  case object Json extends Format { val spark = "json" }
  case object Parquet extends Format { val spark = "parquet" }

  def formatOf(name: String): Format = name.trim.toLowerCase match {
    case "csv" | "text" | "delimited" => Csv
    case "json"                       => Json
    case "parquet"                    => Parquet
    case other => throw new OptionError(s"Invalid file_type. Expected csv, json or parquet; got $other")
  }

  /** Parse `IGNOREHEADER [AS] n` from a copy-options list (reference:
    * locopy/utility.py:511-537). Error on duplicates, like the
    * reference's LocopyIgnoreHeaderError. */
  def ignoreHeaderNumber(copyOptions: Seq[String]): Option[Int] = {
    val re = "(?i)^IGNOREHEADER(\\s+AS)?\\s+(\\d+)$".r
    val hits = copyOptions.flatMap {
      case re(_, n) => Some(n.toInt)
      case _        => None
    }
    if (hits.size > 1)
      throw new OptionError(s"Found more than one IGNOREHEADER in the options: $hits")
    hits.headOption
  }

  /** Reference key → Spark reader-option translation for CSV loads.
    * Covers the union of the Redshift copy options the reference
    * defaults/tests (locopy/redshift.py:47-90) and the Snowflake csv
    * whitelist (locopy/snowflake.py:41-59). */
  private val csvRead: Map[String, (String, String => String)] = Map(
    "delimiter" -> ("sep", identity),
    "field_delimiter" -> ("sep", identity),
    // Spark CSV has no "skip n lines" option: n=0 is a no-op, n=1 is
    // exactly the header option (with an explicit schema Spark skips the
    // line; without one it feeds inference, same as IGNOREHEADER on a
    // headered file). n>1 has no distributed-safe Spark mapping, so it
    // raises rather than silently ingesting header rows as data.
    "skip_header" -> ("header", v => v.trim match {
      case "0" => "false"
      case "1" => "true"
      case n => throw new OptionError(
        s"SKIP_HEADER $n is not supported: Spark CSV can skip only the single header line (use SKIP_HEADER 1)")
    }),
    "date_format" -> ("dateFormat", identity),
    "time_format" -> ("timestampFormat", identity),
    "timestamp_format" -> ("timestampFormat", identity),
    "compression" -> ("compression", identity),
    "record_delimiter" -> ("lineSep", identity),
    "escape" -> ("escape", identity),
    "field_optionally_enclosed_by" -> ("quote", identity),
    "null_if" -> ("nullValue", identity),
    "null" -> ("nullValue", identity),
    "encoding" -> ("encoding", identity),
    "trim_space" -> ("ignoreLeadingWhiteSpace", identity),
    "error_on_column_count_mismatch" -> ("mode", v => if (v.equalsIgnoreCase("true")) "FAILFAST" else "PERMISSIVE")
  )

  private val jsonRead: Map[String, String] = Map(
    "compression" -> "compression",
    "date_format" -> "dateFormat",
    "time_format" -> "timestampFormat",
    "timestamp_format" -> "timestampFormat",
    "allow_duplicate" -> "allowDuplicateJsonKeys", // nearest Spark analog
    "strip_outer_array" -> "multiLine",
    "encoding" -> "encoding"
  )

  private val parquetRead: Set[String] = Set("binary_as_text", "compression")

  /** Validate + translate a reference-style options map for `format`.
    * Unknown keys raise [[OptionError]] exactly like the reference
    * (locopy/snowflake.py:314-317). Returns Spark reader options. */
  def translateRead(format: Format, opts: Map[String, String]): Map[String, String] = {
    val lower = opts.map { case (k, v) => k.toLowerCase -> v }
    format match {
      case Csv =>
        val mapped = lower.map { case (k, v) =>
          csvRead.get(k) match {
            case Some((sk, f)) => sk -> f(v)
            case None          => throw new OptionError(s"Invalid format option $k for csv")
          }
        }
        // Snowflake semantics: FIELD_OPTIONALLY_ENCLOSED_BY fields may
        // contain record delimiters — Spark needs multiLine for that
        // (costs file-splittability; only paid when enclosure is on)
        if (lower.contains("field_optionally_enclosed_by"))
          mapped + ("multiLine" -> "true")
        else mapped
      case Json =>
        lower.map { case (k, v) =>
          jsonRead.get(k) match {
            case Some(sk) => sk -> v
            case None     => throw new OptionError(s"Invalid format option $k for json")
          }
        }
      case Parquet =>
        lower.foreach { case (k, _) =>
          if (!parquetRead(k)) throw new OptionError(s"Invalid format option $k for parquet")
        }
        Map.empty
    }
  }

  /** Default injection parity: the reference adds DATEFORMAT 'auto' /
    * COMPUPDATE ON / TRUNCATECOLUMNS unless the caller set them, and
    * skips all defaults for parquet (locopy/redshift.py:47-90,219-222).
    * Spark-side: permissive parsing is the analog of DATEFORMAT auto;
    * COMPUPDATE has no local meaning; TRUNCATECOLUMNS is a post-read
    * projection handled in Load. */
  def withDefaults(format: Format, sparkOpts: Map[String, String]): Map[String, String] =
    format match {
      case Parquet => sparkOpts
      case _ =>
        val defaults = Map("mode" -> "PERMISSIVE")
        defaults ++ sparkOpts
    }
}
