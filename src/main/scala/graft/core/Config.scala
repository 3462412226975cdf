package graft.core

import scala.io.Source

/** Connection-config YAML parsing.
  *
  * Parity surface (reference: locopy/utility.py:228-266
  * `read_config_yaml`, fixture `tests/data/.locopyrc`, test shapes
  * `tests/test_utility.py:240-262`): every README example passes
  * `config_yaml=` with a FLAT key: value map
  * (host/port/database/user/password/profile, or
  * account/warehouse/database/schema for Snowflake), so a
  * dependency-free single-level parser covers the whole referenced
  * surface — comments, blank lines, quoted strings, and scalar
  * coercion (`port: 5439` → Int, `true`/`false` → Boolean), matching
  * what `yaml.safe_load` returns for these files. Unreadable or
  * malformed input raises [[CredentialsError]] like the reference.
  */
object Config {

  /** Read a flat config YAML file (reference string-path form). */
  def readConfigYaml(path: String): Map[String, Any] =
    try {
      val src = Source.fromFile(path, "UTF-8")
      try parseFlatYaml(src.getLines()) finally src.close()
    } catch {
      case e: GraftError => throw e
      case e: Throwable  => throw new CredentialsError(s"Error reading yaml: ${e.getMessage}", e)
    }

  /** Parse already-loaded YAML text (reference open-file-pointer form,
    * locopy/utility.py:258-261). */
  def readConfigYamlString(content: String): Map[String, Any] =
    parseFlatYaml(content.linesIterator)

  private def parseFlatYaml(lines: Iterator[String]): Map[String, Any] = {
    val entries = scala.collection.mutable.LinkedHashMap[String, Any]()
    for ((raw, i) <- lines.zipWithIndex) {
      val line = stripComment(raw).trim
      if (line.nonEmpty && line != "---") {
        val colon = line.indexOf(':')
        if (colon <= 0)
          throw new CredentialsError(
            s"Error reading yaml: line ${i + 1} is not a flat 'key: value' entry: ${raw.trim}")
        val key = unquote(line.substring(0, colon).trim)
        entries(key) = coerce(line.substring(colon + 1).trim)
      }
    }
    entries.toMap
  }

  /** Drop a trailing `# comment` that is not inside a quoted value.
    * YAML comments require the `#` to start the line or follow
    * whitespace — `password: p#ss` is NOT a comment and must survive
    * intact (yaml.safe_load keeps it). */
  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS  => inD = !inD
        case '#' if !inS && !inD &&
            (i == 0 || Character.isWhitespace(line.charAt(i - 1))) =>
          return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def unquote(v: String): String =
    if (v.length >= 2 &&
        ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  /** Scalar coercion matching yaml.safe_load on the reference fixtures:
    * quoted → string; integral → Int (Long when it overflows);
    * true/false → Boolean; empty → null; anything else → string. */
  private def coerce(v: String): Any = {
    if (v.isEmpty) null
    else if (v.head == '"' || v.head == '\'') unquote(v)
    else if (v == "true") true
    else if (v == "false") false
    else if (v == "null" || v == "~") null
    else
      try {
        val l = v.toLong
        if (l >= Int.MinValue && l <= Int.MaxValue) l.toInt else l
      } catch { case _: NumberFormatException => v }
  }
}
