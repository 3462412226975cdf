package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Config, CredentialsError, Session}

/** Connection-config YAML parity — mirrors the reference's
  * read_config_yaml tests (tests/test_utility.py:240-262) and the
  * .locopyrc fixture shape (tests/data/.locopyrc). */
class ConfigSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val goodYaml =
    """# connection config (reference .locopyrc shape)
      |host: my.redshift.cluster.com
      |port: 1234
      |database: db
      |user: userid
      |password: "pass"
      |profile: MY_AWS_PROFILE  # trailing comment
      |""".stripMargin

  test("read_config_yaml: file form parses keys, ints, quotes, comments") {
    val f = java.nio.file.Files.createTempFile("graftrc", ".yml")
    java.nio.file.Files.writeString(f, goodYaml)
    val cfg = Config.readConfigYaml(f.toString)
    assert(cfg.keySet == Set("host", "port", "database", "user", "password", "profile"))
    assert(cfg("host") == "my.redshift.cluster.com")
    assert(cfg("port") == 1234) // coerced Int, like yaml.safe_load
    assert(cfg("database") == "db")
    assert(cfg("user") == "userid")
    assert(cfg("password") == "pass") // quotes stripped
    assert(cfg("profile") == "MY_AWS_PROFILE") // comment stripped
    java.nio.file.Files.delete(f)
  }

  test("read_config_yaml: string form (reference open-file-pointer form)") {
    val cfg = Config.readConfigYamlString(goodYaml)
    assert(cfg("port") == 1234 && cfg("host") == "my.redshift.cluster.com")
  }

  test("read_config_yaml: missing file raises CredentialsError") {
    intercept[CredentialsError] {
      Config.readConfigYaml("/nonexistent/file_that_does_not_exist.yml")
    }
  }

  test("read_config_yaml: malformed line raises CredentialsError") {
    intercept[CredentialsError] {
      Config.readConfigYamlString("host: ok\nnot a key value line\n")
    }
  }

  test("read_config_yaml: '#' without preceding whitespace is not a comment (yaml rule)") {
    val cfg = Config.readConfigYamlString("password: p#ss\nkey2: v  # real comment\n")
    assert(cfg("password") == "p#ss")
    assert(cfg("key2") == "v")
  }

  test("buildFromYaml: reference .locopyrc credential keys are ignored, not USEd") {
    val f = java.nio.file.Files.createTempFile("graftrc_build", ".yml")
    java.nio.file.Files.writeString(f, goodYaml) // database: db — no such namespace
    val before = spark.catalog.currentDatabase
    val s2 = Session.buildFromYaml(f.toString) // must not throw
    assert(s2.catalog.currentDatabase == before)
    java.nio.file.Files.delete(f)
  }

  test("useContext: database maps to current catalog namespace; warehouse is a logged no-op") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ctx_db")
    val before = spark.catalog.currentDatabase
    try {
      Session.useContext(spark,
        warehouse = Some("COMPUTE_WH"), database = Some("graft_ctx_db"))
      assert(spark.catalog.currentDatabase == "graft_ctx_db")
      intercept[graft.core.ExecError] {
        Session.useContext(spark, schema = Some("graft_ctx_nope"))
      }
    } finally {
      spark.catalog.setCurrentDatabase(before)
      spark.sql("DROP DATABASE IF EXISTS graft_ctx_db")
    }
  }
}
