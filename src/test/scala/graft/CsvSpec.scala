package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine
import graft.sources.Csv

/** S1 CSV extractor parity (FIXTURES.md §B category-equivalents of the
  * reference's test/data/csv fixtures): all-strings scan + exosql's
  * dynamic coercion inside expressions (SURVEY.md §1.3). */
class CsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val engine = new Engine(spark)
  private def fixtureDir = getClass.getResource("/csv").getPath

  test("csv dir registers one all-strings table per file") {
    val tables = Csv.registerDir(spark, fixtureDir)
    assert(tables == Seq("products", "purchases", "readings", "users"))
    val schema = spark.table("products").schema
    assert(schema.fields.forall(_.dataType.typeName == "string"),
      "exosql CSV scan carries no types — every column must be string")
  }

  test("exosql permissive coercion: unparseable strings → NULL, not errors") {
    Csv.registerDir(spark, fixtureDir)
    // readings.value holds 'oops' and '' — ANSI mode would raise on the
    // implicit string→double casts; CsvCoercion flips them to TRY casts
    // for CSV-tagged columns, so junk parses to NULL and drops out
    val rows = engine.query(
      """SELECT sensor, value * 2 AS doubled FROM readings
         WHERE value > 0.0 ORDER BY sensor""").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "e", "g"))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(3.0, 4.5, 24.0))
  }

  test("coercion stays scoped: typed tables keep ANSI cast errors") {
    Tables.registerAll(spark, TestSpark.sf)
    val e = intercept[Exception] {
      spark.sql("SELECT c_custkey + 'oops' FROM customer LIMIT 1").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cast") ||
      e.getCause != null, s"expected an ANSI cast failure, got: ${e.getMessage}")
  }

  test("jsonl with supplied schema keeps corrupt lines filterable") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toFile
    val f = new java.io.File(dir, "mixed.jsonl")
    java.nio.file.Files.writeString(f.toPath,
      """{"id": 1, "text": "ok"}
        |this line is not json
        |{"id": 3, "text": "also ok"}
        |""".stripMargin)
    try {
      val schema = StructType(Seq(StructField("id", LongType), StructField("text", StringType)))
      // cache before filtering on the corrupt column: Spark refuses raw
      // scans whose only referenced column is _corrupt_record
      val df = sources.Jsonl.table(spark, f.getPath, Some(schema)).cache()
      try {
        // the corrupt-record column is appended to the supplied schema,
        // so bad docs are FILTERABLE, not silent all-null rows
        assert(df.columns.contains(sources.Jsonl.CorruptCol))
        val corrupt = org.apache.spark.sql.functions.col(sources.Jsonl.CorruptCol)
        assert(df.filter(corrupt.isNull).count() == 2)
        assert(df.filter(corrupt.isNotNull).count() == 1)
      } finally df.unpersist()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("dynamic coercion: string columns in arithmetic and comparisons") {
    Csv.registerDir(spark, fixtureDir)
    // price is a STRING; exosql coerces per-expression — to_number here
    val rows = engine.query(
      """SELECT name, to_number(price) * 2 AS double_price
         FROM products WHERE to_number(price) > 1.0 ORDER BY name""").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("donut", "gadget", "widget"))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(3.0, 20.0, 4.5))
    // implicit string→number comparison (Spark coerces like exosql here)
    assert(engine.query("SELECT count(*) AS n FROM products WHERE stock > 0")
      .head().getLong(0) == 3)
  }

  test("the reference's canonical join+group test shape over CSVs") {
    Csv.registerDir(spark, fixtureDir)
    val rows = engine.query(
      """SELECT u.name, count(*) AS n_purchases,
                CAST(sum(to_number(p.amount)) AS BIGINT) AS total_items
         FROM users u
         INNER JOIN purchases p ON u.id = p.user_id
         GROUP BY u.name ORDER BY u.name""").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("alice", 2L, 3L), ("bob", 2L, 5L), ("carol", 1L, 10L)))
  }

  test("cross-source federation: csv table joined to parquet table") {
    Csv.registerDir(spark, fixtureDir)
    Tables.registerAll(spark, TestSpark.sf)
    // csv users joined against the parquet customer table by position-ish id
    val n = engine.query(
      """SELECT count(*) AS n FROM users u
         JOIN customer c ON to_number(u.id) = c.c_custkey""").head().getLong(0)
    assert(n == 3)
  }
}
