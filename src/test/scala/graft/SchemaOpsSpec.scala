package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.SchemaOps
import graft.types.TypeMaps

/** FIXTURES.md §B.3 drifted_parts + §B.8 ddl_roundtrip. */
class SchemaOpsSpec extends SparkSpec {
  import spark.implicits._

  test("enforceSchema casts listed columns, keeps order and extras") {
    val df = Seq((1, "2.5", "x")).toDF("a", "b", "c")
    val out = SchemaOps.enforceSchema(df, StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType))))
    assert(out.schema.map(f => (f.name, f.dataType)) == Seq(
      ("a", LongType), ("b", DoubleType), ("c", StringType)))
    assert(out.head() == org.apache.spark.sql.Row(1L, 2.5, "x"))
  }

  test("applySchema reorders, lenient-casts, adds missing as NULL") {
    val df = Seq(("7", "junk", 1)).toDF("i", "ts", "extra_ignored_tail")
    val out = SchemaOps.applySchema(df, StructType(Seq(
      StructField("missing", DoubleType),
      StructField("i", IntegerType),
      StructField("ts", TimestampNTZType))))
    assert(out.columns.toSeq == Seq("missing", "i", "ts"))
    val r = out.head()
    assert(r.isNullAt(0) && r.getInt(1) == 7 && r.isNullAt(2))
  }

  test("applySchema makes drifted multi-part reads converge (FIXTURES §B.3)") {
    val target = StructType(Seq(
      StructField("id", IntegerType), StructField("v", DoubleType),
      StructField("extra", StringType)))
    val fileA = Seq((1, Some(1.5)), (2, None)).toDF("id", "v") // v double, no extra
    val fileB = Seq(("3", "2.5", "e")).toDF("id", "v", "extra") // all strings
    val out = graft.relational.RelationalOps.uniteByName(
      Seq(SchemaOps.applySchema(fileA, target), SchemaOps.applySchema(fileB, target)))
    assert(out.schema == target)
    assert(out.count() == 3)
    assert(out.where(col("v") === 2.5).select("extra").as[String].head() == "e")
  }

  test("sanitizeName strips the reference's forbidden characters") {
    assert(SchemaOps.sanitizeName("col (x), y\t{z}=w;\n") == "colxyzw")
  }

  test("ddlToStructType parses SQL Server DDL incl. decimal precision and rowversion oddity") {
    val ddl = """CREATE TABLE t (
      [id] int NOT NULL,
      [amount] decimal(12,2),
      [flag] bit,
      [when2] datetime2(7),
      [guid] uniqueidentifier,
      [rv] timestamp,
      [name (full), x] nvarchar(255),
      PRIMARY KEY (id))"""
    val st = TypeMaps.ddlToStructType(ddl)
    assert(st("id").dataType == IntegerType)
    assert(st("amount").dataType == DecimalType(12, 2))
    assert(st("flag").dataType == BooleanType)
    assert(st("when2").dataType == TimestampType)
    assert(st("guid").dataType == StringType)
    assert(st("rv").dataType == StringType) // rowversion → VARCHAR (parser.py:27-28)
    assert(st.fieldNames.contains("namefullx")) // sanitized
    assert(!st.fieldNames.exists(_.toLowerCase.startsWith("primary")))
  }

  test("structTypeToWarehouseDdl widens ints and appends loading-date audit column") {
    val ddl = TypeMaps.structTypeToWarehouseDdl(StructType(Seq(
      StructField("i", IntegerType), StructField("s", StringType))), "t")
    assert(ddl.contains("\"i\" BIGINT"))
    assert(ddl.contains("META_loading_date_utc"))
  }

  test("sqlServerToSpark maps the full palette") {
    assert(TypeMaps.sqlServerToSpark("decimal(18, 4)") == DecimalType(18, 4))
    assert(TypeMaps.sqlServerToSpark("money") == DecimalType(19, 4))
    assert(TypeMaps.sqlServerToSpark("varbinary(max)") == BinaryType)
    assert(TypeMaps.sqlServerToSpark("nvarchar(50)") == StringType)
    assert(TypeMaps.sqlServerToSpark("bigint") == LongType)
  }

  // ---- expectations gate ---------------------------------------------

  import graft.schema.Expectations
  import graft.schema.Expectations._

  private val contractDf = Seq(
    (1, Some("a"), 5.0, "1-URGENT"),
    (2, Some("b"), 150.0, "9-BOGUS"),   // range + shape violations
    (2, None, 50.0, "2-HIGH"),          // duplicate key + null
    (3, Some("zz"), -1.0, "3-MEDIUM")   // set + range violations
  ).toDF("k", "status", "price", "prio")

  test("expectations report: every rule kind counts its violations; row rules fuse into one scan") {
    val rep = Expectations.report(contractDf, Seq(
      NotNull("status"),
      InRange("price", 0, 100),
      Matches("prio", "[1-5]-.*"),
      InSet("status", Seq("a", "b")),
      Unique(Seq("k"))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rep(("not_null", "status")) == 1L)
    assert(rep(("in_range", "price")) == 2L)  // 150 and -1
    assert(rep(("matches", "prio")) == 1L)    // 9-BOGUS
    assert(rep(("in_set", "status")) == 1L)   // zz (null not counted)
    assert(rep(("unique", "k")) == 1L)        // one excess row for k=2
  }

  test("Satisfies: cross-column predicate; FALSE and NULL both violate (strict reading)") {
    val df = Seq((1, Some(5.0), 10.0), (2, Some(20.0), 10.0), (3, None, 10.0))
      .toDF("k", "lo", "hi")
    val rep = Expectations.report(df, Seq(Satisfies("lo_le_hi", "lo <= hi")))
      .head()
    assert(rep.getLong(2) == 2L) // row 2 (false) + row 3 (null predicate)
    assert(!rep.getBoolean(3))
  }

  test("expectations: clean frame passes everything, including on zero rows") {
    val clean = Seq((1, "a")).toDF("k", "v")
    assert(Expectations.report(clean, Seq(NotNull("v"), Unique(Seq("k"))))
      .where(!col("pass")).count() == 0)
    val empty = clean.where(lit(false))
    // vacuously true on an empty frame (sums coalesce to 0), not null-poisoned
    assert(Expectations.report(empty, Seq(NotNull("v"), InRange("k", 0, 10)))
      .where(!col("pass")).count() == 0)
  }

  test("reportBy: per-group counts, dense zero rows for clean unique groups") {
    val df = Seq(
      ("d1", 1, 500.0), ("d1", 1, 5.0),   // d1: dup key, one range violation
      ("d2", 2, 10.0), ("d2", 3, 20.0)    // d2: clean
    ).toDF("day", "k", "price")
    val rep = Expectations.reportBy(df, Seq("day"), Seq(
      InRange("price", 0, 100), Unique(Seq("k"))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(rep(("d1", "in_range")) == 1L)
    assert(rep(("d1", "unique")) == 1L)
    assert(rep(("d2", "in_range")) == 0L)
    assert(rep(("d2", "unique")) == 0L)   // dense: zero row present
  }

  test("requireAll throws listing the violated rules; passes silently when clean") {
    val e = intercept[IllegalStateException] {
      Expectations.requireAll(contractDf, Seq(NotNull("status"), Unique(Seq("k"))))
    }
    assert(e.getMessage.contains("not_null(status)=1"))
    assert(e.getMessage.contains("unique(k)=1"))
    Expectations.requireAll(contractDf, Seq(NotNull("k")))
  }

  test("report: rule names/targets containing quotes neither break the parse nor inject (r12 advice)") {
    // pre-fix, these spliced into a stack(...) SQL string and threw a
    // parse error; now they travel as typed lit values
    val rep = Expectations.report(contractDf, Seq(
      Satisfies("o'brien's \"rule\"", "price >= 0"),
      Matches("status", "[a-z]'{0}z?"),
      Unique(Seq("k"))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rep(("satisfies", "o'brien's \"rule\"")) == 1L) // the -1.0 price row
    assert(rep(("unique", "k")) == 1L)
    val by = Expectations.reportBy(contractDf, Seq("prio"),
      Seq(Satisfies("it's", "price >= -100")))
    assert(by.where(!col("pass")).count() == 0)
  }

  test("split: row-level partition law and per-tag counts equal report, unique excess first-wins") {
    val rules = Seq(
      InRange("price", 0, 100),
      InSet("status", Seq("a", "b")),
      Unique(Seq("k")))
    val (pass, quar) = Expectations.split(contractDf, rules,
      keepOrder = Seq(col("price")))
    // partition: pass ∪ quarantine ≡ input, nothing dropped or doubled
    assertSameRows(pass.unionByName(quar.drop("violated")), contractDf)
    // per-tag quarantine counts == report n_violations, for every rule
    val tagCounts = quar.select(explode(col("violated")).as("tag"))
      .groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rep = Expectations.report(contractDf, rules).collect()
      .map(r => s"${r.getString(0)}:${r.getString(1)}" -> r.getLong(2)).toMap
    rep.foreach { case (tag, n) =>
      assert(tagCounts.getOrElse(tag, 0L) == n, s"tag $tag")
    }
    // unique excess is deterministic first-wins by keepOrder: k=2 keeps
    // the LOWER price row (50.0), quarantines the 150.0 one — which is
    // also range-violating, so it carries both tags
    val k2q = quar.where(col("k") === 2 && col("price") === 150.0).head()
    assert(k2q.getSeq[String](k2q.fieldIndex("violated")).toSet ==
      Set("in_range:price", "unique:k"))
    // the kept k=2 row (null status, price 50) is clean for these rules
    assert(pass.where(col("k") === 2).count() == 1)
  }

  test("split: clean frame routes everything to pass; Unique without keepOrder rejected") {
    val clean = Seq((1, 5.0), (2, 6.0)).toDF("k", "price")
    val (p, q) = Expectations.split(clean, Seq(InRange("price", 0, 100)))
    assert(p.count() == 2 && q.count() == 0)
    intercept[IllegalArgumentException] {
      Expectations.split(clean, Seq(Unique(Seq("k"))))
    }
  }
}
