package graft.types

import org.apache.spark.sql.types._

/** Cross-system type catalog + DDL ⇄ StructType bridge (SURVEY.md §1.2,
  * §1.3) — the engine-side replacement for the reference's `parser.py`.
  */
object TypeMaps {

  /** SQL Server type name → Spark DataType.
    * Reference: `src/pyveb/parser.py:55-70` (decimal precision/scale
    * preserved at `parser.py:106`); the deliberate oddity
    * `timestamp` (rowversion) → string mirrors `parser.py:27-28`.
    */
  def sqlServerToSpark(sqlType: String): DataType = {
    val t = sqlType.trim.toLowerCase
    val dec = "(?:decimal|numeric)\\s*\\(\\s*(\\d+)\\s*,\\s*(\\d+)\\s*\\)".r
    t match {
      case dec(p, s)                                    => DecimalType(p.toInt, s.toInt)
      case "decimal" | "numeric"                        => DecimalType(18, 0)
      case "bit"                                        => BooleanType
      case "tinyint" | "smallint" | "int"               => IntegerType
      case "bigint"                                     => LongType
      case "float" | "real"                             => DoubleType
      case "money" | "smallmoney"                       => DecimalType(19, 4)
      case "date"                                       => DateType
      case s if s.startsWith("datetime2") ||
                s == "datetime" || s == "smalldatetime" => TimestampType
      case "timestamp" | "rowversion"                   => StringType // rowversion, parser.py:27-28
      case "uniqueidentifier"                           => StringType
      case s if s.startsWith("varbinary") ||
                s.startsWith("binary") || s == "image"  => BinaryType
      case _                                            => StringType // [n]varchar/char/text/xml/...
    }
  }

  /** Spark DataType → Redshift-style warehouse DDL type (widening on
    * load, as the reference does: `integer→BIGINT`).
    * Reference: `src/pyveb/parser.py:39-45`.
    */
  def sparkToWarehouse(t: DataType): String = t match {
    case IntegerType | LongType | ShortType | ByteType => "BIGINT"
    case DoubleType | FloatType                        => "DOUBLE PRECISION"
    case d: DecimalType                                => s"DECIMAL(${d.precision},${d.scale})"
    case BooleanType                                   => "BOOLEAN"
    case DateType                                      => "DATE"
    case TimestampType | TimestampNTZType              => "TIMESTAMP"
    case _                                             => "VARCHAR(65535)"
  }

  private val TypePart =
    "([a-zA-Z0-9]+(?:\\s*\\(\\s*[0-9]+(?:\\s*,\\s*[0-9]+)?\\s*\\)|\\s*\\(\\s*max\\s*\\))?)"
  // bracketed names may contain spaces/commas/parens: [name (full), x]
  private val BracketedDef = ("^\\s*\\[([^\\]]+)\\]\\s+" + TypePart).r
  private val ColumnDef = ("^\\s*([^\\s\\]\\[]+)\\s+" + TypePart).r

  /** Parse a `CREATE TABLE` DDL body into a StructType, sanitizing
    * column names the way the reference does (strip ` (),;{}\n\t=`,
    * `parser.py:78,103`). Constraint lines (PRIMARY KEY / CONSTRAINT /
    * FOREIGN KEY / INDEX) are skipped.
    * Reference: `sql_ddl_to_pyspark` `src/pyveb/parser.py:88-118`.
    */
  def ddlToStructType(ddl: String): StructType = {
    val body = {
      val start = ddl.indexOf('(')
      val end = ddl.lastIndexOf(')')
      require(start >= 0 && end > start, "ddlToStructType: no (...) column block")
      ddl.substring(start + 1, end)
    }
    // split on commas not inside parentheses or [bracketed names]
    // (decimal(12,2) and [col, weird] stay whole)
    val parts = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var depth = 0
      body.foreach {
        case c @ ('(' | '[') => depth += 1; sb.append(c)
        case c @ (')' | ']') => depth -= 1; sb.append(c)
        case ',' if depth == 0 => out += sb.toString; sb.clear()
        case ch => sb.append(ch)
      }
      if (sb.nonEmpty) out += sb.toString
      out.toSeq
    }
    val skip = Set("primary", "constraint", "foreign", "unique", "index", "check")
    val fields = parts.flatMap { p =>
      val line = p.trim
      if (line.isEmpty || skip.contains(line.split("\\s+").head.toLowerCase)) None
      else BracketedDef.findFirstMatchIn(line).orElse(ColumnDef.findFirstMatchIn(line)).map { m =>
        val name = graft.schema.SchemaOps.sanitizeName(m.group(1))
        StructField(name, sqlServerToSpark(m.group(2)), nullable = true)
      }
    }
    StructType(fields)
  }

  /** Emit warehouse DDL for a StructType, appending the reference's
    * DB-side loading-date audit column
    * (`META_loading_date_utc TIMESTAMP DEFAULT sysdate`,
    * `src/pyveb/parser.py:6,14,120-227`).
    */
  def structTypeToWarehouseDdl(schema: StructType, table: String): String = {
    val cols = schema.fields.map(f =>
      s"""  "${graft.schema.SchemaOps.sanitizeName(f.name)}" ${sparkToWarehouse(f.dataType)}""")
    (cols :+ "  \"META_loading_date_utc\" TIMESTAMP DEFAULT sysdate")
      .mkString(s"CREATE TABLE $table (\n", ",\n", "\n);")
  }
}
