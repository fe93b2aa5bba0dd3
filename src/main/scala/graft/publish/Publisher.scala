package graft.publish

import graft.queries.DeclaredCatalog
import java.io.{BufferedWriter, FileWriter}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Publishing step: export the declared catalog to a serving store
  * (reference: Datasette over SQLite, `metadata.json:1-676`).
  *
  * The engine's query surface already answers all 19 canned queries
  * through Spark views (DeclaredCatalogSpec); this closes the remaining
  * OPERATIONAL gap — handing the gold/pattern tables to the same
  * lightweight serving stack the reference uses. Two artifacts:
  *
  *  - `dump.sql` — a SQLite-compatible SQL dump (CREATE TABLE + batched
  *    INSERTs, single transaction) loadable with `sqlite3 db < dump.sql`.
  *    A dump rather than a live .sqlite file keeps the engine free of any
  *    SQLite driver dependency while staying 100% portable.
  *  - `metadata.json` — the Datasette metadata carrying the 19 canned
  *    queries verbatim, pointed at the exported tables.
  *
  * Scale note: the exported tables are the CATALOG tables — pattern
  * summaries and HVC lists, i.e. gold-layer aggregates that are
  * driver-small by construction (the 100 TB corpus reduces to per-ticker
  * pattern rows long before this step). The export streams via
  * toLocalIterator so even a large catalog never materializes in driver
  * memory at once; publishing a raw fact table through this path would be
  * wrong, and the row-count guard makes that loud.
  */
object Publisher {

  /** Max rows per multi-row INSERT statement (SQLite accepts large batches;
    * 400 keeps statements comfortably under default parser limits). */
  private val InsertBatch = 400

  /** Refuse to dump a table this big: the publish surface is for gold
    * aggregates, not fact tables. */
  private val MaxRows = 2000000L

  private def sqliteType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => "INTEGER"
    case FloatType | DoubleType | _: DecimalType => "REAL"
    case BinaryType => "BLOB"
    case _ => "TEXT" // strings, dates, timestamps → ISO text
  }

  private def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** SQLite literal for one value. Strings escape by doubling quotes;
    * dates/timestamps go as ISO text (what Datasette expects). */
  private def literal(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "1" else "0"
    case s: String => "'" + s.replace("'", "''") + "'"
    case d: java.sql.Date => "'" + d.toString + "'"
    case t: java.sql.Timestamp => "'" + t.toInstant.toString + "'"
    case t: java.time.LocalDateTime => "'" + t.toString + "'"
    case d: java.time.LocalDate => "'" + d.toString + "'"
    case b: Array[Byte] => "X'" + b.map("%02X".format(_)).mkString + "'"
    case n: java.math.BigDecimal => n.toPlainString
    // SQLite has no NaN/Infinity literal — a bare 'NaN' token makes the
    // whole dump unloadable; SQLite would store them as NULL anyway
    case d: java.lang.Double if d.isNaN || d.isInfinite => "NULL"
    case f: java.lang.Float if f.isNaN || f.isInfinite => "NULL"
    case n @ (_: java.lang.Number) => n.toString
    case other => // non-scalar (array/struct) — fail loudly, never emit
      // WrappedArray(...) garbage into a SQL dump
      throw new IllegalArgumentException(
        s"unpublishable value type ${other.getClass.getName}")
  }

  private def createTable(name: String, schema: StructType): String =
    schema.fields
      .map(f => s"  ${quoteIdent(f.name)} ${sqliteType(f.dataType)}")
      .mkString(s"CREATE TABLE ${quoteIdent(name)} (\n", ",\n", "\n);")

  /** Stream one table into the dump as CREATE + batched INSERTs. */
  private def dumpTable(w: BufferedWriter, name: String, df: DataFrame): Long = {
    w.write(createTable(name, df.schema)); w.newLine()
    val cols = df.schema.fields.map(f => quoteIdent(f.name)).mkString(", ")
    var n = 0L
    val it: Iterator[Row] = df.toLocalIterator().asInstanceOf[java.util.Iterator[Row]]
      .asScala
    it.grouped(InsertBatch).foreach { batch =>
      n += batch.size
      require(n <= MaxRows,
        s"$name exceeds $MaxRows rows — the publish surface is for gold " +
          "aggregates, not fact tables")
      val values = batch
        .map(r => r.toSeq.map(literal).mkString("(", ", ", ")"))
        .mkString(",\n  ")
      w.write(s"INSERT INTO ${quoteIdent(name)} ($cols) VALUES\n  $values;")
      w.newLine()
    }
    n
  }

  private implicit class JIter[T](val it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  /** Datasette metadata: the 19 canned queries verbatim under the `hvcs`
    * database, mirroring the reference's `metadata.json` layout. */
  private def metadataJson: String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val queries = DeclaredCatalog.sql.toSeq.sortBy(_._1)
      .map { case (name, q) => s"""      "${esc(name)}": {"sql": "${esc(q)}"}""" }
      .mkString(",\n")
    s"""{
       |  "title": "graft published catalog",
       |  "description": "gold/pattern tables + the declared query surface",
       |  "databases": {
       |    "hvcs": {
       |      "queries": {
       |$queries
       |      }
       |    }
       |  }
       |}""".stripMargin
  }

  /** Export the catalog for `dir` into `outDir/dump.sql` +
    * `outDir/metadata.json`. Returns (table → exported rows). */
  def publish(spark: SparkSession, dir: String, outDir: String): Map[String, Long] = {
    Files.createDirectories(Paths.get(outDir))
    val tables = DeclaredCatalog.catalogTables(spark, dir)
    val w = new BufferedWriter(new FileWriter(s"$outDir/dump.sql"))
    val counts =
      try {
        w.write("BEGIN TRANSACTION;"); w.newLine()
        val c = tables.toSeq.sortBy(_._1).map { case (name, df) =>
          name -> dumpTable(w, name, df)
        }
        w.write("COMMIT;"); w.newLine()
        c.toMap
      } finally w.close()
    Files.writeString(Paths.get(s"$outDir/metadata.json"), metadataJson)
    counts
  }
}
