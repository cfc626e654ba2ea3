package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Ingestion layer (reference matcher ingestion/loader classes, S1-S10 in
  * SURVEY §2.1): heterogeneous sources land as DataFrames plus the
  * long-format column view that feeds profiling. All readers are
  * `spark.read`-based so Catalyst gets pushdown/pruning; the reference's
  * hand-rolled row transposes disappear (its column lists become the
  * melted view, computed distributed).
  */
object Ingest {

  /** S1: RFC4180 CSV with header -> all-string DataFrame, all-empty rows
    * dropped (reference CsvDataLoader.scala:42-111 treats every value as
    * string and drops empty rows; logical types are inferred later as
    * features, not at scan time). The first row is always consumed as
    * the header; names are treated as absent placeholders — and replaced
    * by synthesized col_0..col_n — only when they are exactly the ints
    * 0..n-1 (reference :91-96). */
  def csv(spark: SparkSession, path: String): DataFrame = {
    val first = spark.read.text(path).limit(1).collect()
      .headOption.map(_.getString(0)).getOrElse("")
    val toks = first.split(",", -1).map(_.trim).toSeq
    val placeholderHeader =
      toks.flatMap(_.toIntOption).sorted == toks.indices.toList
    val base = spark.read
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(path)
    val named = if (placeholderHeader)
      base.toDF(base.columns.indices.map(i => s"col_$i"): _*)
    else base
    val allEmpty = named.columns
      .map(c => coalesce(length(trim(col(s"`$c`"))), lit(0)) === 0)
      .reduce(_ && _)
    named.filter(!allEmpty)
  }

  /** S2: recursive CSV directory -> one frame with a `_source_file`
    * column (attr id = relPath/colName in the reference,
    * CSVHierarchicalDataLoader.scala:31-83). */
  def csvDirectory(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("header", "true").option("recursiveFileLookup", "true")
      .csv(dir)
      .withColumn("_source_file", input_file_name())

  /** S3/S4: JSON records -> flat DataFrame with `label@path` attribute
    * names (reference XmlDataLoader.scala:18-76 flattens node labels the
    * same way; union-of-keys across docs is schema merge, which
    * spark.read.json already performs). */
  def jsonFlat(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    def flatten(schema: StructType, prefix: Seq[String]): Seq[org.apache.spark.sql.Column] =
      schema.fields.toIndexedSeq.flatMap { f =>
        val p = prefix :+ f.name
        f.dataType match {
          case st: StructType => flatten(st, p)
          case _ =>
            Seq(col(p.mkString(".")).cast(StringType)
              .as((f.name +: prefix.reverse).mkString("@")))
        }
      }
    raw.select(flatten(raw.schema, Nil): _*)
  }

  /** S6: file-per-column corpus (reference NorthixDataLoader.scala:
    * 12-55): every file in the directory is named `attr@table@db` and
    * holds one column's values, one per line; the filename is the
    * attribute id. One distributed text read covers the whole corpus —
    * files that don't match the naming scheme are skipped, like the
    * reference's regex match. Returns long-format
    * (db, table, col_name, value) with col_name = the full
    * `attr@table@db` id. */
  def filePerColumn(spark: SparkSession, dir: String): DataFrame = {
    val re = "^(.+)@(.+)@(.+)$"
    spark.read.text(dir)
      .withColumn("fname",
        url_decode(regexp_replace(input_file_name(), "^.*/", "")))
      .filter(col("fname").rlike(re))
      .select(
        regexp_extract(col("fname"), re, 3).as("db"),
        regexp_extract(col("fname"), re, 2).as("table"),
        col("fname").as("col_name"),
        col("value"))
  }

  /** S6 companion: class labels from directory structure (reference
    * NorthixDataLoader.loadLabels:56-59 — every subdirectory is a
    * class, its files are the member attribute ids). Listing is
    * driver-side (label sets are catalog-sized, not data-sized). */
  def directoryLabels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    val rows = {
      val s = java.nio.file.Files.list(root)
      try s.iterator().asScala.filter(java.nio.file.Files.isDirectory(_))
        .flatMap { cls =>
          val f = java.nio.file.Files.list(cls)
          try f.iterator().asScala
            .map(p => (cls.getFileName.toString, p.getFileName.toString))
            .toList
          finally f.close()
        }.toList
      finally s.close()
    }
    rows.toDF("label", "attr_id")
  }

  /** S4/S5: per-property extraction from JSON-LD/RDF-export records
    * (reference DBPediaDataLoader.scala:18-80,
    * FreebaseDataLoader.scala:1-111): each requested (attribute name,
    * property URI) pulls the property's value wherever the field occurs
    * in the document — the head element's `value` for arrays of
    * `{value, lang}` objects, the English entry when `english` contains
    * the attribute, or the raw scalar. URIs with dots/slashes are plain
    * field names in these exports, matched by name at any nesting
    * depth. */
  def jsonProperties(spark: SparkSession, path: String,
      props: Seq[(String, String)],
      english: Set[String] = Set.empty): DataFrame = {
    val raw = spark.read.json(path)

    def findPath(schema: StructType, name: String,
        prefix: Seq[String]): Option[Seq[String]] =
      schema.fields.collectFirst {
        case f if f.name == name => prefix :+ f.name
      }.orElse(schema.fields.collectFirst {
        case f if f.dataType.isInstanceOf[StructType] &&
          findPath(f.dataType.asInstanceOf[StructType], name,
            prefix :+ f.name).isDefined =>
          findPath(f.dataType.asInstanceOf[StructType], name,
            prefix :+ f.name).get
      })

    def fieldCol(path: Seq[String]): org.apache.spark.sql.Column =
      path.tail.foldLeft(col(s"`${path.head}`"))((c, f) => c.getField(f))

    def dtypeAt(path: Seq[String]): org.apache.spark.sql.types.DataType =
      path.foldLeft(raw.schema: org.apache.spark.sql.types.DataType) {
        case (st: StructType, f) => st.fields.find(_.name == f).get.dataType
        case (dt, _) => dt
      }

    val cols = props.map { case (attr, uri) =>
      findPath(raw.schema, uri, Nil) match {
        case None => lit(null).cast(StringType).as(attr)
        case Some(p) =>
          val c = fieldCol(p)
          val extracted = dtypeAt(p) match {
            case org.apache.spark.sql.types.ArrayType(
                _: StructType, _) if english.contains(attr) =>
              // English entry of [{lang, value}] (extractEnglishValue)
              element_at(filter(c, x => x.getField("lang") === "en"), 1)
                .getField("value")
            case org.apache.spark.sql.types.ArrayType(_: StructType, _) =>
              // head element's value (extractHeadValue)
              element_at(c, 1).getField("value")
            case _: StructType => c.getField("value")
            case _ => c
          }
          extracted.cast(StringType).as(attr)
      }
    }
    raw.select(cols: _*)
  }

  /** XML documents (one doc per file) -> (file, label@path, value) long
    * rows via the JDK DOM parser in mapPartitions (reference
    * XmlDataLoader flattens each doc to label@path attrs; the union of
    * attribute names across docs falls out of the long format). */
  def xmlLong(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.option("wholetext", "true").text(dir)
      .withColumn("file", input_file_name())
      .as[(String, String)]
    files.mapPartitions { it =>
      val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      val builder = factory.newDocumentBuilder()
      it.flatMap { case (content, file) =>
        try {
          val doc = builder.parse(new java.io.ByteArrayInputStream(
            content.getBytes("UTF-8")))
          def walk(n: org.w3c.dom.Node, path: List[String]): Seq[(String, String)] = {
            val children = (0 until n.getChildNodes.getLength)
              .map(n.getChildNodes.item)
            val elems = children.filter(_.getNodeType == org.w3c.dom.Node.ELEMENT_NODE)
            if (elems.isEmpty) {
              val text = n.getTextContent.trim
              if (text.nonEmpty)
                Seq(((n.getNodeName :: path).mkString("@"), text))
              else Nil
            } else elems.flatMap(c => walk(c, n.getNodeName :: path))
          }
          walk(doc.getDocumentElement, Nil).map { case (k, v) => (file, k, v) }
        } catch { case _: Exception => Nil }
      }
    }.toDF("file", "attr", "value")
  }

  /** S7: semantic-type label CSVs: 2-col manual labels or 6-col predicted
    * labels where unvalidated rows (`?`) are skipped (reference
    * LabelsLoader.scala:32-75). */
  def labels(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    if (raw.columns.length <= 2)
      raw.toDF("attr_id", "label")
    else raw
      .filter(col(raw.columns(2)) =!= "?")
      .select(col(raw.columns(0)).as("attr_id"), col(raw.columns(1)).as("label"))
  }

  /** S9: bounded scan — take the first 4n rows, then a deterministic
    * hash-ordered sample of n values per column (reference
    * DataSetInterface.scala:214-295 samples from the first 4n rows with a
    * seeded Random; hash order replaces the seed for
    * partition-independence). */
  def boundedColumnSample(df: DataFrame, cols: Seq[String], n: Int,
      seed: Long = 42L): DataFrame = {
    val limited = ColumnMelt.melt(df.limit(4 * n), cols)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name"))
      .orderBy(xxhash64(col("value"), lit(seed)), col("value"))
    limited.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n).drop("rn")
  }

  /** S10: retype with sentinel defaults (reference
    * DataSetInterface.scala:304-322 casts with NaN / Int.MinValue
    * fallbacks; try_cast keeps ANSI mode safe). */
  def retype(df: DataFrame, typeMap: Map[String, String]): DataFrame =
    typeMap.foldLeft(df) { case (d, (c, t)) =>
      val casted = expr(s"try_cast(`$c` AS $t)")
      val sentinel = t.toLowerCase match {
        case "double" | "float" => lit(Double.NaN).cast(t)
        case "int" | "integer" | "bigint" | "long" => lit(Int.MinValue).cast(t)
        case _ => lit(null).cast(t)
      }
      d.withColumn(c, coalesce(casted, sentinel))
    }

  /** S8: write a frame back to CSV (reference CSVDataWriter.scala). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Columnar sink/source beyond the reference's CSV: ORC round-trip
    * (Spark-native second columnar format besides parquet — schema,
    * types, and predicate pushdown all apply; no extra dependency). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}

/** Alias for the melt helper so ingestion doesn't depend on the profile
  * package. */
object ColumnMelt {
  def melt(df: DataFrame, cols: Seq[String]): DataFrame =
    graft.profile.ColumnProfiler.melt(df, cols)
}
