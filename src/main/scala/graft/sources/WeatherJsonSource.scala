package graft.sources

import java.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.weather.WeatherSchema

/** DataSource V2 connector: `spark.read.format("graft-weather").load(dir)`.
  *
  * The pluggable seam for live-connector parity (SURVEY §2.1 S1): the
  * reference pulls nested JSON from an HTTP API and documents from MongoDB
  * (/root/reference/extract.py:4-22, load.py:37-115); this connector reads
  * the same document shape from newline-delimited JSON files and presents
  * the CANONICAL FLAT RECORD directly — extract+flatten happens inside the
  * scan, the way a real connector maps wire documents to rows. Swapping the
  * origin (HTTP poller, Mongo changestream) replaces only the
  * `PartitionReader`; every plan on top is untouched.
  *
  * Scale design:
  *  - one `InputPartition` per file → thousands of files spread across
  *    executors, no driver bottleneck beyond the listing;
  *  - `SupportsPushDownRequiredColumns`: only requested fields are
  *    extracted from each document (`.explain` shows the pruned output);
  *  - `SupportsPushDownFilters`: `city = v` / `city IN (...)` /
  *    `city IS NOT NULL` are evaluated on the raw document BEFORE a row is
  *    built, and reported so `.explain` shows `PushedFilters`;
  *  - readers stream line-by-line (constant memory per partition) through
  *    the Hadoop FileSystem API, so any `fs.*` scheme Spark supports works.
  *
  * Malformed documents follow the engine's errors=coerce policy (S2): they
  * produce no row when `city`/`timestamp` can't be read (the reference
  * logs-and-skips likewise, extract.py:19-20).
  */
class WeatherJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-weather"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WeatherSchema.record

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WeatherJsonTable(properties.get("path"))
}

private[sources] class WeatherJsonTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-weather needs a path: .load(dir)")
  override def name(): String = s"graft-weather:$path"
  override def schema(): StructType = WeatherSchema.record
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // session Hadoop conf so spark.hadoop.* (credentials, custom fs impls)
    // reaches both the driver-side listing and the executor-side readers
    new WeatherJsonScanBuilder(path,
      new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))
}

private[sources] class WeatherJsonScanBuilder(path: String,
    conf: SerializableConfiguration) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = WeatherSchema.record
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("city", _: String) => true
      case In("city", _)              => true
      case IsNotNull("city")          => true
      case _                          => false
    }
    pushed = supported
    rest // Spark re-evaluates these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new WeatherJsonScan(path, required, pushed, conf)
}

private[sources] class WeatherJsonScan(path: String, required: StructType,
    pushed: Array[Filter], conf: SerializableConfiguration) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-weather $path, PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = FileSystem.get(new java.net.URI(path), conf.value)
    def list(p: Path): Array[Path] = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).flatMap(s =>
          if (s.isDirectory) list(s.getPath)
          else Array(s.getPath).filter(q =>
            q.getName.endsWith(".json") || q.getName.endsWith(".jsonl")))
      else Array(st.getPath)
    }
    list(new Path(path)).sortBy(_.toString)
      .map(p => WeatherJsonPartition(p.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WeatherJsonReaderFactory(required.fieldNames,
      // only the filter VALUES cross the wire — Filter itself is Serializable
      // but keeping the closure primitive avoids any catalyst classes in it
      pushed.collect { case EqualTo("city", v: String) => Set(v)
                       case In("city", vs) => vs.collect { case s: String => s }.toSet }
        .reduceOption(_ intersect _),
      pushed.exists { case IsNotNull("city") => true; case _ => false },
      conf)
}

private[sources] case class WeatherJsonPartition(file: String) extends InputPartition

private[sources] class WeatherJsonReaderFactory(fields: Array[String],
    cityFilter: Option[Set[String]], requireCity: Boolean,
    conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WeatherJsonReader(partition.asInstanceOf[WeatherJsonPartition].file,
      fields, cityFilter, requireCity, conf)
}

/** Streams one JSONL file; parses with Jackson (on Spark's classpath). */
private[sources] class WeatherJsonReader(file: String, fields: Array[String],
    cityFilter: Option[Set[String]], requireCity: Boolean,
    conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val reader = {
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, conf.value)
    new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(p), "UTF-8"))
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    row = null
    var line = reader.readLine()
    while (row == null && line != null) {
      row = parse(line)
      if (row == null) line = reader.readLine()
    }
    row != null
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()

  private def textAt(doc: JsonNode, path: Seq[String]): String = {
    val n = path.foldLeft(doc)((d, f) => d.path(f))
    if (n.isMissingNode || n.isNull) null else n.asText()
  }

  private def parse(line: String): InternalRow = {
    if (line.trim.isEmpty) return null
    val doc =
      try mapper.readTree(line)
      catch { case _: Exception => return null } // errors=coerce: skip, don't fail
    val city = textAt(doc, Seq("name"))
    // a doc without identity/time is quarantine-shaped — produce no row
    if (city == null || !doc.path("dt").isNumber) return null
    if (requireCity && city == null) return null
    if (cityFilter.exists(!_.contains(city))) return null
    def numOrNull(path: Seq[String], toVal: JsonNode => Any): Any = {
      val n = path.foldLeft(doc: JsonNode)((d, f) => d.path(f))
      if (n.isMissingNode || n.isNull || !n.isNumber) null else toVal(n)
    }
    val w0 = doc.path("weather").path(0)
    val values: Array[Any] = fields.map {
      case "city"        => UTF8String.fromString(city)
      case "country"     => UTF8String.fromString(textAt(doc, Seq("sys", "country")))
      case "temperature" => numOrNull(Seq("main", "temp"), _.asDouble())
      case "feels_like"  => numOrNull(Seq("main", "feels_like"), _.asDouble())
      case "humidity"    => numOrNull(Seq("main", "humidity"), _.asInt())
      case "pressure"    => numOrNull(Seq("main", "pressure"), _.asInt())
      case "weather"     => UTF8String.fromString(
        if (w0.isMissingNode) null else textAt(w0, Seq("main")))
      case "description" => UTF8String.fromString(
        if (w0.isMissingNode) null else textAt(w0, Seq("description")))
      case "wind_speed"  => numOrNull(Seq("wind", "speed"), _.asDouble())
      case "timestamp"   => doc.path("dt").asLong()
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
}
