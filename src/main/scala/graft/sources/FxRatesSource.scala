package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 source for the reference's REST feed (SURVEY §2.1 S1):
  * `spark.read.format("graft.sources.FxRatesSource").option("path", dir)`.
  *
  * The reference polls the Alpha-Vantage HTTP API per currency pair with a
  * 10-thread pool (/root/reference/Fx_1min.py:79-91). The idiomatic Spark
  * shape is a TableProvider whose InputPartitions are the per-pair
  * requests: the driver plans one partition per pair (file), executors
  * fetch and flatten in parallel, and per-pair failure isolation becomes
  * Spark task retry. Zero-egress build: the "endpoint" is a directory of
  * `<BASE>_<TARGET>.json` fixture files with the exact FX_DAILY payload
  * shape; a live HTTP endpoint would change only `openStream`.
  *
  * Parsing happens per-partition on raw payload text (same flatten
  * semantics as graft.ingest.FxJson, which covers the DataFrame-side
  * path); rows come out in the reference's event schema.
  */
class FxRatesSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FxRatesSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FxRatesTable(properties.get("path"))
}

object FxRatesSource {
  val schema: StructType = StructType(Seq(
    StructField("ccy_couple", StringType),
    StructField("event_time", LongType),
    StructField("rate", DoubleType),
    StructField("date", DateType),
    StructField("quote_date", StringType)))

  /** Flatten one FX_DAILY payload (regex-scan of the date→OHLC map; no
    * external JSON dependency on executors).
    */
  def flatten(pair: String, payload: String): Iterator[(String, Long, Double, String)] = {
    val entry = """"(\d{4}-\d{2}-\d{2})":\s*\{([^}]*)\}""".r
    val close = """"4\. close":\s*"([0-9.eE+-]+)"""".r
    val series = payload.indexOf("\"Time Series FX (Daily)\"")
    if (series < 0) Iterator.empty
    else entry.findAllMatchIn(payload.substring(series)).flatMap { m =>
      close.findFirstMatchIn(m.group(2)).map { c =>
        val date = m.group(1)
        val epochDay = java.time.LocalDate.parse(date).toEpochDay
        (pair, epochDay * 86400000L, c.group(1).toDouble, date)
      }
    }
  }
}

private class FxRatesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"fx_rates($path)"
  override def schema(): StructType = FxRatesSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FxRatesScan(path)
}

private class FxRatesScan(path: String) extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = FxRatesSource.schema
  override def toBatch: Batch = this

  // one InputPartition per pair request — the unit of parallelism and retry
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
    files.map(f => FxRatesPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new FxRatesReader(p.asInstanceOf[FxRatesPartition])
    }
}

private case class FxRatesPartition(file: String) extends InputPartition

private class FxRatesReader(p: FxRatesPartition)
    extends PartitionReader[InternalRow] {
  private val pair = new java.io.File(p.file).getName
    .stripSuffix(".json").replace("_", "/")
  private val rows = {
    val payload = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p.file)), "UTF-8")
    FxRatesSource.flatten(pair, payload)
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) {
      val (ccy, et, rate, date) = rows.next()
      current = InternalRow(
        UTF8String.fromString(ccy), et, rate,
        java.time.LocalDate.parse(date).toEpochDay.toInt,
        UTF8String.fromString(date))
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
