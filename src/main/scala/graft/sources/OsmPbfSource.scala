package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.sources.{And, DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{OsmPbf, OsmXml}

/** `spark.read.format("osmpbf")` — DataSource V2 over the OSM PBF planet
  * format (the one the reference rejects; codec in [[graft.io.OsmPbf]]).
  *
  * {{{
  *   spark.read.format("osmpbf").load("planet.osm.pbf")                  // nodes
  *   spark.read.format("osmpbf").option("element", "ways").load(path)    // ways
  *   spark.read.format("osmpbf").load("extracts")          // dir / glob / comma list
  * }}}
  *
  * Spark-native integration points:
  *  - one `InputPartition` per blob range → the decode fans out over the
  *    cluster exactly like the library scan;
  *  - **column pruning reaches the wire**: `SupportsPushDownRequiredColumns`
  *    maps the required schema to decode ordinals, and
  *    [[OsmPbf.PbfProj]] skips whole protobuf sections for pruned columns —
  *    an `id, lon, lat` projection never walks keys_vals, never builds a
  *    tag map, never delta-decodes DenseInfo, and never materializes the
  *    block string table;
  *  - **predicate pushdown prunes whole blobs**: `SupportsPushDownFilters`
  *    tests id/lon/lat range predicates against the writer's per-blob
  *    stats sidecar ([[OsmPbf.IdxEntry]], parquet-row-group semantics —
  *    superset-safe skip at planning time, filters re-evaluated per row),
  *    so a bbox extract over a planet touches only matching blobs.
  */
class OsmPbfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "osmpbf"

  private def element(options: CaseInsensitiveStringMap): String =
    Option(options.get("element")).getOrElse("nodes")

  private def schemaOf(el: String): StructType = el match {
    case "nodes" => OsmXml.nodeSchema
    case "ways" => OsmXml.waySchema
    case "relations" => OsmXml.relationSchema
    case other => throw new IllegalArgumentException(
      s"osmpbf: unknown element '$other' (nodes, ways, relations)")
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    schemaOf(element(options))

  /** `load(a, b, …)` arrives as options("paths") = a JSON string array —
    * decode it into the comma-list convention the scans already accept.
    */
  private def parsePaths(raw: String): String =
    if (!raw.trim.startsWith("[")) raw
    else "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(raw)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      .mkString(",")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).orElse(Option(opts.get("paths")).map(parsePaths))
      .getOrElse(throw new IllegalArgumentException("osmpbf: .load(path) is required"))
    new OsmPbfTable(path, element(opts), schemaOf(element(opts)))
  }
}

class OsmPbfTable(path: String, element: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"osmpbf:$element:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OsmPbfScanBuilder(path, element, tableSchema)
}

class OsmPbfScanBuilder(path: String, element: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var countFromStats: Option[Long] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** id/lon/lat range predicates prune whole blobs against the sidecar's
    * per-blob stats (parquet row-group semantics: the skip is superset-
    * safe, so EVERY filter is also returned as residual for Spark to
    * re-evaluate row-by-row).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(OsmPbfScan.supported)
    filters // all residual — blob skipping is stats-based, not exact
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** COUNT(*) with no grouping and NO filters answers straight from the
    * stats sidecars — a metadata-only planet count, like parquet's
    * row-count optimization. (Filtered queries never reach aggregate
    * pushdown here: every filter is kept as residual, and Spark only
    * pushes aggregates below fully-pushed filters.) Requires a valid
    * sidecar on EVERY matched file; otherwise declined.
    */
  /** one sidecar sweep per builder — supportCompletePushDown and
    * pushAggregation both consult it
    */
  private lazy val sidecarTotal: Option[Long] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val kindChar = "nwr".charAt(OsmPbfScan.wantOf(element))
    val perFile = OsmPbf.expandPaths(path, conf)
      .map(f => OsmPbf.readIndex(f, conf).map(_.filter(_.kind == kindChar).map(_.count).sum))
    if (perFile.forall(_.isDefined)) Some(perFile.flatten.sum) else None
  }
  private def statsCount(agg: Aggregation): Option[Long] = {
    val shapeOk = pushed.isEmpty && agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]
    if (shapeOk) sidecarTotal else None
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean = {
    countFromStats = statsCount(agg)
    countFromStats.isDefined
  }
  override def pushAggregation(agg: Aggregation): Boolean = {
    countFromStats = statsCount(agg)
    countFromStats.isDefined
  }
  override def build(): Scan = countFromStats match {
    case Some(n) => new OsmPbfCountScan(path, element, n)
    case None => new OsmPbfScan(path, element, full, required, pushed)
  }
}

/** Metadata-only COUNT(*): one partition, one row, zero blobs read. */
class OsmPbfCountScan(path: String, element: String, count: Long) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count_star", LongType, false)))
  override def toBatch: Batch = this
  override def description(): String = s"osmpbf $element COUNT(*)=$count from sidecar $path"
  override def planInputPartitions(): Array[InputPartition] =
    Array(PbfCountPartition(count))
  override def createReaderFactory(): PartitionReaderFactory = PbfCountReaderFactory()
}

case class PbfCountPartition(count: Long) extends InputPartition

case class PbfCountReaderFactory() extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var done = false
      private val n = partition.asInstanceOf[PbfCountPartition].count
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](n))
      override def close(): Unit = ()
    }
}

object OsmPbfScan {
  def wantOf(element: String): Int = element match {
    case "nodes" => 0
    case "ways" => 1
    case "relations" => 2
  }
  private val Attrs = Set("id", "lon", "lat")
  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, v: Number) => Attrs(a) && (v ne null)
    case GreaterThan(a, v: Number) => Attrs(a) && (v ne null)
    case GreaterThanOrEqual(a, v: Number) => Attrs(a) && (v ne null)
    case LessThan(a, v: Number) => Attrs(a) && (v ne null)
    case LessThanOrEqual(a, v: Number) => Attrs(a) && (v ne null)
    case And(l, r) => supported(l) && supported(r)
    case _ => false
  }
  /** conjunctive closed bounds per attribute (both < and <= widen to <=:
    * stats skipping only needs soundness, not tightness)
    */
  def bounds(filters: Array[Filter]): Map[String, (Double, Double)] = {
    val acc = scala.collection.mutable.Map[String, (Double, Double)]()
    def narrow(a: String, lo: Double, hi: Double): Unit = {
      val (l0, h0) = acc.getOrElse(a, (Double.NegativeInfinity, Double.PositiveInfinity))
      acc(a) = (math.max(l0, lo), math.min(h0, hi))
    }
    def walk(f: Filter): Unit = f match {
      case EqualTo(a, v: Number) => narrow(a, v.doubleValue(), v.doubleValue())
      case GreaterThan(a, v: Number) => narrow(a, v.doubleValue(), Double.PositiveInfinity)
      case GreaterThanOrEqual(a, v: Number) => narrow(a, v.doubleValue(), Double.PositiveInfinity)
      case LessThan(a, v: Number) => narrow(a, Double.NegativeInfinity, v.doubleValue())
      case LessThanOrEqual(a, v: Number) => narrow(a, Double.NegativeInfinity, v.doubleValue())
      case And(l, r) => walk(l); walk(r)
      case _ =>
    }
    filters.foreach(walk)
    acc.toMap
  }
}

class OsmPbfScan(path: String, element: String, full: StructType, required: StructType,
                 pushed: Array[Filter]) extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"osmpbf $element ${required.fieldNames.mkString("[", ",", "]")}" +
      s"${if (pushed.nonEmpty) pushed.mkString(" pushed:[", ",", "]") else ""} $path"

  private def want: Int = OsmPbfScan.wantOf(element)

  /** Blobs surviving filter pruning, plus their exact row count when every
    * matched file carries a sidecar (an upper bound under pushed filters —
    * blob stats keep superset blobs; used for planner ESTIMATES only).
    */
  private lazy val planning: (Seq[(String, Long, Int)], Option[Long]) = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val b = OsmPbfScan.bounds(pushed)
    val keep: OsmPbf.IdxEntry => Boolean = { e =>
      def hit(attr: String, mn: Double, mx: Double): Boolean = b.get(attr) match {
        // NaN stats (ways/relations carry no bbox) must KEEP the blob —
        // pruning is only sound when real bounds prove emptiness
        case Some((lo, hi)) => mn.isNaN || mx.isNaN || (mx >= lo && mn <= hi)
        case None => true
      }
      (b.get("id") match {
        case Some((lo, hi)) => e.maxId.toDouble >= lo && e.minId.toDouble <= hi
        case None => true
      }) && hit("lon", e.minLon, e.maxLon) && hit("lat", e.minLat, e.maxLat)
    }
    var rowsKnown = true
    var rows = 0L
    val blobs = OsmPbf.expandPaths(path, conf).flatMap { f =>
      val (bl, cnt) = OsmPbf.dataBlobsDetailed(f, conf, want, keep)
      cnt match {
        case Some(c) => rows += c
        case None => rowsKnown = false
      }
      bl
    }
    (blobs, if (rowsKnown) Some(rows) else None)
  }

  /** Sidecar-derived planner statistics: Catalyst's join strategy (e.g.
    * the engine's own SpatialJoin.autoJoin threshold) then sees real
    * sizes for pbf tables instead of defaulting to "huge".
    */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(1L, planning._1.map(_._3.toLong).sum))
    override def numRows(): java.util.OptionalLong =
      planning._2.map(java.util.OptionalLong.of)
        .getOrElse(java.util.OptionalLong.empty())
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val blobs = planning._1
    val nParts = math.max(1, math.min(blobs.size, spark.sparkContext.defaultParallelism * 2))
    val per = math.max(1, (blobs.size + nParts - 1) / nParts)
    blobs.grouped(per).map(g => PbfInputPartition(g.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // required-schema fields resolved to full-schema ordinals BY NAME on
    // the driver; the factory ships primitives + the session Hadoop conf
    val ords = required.fieldNames.map(full.fieldIndex)
    PbfReaderFactory(want, ords,
      new OsmPbf.ConfBits(SparkSession.active.sparkContext.hadoopConfiguration))
  }
}

case class PbfInputPartition(blobs: Array[(String, Long, Int)]) extends InputPartition

case class PbfReaderFactory(want: Int, ords: Array[Int],
                            confBits: OsmPbf.ConfBits) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val blobs = partition.asInstanceOf[PbfInputPartition].blobs
    new PartitionReader[InternalRow] {
      private val pm = new OsmPbf.PbfProj(want, ords)
      private var i = 0
      private var cur: Iterator[InternalRow] = Iterator.empty
      private var row: InternalRow = _
      private var in: org.apache.hadoop.fs.FSDataInputStream = null
      private var inFile: String = null
      override def next(): Boolean = {
        while (!cur.hasNext && i < blobs.length) {
          val (file, off, size) = blobs(i); i += 1
          if (in == null || inFile != file) {
            if (in != null) in.close()
            val p = new org.apache.hadoop.fs.Path(file)
            in = p.getFileSystem(confBits.toConf).open(p)
            inFile = file
          }
          val buf = new Array[Byte](size)
          in.readFully(off, buf, 0, size)
          cur = OsmPbf.decodeBlock(OsmPbf.decodeBlob(buf), want, pm).iterator
        }
        if (cur.hasNext) { row = cur.next(); true } else false
      }
      override def get(): InternalRow = row
      override def close(): Unit = if (in != null) { in.close(); in = null }
    }
  }
}
