package graft.sources

import java.util.{Map => JMap}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 source mirroring the reference's *anonymous scan*
  * (reference: native_shim/src/lazy.rs:646-763 `pl_lazy_frame_scan_stream` —
  * an `AnonymousScan` over a caller-supplied batch factory that declares
  * `allows_projection_pushdown = true` and `allows_slice_pushdown = true`,
  * lazy.rs:707-715).
  *
  * Spark's equivalent contract is a V2 `Scan` implementing
  * `SupportsPushDownRequiredColumns` (projection pushdown) and
  * `SupportsPushDownLimit` (slice pushdown) — both wired here, so
  * `df.select(a).limit(n)` over this source reads only column `a` and stops
  * after n rows per factory, exactly like the reference's flags.
  *
  * Cluster-safety: the name registry is DRIVER-side only — planning embeds
  * each factory closure into its `InputPartition`, which Spark serializes to
  * the executors. Factories must therefore be serializable closures (capture
  * plain values, not connections); they are re-invoked per scan — multi-pass
  * like `ScanDatabase`'s factory re-use (LazyFrame.cs:173-200).
  *
  * Parallelism: the reference's anonymous scan is a single stream; `scan`
  * keeps that parity (one partition). `scanPartitioned` takes N factories —
  * one input partition each — for genuinely parallel ingest.
  */
object IteratorSource {
  type Factory = () => Iterator[Row]

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, (StructType, Seq[Factory])]()

  /** Register a named single-stream factory; returns a lazy frame over it. */
  def scan(spark: SparkSession, name: String, schema: StructType, factory: Factory): DataFrame =
    scanPartitioned(spark, name, schema, Seq(factory))

  /** N factories → N input partitions, scanned in parallel. */
  def scanPartitioned(spark: SparkSession, name: String, schema: StructType,
                      factories: Seq[Factory]): DataFrame = {
    require(factories.nonEmpty, "scanPartitioned needs at least one factory")
    registry.put(name, (schema, factories))
    spark.read.format(classOf[IteratorSourceProvider].getName)
      .option("factory", name).load()
  }

  private[sources] def lookup(name: String): (StructType, Seq[Factory]) = {
    val e = registry.get(name)
    require(e != null, s"no iterator factory registered under '$name'")
    e
  }
}

class IteratorSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IteratorSource.lookup(options.get("factory"))._1

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new IteratorTable(properties.get("factory"), schema)
}

private class IteratorTable(factoryName: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_iterator($factoryName)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IteratorScanBuilder(factoryName, schema)
}

/** ScanBuilder with the reference's two pushdown capabilities. */
private class IteratorScanBuilder(factoryName: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep source column order; empty projection (count-only) keeps 0 cols
    required = StructType(fullSchema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))
  }
  override def pushLimit(n: Int): Boolean = { limit = n; true }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      // driver-side: resolve the registry HERE and ship the closures with
      // the partitions, so executors never need the (driver-JVM) registry
      val (schema, factories) = IteratorSource.lookup(factoryName)
      factories.map(f => IteratorPartition(f, schema, required.fieldNames, limit): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = new IteratorReaderFactory
    override def description(): String =
      s"GraftIteratorScan(factory=$factoryName, parts=${IteratorSource.lookup(factoryName)._2.size}, cols=[${required.fieldNames.mkString(",")}], limit=$limit)"
  }
}

private case class IteratorPartition(factory: IteratorSource.Factory, schema: StructType,
                                     cols: Array[String], limit: Int)
  extends InputPartition

private class IteratorReaderFactory extends PartitionReaderFactory with Serializable {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[IteratorPartition]
    val idx = p.cols.map(p.schema.fieldIndex)
    val prunedSchema = StructType(p.cols.map(p.schema.apply))
    val toInternal = ExpressionEncoder(RowEncoder.encoderFor(prunedSchema)).createSerializer()
    val base = p.factory()
    val limited = if (p.limit >= 0) base.take(p.limit) else base
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (limited.hasNext) {
          val r = limited.next()
          cur = toInternal(Row.fromSeq(idx.toIndexedSeq.map(r.get))).copy()
          true
        } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
