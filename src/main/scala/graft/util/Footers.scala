package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import scala.jdk.CollectionConverters._

/** Per-file row counts and column min/max straight from parquet FOOTERS —
  * the metadata every file already carries, read driver-side in O(files)
  * instead of a second distributed scan over the just-written data. This
  * is how real table formats build their manifests (Iceberg collects
  * manifest stats from footers at commit time); the previous
  * `groupBy(input_file_name())` pass re-read and re-shuffled every byte
  * the commit had just written (guide §1.2: don't pay a full pass for
  * something the write already produced).
  *
  * Only plain integral/floating physical types are trusted: a DECIMAL's
  * int64 is unscaled, a TIMESTAMP's int64 is an epoch encoding — both
  * would corrupt a Double range, so such columns return None and the
  * caller falls back to the distributed pass. A column that is all-null
  * in a file (no non-null min/max, null count covering every row) is
  * reported as having no range — identical to the scan-based behavior
  * (the file stays conservatively un-prunable on that column).
  */
object Footers {

  /** One file's footer stats: (rows, col -> (min, max) for the requested
    * columns that have a usable range). None = footer unusable for at
    * least one requested column (missing stats or an encoded logical
    * type) — caller must fall back to scanning.
    */
  def fileStats(conf: Configuration, file: Path,
      cols: Seq[String]): Option[(Long, Map[String, (Double, Double)])] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val schema = footer.getFileMetaData.getSchema
      val stats = cols.flatMap { c =>
        // flat columns only (every statsCols caller's shape); a column
        // absent from this file's schema has no range here
        if (!schema.containsField(c)) Some(c -> None)
        else {
          val field = schema.getType(Seq(c): _*)
          if (!field.isPrimitive) return None
          val prim = field.asPrimitiveType()
          if (!plainNumeric(prim.getPrimitiveTypeName,
              prim.getLogicalTypeAnnotation)) return None
          var mn = Double.PositiveInfinity
          var mx = Double.NegativeInfinity
          var any = false
          for (b <- blocks) {
            val cc = b.getColumns.asScala
              .find(_.getPath.toDotString == c)
              .getOrElse(return None)
            val st = cc.getStatistics
            if (st == null || (st.isEmpty && b.getRowCount > 0)) return None
            if (st.hasNonNullValue) {
              val (lo, hi) = toDoubleRange(prim.getPrimitiveTypeName, st)
              mn = math.min(mn, lo); mx = math.max(mx, hi); any = true
            } else if (!st.isNumNullsSet ||
                st.getNumNulls != b.getRowCount) {
              // no values recorded but the block isn't provably all-null
              return None
            }
          }
          if (any) Some(c -> Some((mn, mx))) else Some(c -> None)
        }
      }.collect { case (c, Some(r)) => c -> r }.toMap
      Some((rows, stats))
    } finally reader.close()
  }

  /** Row count alone (always trustworthy — it is structural metadata,
    * not statistics).
    */
  def rowCount(conf: Configuration, file: Path): Long = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally reader.close()
  }

  private def plainNumeric(t: PrimitiveTypeName,
      logical: LogicalTypeAnnotation): Boolean = t match {
    case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
      logical == null ||
        logical.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation]
    case PrimitiveTypeName.DOUBLE | PrimitiveTypeName.FLOAT =>
      logical == null
    case _ => false
  }

  private def toDoubleRange(t: PrimitiveTypeName,
      st: org.apache.parquet.column.statistics.Statistics[_])
      : (Double, Double) = t match {
    case PrimitiveTypeName.INT32 =>
      val s = st.asInstanceOf[org.apache.parquet.column.statistics.IntStatistics]
      (s.getMin.toDouble, s.getMax.toDouble)
    case PrimitiveTypeName.INT64 =>
      val s = st.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
      (s.getMin.toDouble, s.getMax.toDouble)
    case PrimitiveTypeName.FLOAT =>
      val s = st.asInstanceOf[org.apache.parquet.column.statistics.FloatStatistics]
      (s.getMin.toDouble, s.getMax.toDouble)
    case PrimitiveTypeName.DOUBLE =>
      val s = st.asInstanceOf[org.apache.parquet.column.statistics.DoubleStatistics]
      (s.getMin, s.getMax)
    case other =>
      throw new IllegalStateException(s"unreachable: $other passed plainNumeric")
  }
}
