package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container source/sink — the one common row format a real event
  * pipeline reaches for that the parquet/CSV/JSONL/ORC/fixed-width
  * surface doesn't cover. Spark's bundled `spark-avro` module is not on
  * this classpath, so this rides the Avro Java library directly
  * (`org.apache.avro` 1.12, an unmanaged jar), keeping the Spark side
  * idiomatic: the reader produces an ordinary `DataFrame` via a
  * file-per-task RDD, the writer emits one container file per
  * partition with deterministic names (a task retry overwrites its own
  * file — idempotent, never duplicated).
  *
  * Type mapping (both directions):
  *   boolean/int/long/float/double/string/bytes/fixed ↔ the obvious
  *   Spark types; enum → string; `int{date}` ↔ DateType;
  *   `long{timestamp-micros|millis}` ↔ TimestampType (micros written);
  *   `bytes{decimal}` ↔ DecimalType; array ↔ ArrayType; map (string
  *   keys, Avro's only kind) ↔ MapType; record ↔ StructType
  *   (recursive); `union[null, T]` ↔ nullable T. General unions are
  *   REJECTED up front — a column whose type varies by row has no
  *   DataFrame twin, and guessing would corrupt silently.
  *
  * Scale shape: READ parallelism is file-granular (one task per
  * container file — Avro blocks are further splittable, but event
  * pipelines produce many files and file-level splits keep the reader
  * dependency-free); schema is read ONCE from the first file on the
  * driver and shipped as its JSON string (re-parsed per task — Avro
  * Schema serialization is version-fragile). Column pruning/pushdown
  * do NOT reach into a row-major format — Avro is the interchange
  * format here, not the analytics format; land it, convert to parquet
  * (`writeCompacted`), and query that.
  */
object Avro {

  // ---- schema conversion ------------------------------------------------

  /** Avro schema → Spark type, with the nullable flag unwrapped from
    * `union[null, T]`. */
  def sparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1 && branches.size - nonNull.size <= 1,
        s"Avro: only union[null, T] is supported, got $s")
      val (dt, _) = sparkType(nonNull.head)
      (dt, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      val lt = Option(s.getLogicalType).map(_.getName).getOrElse("")
      (if (lt == "date") DateType else IntegerType, false)
    case Schema.Type.LONG =>
      Option(s.getLogicalType).map(_.getName).getOrElse("") match {
        case "timestamp-micros" | "timestamp-millis" => (TimestampType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      Option(s.getLogicalType) match {
        case Some(d: org.apache.avro.LogicalTypes.Decimal) =>
          (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.ARRAY =>
      val (et, en) = sparkType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = sparkType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.RECORD =>
      val fields = s.getFields.asScala.map { f =>
        val (dt, n) = sparkType(f.schema())
        StructField(f.name(), dt, nullable = n)
      }
      (StructType(fields.toSeq), false)
    case other =>
      throw new IllegalArgumentException(s"Avro: unsupported type $other in $s")
  }

  def sparkSchema(s: Schema): StructType = sparkType(s) match {
    case (st: StructType, _) => st
    case (dt, _) => throw new IllegalArgumentException(
      s"Avro: top-level schema must be a record, got $dt")
  }

  /** Spark type → Avro schema. Every field is written as
    * `union[null, T]` (DataFrame nullability is advisory — a
    * non-nullable sink schema would make one stray null poison a
    * whole container block). */
  def avroSchema(st: StructType, name: String = "graft_record"): Schema =
    avroRecord(st, name, "graft")

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.Arrays.asList(
      Schema.create(Schema.Type.NULL), s))

  private def avroRecord(st: StructType, name: String, ns: String): Schema = {
    val fields = st.fields.zipWithIndex.map { case (f, i) =>
      new Schema.Field(f.name, nullable(avroType(f.dataType, s"${name}_$i", ns)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, ns, false, fields.toList.asJava)
  }

  private def avroType(dt: DataType, name: String, ns: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      org.apache.avro.LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, _) => Schema.createArray(nullable(avroType(et, name, ns)))
    case MapType(StringType, vt, _) =>
      Schema.createMap(nullable(avroType(vt, name, ns)))
    case st: StructType => avroRecord(st, name, ns)
    case other =>
      throw new IllegalArgumentException(s"Avro: unsupported Spark type $other")
  }

  // ---- value conversion --------------------------------------------------

  /** Avro value → Spark external value, as a converter TREE built once
    * per task from the Avro schema (which alone knows e.g. whether a
    * timestamp long is millis or micros) and applied per row. */
  private def reader(s0: Schema, dt: DataType): Any => Any = {
    val s = if (s0.getType == Schema.Type.UNION)
      s0.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s0
    val conv: Any => Any = (s.getType, dt) match {
      case (Schema.Type.STRING | Schema.Type.ENUM, StringType) =>
        v => v.toString
      case (Schema.Type.BYTES, d: DecimalType) =>
        v => {
          val b = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
          val a = new Array[Byte](b.remaining()); b.get(a)
          new java.math.BigDecimal(new java.math.BigInteger(a), d.scale)
        }
      case (Schema.Type.BYTES, BinaryType) =>
        v => {
          val b = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
          val a = new Array[Byte](b.remaining()); b.get(a); a
        }
      case (Schema.Type.FIXED, BinaryType) =>
        v => v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes().clone()
      case (Schema.Type.INT, DateType) =>
        v => java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()))
      case (Schema.Type.LONG, TimestampType) =>
        val nsPerUnit =
          if (Option(s.getLogicalType).exists(_.getName == "timestamp-millis"))
            1000000L
          else 1000L
        v => java.sql.Timestamp.from(java.time.Instant.EPOCH
          .plusNanos(v.asInstanceOf[Number].longValue() * nsPerUnit))
      case (Schema.Type.ARRAY, ArrayType(et, _)) =>
        val elem = reader(s.getElementType, et)
        v => v.asInstanceOf[java.util.Collection[_]].asScala.toSeq.map(elem)
      case (Schema.Type.MAP, MapType(_, vt, _)) =>
        val value = reader(s.getValueType, vt)
        v => v.asInstanceOf[java.util.Map[_, _]].asScala
          .map { case (k, mv) => k.toString -> value(mv) }.toMap
      case (Schema.Type.RECORD, st: StructType) =>
        val fields = st.fields.map(f => (f.name, reader(s.getField(f.name).schema(), f.dataType)))
        v => {
          val r = v.asInstanceOf[GenericRecord]
          Row.fromSeq(fields.map { case (n, c) => c(r.get(n)) }.toSeq)
        }
      case _ => identity // int/long/float/double/boolean pass through
    }
    v => if (v == null) null else conv(v)
  }

  /** Spark external row value → Avro in-memory value. */
  private def toAvro(v: Any, dt: DataType, s: Schema): Any = {
    if (v == null) return null
    val target = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s
    (v, dt) match {
      case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
      case (d: java.math.BigDecimal, dec: DecimalType) =>
        java.nio.ByteBuffer.wrap(
          d.setScale(dec.scale).unscaledValue().toByteArray)
      case (d: scala.math.BigDecimal, dec: DecimalType) =>
        java.nio.ByteBuffer.wrap(
          d.underlying().setScale(dec.scale).unscaledValue().toByteArray)
      case (d: java.sql.Date, DateType) =>
        java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
      case (t: java.sql.Timestamp, TimestampType) =>
        java.lang.Long.valueOf(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
      case (t: java.time.Instant, TimestampType) =>
        java.lang.Long.valueOf(t.getEpochSecond * 1000000L + t.getNano / 1000)
      case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
        seq.map(toAvro(_, et, target.getElementType)).asJava
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        m.map { case (k, mv) =>
          k.toString -> toAvro(mv, vt, target.getValueType)
        }.toMap.asJava
      case (r: Row, st: StructType) =>
        val rec = new GenericData.Record(target)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(r.get(i), f.dataType, target.getField(f.name).schema()))
        }
        rec
      case (x, _) => x
    }
  }

  // ---- read ----------------------------------------------------------------

  private def listAvroFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stats =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
      else Seq(fs.getFileStatus(p))
    stats.filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted
  }

  /** Read a directory of (or a single) `.avro` container file(s) into a
    * DataFrame — one task per file. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = listAvroFiles(spark, path)
    require(files.nonEmpty, s"Avro.read: no .avro files under $path")
    // schema from the first file, shipped as JSON (Schema objects are
    // version-fragile across serialization)
    val conf = spark.sparkContext.hadoopConfiguration
    val head = new DataFileReader[GenericRecord](
      new org.apache.avro.mapred.FsInput(new Path(files.head), conf),
      new GenericDatumReader[GenericRecord]())
    val avroJson = try head.getSchema.toString finally head.close()
    val schema = sparkSchema(new Schema.Parser().parse(avroJson))
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { file =>
        val avro = new Schema.Parser().parse(avroJson)
        val conv = reader(avro, schema) // converter tree, built once per task
        val dfr = new DataFileReader[GenericRecord](
          new org.apache.avro.mapred.FsInput(new Path(file), new Configuration()),
          new GenericDatumReader[GenericRecord](avro))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = dfr.hasNext
            if (!h) dfr.close()
            h
          }
          def next(): Row = conv(dfr.next()).asInstanceOf[Row]
        }
      }
    spark.createDataFrame(rows, schema)
  }

  // ---- write ---------------------------------------------------------------

  /** Write the DataFrame as one Avro container file per partition under
    * `path` (`part-NNNNN.avro`, deterministic — task retries overwrite
    * their own file). `codec`: "null", "deflate", "snappy" (snappy
    * requires the codec jar; "deflate" is JDK-built-in and the default
    * interchange-safe choice). */
  def write(df: DataFrame, path: String, overwrite: Boolean = true,
            codec: String = "deflate"): Unit = {
    val schema = df.schema
    val avroJson = avroSchema(schema).toString
    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (overwrite && fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    df.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val target = new Path(path, f"part-$pid%05d.avro")
        val tfs = target.getFileSystem(new Configuration())
        val avro = new Schema.Parser().parse(avroJson)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avro))
        writer.setCodec(codec match {
          case "null" => CodecFactory.nullCodec()
          case "deflate" => CodecFactory.deflateCodec(6)
          case other => CodecFactory.fromString(other)
        })
        writer.create(avro, tfs.create(target, true))
        try it.foreach { row =>
          val rec = new GenericData.Record(avro)
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            rec.put(f.name, toAvro(row.get(i), f.dataType,
              avro.getField(f.name).schema()))
          }
          writer.append(rec)
        } finally writer.close()
      }
    }
  }
}
