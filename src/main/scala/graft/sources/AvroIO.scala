package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Avro container-file round-trip on avro-core alone (reference:
 * flink-formats/flink-avro/src/main/java/org/apache/flink/formats/avro/
 * AvroRowDataSerializationSchema.java — record-level Avro (de)ser).
 *
 * Spark's own `format("avro")` lives in the separate spark-avro
 * connector jar; when that jar is present it is strictly preferred
 * (vectorized reader, full logical-type matrix, committer-protocol
 * writes). This utility exists for environments that ship only Avro
 * CORE (avro-x.y.z.jar is an unconditional Spark dependency), so the
 * format row in SURVEY §2.1 is executable everywhere:
 *
 * - write: one Avro container file PER PARTITION, each task streaming
 *   its rows through a `DataFileWriter` straight to the (possibly
 *   distributed) filesystem — no driver funnel, no in-memory file
 *   buffering; task retries overwrite their own part file
 *   (deterministic name, `overwrite=true` create), so replays are
 *   idempotent at the file level.
 * - read: file list parallelized one task per container file, each
 *   task streaming records through a `DataFileStream` over the opened
 *   HDFS/local stream — files are never materialized whole.
 *
 * Schema support is the flat primitive core (long/int/double/float/
 * string/boolean/binary, all nullable) — the slice the format battery
 * round-trips. Avro `Schema` is not serializable, so tasks carry the
 * schema JSON and re-parse.
 */
object AvroIO {

  private def avroType(dt: DataType): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case other => throw new IllegalArgumentException(
      s"AvroIO supports flat primitive columns; got $other")
  }

  private[graft] def toAvroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.toSeq.map { f =>
      val nullable = Schema.createUnion(
        List(Schema.create(Schema.Type.NULL), avroType(f.dataType)).asJava)
      new Schema.Field(f.name, nullable, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.asJava)
  }

  private def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG    => LongType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.UNION => // [null, T] unions from toAvroSchema
      toSparkType(s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get)
    case other => throw new IllegalArgumentException(
      s"AvroIO cannot map avro type $other")
  }

  private[graft] def toStructType(s: Schema): StructType =
    StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name, toSparkType(f.schema), nullable = true)))

  /** Write `df` to `path` as one Avro container file per partition. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val schemaJson = toAvroSchema(df.schema, "row").toString
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val out = new Path(path)
    val fs = out.getFileSystem(hconf.value)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val nCols = df.schema.length
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      // Task-committer discipline in miniature: stream to an
      // attempt-suffixed dot-file (invisible to the reader's `*.avro`
      // glob), then delete-and-rename into place — so a speculative or
      // retried attempt never interleaves bytes with a winner, and a
      // killed attempt leaves only an ignorable temp.
      val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
      val fsys = new Path(path).getFileSystem(hconf.value)
      val part = new Path(path, f"part-$idx%05d.avro")
      val tmp = new Path(path, f".part-$idx%05d.attempt-$attempt")
      val os = fsys.create(tmp, true)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, os)
      var n = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < nCols) {
          rec.put(i, row.get(i) match {
            case a: Array[Byte] => java.nio.ByteBuffer.wrap(a)
            case v => v
          })
          i += 1
        }
        w.append(rec)
        n += 1
      }
      w.close() // closes os
      if (fsys.exists(part)) fsys.delete(part, false)
      if (!fsys.rename(tmp, part))
        throw new java.io.IOException(s"commit failed: $tmp -> $part")
      Iterator.single(n)
    }.count(): Unit
  }

  /** Read a directory of Avro container files written by [[write]] (or
    * any flat-primitive-schema avro files), one task per file. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    val fs = dir.getFileSystem(hconf.value)
    val files = fs.globStatus(new Path(dir, "*.avro"))
      .map(_.getPath.toString).sorted.toSeq
    require(files.nonEmpty, s"no .avro files under $path")
    // schema from the first container's metadata (driver-side, one
    // small header read)
    val head = new DataFileStream(
      fs.open(new Path(files.head)),
      new GenericDatumReader[GenericRecord]())
    val schema = try head.getSchema finally head.close()
    val sparkSchema = toStructType(schema)
    val nCols = sparkSchema.length
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val in = new Path(p)
          val stream = new DataFileStream(
            in.getFileSystem(hconf.value).open(in),
            new GenericDatumReader[GenericRecord]())
          new Iterator[Row] {
            def hasNext: Boolean = {
              val h = stream.hasNext
              if (!h) stream.close()
              h
            }
            def next(): Row = {
              val rec = stream.next()
              Row.fromSeq((0 until nCols).map { i =>
                rec.get(i) match {
                  case u: Utf8 => u.toString
                  case b: java.nio.ByteBuffer =>
                    val a = new Array[Byte](b.remaining()); b.get(a); a
                  case v => v
                }
              })
            }
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
