package graft.sources

import java.io.ByteArrayOutputStream

import scala.collection.JavaConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container source/sink built directly on the Avro CORE library
  * (`org.apache.avro` ships with Spark; the separate `spark-avro`
  * DataSource module does not in this environment) — the same pattern
  * as the multimodal codecs: Spark owns distribution and the schema,
  * the codec work is partition-local.
  *
  *  - [[write]]: one `.avro` object-container file per partition via
  *    `foreachPartition` + `DataFileWriter` — a distributed sink, no
  *    driver funnel; the Avro schema is derived from the DataFrame
  *    schema (primitive types, nullable unions) and serialized to the
  *    executors as its canonical JSON.
  *  - [[read]]: `binaryFile` scan + partition-local `DataFileReader`
  *    decode — parallelism is file-count-shaped, the right unit for
  *    Avro (container blocks make single files splittable, but a
  *    corpus drop is many files; one task per file is the Parquet-side
  *    granularity too). The Spark schema comes from the first file's
  *    embedded writer schema, so round-trips are self-describing.
  *
  * Supported field types: LONG, INT, DOUBLE, FLOAT, BOOLEAN, STRING,
  * BINARY, and ARRAY of any supported type (so the engine's
  * `array<float>` embedding column round-trips) — the TESTDATA
  * surface. Nulls map to `union(null, T)` both ways. Spec-pinned: the
  * round trip, null cells, and corrupt-payload totality (a non-Avro
  * file yields zero rows, not a dead stage).
  *
  * Contracts: single WRITER per directory at a time (the
  * [[GenerationedTable]] discipline). Task RETRY and SPECULATION are
  * both safe: every attempt writes to an attempt-unique
  * `part-<pid>.avro.tmp-<attempt>` and renames into place only after a
  * clean close, so the committed `part-<pid>.avro` is always one
  * attempt's complete stream — a losing attempt finds the destination
  * taken, discards its temp, and succeeds (round-10 advice: the
  * previous overwrite-in-place write let two live attempts interleave
  * one stream). Per-file size is bounded by the upstream partition
  * size and must stay under the `binaryFile` 2 GiB content cap —
  * `repartition` the frame before writing if a partition could exceed
  * it. The Avro schema is committed alongside the data
  * (`_AVRO_SCHEMA.json`, written before the `_AVRO_SUCCESS` marker),
  * so an empty or fully-filtered frame still round-trips: zero part
  * files under a committed marker read back as an empty DataFrame
  * with the written schema (round-10 advice). */
object AvroTable {

  private def avroType(dt: DataType): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case ArrayType(el, containsNull) =>
      val inner = avroType(el)
      Schema.createArray(
        if (containsNull)
          Schema.createUnion(List(Schema.create(Schema.Type.NULL), inner).asJava)
        else inner)
    case other => throw new IllegalArgumentException(
      s"AvroTable does not support $other")
  }

  /** Avro record schema for a Spark schema (nullable → union). */
  private[sources] def avroSchemaFor(schema: StructType): Schema = {
    val fields = schema.fields.map { f =>
      val base = avroType(f.dataType)
      val t = if (f.nullable)
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), base).asJava)
      else base
      new Schema.Field(f.name, t, null.asInstanceOf[String])
    }
    val rec = Schema.createRecord("row", null, "graft", false)
    rec.setFields(fields.toList.asJava)
    rec
  }

  private def sparkType(s: Schema): DataType = {
    val eff = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s
    eff.getType match {
      case Schema.Type.LONG    => LongType
      case Schema.Type.INT     => IntegerType
      case Schema.Type.DOUBLE  => DoubleType
      case Schema.Type.FLOAT   => FloatType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.STRING  => StringType
      case Schema.Type.BYTES   => BinaryType
      case Schema.Type.ARRAY   =>
        ArrayType(sparkType(eff.getElementType),
          eff.getElementType.getType == Schema.Type.UNION)
      case other => throw new IllegalArgumentException(
        s"AvroTable does not support avro $other")
    }
  }

  private def fromAvro(v: Any): Any = v match {
    case null                     => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer   =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case l: java.util.Collection[_] =>
      l.asScala.toSeq.map(fromAvro)
    case x                        => x
  }

  private def toAvro(v: Any): Any = v match {
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case s: scala.collection.Seq[_] => s.map(toAvro).asJava
    case x => x
  }

  /** Write `df` as one Avro container file per partition under `dir`
    * (`part-<n>.avro`), then commit `_AVRO_SCHEMA.json` followed by an
    * `_AVRO_SUCCESS` marker — readers of a crashed partial write see no
    * marker. Existing contents are replaced. Each task attempt writes
    * its own temp file and renames in, so retried/speculative attempts
    * never share a stream. */
  def write(df: DataFrame, dir: String): Unit = {
    val s = df.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.mkdirs(p)
    val schemaJson = avroSchemaFor(df.schema).toString
    val names = df.schema.fieldNames
    // the SESSION's Hadoop configuration must travel to the executors —
    // a vanilla `new Configuration()` there would ignore fs.defaultFS /
    // credentials set on the session, landing part files on a different
    // filesystem than the driver-side directory and commit marker
    val confKv: Array[(String, String)] = {
      val it = s.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val schema = new Schema.Parser().parse(schemaJson)
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val conf = new Configuration()
        confKv.foreach { case (k, v) => conf.set(k, v) }
        val part = new Path(s"$dir/part-$pid.avro")
        // attempt-unique temp: two live attempts of the same partition
        // (speculation, or a zombie first attempt) each stream to their
        // own file; only a cleanly-closed file renames into place
        val tmp = new Path(s"$dir/part-$pid.avro.tmp-${tc.taskAttemptId()}")
        val efs = part.getFileSystem(conf)
        val out = efs.create(tmp, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        var ok = false
        try {
          w.create(schema, out)
          rows.foreach { r =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < names.length) {
              rec.put(names(i), toAvro(r.get(i)))
              i += 1
            }
            w.append(rec)
          }
          ok = true
        } finally w.close() // closes the stream
        if (ok) {
          // losing a rename race is FINE: the destination then holds a
          // rival attempt's complete file for the same partition
          if (!efs.rename(tmp, part) && !efs.exists(part))
            throw new IllegalStateException(s"rename $tmp -> $part failed")
        }
        efs.delete(tmp, false)
        ()
      }
    }
    val sOut = fs.create(new Path(p, "_AVRO_SCHEMA.json"), true)
    try sOut.write(schemaJson.getBytes("UTF-8")) finally sOut.close()
    fs.create(new Path(p, "_AVRO_SUCCESS"), true).close()
  }

  /** Read every `part-*.avro` under `dir` back as a DataFrame; schema
    * from the first file's embedded writer schema. Undecodable payloads
    * contribute zero rows (total on garbage, the codec-family
    * contract). */
  def read(s: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(p, "_AVRO_SUCCESS")),
      s"no committed avro table at $dir")
    val candidates = fs.globStatus(new Path(p, "part-*.avro"))
    // the committed schema file is authoritative (written by the same
    // commit that wrote the marker) — and it is what lets a
    // legitimately EMPTY committed table (zero part files) read back
    // as an empty frame instead of dying on a glob miss
    val committedSchema: Option[Schema] = {
      val sp = new Path(p, "_AVRO_SCHEMA.json")
      if (!fs.exists(sp)) None
      else {
        val in = fs.open(sp)
        val txt = try {
          val buf = new ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          buf.toString("UTF-8")
        } finally in.close()
        Some(new Schema.Parser().parse(txt))
      }
    }
    if (candidates.isEmpty && committedSchema.isEmpty)
      throw new IllegalStateException(s"no avro files in $dir")
    // fallback schema source for pre-schema-file dirs: the FIRST file
    // whose header parses — a corrupt file that happens to sort first
    // must not kill the read (it contributes zero rows downstream, the
    // same totality every file gets)
    def headerOf(f: org.apache.hadoop.fs.FileStatus): Option[Schema] =
      try {
        val in = fs.open(f.getPath)
        val headerBytes =
          try {
            val buf = new ByteArrayOutputStream()
            val chunk = new Array[Byte](64 * 1024)
            var n = in.read(chunk)
            while (n > 0 && buf.size() < (1 << 20)) {
              buf.write(chunk, 0, n); n = in.read(chunk)
            }
            buf.toByteArray
          } finally in.close()
        Some(new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(headerBytes),
          new GenericDatumReader[GenericRecord]()).getSchema)
      } catch { case _: Exception => None }
    val writerSchema = committedSchema.getOrElse(
      candidates.iterator.map(headerOf)
        .collectFirst { case Some(sch) => sch }
        .getOrElse(throw new IllegalStateException(
          s"no decodable avro file in $dir")))
    val sparkSchema = StructType(writerSchema.getFields.asScala.toSeq.map(f =>
      StructField(f.name(), sparkType(f.schema()),
        f.schema().getType == Schema.Type.UNION)))
    val names = sparkSchema.fieldNames
    if (candidates.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], sparkSchema)
    else {
      import s.implicits._
      // list the part files HERE, once, and hand Spark concrete paths —
      // an analysis-time re-glob over the directory would race any
      // concurrent rewrite of it (the round-10 transient bench failure)
      val rows = s.read.format("binaryFile")
        .load(candidates.map(_.getPath.toString): _*)
        .select("content").as[Array[Byte]]
        .rdd // genuine per-partition imperative decode, the RDD carve-out
        .flatMap { bytes =>
          try {
            val r = new DataFileReader[GenericRecord](
              new SeekableByteArrayInput(bytes),
              new GenericDatumReader[GenericRecord]())
            val out = scala.collection.mutable.ArrayBuffer.empty[Row]
            while (r.hasNext) {
              val rec = r.next()
              out += Row.fromSeq(names.toSeq.map(n => fromAvro(rec.get(n))))
            }
            r.close()
            out
          } catch { case _: Exception => Seq.empty[Row] }
        }
      s.createDataFrame(rows, sparkSchema)
    }
  }
}
