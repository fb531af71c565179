package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 SINK with the full two-phase commit protocol — the
  * transactional-batch seat of the reference's S3/RDS workers
  * (`rdsworker.py:38-141` wraps each page in a DB transaction;
  * `s3worker.py` one object per record): every task writes its partition
  * to a TEMP file, task `commit()` hands the driver a commit message, and
  * only the driver's job-level `commit()` renames temps into place and
  * writes the `_MANIFEST.tsv` naming exactly the committed files — a
  * reader that trusts the manifest never sees a torn job. Task `abort()`
  * deletes its temp; job `abort()` sweeps the temp dir; Spark's commit
  * coordinator (on by default for batch writes) guarantees one committed
  * attempt per partition, so speculative retries cannot double-write.
  *
  * Rows land as TSV (atomic types; tab/newline/backslash escaped) — the
  * codec is deliberately boring because the PROTOCOL is the artifact: a
  * JDBC/Kafka binding replaces the file IO in [[ManifestDataWriter]] with
  * a transaction/producer and keeps every commit hook as-is.
  */
class ManifestSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"
  override def supportsExternalMetadata(): Boolean = true
  // write-only source: reads go through spark.read.csv over the files
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil)
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ManifestTable(opts.get("path"), schema)
  }
}

class ManifestTable(path: String, writeSchema: StructType)
  extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "graft-manifest needs option 'path'")
  override def name(): String = s"graft_manifest($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ManifestBatchWrite(path, info.schema(), doTruncate)
        override def toStreaming: streaming.StreamingWrite =
          new ManifestStreamingWrite(path, info.schema())
      }
    }
}

/** Streaming flavor of the manifest protocol: one manifest PER EPOCH
  * (`_MANIFEST-<epoch>.tsv`), committed atomically after the epoch's
  * files land. Replayed epochs (restart from checkpoint re-running the
  * last uncommitted batch) are IDEMPOTENT: an existing epoch manifest
  * short-circuits the commit and the replay's temps are swept — the
  * batchId-keyed exactly-once discipline `idempotentBatchWriter` applies
  * to foreachBatch, here at the native sink layer. */
class ManifestStreamingWrite(path: String, schema: StructType)
  extends streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory = {
    Files.createDirectories(Paths.get(path, "_tmp"))
    new ManifestStreamingWriterFactory(path, schema)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    val manifest = dir.resolve(s"_MANIFEST-$epochId.tsv")
    if (Files.exists(manifest)) {
      // replayed epoch: already committed once — drop the replay's temps
      messages.map(_.asInstanceOf[FileCommit])
        .foreach(m => Files.deleteIfExists(Paths.get(m.tempPath)))
    } else {
      val lines = messages.map(_.asInstanceOf[FileCommit])
        .sortBy(_.finalName).map { m =>
          Files.move(Paths.get(m.tempPath), dir.resolve(m.finalName),
            StandardCopyOption.ATOMIC_MOVE)
          s"${m.finalName}\t${m.rows}"
        }
      Files.write(manifest,
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: FileCommit => Files.deleteIfExists(Paths.get(m.tempPath))
      case _ =>
    }
}

class ManifestStreamingWriterFactory(path: String, schema: StructType)
  extends streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(path, schema, partitionId, taskId,
      epochPrefix = s"epoch-$epochId-")
}

case class FileCommit(tempPath: String, finalName: String, rows: Long)
  extends WriterCommitMessage

class ManifestBatchWrite(path: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(path, "_tmp"))
    new ManifestWriterFactory(path, schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    if (truncate) {
      val old = Files.list(dir).iterator()
      while (old.hasNext) {
        val p = old.next()
        if (p.getFileName.toString.endsWith(".tsv")) Files.delete(p)
      }
    }
    val lines = messages.map(_.asInstanceOf[FileCommit]).sortBy(_.finalName)
      .map { m =>
        Files.move(Paths.get(m.tempPath), dir.resolve(m.finalName),
          StandardCopyOption.ATOMIC_MOVE)
        s"${m.finalName}\t${m.rows}"
      }
    Files.write(dir.resolve("_MANIFEST.tsv"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    sweepTmp()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = sweepTmp()

  private def sweepTmp(): Unit = {
    val tmp = Paths.get(path, "_tmp")
    if (Files.exists(tmp)) {
      val it = Files.list(tmp).iterator()
      while (it.hasNext) Files.deleteIfExists(it.next())
      Files.deleteIfExists(tmp)
    }
  }
}

class ManifestWriterFactory(path: String, schema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(path, schema, partitionId, taskId)
}

class ManifestDataWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long, epochPrefix: String = "")
  extends DataWriter[InternalRow] {

  private val tempPath = Paths.get(path, "_tmp",
    s"${epochPrefix}part-$partitionId-attempt-$taskId.tsv")
  private val out = Files.newBufferedWriter(tempPath, StandardCharsets.UTF_8)
  private var rows = 0L

  private def esc(s: String): String = s
    .replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  override def write(row: InternalRow): Unit = {
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) "\\N"
      else f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType => esc(row.getUTF8String(i).toString)
        case dt => throw new IllegalArgumentException(
          s"graft-manifest sink handles atomic types, got $dt for ${f.name}")
      }
    }
    out.write(cells.mkString("\t"))
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    FileCommit(tempPath.toString,
      f"${epochPrefix}part-$partitionId%05d.tsv", rows)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(tempPath)
  }

  override def close(): Unit = ()
}
