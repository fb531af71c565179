package org.apache.spark.sql

import java.io.ByteArrayInputStream
import java.nio.channels.Channels

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.VectorLoader
import org.apache.arrow.vector.ipc.ReadChannel
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.spark.TaskContext
import org.apache.spark.sql.execution.arrow.ArrowConverters

/** Scala-side Arrow columnar seam — the `mapInArrow` seat PySpark has and
  * the classic Scala API does not.
  *
  * `mapArrowBatches` hands a user function genuinely columnar
  * `VectorSchemaRoot` batches of the input rows (built by Spark's own
  * `ArrowConverters`, the machinery under PySpark's `mapInArrow`), one
  * batch of up to `batchSize` rows at a time. This is the seat where a
  * vectorized media decoder (JNI image/audio codec reading the binary
  * payload vector zero-copy) plugs in: per-batch columnar access, no
  * per-row boxing, no driver involvement — each task converts and decodes
  * its own partitions.
  *
  * The function's output is ordinary rows (the decode result is a new
  * relation, so it re-enters Tungsten through an Encoder); the root is
  * reused across batches and freed on task completion.
  */
object GraftArrow {

  def mapArrowBatches[T: Encoder: scala.reflect.ClassTag](
      df: DataFrame, batchSize: Int)(
      f: VectorSchemaRoot => Iterator[T]): Dataset[T] = {
    val spark = df.sparkSession
    val schema = df.schema
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val rdd = df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd
      .mapPartitions { rows =>
        val ctx = TaskContext.get()
        val allocator = util.ArrowUtils.rootAllocator
          .newChildAllocator("graftArrowBatches", 0, Long.MaxValue)
        val arrowSchema = util.ArrowUtils.toArrowSchema(schema, tz,
          errorOnDuplicatedFieldNames = true, largeVarTypes = false)
        val root = VectorSchemaRoot.create(arrowSchema, allocator)
        val loader = new VectorLoader(root)
        if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
          root.close(); allocator.close()
        }
        val batches = ArrowConverters.toBatchIterator(
          rows, schema, batchSize.toLong, tz,
          errorOnDuplicatedFieldNames = true, largeVarTypes = false, ctx)
        batches.flatMap { bytes =>
          val batch = MessageSerializer.deserializeRecordBatch(
            new ReadChannel(Channels.newChannel(new ByteArrayInputStream(bytes))),
            allocator)
          try loader.load(batch) finally batch.close()
          f(root)
        }
      }
    spark.asInstanceOf[classic.SparkSession].createDataset(rdd)(
      implicitly[Encoder[T]])
  }
}
