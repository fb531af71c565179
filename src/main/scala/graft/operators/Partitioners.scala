package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic partition-assignment operators.
  *
  * The reference picks the Kafka partition per record with an nginx-style
  * smooth weighted round-robin over a `(partition, weight)` list parsed from
  * `kafka.partitions = "0:3,1:1"` (`/root/reference/wadlabs/hub/migration/
  * roundrobin.py:5-42`, used at `kafkaworker.py:40-55`); classic GCD-weighted
  * and basic `itertools.cycle` variants exist as library code
  * (`roundrobin.py:44-77`).
  *
  * A mutable round-robin counter is driver-state the Spark execution model
  * rejects (non-deterministic under retry). The smooth-WRR schedule, however,
  * is *periodic with period = total weight*, so the whole operator collapses
  * to a precomputed schedule array indexed by a deterministic row number:
  * `schedule[(rn - 1) % total]`. That is retry-safe, codegen'd, and at scale
  * needs no coordination at all — each task computes its rows' partitions
  * locally.
  */
object Partitioners {

  /** Parse the reference's `"0:3,1:1"` partition-weight config
    * (`kafkaworker.py:40-48`). */
  def parseWeights(cfg: String): Seq[(Int, Int)] =
    cfg.split(",").toSeq.filter(_.nonEmpty).map { kv =>
      val Array(p, w) = kv.trim.split(":")
      (p.trim.toInt, w.trim.toInt)
    }

  /** One full period of the smooth weighted round-robin schedule
    * (`roundrobin.py:5-42` semantics: each step add weight to each current,
    * emit the max — first wins ties — then subtract total from it).
    * For weights 0:3,1:1 the period is `[0, 0, 1, 0]` (FIXTURES.md B.5).
    */
  def smoothSchedule(weights: Seq[(Int, Int)]): Seq[Int] = {
    val total = weights.map(_._2).sum
    val current = Array.fill(weights.size)(0)
    (0 until total).map { _ =>
      for (j <- weights.indices) current(j) += weights(j)._2
      val best = current.indices.maxBy(j => (current(j), -j))
      current(best) -= total
      weights(best)._1
    }
  }

  /** Classic GCD weighted round-robin period (`roundrobin.py:44-70`): cycle
    * i; on wrap decrease the current-weight threshold by the GCD; emit every
    * server whose weight >= threshold. */
  def weightedSchedule(weights: Seq[(Int, Int)]): Seq[Int] = {
    val ws = weights.map(_._2)
    val gcd = ws.reduce((a, b) => BigInt(a).gcd(BigInt(b)).toInt)
    val maxW = ws.max
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var cw = maxW
    while (out.size < ws.sum) {
      for (((p, w), _) <- weights.zipWithIndex if w >= cw && out.size < ws.sum)
        out += p
      cw -= gcd
      if (cw <= 0) cw = maxW
    }
    out.toSeq
  }

  /** Partition for a 1-based deterministic row number, by schedule lookup. */
  def assign(rowNumber1Based: Column, schedule: Seq[Int]): Column = {
    require(schedule.nonEmpty, "empty partition schedule")
    element_at(
      array(schedule.map(lit): _*),
      (pmod(rowNumber1Based - lit(1), lit(schedule.size)) + lit(1)).cast("int"))
  }

  /** Smooth-WRR partition column straight from the config string. */
  def smoothAssign(rowNumber1Based: Column, cfg: String): Column =
    assign(rowNumber1Based, smoothSchedule(parseWeights(cfg)))

  /** Basic round-robin (`roundrobin.py:72-77`): rn % n. */
  def basicAssign(rowNumber1Based: Column, numPartitions: Int): Column =
    pmod(rowNumber1Based - lit(1), lit(numPartitions)).cast("int")

  /** SCALE-PATH weighted assignment: a stateless hash of the record key into
    * a weight-expanded partition array (weights "0:3,1:1" -> [0,0,0,1]) — the
    * broker-side-hash-partitioner seat. Per-row narrow map: no row counter,
    * no global window, retry-safe, and identical on any cluster layout. Each
    * partition receives its weight share in expectation (uniform 32-bit md5
    * slice mod the expanded size) rather than the WRR's exact schedule — the
    * trade a 100 TB pipeline makes to avoid a global order. md5 on purpose:
    * the correctness gate recomputes the assignment in SQL. */
  def hashWeightedAssign(key: Column, cfg: String): Column = {
    val expanded = parseWeights(cfg).flatMap { case (p, w) => Seq.fill(w)(p) }
    require(expanded.nonEmpty, "empty partition weights")
    // hex chars 25..32 of the md5 digest = an independent uniform 32-bit slice
    val h = conv(substring(md5(key.cast("string")), 25, 8), 16, 10).cast("long")
    element_at(array(expanded.map(lit): _*),
      (pmod(h, lit(expanded.size)) + lit(1)).cast("int"))
  }
}
