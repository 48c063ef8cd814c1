package graft

import java.nio.file.Files
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.CommitConflictException
import graft.table.DeltaTable

/**
 * Concurrent DML torture: 3 racing writer threads fire mixed
 * DELETE/UPDATE/MERGE/OPTIMIZE at one table — some ops scoped to a
 * worker-private partition (should interleave cleanly under the conflict
 * matrix's stats/partition read-set check), some deliberately overlapping a
 * shared partition (should either serialize via retry or raise one of the
 * documented Concurrent*Exception kinds; never corrupt).
 *
 * Oracle: serializability. Every mutating op embeds a unique nonce in its
 * predicate / merge condition (DELETE/UPDATE/MERGE record the predicate in
 * CommitInfo.operationParameters, Dml.scala:190,491 / Merge.scala:461), and
 * its state-deterministic effect function is registered up front. After the
 * race, the commit log is replayed IN COMMIT ORDER, each commit's nonce
 * selects its effect, and the folded model must equal the final table
 * exactly — a lost update (an op admitted by the conflict checker whose
 * read snapshot missed a winner it semantically depended on) shows up as a
 * model/table divergence. Mirrors the reference's conflict-matrix tests
 * (crates/core/src/kernel/transaction/conflict_checker.rs) but end-to-end
 * through real racing commits rather than replaying synthetic winners.
 */
class ConcurrentDmlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test-concurrent-dml")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // model: id -> v (partition col p is always id % 4, so not tracked)
  private type Model = Map[Long, String]
  private type Effect = Model => Model

  private def run(seed: Long, dvMode: Boolean): Unit = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_concdml_$seed").toString + "/t"
    val conf = if (dvMode) Map("delta.enableDeletionVectors" -> "true")
               else Map.empty[String, String]

    val initial: Model = (0L until 200L).map(i => i -> s"v$i").toMap
    DeltaTable.write(spark,
      initial.toSeq.map { case (k, v) => (k, k % 4, v) }.toDF("id", "p", "v"),
      dir, partitionBy = Seq("p"), configuration = conf)

    val effects = new ConcurrentHashMap[String, Effect]()
    val conflicts = new AtomicInteger(0)
    val mutatingOps = new AtomicInteger(0)
    val errors = new ConcurrentHashMap[String, Throwable]()

    val nWorkers = 3
    val opsPerWorker = 5
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nWorkers)

    (0 until nWorkers).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          start.await()
          val rnd = new Random(seed * 31 + w)
          var freshId = 10000L * (w + 1)
          (0 until opsPerWorker).foreach { step =>
            val nonce = s"nz${w}_${step}_$seed"
            val t = DeltaTable.forPath(spark, dir)
            // even steps target the worker-private partition (disjoint —
            // expected to interleave); odd steps the shared partition 3
            val part = if (step % 2 == 0) w else 3
            val opKind = rnd.nextInt(6)
            try {
              opKind match {
                case 0 | 1 => // partition-scoped delete
                  val m = 3 + rnd.nextInt(4)
                  val r = rnd.nextInt(m)
                  effects.put(nonce, (mo: Model) => mo.filter { case (k, _) =>
                    !(k % 4 == part && k % m == r) })
                  mutatingOps.incrementAndGet()
                  t.delete(Some(s"p = $part AND id % $m = $r AND '$nonce' <> ''"))
                case 2 | 3 => // partition-scoped update, order-sensitive value
                  val m = 3 + rnd.nextInt(4)
                  val r = rnd.nextInt(m)
                  effects.put(nonce, (mo: Model) => mo.map { case (k, v) =>
                    k -> (if (k % 4 == part && k % m == r) v + s"_$nonce" else v) })
                  mutatingOps.incrementAndGet()
                  t.update(Map("v" -> concat(col("v"), lit(s"_$nonce"))),
                    Some(s"p = $part AND id % $m = $r AND '$nonce' <> ''"))
                case 4 => // merge upsert: a few shared existing ids + fresh ids
                  val existing = rnd.shuffle((0L until 200L).toList).take(4)
                  val fresh = (0 until 3).map(_ => { freshId += 1; freshId })
                  val srcRows = (existing ++ fresh).map(i => (i, i % 4, s"m${nonce}_$i"))
                  effects.put(nonce, (mo: Model) =>
                    mo ++ srcRows.map { case (i, _, v) => i -> v })
                  mutatingOps.incrementAndGet()
                  val src = srcRows.toDF("id", "p", "v")
                  t.merge(src, s"target.id = source.id AND '$nonce' <> ''")
                    .whenMatchedUpdateAll()
                    .whenNotMatchedInsertAll()
                    .execute()
                case 5 => // optimize: content-identity, races the DML commits
                  t.optimizeCompact()
              }
            } catch {
              case _: CommitConflictException =>
                if (opKind != 5) conflicts.incrementAndGet()
            }
          }
        } catch {
          case e: Throwable => errors.put(s"worker$w", e)
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "workers timed out")
    assert(errors.isEmpty, s"unexpected worker failures: ${errors}")

    // replay the commit log in order, folding each commit's effect
    val t = DeltaTable.forPath(spark, dir)
    val commits = t.history().sortBy(_._1)
    var model = initial
    var applied = 0
    commits.foreach { case (version, _, ciOpt) =>
      if (version > 0) {
        val ci = ciOpt.getOrElse(fail(s"version $version has no CommitInfo"))
        ci.operation match {
          case "DELETE" | "UPDATE" | "MERGE" =>
            val pred = ci.operationParameters.getOrElse("predicate",
              fail(s"version $version ${ci.operation} lacks a predicate param"))
            val nonce = effects.keySet().toArray(Array.empty[String])
              .find(pred.contains)
              .getOrElse(fail(s"version $version predicate '$pred' matches no nonce"))
            model = effects.get(nonce)(model)
            applied += 1
          case "OPTIMIZE" => // contents unchanged
          case other => fail(s"unexpected operation '$other' at version $version")
        }
      }
    }

    val got = t.toDF.select($"id", $"v").as[(Long, String)].collect().toMap
    assert(got == model,
      s"seed=$seed dv=$dvMode: table diverged from serial replay of ${applied} commits " +
        s"(${conflicts.get()} conflicts); missing=${(model.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- model.keySet).take(5)} " +
        s"valueDiffs=${model.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
    assert(applied + conflicts.get() == mutatingOps.get(),
      s"op accounting broken: applied=$applied conflicts=${conflicts.get()} " +
        s"issued=${mutatingOps.get()}")
    assert(applied > 0, "no mutating op committed — race never exercised the commit path")
    info(s"seed=$seed dv=$dvMode: $applied commits applied, ${conflicts.get()} conflicts, " +
      s"${t.version + 1} versions")
  }

  test("racing DELETE/UPDATE/MERGE/OPTIMIZE serialize without lost updates (seed 11)") {
    run(seed = 11L, dvMode = false)
  }

  test("racing DML serializes without lost updates (DV mode, seed 23)") {
    run(seed = 23L, dvMode = true)
  }

  test("racing DML serializes without lost updates (seed 37)") {
    run(seed = 37L, dvMode = false)
  }
}
