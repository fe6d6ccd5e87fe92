package graft.ops

import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Writer-writer interleaving on one SnapshotTable (VERDICT r9 #4): the
  * manifest CAS is the single linearization point, so under a PLANTED race
  * exactly one writer per version wins, the loser's data never becomes
  * visible, retried writers serialize to a state some serial order would
  * produce, no version is lost or duplicated, and the CDC chain telescopes
  * to the final table. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("planted CAS race: exactly one winner per version, loser's orphan swept") {
    val root = s"${tmpDir()}/t"
    SnapshotTable.commit(spark, root, Seq((0L, "base")).toDF("k", "v"))
    val barrier = new CyclicBarrier(2)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Long]]()
    val pool = Executors.newFixedThreadPool(2)
    (1 to 2).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val df = Seq((i.toLong, s"writer$i")).toDF("k", "v")
          barrier.await() // both target version 1 simultaneously
          outcomes.add(
            try Right(SnapshotTable.commitAt(spark, root, 1L, df))
            catch { case e: Throwable => Left(e) })
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val res = outcomes.toArray(Array.empty[Either[Throwable, Long]]).toSeq
    assert(res.count(_.isRight) == 1, s"exactly one writer must win: $res")
    assert(res.collect { case Left(e) => e }
      .forall(_.isInstanceOf[SnapshotTable.ConcurrentWriteException]))
    // the committed version is EXACTLY one writer's rows, never a blend
    val v1 = SnapshotTable.read(spark, root, Some(1L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1 == Set((1L, "writer1")) || v1 == Set((2L, "writer2")), s"got $v1")
    // the loser cleaned its own snapshot dir (readers can't see it anyway,
    // but the orphan must not wait for vacuum when the loser is alive)
    val dirs = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("snap-00000001")).length
    assert(dirs == 1, s"loser's snap dir must be removed (found $dirs)")
  }

  test("racing upserts serialize: final state = serial result, versions gapless, CDC telescopes") {
    val root = s"${tmpDir()}/t"
    SnapshotTable.upsert(spark, root,
      (0L until 40L).map(k => (k, "base", 0.0)).toDF("k", "who", "v"), Seq("k"))
    val threads = 4
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(threads)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until threads).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          // each writer owns a disjoint key stripe: any serial order of
          // the four upserts produces the same final table
          val mine = (0L until 40L).filter(_ % threads == i)
            .map(k => (k, s"w$i", k * 1.5)).toDF("k", "who", "v")
          var done = false
          while (!done) {
            try { SnapshotTable.upsert(spark, root, mine, Seq("k")); done = true }
            catch {
              case _: SnapshotTable.ConcurrentWriteException => () // re-loop
              case e: Throwable => failures.add(e); done = true
            }
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"unexpected failures: $failures")

    val fin = SnapshotTable.read(spark, root)
    val got = fin.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val want = (0L until 40L).map(k => (k, s"w${k % threads}", k * 1.5)).toSet
    assert(got == want, "final state must equal the (unique) serial result")

    // no version lost or duplicated: the manifest log is gapless 0..max
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new org.apache.hadoop.fs.Path(root, "_manifests"))
      .map(_.getPath.getName).collect {
        case n if n.matches("manifest-\\d{8}\\.json") => n.substring(9, 17).toLong
      }.sorted.toSeq
    assert(versions == (0L to versions.max), s"gapless versions expected: $versions")

    // CDC chain stays consistent across every interleaving: adds minus
    // removes (multiset) telescopes to the final table
    val Some((adds, removes)) = SnapshotTable.changesDelta(spark, root, -1L)
    val net = adds.exceptAll(removes)
    assert(net.exceptAll(fin).isEmpty && fin.exceptAll(net).isEmpty,
      "CDC chain must telescope exactly to the final state")
  }

  test("mixed append/upsert/delete race: commutative ops reach the serial state") {
    val root = s"${tmpDir()}/t"
    SnapshotTable.upsert(spark, root,
      (0L until 30L).map(k => (k, "base")).toDF("k", "v"), Seq("k"))
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(3)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def race(body: => Unit): Unit = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        var done = false
        while (!done) {
          try { body; done = true }
          catch {
            case _: SnapshotTable.ConcurrentWriteException => ()
            case e: Throwable => failures.add(e); done = true
          }
        }
      }
    })
    // ops touch disjoint key stripes, so they commute: %3==0 deleted,
    // %3==1 upsert-updated, and the appended keys are all ≡1 mod 3 so no
    // serial order lets the delete claim them (every serial order yields
    // the same final state — the strongest assertable form).
    val appended = Seq(100L, 103L, 106L, 109L, 112L)
    race(SnapshotTable.delete(spark, root, col("k") % 3 === 0))
    race(SnapshotTable.upsert(spark, root,
      (0L until 30L).filter(_ % 3 == 1).map(k => (k, "upd")).toDF("k", "v"), Seq("k")))
    race(SnapshotTable.appendOnce(spark, root,
      appended.map(k => (k, "app")).toDF("k", "v"), "conc-spec", 0L))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"unexpected failures: $failures")
    val got = SnapshotTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want =
      (0L until 30L).filter(_ % 3 == 1).map(k => (k, "upd")).toSet ++
      (0L until 30L).filter(_ % 3 == 2).map(k => (k, "base")).toSet ++
      appended.map(k => (k, "app")).toSet
    assert(got == want, s"must reach the serial state; diff=${got.diff(want)} / ${want.diff(got)}")
  }

  test("concurrent overwriteWhere on disjoint regions: CAS serializes, both land") {
    val root = s"${tmpDir()}/t"
    SnapshotTable.commit(spark, root,
      (0L until 40L).map(k => (k, "base")).toDF("k", "v"))
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def race(body: => Unit): Unit = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        var done = false
        while (!done) {
          try { body; done = true }
          catch {
            case _: SnapshotTable.ConcurrentWriteException => ()
            case e: Throwable => failures.add(e); done = true
          }
        }
      }
    })
    // Disjoint replaced regions commute: every serial order yields the
    // same final state, so a lost update from a CAS bug is visible.
    race(SnapshotTable.overwriteWhere(spark, root, col("k") < 10,
      (0L until 5L).map(k => (k, "lo")).toDF("k", "v")))
    race(SnapshotTable.overwriteWhere(spark, root,
      col("k") >= 30 && col("k") < 40,
      (35L until 40L).map(k => (k, "hi")).toDF("k", "v")))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"unexpected failures: $failures")
    val got = SnapshotTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (0L until 5L).map(k => (k, "lo")).toSet ++
      (10L until 30L).map(k => (k, "base")).toSet ++
      (35L until 40L).map(k => (k, "hi")).toSet
    assert(got == want,
      s"both replaceWhere commits must land; diff=${got.diff(want)} / ${want.diff(got)}")
    // both landed as distinct versions over the seed
    assert(SnapshotTable.currentVersion(spark, root).contains(2L))
  }
}
