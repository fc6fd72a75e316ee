package graft

import java.io.PrintWriter
import java.net.ServerSocket
import java.util.concurrent.ConcurrentLinkedQueue
import graft.streaming.WordCountJob
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Socket word count e2e (`Client.py` equivalent): feed lines over a real
  * TCP socket, assert per-batch counts. */
class WordCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("socket word count counts words per batch") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val batches = new ConcurrentLinkedQueue[Seq[(String, Long)]]()

    val feeder = new Thread(() => {
      val sock = server.accept()
      val w = new PrintWriter(sock.getOutputStream, true)
      w.println("spark streams spark")
      w.println("window spark")
      // keep the connection open until the query is done reading
      Thread.sleep(8000)
      w.close(); sock.close()
    })
    feeder.setDaemon(true); feeder.start()

    val q = WordCountJob.run(spark, "localhost", port,
      (counts, _, _) => batches.add(counts))
    try {
      val deadline = System.nanoTime() + 30e9.toLong
      while (batches.isEmpty && System.nanoTime() < deadline) Thread.sleep(200)
      assert(!batches.isEmpty, "no word-count batch arrived within 30s")
      // all lines may land in one or two batches; totals must match
      val deadline2 = System.nanoTime() + 15e9.toLong
      def totals = batches.asScala.flatten
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      while (totals.getOrElse("spark", 0L) < 3 && System.nanoTime() < deadline2)
        Thread.sleep(200)
      val t = totals
      assert(t.getOrElse("spark", 0L) == 3, s"got $t")
      assert(t.getOrElse("streams", 0L) == 1)
      assert(t.getOrElse("window", 0L) == 1)
    } finally {
      q.stop()
      server.close()
    }
  }

  test("high-cardinality batch is capped at maxVocab with overflow count") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val results = new ConcurrentLinkedQueue[(Seq[(String, Long)], Long)]()
    val nWords = 5000
    val cap = 100

    val feeder = new Thread(() => {
      val sock = server.accept()
      val w = new PrintWriter(sock.getOutputStream, true)
      // one line = one record = one micro-batch's worth of 5000 uniques
      w.println((0 until nWords).map(i => f"w$i%05d").mkString(" "))
      Thread.sleep(8000)
      w.close(); sock.close()
    })
    feeder.setDaemon(true); feeder.start()

    val q = WordCountJob.run(spark, "localhost", port,
      (counts, overflow, _) => results.add((counts, overflow)),
      maxVocab = cap)
    try {
      val deadline = System.nanoTime() + 30e9.toLong
      while (results.isEmpty && System.nanoTime() < deadline) Thread.sleep(200)
      assert(!results.isEmpty, "no capped batch arrived within 30s")
      val (counts, overflow) = results.asScala.head
      assert(counts.size == cap, s"driver received ${counts.size} rows, want $cap")
      assert(overflow == (nWords - cap).toLong, s"overflow $overflow")
      // all count 1 → top-K by (count desc, word asc) = first K lexicographic
      assert(counts.map(_._1).sorted == (0 until cap).map(i => f"w$i%05d"))
    } finally {
      q.stop()
      server.close()
    }
  }
}
