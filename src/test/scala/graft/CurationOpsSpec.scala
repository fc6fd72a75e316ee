package graft

import graft.operators.{Dedup, Pipelines, Similarity, TextOps}
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 curation operators: repetition signals, heuristic filters,
  * benchmark decontamination, domain-mix sampling, sequence packing,
  * shard assignment, SemDeDup. Each operator is cross-checked against an
  * independent in-JVM reimplementation (not just the DuckDB oracle, which
  * shares the SQL shape) or an invariant that must hold by construction.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs: Map[Long, Array[String]] =
    Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap

  // ------------------------------------------------------------ repetition

  test("repetition signals match an independent scala reimplementation") {
    def maxRun(xs: Seq[String]): Int = {
      var best = 0; var run = 0; var prev: String = null
      xs.foreach { x =>
        run = if (x == prev) run + 1 else 1
        if (run > best) best = run
        prev = x
      }
      best
    }
    val got = TextOps.repetition(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d = docs
    assert(got.size == d.count(_._2.length >= 3))
    d.filter(_._2.length >= 3).foreach { case (id, toks) =>
      val bigrams = toks.sliding(2).map(_.mkString(" ")).toVector
      val trigrams = toks.sliding(3).map(_.mkString(" ")).toVector
      val r = got(id)
      assert(r.getInt(1) == toks.length, s"doc $id n_tokens")
      val topBg = bigrams.groupBy(identity).values.map(_.size).max
      assert(r.getInt(2) == topBg, s"doc $id top_bigram_n")
      assert(math.abs(r.getDouble(4) -
        BigDecimal(1.0 - trigrams.distinct.size.toDouble / trigrams.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"doc $id dup_trigram_frac")
      assert(r.getInt(5) == maxRun(toks.toVector), s"doc $id max_token_run")
    }
  }

  test("heuristic filters: keep is exactly the conjunction, flags non-vacuous") {
    val rows = TextOps.heuristicFilters(spark, TestSpark.sf).collect()
    rows.foreach { r =>
      val flags = Seq("ok_len", "ok_wlen", "ok_ttr", "ok_stop", "ok_rep")
        .map(c => r.getInt(r.fieldIndex(c)))
      assert(flags.forall(f => f == 0 || f == 1))
      assert(r.getInt(r.fieldIndex("keep")) == flags.product)
    }
    // every flag must actually discriminate on this corpus — a filter that
    // always passes (or always fails) is untested code
    Seq("ok_len", "ok_ttr", "ok_stop", "ok_rep").foreach { c =>
      val vals = rows.map(r => r.getInt(r.fieldIndex(c))).toSet
      assert(vals == Set(0, 1), s"$c is vacuous: $vals")
    }
    assert(rows.map(r => r.getInt(r.fieldIndex("keep"))).toSet == Set(0, 1))
  }

  // -------------------------------------------------------- decontaminate

  test("decontaminate: bench docs excluded, hits verified by set intersection") {
    def shingles(toks: Array[String]): Set[String] =
      (0 until math.max(toks.length - 2, 1))
        .map(i => toks.slice(i, math.min(i + 3, toks.length)).mkString(" ")).toSet
    val d = docs
    val benchSh = d.filter(_._1 % 97 == 0).values.flatMap(shingles).toSet
    val got = Dedup.decontaminate(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "decontaminate is vacuous on this corpus")
    assert(got.keySet.forall(_ % 97 != 0), "bench docs leaked into the output")
    // exact per-doc hit counts from first principles
    d.filter(_._1 % 97 != 0).foreach { case (id, toks) =>
      val hits = shingles(toks).intersect(benchSh).size
      assert(got.getOrElse(id, 0L) == hits.toLong, s"doc $id: expected $hits hits")
    }
  }

  // ----------------------------------------------------------- domain mix

  test("domain mix: deterministic, rates within binomial noise of target") {
    val a = Pipelines.domainMix(spark, TestSpark.sf).collect()
    val b = Pipelines.domainMix(spark, TestSpark.sf).collect()
    assert(a.toSeq == b.toSeq, "hash sampling must be run-to-run deterministic")
    a.foreach { r =>
      val (rate, nBefore, nAfter) = (r.getInt(1), r.getLong(2), r.getLong(3))
      assert(nAfter <= nBefore)
      if (rate == 1000) assert(nAfter == nBefore, s"${r.getString(0)}: rate 1.0 must keep all")
      else {
        // 3.5 sigma of Binomial(n, p) — deterministic data, so this either
        // always passes or flags a real hash/rate bug
        val p = rate / 1000.0
        val sigma = math.sqrt(nBefore * p * (1 - p))
        assert(math.abs(nAfter - nBefore * p) <= 3.5 * sigma + 1,
          s"${r.getString(0)}: kept $nAfter of $nBefore at p=$p")
      }
    }
  }

  // ------------------------------------------------------ sequence packing

  test("pack sequences: token conservation and exact 256-token interior seqs") {
    val rows = Pipelines.packSequences(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bySource = rows.groupBy(_._1)
    val totals = Tables.documents(spark, TestSpark.sf)
      .selectExpr("source", "CAST(size(split(text, ' ')) AS LONG) AS n")
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sum)
    bySource.foreach { case (src, seqs) =>
      assert(seqs.map(_._4).sum == totals(src), s"$src: token mass not conserved")
      val maxSeq = seqs.map(_._2).max
      seqs.foreach { case (_, seqId, nDocs, nTok) =>
        assert(nDocs >= 1)
        if (seqId < maxSeq) assert(nTok == 256L, s"$src seq $seqId: interior seq has $nTok tokens")
        else assert(nTok <= 256L, s"$src seq $seqId: tail overflows")
      }
      // seq ids are contiguous from 0 — no gap means no lost span
      assert(seqs.map(_._2).sorted.toSeq == (0L to maxSeq).toSeq, s"$src: seq gap")
    }
  }

  // ------------------------------------------------------- shard assignment

  test("shard assign: partition of the corpus, no pathological imbalance") {
    val rows = Pipelines.shardAssign(spark, TestSpark.sf).collect()
    val total = Tables.documents(spark, TestSpark.sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "shards must partition the corpus")
    assert(rows.map(_.getInt(0)).toSet.subsetOf((0 until 16).toSet))
    val counts = rows.map(_.getLong(1))
    assert(counts.max <= 3 * math.max(counts.min, 1),
      s"shard imbalance: ${counts.mkString(",")}")
  }

  test("dataset card: partitions the corpus exactly (doc and token mass)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf)
    val card = Pipelines.datasetCard(spark, TestSpark.sf).collect()
    assert(card.map(_.getLong(2)).sum === docs.count())
    val totalTok = docs.select(sum(size(split(col("text"), " "))))
      .collect().head.getLong(0)
    assert(card.map(_.getLong(3)).sum === totalTok)
    // dup accounting: per-group dup docs never exceed the group size
    card.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2), s"dups > docs in ${r.getString(0)}/${r.getString(1)}")
    }
  }

  // --------------------------------------------------------------- semdedup

  test("semdedup pairs are true high-cosine pairs (subset of brute force)") {
    val vecs = Tables.embeddings(spark, TestSpark.sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = Similarity.semDedup(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty, "semdedup is vacuous on this corpus")
    got.foreach { case (a, b, score) =>
      assert(a < b, s"pair order ($a, $b)")
      val bf = cos(vecs(a), vecs(b))
      assert(math.abs(score - bf) < 1e-5, s"($a,$b): semdedup=$score bruteforce=$bf")
      assert(bf >= 0.4 - 1e-6, s"($a,$b): below threshold")
    }
  }
}
