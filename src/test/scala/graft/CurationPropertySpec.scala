package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Property-based invariants over generated corpora — the structural
  * guarantees the curation operators promise for ANY input, not just the
  * fixtures: hash-split partitions exactly, sequence packing tiles each
  * shard gaplessly, chunking covers every token exactly once per stride.
  */
class CurationPropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(name: String, prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(r.passed, s"$name: $r")
  }

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 40)
    docs <- Gen.listOfN(n, for {
      words <- Gen.choose(0, 30)
      ws <- Gen.listOfN(words, Gen.oneOf("the", "a", "spark", "engine", "scan", "x1"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def toDocs(c: List[(Long, String)]) =
    c.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("substringDecontaminate equals the DP longest-common-substring model for any corpus") {
    // Random token docs over a small vocab (collisions by construction);
    // brute force via the classic suffix-extension DP at TOKEN
    // granularity. windowLen = 2, cap high enough to never bind — the
    // operator's islands-chained runs must equal the DP answer exactly
    // (≥ windowLen, else 0), and coverage must equal the count of probe
    // windows occurring anywhere in the reference.
    val w = 2
    val gen = for {
      nRef <- Gen.choose(1, 4)
      nProbe <- Gen.choose(1, 4)
      mk = for {
        words <- Gen.choose(0, 18)
        ws <- Gen.listOfN(words, Gen.oneOf("a", "b", "c", "d"))
      } yield ws
      refs <- Gen.listOfN(nRef, mk)
      probes <- Gen.listOfN(nProbe, mk)
    } yield (refs, probes)
    def lcsLen(p: Seq[String], r: Seq[String]): Int = {
      // dp(i)(j) = length of common substring ENDING at p(i-1), r(j-1)
      var best = 0
      val dp = Array.ofDim[Int](p.length + 1, r.length + 1)
      for (i <- 1 to p.length; j <- 1 to r.length)
        if (p(i - 1) == r(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          if (dp(i)(j) > best) best = dp(i)(j)
        }
      best
    }
    check("substringDecontaminate", Prop.forAll(gen) { case (refs, probes) =>
      val refDf = toDocs(refs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) })
      val probeDf = toDocs(probes.zipWithIndex.map { case (ws, i) => (100L + i, ws.mkString(" ")) })
      val out = graft.operators.Dedup
        .substringDecontaminate(probeDf, refDf, windowLen = w, maxDigFreq = 1000000L)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      probes.zipWithIndex.forall { case (p, i) =>
        val r = out(100L + i)
        val want = refs.map(lcsLen(p, _)).maxOption.getOrElse(0)
        val wantLen = if (want >= w) want.toLong else 0L
        val refWindows = refs.flatMap(_.sliding(w).filter(_.length == w).map(_.toList)).toSet
        val wantCov = if (p.length < w) 0L
          else p.sliding(w).zipWithIndex.count { case (win, _) => refWindows(win.toList) }.toLong
        r.getAs[Long]("max_match_len") == wantLen &&
          r.getAs[Boolean]("contaminated") == (wantLen >= w) &&
          r.getAs[Long]("n_matched_windows") == wantCov
      }
    })
  }

  test("selfRepeatedSubstrings equals the DP longest-repeated-substring model for any doc") {
    val w = 2
    val gen = for {
      n <- Gen.choose(1, 5)
      docs <- Gen.listOfN(n, for {
        words <- Gen.choose(0, 16)
        ws <- Gen.listOfN(words, Gen.oneOf("a", "b", "c"))
      } yield ws)
    } yield docs
    // Longest substring occurring at TWO DIFFERENT positions (overlap
    // allowed): max over i < j of the common extension length.
    def lrsLen(p: Seq[String]): Int = {
      var best = 0
      for (i <- p.indices; j <- i + 1 until p.length) {
        var l = 0
        while (j + l < p.length && p(i + l) == p(j + l)) l += 1
        if (l > best) best = l
      }
      best
    }
    check("selfRepeatedSubstrings", Prop.forAll(gen) { docs =>
      val df = toDocs(docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) })
      val out = graft.operators.Dedup
        .selfRepeatedSubstrings(df, windowLen = w, maxRepeat = 1000000L)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      docs.zipWithIndex.forall { case (p, i) =>
        val want = lrsLen(p)
        val wantLen = if (want >= w) want.toLong else 0L
        out(i.toLong).getAs[Long]("max_repeat_len") == wantLen
      }
    })
  }

  test("tokenBudgetSelect equals the sequential prefix model for any corpus/budget") {
    val gen = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, for {
        score <- Gen.choose(0L, 8L) // heavy ties: the doc_id tie-break carries
        cost <- Gen.choose(0L, 30L) // zero-cost rows sit exactly on boundaries
      } yield (score, cost))
      parts <- Gen.choose(1, 6)
      budgetPct <- Gen.choose(0, 120)
    } yield (rows.zipWithIndex.map { case ((s, c), i) => (i.toLong, s, c) }, parts, budgetPct)
    check("tokenBudgetSelect", Prop.forAll(gen) { case (rows, parts, budgetPct) =>
      val budget = rows.map(_._3).sum * budgetPct / 100
      val model = rows.sortBy { case (id, s, _) => (-s, id) }
        .scanLeft((0L, 0L, 0L, 0L)) { case (acc, (id, s, c)) => (id, s, c, acc._4 + c) }
        .drop(1).takeWhile(_._4 <= budget).toSet
      val got = Curation.tokenBudgetSelect(
        rows.toDF("id", "score", "cost"),
        col("id"), col("score"), col("cost"), budget, parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      got == model
    })
  }

  test("hashSplit partitions every doc into exactly one split with exact bucket bounds") {
    check("hashSplit", Prop.forAll(corpusGen, Gen.choose(1, 80), Gen.choose(1, 19)) {
      (corpus, trainPct, valPct) =>
        val rows = Curation.hashSplit(toDocs(corpus), trainPct, valPct).collect()
        rows.length == corpus.length && rows.forall { r =>
          val b = r.getAs[Long]("bucket")
          val s = r.getAs[String]("split")
          val expect =
            if (b < trainPct) "train" else if (b < trainPct + valPct) "val" else "test"
          b >= 0 && b < 100 && s == expect
        }
    })
  }

  test("uniformSamplePerGroup draws exactly min(k, |group|) per group, deterministically") {
    import org.apache.spark.sql.functions.col
    val grouped: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.oneOf("s0", "s1", "s2"))
    } yield rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    check("uniformSamplePerGroup", Prop.forAll(grouped, Gen.choose(1, 12)) { (rows, k) =>
      val df = rows.map { case (id, s) => (id, s"text $id", "en", s, 8L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val out = Curation.uniformSamplePerGroup(df, col("source"), col("doc_id"), k)
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Int]("sample_rnk")))
      val bySrc = out.groupBy(_._1)
      val sizes = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val exactK = sizes.forall { case (s, n) =>
        bySrc.get(s).map(_.length).getOrElse(0) == math.min(k, n)
      }
      val denseRanks = bySrc.values.forall(g =>
        g.map(_._3).sorted.sameElements(1 to g.length))
      val again = Curation.uniformSamplePerGroup(df, col("source"), col("doc_id"), k)
        .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
      exactK && denseRanks && again == out.map(t => (t._1, t._2)).toSet
    })
  }

  test("packSequences tiles each shard gaplessly in doc order") {
    check("packSequences", Prop.forAll(corpusGen, Gen.choose(2, 64)) { (corpus, budget) =>
      val out = Curation.packSequences(toDocs(corpus), budgetTokens = budget, numShards = 4)
        .collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("seq_in_shard"), r.getAs[Long]("seq_offset")))
      out.groupBy(_._1).forall { case (_, rows) =>
        // Walking the shard in doc order, every doc must start exactly
        // where the previous one ended (no gaps, no overlaps).
        var cursor = 0L
        rows.sortBy(_._2).forall { case (_, _, n, seq, off) =>
          val ok = seq == cursor / budget && off == cursor % budget
          cursor += n
          ok
        }
      }
    })
  }

  test("passageDedup reconstructs exactly the passages whose digest stays under the df cap") {
    check("passageDedup", Prop.forAll(corpusGen, Gen.choose(1, 6), Gen.choose(1L, 3L)) {
      (corpus, passageLen, maxDf) =>
        val out = graft.operators.Dedup.passageDedup(toDocs(corpus), passageLen, maxDf)
          .collect()
          .map(r => r.getAs[Long]("doc_id") ->
            (r.getAs[Long]("n_passages"), r.getAs[Long]("n_dropped"),
              r.getAs[String]("clean_text")))
          .toMap
        // Reference model: chunk each doc's token list, count distinct-doc
        // frequency per passage, rebuild the survivors.
        def passages(text: String): List[String] = {
          val ws = text.trim.split("\\s+", -1).toList // "" doc → [""], like wordsCol
          ws.grouped(passageLen).map(_.mkString(" ")).toList
        }
        val df = corpus
          .flatMap { case (id, t) => passages(t).distinct.map(_ -> id) }
          .groupBy(_._1).map { case (p, ids) => p -> ids.map(_._2).distinct.size.toLong }
        out.size == corpus.length && corpus.forall { case (id, text) =>
          val ps = passages(text)
          val kept = ps.filter(p => df(p) <= maxDf)
          val (nP, nD, clean) = out(id)
          nP == ps.length.toLong &&
            nD == ps.count(p => df(p) > maxDf).toLong &&
            clean == kept.mkString(" ")
        }
    })
  }

  test("chunkTokens covers every token of every doc exactly once per stride") {
    check("chunkTokens", Prop.forAll(corpusGen) { corpus =>
      val docs = toDocs(corpus)
      val chunks = Curation.chunkTokens(docs, chunkSize = 8, stride = 8) // non-overlapping
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id"),
          r.getAs[String]("chunk_text").split(" ").filter(_.nonEmpty).toSeq))
      val rebuilt = chunks.groupBy(_._1).map { case (id, cs) =>
        id -> cs.sortBy(_._2).flatMap(_._3).toList
      }
      corpus.forall { case (id, text) =>
        val words = text.trim.split("\\s+").filter(_.nonEmpty).toList
        if (words.isEmpty) !rebuilt.contains(id) || rebuilt(id).isEmpty
        else rebuilt.getOrElse(id, Nil) == words
      }
    })
  }

  test("snapshotDiff covers every key of either snapshot exactly once with the model status") {
    val snapGen = for {
      n <- Gen.choose(0, 30)
      rows <- Gen.listOfN(n, for {
        key <- Gen.choose(0L, 20L) // overlapping key space across snapshots
        text <- Gen.oneOf("alpha", "beta", "gamma")
        src <- Gen.oneOf("s0", "s1")
      } yield (key, text, src))
    } yield rows.groupBy(_._1).map(_._2.head).toList // keys unique per snapshot
    def toSnap(rows: List[(Long, String, String)]) =
      rows.map { case (k, t, s) => (k, t, "en", s, t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    check("snapshotDiffCompleteness", Prop.forAll(snapGen, snapGen) { (oldS, newS) =>
      val oldM = oldS.map(r => r._1 -> r._2).toMap
      val newM = newS.map(r => r._1 -> r._2).toMap
      val model = (oldM.keySet ++ newM.keySet).map { k =>
        k -> ((oldM.get(k), newM.get(k)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if a != b => "changed"
          case _ => "unchanged"
        })
      }.toMap
      val got = Curation.snapshotDiff(toSnap(oldS), toSnap(newS)).collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[String]("status"))
      // exactly-once coverage AND per-key status agreement
      got.length == model.size && got.toMap == model
    })
  }

  test("systematicWeightedSample pick counts telescope to exactly k, independent of partitioning") {
    val gen = for {
      n <- Gen.choose(1, 80)
      ws <- Gen.listOfN(n, Gen.choose(0L, 30L))
      k <- Gen.choose(1, 20)
      parts <- Gen.choose(1, 6)
    } yield (ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }, k, parts)
    check("systematicTelescoping", Prop.forAll(gen) { case (rows, k, parts) =>
      val total = rows.map(_._2).sum
      (total == 0L) || {
        def run(np: Int) = Curation.systematicWeightedSample(
          rows.toDF("doc_id", "w"), col("doc_id"), col("w"), k, numPartitions = np)
          .collect().map(r => (r.getLong(0), r.getAs[Long]("n_picks"))).toMap
        val got = run(parts)
        // n_picks = floor(cum·k/T) − floor((cum−w)·k/T) telescopes over the
        // full traversal to floor(T·k/T) − 0 = k; rows with n_picks = 0 are
        // filtered, so the kept rows must carry exactly k picks.
        got.values.sum == k.toLong && run(1) == got
      }
    })
  }
}
