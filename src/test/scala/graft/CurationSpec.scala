package graft

import graft.operators.{Analytics, Curation, Dedup}
import graft.functions.expressions.Tok
import org.apache.spark.sql.functions._

/** Curation operators (decontaminate / doc_pack / text_repetition)
  * and the temporal analytics additions (events_asof / events_funnel):
  * each result is re-derived brute-force on the collected sf0.001
  * corpus, so the distributed formulation is checked against the
  * obvious sequential one.
  */
class CurationSpec extends GraftSuite {

  private def shingles(text: String, n: Int): Set[String] = {
    val toks = Tok.tokens(text)
    (0 to toks.size - n).map(i =>
      (i until i + n).map(toks.get).mkString(" ")).toSet
  }

  test("decontaminate flags exactly the docs sharing a 4-shingle with the eval split") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val evalShingles = docs.filter(_._1 % Curation.EvalMod == 0)
      .values.flatMap(shingles(_, Curation.DecontN)).toSet
    val expected = docs
      .filter { case (id, text) =>
        id % Curation.EvalMod != 0 && shingles(text, Curation.DecontN).exists(evalShingles) }
      .keySet
    val got = Curation.decontaminate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    assert(got.keySet == expected)
    // hit counts are the per-doc count of distinct contaminated shingles
    got.foreach { case (id, n) =>
      val exp = shingles(docs(id), Curation.DecontN).count(evalShingles)
      assert(n == exp, s"doc $id")
    }
  }

  test("decontaminate_bloom is one-sided: flags every exactly-contaminated doc, over-flags only within fpp") {
    val exact = Curation.decontaminate(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val bloom = Curation.decontaminateBloom(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    // no false negatives: a Bloom filter never misses an inserted
    // hash, so the exact flag set must be contained
    assert((exact -- bloom).isEmpty,
      s"bloom missed exactly-contaminated docs: ${(exact -- bloom).take(5)}")
    // false positives bounded: a clean doc trips with probability
    // ~shingles·fpp; at fpp 1e-6 and ~1e2 shingles/doc the expected
    // over-flag mass over this corpus is ~0
    val trainDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % Curation.EvalMod =!= 0).count()
    val overFlagged = (bloom -- exact).size
    assert(overFlagged <= math.max(5L, trainDocs / 20),
      s"bloom over-flagged $overFlagged of $trainDocs clean docs")
  }

  test("ccnet_buckets_sketch agrees with the exact terciles on >= 99% of docs") {
    val exact = Curation.ccnetBuckets(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    val sketch = Curation.ccnetBucketsSketch(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(sketch.keySet == exact.keySet, "same doc coverage")
    val agree = exact.count { case (id, b) => sketch(id) == b }
    assert(agree.toDouble / exact.size >= 0.99,
      s"sketch reassigned ${exact.size - agree} of ${exact.size} docs")
  }

  test("doc_pack bins are contiguous, ordered and token-complete per lang") {
    val rows = Curation.docPack(spark, sf).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    val corpus = Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sum).toMap
    byLang.foreach { case (lang, bins) =>
      val sorted = bins.sortBy(_.getAs[Long]("bin"))
      // bins start at 0 with no gaps
      assert(sorted.map(_.getAs[Long]("bin")).toSeq == (0L until bins.length).toSeq)
      // doc id ranges ascend without overlap (packing preserves order)
      val ranges = sorted.map(r => (r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
      ranges.foreach { case (a, b) => assert(a <= b) }
      ranges.sliding(2).foreach {
        case Array((_, b1), (a2, _)) => assert(b1 < a2)
        case _ => ()
      }
      // token mass is conserved
      assert(sorted.map(_.getAs[Long]("n_tokens")).sum == corpus(lang))
    }
  }

  test("text_repetition matches a hand-rolled per-doc computation") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Curation.textRepetition(spark, sf).collect()
    assert(rows.length == docs.size)
    def fx(x: Double): Long = math.floor(x * 10000L + 0.5).toLong
    rows.take(50).foreach { r =>
      val toks = Tok.tokens(docs(r.getAs[Long]("doc_id")))
      import scala.jdk.CollectionConverters._
      val ts = toks.asScala.toSeq
      val n = ts.size.toDouble
      val bi = ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      assert(r.getAs[Long]("n_tokens") == ts.size)
      if (ts.nonEmpty) {
        assert(r.getAs[Long]("dup_token_ratio") == fx((n - ts.distinct.size) / n))
        assert(r.getAs[Long]("top_tf_ratio") ==
          fx(ts.groupBy(identity).values.map(_.size).max / n))
      }
      if (bi.nonEmpty)
        assert(r.getAs[Long]("dup_bigram_ratio") ==
          fx((bi.size - bi.distinct.size).toDouble / bi.size))
      val repetitive = r.getAs[Long]("dup_token_ratio") > Curation.DupTokenMax ||
        r.getAs[Long]("top_tf_ratio") > Curation.TopTfMax
      assert(r.getAs[Long]("is_repetitive") == (if (repetitive) 1L else 0L))
    }
  }

  test("events_asof matches brute-force last-view-at-or-before per purchase") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = ev.filter(_._3 == "view")
    val got = Analytics.eventsAsof(spark, sf).collect()
    val purchases = ev.filter(_._3 == "purchase")
    assert(got.length == purchases.length)
    val byId = got.map(r => r.getAs[Long]("event_id") -> r).toMap
    purchases.foreach { case (pid, user, _, pus) =>
      val r = byId(pid)
      assert(r.getAs[Long]("purchase_us") == pus)
      // best = max (ts, event_id) among same-user views at-or-before
      val cand = views.filter(v => v._2 == user && v._4 <= pus)
      if (cand.isEmpty) {
        assert(r.getAs[Long]("view_id") == -1L && r.getAs[Long]("gap_us") == -1L)
      } else {
        val best = cand.maxBy(v => (v._4, v._1))
        assert(r.getAs[Long]("view_id") == best._1, s"purchase $pid")
        assert(r.getAs[Long]("gap_us") == pus - best._4)
      }
    }
  }

  test("events_funnel counts are monotone and match brute force") {
    val row = Analytics.eventsFunnel(spark, sf).collect().head
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def first(es: Array[(Long, String, Long)], t: String): Option[Long] =
      es.filter(_._2 == t).map(_._3).minOption
    var (s1, s2, s3, s4) = (0L, 0L, 0L, 0L)
    byUser.values.foreach { es =>
      val (t1, t2, t3, t4) =
        (first(es, "signup"), first(es, "view"), first(es, "click"), first(es, "purchase"))
      val c1 = t1.isDefined
      val c2 = c1 && t2.exists(_ > t1.get)
      val c3 = c2 && t3.exists(_ > t2.get)
      val c4 = c3 && t4.exists(_ > t3.get)
      if (c1) s1 += 1; if (c2) s2 += 1; if (c3) s3 += 1; if (c4) s4 += 1
    }
    assert(row.getAs[Long]("n_users") == byUser.size)
    assert(row.getAs[Long]("n_signup") == s1)
    assert(row.getAs[Long]("n_signup_view") == s2)
    assert(row.getAs[Long]("n_signup_view_click") == s3)
    assert(row.getAs[Long]("n_full_funnel") == s4)
    assert(s1 >= s2 && s2 >= s3 && s3 >= s4)
  }

  test("curate and funnel share one flag relation: the second rides the cache") {
    // force the shared curationFlags subtree into the session cache
    Curation.curateCorpus(spark, sf).collect()
    val exec = Curation.curationFunnel(spark, sf).queryExecution.executedPlan.toString
    assert(exec.contains("InMemoryTableScan") || exec.contains("TableCacheQueryStage"),
      s"funnel recomputed the flag relation instead of riding the cache:\n${exec.take(2000)}")
  }

  test("corpus_curate verdicts match the independently-computed gate sets with precedence") {
    import graft.operators.Dedup
    val nearDup = Dedup.clusters(spark, sf).filter(col("is_dup") === 1L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val contaminated = Curation.decontaminate(spark, sf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val repetitive = Curation.textRepetition(spark, sf)
      .filter(col("is_repetitive") === 1L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val rows = Curation.curateCorpus(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected =
        if (id % Curation.EvalMod == 0) "eval"
        // no exact dups exist in this corpus (spec'd by dedup_exact
        // n_copies == 1 everywhere), so the arm can't fire here
        else if (nearDup(id)) "near_dup"
        else if (contaminated(id)) "contaminated"
        else if (repetitive(id)) "repetitive"
        else "kept"
      assert(r.getAs[String]("reason") == expected, s"doc $id")
      assert((r.getAs[Long]("kept") == 1L) == (expected == "kept"))
    }
    val kept = rows.count(_.getAs[Long]("kept") == 1L)
    assert(kept > 0 && kept < 500)

    // the funnel census agrees with the same independently-computed
    // gate sets, per-gate and kept (its counts ignore the verdict's
    // precedence — that's the point of the ablation view)
    val f = Curation.curationFunnel(spark, sf).collect()
    assert(f.length == 1)
    val fr = f.head
    val evalSet = rows.map(_.getAs[Long]("doc_id"))
      .filter(_ % Curation.EvalMod == 0).toSet
    assert(fr.getAs[Long]("n_docs") == 500L)
    assert(fr.getAs[Long]("n_eval") == evalSet.size.toLong)
    assert(fr.getAs[Long]("n_exact") == 0L, "corpus has no exact dups by construction")
    assert(fr.getAs[Long]("n_near") == nearDup.size.toLong)
    assert(fr.getAs[Long]("n_cont") == contaminated.size.toLong)
    assert(fr.getAs[Long]("n_rep") == repetitive.size.toLong)
    assert(fr.getAs[Long]("n_kept") == kept.toLong)
    def uniq(g: Set[Long], others: Set[Long]*) =
      (g -- evalSet -- others.reduce(_ ++ _)).size.toLong
    assert(fr.getAs[Long]("u_near") == uniq(nearDup, contaminated, repetitive))
    assert(fr.getAs[Long]("u_cont") == uniq(contaminated, nearDup, repetitive))
    assert(fr.getAs[Long]("u_rep") == uniq(repetitive, nearDup, contaminated))
    // a gate's unique kills never exceed its flags
    assert(fr.getAs[Long]("u_near") <= fr.getAs[Long]("n_near"))
  }

  test("pii_scrub redacts exactly the injected PII and nothing survives") {
    val rows = Curation.piiScrub(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val scrubbed = r.getAs[String]("scrubbed")
      // counts match the deterministic injection exactly
      assert(r.getAs[Long]("n_emails") == (if (id % 3 == 0) 1L else 0L), s"doc $id emails")
      assert(r.getAs[Long]("n_phones") == (if (id % 5 == 0) 1L else 0L), s"doc $id phones")
      assert(r.getAs[Long]("n_ips") == (if (id % 7 == 0) 1L else 0L), s"doc $id ips")
      // redaction is total: no pattern matches the scrubbed text
      assert(!Curation.EmailRe.r.findFirstIn(scrubbed).isDefined, s"doc $id email survived")
      assert(!Curation.PhoneRe.r.findFirstIn(scrubbed).isDefined, s"doc $id phone survived")
      assert(!Curation.IpRe.r.findFirstIn(scrubbed).isDefined, s"doc $id ip survived")
      // and each injected category left its placeholder behind
      assert(scrubbed.contains("<EMAIL>") == (id % 3 == 0), s"doc $id")
      assert(scrubbed.contains("<PHONE>") == (id % 5 == 0), s"doc $id")
      assert(scrubbed.contains("<IP>") == (id % 7 == 0), s"doc $id")
    }
  }

  test("corpus_mix caps upweighted domains at keep-all and moves the tail toward its targets") {
    val rows = Curation.corpusMix(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
         r.getAs[Long]("rate_bp"), r.getAs[Long]("kept_docs"),
         r.getAs[Long]("kept_tokens"))).toMap
    assert(rows.keySet == Curation.MixWeights.map(_._1).toSet)
    val totalTok = rows.values.map(_._2).sum
    rows.foreach { case (s, (nDocs, nTok, rate, kDocs, kTok)) =>
      assert(rate >= 0 && rate <= 10000, s"$s rate")
      assert(kDocs <= nDocs && kTok <= nTok, s"$s kept within input")
      assert((kDocs == 0) == (kTok == 0), s"$s kept consistency")
      // the gate is per-document: rate 10000 keeps everything, 0 nothing
      if (rate == 10000L) assert(kDocs == nDocs && kTok == nTok, s"$s keep-all")
      if (rate == 0L) assert(kDocs == 0, s"$s drop-all")
      // rate matches the integer water-filling formula exactly
      val w = Curation.MixWeights.toMap.apply(s).toLong
      val expRate = math.min(10000L, 10000L * (w * totalTok / 10000L) / nTok)
      assert(rate == expRate, s"$s rate formula")
    }
    // src0 wants 25% of the corpus but holds ~5%: target exceeds supply,
    // so the cap must engage — while the uniform tail downsamples
    assert(rows("src0")._3 == 10000L, "upweighted domain must keep all")
    assert(rows("src19")._3 < 10000L, "tail domain must downsample")
    // the mix moved composition toward the target: src0's post-mix token
    // share strictly exceeds its pre-mix share
    val keptTotal = rows.values.map(_._5).sum
    assert(rows("src0")._5.toDouble / keptTotal > rows("src0")._2.toDouble / totalTok,
      "src0 share must rise")
  }

  test("corpus_mix drops unweighted domains entirely but still reports their input stats") {
    val rows = Curation.corpusMix(spark, sf, weights = Seq("src0" -> 10000)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("rate_bp"),
         r.getAs[Long]("kept_docs"), r.getAs[Long]("kept_tokens"))).toMap
    // every source still reports a row (a gate that silently drops a
    // domain's accounting row hides what the mix excluded)
    assert(rows.size == 20 && rows.values.forall(_._1 > 0))
    rows.foreach { case (s, (_, rate, kept, keptTok)) =>
      if (s == "src0") assert(rate == 10000L && kept > 0, s"$s keep-all")
      else assert(rate == 0L && kept == 0L && keptTok == 0L, s"$s zero-weight drop")
    }
  }

  test("quality_logit: keep is exactly the margin's sign and the score is its sigmoid") {
    val rows = Curation.qualityLogit(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.length == n)
    rows.foreach { r =>
      val margin = r.getAs[Long]("margin")      // fx(z, 6)
      val score = r.getAs[Long]("score")        // fx(sigmoid(z), 4)
      val keep = r.getAs[Long]("keep")
      assert(keep == (if (margin >= 0) 1L else 0L), s"doc ${r.getLong(0)} gate/margin")
      val sig = 1.0 / (1.0 + math.exp(-margin / 1e6))
      assert(math.abs(score - sig * 1e4) <= 1.0, s"doc ${r.getLong(0)} sigmoid")
      assert(score > 0 && score < 10000)
    }
    val keepFrac = rows.count(_.getAs[Long]("keep") == 1L).toDouble / rows.length
    assert(keepFrac > 0.1 && keepFrac < 0.99, s"degenerate gate: $keepFrac")
  }

  test("shard_manifest conserves the corpus and balances token mass") {
    val rows = Curation.shardManifest(spark, sf).collect()
    assert(rows.length == Curation.NumShards)
    val docs = Tables.documents(spark, sf)
      .select(sum(size(split(col("text"), " "))).cast("long"), count(lit(1)))
      .collect()(0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.getLong(1))
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == docs.getLong(0))
    // share_bp is the floored basis-point share: sums to <= 10000 and
    // within NumShards of it, and hashing spreads mass (no empty shard,
    // no shard holding more than 3x its fair share at this corpus size)
    val shares = rows.map(_.getAs[Long]("share_bp"))
    assert(shares.sum <= 10000L && shares.sum > 10000L - Curation.NumShards)
    assert(rows.forall(_.getAs[Long]("n_docs") > 0))
    assert(shares.max < 3L * 10000L / Curation.NumShards)
  }

  test("corpus_summary fields re-derive from their component queries") {
    import org.apache.spark.sql.functions.col
    val s = graft.operators.DocOps.corpusSummary(spark, sf).head
    val docs = Tables.documents(spark, sf)
    assert(s.getAs[Long]("n_docs") == docs.count())
    assert(s.getAs[Long]("n_sources") ==
      docs.select(col("source")).distinct().count())
    assert(s.getAs[Long]("n_langs") == docs.select(col("lang")).distinct().count())
    assert(s.getAs[Long]("n_exact_dup_docs") ==
      docs.count() - docs.selectExpr(
        "conv(substring(md5(text), 1, 15), 16, 10)").distinct().count(),
      "dup mass = docs minus distinct content hashes")
    assert(s.getAs[Long]("n_repetitive") ==
      Curation.textRepetition(spark, sf)
        .filter(col("is_repetitive") === 1L).count())
    assert(s.getAs[Long]("sum_tokens") > 0L)
  }

  test("ccnet_buckets terciles are per-source and ordered") {
    import org.apache.spark.sql.functions.col
    val rows = Curation.ccnetBuckets(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    // within every source, max(head) <= everything in middle <= min(tail)
    rows.groupBy(_.getAs[String]("source")).foreach { case (s, rs) =>
      def scores(b: String) = rs.filter(_.getAs[String]("bucket") == b)
        .map(_.getAs[Long]("mean_surprise_fx"))
      val (h, m, t) = (scores("head"), scores("middle"), scores("tail"))
      assert(h.nonEmpty, s"$s has no head bucket")
      if (m.nonEmpty) assert(h.max <= m.min, s"$s head/middle order")
      if (t.nonEmpty && m.nonEmpty) assert(m.max <= t.min, s"$s middle/tail order")
      // every label reproduces from driver-side interpolated terciles
      // (ties spanning a cut legitimately inflate a bucket, so a
      // balance bound would be wrong — the CONTRACT is the thresholds)
      val sorted = rs.map(_.getAs[Long]("mean_surprise_fx")).sorted
      def tercile(f: Double): Long = {
        val pos = (sorted.length - 1) * f
        val (lo, frac) = (pos.toInt, pos - pos.toInt)
        val v = sorted(lo) + frac *
          (sorted(math.min(lo + 1, sorted.length - 1)) - sorted(lo)).toDouble
        math.floor(v + 0.5).toLong
      }
      val (p33, p66) = (tercile(1.0 / 3), tercile(2.0 / 3))
      rs.foreach { r =>
        val v = r.getAs[Long]("mean_surprise_fx")
        val expect = if (v <= p33) "head" else if (v <= p66) "middle" else "tail"
        assert(r.getAs[String]("bucket") == expect, s"$s doc ${r.getAs[Long]("doc_id")}")
      }
    }
  }

  test("dup_rate_by_source partitions the corpus and agrees with exact dedup") {
    import org.apache.spark.sql.functions.col
    val rows = Curation.dupRateBySource(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count(),
      "every doc counted under exactly one source")
    rows.foreach { r =>
      val (n, d, bp) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup"),
        r.getAs[Long]("dup_bp"))
      assert(d >= 0 && d <= n)
      assert(bp == 10000L * d / n, s"rate not floored bp for ${r.getString(0)}")
    }
    // total duplicate mass agrees with the corpus-wide exact dedup view:
    // every member of a >1-copy content group counts as a duplicate
    val expected = docs.count() -
      docs.select(graft.functions.TextFunctions.hash60(col("text"))).distinct().count() +
      Dedup.exact(spark, sf).filter(col("n_copies") > 1).count()
    assert(rows.map(_.getAs[Long]("n_dup")).sum == expected)
  }

  test("decontaminate_overlap grades what decontaminate flags, and covers the rest") {
    val overlap = Curation.decontaminateOverlap(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hits"), r.getAs[Long]("contam_bp")))
      .toMap
    assert(overlap.nonEmpty)
    overlap.values.foreach { case (nSh, nHits, bp) =>
      assert(nSh >= 1L && nHits >= 0L && nHits <= nSh)
      assert(bp == (10000L * nHits) / nSh, "contam_bp must be the exact ratio")
    }
    // exact agreement with the membership operator on its flagged set
    val flagged = Curation.decontaminate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    flagged.foreach { case (id, hits) =>
      assert(overlap.contains(id), s"flagged doc $id missing from overlap report")
      assert(overlap(id)._2 == hits, s"hit count mismatch for doc $id")
    }
    // and the overlap report also covers the zero-hit majority
    assert(overlap.count(_._2._2 == 0L) > 0, "zero-overlap docs must keep a row")
  }

  test("corpus_sample_temp halves the corpus deterministically with source rebalancing") {
    val rows = Curation.corpusSampleTemp(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val kept = rows.map(_.getAs[Long]("n_kept")).sum
    // target is N/2; the hash coin is uniform, so realized mass sits
    // near it (loose band: binomial noise at spec SF)
    assert(kept > total * 3 / 10 && kept < total * 7 / 10,
      s"kept $kept of $total outside the target band")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_id_sum") >= 0L)
    }
    // deterministic: the same coin flips land identically on re-run
    val again = Curation.corpusSampleTemp(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("kept_id_sum")))
    assert(again.toSeq == rows.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("n_kept"), r.getAs[Long]("kept_id_sum"))).toSeq)
  }

  test("dsir_weights matches the brute-force hashed-ngram importance score") {
    import scala.jdk.CollectionConverters._
    val B = Curation.DsirBuckets
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(text: String): Seq[Long] = {
      val toks = Tok.tokens(text).asScala.toSeq
      val all = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      all.map(g => Tok.hash60(g) % B)
    }
    val perDoc = docs.map { case (id, src, text) => (id, src, grams(text)) }
    val rawc = perDoc.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgtc = perDoc.filter(_._2 == Curation.DsirTarget)
      .flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totr = rawc.values.sum; val tott = tgtc.values.sum
    def s(b: Long): Long = {
      val x = ((tgtc.getOrElse(b, 0L) + 1).toDouble * (totr + B)) /
        ((rawc(b) + 1).toDouble * (tott + B))
      math.floor(math.log(x) * 1e4 + 0.5).toLong
    }
    val expected = perDoc.map { case (id, _, gs) =>
      id -> ((gs.size.toLong, gs.map(s).sum))
    }.toMap
    val got = Curation.dsirWeights(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_feats"), r.getAs[Long]("weight_fx")))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) => assert(got(id) == e, s"doc $id") }
    // target-domain docs must score higher on average than the rest —
    // the signal importance resampling selects on
    val bySide = docs.map { case (id, src, _) =>
      (src == Curation.DsirTarget,
        got(id)._2.toDouble / math.max(1L, got(id)._1)) }
    val t = bySide.filter(_._1).map(_._2); val r = bySide.filterNot(_._1).map(_._2)
    assert(t.nonEmpty && r.nonEmpty && t.sum / t.size > r.sum / r.size)
  }

  test("dsir_select draws the N smallest priority keys over the weights report") {
    val w = Curation.dsirWeights(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_fx")).toMap
    def key(id: Long): Long = {
      val u = ((Tok.hash60(id.toString) % 1000000L) + 1L).toDouble / 1000001.0
      math.floor(math.log(u) * 10000 + 0.5).toLong - w(id)
    }
    val expected = w.keys.toSeq.map(id => (key(id), id)).sorted
      .take(Curation.DsirSelectN)
    val sel = Curation.dsirSelect(spark, sf)
    val got = sel.collect().map(r =>
      (r.getAs[Long]("key_fx"), r.getAs[Long]("doc_id"))).toSeq
    assert(got == expected)
    // resampling property: high-importance docs are over-represented —
    // the selected set's mean weight beats the corpus mean
    val selMean = got.map(p => w(p._2).toDouble).sum / got.size
    val allMean = w.values.map(_.toDouble).sum / w.size
    assert(selMean > allMean,
      s"selection should upweight the target-like docs ($selMean vs $allMean)")
    // the head is a TakeOrdered over the weights aggregate, never a
    // corpus-sized global sort
    val exec = sel.queryExecution.executedPlan
    assert(exec.toString.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered plan:\n$exec")
    val globalSorts = exec.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.isEmpty, s"global Sort in dsir_select plan:\n$exec")
  }

  test("token_budget fills each source's share best-quality-first with a hash-ranked boundary") {
    import graft.operators.TextAnalysis
    // toks and the fx6 quality score re-derived from the quality
    // report the operator factors its kernel from
    val qrep = TextAnalysis.quality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("quality"))).toMap
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val wBp = Curation.MixWeights.toMap
    // per source: full centiles admitted whole while they fit; the one
    // boundary centile admits its hash-ranked running-total prefix
    val expected = srcOf.groupBy(_._2).flatMap { case (src, members) =>
      val bS = wBp.getOrElse(src, 0).toLong * Curation.BudgetTokens / 10000L
      val docs = members.keys.toSeq.map { id =>
        val (toks, q6) = qrep(id); (id, toks, q6 / 10000L) }
      val levels = docs.groupBy(_._3).toSeq.sortBy(-_._1)
      var cum = 0L
      val admitted = Seq.newBuilder[Long]
      levels.foreach { case (_, lvlDocs) =>
        val lvlToks = lvlDocs.map(_._2).sum
        if (cum + lvlToks <= bS) admitted ++= lvlDocs.map(_._1)
        else if (cum < bS) {
          val rem = bS - cum
          var run = 0L
          lvlDocs.sortBy(d => (Tok.hash60(d._1.toString) % 1000000L, d._1))
            .foreach { d => run += d._2; if (run <= rem) admitted += d._1 }
        }
        cum += lvlToks
      }
      admitted.result()
    }.toSet
    val rows = Curation.tokenBudget(spark, sf).collect()
    val got = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected)
    // budgets are never exceeded
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val bS = wBp.getOrElse(src, 0).toLong * Curation.BudgetTokens / 10000L
      val spent = rs.map(_.getAs[Long]("toks")).sum
      assert(spent <= bS, s"source $src overspent: $spent > $bS")
    }
    assert(got.nonEmpty && got.size < srcOf.size,
      "budget fill should be a strict, non-empty selection at this SF")
  }

  test("decontaminate_semantic equals the brute bucketed recompute and broadcasts the eval side") {
    val planes = graft.operators.VectorSearch.lshPlanes(64, graft.operators.VectorSearch.LshPlanes)
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def bucket(e: Array[Double]): Long =
      planes.zipWithIndex.map { case (p, j) =>
        val proj = p.zip(e).map { case (s, x) => s * x }.sum
        if (proj > 0.0) 1L << j else 0L
      }.sum
    def cosFx(a: Array[Double], b: Array[Double]): Long = {
      def dot(x: Array[Double], y: Array[Double]) = x.zip(y).map { case (u, v) => u * v }.sum
      math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 1e6 + 0.5).toLong
    }
    val byBucket = vecs.map { case (id, e) => (id, bucket(e), e) }
    val eval = byBucket.filter(_._1 % Curation.EvalMod == 0)
    val exp = byBucket.filter(_._1 % Curation.EvalMod != 0).flatMap { case (id, b, e) =>
      val cands = eval.filter(_._2 == b).map(ev => cosFx(e, ev._3))
      if (cands.isEmpty) None
      else Some((id, cands.length.toLong, cands.max,
        if (cands.max >= Curation.SemContamCosFx) 1L else 0L))
    }.sortBy(_._1).toSeq
    val df = Curation.decontaminateSemantic(spark, sf)
    val got = df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_cand"),
      r.getAs[Long]("max_cos"), r.getAs[Long]("contaminated"))).toSeq
    assert(got == exp)
    // the bounded eval side must ride a broadcast — the training
    // corpus is never shuffled by the candidate join
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("BroadcastHashJoin"), s"expected broadcast eval join:\n$exec")
  }

  test("decontaminate_semantic catches a planted near-copy of an eval vector") {
    import spark.implicits._
    // eval vector (id % 83 == 0), an exact train clone, a near-copy,
    // and an orthogonal bystander — driven through the production path
    val base = Array.tabulate(64)(d => math.sin(d + 1.0))
    val near = base.clone(); near(0) += 0.01
    val ortho = Array.tabulate(64)(d => if (d % 2 == 0) 1.0 else -1.0)
    val vecs = Seq(
      (83L, base.toSeq), (1L, base.toSeq), (2L, near.toSeq), (3L, ortho.toSeq))
      .toDF("vec_id", "emb")
    val got = Curation.decontaminateSemanticFromVecs(vecs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("contaminated")).toMap
    assert(got.get(1L).contains(1L), s"exact clone must flag: $got")
    assert(got.get(2L).contains(1L), s"near-copy must flag: $got")
    assert(!got.get(3L).contains(1L), s"orthogonal bystander must not flag: $got")
  }

  test("decontaminate_semantic eval gate: past the measured bar the join shuffles instead of broadcasting, rows identical") {
    val vecs = Tables.embeddings(spark, sf).select(col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("emb"))
    val bc = Curation.decontaminateSemanticFromVecs(vecs)
    // force the at-scale path: a zero row bar means ANY eval split is
    // "too big to broadcast"
    val sh = Curation.decontaminateSemanticFromVecs(vecs, maxRows = 0L)
    assert(sh.collect().toSeq == bc.collect().toSeq,
      "gated paths must be row-identical")
    val bcExec = bc.queryExecution.executedPlan.toString
    assert(bcExec.contains("BroadcastHashJoin"),
      s"under the bar the eval side must broadcast:\n$bcExec")
    val shExec = sh.queryExecution.executedPlan.toString
    assert(shExec.contains("ShuffledHashJoin"),
      s"past the bar the join must be the keyed exchange:\n$shExec")
    assert(!shExec.contains("BroadcastHashJoin"),
      s"past the bar nothing may broadcast:\n$shExec")
  }
}
